package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardCopyOption}

/** Generation-guarded commits for MULTI-WRITER pointer files — the
  * put-if-match an object store provides natively, realized on a
  * filesystem for the repo's two-level pointers ([[SnapshotGroup]]'s
  * group pointer, [[graft.operators.TextIndex]]'s commit pointer).
  *
  * Every pointer move bumps a `_gen` sidecar; a writer reads the
  * generation BEFORE its read-modify-write cycle and commits through
  * [[commitIfGen]], which re-checks the generation under a short lock
  * (createFile is atomic on POSIX and every object store's
  * if-none-match; the lock guards only the check + two tiny renames —
  * microsecond hold, with a stale-steal for crashed holders). A lost
  * race returns false: the loser re-reads the WINNER's pointer and
  * retries its whole cycle against that snapshot — so racing writers
  * SERIALIZE, no publish is silently overwritten, and readers (who
  * only ever see whole ATOMIC_MOVE'd pointer files) never observe a
  * torn version set. Table versions staged by a losing attempt become
  * orphans below the recorded pointer — invisible, reclaimed by
  * vacuum, exactly the crash-window stance the pointers already
  * take. */
object PointerCas {

  private def genFile(dir: File) = new File(dir, "_gen")
  private def lockFile(dir: File) = new File(dir, "_ptr.lock")

  /** Current pointer generation (0 before any guarded commit). */
  def gen(dir: File): Long = {
    val f = genFile(dir)
    if (!f.exists()) 0L
    else new String(Files.readAllBytes(f.toPath),
      StandardCharsets.UTF_8).trim.toLong
  }

  /** Run `move` (the pointer rename) iff the generation still equals
    * `expect`, bumping it in the same critical section. False on a
    * lost race — the caller re-reads state and retries its cycle. */
  def commitIfGen(dir: File, expect: Long,
                  staleLockMs: Long = 30000L)(move: => Unit): Boolean = {
    val lock = lockFile(dir).toPath
    var held = false
    while (!held) {
      try { Files.createFile(lock); held = true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          // steal only demonstrably stale locks (crashed holder); the
          // hold window is two tiny file ops, so a live lock clears in
          // microseconds
          try {
            val age = System.currentTimeMillis() -
              Files.getLastModifiedTime(lock).toMillis
            if (age > staleLockMs) Files.deleteIfExists(lock)
            else Thread.sleep(2)
          } catch { case _: java.nio.file.NoSuchFileException => () }
      }
    }
    try {
      if (gen(dir) != expect) false
      else {
        move
        val tmp = Files.createTempFile(dir.toPath, "_gen", ".tmp")
        Files.write(tmp,
          (expect + 1).toString.getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, genFile(dir).toPath,
          StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        true
      }
    } finally { Files.deleteIfExists(lock); () }
  }
}
