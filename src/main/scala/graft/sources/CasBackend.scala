package graft.sources

import java.io.File
import java.nio.file.{Files, StandardCopyOption}

/** The ONE primitive [[PointerCas]]'s generation protocol needs from
  * its store: atomic CREATE-WITH-CONTENT that fails if the name exists
  * (put-if-absent), plus list/read/delete. On a POSIX filesystem the
  * primitive is `link(2)` ([[LocalCas]]); on an object store it is a
  * conditional PUT (`If-None-Match: *` on S3/GCS/ABFS) — the protocol
  * above is byte-identical either way, which is the 100 TB portability
  * story: nothing in PointerCas, SnapshotGroup, or TextIndex knows
  * which backend fences it. [[InMemoryCas]] is the hermetic test
  * double the race specs also run against. */
trait CasBackend {

  /** Names (not paths) present in `dir`; empty when absent. */
  def list(dir: File): Seq[String]

  /** Full content of `f` — throws `java.io.IOException` (or a
    * subclass) when missing/unreadable, exactly like a GET. */
  def read(f: File): Array[Byte]

  /** ATOMIC create-with-content: true iff `f` did not exist and now
    * holds exactly `content`; false if the name already exists (the
    * lost CAS). Never partial: a reader that sees the name sees the
    * full content. */
  def putIfAbsent(f: File, content: Array[Byte]): Boolean

  /** Best-effort delete (missing is fine). */
  def delete(f: File): Unit

  /** Backend-specific garbage collection of staging residue under
    * `dir` (crashed writers' temp files). Object stores and the
    * in-memory double stage nothing — default no-op. */
  def pruneStaleStages(dir: File): Unit = ()
}

/** POSIX backend: put-if-absent = stage a temp file, publish by hard
  * link (`link(2)` fails EEXIST atomically in the filesystem — an
  * exists-check + rename would be a TOCTOU race because rename
  * silently replaces). */
object LocalCas extends CasBackend {

  override def list(dir: File): Seq[String] = {
    val names = dir.list()
    if (names == null) Seq.empty else names.toSeq
  }

  override def read(f: File): Array[Byte] = Files.readAllBytes(f.toPath)

  override def putIfAbsent(f: File, content: Array[Byte]): Boolean = {
    val tmp = Files.createTempFile(f.getParentFile.toPath,
      "_ptr_stage", ".tmp")
    try {
      Files.write(tmp, content)
      try { Files.createLink(f.toPath, tmp); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case e: UnsupportedOperationException =>
          // filesystem without link(2): an exists-check + rename
          // (which silently REPLACES) would turn the CAS into a TOCTOU
          // race and quietly void the exactly-one-winner guarantee the
          // pointer protocol (TextIndex duplicate-postings/BM25-stats
          // protection) rests on. Fail loudly — such deployments take
          // a CasBackend with a native conditional PUT instead of
          // pretending this one succeeded.
          throw new IllegalStateException(
            "LocalCas put-if-absent requires hard-link support " +
              "(link(2)); this filesystem lacks it — use a CasBackend " +
              "backed by a native conditional PUT", e)
        // a writer paused long enough for the stale-stage pruner to
        // take its temp file has certainly lost the race anyway — a
        // lost CAS, not a crash: callers retry on false
        case _: java.nio.file.NoSuchFileException => false
      }
    } finally Files.deleteIfExists(tmp)
  }

  override def delete(f: File): Unit = Files.deleteIfExists(f.toPath)

  /** Stale stage tmps (crashed writers) age out: a LIVE writer holds
    * its tmp for microseconds, so a minute-old one is garbage;
    * deleting it makes that writer's (already doomed) link throw
    * rather than succeed — never corrupts. */
  override def pruneStaleStages(dir: File): Unit = {
    val names = dir.list()
    if (names != null) names.foreach { n =>
      if (n.startsWith("_ptr_stage") && n.endsWith(".tmp")) {
        val f = new File(dir, n)
        if (System.currentTimeMillis() - f.lastModified() > 60000L)
          Files.deleteIfExists(f.toPath)
      }
    }
  }
}

/** Hermetic in-memory backend (the conditional-PUT shape with no
  * filesystem): one atomic map putIfAbsent per publish. Thread-safe —
  * the race specs run real threads against it. */
final class InMemoryCas extends CasBackend {

  private val files =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()

  private def key(f: File): String = f.getAbsolutePath

  override def list(dir: File): Seq[String] = {
    val prefix = dir.getAbsolutePath + File.separator
    import scala.jdk.CollectionConverters._
    files.keySet.asScala.toSeq.collect {
      case k if k.startsWith(prefix) &&
        !k.stripPrefix(prefix).contains(File.separator) =>
        k.stripPrefix(prefix)
    }
  }

  override def read(f: File): Array[Byte] = {
    val b = files.get(key(f))
    if (b == null)
      throw new java.nio.file.NoSuchFileException(f.getPath)
    b
  }

  override def putIfAbsent(f: File, content: Array[Byte]): Boolean =
    files.putIfAbsent(key(f), content) == null

  override def delete(f: File): Unit = files.remove(key(f))
}
