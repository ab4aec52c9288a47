package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardCopyOption}

/** Generation-guarded commits for MULTI-WRITER pointer files — the
  * put-if-match an object store provides natively, realized on a
  * filesystem for the repo's two-level pointers ([[SnapshotGroup]]'s
  * group pointer, [[graft.operators.TextIndex]]'s commit pointer).
  *
  * Protocol: the pointer is a chain of GENERATION-NUMBERED files
  * `_ptr.1, _ptr.2, …` (the Delta-log commit-numbering idea applied
  * to a single pointer). A writer reads the current generation `g`
  * ([[gen]]) and the content at `g` ([[read]]), runs its
  * read-modify-write cycle, then commits through [[commitIfGen]],
  * which stages the new content in a temp file and publishes it by
  * ATOMICALLY creating `_ptr.{g+1}` as a hard link to the staged
  * bytes — `link(2)` fails with EEXIST for every process but one, so
  * creation-with-content IS the compare-and-swap. There is no lock,
  * no lease, and no steal: a writer paused arbitrarily long simply
  * LOSES its CAS when it finally runs (the generation number in the
  * filename is the fencing token), never overwriting a publish that
  * readers already saw — `true` from [[commitIfGen]] means the
  * content was, at that instant, the newest committed pointer.
  *
  * Crash-safety: a crash before the link leaves only an unreferenced
  * temp file (pruned opportunistically); a crash after it IS a
  * committed publish. Readers resolve the highest `_ptr.{n}` present —
  * always fully written, never torn. A lost race returns false: the
  * loser re-reads the WINNER's pointer and retries its whole cycle
  * against that snapshot, so racing writers SERIALIZE. Table versions
  * staged by a losing attempt become orphans below the recorded
  * pointer — invisible, reclaimed by vacuum, exactly the crash-window
  * stance the pointers already take. */
object PointerCas {

  /** Committed generations retained behind the head — the protocol's
    * RETENTION HORIZON, not just reader comfort. Pruning frees slot
    * NAMES, and a freed name is the one thing a CAS must never hand
    * out twice: a writer paused between its generation pre-check and
    * its put-if-absent, while ≥ Keep commits land, would WIN the
    * pruned slot — a PHANTOM commit below the head that no reader ever
    * resolves, reported as success (a lost publish, caught by the
    * CasBackendSpec race at the old Keep=8). Two defenses:
    *  - the window is wide (a pause must span Keep in-flight commits
    *    inside a microsecond-scale gap to matter), and
    *  - [[commitIfGen]] re-checks AFTER winning: a head already ≥
    *    `expect + Keep` proves the won slot predates the prune floor —
    *    the slot is deleted and the commit reports false (the caller
    *    retries against the real head; the phantom was invisible, so
    *    a retry never double-applies).
    * Within the horizon the token is absolute; beyond it, this is the
    * SAME contract as Delta's log retention — size the window to the
    * worst pause the deployment tolerates. */
  private[sources] val Keep = 64L

  private def ptrFile(dir: File, n: Long) = new File(dir, s"_ptr.$n")

  private def maxGen(dir: File, b: CasBackend): Long =
    b.list(dir).iterator
      .filter(n => n.startsWith("_ptr.") && !n.endsWith(".tmp"))
      .flatMap(n => scala.util.Try(n.stripPrefix("_ptr.").toLong).toOption)
      .foldLeft(0L)(math.max)

  /** Current pointer generation (0 before any guarded commit). */
  def gen(dir: File, b: CasBackend = LocalCas): Long = maxGen(dir, b)

  /** Content of the newest committed pointer, if any commit ever
    * landed. Retries if the resolved generation is pruned mid-read
    * (only possible when ≥ `Keep` newer commits land during the
    * read — re-resolving finds the newer head). `None` means ONLY
    * "no pointer was ever committed"; persistent read failure under
    * churn THROWS — conflating the two would let a bootstrap path
    * zero-reset a live pointer. */
  def read(dir: File, b: CasBackend = LocalCas): Option[String] = {
    var attempt = 0
    while (attempt < 8) {
      val g = maxGen(dir, b)
      if (g == 0L) return None
      try return Some(new String(b.read(ptrFile(dir, g)),
        StandardCharsets.UTF_8))
      catch { case _: java.io.IOException => attempt += 1 }
    }
    sys.error(s"pointer at $dir unreadable after 8 attempts " +
      "(persistent churn or IO failure — NOT absence)")
  }

  /** [[read]] with a PRE-UPGRADE fallback: resolve the generation
    * chain first; when none exists, read the fixed-name pointer file
    * the caller's old protocol committed (TextIndex's `_stats`,
    * SnapshotGroup's `_published`). The first post-upgrade commit
    * lands `_ptr.1` and the legacy file goes permanently stale —
    * migration happens on write, readers never reset live state. */
  def readOrLegacy(dir: File, legacyName: String,
                   b: CasBackend = LocalCas): Option[String] =
    read(dir, b).orElse {
      // existence and read-failure must stay DISTINCT: a transient read
      // error on a present legacy pointer has to throw, or a bootstrap
      // path would zero-reset a live index (the read() doc's hazard)
      if (b.list(dir).contains(legacyName))
        Some(new String(b.read(new File(dir, legacyName)),
          StandardCharsets.UTF_8))
      else None
    }

  /** Publish `content` as generation `expect + 1` iff no other writer
    * has committed past `expect` — false on a lost race, and the
    * caller re-reads state ([[gen]] + [[read]]) and retries its whole
    * cycle. The backend's atomic put-if-absent of `_ptr.{expect+1}`
    * IS the compare-and-swap ([[LocalCas]]: exclusive hard-link
    * creation; an object store: conditional PUT): content is fully
    * staged before the name appears, so readers never see a partial
    * pointer, and exactly one writer per generation can ever
    * succeed. */
  def commitIfGen(dir: File, expect: Long, content: String,
                  b: CasBackend = LocalCas,
                  beforePut: () => Unit = () => ()): Boolean = {
    if (maxGen(dir, b) != expect) return false // cheap pre-check only
    beforePut() // test seam: the pre-check → put pause window
    val won = b.putIfAbsent(ptrFile(dir, expect + 1),
      content.getBytes(StandardCharsets.UTF_8))
    if (won && maxGen(dir, b) >= expect + Keep) {
      // PHANTOM detection (see [[Keep]]): the head is already a full
      // retention window past us, so the slot we "won" had been pruned
      // and re-issued — our content is below the head, invisible to
      // every reader. Withdraw it and report the lost race. Within the
      // retention contract a legitimate win can never observe this (it
      // would need a post-win pause spanning Keep commits); OUTSIDE the
      // contract this check deliberately errs toward a SPURIOUS RETRY
      // (a legit win whose successors already built on it would be
      // withdrawn and re-applied) rather than toward a silent lost
      // publish — retries are visible and idempotence-token-guarded
      // (the txn-stamped doors), phantoms are neither.
      b.delete(ptrFile(dir, expect + 1))
      return false
    }
    if (won) {
      // prune by LISTING, not by walking until a gap: an interrupted
      // earlier prune must not strand generations below its gap forever
      b.list(dir).foreach { n =>
        if (n.startsWith("_ptr.") && !n.endsWith(".tmp"))
          scala.util.Try(n.stripPrefix("_ptr.").toLong).toOption
            .filter(_ <= expect + 1 - Keep)
            .foreach(m => b.delete(ptrFile(dir, m)))
      }
      b.pruneStaleStages(dir)
    }
    won
  }
}
