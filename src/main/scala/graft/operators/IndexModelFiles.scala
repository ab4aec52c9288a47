package graft.operators

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardCopyOption}

/** VERSION-PINNED model sidecars for the persisted ANN indexes
  * ([[IvfIndex]] centroids, [[IvfPqIndex]] centroids + codebook): a
  * re-train rewrites BOTH the model file and the clustered table, and
  * two unrelated commits can't be made atomic — so instead the model
  * file is NAMED for the table version it governs (`name.v{v}.txt`)
  * and staged BEFORE that version commits.
  *
  * Invariant: a reader first pins the table version `v` it will scan,
  * then resolves the model as the greatest staged version ≤ v — so
  * cell/code assignments and the model that produced them always
  * match, no matter how the read interleaves with a re-train. Appends
  * bump the table version WITHOUT staging a model (assignment reuses
  * the stored model), which the ≤-resolution handles by design. A
  * crash between the model stage and the table commit leaves an
  * orphan ABOVE every committed version — no reader resolves it, and
  * the retried re-train replaces it (REPLACE_EXISTING). Legacy
  * indexes (unversioned `name.txt`) resolve through the fallback. */
private[operators] object IndexModelFiles {

  private def fileFor(root: String, name: String, v: Long) =
    new File(root, s"$name.v$v.txt")

  /** Stage `content` as the model governing table version `v` —
    * atomic (tmp + ATOMIC_MOVE), idempotent. Call BEFORE committing
    * version `v`: until that commit lands, no reader resolves it. */
  def write(root: String, name: String, v: Long, content: String): Unit = {
    new File(root).mkdirs()
    val tmp = Files.createTempFile(new File(root).toPath, s"_$name", ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, fileFor(root, name, v).toPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Delete staged models ABOVE `v` — orphans from a crashed re-train
    * whose table commit never landed. Called by `append` before it
    * commits the next version: without this, the append's commit would
    * reach the orphan's version number and readers would resolve a
    * model that never produced the stored assignments (mixed state).
    * Single-maintenance-writer lane, so no live stage can be above the
    * pinned version when an append runs. */
  def dropAbove(root: String, name: String, v: Long): Unit = {
    val names = new File(root).list()
    val prefix = s"$name.v"
    if (names != null) names.foreach { n =>
      if (n.startsWith(prefix) && n.endsWith(".txt"))
        scala.util.Try(n.stripPrefix(prefix).stripSuffix(".txt").toLong)
          .toOption.filter(_ > v)
          .foreach(_ => Files.deleteIfExists(new File(root, n).toPath))
    }
  }

  /** The model governing table version `v`: greatest staged version
    * ≤ v, falling back to the legacy unversioned `name.txt`. */
  def readAt(root: String, name: String, v: Long): String = {
    val names = new File(root).list()
    val prefix = s"$name.v"
    val best =
      if (names == null) None
      else names.iterator
        .flatMap { n =>
          if (n.startsWith(prefix) && n.endsWith(".txt"))
            scala.util.Try(
              n.stripPrefix(prefix).stripSuffix(".txt").toLong).toOption
          else Option.empty[Long]
        }
        .filter(_ <= v)
        .reduceOption((a: Long, b: Long) => math.max(a, b))
    val f = best.map(fileFor(root, name, _))
      .getOrElse(new File(root, s"$name.txt"))
    new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
  }
}
