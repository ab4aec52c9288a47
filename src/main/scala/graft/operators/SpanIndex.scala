package graft.operators

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Persisted exact-substring index — [[SpanDedup]] at ingestion time,
  * completing the index trilogy ([[PqIndex]] semantic, [[LshIndex]]
  * lexical-document, this one substring-level): the corpus' distinct
  * W-token span hashes live as a durable
  * [[graft.sources.VersionedTable]], and a new batch is stripped of
  * every span the corpus already contains (corpus-first keep
  * semantics — the stored occurrence always wins) WITHOUT touching the
  * corpus text at all: exact-match dedup needs only the hashes, so
  * `stripAgainst` is one batch-side hashing pass plus a semi-join
  * against the stored table (md5 collisions are the usual 2⁻¹²⁸
  * non-event). `append` commits the admitted batch's new hashes,
  * O(batch).
  *
  * Layout under `root`: `scheme.txt` (the window width W — a batch
  * hashed with a different W never matches the stored spans) and
  * `spans/`, a VersionedTable of distinct span-hash strings.
  */
object SpanIndex {

  private def schemeFile(root: String) = new File(root, "scheme.txt")
  private def spansRoot(root: String) = new File(root, "spans").getPath

  private def readW(root: String): Int = new String(
    Files.readAllBytes(schemeFile(root).toPath), StandardCharsets.UTF_8)
    .trim.toInt

  /** Commit the corpus' distinct span hashes as version 0. */
  def build(corpus: DataFrame, root: String, w: Int,
            idCol: String = "doc_id", textCol: String = "text"): Long = {
    new File(root).mkdirs()
    Files.write(schemeFile(root).toPath,
      w.toString.getBytes(StandardCharsets.UTF_8))
    VersionedTable.overwrite(
      SpanDedup.spanHashes(corpus, w, idCol, textCol)
        .select(col("h")).distinct(),
      spansRoot(root))
  }

  /** Append a new batch's distinct span hashes (typically called after
    * [[stripAgainst]] admitted it). Duplicate hash rows across commits
    * are harmless — every reader semi-joins. */
  def append(batch: DataFrame, root: String,
             idCol: String = "doc_id", textCol: String = "text"): Long = {
    val w = readW(root)
    VersionedTable.append(
      SpanDedup.spanHashes(batch, w, idCol, textCol)
        .select(col("h")).distinct(),
      spansRoot(root))
  }

  /** Rebuild each batch doc with every corpus-known span removed
    * (tokens covered by ANY occurrence of a stored hash). Within-batch
    * duplication is untouched — compose [[SpanDedup.stripDuplicatedSpans]]
    * for that. Output: (id, text), every batch doc present. */
  def stripAgainst(batch: DataFrame, root: String,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val w = readW(root)
    val stored = VersionedTable.read(batch.sparkSession, spansRoot(root))
    val covered = SpanDedup.spanHashes(batch, w, idCol, textCol)
      .join(stored, Seq("h"), "left_semi")
    SpanDedup.rebuildWithout(batch, covered, w, idCol, textCol)
  }
}
