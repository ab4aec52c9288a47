package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact substring (span) deduplication — the "dedup duplicated
  * training text, not just duplicated documents" stage of an LLM data
  * pipeline (Lee et al. 2022, "Deduplicating Training Data Makes
  * Language Models Better"). The paper builds a corpus-wide suffix
  * array; that is a single-machine construction. This is the
  * distributed re-expression: every W-token sliding window is hashed
  * map-locally, duplicates are found with ONE hash-shuffle group-by,
  * and removal/coverage are per-document column math — no suffix
  * array, no global sort, nothing driver-sided.
  *
  * Scale shape (100 TB): `spanHashes` is a map-local explode (~L rows
  * per L-token doc); [[duplicatedSpans]] is a two-level hash aggregate
  * on the span hash (partial map-side combine on (hash, doc) first, so
  * the distinct-doc count never expands rows); [[stripDuplicatedSpans]]
  * joins docs against a DOC-level array of removed positions (one row
  * per affected doc, not one per token), then filters tokens with a
  * higher-order function — the rebuild never shuffles token-level rows.
  * The md5 hash is oracle-checkable; at scale swap `hash64 = true` for
  * an 8-byte xxhash64 shuffle key (same plan, ~5× narrower rows).
  *
  * Differs from [[Chunks]] (CCNet boilerplate, q110): chunks are
  * non-overlapping and per-source; spans are every sliding offset,
  * corpus-global, with keep-first-occurrence removal semantics.
  */
object SpanDedup {

  /** One row per W-token sliding window: (id, pos, h), pos 1-based.
    * Docs shorter than `w` yield no rows. Map-local. */
  def spanHashes(docs: DataFrame, w: Int,
                 idCol: String = "doc_id", textCol: String = "text",
                 hash64: Boolean = false): DataFrame = {
    val toks = split(col(textCol), " ")
    val win = (i: Column) => concat_ws(" ", slice(col("__toks"), i, lit(w)))
    val h = (i: Column) => if (hash64) xxhash64(win(i)).cast(StringType)
                           else md5(win(i))
    docs
      .select(col(idCol).as("id"), toks.as("__toks"))
      .filter(size(col("__toks")) >= w)
      .select(col("id"), posexplode(
        transform(sequence(lit(1), size(col("__toks")) - (w - 1)), h)))
      .select(col("id"), (col("pos") + 1).as("pos"), col("col").as("h"))
  }

  /** Spans occurring in ≥ `minDocs` DISTINCT documents:
    * (span_hash, n_docs, n_occ). Two-level aggregate so the distinct
    * count is a plain combine-able group-by, never an expand. */
  def duplicatedSpans(docs: DataFrame, w: Int, minDocs: Int = 2,
                      idCol: String = "doc_id", textCol: String = "text",
                      hash64: Boolean = false): DataFrame =
    spanHashes(docs, w, idCol, textCol, hash64)
      .groupBy(col("h"), col("id")).agg(count(lit(1)).as("__c"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__c")).as("n_occ"))
      .filter(col("n_docs") >= minDocs)
      .select(col("h").as("span_hash"), col("n_docs"), col("n_occ"))

  /** Occurrences of cross-doc duplicated spans: (id, pos, h). One
    * spans frame feeds both the duplicate filter and the occurrence
    * side (the semi-join's build side re-derives it, but never a third
    * time through [[duplicatedSpans]]' own hashing pass). */
  private def dupOccurrences(docs: DataFrame, w: Int, minDocs: Int,
                             idCol: String, textCol: String): DataFrame = {
    // fanOut HERE, not inside spanHashes: the per-offset window hashing
    // is the heavy map (guide §2.5) and this frame is consumed twice,
    // but spanHashes also feeds SpanIndex's table commits, where a
    // repartition multiplies staged files (batch-2 notes)
    val spans = spanHashes(graft.core.FanOut.fanOut(docs), w, idCol, textCol)
    val dups = spans
      .groupBy(col("h"), col("id")).agg(count(lit(1)).as("__c"))
      .groupBy(col("h")).agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("h"))
    spans.join(dups, Seq("h"), "left_semi")
  }

  /** Per-document duplicated-token coverage: (id, n_tok, dup_tok,
    * dup_ratio) for every doc containing at least one duplicated span.
    * Overlapping span occurrences are interval-merged per doc (the
    * classic islands pass: running max of interval end over a
    * per-doc window), so each token counts once. */
  def duplicationCoverage(docs: DataFrame, w: Int, minDocs: Int = 2,
                          idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    val occ = dupOccurrences(docs, w, minDocs, idCol, textCol)
      .withColumn("end", col("pos") + (w - 1))
    val byDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
    val prevEnd = max(col("end"))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val islands = occ
      .withColumn("__new",
        when(prevEnd.isNull || col("pos") > prevEnd, 1L).otherwise(0L))
      .withColumn("__isl", sum(col("__new")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("id"), col("__isl"))
      .agg(min(col("pos")).as("__s"), max(col("end")).as("__e"))
      .groupBy(col("id"))
      .agg(sum(col("__e") - col("__s") + 1).as("dup_tok"))
    val nTok = docs.select(col(idCol).as("id"),
      size(split(col(textCol), " ")).cast(LongType).as("n_tok"))
    islands.join(nTok, Seq("id"))
      .select(col("id"), col("n_tok"), col("dup_tok"),
        round(col("dup_tok").cast(DoubleType) / col("n_tok"), 6)
          .as("dup_ratio"))
  }

  /** Keep-first exact-substring removal: for every cross-doc duplicated
    * span, the occurrence with the smallest (id, pos) survives; tokens
    * covered by any OTHER occurrence are dropped and each document is
    * rebuilt from its surviving tokens (Lee et al. §3: remove all but
    * one occurrence, leave surrounding text intact). Every input doc
    * appears in the output — possibly with empty text if fully covered.
    * Output: (id, text). */
  def stripDuplicatedSpans(docs: DataFrame, w: Int, minDocs: Int = 2,
                           idCol: String = "doc_id",
                           textCol: String = "text"): DataFrame = {
    val byHash = Window.partitionBy(col("h"))
      .orderBy(col("id"), col("pos"))
    val removed = dupOccurrences(docs, w, minDocs, idCol, textCol)
      .withColumn("__rn", row_number().over(byHash))
      .filter(col("__rn") > 1)
    rebuildWithout(docs, removed, w, idCol, textCol)
  }

  /** Rebuild each doc's text with the tokens covered by `occurrences`
    * ((id, pos) span starts) removed. The strip join is DOC-level — the
    * covered positions collapse to one array per affected doc — so
    * token rows never shuffle. Every input doc appears in the output,
    * possibly with empty text. Shared by [[stripDuplicatedSpans]] and
    * [[SpanIndex.stripAgainst]]. */
  private[operators] def rebuildWithout(docs: DataFrame,
                                        occurrences: DataFrame, w: Int,
                                        idCol: String,
                                        textCol: String): DataFrame = {
    val removed = occurrences
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + (w - 1))).as("p"))
      .groupBy(col("id"))
      .agg(collect_set(col("p")).as("__rem"))
    graft.core.FanOut.fanOut(docs) // token rebuild is the heavy map (guide §2.5)
      .select(col(idCol).as("id"), split(col(textCol), " ").as("__toks"))
      .join(removed, Seq("id"), "left")
      .select(col("id"), concat_ws(" ",
        filter(col("__toks"), (t, i) =>
          col("__rem").isNull || !array_contains(col("__rem"), i + 1)))
        .as("text"))
  }
}
