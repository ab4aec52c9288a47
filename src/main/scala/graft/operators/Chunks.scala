package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking for dedup — the shared builder behind
  * q91_chunk_dedup, q110_boilerplate_strip and the ScaleProbe chunk
  * section (one definition so none of them can desynchronize). */
object Chunks {

  /** (doc_id [, carryCols…], st, chunk): every non-overlapping
    * `size`-token chunk of `text` with its start offset. Pure column
    * math — map-local, no shuffle. Every chunk consumer derives from
    * THIS builder, so a tokenization/boundary change can never apply to
    * one consumer and not another. */
  def chunks(docs: DataFrame, size: Int,
             carryCols: Seq[String] = Seq.empty): DataFrame = {
    val toks = split(col("text"), " ")
    val carry = carryCols.map(col)
    docs
      .select(Seq(col("doc_id")) ++ carry ++ Seq(toks.as("toks"),
        org.apache.spark.sql.functions.size(toks).as("n_tok")): _*)
      .select(Seq(col("doc_id")) ++ carry ++ Seq(
        explode(sequence(lit(0), greatest(col("n_tok") - 1, lit(0)),
          lit(size))).as("st"), col("toks")): _*)
      .select(Seq(col("doc_id")) ++ carry ++ Seq(col("st"),
        array_join(slice(col("toks"), col("st") + 1, lit(size)), " ")
          .as("chunk")): _*)
  }

  /** (doc_id, cmd5): the md5 of every non-overlapping `size`-token
    * chunk of `text`. */
  def digests(docs: DataFrame, size: Int = 32): DataFrame =
    chunks(docs, size).select(col("doc_id"), md5(col("chunk")).as("cmd5"))

  /** CCNet-style boilerplate stripping: a `size`-token chunk appearing
    * in ≥ `minDocs` DISTINCT documents of the same `source` is
    * boilerplate (headers, footers, navigation) and is removed; each
    * document is reassembled from its surviving chunks in order.
    * Input: (doc_id, source, text). Output: (doc_id, clean_text,
    * n_stripped) for EVERY input doc (fully-boilerplate docs come back
    * empty).
    *
    * Scale shape: the chunk stream is materialized ONCE (eager
    * localCheckpoint, GC-freed — three consumers below would otherwise
    * each re-scan the corpus); the frequency table is a (source,
    * chunk-hash) hash agg with map-side combine (countDistinct of
    * doc_id — exact, the boilerplate decision must not flap); the join
    * back is co-partitioned with it; reassembly is one doc_id agg
    * sorting each doc's own chunk list locally (`array_sort` of
    * (pos, chunk) structs — never a global sort). Chunk text rides the
    * shuffles at ~chunk granularity, the same volume a line-level
    * CCNet pass moves. */
  def stripBoilerplate(docs: DataFrame, size: Int = 32,
                       minDocs: Int = 3): DataFrame = {
    val ch = chunks(docs, size, Seq("source"))
      .withColumn("cmd5", md5(col("chunk")))
      .localCheckpoint(true)
    val counts = ch.groupBy(col("source"), col("cmd5"))
      .agg(countDistinct(col("doc_id")).as("ndocs"))
    val kept = ch.join(counts, Seq("source", "cmd5"))
      .filter(col("ndocs") < minDocs)
    val reassembled = kept.groupBy(col("doc_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("st"), col("chunk")))),
          p => p("chunk")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    val totals = ch.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"))
    docs.select(col("doc_id"))
      .join(totals, Seq("doc_id"))
      .join(reassembled, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        (col("n_chunks") - coalesce(col("n_kept"), lit(0L))).as("n_stripped"))
  }

  /** Per-doc duplicate-chunk stats: a chunk is duplicated iff its hash
    * occurs more than once corpus-wide. ONE shuffle total (count
    * window over the content hash), then a map-side-combinable doc_id
    * rollup; exact integral micro ratio. */
  def dupStats(docs: DataFrame, size: Int = 32): DataFrame =
    digests(docs, size)
      .withColumn("c", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("cmd5"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        count(when(col("c") > 1, 1)).as("n_dup"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup"),
        expr("(n_dup * 1000000) div n_chunks").as("dup_micro"))
}
