package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking for dedup — the shared builder behind
  * q91_chunk_dedup and the ScaleProbe chunk section (one definition so
  * the probe can never desynchronize from the query it measures). */
object Chunks {

  /** (doc_id, cmd5): the md5 of every non-overlapping `size`-token
    * chunk of `text`. Pure column math — map-local, no shuffle. */
  def digests(docs: DataFrame, size: Int = 32): DataFrame = {
    val toks = split(col("text"), " ")
    docs
      .select(col("doc_id"), toks.as("toks"),
        org.apache.spark.sql.functions.size(toks).as("n_tok"))
      .select(col("doc_id"),
        explode(sequence(lit(0), greatest(col("n_tok") - 1, lit(0)),
          lit(size))).as("st"), col("toks"))
      .select(col("doc_id"),
        md5(array_join(slice(col("toks"), col("st") + 1, lit(size)), " "))
          .as("cmd5"))
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
