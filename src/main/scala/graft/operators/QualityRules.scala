package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Gopher-style composite document-quality rules with per-rule
  * reasons. All signals are exact integers (micro fixed-point for the
  * ratios) so results are engine-portable bit-for-bit. Scale shape:
  * base signals are map-local; the bigram repetition stat keys on
  * doc_id (+bigram) with map-side combine; one doc_id equi-join
  * merges them. */
object QualityRules {

  /** Adds rule flags (0/1 longs) to `docs` (schema: doc_id, text, ...):
    * r_short (n_tok < shortTok), r_wordlen (mean word length micro
    * outside [mwlLo, mwlHi]), r_common (< minCommon distinct hits from
    * `commonWords`), r_rep (top-bigram mass ≥ repMicro millionths),
    * plus n_tok, n_failed and keep. Original columns are preserved. */
  def flags(docs: DataFrame,
            commonWords: Seq[String] = Seq("join", "hash", "row", "batch", "scan"),
            shortTok: Int = 20,
            mwlLo: Long = 3900000L, mwlHi: Long = 5100000L,
            minCommon: Int = 2, repMicro: Long = 100000L): DataFrame = {
    val base = docs
      .withColumn("n_tok", size(split(col("text"), " ")).cast(LongType))
      .withColumn("__nonspace",
        length(translate(col("text"), " ", "")).cast(LongType))
      .withColumn("__mwl", expr("(__nonspace * 1000000) div n_tok"))
      .withColumn("__ncommon",
        size(array_intersect(split(col("text"), " "),
          array(commonWords.map(lit): _*))).cast(LongType))
    val rep = docs
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions
          .wordShinglesAll(col("text"), 2)).as("bigram"))
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(expr("(max(c) * 1000000) div sum(c)").as("__rep"))
    base.join(rep, Seq("doc_id"), "left")
      .withColumn("r_short",
        when(col("n_tok") < shortTok, 1L).otherwise(0L))
      .withColumn("r_wordlen",
        when(col("__mwl") < mwlLo || col("__mwl") > mwlHi, 1L).otherwise(0L))
      .withColumn("r_common",
        when(col("__ncommon") < minCommon, 1L).otherwise(0L))
      .withColumn("r_rep",
        when(coalesce(col("__rep"), lit(0L)) >= repMicro, 1L).otherwise(0L))
      .withColumn("n_failed",
        col("r_short") + col("r_wordlen") + col("r_common") + col("r_rep"))
      .withColumn("keep", when(col("n_failed") === 0, 1L).otherwise(0L))
      .drop("__nonspace", "__mwl", "__ncommon", "__rep")
  }
}
