package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Training-batch preparation: skip-gram pair generation for embedding
  * training and length-bucketed batch packing for padded trainers —
  * the last mile between a cleaned corpus and a dataloader.
  *
  * Both are deterministic by construction (md5-keyed decisions, the
  * q48 rule): re-running the pipeline or moving it across engines
  * yields byte-identical batches, which is what makes training runs
  * reproducible from raw data.
  */
object TrainPrep {

  /** Skip-gram (center, context) pairs within ±`window` token
    * positions (Mikolov et al. 2013 word2vec data generation), with
    * deterministic frequency subsampling of CENTERS: an occurrence of
    * a token with corpus frequency f is kept iff
    * md5(doc, pos) mod f < `keepC` — i.e. p(keep) = min(1, keepC/f),
    * the simplified ∝1/f subsampling that crushes stop-word pairs
    * without touching rare-word pairs, as an exact integer rule (no
    * float probabilities, no RNG state).
    *
    * Scale shape: one posexplode + a vocab-sized frequency broadcast +
    * `window`-way positional equi-joins on (doc, pos±k) — the q151
    * positional-index plan; nothing quadratic, nothing driver-side. */
  def skipGramPairs(docs: DataFrame, idCol: String, textCol: String,
                    window: Int, keepC: Long): DataFrame = {
    val toks = docs.select(col(idCol).as("doc"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("f"))
    val h = conv(substring(md5(concat(col("doc").cast("string"), lit("_"),
      col("pos").cast("string"))), 1, 8), 16, 10).cast(LongType)
    val centers = toks.join(broadcast(freq), "tok")
      .filter(h % col("f") < keepC)
      .select(col("doc"), col("pos"), col("tok").as("center"))
    val offsets = (-window to window).filter(_ != 0)
    val ctx = toks.select(col("doc"), col("pos").as("cpos"),
      col("tok").as("context"))
    centers
      .withColumn("off", explode(lit(offsets.toArray)))
      .withColumn("cpos", col("pos") + col("off"))
      .join(ctx, Seq("doc", "cpos"))
      .select(col("center"), col("context"))
  }

  /** Length-bucketed batch packing for padded training: docs bucket by
    * token-length band (`band` tokens wide), order deterministically
    * inside each bucket (md5 of the id — the q48/q164 shuffle rule),
    * and cut into batches of `batchSize`. Emits one row per batch with
    * its padding waste: Σ(max_len − len) tokens, and waste_ppm of the
    * padded volume — the audit that justifies length bucketing over
    * naive batching (padding at 100 TB is compute burned on pad
    * tokens).
    *
    * Scale shape: one length projection + per-BUCKET windows (parallel
    * across buckets; a bucket is a length band, never the corpus). */
  def lengthBatches(docs: DataFrame, idCol: String, textCol: String,
                    band: Long, batchSize: Int): DataFrame = {
    val len = graft.functions.TextFunctions.tokenCount(col(textCol))
    val withLen = docs.select(col(idCol).as("id"), len.as("len"))
      .withColumn("bucket", expr(s"len div $band"))
      .withColumn("ord", md5(col("id").cast("string")))
    val w = Window.partitionBy(col("bucket")).orderBy(col("ord"), col("id"))
    withLen
      .withColumn("rn", row_number().over(w))
      .withColumn("batch_id", expr(s"(rn - 1) div $batchSize"))
      .groupBy(col("bucket"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("len")).as("max_len"),
        sum(col("len")).as("sum_len"))
      .withColumn("padding", col("max_len") * col("n_docs") - col("sum_len"))
      .withColumn("waste_ppm",
        when(col("max_len") > 0,
          expr("padding * 1000000 div (max_len * n_docs)"))
          .otherwise(lit(0L)))
  }
}
