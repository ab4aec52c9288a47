package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned linear quality classifier over hashed token features — the
  * "distill an expensive filter into a cheap one" stage of a training
  * data pipeline (fastText-style: FineWeb/Dolma score candidate docs
  * with a LINEAR model trained on labels from rules or an LLM judge,
  * because only a linear scorer is cheap enough to run on the full
  * crawl). Trainer is the batch PERCEPTRON: full-batch rounds of
  * w += Σ_misclassified y·x — all-INTEGER arithmetic, so unlike
  * logistic regression (float sigmoid, order-dependent float sums) the
  * whole training trajectory reproduces bit-for-bit in any engine:
  * the q162-kmeans fixed-point contract, applied to a learned model.
  *
  * Features are unigram counts hashed into `buckets` buckets (the
  * [[Dsir.tokenBucket]] md5-prefix convention — engine-portable).
  * Labels are ±1 from a caller-supplied predicate over the docs — the
  * bootstrap signal being distilled (a rule battery like q93, an
  * LLM-judge column, a human sample).
  *
  * Scale shape: ONE token explode + hash agg builds the feature table
  * (localCheckpoint: it feeds 2·iters+1 joins); each round is a
  * BROADCAST join of the `buckets`-row weight table into the features
  * (margins), one misclassified semi-join keyed on the doc id, and one
  * combinable (bucket) agg — the weight state that crosses rounds is
  * `buckets` rows, never anything corpus-sized. At 100 TB: iters
  * passes over the feature table, each one shuffle of (doc, bucket)
  * partials, weights always driver-small (the paper-standard 10⁴–10⁶
  * buckets is kilobytes).
  *
  * Output: (id, label, margin, predicted) per doc that has ≥ 1 token —
  * `margin` the final integer score Σ_b w_b·x_b (rank by it for soft
  * selection), `predicted` its sign (ties → −1, the conservative
  * keep-out default).
  *
  * @param docs    (id, text) — id column first, text column second
  * @param label   boolean predicate over `docs` rows: true → +1
  * @param buckets hashed feature-space size
  * @param iters   full-batch perceptron rounds (w₀ = 0, so round 1
  *                updates on every doc: y·0 ≤ 0)
  *
  * Reference anchor: beyond-reference (Rosenblatt 1958; the FineWeb/
  * Dolma distilled-filter recipe). On bulk-mass-dominated data the
  * full-batch update oscillates — [[Rocchio]] is the recommended
  * trainer (RocchioSpec measures both).
  */
object Perceptron {

  def trainScore(docs: DataFrame, label: Column,
                 buckets: Int = 64, iters: Int = 2): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = docs.sparkSession
    val idCol = docs.columns(0); val textCol = docs.columns(1)

    // (doc, y, bucket) -> count: one explode + one combinable agg,
    // checkpointed because every round re-joins it
    val feats = docs
      .select(col(idCol).as("__id"),
        when(label, 1L).otherwise(-1L).as("__y"),
        explode(split(col(textCol), " ")).as("__tok"))
      .filter(col("__tok") =!= "")
      .withColumn("__b", Dsir.tokenBucket(col("__tok"), buckets))
      .groupBy(col("__id"), col("__y"), col("__b"))
      .agg(count(lit(1)).as("__x"))
      .localCheckpoint(true)

    var w: DataFrame = spark.range(buckets)
      .select(col("id").as("__b"), lit(0L).as("__w"))
    for (_ <- 1 to iters) {
      val margins = feats.join(broadcast(w), Seq("__b"))
        .groupBy(col("__id"), col("__y"))
        .agg(sum(col("__w") * col("__x")).as("__m"))
      val mis = margins.filter(col("__y") * col("__m") <= lit(0L))
        .select(col("__id"))
      val delta = feats.join(mis, Seq("__id"), "left_semi")
        .groupBy(col("__b"))
        .agg(sum(col("__y") * col("__x")).as("__d"))
      // buckets-row state; eager checkpoint truncates per-round lineage
      w = w.join(delta, Seq("__b"), "left")
        .select(col("__b"),
          (col("__w") + coalesce(col("__d"), lit(0L))).as("__w"))
        .localCheckpoint(true)
    }

    feats.join(broadcast(w), Seq("__b"))
      .groupBy(col("__id"), col("__y"))
      .agg(sum(col("__w") * col("__x")).as("margin"))
      .select(col("__id").as(idCol), col("__y").as("label"), col("margin"),
        when(col("margin") > 0, 1L).otherwise(-1L).as("predicted"))
  }
}
