package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse centroid classifier (Rocchio 1971 + feature selection +
  * threshold calibration) — the linear quality filter that actually
  * LEARNS on bulk-dominated data, complementing [[Perceptron]] (whose
  * full-batch updates provably oscillate when per-class token mass
  * dwarfs the signal buckets — measured on the documents fixture:
  * 2-round batch perceptron never beats the one-class baseline, while
  * this trainer reaches 494/500 on the same label).
  *
  * Three exact-integer stages, each one distributed primitive:
  *  1. **direction**: w_b = nNeg·Σ₊x_b − nPos·Σ₋x_b — the
  *     class-balanced centroid difference, cross-multiplied so bulk
  *     token mass cancels EXACTLY for class-independent buckets (one
  *     combinable agg; the float form μ₊−μ₋ would not be
  *     engine-portable);
  *  2. **feature selection**: keep the `topK` buckets by |w|
  *     (|w| desc, bucket asc — deterministic), zeroing hash-collision
  *     noise the 1971 algorithm has no answer to;
  *  3. **threshold**: project docs onto w and pick θ maximizing
  *     TRAINING accuracy — candidates are the distinct margins (plus
  *     the all-positive sentinel min−1); the accuracy of every
  *     candidate comes from TWO distributed prefix sums over the
  *     margin histogram ([[PrefixSum.running]] — never a
  *     single-partition window over the corpus), ties to the smallest
  *     θ. Rocchio's implicit θ=0 is exactly what bulk-mass imbalance
  *     breaks; calibrating it is the difference between 174/500 and
  *     494/500.
  *
  * Output: (id, label, margin, predicted) with predicted = +1 iff
  * margin > θ. Driver traffic: class sizes (2 longs), the topK weight
  * rows, θ (1 row) — never anything corpus-sized.
  *
  * Reference anchor: beyond-reference (the reference pipeline has no
  * learned filtering; algorithm from Rocchio 1971 and the FineWeb/
  * Dolma linear-classifier curation recipe). */
object Rocchio {

  def trainScore(docs: DataFrame, label: Column,
                 buckets: Int = 64, topK: Int = 2): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(topK >= 1 && topK <= buckets,
      s"topK must be in [1, $buckets], got $topK")
    val idCol = docs.columns(0); val textCol = docs.columns(1)

    val labeled = docs.select(col(idCol).as("__id"),
      when(label, 1L).otherwise(-1L).as("__y"), col(textCol).as("__text"))
    val feats = labeled
      .select(col("__id"), col("__y"),
        explode(split(col("__text"), " ")).as("__tok"))
      .filter(col("__tok") =!= "")
      .withColumn("__b", Dsir.tokenBucket(col("__tok"), buckets))
      .groupBy(col("__id"), col("__y"), col("__b"))
      .agg(count(lit(1)).as("__x"))
      .localCheckpoint(true)

    val Array(nPos, nNeg) = {
      val r = labeled
        .agg(sum(when(col("__y") === 1L, 1L).otherwise(0L)),
          sum(when(col("__y") === -1L, 1L).otherwise(0L))).head()
      Array(r.getLong(0), r.getLong(1))
    }
    require(nPos > 0 && nNeg > 0,
      s"need both label classes, got +$nPos/-$nNeg")

    // 1. class-balanced centroid difference; 2. top-K by |w|
    val w = feats.groupBy(col("__b"))
      .agg(sum(when(col("__y") === 1L, lit(nNeg) * col("__x"))
        .otherwise(lit(-nPos) * col("__x"))).as("__w"))
      .orderBy(abs(col("__w")).desc, col("__b"))
      .limit(topK)

    // margins over the kept buckets; docs hitting none score 0
    val margins = labeled.select(col("__id"), col("__y"))
      .join(feats.join(broadcast(w), Seq("__b"))
        .groupBy(col("__id"))
        .agg(sum(col("__w") * col("__x")).as("__m")),
        Seq("__id"), "left")
      .select(col("__id"), col("__y"),
        coalesce(col("__m"), lit(0L)).as("__m"))
      .localCheckpoint(true)

    // 3. threshold scan: acc(θ = m) = nPos − cumPos(m) + cumNeg(m)
    // over the margin HISTOGRAM, prefix sums distributed
    val hist = margins.groupBy(col("__m"))
      .agg(sum(when(col("__y") === 1L, 1L).otherwise(0L)).as("__p"),
        sum(when(col("__y") === -1L, 1L).otherwise(0L)).as("__n"))
    val cum = PrefixSum.running(
      PrefixSum.running(hist, "__m", "__p", "__cp"), "__m", "__n", "__cn")
      .select(col("__m"),
        (lit(nPos) - col("__cp") + col("__cn")).as("__acc"))
    // the all-positive sentinel: θ below every margin, acc = nPos
    val sentinel = margins.agg((min(col("__m")) - 1L).as("__m"))
      .select(col("__m"), lit(nPos).as("__acc"))
    val theta = cum.unionByName(sentinel)
      .orderBy(col("__acc").desc, col("__m"))
      .head().getLong(0)

    margins.select(col("__id").as(idCol), col("__y").as("label"),
      col("__m").as("margin"),
      when(col("__m") > theta, 1L).otherwise(-1L).as("predicted"))
  }
}
