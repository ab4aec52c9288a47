package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.LongType

import graft.plans.KmvSketchAgg

/** KMV (k-minimum-values) sketch algebra — distinct counts AND set
  * operations (union / intersection / Jaccard) across groups from
  * bounded sketches, never a join (Beyer et al., "On Synopses for
  * Distinct-Value Estimation Under Multiset Operations", SIGMOD'07).
  *
  * The sketch of a group is the k smallest distinct md5 hashes of its
  * values ([[KmvSketchAgg]] — map-side-combinable, ≤ k per partial).
  * With hashes uniform on [0, 1):
  *  - distinct count ≈ (k−1)/h₍k₎ (h₍k₎ = k-th smallest hash);
  *  - the k smallest of skA ∪ skB IS the union's sketch, so union
  *    cardinality uses the same estimator;
  *  - the fraction of the union sketch present in BOTH input sketches
  *    estimates Jaccard, and intersection ≈ J · |union| — overlap
  *    matrices across n sources cost n sketches + n² array ops on
  *    k-sized arrays (vs n² joins for the exact matrix, q155).
  *
  * All estimator arithmetic is INTEGER (the hash's first 8 hex chars
  * as a 32-bit uniform; BIGINT `div`), so estimates are bit-identical
  * in any engine — the gate oracle replays the whole estimator in SQL
  * (the q197 property). Unlike HLL (q89), which only unions, KMV
  * supports intersections; unlike both, its bottom-k sample is also a
  * uniform sample of the distinct-value space (usable for dictionary
  * sampling).
  *
  * Reference anchor: beyond-reference (the reference has no sketches;
  * SURVEY §4.2 names sketch pre-aggregation as the 100 TB swap). */
object Kmv {

  /** 2^32 — the prefix-hash domain for the integer estimator. */
  private val Dom = 4294967296L

  private def idiv(a: Column, b: Column): Column =
    ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(a.cast(LongType)),
      ColumnBridge.expression(b.cast(LongType)), evalMode =
        org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY))

  /** Per-group sketch: (groupCol, kmv array<string> ascending). `hash`
    * must be a deterministic hex-string hash of the value (md5). */
  def sketch(df: DataFrame, groupCol: String, hash: Column,
             k: Int): DataFrame = {
    val agg = KmvSketchAgg(ColumnBridge.expression(hash), k)
    df.groupBy(col(groupCol))
      .agg(ColumnBridge.column(agg.toAggregateExpression()).as("kmv"))
  }

  /** 32-bit integer prefix of hash `h` (uniform on [0, 2^32)). */
  private def prefix32(h: Column): Column =
    conv(substring(h, 1, 8), 16, 10).cast(LongType)

  /** Distinct-count estimate from a k-capped sketch: exact size when
    * the sketch isn't full, else (k−1)·2^32 div (prefix(h₍k₎)+1) — all
    * BIGINT, the +1 guards the zero hash. */
  def estimateDistinct(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast(LongType))
      .otherwise(idiv(lit((k - 1).toLong * Dom),
        prefix32(element_at(sk, k)) + 1L))

  /** Pairwise overlap estimates for every group pair (a < b):
    * (src_a, src_b, est_a, est_b, est_union, est_inter, jaccard_micro)
    * — pure sketch algebra on k-sized arrays. */
  def pairStats(sketches: DataFrame, groupCol: String, k: Int): DataFrame = {
    val a = sketches.select(col(groupCol).as("src_a"), col("kmv").as("__ska"))
    val b = sketches.select(col(groupCol).as("src_b"), col("kmv").as("__skb"))
    val merged = slice(array_sort(array_union(col("__ska"), col("__skb"))), 1, k)
    val kp = size(col("__merged"))
    val matches = size(array_intersect(
      array_intersect(col("__merged"), col("__ska")), col("__skb")))
    a.join(b, col("src_a") < col("src_b"))
      .withColumn("__merged", merged)
      .withColumn("__m", matches)
      .withColumn("est_a", estimateDistinct(col("__ska"), k))
      .withColumn("est_b", estimateDistinct(col("__skb"), k))
      .withColumn("est_union", estimateDistinct(col("__merged"), k))
      .withColumn("est_inter",
        when(kp === 0, lit(0L))
          .otherwise(idiv(col("est_union") * col("__m"), kp)))
      .withColumn("jaccard_micro",
        when(kp === 0, lit(0L))
          .otherwise(idiv(col("__m") * 1000000L, kp)))
      .select(col("src_a"), col("src_b"), col("est_a"), col("est_b"),
        col("est_union"), col("est_inter"), col("jaccard_micro"))
  }
}
