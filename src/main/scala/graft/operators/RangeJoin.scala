package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join at scale — the bucket-point equi-join
  * rewrite q45's broadcast-NLJ form documents as its big-band-table
  * successor. A range predicate `lo <= p AND p <= hi` has no equi-join
  * key, so Spark's only native plans are broadcast NLJ (fine for a
  * dim-sized band table, quadratic otherwise). The standard rewrite
  * manufactures the key: fix a bucket width W, explode every interval
  * to the W-aligned buckets it overlaps, map every point to its home
  * bucket, equi-join on the bucket id, and re-check the exact
  * predicate as a residual filter.
  *
  * Scale shape: ONE hash equi-join; interval fan-out is
  * ⌈len/W⌉ + 1 rows per interval and each point is exactly one row —
  * pick W near the median interval length so both sides stay ~1×.
  * Skewed buckets (a hot value range) salt like any other hot key.
  * No broadcast of anything fact-sized, no cross join.
  *
  * Output: every (point row ++ interval row) pair whose point lies in
  * [lo, hi] — inner-join semantics, exactly the NLJ result (the
  * rewrite only prunes pairs the residual would reject; equality is
  * pinned in RangeJoinSpec).
  *
  * Reference anchor: beyond-reference (the reference's only interval
  * predicate is the dayband CASE cascade, to_gold.py:36-39; the
  * bucket rewrite is the standard interval-join surrogate key). */
object RangeJoin {

  def bucketedPointJoin(points: DataFrame, intervals: DataFrame,
                        pointCol: String, loCol: String, hiCol: String,
                        bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val p = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    p.join(iv, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** INTERVAL-OVERLAP equi-join rewrite — the interval×interval
    * sibling of [[bucketedPointJoin]]: all pairs with
    * `a.lo <= b.hi AND b.lo <= a.hi` (closed-interval overlap).
    * Both sides explode to their W-aligned bucket range and equi-join
    * on the bucket; a pair overlapping k shared buckets would emit k
    * times, so the join keeps only the FIRST shared bucket —
    * `bucket == max(⌊a.lo/W⌋, ⌊b.lo/W⌋)` (the later-starting
    * interval's first bucket, which any overlapping pair shares) —
    * making each pair match exactly once with NO post-join dedup
    * (the [[GridJoin]] home-cell rule in 1-D).
    *
    * Scale: ONE hash equi-join, fan-out ⌈len/W⌉+1 per row per side —
    * W near the median interval length keeps both sides ~1×; a hot
    * bucket (many concurrent intervals) is the salting dial, and its
    * OUTPUT is itself quadratic (truly-overlapping pairs), so extra
    * candidates are answer-driven. Spark's native alternative is a
    * cartesian/NLJ with the full predicate. */
  def bucketedOverlapJoin(a: DataFrame, b: DataFrame,
                          loA: String, hiA: String,
                          loB: String, hiB: String,
                          bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val ea = a.withColumn("__bucket",
      explode(sequence(
        floor(col(loA) / bucketWidth).cast("long"),
        floor(col(hiA) / bucketWidth).cast("long"))))
    val eb = b.withColumn("__bucket",
      explode(sequence(
        floor(col(loB) / bucketWidth).cast("long"),
        floor(col(hiB) / bucketWidth).cast("long"))))
    ea.join(eb, Seq("__bucket"))
      .filter(col(loA) <= col(hiB) && col(loB) <= col(hiA))
      .filter(col("__bucket") ===
        greatest(floor(col(loA) / bucketWidth).cast("long"),
          floor(col(loB) / bucketWidth).cast("long")))
      .drop("__bucket")
  }
}
