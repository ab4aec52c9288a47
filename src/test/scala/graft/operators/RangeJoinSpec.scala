package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class RangeJoinSpec extends SparkSuite {

  import spark.implicits._

  test("bucketed rewrite equals the theta join; no nested-loop in the plan") {
    val points = (0L until 500L).map(i => (i, i * 7 % 400)).toDF("pid", "v")
    val ivs = Seq((1L, 10L, 35L), (2L, 30L, 30L), (3L, 390L, 600L),
      (4L, 0L, 399L)).toDF("iid", "lo", "hi")
    val got = RangeJoin
      .bucketedPointJoin(points, ivs, "v", "lo", "hi", bucketWidth = 50L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(ivs, col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == naive)
    assert(naive.nonEmpty)
    val plan = RangeJoin
      .bucketedPointJoin(points, ivs, "v", "lo", "hi", bucketWidth = 50L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("overlap join: equals the theta join, each pair exactly once, no NLJ") {
    val a = (0L until 300L).map(i => (i, i * 13 % 900, i * 13 % 900 + i % 70))
      .toDF("id_a", "lo_a", "hi_a")
    val b = (0L until 300L).map(i => (i, i * 31 % 900, i * 31 % 900 + i % 55))
      .toDF("id_b", "lo_b", "hi_b")
    val joined = RangeJoin.bucketedOverlapJoin(
      a, b, "lo_a", "hi_a", "lo_b", "hi_b", bucketWidth = 60L)
      .select("id_a", "id_b")
    // exactly once: no pair may appear twice even pre-distinct
    val rows = joined.as[(Long, Long)].collect().toSeq
    assert(rows.size == rows.toSet.size, "a pair matched more than once")
    val naive = a.join(b, col("lo_a") <= col("hi_b") && col("lo_b") <= col("hi_a"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(rows.toSet == naive)
    assert(naive.nonEmpty)
    val plan = RangeJoin.bucketedOverlapJoin(
      a, b, "lo_a", "hi_a", "lo_b", "hi_b", bucketWidth = 60L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("interval fan-out is ceil(len/W)+1 bounded") {
    val ivs = Seq((1L, 0L, 99L), (2L, 0L, 100L), (3L, 55L, 56L))
      .toDF("iid", "lo", "hi")
    // reach into the same explode the operator uses
    val fan = ivs.withColumn("b",
      explode(sequence(floor(col("lo") / 50L).cast("long"),
        floor(col("hi") / 50L).cast("long"))))
      .groupBy("iid").count().as[(Long, Long)].collect().toMap
    assert(fan == Map(1L -> 2L, 2L -> 3L, 3L -> 1L))
  }
}
