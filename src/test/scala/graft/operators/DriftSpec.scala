package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class DriftSpec extends SparkSuite {

  import spark.implicits._

  private def ks(rows: Seq[(Long, Boolean)]) =
    Drift.ksStat(rows.toDF("x", "is_a"), col("x"), col("is_a"))
      .collect().head

  test("identical samples: D = 0") {
    val r = ks(Seq(1L, 2L, 3L, 4L).flatMap(x => Seq((x, true), (x, false))))
    assert(r.getLong(2) == 0L && r.getLong(3) == 0L)
  }

  test("disjoint supports: D = 1, arg at A's max value") {
    // A = {1,2}, B = {10,11}: at x=2 the CDF gap is 1 - 0
    val r = ks(Seq((1L, true), (2L, true), (10L, false), (11L, false)))
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 4L)       // D·nA·nB = 1·2·2
    assert(r.getLong(3) == 1000000L) // D = 1 exactly
    assert(r.getLong(4) == 2L)       // smallest value achieving the max
  }

  test("hand-computed mixed case; partitioning-invariant") {
    // A = {1,1,5}, B = {1,5,5}: at x=1 |3·2 − 3·1| = 3; at 5 |9−9| = 0
    val rows = Seq((1L, true), (1L, true), (5L, true),
      (1L, false), (5L, false), (5L, false))
    val r = ks(rows)
    assert(r.getLong(2) == 3L && r.getLong(4) == 1L)
    val r2 = Drift.ksStat(rows.toDF("x", "is_a").repartition(5),
      col("x"), col("is_a")).collect().head
    assert(r.toSeq == r2.toSeq)
  }
}
