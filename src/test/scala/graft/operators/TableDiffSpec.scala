package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class TableDiffSpec extends SparkSuite {

  import spark.implicits._

  test("keyed: classification incl. null-safe value compare") {
    val before = Seq(
      (1L, Some("a"), Some(10L)), // unchanged
      (2L, Some("b"), None),      // unchanged with a null field
      (3L, None, Some(30L)),      // changed: null -> value
      (4L, Some("d"), Some(40L)), // changed: value edit
      (5L, Some("e"), Some(50L))  // removed
    ).toDF("k", "s", "v")
    val after = Seq(
      (1L, Some("a"), Some(10L)),
      (2L, Some("b"), None: Option[Long]),
      (3L, Some("x"), Some(30L)),
      (4L, Some("d"), Some(41L)),
      (6L, Some("f"), Some(60L)) // added
    ).toDF("k", "s", "v")
    val got = TableDiff.keyed(before, after, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "unchanged",
      3L -> "changed", 4L -> "changed", 5L -> "removed", 6L -> "added"))
  }

  test("keyed: schema mismatch rejected; plan is an equi-join") {
    val a = Seq((1L, "x")).toDF("k", "s")
    intercept[IllegalArgumentException] {
      TableDiff.keyed(a, Seq((1L, 2L)).toDF("k", "v"), Seq("k"))
    }
    val plan = TableDiff.keyed(a, a, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
  }
}
