package graft.operators

import java.sql.Timestamp

import graft.SparkSuite

class AsOfJoinSpec extends SparkSuite {

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("asOf picks the latest right row at-or-before each left row, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(10), "e1"), (1L, ts(20), "e2"), (1L, ts(5), "e0"),
      (2L, ts(15), "e3"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts(10), 100.0), // tie with e1 → visible to e1
      (1L, ts(12), 120.0),
      (2L, ts(99), 999.0)) // after e3 → e3 sees null
      .toDF("k", "t", "v")
    val got = AsOfJoin.asOf(left, right, "k", "t")
      .collect().map(r => (r.getString(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(got == Map("e0" -> null, "e1" -> 100.0, "e2" -> 120.0, "e3" -> null))
  }

  test("plan: one shuffle on the key, no nested-loop join") {
    import spark.implicits._
    val left = Seq((1L, ts(10), "x")).toDF("k", "t", "tag")
    val right = Seq((1L, ts(5), 1.0)).toDF("k", "t", "v")
    val plan = AsOfJoin.asOf(left, right, "k", "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("windowspecdefinition(k"), plan)
  }
}
