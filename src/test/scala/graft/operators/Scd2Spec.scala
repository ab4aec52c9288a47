package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class Scd2Spec extends SparkSuite {

  import spark.implicits._

  private def changes = Seq(
    // key 1: three versions at t=10, 20, 30
    (1L, 10L, "a1"), (1L, 20L, "a2"), (1L, 30L, "a3"),
    // key 2: single (current-only) version
    (2L, 5L, "b1")
  ).toDF("k", "ts", "attr")

  test("intervals: half-open partition of the timeline, NULL = current") {
    val iv = Scd2.intervals(changes, Seq("k"), "ts")
      .select("k", "valid_from", "valid_to", "attr")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getString(3))).toSet
    assert(iv == Set(
      (1L, 10L, 20L, "a1"), (1L, 20L, 30L, "a2"), (1L, 30L, -1L, "a3"),
      (2L, 5L, -1L, "b1")))
  }

  test("temporalJoin: boundary semantics, exactly-one match, left keeps early facts") {
    val hist = Scd2.intervals(changes, Seq("k"), "ts")
    val facts = Seq(
      (1L, 10L), // == valid_from → a1 (inclusive)
      (1L, 19L), // inside first interval → a1
      (1L, 20L), // == valid_to of a1 → a2 (exclusive upper)
      (1L, 99L), // open-ended current → a3
      (2L, 5L),  // single version, at its start → b1
      (1L, 9L),  // BEFORE first version → no match
      (3L, 50L)  // unknown key → no match
    ).toDF("k", "t")
    val inner = Scd2.temporalJoin(facts, hist, Seq("k"), "t")
      .select(facts("k"), facts("t"), hist("attr"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(inner == Set(
      (1L, 10L, "a1"), (1L, 19L, "a1"), (1L, 20L, "a2"),
      (1L, 99L, "a3"), (2L, 5L, "b1")))
    // exactly one match per matched fact (intervals partition time)
    val counts = Scd2.temporalJoin(facts, hist, Seq("k"), "t")
      .groupBy(facts("k"), facts("t")).count()
      .select("count").as[Long].collect()
    assert(counts.forall(_ == 1L))
    // left join keeps the unmatched facts with null attrs
    val left = Scd2.temporalJoin(facts, hist, Seq("k"), "t", "left")
      .select(facts("k"), facts("t"), hist("attr"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2)))
    assert(left.length == 7)
    assert(left.count(_._3 == null) == 2)
  }

  test("temporalJoin plans as a hash equi-join on the key, not a nested loop") {
    val hist = Scd2.intervals(changes, Seq("k"), "ts")
    val facts = Seq((1L, 15L)).toDF("k", "t")
    val plan = Scd2.temporalJoin(facts, hist, Seq("k"), "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
