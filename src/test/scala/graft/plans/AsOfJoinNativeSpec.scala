package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.AsOfJoin

class AsOfJoinNativeSpec extends SparkSuite {

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("native as-of matches the hand-checked semantics (ties, misses, gaps)") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(10), "e1"), (1L, ts(20), "e2"), (1L, ts(5), "e0"),
      (2L, ts(15), "e3"), // key with only-later right rows → null
      (3L, ts(30), "e4")) // key absent from right → null
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts(10), 100.0), // tie with e1 → visible to e1
      (1L, ts(12), 120.0),
      (2L, ts(99), 999.0),
      (4L, ts(1), 4.0)) // key absent from left → dropped
      .toDF("k", "t", "v")
    val got = AsOfJoin.asOfNative(left, right, "k", "t")
      .collect().map(r => (r.getString(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(got == Map("e0" -> null, "e1" -> 100.0, "e2" -> 120.0,
      "e3" -> null, "e4" -> null))
  }

  test("native ≡ composed on the events table (clicks enriched with purchases)") {
    val ev = graft.core.Tables(spark, "/root/testdata/sf0.001", "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("last_purchase"))
    def resultMap(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "last_purchase").collect()
        .map(r => r.get(0) -> (if (r.isNullAt(1)) null else r.get(1))).toMap
    val native = resultMap(AsOfJoin.asOfNative(clicks, purchases, "user_id", "ts"))
    val composed = resultMap(AsOfJoin.asOf(clicks, purchases, "user_id", "ts"))
    assert(native.size > 100 && native == composed)
  }

  test("plan: AsOfJoinExec node, co-partitioned sorted children, no window, no pair join") {
    import spark.implicits._
    val left = Seq((1L, ts(10), "x")).toDF("k", "t", "tag")
    val right = Seq((1L, ts(5), 1.0)).toDF("k", "t", "v")
    val plan = AsOfJoin.asOfNative(left, right, "k", "t")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(plan.contains("Sort ["), plan) // EnsureRequirements honored the ordering
    assert(!plan.contains("windowspecdefinition"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("NestedLoop") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("payload null-typing survives an all-miss partition and empty right side") {
    import spark.implicits._
    val left = Seq((7L, ts(1), "only"), (8L, ts(2), "also")).toDF("k", "t", "tag")
    val right = Seq.empty[(Long, Timestamp, Double)].toDF("k", "t", "v")
    val out = AsOfJoin.asOfNative(left, right, "k", "t")
    assert(out.columns.toSeq == Seq("k", "t", "tag", "v"))
    assert(out.collect().forall(_.isNullAt(3)))
  }

  test("filter pushdown rule: left and key predicates cross the custom node into both scans") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.core.Tables(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("last_purchase"))
    val q = AsOfJoin.asOfNative(clicks, purchases, "user_id", "ts")
      .filter(col("user_id") < 50 && col("event_id") >= 0)
    // logical: no Filter remains above the custom node
    val opt = q.queryExecution.optimizedPlan
    assert(opt.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.child.isInstanceOf[AsOfJoinPlan] => f
    }.isEmpty, opt.toString)
    // physical: the key predicate reached the data filter on BOTH sides
    // (string match — AQE wraps the plan so collect() can't descend
    // pre-exec, and PushedFilters lists get truncated in toString; the
    // per-side Filter-above-scan nodes print in full)
    val phys = q.queryExecution.executedPlan.toString
    assert("\\(user_id#\\d+L? < 50\\)".r.findAllIn(phys).size == 2, phys)
    // and the result equals filter-after-join through the composed impl
    val expect = AsOfJoin.asOf(clicks, purchases, "user_id", "ts")
      .filter(col("user_id") < 50 && col("event_id") >= 0)
      .select("event_id", "last_purchase").collect()
      .map(r => r.get(0) -> (if (r.isNullAt(1)) null else r.get(1))).toMap
    val got = q.select("event_id", "last_purchase").collect()
      .map(r => r.get(0) -> (if (r.isNullAt(1)) null else r.get(1))).toMap
    assert(got.nonEmpty && got == expect)
  }

  test("filter pushdown rule: payload predicates stay above the node") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    import spark.implicits._
    val left = Seq((1L, ts(10), "x")).toDF("k", "t", "tag")
    val right = Seq((1L, ts(5), 1.0)).toDF("k", "t", "v")
    val q = AsOfJoin.asOfNative(left, right, "k", "t").filter(col("v") > 0.5)
    val above = q.queryExecution.optimizedPlan.collect {
      case f: LFilter if f.child.isInstanceOf[AsOfJoinPlan] => f
    }
    assert(above.size == 1, q.queryExecution.optimizedPlan.toString)
    assert(q.collect().map(_.getDouble(3)).toSeq == Seq(1.0))
  }

  test("forward direction: earliest right at-or-after, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(10), "e1"), (1L, ts(20), "e2"), (1L, ts(30), "e3"),
      (2L, ts(5), "e4")) // right rows for k=2 are all before → null
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts(10), 100.0), // tie with e1 → visible (at-or-after)
      (1L, ts(25), 250.0),
      (2L, ts(1), 5.0))
      .toDF("k", "t", "v")
    val got = AsOfJoin.asOfNative(left, right, "k", "t", "forward", None)
      .collect().map(r => (r.getString(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(got == Map("e1" -> 100.0, "e2" -> 250.0, "e3" -> null, "e4" -> null))
  }

  test("tolerance: nearest match outside the window nulls out") {
    import spark.implicits._
    val left = Seq((1L, ts(100), "near"), (1L, ts(500), "far"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, ts(90), 9.0)).toDF("k", "t", "v")
    // timestamps → tolerance in MICROseconds; 60 s window
    val got = AsOfJoin.asOfNative(left, right, "k", "t",
      "backward", Some(60L * 1000 * 1000))
      .collect().map(r => (r.getString(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(got == Map("near" -> 9.0, "far" -> null))
  }

  test("nearest direction: closer of before/after, ties prefer backward, tolerance bounds both") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(10), "mid"),    // right at 7 (Δ3) and 12 (Δ2) → forward wins
      (1L, ts(14), "tieb"),   // right at 12 (Δ2) and 16 (Δ2) → tie → backward
      (1L, ts(16), "exact"),  // right exactly at 16 → Δ0 backward (tie rule)
      (2L, ts(50), "onlyb"),  // only an earlier right row → backward
      (3L, ts(50), "onlyf"),  // only a later right row → forward
      (4L, ts(50), "none"))   // no right rows for the key → null
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts(7), 7.0), (1L, ts(12), 12.0), (1L, ts(16), 16.0),
      (2L, ts(1), 1.0), (3L, ts(99), 99.0))
      .toDF("k", "t", "v")
    def got(tol: Option[Long]) =
      AsOfJoin.asOfNative(left, right, "k", "t", "nearest", tol)
        .collect().map(r => (r.getString(2),
          if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(got(None) == Map("mid" -> 12.0, "tieb" -> 12.0, "exact" -> 16.0,
      "onlyb" -> 1.0, "onlyf" -> 99.0, "none" -> null))
    // 5 s window: onlyb (Δ49) and onlyf (Δ49) fall out; mid/tieb/exact stay
    assert(got(Some(5L * 1000 * 1000)) == Map("mid" -> 12.0, "tieb" -> 12.0,
      "exact" -> 16.0, "onlyb" -> null, "onlyf" -> null, "none" -> null))
  }

  test("nearest ≡ closer-of(backward, forward) on the events table") {
    val ev = graft.core.Tables(spark, "/root/testdata/sf0.001", "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("p"))
    def m(df: org.apache.spark.sql.DataFrame, tcol: String) =
      df.collect().map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.sql.Timestamp](tcol)),
          Option(r.getAs[Any]("p")))).toMap
    // backward/forward runs carry the matched right ts so the oracle can
    // re-derive the nearest choice per row
    val pts = purchases.withColumn("rts", col("ts"))
    val bwd = m(AsOfJoin.asOfNative(clicks, pts, "user_id", "ts"), "rts")
    val fwd = m(AsOfJoin.asOfNative(clicks, pts, "user_id", "ts",
      "forward", None), "rts")
    val lts = clicks.collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[java.sql.Timestamp]("ts")).toMap
    val near = m(AsOfJoin.asOfNative(clicks, pts, "user_id", "ts",
      "nearest", None), "rts")
    assert(near.nonEmpty && near.size == lts.size)
    near.foreach { case (eid, (_, gotP)) =>
      val lt = lts(eid).getTime
      def d(c: (Option[java.sql.Timestamp], Option[Any])) =
        c._1.map(t => math.abs(t.getTime - lt)).getOrElse(Long.MaxValue)
      val expect = if (d(bwd(eid)) <= d(fwd(eid))) bwd(eid)._2 else fwd(eid)._2
      assert(gotP == expect, s"event $eid: got $gotP expected $expect")
    }
  }

  test("multi-key as-of: the match must agree on every key column") {
    import spark.implicits._
    val left = Seq(
      (1L, "a", ts(20), "e1"), // right (1,a,10) matches; (1,b,15) is closer but wrong k2
      (1L, "b", ts(20), "e2"), // right (1,b,15)
      (2L, "a", ts(20), "e3")) // k1=2 only has k2=b rows → null
      .toDF("k1", "k2", "t", "tag")
    val right = Seq(
      (1L, "a", ts(10), 10.0), (1L, "b", ts(15), 15.0), (2L, "b", ts(5), 5.0))
      .toDF("k1", "k2", "t", "v")
    val got = AsOfJoin.asOfNative(left, right, Seq("k1", "k2"), "t",
      "backward", None)
      .collect().map(r => (r.getString(3),
        if (r.isNullAt(4)) null else r.getDouble(4))).toMap
    assert(got == Map("e1" -> 10.0, "e2" -> 15.0, "e3" -> null))
    // single-key overload ≡ Seq-of-one
    val one = AsOfJoin.asOfNative(left, right, "k1", "t")
    val oneSeq = AsOfJoin.asOfNative(left, right, Seq("k1"), "t",
      "backward", None)
    assert(one.collect().map(_.toSeq).toSet ==
      oneSeq.collect().map(_.toSeq).toSet)
  }

  test("forward ≡ DuckDB-style forward on events (spot agreement with backward impl reversed)") {
    // forward(L, R) on time == backward(L, R) with both time columns
    // negated — an internal consistency check on real data
    val ev = graft.core.Tables(spark, "/root/testdata/sf0.001", "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("next_purchase"))
    def m(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "next_purchase").collect()
        .map(r => r.get(0) -> (if (r.isNullAt(1)) null else r.get(1))).toMap
    val fwd = m(AsOfJoin.asOfNative(clicks, purchases, "user_id", "ts",
      "forward", None))
    val negL = clicks.withColumn("tneg", -unix_micros(col("ts")))
      .drop("ts").withColumnRenamed("tneg", "ts")
    val negR = purchases.withColumn("tneg", -unix_micros(col("ts")))
      .drop("ts").withColumnRenamed("tneg", "ts")
    val rev = m(AsOfJoin.asOfNative(negL, negR, "user_id", "ts"))
    assert(fwd.nonEmpty && fwd == rev)
  }

  test("date-typed time column: backward match and day-unit tolerance") {
    import spark.implicits._
    import java.sql.Date
    val d = Date.valueOf(_: String)
    val left = Seq(
      (1L, d("2024-03-10"), "close"), // 2 days after the right row
      (1L, d("2024-03-30"), "far"))   // 22 days after → outside tolerance
      .toDF("k", "t", "tag")
    val right = Seq((1L, d("2024-03-08"), 8.0)).toDF("k", "t", "v")
    val plain = AsOfJoin.asOfNative(left, right, "k", "t")
      .collect().map(r => r.getString(2) -> r.getDouble(3)).toMap
    assert(plain == Map("close" -> 8.0, "far" -> 8.0))
    // DateType stores days → tolerance unit is DAYS
    val tol = AsOfJoin.asOfNative(left, right, "k", "t", "backward", Some(7L))
      .collect().map(r => (r.getString(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(tol == Map("close" -> 8.0, "far" -> null))
  }

  test("duplicate right rows at one timestamp: the last one wins (stable with sorted input)") {
    import spark.implicits._
    // two right rows at t=10 for the same key: the merge keeps the later
    // one in (key, time) order; with a value-distinct tiebreak column the
    // result is deterministic
    val left = Seq((1L, ts(11), "e")).toDF("k", "t", "tag")
    val right = Seq((1L, ts(10), 1.0), (1L, ts(10), 2.0)).toDF("k", "t", "v")
    val v = AsOfJoin.asOfNative(left, right, "k", "t").select("v")
      .collect().head.getDouble(0)
    assert(v == 1.0 || v == 2.0) // one of the tied rows, never null
  }

  test("allow_exact_matches=false: backward strictly-before, forward strictly-after") {
    import spark.implicits._
    val left = Seq((1L, ts(10), "e1"), (1L, ts(20), "e2"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, ts(5), 5.0), (1L, ts(10), 10.0), (1L, ts(20), 20.0),
      (1L, ts(25), 25.0)).toDF("k", "t", "v")
    def run(dir: String) = AsOfJoin
      .asOfNative(left, right, "k", "t", dir, None, allowExactMatches = false)
      .collect().map(r => r.getString(2) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    // inclusive would give e1→10, e2→20 on both directions
    assert(run("backward") == Map("e1" -> 5.0, "e2" -> 10.0))
    assert(run("forward") == Map("e1" -> 20.0, "e2" -> 25.0))
  }

  test("allow_exact_matches=false + nearest: exact instant excluded, parked run visible later") {
    import spark.implicits._
    // right has a DUPLICATE run at t=10 that must not block the true
    // strictly-after candidate for the left row at t=10, and must
    // resurface as the backward candidate for the later left row
    val left = Seq((1L, ts(10), "e1"), (1L, ts(11), "e2"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, ts(7), 7.0), (1L, ts(10), 101.0), (1L, ts(10), 102.0),
      (1L, ts(12), 12.0)).toDF("k", "t", "v")
    val got = AsOfJoin
      .asOfNative(left, right, "k", "t", "nearest", None,
        allowExactMatches = false)
      .collect().map(r => r.getString(2) -> r.getDouble(3)).toMap
    // e1@10: candidates 7 (|Δ|=3) and 12 (|Δ|=2) — the t=10 run is
    // excluded — nearest is 12. e2@11: backward candidates now include
    // the parked t=10 run (last one wins) at |Δ|=1, forward 12 at
    // |Δ|=1 — tie prefers backward → 102.
    assert(got == Map("e1" -> 12.0, "e2" -> 102.0))
  }

  test("allow_exact_matches=false ≡ inclusive on data with no exact ties (events)") {
    val ev = graft.core.Tables(spark, "/root/testdata/sf0.001", "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("v"))
    // drop purchases landing on an exact click timestamp so the strict
    // and inclusive semantics must coincide
    val noTies = purchases.join(
      clicks.select(col("user_id"), col("ts")), Seq("user_id", "ts"),
      "left_anti")
    def resultMap(strict: Boolean) = AsOfJoin
      .asOfNative(clicks, noTies, "user_id", "ts", "backward", None,
        allowExactMatches = !strict)
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(resultMap(strict = true) == resultMap(strict = false))
  }
}
