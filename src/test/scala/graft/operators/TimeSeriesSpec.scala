package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** TimeSeries: LOCF, linear interpolation, OHLC bars — hand-computed
  * fixtures, series independence, edge-gap behavior. */
class TimeSeriesSpec extends SparkSuite {

  private def ev(rows: Seq[(String, Long, Long, Option[Double])]) = {
    import spark.implicits._
    rows.toDF("k", "t_us", "id", "v")
      .withColumn("ts", timestamp_micros(col("t_us")))
  }

  test("forwardFill: carries last observation, leaves leading nulls") {
    val df = ev(Seq(
      ("a", 1000000L, 1L, None),          // leading null → stays null
      ("a", 2000000L, 2L, Some(1.5)),
      ("a", 3000000L, 3L, None),          // ← 1.5
      ("a", 4000000L, 4L, None),          // ← 1.5 (long gap)
      ("a", 5000000L, 5L, Some(7.0)),
      ("b", 1500000L, 6L, Some(9.0)),     // other series independent
      ("b", 2500000L, 7L, None)))         // ← 9.0
    val got = TimeSeries.forwardFill(df, "k", "ts", "id", "v")
      .orderBy("k", "id")
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("id"),
        Option(r.getAs[java.lang.Double]("filled")).map(_.toDouble)))
    assert(got.toSeq == Seq(
      ("a", 1L, None), ("a", 2L, Some(1.5)), ("a", 3L, Some(1.5)),
      ("a", 4L, Some(1.5)), ("a", 5L, Some(7.0)),
      ("b", 6L, Some(9.0)), ("b", 7L, Some(9.0))))
  }

  test("interpolate: exact linear fill between neighbors, edge fills") {
    // observations at t=1s (v=2.0) and t=3s (v=4.0); gap at t=2s is
    // exactly halfway → 3.0; t=0.5s before first → edge-fill 2.0;
    // t=4s after last → edge-fill 4.0
    val df = ev(Seq(
      ("a", 500000L, 1L, None),
      ("a", 1000000L, 2L, Some(2.0)),
      ("a", 2000000L, 3L, None),
      ("a", 3000000L, 4L, Some(4.0)),
      ("a", 4000000L, 5L, None)))
    val got = TimeSeries.interpolate(df, "k", "ts", "id", "v")
      .orderBy("id").collect()
      .map(r => r.getAs[Double]("filled"))
    assert(got.toSeq == Seq(2.0, 2.0, 3.0, 4.0, 4.0))
  }

  test("interpolate: quarter-point gap lands at the exact ratio") {
    // t=1s v=0, t=5s v=8 → at t=2s: 0 + 8·(1/4) = 2.0 exactly
    val df = ev(Seq(
      ("a", 1000000L, 1L, Some(0.0)),
      ("a", 2000000L, 2L, None),
      ("a", 5000000L, 3L, Some(8.0))))
    val got = TimeSeries.interpolate(df, "k", "ts", "id", "v")
      .orderBy("id").collect().map(_.getAs[Double]("filled"))
    assert(got.toSeq == Seq(0.0, 2.0, 8.0))
  }

  test("interpolate: all-null series stays null") {
    val df = ev(Seq(("a", 1000000L, 1L, None), ("a", 2000000L, 2L, None)))
    val got = TimeSeries.interpolate(df, "k", "ts", "id", "v")
      .collect().map(r => r.isNullAt(r.fieldIndex("filled")))
    assert(got.forall(identity))
  }

  test("ohlcBars: open/close by time order, high/low, bucketing") {
    val df = ev(Seq(
      // bucket 0 (t < 10s): open=5 (t=1), close=3 (t=9), hi=8, lo=2
      ("a", 1000000L, 1L, Some(5.0)),
      ("a", 4000000L, 2L, Some(8.0)),
      ("a", 6000000L, 3L, Some(2.0)),
      ("a", 9000000L, 4L, Some(3.0)),
      // bucket 1: single row → all four equal
      ("a", 11000000L, 5L, Some(6.5)),
      // other key, bucket 0
      ("b", 2000000L, 6L, Some(1.0)),
      ("b", 3000000L, 7L, Some(4.0))))
    val got = TimeSeries.ohlcBars(df, "k", "ts", "id", "v", widthSec = 10L)
      .orderBy("k", "bucket").collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("bucket"),
        r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"),
        r.getAs[Long]("n")))
    assert(got.toSeq == Seq(
      ("a", 0L, 5.0, 8.0, 2.0, 3.0, 4L),
      ("a", 1L, 6.5, 6.5, 6.5, 6.5, 1L),
      ("b", 0L, 1.0, 4.0, 1.0, 4.0, 2L)))
  }

  test("interpolate: filled values always inside the neighbor envelope") {
    import spark.implicits._
    // pseudo-random gappy series: every interpolated point must lie in
    // [min(prev, next), max(prev, next)] — linearity's safety property
    val rows = (1 to 400).map { i =>
      val h = (i * 2654435761L) % 1009L
      ("s" + (i % 4), i.toLong * 500000L, i.toLong,
        if (h % 3 == 0) None else Some((h % 700L) / 10.0))
    }
    val df = rows.toDF("k", "t_us", "id", "v")
      .withColumn("ts", timestamp_micros(col("t_us")))
    val out = TimeSeries.interpolate(df, "k", "ts", "id", "v")
    // recompute neighbor bounds with plain windows and compare
    import org.apache.spark.sql.expressions.Window
    val wp = Window.partitionBy(col("k")).orderBy(col("t_us"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wn = Window.partitionBy(col("k")).orderBy(col("t_us"), col("id"))
      .rowsBetween(1, Window.unboundedFollowing)
    val checked = out
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wp))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wn))
      .filter(col("v").isNull && col("pv").isNotNull && col("nv").isNotNull)
      .withColumn("lo", least(col("pv"), col("nv")))
      .withColumn("hi", greatest(col("pv"), col("nv")))
      // 1e-6 slack: values are quantized to micros before interpolating
      .filter(col("filled") < col("lo") - 0.000002 ||
        col("filled") > col("hi") + 0.000002)
    assert(checked.count() == 0L, "interpolation left the envelope")
    // and some rows were actually interpolated
    assert(out.filter(col("v").isNull && col("filled").isNotNull).count() > 50)
  }

  test("ohlcPartials merged over any batch split ≡ single-pass bars") {
    import spark.implicits._
    // 300 rows, 3 series, ~60 buckets; deterministic pseudo-random
    val rows = (1 to 300).map { i =>
      val h = i * 2654435761L % 1000003L
      (s"g${i % 3}", (h % 600000L) * 1000000L, i.toLong, (h % 977L) / 10.0)
    }
    val df = rows.toDF("grp", "t_us", "id", "v")
    val direct = TimeSeries
      .ohlcPartials(df, "grp", "t_us", "id", "v", widthSec = 10000L)
    // split into 3 arbitrary batches (by id mod), union the partials
    val parts = (0 to 2).map(b =>
      TimeSeries.ohlcPartials(df.filter(col("id") % 3 === b),
        "grp", "t_us", "id", "v", widthSec = 10000L))
      .reduce(_ unionByName _)
    def bars(p: org.apache.spark.sql.DataFrame) =
      TimeSeries.ohlcMergeBars(p).collect()
        .map(r => (r.getAs[String]("grp"), r.getAs[Long]("bucket"),
          r.getAs[Double]("open"), r.getAs[Double]("high"),
          r.getAs[Double]("low"), r.getAs[Double]("close"),
          r.getAs[Long]("n"))).toSet
    assert(bars(parts) == bars(direct))
    // and merging the single-pass partials is the identity on them
    assert(bars(direct) == TimeSeries.ohlcMergeBars(direct).collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("bucket"),
        r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"),
        r.getAs[Long]("n"))).toSet)
  }

  test("ohlcBars: same-timestamp rows break ties by id") {
    val df = ev(Seq(
      ("a", 1000000L, 2L, Some(5.0)),
      ("a", 1000000L, 1L, Some(7.0)), // same ts, smaller id → open
      ("a", 1000000L, 3L, Some(6.0))))
    val got = TimeSeries.ohlcBars(df, "k", "ts", "id", "v", widthSec = 10L)
      .collect().map(r =>
        (r.getAs[Double]("open"), r.getAs[Double]("close"))).head
    assert(got == ((7.0, 6.0)))
  }
}
