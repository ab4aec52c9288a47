package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Time-series repair and downsampling over event streams — the
  * sensor/metrics cleanup stage a telemetry or training-signal pipeline
  * runs before any aggregation (gap repair must precede averaging, or
  * missing readings silently bias the means).
  *
  * Determinism contract (the repo-wide oracle rule): orderings are
  * always on a UNIQUE (ts, id) pair so window frames are reproducible;
  * interpolation arithmetic is integer-in/IEEE-double-out with the
  * exact expression shape mirrored by the DuckDB oracles — no
  * engine-varying math (no libm transcendentals).
  *
  * Scale notes: every operator here is one window pass partitioned by
  * the series key (parallel across series, no global sort) or one hash
  * aggregation on (series, bucket) — both map-side-combinable shapes
  * that survive a 1000-executor scale-up. State per row is O(1): LOCF
  * and interpolation carry at most one value/timestamp pair per
  * direction, never a buffered series.
  */
object TimeSeries {

  /** Last-observation-carried-forward: fill `valueCol`'s nulls with the
    * most recent non-null value in the same `keyCol` series, ordered by
    * (`tsCol`, `idCol`). Leading nulls (no prior observation) stay
    * null. One window pass per series — the frame carries ONE value of
    * state regardless of gap length. */
  def forwardFill(df: DataFrame, keyCol: String, tsCol: String,
                  idCol: String, valueCol: String,
                  as: String = "filled"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Linear interpolation of nulls between the nearest non-null
    * neighbors in time; beyond the first/last observation it degrades
    * to nearest-edge fill (LOCF forward, BOCF backward). The value is
    * pre-quantized to micros (exact BIGINT) and the interpolation is
    *
    *   prev + (next − prev) · (t − t0) / (t1 − t0)
    *
    * evaluated in DOUBLE over those exact integers — every step is a
    * single correctly-rounded IEEE op, so any engine evaluating the
    * same expression tree gets the bit-identical double (the q40
    * cosine-parity rule; no libm calls anywhere).
    *
    * Two window passes per series (prev and next neighbor), each
    * carrying one (value, ts) pair of state. */
  def interpolate(df: DataFrame, keyCol: String, tsCol: String,
                  idCol: String, valueCol: String,
                  as: String = "filled"): DataFrame = {
    val wPrev = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(1, Window.unboundedFollowing)
    val t = unix_micros(col(tsCol)).cast(LongType)
    // exact integer value in micro units — interpolation inputs are
    // integers, so the double math below is reproducible cross-engine
    val vScaled = when(col(valueCol).isNotNull,
      round(col(valueCol) * lit(1000000.0)).cast(LongType))
    val tTag = when(col(valueCol).isNotNull, t)
    val out = df
      .withColumn("__v", vScaled)
      .withColumn("__t", tTag)
      .withColumn("__pv", last(col("__v"), ignoreNulls = true).over(wPrev))
      .withColumn("__pt", last(col("__t"), ignoreNulls = true).over(wPrev))
      .withColumn("__nv", first(col("__v"), ignoreNulls = true).over(wNext))
      .withColumn("__nt", first(col("__t"), ignoreNulls = true).over(wNext))
    val interp =
      (col("__pv").cast("double") +
        (col("__nv") - col("__pv")).cast("double") *
          (t - col("__pt")).cast("double") /
          (col("__nt") - col("__pt")).cast("double")) / lit(1000000.0)
    val filled = when(col("__v").isNotNull, col("__v").cast("double") / lit(1000000.0))
      .when(col("__pv").isNotNull && col("__nv").isNotNull, interp)
      .when(col("__pv").isNotNull, col("__pv").cast("double") / lit(1000000.0))
      .when(col("__nv").isNotNull, col("__nv").cast("double") / lit(1000000.0))
    out.withColumn(as, filled)
      .drop("__v", "__t", "__pv", "__pt", "__nv", "__nt")
  }

  /** Unique per-row order key for first/last-in-bucket selection:
    * zero-padded (epoch micros, id) concatenation, so `min_by`/`max_by`
    * (and DuckDB `arg_min`/`arg_max`) agree lexicographically with the
    * (ts, id) order without struct-comparison semantics entering the
    * oracle contract. */
  private def orderKey(tsCol: String, idCol: String): Column =
    concat(
      lpad(unix_micros(col(tsCol)).cast("string"), 20, "0"),
      lpad(col(idCol).cast("string"), 12, "0"))

  /** OHLC bar downsampling: per (`keyCol`, `widthSec`-aligned bucket)
    * emit open (first value by (ts, id)), high, low, close (last), and
    * the row count. ONE hash aggregation on (series, bucket) — all five
    * aggregates are map-side combinable (`min_by`/`max_by` carry a
    * single (value, key) pair per partial), the canonical metrics
    * rollup shape at fleet scale. */
  def ohlcBars(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
               valueCol: String, widthSec: Long): DataFrame = {
    val bucket = expr(s"unix_micros($tsCol) div ${widthSec * 1000000L}")
      .cast(LongType).as("bucket")
    val ok = orderKey(tsCol, idCol)
    df.select(col(keyCol), bucket, col(valueCol).as("__v"), ok.as("__ok"))
      .groupBy(col(keyCol), col("bucket"))
      .agg(
        min_by(col("__v"), col("__ok")).as("open"),
        max(col("__v")).as("high"),
        min(col("__v")).as("low"),
        max_by(col("__v"), col("__ok")).as("close"),
        count(lit(1)).as("n"))
  }

  /** MERGEABLE OHLC partials over (grp, epoch-micros, id, value) rows:
    * one bar fragment per (grp, bucket) carrying its boundary ORDER
    * KEYS alongside open/close, so fragments from different batches
    * re-merge exactly ([[ohlcMergeBars]]). This is the incremental /
    * streaming form of [[ohlcBars]]: partials are tiny (7 columns per
    * bar), associative, and a partial table unioned over any batch
    * split merges to the identical bars a single pass would produce —
    * the sketch-rollup contract with EXACT state instead of a sketch. */
  def ohlcPartials(df: DataFrame, grpCol: String, tUsCol: String,
                   idCol: String, valueCol: String,
                   widthSec: Long): DataFrame = {
    val ok = concat(
      lpad(col(tUsCol).cast("string"), 20, "0"),
      lpad(col(idCol).cast("string"), 12, "0"))
    df.select(col(grpCol).as("grp"),
        expr(s"$tUsCol div ${widthSec * 1000000L}").cast(LongType)
          .as("bucket"),
        col(valueCol).as("__v"), ok.as("__ok"))
      .groupBy(col("grp"), col("bucket"))
      .agg(
        min(col("__ok")).as("open_key"),
        min_by(col("__v"), col("__ok")).as("open"),
        max(col("__v")).as("high"),
        min(col("__v")).as("low"),
        max(col("__ok")).as("close_key"),
        max_by(col("__v"), col("__ok")).as("close"),
        count(lit(1)).as("n"))
  }

  /** Merge OHLC partial fragments to final bars — the same
    * min_by/max_by algebra over the boundary keys, so merge(union of
    * partials) ≡ single-pass bars bit-for-bit. */
  def ohlcMergeBars(partials: DataFrame): DataFrame =
    partials.groupBy(col("grp"), col("bucket"))
      .agg(
        min_by(col("open"), col("open_key")).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), col("close_key")).as("close"),
        sum(col("n")).as("n"))
}
