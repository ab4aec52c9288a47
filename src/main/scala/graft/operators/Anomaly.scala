package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rate-anomaly detection over event streams — the monitoring query a
  * pipeline team runs over its own ingestion: bucket events into
  * windows per group, flag windows whose count sits more than `k`
  * standard deviations from the group's mean rate (traffic spikes,
  * collector outages, replay storms).
  *
  * EXACT integer arithmetic: the z-test `|n − μ| > k·σ` is evaluated
  * as its squared cross-multiplied form
  * `(cnt·n − sum)² > k²·(cnt·sumsq − sum²)` — counts are integers, so
  * both sides are exact longs and the flag reproduces bit-for-bit in
  * any engine (no float mean, no sqrt). Overflow headroom: with H
  * windows and max count N, the left side is ≤ (H·N)² — H ≤ 10⁵
  * windows of N ≤ 10⁶ events stay inside a long.
  *
  * Scale shape: one (group, window) count shuffle, one dim-sized
  * group-stats agg broadcast back into the windows, map-local flag —
  * the window table, not the raw events, is all that is ever
  * re-touched.
  *
  * Reference anchor: beyond-reference (the reference's audit table
  * records task durations but computes no outlier statistics;
  * reference/airflow/plugins/audit/audit_logger.py:11-21). */
object Anomaly {

  /** Windows of `df` (bucketed by `windowExpr`, grouped by `groupCol`)
    * whose count deviates more than `k` standard deviations from the
    * group mean. Output: (group, window, n) — flagged windows only,
    * both directions (spike or outage). */
  def rateOutliers(df: DataFrame, groupCol: String, windowExpr: Column,
                   k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val h = df
      .groupBy(col(groupCol), windowExpr.as("window_start"))
      .agg(count(lit(1)).as("n"))
    val s = h.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__cnt"), sum(col("n")).as("__sum"),
        sum(col("n") * col("n")).as("__sumsq"))
    val dev = col("__cnt") * col("n") - col("__sum")
    h.join(broadcast(s), Seq(groupCol))
      .filter(dev * dev >
        lit(k.toLong * k) * (col("__cnt") * col("__sumsq") -
          col("__sum") * col("__sum")))
      .select(col(groupCol), col("window_start"), col("n"))
  }
}
