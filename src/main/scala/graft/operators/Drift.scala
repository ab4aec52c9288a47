package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two samples of a numeric
  * column — the corpus-quality tripwire: compare this week's crawl
  * against the accepted corpus (doc lengths, quality scores, token
  * counts) and alarm when the shape moved, not just the mean.
  *
  * The statistic is the two-sample Kolmogorov–Smirnov distance
  * `D = max_x |F_A(x) − F_B(x)|`, computed EXACTLY in integers by
  * cross-multiplying the empirical CDFs: with nA/nB sample sizes and
  * cA(x)/cB(x) cumulative counts,
  * `D·nA·nB = max_x |nB·cA(x) − nA·cB(x)|` — every term a long, so
  * the statistic (and the arg-max point) reproduces bit-for-bit in
  * any engine. No floats until the caller divides.
  *
  * Scale shape: ONE value-histogram agg over the corpus (group by
  * value × side), then the running CDFs on the HISTOGRAM — dim-sized
  * for bounded-domain signals (doc lengths, integer scores), where a
  * single-partition window is fine. An unbounded continuous signal
  * would first bucket (`floor(x/w)`), which only coarsens D.
  *
  * Reference anchor: beyond-reference (no data-quality monitoring in
  * the reference; statistic from Kolmogorov 1933 / Smirnov 1939). */
object Drift {

  /** One row: (n_a, n_b, d_num, d_ppm, at_value) where
    * d_num = D·nA·nB (exact), d_ppm = ⌊D·10⁶⌋, and at_value is the
    * SMALLEST value achieving the max (deterministic tie rule).
    * `isA` splits df's rows into the two samples. */
  def ksStat(df: DataFrame, valueCol: Column, isA: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = df
      .select(valueCol.cast("long").as("x"), isA.cast("int").as("a"))
      .groupBy(col("x"))
      .agg(sum(col("a")).as("na_x"),
        sum(lit(1) - col("a")).as("nb_x"))
    val wCdf = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val scored = hist
      .withColumn("ca", sum(col("na_x")).over(wCdf))
      .withColumn("cb", sum(col("nb_x")).over(wCdf))
      .withColumn("n_a", sum(col("na_x")).over(wAll))
      .withColumn("n_b", sum(col("nb_x")).over(wAll))
      .withColumn("num",
        abs(col("n_b") * col("ca") - col("n_a") * col("cb")))
      .withColumn("d_num", max(col("num")).over(wAll))
    scored
      .filter(col("num") === col("d_num"))
      .groupBy(col("n_a"), col("n_b"), col("d_num"))
      .agg(min(col("x")).as("at_value"))
      // d_num ≤ nA·nB, so d_num·10⁶ overflows BIGINT once nA·nB passes
      // ~9.2e12 (≈3M rows per side) — the multiply runs in DECIMAL(38,0)
      // and only the ≤10⁶ quotient comes back to BIGINT, keeping the
      // ppm bit-exact at any sample size
      .select(col("n_a"), col("n_b"), col("d_num"),
        expr("CAST((CAST(d_num AS DECIMAL(38,0)) * 1000000)" +
          " div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)").as("d_ppm"),
        col("at_value"))
  }
}
