package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Mergeable-quantile rollups over the KLL sketch
  * (graft.plans.KllQuantilesAgg). */
object KllQuantiles {

  /** Quantiles of `valueCol` (cast to double) at `ranks`, INCLUSIVE
    * (= percentile_disc) semantics, as an array column. Exact while
    * the group's count stays ≤ k; ~1.65/√k rank error beyond. */
  def quantiles(valueCol: String, ranks: Seq[Double],
                k: Int = 32768): Column =
    ColumnBridge.column(
      graft.plans.KllQuantilesAgg(
        org.apache.spark.sql.catalyst.expressions.Cast(
          UnresolvedAttribute(valueCol),
          org.apache.spark.sql.types.DoubleType), k, ranks)
        .toAggregateExpression())

  /** The persistable partial: serialized sketch bytes of `valueCol`
    * (cast to double) — store per batch, roll up with
    * [[mergeQuantiles]] without rescanning rows. Exact while the
    * total count stays ≤ k. */
  def sketchBytes(valueCol: String, k: Int = 32768): Column =
    ColumnBridge.column(
      graft.plans.KllSketchAgg(
        org.apache.spark.sql.catalyst.expressions.Cast(
          UnresolvedAttribute(valueCol),
          org.apache.spark.sql.types.DoubleType), k)
        .toAggregateExpression())

  /** Quantiles at `ranks` from a column of SERIALIZED sketch partials
    * ([[sketchBytes]] output) — serving cost O(partials). */
  def mergeQuantiles(bytesCol: String, ranks: Seq[Double],
                     k: Int = 32768): Column =
    ColumnBridge.column(
      graft.plans.KllMergeQuantilesAgg(
        UnresolvedAttribute(bytesCol), k, ranks)
        .toAggregateExpression())
}

/** Heavy-hitters rollups over the FreqItemsAgg sketch
  * (graft.plans.FreqItemsAgg — mergeable Misra-Gries family). */
object FreqItems {

  /** The sketch column itself (array of (item, est, lb, ub) structs,
    * sorted est DESC, item ASC) — for callers composing their own
    * aggregations. `itemCol` must name an attribute of the input. */
  def sketch(itemCol: String, maxMapSize: Int = 2048): Column =
    ColumnBridge.column(
      graft.plans.FreqItemsAgg(UnresolvedAttribute(itemCol), maxMapSize)
        .toAggregateExpression())

  /** The persistable partial: SERIALIZED sketch bytes (store them in a
    * table; roll up later with `mergeSketches` without rescanning
    * rows). Merging exact (below-capacity) partials stays exact. */
  def sketchBytes(itemCol: String, maxMapSize: Int = 2048): Column =
    ColumnBridge.column(
      graft.plans.FreqItemsSketchAgg(UnresolvedAttribute(itemCol), maxMapSize)
        .toAggregateExpression())

  /** Roll up stored sketch bytes into ranked (item, est, lb, ub) rows
    * — the incremental-analytics read path. */
  def mergeSketches(bytesCol: String, maxMapSize: Int = 2048): Column =
    ColumnBridge.column(
      graft.plans.FreqItemsMergeAgg(UnresolvedAttribute(bytesCol), maxMapSize)
        .toAggregateExpression())

  /** Top-`k` items of `itemCol` per group: one fixed-size sketch per
    * group (map-side combinable — the shuffle carries sketches, never
    * per-item rows), exploded and ranked. Exact while distinct items
    * per group stay under ~0.75·maxMapSize; approximate with
    * DataSketches error bounds beyond. */
  def topK(df: DataFrame, groupCols: Seq[String], itemCol: String,
           k: Int, maxMapSize: Int = 2048): DataFrame = {
    val gs = groupCols.map(col)
    df.groupBy(gs: _*)
      .agg(sketch(itemCol, maxMapSize).as("__fi"))
      .select(gs :+ posexplode(col("__fi")): _*)
      .filter(col("pos") < k)
      .select(gs ++ Seq((col("pos") + 1).cast("long").as("rank"),
        col("col").getField("item").as(itemCol),
        col("col").getField("est").as("est")): _*)
  }
}
