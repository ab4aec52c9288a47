package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Point-frequency rollups over the Count-Min sketch
  * (graft.plans.CountMinAgg — mergeable depth×width counter table). */
object CountMin {

  /** The sketch column itself: a flat row-major `array<bigint>` of
    * depth×width counters. `itemCol` must name an attribute of the
    * input. Merge = elementwise addition (see `mergeAll`). */
  def sketch(itemCol: String, depth: Int = 4, width: Int = 256): Column =
    ColumnBridge.column(
      graft.plans.CountMinAgg(UnresolvedAttribute(itemCol), depth, width)
        .toAggregateExpression())

  /** Upper-bound point-frequency estimate of `item` from a sketch
    * column produced with the SAME depth/width. */
  def estimate(sketchCol: Column, item: Column,
               depth: Int = 4, width: Int = 256): Column =
    ColumnBridge.column(graft.plans.CmsEstimate(
      ColumnBridge.expression(sketchCol),
      ColumnBridge.expression(item), depth, width))

  /** Roll up MANY stored sketch rows (the persisted-partial path) into
    * one merged sketch — pure built-ins: positional explode, sum per
    * position, re-assemble ordered. Exactly equals the single-pass
    * sketch because CMS merge is elementwise long addition. Input must
    * be sketches of identical depth×width; returns one row with column
    * `sketchCol`. */
  def mergeAll(df: DataFrame, sketchCol: String): DataFrame = {
    // guard: positional sum over MIXED depth×width sketches would
    // silently produce a garbage sketch (positions happily align) —
    // require one size. One map-local pass + distinct over the
    // sketch table (partial-sketch-sized, never corpus-sized).
    val sizes = df.select(size(col(sketchCol)).as("sz"))
      .distinct().limit(2).collect()
    require(sizes.length <= 1,
      s"mergeAll: input sketches disagree on depth*width " +
        s"(${sizes.map(_.getInt(0)).mkString(" vs ")}) — " +
        "all partials must come from the same sketch(depth, width)")
    df.select(posexplode(col(sketchCol)))
      .groupBy(col("pos")).agg(sum(col("col")).as("c"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as(sketchCol))
  }
}
