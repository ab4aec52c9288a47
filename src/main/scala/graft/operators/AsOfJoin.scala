package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * right.time ≤ left.time and matching key — the operator Spark lacks
  * natively (SURVEY §2.3 "Not present: … as-of joins"; time-series
  * enrichment, point-in-time lookups).
  *
  * Realized by composition, not a custom physical operator (the
  * preference order in the brief: compose built-ins first): tag and
  * union both sides, then one partitioned window pass carries the last
  * non-null right payload forward to each left row. ONE shuffle on the
  * key — a naive `l.key = r.key AND l.t >= r.t` join with a max-window
  * post-filter shuffles the same data AND materializes every
  * (left, earlier-right) pair first; the inequality-only variant even
  * plans as a nested loop.
  */
object AsOfJoin {

  /** `left` and `right` must share `keyCol` and `timeCol`; every other
    * `right` column is carried as the as-of payload (null when no right
    * row is at or before the left row's time). Ties (equal time)
    * resolve to the right row — a payload is visible at its own
    * timestamp. Output: all left columns + the payload columns. */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
           timeCol: String): DataFrame = {
    val payloadCols = right.columns.filterNot(Seq(keyCol, timeCol).contains).toSeq
    val leftExtra = left.columns.filterNot(Seq(keyCol, timeCol).contains).toSeq
    val leftTagged = left.select(
      Seq(col(keyCol), col(timeCol), lit(0).as("__is_r")) ++
        leftExtra.map(col) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rightTagged = right.select(
      Seq(col(keyCol), col(timeCol), lit(1).as("__is_r")) ++
        leftExtra.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payloadCols.map(col): _*)
    // at equal time the right row sorts first (__is_r desc) so the left
    // row at the same instant sees it
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc, col("__is_r").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = payloadCols.foldLeft(leftTagged.unionByName(rightTagged)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__is_r") === 0).drop("__is_r")
  }
}
