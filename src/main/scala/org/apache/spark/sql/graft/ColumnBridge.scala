package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression conversions.
  *
  * Spark 4 moved `Column` to a ColumnNode representation and made the
  * catalyst constructors `private[sql]`; extension libraries that define
  * native expressions need exactly these two hooks, so we expose them
  * from inside the package namespace (the established pattern for
  * Spark-native libraries). Everything else in the engine lives under
  * `graft.*`.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
