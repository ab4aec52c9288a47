package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Fixed-point k-means assignment as ONE native expression with the
  * quantized centroid table as a plan-time FIELD — the [[IvfProbeCells]]
  * treatment applied to [[graft.operators.KMeansFx]]'s hot loop.
  *
  * The built-in formulation (`aggregate(zip_with(qv, lit(c), …))` per
  * centroid, twice via `array_position(dists, array_min(dists))`) runs
  * INTERPRETED — higher-order functions have no codegen — and builds a
  * k·d-literal expression tree besides. This is the same exact-integer
  * contract (L2² in longs, argmin with ties to the smallest cluster
  * id) as a primitive loop; the q162 DuckDB oracle is unchanged.
  */
case class KMeansAssign(child: Expression, centroids: Array[Array[Long]])
    extends UnaryExpression with CodegenFallback {

  private val k = centroids.length

  override def dataType: DataType = IntegerType
  override def prettyName: String = "kmeans_assign"

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    var best = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < k) {
      val cb = centroids(c)
      val n = math.min(x.numElements(), cb.length)
      var d = 0L; var i = 0
      while (i < n) {
        val diff = x.getLong(i) - cb(i)
        d += diff * diff
        i += 1
      }
      // strict < scanning ascending = ties to the smallest cluster id
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): KMeansAssign =
    copy(child = newChild)
}

object KMeansExpressions {
  /** argmin-L2² cluster id of a quantized (array<long>) vector. */
  def assign(qv: Column, centroids: Array[Array[Long]]): Column =
    ColumnBridge.column(KMeansAssign(ColumnBridge.expression(qv), centroids))
}
