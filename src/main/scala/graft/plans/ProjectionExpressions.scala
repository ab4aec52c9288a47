package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Johnson–Lindenstrauss random projection as ONE native map-local
  * expression with the ±1 sign matrix as a plan-time constant FIELD
  * (the [[IvfProbeCells]] codebook pattern — O(1) plan size at any
  * k·d, never a k·d literal tree).
  *
  * Output `y_j = Σ_i s(j,i) · floor(x_i · scale)` in EXACT longs: the
  * Achlioptas (2003) ±1 scheme needs no gaussian floats, and the
  * fixed-point input quantization (power-of-two scale — the
  * [[GramAgg]] discipline) makes every projected coordinate an exact
  * integer any engine reproduces bit-for-bit. Signs are md5-derived
  * from `(j, i)` ([[graft.operators.LinAlg.jlSigns]]), so the oracle
  * can REBUILD the matrix in SQL — the projection itself is
  * oracle-checkable, not just spec-bounded.
  *
  * Overflow: |y_j| ≤ d · max|q| < 2^12 · 2^30 — far inside long.
  */
case class SignProject(child: Expression, signs: Array[Array[Byte]],
                       scale: Long)
    extends UnaryExpression with CodegenFallback {

  private val k = signs.length
  private val dim = if (k == 0) 0 else signs(0).length

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_project"

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    require(x.numElements() == dim,
      s"sign_project expects $dim elements, got ${x.numElements()}")
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      q(i) = math.floor(v * scale).toLong
      i += 1
    }
    val y = new Array[Long](k)
    var j = 0
    while (j < k) {
      val row = signs(j)
      var s = 0L; var i2 = 0
      while (i2 < dim) { s += row(i2) * q(i2); i2 += 1 }
      y(j) = s
      j += 1
    }
    new GenericArrayData(y)
  }

  override protected def withNewChildInternal(newChild: Expression): SignProject =
    copy(child = newChild)
}

/** Fixed-point dot product against a constant integer weight vector
  * (plan-time field): `y = Σ_i w_i · floor(x_i · scale)` — the
  * map-local projection step of [[graft.operators.LinAlg]]'s PCA
  * path. Overflow headroom: |y| ≤ d · max|w| · max|q|; callers keep
  * `max|w| ≤ 2^20` (the power-iteration rescale bound), so d ≤ 2^12
  * and |q| < 2^30 stay far inside long. */
case class FixedDot(child: Expression, weights: Array[Long], scale: Long)
    extends UnaryExpression with CodegenFallback {

  private val dim = weights.length

  override def dataType: DataType = LongType
  override def prettyName: String = "fixed_dot"

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    require(x.numElements() == dim,
      s"fixed_dot expects $dim elements, got ${x.numElements()}")
    var s = 0L; var i = 0
    while (i < dim) {
      val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      s += weights(i) * math.floor(v * scale).toLong
      i += 1
    }
    s
  }

  override protected def withNewChildInternal(newChild: Expression): FixedDot =
    copy(child = newChild)
}

object ProjectionExpressions {
  def signProject(vec: Column, signs: Array[Array[Byte]],
                  scale: Long): Column =
    ColumnBridge.column(
      SignProject(ColumnBridge.expression(vec), signs, scale))

  def fixedDot(vec: Column, weights: Array[Long], scale: Long): Column =
    ColumnBridge.column(
      FixedDot(ColumnBridge.expression(vec), weights, scale))
}
