package graft.plans

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Shared Count-Min hashing: row `i` of the sketch uses Murmur3
  * (Spark's own x86_32 implementation) with seed `i` over the item's
  * UTF-8 bytes — the same function in the aggregate and the estimator,
  * so estimates are consistent by construction and deterministic
  * across JVMs, partitionings, and runs. */
object CountMinHash {
  def bucket(item: UTF8String, seed: Int, width: Int): Int = {
    val h = Murmur3_x86_32.hashUnsafeBytes(
      item.getBaseObject, item.getBaseOffset, item.numBytes(), seed)
    ((h % width) + width) % width
  }
}

/** Count-Min sketch as a mergeable aggregate: a depth×width counter
  * table over string items, evaluated to a flat `array<bigint>`
  * (row-major), completing the mergeable-sketch family next to KLL
  * (quantiles), FreqItems (heavy hitters), HLL (distincts) and Bloom
  * (membership): CMS answers POINT-FREQUENCY queries with a one-sided
  * error — est ≥ true, est ≤ true + εN with ε ≈ e/width at confidence
  * 1 − e^(−depth).
  *
  * The 100 TB shape: each partition folds its items into one
  * fixed-size table (map-side combinable), the shuffle carries
  * depth·width longs per group, and MERGE IS ELEMENTWISE ADDITION —
  * exactly associative/commutative, so partials persist to a table and
  * roll up later with plain built-ins (posexplode → sum by position;
  * see `operators.CountMin.mergeAll`) without rescanning rows, and the
  * merged sketch is bit-identical to the single-pass one.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
  require(width >= 2, s"width must be >= 2, got $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min_agg"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var i = 0
      while (i < depth) {
        buf(i * width + CountMinHash.bucket(s, i, width)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

/** Point-frequency estimate from a CountMinAgg table: the minimum
  * over the `depth` rows of the counter each hash selects — the
  * standard CMS upper-bound estimator, sharing `CountMinHash` with
  * the aggregate. Null item or null table → null. */
case class CmsEstimate(
    left: Expression,
    right: Expression,
    depth: Int,
    width: Int)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "cms_estimate"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(table: Any, item: Any): Any = {
    val arr = table.asInstanceOf[ArrayData]
    val s = item.asInstanceOf[UTF8String]
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = arr.getLong(i * width + CountMinHash.bucket(s, i, width))
      if (c < best) best = c
      i += 1
    }
    best
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
