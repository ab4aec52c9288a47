package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** EXACT fixed-point Gram matrix (second-moment matrix) of a vector
  * column in ONE combinable aggregate — the linear-algebra primitive
  * under feature covariance, whitening and PCA: callers quantize each
  * element to `floor(x · scale)` (scale a power of two, so the
  * double multiply is exact bit-shifting and `floor` is
  * engine-portable — the [[graft.operators.KMeansFx]] fixed-point
  * discipline), and the buffer accumulates the upper triangle of
  * `Σ q qᵀ` in EXACT integers.
  *
  * Exactness at ANY row count: cells accumulate in a primitive
  * `long[]` on the hot path and SPILL per-cell into `BigInt` when a
  * cell nears ±2⁵⁹ — updates add products bounded by 2⁶⁰ (each
  * element is required < 2³⁰ after quantization), merges add partials
  * bounded by the same at-rest invariant, so no addition can ever
  * overflow and no size cap needs documenting: the output is the
  * mathematically exact integer matrix even at 10¹² rows. Output is
  * the triangle as DECIMAL(38,0).
  *
  * Scale shape: map-side combine reduces every partition to ONE
  * dim·(dim+1)/2 buffer; the shuffle carries one buffer per
  * partition, never a row — the corpus is touched exactly once,
  * map-locally. (Contrast: the SQL formulation explodes N·d rows and
  * self-joins to N·d² before aggregating — the oracle does exactly
  * that, in DuckDB, to check this.)
  */
case class GramAgg(
    child: Expression,
    dim: Int,
    scale: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramAgg.Buf] {

  require(dim > 0 && dim <= 4096, s"dim out of range: $dim")
  require(scale > 0 && (scale & (scale - 1)) == 0,
    s"scale must be a power of two for exact quantization, got $scale")

  private val tri = dim * (dim + 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "gram_agg"
  override def dataType: DataType =
    ArrayType(DecimalType(38, 0), containsNull = false)

  override def createAggregationBuffer(): GramAgg.Buf =
    new GramAgg.Buf(tri)

  private lazy val elemIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def update(buf: GramAgg.Buf, input: InternalRow): GramAgg.Buf = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    require(arr.numElements() == dim,
      s"gram_agg expects $dim elements, got ${arr.numElements()}")
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      val qi = math.floor(x * scale).toLong
      require(math.abs(qi) < (1L << 30),
        s"quantized element $qi exceeds 2^30 — lower `scale`")
      q(i) = qi
      i += 1
    }
    var idx = 0
    i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        buf.add(idx, q(i) * q(j)) // |p| < 2^60
        idx += 1; j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: GramAgg.Buf, b: GramAgg.Buf): GramAgg.Buf = {
    var idx = 0
    while (idx < tri) {
      a.add(idx, b.fast(idx)) // |p| < 2^59 (b's at-rest invariant)
      idx += 1
    }
    if (b.big != null) {
      a.ensureBig()
      idx = 0
      while (idx < tri) {
        if (b.big(idx) != null)
          a.big(idx) = if (a.big(idx) == null) b.big(idx)
                       else a.big(idx) + b.big(idx)
        idx += 1
      }
    }
    a
  }

  override def eval(buf: GramAgg.Buf): Any = {
    val out = new Array[Any](tri)
    var idx = 0
    while (idx < tri) {
      val total = buf.total(idx)
      out(idx) = Decimal(BigDecimal(total), 38, 0)
      idx += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: GramAgg.Buf): Array[Byte] = {
    val bigCells = if (buf.big == null) Seq.empty[(Int, Array[Byte])]
      else (0 until tri).collect {
        case i if buf.big(i) != null => (i, buf.big(i).toByteArray)
      }
    val size = 4 + 8 * tri + 4 + bigCells.map(8 + _._2.length).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(tri)
    var i = 0
    while (i < tri) { bb.putLong(buf.fast(i)); i += 1 }
    bb.putInt(bigCells.size)
    bigCells.foreach { case (idx, bytes) =>
      bb.putInt(idx); bb.putInt(bytes.length); bb.put(bytes)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new GramAgg.Buf(n)
    var i = 0
    while (i < n) { buf.fast(i) = bb.getLong; i += 1 }
    val nBig = bb.getInt
    if (nBig > 0) buf.ensureBig()
    i = 0
    while (i < nBig) {
      val idx = bb.getInt
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.big(idx) = BigInt(arr)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): GramAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramAgg =
    copy(child = newChildren.head)
}

object GramAgg {
  private val FlushAt = 1L << 59

  /** Long fast-path cells with per-cell BigInt spill. At-rest
    * invariant: `|fast(i)| < 2^59` — [[add]] flushes any cell that
    * crosses it, so an add of `|p| < 2^60` can never overflow. */
  final class Buf(n: Int) {
    val fast = new Array[Long](n)
    var big: Array[BigInt] = _

    def ensureBig(): Unit = if (big == null) big = new Array[BigInt](n)

    def add(idx: Int, p: Long): Unit = {
      val s = fast(idx) + p
      if (s >= FlushAt || s <= -FlushAt) {
        ensureBig()
        big(idx) = if (big(idx) == null) BigInt(s) else big(idx) + s
        fast(idx) = 0L
      } else fast(idx) = s
    }

    def total(idx: Int): BigInt =
      if (big == null || big(idx) == null) BigInt(fast(idx))
      else big(idx) + fast(idx)
  }
}
