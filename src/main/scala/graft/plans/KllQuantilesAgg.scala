package graft.plans

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Mergeable quantiles via the KLL sketch (DataSketches): per group,
  * one fixed-size sketch rides the shuffle; evaluation returns the
  * quantile at each requested normalized rank with INCLUSIVE search
  * semantics — "smallest value whose cumulative weight ≥ rank·n",
  * exactly SQL's percentile_disc, so while the group's value count
  * stays ≤ k (full retention, no compactions) the answers are EXACT
  * and DuckDB-oracle-comparable (q96). Beyond k the estimate carries
  * the published ~1.65/√k normalized rank error (spec-asserted).
  *
  * This is the 100 TB percentile shape: a global percentile via sort
  * or a single-task window is a non-starter; KLL sketches are
  * map-side combinable and merge associatively.
  */
case class KllQuantilesAgg(
    child: Expression,
    k: Int,
    ranks: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"k must be in [8, 65535], got $k")
  require(ranks.nonEmpty && ranks.forall(r => r >= 0 && r <= 1))

  private val rankArr = ranks.toArray

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "kll_quantiles_agg"

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch,
                      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch,
                     other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any =
    if (buf.isEmpty) new GenericArrayData(Array.empty[Double])
    else new GenericArrayData(rankArr.map(r =>
      buf.getQuantile(r, QuantileSearchCriteria.INCLUSIVE)))

  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllQuantilesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllQuantilesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllQuantilesAgg =
    copy(child = newChildren.head)
}

/** The PERSISTABLE KLL partial: same buffer as [[KllQuantilesAgg]],
  * evaluated to the sketch's serialized BYTES — store them in a
  * table (the streaming per-batch partial), roll up later with
  * [[KllMergeQuantilesAgg]] without rescanning rows. Merging partials
  * whose total value count stays ≤ k remains EXACT (no compactions),
  * so the streamed rollup can still hash-match percentile_disc. */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"k must be in [8, 65535], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_agg"
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch,
                      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch,
                     other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren.head)
}

/** Roll SERIALIZED KLL partials ([[KllSketchAgg]] bytes) up to the
  * quantiles — the serve-time half of the streamed percentile rollup:
  * input rows are sketch blobs, never values, so serving cost is
  * O(partials), not O(stream). */
case class KllMergeQuantilesAgg(
    child: Expression,
    k: Int,
    ranks: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"k must be in [8, 65535], got $k")
  require(ranks.nonEmpty && ranks.forall(r => r >= 0 && r <= 1))

  private val rankArr = ranks.toArray

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "kll_merge_quantiles_agg"
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch,
                      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: KllDoublesSketch,
                     other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any =
    if (buf.isEmpty) new GenericArrayData(Array.empty[Double])
    else new GenericArrayData(rankArr.map(r =>
      buf.getQuantile(r, QuantileSearchCriteria.INCLUSIVE)))

  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllMergeQuantilesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeQuantilesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeQuantilesAgg =
    copy(child = newChildren.head)
}
