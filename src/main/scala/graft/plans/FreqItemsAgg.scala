package graft.plans

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy hitters) as a mergeable sketch aggregate —
  * the Misra-Gries/Space-Saving family via DataSketches ItemsSketch.
  *
  * The 100 TB shape: each partition folds its items into one
  * fixed-size sketch (map-side combinable), the shuffle carries one
  * sketch per group, merges are associative — top-k over any rollup
  * without a per-item global groupBy. While the number of distinct
  * items stays under ~0.75·maxMapSize the sketch never purges, so
  * estimates are EXACT (lb = est = ub) — which is what makes the q94
  * DuckDB oracle possible at test scale; above capacity the guarantees
  * degrade gracefully to ±getMaximumError (spec-asserted).
  *
  * Output rows are sorted (estimate DESC, item ASC) so downstream
  * ranking is deterministic.
  */
case class FreqItemsAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    s"maxMapSize must be a power of 2 >= 8, got $maxMapSize")

  // not java-serializable, and the expression ships to executors —
  // rebuild per JVM
  @transient private lazy val serDe = new ArrayOfStringsSerDe

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_items_agg"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String],
                      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: ItemsSketch[String],
                     other: ItemsSketch[String]): ItemsSketch[String] = {
    buf.merge(other)
    buf
  }

  override def eval(buf: ItemsSketch[String]): Any = {
    val rows = buf.getFrequentItems(ErrorType.NO_FALSE_POSITIVES)
      .sortBy(r => (-r.getEstimate, r.getItem))
      .map(r => InternalRow(UTF8String.fromString(r.getItem),
        r.getEstimate, r.getLowerBound, r.getUpperBound))
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(serDe)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serDe)

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsAgg =
    copy(child = newChildren.head)
}

/** As FreqItemsAgg but evaluates to the SERIALIZED sketch (binary) —
  * the persistable partial: write one sketch per (group, partition of
  * the data), store it in a table, and roll up later with
  * FreqItemsMergeAgg without rescanning rows. Merging exact
  * (below-capacity) sketches stays exact: counts add. */
case class FreqItemsSketchAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    s"maxMapSize must be a power of 2 >= 8, got $maxMapSize")

  @transient private lazy val serDe = new ArrayOfStringsSerDe

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_items_sketch_agg"
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String],
                      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: ItemsSketch[String],
                     other: ItemsSketch[String]): ItemsSketch[String] = {
    buf.merge(other)
    buf
  }

  override def eval(buf: ItemsSketch[String]): Any = buf.toByteArray(serDe)

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(serDe)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serDe)

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsSketchAgg =
    copy(child = newChildren.head)
}

/** Rolls up SERIALIZED sketches (the output of FreqItemsSketchAgg,
  * possibly read back from a table written days ago) into the same
  * (item, est, lb, ub) rows FreqItemsAgg produces — incremental
  * analytics: answer any coarser rollup by merging stored partials,
  * never rescanning the source rows. */
case class FreqItemsMergeAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    s"maxMapSize must be a power of 2 >= 8, got $maxMapSize")

  @transient private lazy val serDe = new ArrayOfStringsSerDe

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_items_merge_agg"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String],
                      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.merge(ItemsSketch.getInstance(
      Memory.wrap(v.asInstanceOf[Array[Byte]]), serDe))
    buf
  }

  override def merge(buf: ItemsSketch[String],
                     other: ItemsSketch[String]): ItemsSketch[String] = {
    buf.merge(other)
    buf
  }

  override def eval(buf: ItemsSketch[String]): Any = {
    val rows = buf.getFrequentItems(ErrorType.NO_FALSE_POSITIVES)
      .sortBy(r => (-r.getEstimate, r.getItem))
      .map(r => InternalRow(UTF8String.fromString(r.getItem),
        r.getEstimate, r.getLowerBound, r.getUpperBound))
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(serDe)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serDe)

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsMergeAgg =
    copy(child = newChildren.head)
}
