package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact top-k (SMALLEST sort key) per group as a bounded-heap
  * aggregate: the buffer never holds more than k (key, id) pairs, so
  * the map-side partial reduces each group to ≤ k rows per input
  * partition and the shuffle carries ≤ k·partitions pairs per group —
  * never the group itself. This is the scalable form of
  * "row_number() over (partition by g order by key) <= k", whose
  * window sorts entire groups through single tasks.
  *
  * Deterministic: ties on equal keys break toward the smaller id, so
  * the result is a pure function of the data (not of layout or merge
  * order). Output: array of (key, id) structs, ascending by key. */
case class TopKByKeyAgg(
    keyChild: Expression,
    idChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(String, Long)]] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(keyChild, idChild)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by_key_agg"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  // max-heap on (key, id): the head is the WORST retained pair, evicted
  // when a better one arrives
  private def ord: Ordering[(String, Long)] =
    Ordering.Tuple2(Ordering.String, Ordering.Long)

  override def createAggregationBuffer(): mutable.PriorityQueue[(String, Long)] =
    mutable.PriorityQueue.empty[(String, Long)](ord)

  private def offer(buf: mutable.PriorityQueue[(String, Long)],
                    pair: (String, Long)): Unit = {
    if (buf.size < k) buf.enqueue(pair)
    else if (ord.lt(pair, buf.head)) { buf.dequeue(); buf.enqueue(pair) }
  }

  override def update(buf: mutable.PriorityQueue[(String, Long)],
                      input: InternalRow): mutable.PriorityQueue[(String, Long)] = {
    val kv = keyChild.eval(input)
    val iv = idChild.eval(input)
    if (kv != null && iv != null)
      offer(buf, (kv.asInstanceOf[UTF8String].toString, iv.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(String, Long)],
                     other: mutable.PriorityQueue[(String, Long)]): mutable.PriorityQueue[(String, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(String, Long)]): Any = {
    val rows = buf.toArray.sorted(ord)
      .map(p => InternalRow(UTF8String.fromString(p._1), p._2))
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(String, Long)]): Array[Byte] = {
    val items = buf.toArray
    val byteArrs = items.map(_._1.getBytes(StandardCharsets.UTF_8))
    val size = 4 + byteArrs.map(_.length + 4 + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(items.length)
    items.indices.foreach { i =>
      bb.putInt(byteArrs(i).length)
      bb.put(byteArrs(i))
      bb.putLong(items(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(String, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.enqueue((new String(arr, StandardCharsets.UTF_8), bb.getLong))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByKeyAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByKeyAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByKeyAgg =
    copy(keyChild = newChildren(0), idChild = newChildren(1))
}
