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

/** KMV (k-minimum-values) distinct-value sketch as a bounded-set
  * aggregate (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07): the
  * buffer keeps the k SMALLEST DISTINCT hash strings of the input —
  * a uniform bottom-k sample of the value space that supports
  * distinct-count estimation ((k−1)/h₍k₎) and, unlike HLL, SET
  * OPERATIONS: the k smallest of a UNION of two sketches is exactly
  * the union's sketch, and the fraction of those present in both
  * sides estimates Jaccard — so intersection cardinalities across
  * sources come from sketch algebra, never a join
  * ([[graft.operators.Kmv]]).
  *
  * Deterministic by construction: the "hash" is whatever string
  * expression the caller supplies (md5 hex in practice) — a pure
  * function of the data, so estimates reproduce across runs, engines
  * and layouts, and the gate oracle can REPLAY the estimator in SQL
  * (the q197 property: approximation itself oracle-checkable).
  *
  * Scale shape = [[TopKByKeyAgg]]: map-side partials cap every group
  * at k hashes per partition; merge is set-union + trim; the shuffle
  * carries ≤ k·partitions hashes per group, never the group. */
case class KmvSketchAgg(
    hashChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[String]] {

  require(k > 1, s"k must be > 1, got $k")

  override def children: Seq[Expression] = Seq(hashChild)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch_agg"

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): mutable.TreeSet[String] =
    mutable.TreeSet.empty[String]

  private def offer(buf: mutable.TreeSet[String], h: String): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last && buf.add(h)) { buf.remove(buf.last); () }
  }

  override def update(buf: mutable.TreeSet[String],
                      input: InternalRow): mutable.TreeSet[String] = {
    val hv = hashChild.eval(input)
    if (hv != null) offer(buf, hv.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: mutable.TreeSet[String],
                     other: mutable.TreeSet[String]): mutable.TreeSet[String] = {
    other.foreach(offer(buf, _))
    buf
  }

  /** Ascending array of the retained hashes (≤ k). */
  override def eval(buf: mutable.TreeSet[String]): Any =
    new GenericArrayData(
      buf.toArray.map(UTF8String.fromString(_): Any))

  override def serialize(buf: mutable.TreeSet[String]): Array[Byte] = {
    val byteArrs = buf.toArray.map(_.getBytes(StandardCharsets.UTF_8))
    val bb = ByteBuffer.allocate(4 + byteArrs.map(_.length + 4).sum)
    bb.putInt(byteArrs.length)
    byteArrs.foreach { a => bb.putInt(a.length); bb.put(a) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[String] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.add(new String(arr, StandardCharsets.UTF_8))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(hashChild = newChildren(0))
}
