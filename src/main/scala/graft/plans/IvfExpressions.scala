package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** IVF cell probing as ONE native expression with the centroid
  * codebook as a plan-time constant FIELD (the [[PqEncode]] pattern).
  *
  * The previous formulation built `array(struct(dot(vec, lit(c_i)), i)
  * …)` — an expression TREE of nlist·dim literals. That tree's
  * generated code grows with nlist: at nlist ≈ 64·64 literals janino
  * compiles a pathological near-64KB method (measured 56 s for an
  * 8k-vector kNN-graph pass whose 20k-vector sibling ran 16 s — the
  * "barely compilable" middle), and past the limit codegen fails and
  * falls back row-by-row anyway. A codebook-in-field expression is
  * O(1) plan size at ANY nlist — which the scale dial (nlist ≈ √n →
  * tens of thousands of cells at 100 TB) requires outright.
  * CodegenFallback: per-row cost is the nlist·dim primitive loop
  * inside, not the dispatch.
  *
  * Ranking is dot(vec, c)/|c| — |vec| is constant per row, so the cell
  * order equals the cosine order. Ties break to the SMALLER cell id,
  * deterministically. NOTE this is a deliberate tie-rule CHANGE from
  * the literal `array_max(struct(sim, cell))` formulation it replaced,
  * which broke exact-similarity ties to the LARGER id: ties require
  * two centroids exactly equisimilar to a query (duplicate seed
  * vectors), and smallest-id-wins matches every other tie rule in the
  * engine (window orderings, component labels). Cell assignments
  * produced before round 7 may differ on such duplicate-centroid
  * corpora; re-derive with [[IvfIndex.build]] if bit-compatibility
  * matters.
  */
case class IvfProbeCells(child: Expression, centroids: Array[Array[Double]],
                         nprobe: Int)
    extends UnaryExpression with CodegenFallback {

  private val nlist = centroids.length
  private val norms = centroids.map(c => math.sqrt(c.map(x => x * x).sum))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_probe_cells"

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val sims = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      val cb = centroids(c)
      val n = math.min(x.numElements(), cb.length)
      var s = 0.0; var i = 0
      while (i < n) {
        s += (if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)) * cb(i)
        i += 1
      }
      sims(c) = if (norms(c) > 0.0) s / norms(c) else Double.NegativeInfinity
      c += 1
    }
    val k = math.min(nprobe, nlist)
    val out = new Array[Int](k)
    val used = new Array[Boolean](nlist)
    var j = 0
    while (j < k) {
      var best = -1; var bs = Double.NegativeInfinity
      var i = 0
      while (i < nlist) {
        if (!used(i) && (best < 0 || sims(i) > bs)) { best = i; bs = sims(i) }
        i += 1
      }
      used(best) = true; out(j) = best; j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): IvfProbeCells =
    copy(child = newChild)
}

object IvfExpressions {

  /** The `nprobe` cell ids nearest (cosine) to `vec`, nearest first. */
  def probeCells(vec: Column, centroids: Array[Array[Double]],
                 nprobe: Int): Column =
    ColumnBridge.column(
      IvfProbeCells(ColumnBridge.expression(vec), centroids, nprobe))

  /** Home cell of `vec` (= probeCells head). */
  def nearestCell(vec: Column, centroids: Array[Array[Double]]): Column =
    org.apache.spark.sql.functions.element_at(
      probeCells(vec, centroids, 1), 1)
}
