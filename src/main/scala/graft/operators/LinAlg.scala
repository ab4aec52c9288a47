package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.LongType

import graft.plans.GramAgg

/** Distributed exact linear algebra over embedding columns — the
  * reductions a feature-engineering / PCA-whitening stage needs,
  * computed in the fixed-point integer discipline so results are
  * engine-portable and oracle-checkable ([[KMeansFx]]'s convention,
  * with a power-of-two scale so quantization itself is exact).
  *
  * The one primitive is the second-moment (Gram) matrix `Σ q qᵀ`
  * ([[graft.plans.GramAgg]]): with the vector PREPENDED by the
  * constant 1 ([[gramWithBias]]) its first row/column carry `n` and
  * the per-dimension sums, so means, covariance numerators
  * (`n·Σxᵢxⱼ − Σxᵢ·Σxⱼ`) and correlation numerators all derive from
  * the ONE pass — the classic sufficient-statistics trick.
  *
  * Scale shape: one map-side-combinable aggregate; the shuffle
  * carries one dim²/2 buffer per partition (a few KB), the corpus is
  * read exactly once, and NO vector ever moves between executors.
  * Contrast the naive formulation — explode to N·d rows, self-join to
  * N·d² — which shuffles the corpus d² times; the oracle does exactly
  * that in DuckDB to certify this path.
  *
  * Reference anchor: beyond-reference (no linear algebra in the
  * reference); the sufficient-statistics shape is the standard
  * one-pass covariance (e.g. Chan et al. 1983).
  */
object LinAlg {

  /** Upper triangle of the exact fixed-point Gram matrix of `vecCol`
    * (length `dim`): rows `(i, j, s)` with `0 ≤ i ≤ j < dim` and
    * `s = Σ_rows floor(x_i·scale)·floor(x_j·scale)` as DECIMAL(38,0).
    * One combinable agg + a triangle-index dim join (2 k rows). */
  def gramFixedPoint(df: DataFrame, vecCol: Column, dim: Int,
                     scale: Long = 1024L): DataFrame = {
    val spark = df.sparkSession
    val agg = GramAgg(ColumnBridge.expression(vecCol), dim, scale)
    val flat = df
      .agg(ColumnBridge.column(agg.toAggregateExpression()).as("g"))
      .select(posexplode(col("g")).as(Seq("idx", "s")))
    // triangle index → (i, j): a dim*(dim+1)/2-row local dim table,
    // broadcast — never computed with float sqrt arithmetic
    val pairs = for { i <- 0 until dim; j <- i until dim } yield
      (((2 * dim - i + 1) * i) / 2 + (j - i), i.toLong, j.toLong)
    import spark.implicits._
    val ix = spark.createDataset(pairs).toDF("idx", "i", "j")
    flat.join(broadcast(ix), Seq("idx"))
      .select(col("i"), col("j"), col("s"))
  }

  /** [[gramFixedPoint]] over `[1.0, vec]` — row/col 0 hold `n·scale²`
    * and `scale·Σ floor(xⱼ·scale)`: the complete sufficient statistics
    * for mean + covariance in one pass. */
  def gramWithBias(df: DataFrame, vecCol: Column, dim: Int,
                   scale: Long = 1024L): DataFrame =
    gramFixedPoint(
      df.select(concat(array(lit(1.0f)), vecCol).as("__v")),
      col("__v"), dim + 1, scale)

  /** The Achlioptas ±1 sign matrix (k×dim) for [[randomProject]]:
    * sign(j,i) = +1 iff md5("j_i")'s first hex char is 0-7 — a pure
    * function of (j, i), so any engine (and the SQL oracle) rebuilds
    * the identical matrix from the two integers alone. */
  def jlSigns(k: Int, dim: Int): Array[Array[Byte]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(k, dim) { (j, i) =>
      val hex = md.digest(s"${j}_${i}".getBytes("UTF-8"))
      md.reset()
      // first hex char 0-7 ⇔ top bit of the first byte is 0
      if ((hex(0) & 0x80) == 0) 1.toByte else (-1).toByte
    }
  }

  /** Johnson–Lindenstrauss projection of `vecCol` (length `dim`) to
    * `k` exact fixed-point coordinates — map-local (ONE native
    * expression, sign matrix as a plan-time field, no join and no
    * shuffle), the dimensionality-reduction front end for cheaper
    * ANN / clustering at 100 TB. Appends `outCol` as array<long>
    * where `y_j = Σ_i sign(j,i)·floor(x_i·scale)`. */
  def randomProject(df: DataFrame, vecCol: Column, dim: Int, k: Int,
                    outCol: String = "proj",
                    scale: Long = 1024L): DataFrame =
    df.withColumn(outCol,
      graft.plans.ProjectionExpressions.signProject(
        vecCol, jlSigns(k, dim), scale))
}
