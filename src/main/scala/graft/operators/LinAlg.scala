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

  /** PER-GROUP Gram matrices in the SAME one-pass aggregate (the
    * class-conditional second moments — Fisher/LDA sufficient
    * statistics, per-domain feature covariance): `(group, i, j, s)`,
    * one dim²/2 buffer per group per partition, map-side combined.
    * Group cardinality is the scale dial: the shuffle carries
    * |groups|·dim²/2 cells, fine for labels/domains/languages, not
    * for per-document grouping. */
  def gramByGroup(df: DataFrame, groupCol: String, vecCol: Column,
                  dim: Int, scale: Long = 1024L): DataFrame = {
    val spark = df.sparkSession
    val agg = GramAgg(ColumnBridge.expression(vecCol), dim, scale)
    val flat = df.groupBy(col(groupCol))
      .agg(ColumnBridge.column(agg.toAggregateExpression()).as("g"))
      .select(col(groupCol), posexplode(col("g")).as(Seq("idx", "s")))
    val pairs = for { i <- 0 until dim; j <- i until dim } yield
      (((2 * dim - i + 1) * i) / 2 + (j - i), i.toLong, j.toLong)
    import spark.implicits._
    val ix = spark.createDataset(pairs).toDF("idx", "i", "j")
    flat.join(broadcast(ix), Seq("idx"))
      .select(col(groupCol), col("i"), col("j"), col("s"))
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

  /** Sign-symmetric division `sign(a)·(|a| div b)` for the
    * power-iteration rescale: on NEGATIVES, floor (DuckDB BIGINT
    * `//`) and truncation (BigInt `/`, DuckDB HUGEINT `//` —
    * measured: the two DuckDB operators disagree) give different
    * quotients, so the portable rule divides magnitudes — positive
    * division is unambiguous in every engine, and the oracle writes
    * it the same way (`sign(w)·(abs(w)·2²⁰ // m)`). */
  private def signDiv(a: BigInt, b: BigInt): BigInt =
    (a.abs / b) * a.signum

  /** max|entry|-rescale to the 2²⁰ fixed-point grid ([[signDiv]]). */
  private def rescale(m: Array[Array[BigInt]]): Array[Array[BigInt]] = {
    val mx = m.flatten.map(_.abs).max
    if (mx.signum == 0) m else m.map(_.map(x => signDiv(x << 20, mx)))
  }

  /** Dominant second-moment direction (the top "PCA" component,
    * uncentered) by EXACT INTEGER repeated SQUARING of the
    * [[gramFixedPoint]] matrix: `G^(2^squarings)` amplifies the
    * spectral gap exponentially (plain power iteration needs ~100
    * rounds on a near-isotropic spectrum — measured; 7 squarings
    * ≡ 128 rounds), with every product rescaled to max|entry| = 2²⁰
    * by [[signDiv]] — no float normalization anywhere, so the whole
    * trajectory is a pure integer function of the data that the SQL
    * oracle replays CTE-for-CTE ([[pcaOracleSql]]). The Gram triangle
    * is the ONLY driver traffic (dim²/2 rows — dim-sized; the corpus
    * stays distributed; the d³ squarings are microseconds), and the
    * returned vector (`A·1`, rescaled) rides back into the plan as a
    * [[graft.plans.FixedDot]] constant. */
  def topComponentFixedPoint(df: DataFrame, vecCol: Column, dim: Int,
                             scale: Long = 1024L,
                             squarings: Int = 7): Array[Long] = {
    val tri = gramFixedPoint(df, vecCol, dim, scale).collect()
    val g = Array.ofDim[BigInt](dim, dim)
    tri.foreach { r =>
      val (i, j) = (r.getLong(0).toInt, r.getLong(1).toInt)
      val s = BigInt(r.getDecimal(2).toBigInteger)
      g(i)(j) = s; g(j)(i) = s
    }
    var a = rescale(g)
    for (_ <- 1 to squarings) {
      val sq = Array.tabulate(dim, dim)((i, j) =>
        (0 until dim).map(k => a(i)(k) * a(k)(j)).sum)
      a = rescale(sq)
    }
    val w = a.map(_.sum) // A·1
    val mx = w.map(_.abs).max
    val v = if (mx.signum == 0) w else w.map(x => signDiv(x << 20, mx))
    v.map(_.toLong)
  }

  /** The DuckDB replay of [[topComponentFixedPoint]] + projection —
    * gram self-join, `squarings` rescaled matrix squarings, row-sum
    * extraction, corpus projection. Kept next to the operator so the
    * arithmetic can only drift in one place. */
  def pcaOracleSql(table: String, idCol: String, vecCol: String,
                   squarings: Int = 7): String = {
    def rs(src: String): String =
      s"CAST(sign(s) AS HUGEINT) * ((ABS(s) * 1048576) // " +
        s"(SELECT MAX(ABS(s)) FROM $src))"
    val chain = (1 to squarings).map { t =>
      s"""        b$t AS MATERIALIZED (SELECT a.i AS i, b.j AS j, SUM(a.v * b.v) AS s
        |               FROM a${t - 1} a JOIN a${t - 1} b ON a.j = b.i GROUP BY 1, 2),
        |        a$t AS MATERIALIZED (SELECT i, j, ${rs(s"b$t")} AS v FROM b$t),""".stripMargin
    }.mkString("\n")
    s"""
        WITH q AS MATERIALIZED (
          SELECT $idCol,
                 CAST(generate_subscripts($vecCol, 1) AS BIGINT) - 1 AS i,
                 CAST(FLOOR(CAST(UNNEST($vecCol) AS DOUBLE) * 1024) AS BIGINT) AS qx
          FROM $table),
        gr AS MATERIALIZED (
          SELECT a.i AS i, b.i AS j,
                 CAST(SUM(CAST(a.qx AS DECIMAL(18,0)) * b.qx) AS HUGEINT) AS s
          FROM q a JOIN q b ON a.$idCol = b.$idCol AND a.i <= b.i
          GROUP BY 1, 2),
        g0 AS MATERIALIZED (SELECT i, j, s FROM gr
               UNION ALL SELECT j, i, s FROM gr WHERE i < j),
        a0 AS MATERIALIZED (SELECT i, j, ${rs("g0")} AS v FROM g0),
$chain
        w AS MATERIALIZED (SELECT i, SUM(v) AS s FROM a$squarings GROUP BY i),
        vv AS MATERIALIZED (SELECT i, ${rs("w")} AS v FROM w)
        SELECT q.$idCol, CAST(SUM(vv.v * q.qx) AS BIGINT) AS p
        FROM q JOIN vv USING (i)
        GROUP BY 1 ORDER BY $idCol"""
  }

  /** Map-local projection of every vector onto an integer weight
    * vector (e.g. [[topComponentFixedPoint]]'s output): appends
    * `outCol = Σ_i w_i·floor(x_i·scale)` as an exact long — the
    * corpus-wide PCA-ordering / outlier-trimming pass, no shuffle. */
  def projectFixed(df: DataFrame, vecCol: Column, weights: Array[Long],
                   outCol: String = "p", scale: Long = 1024L): DataFrame =
    df.withColumn(outCol,
      graft.plans.ProjectionExpressions.fixedDot(vecCol, weights, scale))
}
