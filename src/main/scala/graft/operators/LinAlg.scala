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
                             squarings: Int = 7): Array[Long] =
    topComponentOfGram(gramFixedPoint(df, vecCol, dim, scale), dim, squarings)

  /** [[topComponentFixedPoint]] from an ALREADY-MATERIALIZED gram
    * triangle frame `(i, j, s)` — e.g. the incrementally-maintained
    * [[graft.sources.MaterializedView.readGram]] view: PCA that
    * trails the corpus through O(new files) refreshes, never a
    * rescan. The collect is the dim²/2-row triangle (dim-sized by
    * design). */
  def topComponentOfGram(gram: DataFrame, dim: Int,
                         squarings: Int = 7): Array[Long] = {
    val g = collectGram(gram, dim)
    var a = rescale(g)
    for (_ <- 1 to squarings) a = rescale(square(a))
    extract(a)
  }

  /** Top TWO components: v₁ from the squaring chain on the rescaled
    * gram A₀; v₂ from the SAME chain on the exactly-DEFLATED matrix
    *
    *   G₂ = (v₁ᵀv₁)²·A₀ − (v₁ᵀv₁)·(w v₁ᵀ + v₁ wᵀ) + (v₁ᵀA₀v₁)·v₁v₁ᵀ
    *      = P·A₀·P,   P = (v₁ᵀv₁)·I − v₁v₁ᵀ,   w = A₀·v₁
    *
    * — P annihilates v₁ identically in integer arithmetic, so G₂'s
    * dominant direction is the second component. Magnitude audit (all
    * bounds at the 2²⁰ grid): |A₀| ≤ 2²⁰, v₁ᵀv₁ ≤ 2⁴⁶, |w| ≤ 2⁴⁶,
    * v₁ᵀA₀v₁ ≤ 2⁷², so |G₂| ≤ 2¹¹⁴ — inside the oracle's HUGEINT.
    * The pair gives the standard 2-D PCA scatter for corpus maps /
    * outlier trims, exact end to end ([[pca2OracleSql]] replays it). */
  def topTwoComponentsOfGram(gram: DataFrame, dim: Int,
                             squarings: Int = 7): (Array[Long], Array[Long]) = {
    val a0 = rescale(collectGram(gram, dim))
    var a = a0
    for (_ <- 1 to squarings) a = rescale(square(a))
    val v1 = extract(a)
    val v = v1.map(BigInt(_))
    val vv = v.map(x => x * x).sum
    val w = Array.tabulate(dim)(i => (0 until dim).map(j => a0(i)(j) * v(j)).sum)
    val vav = (0 until dim).map(i => v(i) * w(i)).sum
    val g2 = Array.tabulate(dim, dim)((i, j) =>
      vv * vv * a0(i)(j) - vv * (w(i) * v(j) + v(i) * w(j)) + vav * v(i) * v(j))
    var b = rescale(g2)
    for (_ <- 1 to squarings) b = rescale(square(b))
    (v1, extract(b))
  }

  private def collectGram(gram: DataFrame, dim: Int): Array[Array[BigInt]] = {
    val g = Array.ofDim[BigInt](dim, dim)
    gram.collect().foreach { r =>
      val (i, j) = (r.getLong(0).toInt, r.getLong(1).toInt)
      val s = BigInt(r.getDecimal(2).toBigInteger)
      g(i)(j) = s; g(j)(i) = s
    }
    g
  }

  private def square(a: Array[Array[BigInt]]): Array[Array[BigInt]] = {
    val dim = a.length
    Array.tabulate(dim, dim)((i, j) =>
      (0 until dim).map(k => a(i)(k) * a(k)(j)).sum)
  }

  /** `rescale(A·1)` — the converged direction out of a squaring chain. */
  private def extract(a: Array[Array[BigInt]]): Array[Long] = {
    val w = a.map(_.sum)
    val mx = w.map(_.abs).max
    val v = if (mx.signum == 0) w else w.map(x => signDiv(x << 20, mx))
    v.map(_.toLong)
  }

  /** The DuckDB replay of [[topComponentFixedPoint]] + projection —
    * gram self-join, `squarings` rescaled matrix squarings, row-sum
    * extraction, corpus projection. Kept next to the operator so the
    * arithmetic can only drift in one place. */
  private def rsSql(src: String): String =
    s"CAST(sign(s) AS HUGEINT) * ((ABS(s) * 1048576) // " +
      s"(SELECT MAX(ABS(s)) FROM $src))"

  /** `squarings` rescaled-squaring CTEs `${p}a1..${p}a$squarings`
    * starting from `${p}a0`, plus the direction extraction
    * `${p}w`/`${p}v` (row sums, rescaled). */
  private def chainSql(p: String, squarings: Int): String = {
    val steps = (1 to squarings).map { t =>
      s"""        ${p}b$t AS MATERIALIZED (SELECT a.i AS i, b.j AS j, SUM(a.v * b.v) AS s
        |               FROM ${p}a${t - 1} a JOIN ${p}a${t - 1} b ON a.j = b.i GROUP BY 1, 2),
        |        ${p}a$t AS MATERIALIZED (SELECT i, j, ${rsSql(s"${p}b$t")} AS v FROM ${p}b$t),""".stripMargin
    }.mkString("\n")
    s"""$steps
        ${p}w AS MATERIALIZED (SELECT i, SUM(v) AS s FROM ${p}a$squarings GROUP BY i),
        ${p}v AS MATERIALIZED (SELECT i, ${rsSql(s"${p}w")} AS v FROM ${p}w),"""
  }

  /** The shared oracle prelude: quantized coordinates `q`, gram
    * triangle, symmetric `g0`, rescaled `a0`. */
  private def gramPrelude(table: String, idCol: String,
                          vecCol: String): String =
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
        a0 AS MATERIALIZED (SELECT i, j, ${rsSql("g0")} AS v FROM g0),"""

  /** The DuckDB replay of [[topComponentFixedPoint]] + projection —
    * gram self-join, `squarings` rescaled matrix squarings, row-sum
    * extraction, corpus projection. Kept next to the operator so the
    * arithmetic can only drift in one place. */
  def pcaOracleSql(table: String, idCol: String, vecCol: String,
                   squarings: Int = 7): String =
    s"""${gramPrelude(table, idCol, vecCol)}
${chainSql("", squarings)}
        __end AS (SELECT 1)
        SELECT q.$idCol, CAST(SUM(v.v * q.qx) AS BIGINT) AS p
        FROM q JOIN v USING (i)
        GROUP BY 1 ORDER BY $idCol"""

  /** The DuckDB replay of [[topTwoComponentsOfGram]] + projection:
    * chain 1 → v₁, exact deflation G₂ = P·A₀·P, chain 2 → v₂, both
    * projections. */
  def pca2OracleSql(table: String, idCol: String, vecCol: String,
                    squarings: Int = 7): String =
    s"""${gramPrelude(table, idCol, vecCol)}
${chainSql("", squarings)}
        dvv AS MATERIALIZED (SELECT SUM(v.v * v.v) AS x FROM v),
        dw AS MATERIALIZED (
          SELECT a.i AS i, SUM(a.v * v.v) AS x
          FROM a0 a JOIN v ON a.j = v.i GROUP BY 1),
        dvav AS MATERIALIZED (
          SELECT SUM(v.v * w.x) AS x FROM v JOIN dw w USING (i)),
        g2 AS MATERIALIZED (
          SELECT a.i AS i, a.j AS j,
                 (SELECT x * x FROM dvv) * a.v
                 - (SELECT x FROM dvv) * (wi.x * vj.v + vi.v * wj.x)
                 + (SELECT x FROM dvav) * vi.v * vj.v AS s
          FROM a0 a
          JOIN dw wi ON wi.i = a.i JOIN dw wj ON wj.i = a.j
          JOIN v vi ON vi.i = a.i JOIN v vj ON vj.i = a.j),
        ca0 AS MATERIALIZED (SELECT i, j, ${rsSql("g2")} AS v FROM g2),
${chainSql("c", squarings)}
        p1 AS MATERIALIZED (
          SELECT q.$idCol, CAST(SUM(v.v * q.qx) AS BIGINT) AS p1
          FROM q JOIN v USING (i) GROUP BY 1),
        p2 AS MATERIALIZED (
          SELECT q.$idCol, CAST(SUM(cv.v * q.qx) AS BIGINT) AS p2
          FROM q JOIN cv USING (i) GROUP BY 1)
        SELECT p1.$idCol, p1.p1, p2.p2
        FROM p1 JOIN p2 USING ($idCol) ORDER BY $idCol"""

  /** Map-local projection of every vector onto an integer weight
    * vector (e.g. [[topComponentFixedPoint]]'s output): appends
    * `outCol = Σ_i w_i·floor(x_i·scale)` as an exact long — the
    * corpus-wide PCA-ordering / outlier-trimming pass, no shuffle. */
  def projectFixed(df: DataFrame, vecCol: Column, weights: Array[Long],
                   outCol: String = "p", scale: Long = 1024L): DataFrame =
    df.withColumn(outCol,
      graft.plans.ProjectionExpressions.fixedDot(vecCol, weights, scale))
}
