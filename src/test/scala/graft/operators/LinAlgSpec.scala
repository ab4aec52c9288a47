package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class LinAlgSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => ((r.getLong(0), r.getLong(1)),
      r.getDecimal(2).toBigInteger)).toMap

  test("gramFixedPoint == brute-force integer recompute") {
    val got = asMap(LinAlg.gramFixedPoint(emb, col("embedding"), 64))
    val vecs = emb.collect().map(_.getSeq[Float](1).toArray)
    val q = vecs.map(_.map(x => math.floor(x.toDouble * 1024).toLong))
    val dim = 64
    for (i <- 0 until dim; j <- i until dim) {
      val expect = q.map(v => BigInt(v(i)) * BigInt(v(j))).sum
      assert(got((i.toLong, j.toLong)) == expect.bigInteger,
        s"cell ($i,$j)")
    }
    assert(got.size == dim * (dim + 1) / 2)
  }

  test("gramWithBias bias row carries n·scale² and scale·sums") {
    val n = emb.count()
    val got = asMap(LinAlg.gramWithBias(emb, col("embedding"), 64))
    assert(got((0L, 0L)) == (BigInt(n) * 1024L * 1024L).bigInteger)
    val q0 = emb.collect()
      .map(r => math.floor(r.getSeq[Float](1).head.toDouble * 1024).toLong)
      .map(BigInt(_)).sum
    assert(got((0L, 1L)) == (q0 * 1024L).bigInteger)
    assert(got.size == 65 * 66 / 2)
  }

  test("partition-layout invariance (merge path)") {
    val a = asMap(LinAlg.gramFixedPoint(emb.repartition(13), col("embedding"), 64))
    val b = asMap(LinAlg.gramFixedPoint(emb.coalesce(1), col("embedding"), 64))
    assert(a == b)
  }

  test("BigInt spill path: cells past 2^59 stay exact") {
    import spark.implicits._
    // q = floor(512·2^20) = 2^29 → each product 2^58; 8 rows → 2^61,
    // past the 2^59 at-rest flush threshold → exercises the spill
    val big = Seq.fill(8)(Array(512.0f)).toDF("v").repartition(3)
    val got = asMap(
      LinAlg.gramFixedPoint(big, col("v"), 1, scale = 1L << 20)
        .select(col("i"), col("j"), col("s")))
    assert(got((0L, 0L)) == (BigInt(8) * (BigInt(1) << 58)).bigInteger)
  }

  test("randomProject == driver-side sign-matrix recompute; plan is map-local") {
    val k = 16; val dim = 64
    val got = LinAlg.randomProject(emb, col("embedding"), dim, k)
      .select(col("vec_id"), col("proj")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val signs = LinAlg.jlSigns(k, dim)
    emb.collect().foreach { r =>
      val q = r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1024).toLong)
      val expect = Array.tabulate(k)(j =>
        (0 until dim).map(i => signs(j)(i) * q(i)).sum)
      assert(got(r.getLong(0)).sameElements(expect))
    }
    // map-local: no Exchange anywhere in the projection plan
    val plan = LinAlg.randomProject(emb, col("embedding"), dim, k)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("JL property: projected distances concentrate around the originals") {
    val k = 16; val dim = 64
    val rows = LinAlg.randomProject(emb.limit(200), col("embedding"), dim, k)
      .collect()
      .map(r => (r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getSeq[Long](2).map(_.toDouble / 1024.0).toArray))
    val pairs = for (a <- rows.indices; b <- a + 1 until rows.length
                     if (a + b) % 37 == 0) yield (rows(a), rows(b))
    val ratios = pairs.flatMap { case ((xa, pa), (xb, pb)) =>
      def d2(u: Array[Double], v: Array[Double]) =
        u.zip(v).map { case (p, q) => (p - q) * (p - q) }.sum
      val orig = d2(xa, xb)
      // E[|P(x−y)|²] = k·|x−y|² for ±1 sign projections
      if (orig > 1e-9) Some(d2(pa, pb) / (k * orig)) else None
    }
    val mean = ratios.sum / ratios.size
    info(f"pairs=${ratios.size} mean distortion ratio $mean%.3f")
    assert(mean > 0.8 && mean < 1.2)
    // no catastrophic single-pair distortion at k=16 (loose 6x bound)
    assert(ratios.forall(r => r > 1.0 / 6 && r < 6.0))
  }

  test("topComponentFixedPoint aligns with the float-space dominant eigenvector") {
    val v = LinAlg.topComponentFixedPoint(emb, col("embedding"), 64)
    // float reference: 50 normalized power-iteration rounds on the
    // double Gram matrix (plenty past the integer path's 3)
    val vecs = emb.collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val g = Array.ofDim[Double](64, 64)
    vecs.foreach { x =>
      for (i <- 0 until 64; j <- 0 until 64) g(i)(j) += x(i) * x(j)
    }
    var u = Array.fill(64)(1.0)
    for (_ <- 1 to 50) {
      val w = Array.tabulate(64)(i => (0 until 64).map(j => g(i)(j) * u(j)).sum)
      val n = math.sqrt(w.map(x => x * x).sum)
      u = w.map(_ / n)
    }
    val vn = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
    val cos = math.abs(v.zip(u).map { case (a, b) => a * b }.sum) / vn
    info(f"cosine(integer 7-squaring, float 50-round) = $cos%.4f")
    assert(cos > 0.98)
  }

  test("topTwoComponents: v2 ⊥ v1 and aligned with the float 2nd eigenvector") {
    val (v1, v2) = LinAlg.topTwoComponentsOfGram(
      LinAlg.gramFixedPoint(emb, col("embedding"), 64), 64)
    def norm(v: Array[Long]) = math.sqrt(v.map(x => x.toDouble * x).sum)
    val cos12 = math.abs(v1.zip(v2).map { case (a, b) => a.toDouble * b }.sum) /
      (norm(v1) * norm(v2))
    info(f"|cos(v1, v2)| = $cos12%.5f")
    assert(cos12 < 0.05)
    // float reference: deflated power iteration (Gram–Schmidt each step)
    val vecs = emb.collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val g = Array.ofDim[Double](64, 64)
    vecs.foreach { x =>
      for (i <- 0 until 64; j <- 0 until 64) g(i)(j) += x(i) * x(j)
    }
    def iterate(orthoTo: Option[Array[Double]]): Array[Double] = {
      var u = Array.fill(64)(1.0)
      for (_ <- 1 to 80) {
        var w = Array.tabulate(64)(i => (0 until 64).map(j => g(i)(j) * u(j)).sum)
        orthoTo.foreach { o =>
          val d = w.zip(o).map { case (a, b) => a * b }.sum
          w = w.zip(o).map { case (a, b) => a - d * b }
        }
        val n = math.sqrt(w.map(x => x * x).sum)
        u = w.map(_ / n)
      }
      u
    }
    val u1 = iterate(None)
    val u2 = iterate(Some(u1))
    val cos2 = math.abs(v2.zip(u2).map { case (a, b) => a * b }.sum) / norm(v2)
    info(f"cosine(integer v2, float u2) = $cos2%.4f")
    assert(cos2 > 0.95)
  }

  test("projectFixed == driver dot recompute; plan is map-local") {
    val v = LinAlg.topComponentFixedPoint(emb, col("embedding"), 64)
    val proj = LinAlg.projectFixed(emb, col("embedding"), v)
    assert(!proj.queryExecution.executedPlan.toString.contains("Exchange"))
    val got = proj.select(col("vec_id"), col("p")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    emb.collect().foreach { r =>
      val q = r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1024).toLong)
      val expect = v.zip(q).map { case (w, x) => w * x }.sum
      assert(got(r.getLong(0)) == expect)
    }
  }

  test("quantized elements past 2^30 are rejected, not silently wrong") {
    import spark.implicits._
    val huge = Seq(Array(3.0e9f)).toDF("v")
    val ex = intercept[Exception] {
      LinAlg.gramFixedPoint(huge, col("v"), 1).collect()
    }
    assert(ex.getMessage != null)
  }
}
