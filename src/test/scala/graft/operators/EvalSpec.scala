package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Eval: exact AUC (incl. tie correction), retrieval metrics,
  * calibration bins — hand-computed fixtures. */
class EvalSpec extends SparkSuite {
  import org.apache.spark.sql.DataFrame

  private def scored(rows: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("score", "y")
  }

  test("aucExact: perfect separation → 1.0, reversed → 0.0") {
    val perfect = scored(Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)))
    val r = Eval.aucExact(perfect, "score", "y").collect().head
    assert(r.getAs[Long]("auc_ppm") == 1000000L)
    val reversed = scored(Seq((1L, 1L), (2L, 1L), (3L, 0L), (4L, 0L)))
    assert(Eval.aucExact(reversed, "score", "y")
      .collect().head.getAs[Long]("auc_ppm") == 0L)
  }

  test("aucExact: hand-computed case with ties") {
    // scores: pos {2, 3}, neg {1, 3}. Pairs: (2>1)=1, (2 vs 3)=0,
    // (3>1)=1, (3 vs 3 tie)=0.5 → U = 2.5 of 4 → AUC = 0.625
    val df = scored(Seq((1L, 0L), (3L, 0L), (2L, 1L), (3L, 1L)))
    val r = Eval.aucExact(df, "score", "y").collect().head
    assert(r.getAs[Long]("pos") == 2L && r.getAs[Long]("neg") == 2L)
    assert(r.getAs[Long]("auc_ppm") == 625000L)
  }

  test("aucExact: one-class input yields NULL, not a crash") {
    val df = scored(Seq((1L, 1L), (2L, 1L)))
    val r = Eval.aucExact(df, "score", "y").collect().head
    assert(r.isNullAt(r.fieldIndex("auc_ppm")))
  }

  test("score-NULL rows are excluded from AUC and calibration, not " +
    "counted as a lowest-rank group") {
    import spark.implicits._
    val clean = scored(Seq((1L, 0L), (3L, 0L), (2L, 1L), (3L, 1L)))
    val dirty = Seq(
      (Option(1L), 0L), (Option(3L), 0L), (Option(2L), 1L),
      (Option(3L), 1L),
      (Option.empty[Long], 1L), (Option.empty[Long], 0L))
      .toDF("score", "y")
    val a = Eval.aucExact(dirty, "score", "y").collect().head
    assert(a.getAs[Long]("pos") == 2L && a.getAs[Long]("neg") == 2L,
      "null-score rows must not enter pos/neg totals")
    assert(a.getAs[Long]("auc_ppm") == 625000L)
    val cb = Eval.calibrationBins(dirty, "score", "y", bins = 2)
      .orderBy("bin").collect()
    val cbClean = Eval.calibrationBins(clean, "score", "y", bins = 2)
      .orderBy("bin").collect()
    assert(cb.toSeq == cbClean.toSeq,
      "calibration must ignore null-score rows entirely (incl. n_all)")
    assert(cb.map(_.getAs[Long]("n")).sum == 4L)
  }

  test("aucExact: random-data AUC near 500000 (layout invariant)") {
    import spark.implicits._
    // deterministic pseudo-random: score/label decoupled via md5
    val df = (1 to 2000).map { i =>
      (i.toLong % 97, (if (md5Hex(i).charAt(0) < '8') 1L else 0L))
    }.toDF("score", "y")
    val a1 = Eval.aucExact(df.repartition(7), "score", "y")
      .collect().head.getAs[Long]("auc_ppm")
    val a2 = Eval.aucExact(df.repartition(3), "score", "y")
      .collect().head.getAs[Long]("auc_ppm")
    assert(a1 == a2, "partitioning must not change the exact AUC")
    assert(math.abs(a1 - 500000L) < 60000L, s"uninformative score: $a1")
  }

  private def md5Hex(i: Int): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(i.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("aucByGroup: each group's AUC equals aucExact on that group alone") {
    import spark.implicits._
    val df = (1 to 600).map { i =>
      val g = s"f${i % 3}"
      (g, (i * 7L) % 53, (if ((i * 2654435761L) % 97 < 40 + i % 3 * 10) 1L else 0L))
    }.toDF("g", "score", "y")
    val grouped = Eval.aucByGroup(df, "score", "y", "g")
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Long]("auc_ppm")).toMap
    Seq("f0", "f1", "f2").foreach { g =>
      val solo = Eval.aucExact(df.filter(col("g") === g), "score", "y")
        .collect().head.getAs[Long]("auc_ppm")
      assert(grouped(g) == solo, s"group $g")
    }
  }

  test("aucExact: invariant under strictly monotone score transforms") {
    import spark.implicits._
    // AUC is a pure rank statistic: squashing or stretching the score
    // axis monotonically must not move it by a single ppm
    val df = (1 to 500).map(i =>
      (i.toLong, (i * 17L) % 89, (if ((i * 48271L) % 100 < 45) 1L else 0L)))
      .toDF("id", "score", "y")
    val base = Eval.aucExact(df, "score", "y")
      .collect().head.getAs[Long]("auc_ppm")
    val stretched = Eval.aucExact(
      df.withColumn("score", col("score") * 1000L + 7L), "score", "y")
      .collect().head.getAs[Long]("auc_ppm")
    val squashed = Eval.aucExact(
      // x -> x² is monotone on non-negative scores
      df.withColumn("score", col("score") * col("score")), "score", "y")
      .collect().head.getAs[Long]("auc_ppm")
    assert(base == stretched && base == squashed,
      s"$base vs $stretched vs $squashed")
  }

  test("aucBootstrap: replicates deterministic, spread brackets the " +
    "point estimate, weights genuinely vary") {
    import spark.implicits._
    val df = (1 to 400).map(i =>
      (i.toLong, (i * 13L) % 101, (if ((i * 2654435761L) % 100 < 30 + i % 40) 1L else 0L)))
      .toDF("id", "score", "y")
    val point = Eval.aucExact(df, "score", "y")
      .collect().head.getAs[Long]("auc_ppm")
    def run() = Eval.aucBootstrap(df, "score", "y", "id", reps = 12)
      .collect().map(r => r.getAs[Long]("rep") -> r.getAs[Long]("auc_ppm"))
      .toMap
    val a = run()
    assert(a == run(), "bootstrap must be deterministic")
    assert(a.size == 12)
    val vals = a.values.toSeq
    assert(vals.distinct.size > 1, "replicates must differ (weights vary)")
    assert(vals.min <= point && point <= vals.max,
      s"point $point outside bootstrap range [${vals.min}, ${vals.max}]")
  }

  test("retrievalMetrics: hand-computed hits/recall/MRR") {
    import spark.implicits._
    val ranked = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 21L, 2L), (2L, 22L, 3L)).toDF("q", "d", "rank")
    val rel = Seq(
      (1L, 11L), (1L, 12L), (1L, 99L), // q1: 2 of 3 in top-3, first at 2
      (2L, 77L)                        // q2: zero hits
    ).toDF("q", "d")
    val got = Eval.retrievalMetrics(ranked, rel, "q", "d", "rank", k = 3)
      .orderBy("q").collect()
      .map(r => (r.getAs[Long]("q"), r.getAs[Long]("rel_total"),
        r.getAs[Long]("hits"), r.getAs[Long]("p_at_k_ppm"),
        r.getAs[Long]("recall_ppm"), r.getAs[Long]("mrr_ppm")))
    assert(got.toSeq == Seq(
      (1L, 3L, 2L, 666666L, 666666L, 500000L),
      (2L, 1L, 0L, 0L, 0L, 0L)))
  }

  test("calibrationBins: partitions all rows; perfect calibration on " +
    "a rank-uniform label") {
    import spark.implicits._
    // 100 distinct scores, label = top half → bins 0-4 all-neg,
    // bins 5-9 all-pos; conf midpoints ramp linearly
    val df = (1 to 100).map(i => (i.toLong, if (i > 50) 1L else 0L))
      .toDF("score", "y")
    val bins = Eval.calibrationBins(df, "score", "y", bins = 10)
      .orderBy("bin").collect()
    assert(bins.map(_.getAs[Long]("n")).sum == 100L)
    assert(bins.length == 10)
    val acc = bins.map(r => (r.getAs[Long]("bin"), r.getAs[Long]("acc_ppm")))
    assert(acc.take(5).forall(_._2 == 0L))
    assert(acc.drop(5).forall(_._2 == 1000000L))
    // bin 0 holds scores 1..10 → midpoints (2k+1)/200 for k=0..9,
    // mean = 100/2000 = 5% = 50000 ppm
    assert(bins.head.getAs[Long]("conf_ppm") == 50000L)
  }
}
