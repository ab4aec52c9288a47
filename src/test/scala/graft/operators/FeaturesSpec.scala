package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Features: χ² selection and leave-one-out target encoding —
  * hand-computed contingencies and leakage checks. */
class FeaturesSpec extends SparkSuite {

  test("chi2Select: hand-computed contingency, full-df token dropped") {
    import spark.implicits._
    // 4 docs, 2 pos / 2 neg. "sig" appears in exactly the pos docs
    // (perfect association), "base" in all four (no signal → dropped),
    // "half" in one of each (zero association).
    val docs = Seq(
      (1L, "sig half base", 1L),
      (2L, "sig base", 1L),
      (3L, "half base", 0L),
      (4L, "base", 0L)).toDF("id", "text", "y")
    val got = Features.chi2Select(docs, "text", "id", "y", topK = 10)
      .collect().map(r => (r.getAs[String]("token"),
        r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("chi2_ppm")))
    // sig: a=2 b=0 c=0 d=2 → χ² = 4·(2·2−0)²/(2·2·2·2) = 4 → 4e6 ppm
    // half: a=1 b=1 → χ² = 0
    assert(got.toSeq == Seq(
      ("sig", 2L, 0L, 4000000L), ("half", 1L, 1L, 0L)))
    assert(!got.exists(_._1 == "base"), "all-docs token must be dropped")
  }

  test("chi2Select: ties break to the lexicographically smaller token") {
    import spark.implicits._
    val docs = Seq(
      (1L, "bb aa", 1L), (2L, "bb aa", 1L),
      (3L, "zz", 0L), (4L, "zz", 0L)).toDF("id", "text", "y")
    val got = Features.chi2Select(docs, "text", "id", "y", topK = 2)
      .collect().map(_.getAs[String]("token"))
    assert(got.toSeq == Seq("aa", "bb"), "equal χ² → token order")
  }

  test("targetEncodeLoo: excludes own label; singleton NULL") {
    import spark.implicits._
    val df = Seq(
      (1L, "c1", 1L), (2L, "c1", 0L), (3L, "c1", 1L), // Σy=2, n=3
      (4L, "solo", 1L)).toDF("id", "cat", "y")
    val got = Features.targetEncodeLoo(df, "cat", "y")
      .orderBy("id").collect()
      .map(r => Option(r.getAs[java.lang.Long]("loo_ppm")).map(_.toLong))
    // row1: (2−1)·1e6/2 = 500000; row2: (2−0)/2 = 1e6; row3: 500000
    assert(got.toSeq == Seq(
      Some(500000L), Some(1000000L), Some(500000L), None))
  }

  test("targetEncodeLoo: encoding never equals the leaked mean when " +
    "the row's label differs from its peers'") {
    import spark.implicits._
    // one positive among 9 negatives: the positive row's LOO mean is 0
    // (its peers are all negative) — a leaky encoder would emit 100000
    val df = ((1L to 9L).map(i => (i, "c", 0L)) :+ ((10L, "c", 1L)))
      .toDF("id", "cat", "y")
    val loo = Features.targetEncodeLoo(df, "cat", "y")
      .filter(col("id") === 10L).collect().head.getAs[Long]("loo_ppm")
    assert(loo == 0L)
  }
}
