package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** TrainPrep: skip-gram pair generation and length-bucketed batching —
  * hand-computed windows, subsampling determinism, padding math. */
class TrainPrepSpec extends SparkSuite {

  test("skipGramPairs: ±window pairs, no subsampling at huge keepC") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "x y")).toDF("doc_id", "text")
    val got = TrainPrep.skipGramPairs(docs, "doc_id", "text",
        window = 1, keepC = 1000000L)
      .collect().map(r => (r.getAs[String]("center"),
        r.getAs[String]("context")))
      .groupBy(identity).map { case (k, v) => k -> v.length }
    // doc1: (a,b) (b,a) (b,c) (c,b); doc2: (x,y) (y,x)
    assert(got == Map(("a", "b") -> 1, ("b", "a") -> 1, ("b", "c") -> 1,
      ("c", "b") -> 1, ("x", "y") -> 1, ("y", "x") -> 1))
  }

  test("skipGramPairs: window 2 skips nothing in range, no self-offset") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val got = TrainPrep.skipGramPairs(docs, "doc_id", "text",
        window = 2, keepC = 1000000L)
      .filter(col("center") === "b").collect()
      .map(_.getAs[String]("context")).sorted
    assert(got.toSeq == Seq("a", "c", "d")) // pos 1: offsets -1,+1,+2
  }

  test("skipGramPairs: subsampling is deterministic and ∝ 1/f") {
    import spark.implicits._
    // 'the' appears 200×, 'rare' 2× across docs
    val docs = (1 to 100).map(i => (i.toLong,
      if (i <= 2) "rare the the" else "the the")).toDF("doc_id", "text")
    def run() = TrainPrep.skipGramPairs(docs, "doc_id", "text",
        window = 1, keepC = 50L)
      .groupBy(col("center")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("center") -> r.getAs[Long]("n")).toMap
    val a = run(); val b = run()
    assert(a == b, "subsampling must be deterministic")
    // rare (f=2 ≤ keepC) always kept as center; 'the' (f=202) heavily
    // subsampled: p ≈ 50/202 → far fewer center occurrences survive
    assert(a.contains("rare"))
    val theCenters = a.getOrElse("the", 0L)
    assert(theCenters > 0L && theCenters < 150L,
      s"'the' centers should be subsampled, got $theCenters")
  }

  test("lengthBatches: batch size cap, in-band lengths, padding math") {
    import spark.implicits._
    val docs = (1 to 40).map { i =>
      (i.toLong, Seq.fill(4 + (i % 20))("w").mkString(" "))
    }.toDF("doc_id", "text")
    val got = TrainPrep.lengthBatches(docs, "doc_id", "text",
      band = 8L, batchSize = 4).collect()
    got.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      assert(n <= 4L)
      val maxL = r.getAs[Long]("max_len")
      val sumL = r.getAs[Long]("sum_len")
      val pad = r.getAs[Long]("padding")
      assert(pad == maxL * n - sumL)
      assert(r.getAs[Long]("waste_ppm") == pad * 1000000L / (maxL * n))
      // bucket b holds lengths in [8b, 8b+7] → padding per doc < band
      assert(pad <= (8L - 1) * n)
    }
    assert(got.map(_.getAs[Long]("n_docs")).sum == 40L,
      "every doc lands in exactly one batch")
  }

  test("lengthBatches: assignment is partitioning-invariant") {
    import spark.implicits._
    val docs = (1 to 60).map(i =>
      (i.toLong, Seq.fill(3 + i % 10)("w").mkString(" "))).toDF("doc_id", "text")
    def sig(parts: Int) = TrainPrep.lengthBatches(
        docs.repartition(parts), "doc_id", "text", band = 4L, batchSize = 5)
      .collect().map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("batch_id"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("max_len"),
        r.getAs[Long]("sum_len"))).toSet
    assert(sig(2) == sig(7))
  }
}
