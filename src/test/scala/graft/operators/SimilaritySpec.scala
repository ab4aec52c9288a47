package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SimilaritySpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("cosine: self-similarity is 1") {
    val one = emb.limit(5)
      .select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .collect().map(_.getDouble(0))
    assert(one.forall(c => math.abs(c - 1.0) < 1e-12))
  }

  test("bruteForceTopK returns k ranked neighbors per query") {
    val out = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 8), emb, k = 3)
    val rows = out.collect()
    assert(rows.length == 8 * 3)
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.values.forall(_.map(_.getLong(2)).sorted.toSeq == Seq(1L, 2L, 3L)))
    // cos non-increasing with rank
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
  }

  test("lshTopK recall@5 against exact top-5") {
    val q = emb.filter(col("vec_id") < 32)
    val exact = Similarity.bruteForceTopK(q, emb, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(q, emb, 5, dim = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(f"sign-LSH recall@5 = $recall%.3f (${approx.size} returned)")
    // 32 bits / 8 bands on random gaussian data: modest recall is
    // expected; the assertion guards against a broken bucketing join
    assert(recall > 0.15)
  }

  test("ivfTopK recall@5 against exact top-5") {
    val q = emb.filter(col("vec_id") < 32)
    val exact = Similarity.bruteForceTopK(q, emb, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(q, emb, 5, nlist = 16, nprobe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(f"IVF recall@5 (nprobe=4/16) = $recall%.3f")
    assert(recall > 0.3)
    // every query still gets exactly k results
    val perQuery = approx.groupBy(_._1).map(_._2.size)
    assert(perQuery.forall(_ == 5))
  }

  test("cosineNearDupPairs is symmetric-free (a<b) and thresholded") {
    val pairs = Similarity.cosineNearDupPairs(emb, 0.4).collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(_.getDouble(2) >= 0.4))
  }
}
