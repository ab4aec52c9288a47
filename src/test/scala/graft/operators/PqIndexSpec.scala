package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

class PqIndexSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private def tmpRoot(): String =
    Files.createTempDirectory("graft_pq_idx").resolve("i").toString

  test("search over a same-corpus build equals pqTopK row-for-row") {
    val root = tmpRoot()
    PqIndex.build(emb, root, dim = 64)
    val q = emb.filter(col("vec_id") < 32)
    val fromIndex = PqIndex.search(q, emb, root, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e9))).toSet
    val direct = Similarity.pqTopK(q, emb, k = 5, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e9))).toSet
    assert(fromIndex.nonEmpty && fromIndex == direct)
  }

  test("append encodes with the STORED codebook; codebook round-trips exactly") {
    val root = tmpRoot()
    val b = col("vec_id") % 4
    PqIndex.build(emb.filter(b =!= 0), root, dim = 64)
    val bookBefore = PqIndex.readCodebook(root)
    val v = PqIndex.append(emb.filter(b === 0), root)
    assert(v == 1L) // a new codes version, inheriting version 0's files
    // codebook bytes untouched by append — bitwise identical doubles
    val bookAfter = PqIndex.readCodebook(root)
    assert(bookBefore.flatten.flatten.toSeq == bookAfter.flatten.flatten.toSeq)
    // every corpus vector has exactly one code row in the latest snapshot
    val codes = graft.sources.VersionedTable.read(spark, s"$root/codes")
    assert(codes.count() == emb.count())
    assert(codes.select("id").distinct().count() == emb.count())
    // searching the appended index reaches vectors from BOTH batches
    val out = PqIndex.search(emb.filter(col("vec_id") < 32), emb, root, k = 5)
      .collect()
    val neighbors = out.map(_.getLong(1)).toSet
    assert(neighbors.exists(_ % 4 == 0) && neighbors.exists(_ % 4 != 0))
    // recall against brute force stays in the PQ envelope (codebook
    // trained on 3/4 of the corpus — mild degradation only)
    val exact = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 32), emb, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    info(f"appended-index recall@5 = $recall%.3f")
    assert(recall > 0.3)
  }
}
