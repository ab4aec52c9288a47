package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

class LshIndexSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text"))
  private def tmpRoot(): String =
    Files.createTempDirectory("graft_lsh_idx").resolve("i").toString

  test("check against the stored index == fresh whole-corpus LSH, restricted to cross pairs") {
    val root = tmpRoot()
    val b = col("doc_id") % 4
    val indexed = docs.filter(b =!= 0)
    val batch = docs.filter(b === 0)
    LshIndex.build(indexed, root)
    val got = LshIndex.check(batch, indexed, root, threshold = 0.8)
      .collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)),
        math.round(r.getDouble(2) * 1e9))).toSet
    // the oracle: one fresh LSH pass over the WHOLE corpus (same seeded
    // permutations, same banding), restricted to indexed-vs-batch pairs
    val whole = Dedup.minhashNearDupPairs(docs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9)))
    val batchIds = batch.select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = whole.filter { case (a, bb, _) =>
      batchIds.contains(a) ^ batchIds.contains(bb)
    }.map { case (a, bb, j) => (math.min(a, bb), math.max(a, bb), j) }.toSet
    assert(got == expected)
    info(s"cross near-dup pairs through the stored index: ${got.size}")
    assert(got.nonEmpty) // the corpus genuinely contains cross near-dups
  }

  test("append grows the index by O(batch); exact copies under new ids are caught at J=1") {
    val root = tmpRoot()
    val b = col("doc_id") % 4
    val indexed = docs.filter(b =!= 0)
    LshIndex.build(indexed, root)
    val batch = docs.filter(b === 0)
    val v = LshIndex.append(batch, root)
    assert(v == 1L)
    // 32 band rows per doc in the latest snapshot, exactly once per doc
    val bandRows = graft.sources.VersionedTable.read(spark, s"$root/bands")
    assert(bandRows.count() == docs.count() * 32)
    // re-ingesting the same ids is NOT a duplicate of itself...
    val self = LshIndex.check(batch, docs, root, threshold = 0.999)
    assert(self.filter(col("id_a") === col("id_b")).count() == 0)
    // ...but an exact copy under a fresh id is caught at jaccard 1.0
    val copies = batch.limit(5)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val hits = LshIndex.check(copies, docs, root, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(hits.length >= 5)
    assert(hits.forall(_._3 == 1.0))
    assert(hits.exists { case (a, bb, _) => bb == a + 1000000L })
  }
}
