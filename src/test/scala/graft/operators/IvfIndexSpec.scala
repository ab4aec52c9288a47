package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

class IvfIndexSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private def tmpRoot(): String =
    Files.createTempDirectory("graft_ivf_index").resolve("ix").toString

  test("index search equals the in-memory ivfTopK bit-for-bit") {
    val root = tmpRoot()
    IvfIndex.build(emb, root, nlist = 16)
    val q = emb.filter(col("vec_id") < 32)
    val fromIndex = IvfIndex.topK(spark, q, root, k = 5, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val inMemory = Similarity.ivfTopK(q, emb, k = 5, nlist = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(fromIndex == inMemory)
    assert(fromIndex.nonEmpty)
  }

  test("probe reads skip files: only the probed cell band opens") {
    val root = tmpRoot()
    IvfIndex.build(emb, root, nlist = 16)
    val allFiles = graft.sources.VersionedTable
      .read(spark, new java.io.File(root, "cells").getPath).inputFiles.length
    val one = emb.filter(col("vec_id") === 0)
    val opened = IvfIndex.topK(spark, one, root, k = 5, nprobe = 2)
      .inputFiles.count(_.contains("/cells/"))
    info(s"opened $opened of $allFiles index files for one query (nprobe=2)")
    assert(opened < allFiles)
    assert(opened > 0)
  }

  test("append assigns with STORED centroids; new vectors are searchable") {
    val root = tmpRoot()
    val base = emb.filter(col("vec_id") < 400)
    IvfIndex.build(base, root, nlist = 8)
    // append a shifted copy of vector 0 — identical embedding, new id
    val extra = emb.filter(col("vec_id") === 0)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"),
        col("label"))
    IvfIndex.append(extra, root)
    // searching with vector 0 must now surface its twin at rank 1 with
    // cos == 1 (same cell by construction: same stored centroids)
    val got = IvfIndex.topK(spark, emb.filter(col("vec_id") === 0), root,
      k = 3, nprobe = 2).collect()
    assert(got.head.getLong(1) == 100000L)
    assert(math.abs(got.head.getDouble(3) - 1.0) < 1e-12)
  }
}
