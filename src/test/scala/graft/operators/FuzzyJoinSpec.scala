package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class FuzzyJoinSpec extends SparkSuite {

  import spark.implicits._

  // varied-length names so the length band genuinely prunes, with
  // hand-placed cases: exact dup, near dup, a long outlier whose best
  // match exceeds the band (fallback path), a block with no right rows
  private def left = Seq(
    (1L, "nguyen van a", 10),
    (2L, "tran thi brilliantly long company name", 10),
    (3L, "le minh", 20),
    (4L, "pham x", 30) // block 30 has no right rows → dropped (inner)
  ).toDF("id", "name", "blk")

  private def right = Seq(
    ("nguyen van a", 10), // exact for 1
    ("nguyen van an", 10), // 1 edit
    ("xx", 10), // short noise — outside band for id 2
    ("completely different", 10), // best for id 2 only via fallback
    ("le minh quan", 20),
    ("le m", 20)
  ).toDF("rname", "blk")

  test("two-level bestMatch equals the single-level blocked form row-for-row") {
    val two = FuzzyJoin.bestMatch(left, right,
      "id", "name", "rname", "blk", band = 4)
      .orderBy("id").collect().toSeq
    val one = FuzzyJoin.bestMatchSingleLevel(left, right,
      "id", "name", "rname", "blk")
      .orderBy("id").collect().toSeq
    assert(two == one, s"\ntwo=$two\none=$one")
    // the fixture exercises both paths: id 1 resolves inside the band
    // (lev 0 ≤ 4), id 2's nearest is > 4 edits away → fallback
    val byId = two.map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(byId(1L) == 0L)
    assert(byId(2L) > 4L)
    assert(!byId.contains(4L), "empty block must drop (inner semantics)")
  }

  test("banded pass prunes candidates; fallback covers only uncertified rows") {
    val (banded, fallback, full) = FuzzyJoin.candidateCounts(
      left, right, "id", "name", "rname", "blk", band = 4)
    info(s"candidates: banded=$banded fallback=$fallback full=$full")
    assert(banded < full, "length band must cut the candidate set")
    // only id 2 falls back: its block (10) has 4 right rows
    assert(fallback == 4)
  }

  test("bestMatchAdaptive: identical rows on both sides of the switch") {
    val one = FuzzyJoin.bestMatchSingleLevel(left, right,
      "id", "name", "rname", "blk").orderBy("id").collect().toSeq
    // hot block (4 rows) below / above the threshold → both modes taken
    val small = FuzzyJoin.bestMatchAdaptive(left, right,
      "id", "name", "rname", "blk", band = 4, bandThreshold = 100)
      .orderBy("id").collect().toSeq
    val banded = FuzzyJoin.bestMatchAdaptive(left, right,
      "id", "name", "rname", "blk", band = 4, bandThreshold = 1)
      .orderBy("id").collect().toSeq
    assert(small == one && banded == one)
    // empty right side: no blocks → single-level, empty result
    assert(FuzzyJoin.bestMatchAdaptive(left, right.limit(0),
      "id", "name", "rname", "blk").isEmpty)
  }

  test("equality holds across bands on the TPC-H shape (uniform lengths)") {
    // supplier/customer names share a uniform length pattern — the band
    // keeps everything (no pruning, but no loss either); equality must
    // hold for any band including 0
    val sup = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey").as("nk"))
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_name"), col("c_nationkey").as("nk"))
    val one = FuzzyJoin.bestMatchSingleLevel(
      sup, cust, "s_suppkey", "s_name", "c_name", "nk")
      .orderBy("s_suppkey").collect().toSeq
    for (band <- Seq(0, 4)) {
      val two = FuzzyJoin.bestMatch(
        sup, cust, "s_suppkey", "s_name", "c_name", "nk", band = band)
        .orderBy("s_suppkey").collect().toSeq
      assert(two == one, s"band=$band diverged")
    }
  }
}
