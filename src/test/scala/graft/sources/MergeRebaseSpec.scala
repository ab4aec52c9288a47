package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.VersionedTable.MergeClause._

/** Conflict-aware commit reconciliation (the Delta conflict-class
  * role): a MERGE that loses its commit race to a PURE APPEND whose
  * files provably hold no source-key matches (manifest stat ranges
  * disjoint) REBASES the same delta onto the new head — phases 1-2
  * never recompute, the table is never re-read. Overlapping keys,
  * rewrites, and by-source clauses (which must SEE interleaved rows)
  * still recompute. The `beforeCommit` seam fires once per COMPUTE
  * (not per commit attempt), so its count is the recompute count. */
class MergeRebaseSpec extends SparkSuite {

  private def freshTable(): String = {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_rebase").resolve("t").toString
    VersionedTable.overwriteWithStats(
      (1L to 20L).map(i => (i, s"s$i", i * 10L)).toDF("k", "s", "v")
        .repartitionByRange(2, col("k")), root, "k")
    root
  }

  private def stateOf(root: String): Map[Long, (String, Long)] =
    VersionedTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  test("a DISJOINT racing append REBASES: one compute pass, no " +
    "second table read, both writers' effects land") {
    import spark.implicits._
    val root = freshTable()
    var computes = 0
    val src = Seq((5L, "u", 1L)).toDF("k", "s", "v")
    val (_, run) = graft.core.Metrics.measure(spark) {
      VersionedTable.mergeActions(spark, root, src, Seq("k"), Seq(
        Update(None, Map("v" -> expr("t.v + s.v")))),
        beforeCommit = () => {
          computes += 1
          if (computes == 1)
            VersionedTable.appendWithStats( // keys 100.. disjoint of 5
              Seq((100L, "r", 1L)).toDF("k", "s", "v"), root, "k")
        })
    }
    assert(computes == 1,
      s"a key-disjoint append must rebase, not recompute ($computes)")
    val st = stateOf(root)
    assert(st(5L) == ("s5", 51L), "the merge's update landed")
    assert(st(100L) == ("r", 1L), "the racing append's row survived")
    assert(st.size == 21)
    assert(run.bytesRead > 0) // the single compute pass did read
  }

  test("an OVERLAPPING racing append recomputes: the merge must see " +
    "the interleaved matching row") {
    import spark.implicits._
    val root = freshTable()
    var computes = 0
    val src = Seq((5L, "u", 1L), (30L, "n", 2L)).toDF("k", "s", "v")
    VersionedTable.mergeActions(spark, root, src, Seq("k"), Seq(
      Update(None, Map("v" -> expr("t.v + s.v"))),
      Insert(None, Map.empty)),
      beforeCommit = () => {
        computes += 1
        if (computes == 1)
          VersionedTable.appendWithStats( // key 30 INSIDE [5, 30]
            Seq((30L, "r", 100L)).toDF("k", "s", "v"), root, "k")
      })
    assert(computes == 2,
      s"an overlapping append must recompute ($computes)")
    val st = stateOf(root)
    // the recompute saw the appended k=30 as MATCHED: updated, not
    // double-inserted
    assert(st(30L) == ("r", 102L), st.get(30L).toString)
    assert(st(5L) == ("s5", 51L))
  }

  test("a racing REWRITE whose output carries NO key stats recomputes " +
    "— unprovable disjointness fails safe") {
    import spark.implicits._
    val root = freshTable()
    var computes = 0
    val src = Seq((5L, "u", 1L)).toDF("k", "s", "v")
    VersionedTable.mergeActions(spark, root, src, Seq("k"), Seq(
      Update(None, Map("v" -> expr("t.v + s.v")))),
      beforeCommit = () => {
        computes += 1
        if (computes == 1) {
          // delete stages its survivors with rows-only stats — the
          // loser cannot prove key-disjointness from the manifest and
          // must recompute, even though the file sets are disjoint
          VersionedTable.delete(spark, root, col("k") === 20L)
          ()
        }
      })
    assert(computes == 2, s"a stats-less rewrite must recompute ($computes)")
    val st = stateOf(root)
    assert(!st.contains(20L) && st(5L) == ("s5", 51L))
  }

  test("a racing COMPACTION of files the merge never touched REBASES: " +
    "one compute pass, data-preserving interleave is proof enough") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_rebase_c")
      .resolve("t").toString
    // one BIG file (keys 1-50, the merge's target) + two small ones
    VersionedTable.overwriteWithStats(
      (1L to 50L).map(i => (i, s"s$i", i * 10L)).toDF("k", "s", "v")
        .coalesce(1), root, "k")
    VersionedTable.appendWithStats(
      (100L to 110L).map(i => (i, s"s$i", i)).toDF("k", "s", "v")
        .coalesce(1), root, "k")
    VersionedTable.appendWithStats(
      (200L to 210L).map(i => (i, s"s$i", i)).toDF("k", "s", "v")
        .coalesce(1), root, "k")
    val sizes = VersionedTable.listingPaths(
      root, VersionedTable.latestVersion(root).get)
      .map(p => new java.io.File(p).length()).sorted
    val target = sizes.last // the big file must NOT be packed
    var computes = 0
    val src = Seq((5L, "u", 1L)).toDF("k", "s", "v")
    val (_, run) = graft.core.Metrics.measure(spark) {
      VersionedTable.mergeActions(spark, root, src, Seq("k"), Seq(
        Update(None, Map("v" -> expr("t.v + s.v")))),
        beforeCommit = () => {
          computes += 1
          if (computes == 1) {
            VersionedTable.compact(spark, root, targetBytes = target)
            ()
          }
        })
    }
    assert(computes == 1,
      s"a disjoint compaction interleave must rebase ($computes)")
    val st = stateOf(root)
    assert(st(5L) == ("s5", 51L), "the merge's update landed")
    assert(st.size == 72, s"every compacted row survived: ${st.size}")
    assert((100L to 110L).forall(st.contains) &&
      (200L to 210L).forall(st.contains))
    assert(run.bytesRead > 0)
  }

  test("a racing compaction that CONSUMED a merge-touched file " +
    "recomputes — replaying the delta would duplicate its rows") {
    import spark.implicits._
    val root = freshTable() // two small range files, keys 1-10 / 11-20
    var computes = 0
    val src = Seq((5L, "u", 1L)).toDF("k", "s", "v")
    VersionedTable.mergeActions(spark, root, src, Seq("k"), Seq(
      Update(None, Map("v" -> expr("t.v + s.v")))),
      beforeCommit = () => {
        computes += 1
        if (computes == 1) {
          // packs BOTH files (they are tiny) — including the touched one
          VersionedTable.compact(spark, root)
          ()
        }
      })
    assert(computes == 2,
      s"an overlapping compaction must recompute ($computes)")
    val st = stateOf(root)
    assert(st(5L) == ("s5", 51L) && st.size == 20,
      s"no duplicated or lost rows: ${st.size}")
  }

  test("two MERGEs with DISJOINT touched files and provably disjoint " +
    "key ranges serialize WITHOUT recompute (manifest-stats proof)") {
    import spark.implicits._
    val root = freshTable() // file1 = keys 1-10, file2 = keys 11-20
    var computes = 0
    val loserSrc = Seq((5L, "u", 1L)).toDF("k", "s", "v")
    val (_, run) = graft.core.Metrics.measure(spark) {
      VersionedTable.mergeActions(spark, root, loserSrc, Seq("k"), Seq(
        Update(None, Map("v" -> expr("t.v + s.v")))),
        beforeCommit = () => {
          computes += 1
          if (computes == 1) {
            // the WINNER merge touches file2 only; its staged output
            // (rows 11-20, k-stats [11,20]) is provably disjoint from
            // the loser's source range [5,5]
            VersionedTable.mergeActions(spark, root,
              Seq((15L, "w", 7L)).toDF("k", "s", "v"), Seq("k"), Seq(
                Update(None, Map("v" -> expr("t.v + s.v")))))
            ()
          }
        })
    }
    assert(computes == 1,
      s"disjoint merge-merge must rebase, not recompute ($computes)")
    val st = stateOf(root)
    assert(st(5L) == ("s5", 51L), "the loser's update landed")
    assert(st(15L) == ("s15", 157L), "the winner's update survived")
    assert(st.size == 20)
    assert(run.bytesRead > 0)
  }

  test("two merges over the SAME file (or overlapping key ranges) " +
    "recompute — the loser must see the winner's rows") {
    import spark.implicits._
    val root = freshTable()
    var computes = 0
    // both merges touch file2 (keys 11-20)
    val loserSrc = Seq((12L, "u", 1L)).toDF("k", "s", "v")
    VersionedTable.mergeActions(spark, root, loserSrc, Seq("k"), Seq(
      Update(None, Map("v" -> expr("t.v + s.v")))),
      beforeCommit = () => {
        computes += 1
        if (computes == 1) {
          VersionedTable.mergeActions(spark, root,
            Seq((15L, "w", 7L)).toDF("k", "s", "v"), Seq("k"), Seq(
              Update(None, Map("v" -> expr("t.v + s.v")))))
          ()
        }
      })
    assert(computes == 2,
      s"overlapping merge-merge must recompute ($computes)")
    val st = stateOf(root)
    assert(st(12L) == ("s12", 121L) && st(15L) == ("s15", 157L),
      "both updates land exactly once under the recompute")
  }

  test("DELETE racing a winner MERGE whose output rows don't match the " +
    "predicate rebases — the probe reads ONLY the winner's output") {
    import spark.implicits._
    val root = freshTable()
    var computes = 0
    VersionedTable.delete(spark, root, col("k") <= 3L, // touches file1
      beforeCommit = () => {
        computes += 1
        if (computes == 1) {
          VersionedTable.mergeActions(spark, root, // touches file2
            Seq((15L, "w", 7L)).toDF("k", "s", "v"), Seq("k"), Seq(
              Update(None, Map("v" -> expr("t.v + s.v")))))
          ()
        }
      })
    assert(computes == 1,
      s"a predicate-free merge interleave must rebase ($computes)")
    val st = stateOf(root)
    assert(!st.contains(1L) && !st.contains(3L) && st(15L)._2 == 157L)
    assert(st.size == 17)
  }

  test("DELETE racing a NON-MATCHING append rebases (one compute); a " +
    "MATCHING append recomputes and deletes the interleaved row too") {
    import spark.implicits._
    val root = freshTable()
    var computes = 0
    VersionedTable.delete(spark, root, col("k") <= 3L,
      beforeCommit = () => {
        computes += 1
        if (computes == 1)
          VersionedTable.appendWithStats( // k=50: predicate-free
            Seq((50L, "r", 1L)).toDF("k", "s", "v"), root, "k")
      })
    assert(computes == 1, s"predicate-free append must rebase ($computes)")
    val st1 = stateOf(root)
    assert(!st1.contains(1L) && st1.contains(50L) && st1.size == 18)
    // matching append: the interleaved row is IN the predicate
    var computes2 = 0
    VersionedTable.delete(spark, root, col("k") >= 40L,
      beforeCommit = () => {
        computes2 += 1
        if (computes2 == 1)
          VersionedTable.appendWithStats(
            Seq((60L, "m", 1L)).toDF("k", "s", "v"), root, "k")
      })
    assert(computes2 == 2, s"a matching append must recompute ($computes2)")
    val st2 = stateOf(root)
    assert(!st2.contains(50L) && !st2.contains(60L),
      "serializable delete removes the interleaved matching row too")
  }

  test("UPDATE racing a NON-MATCHING append rebases; a MATCHING " +
    "append recomputes and updates the interleaved row too") {
    import spark.implicits._
    val root = freshTable()
    var computes = 0
    VersionedTable.update(spark, root, col("k") === 2L,
      Map("v" -> lit(999L)),
      beforeCommit = () => {
        computes += 1
        if (computes == 1)
          VersionedTable.appendWithStats(
            Seq((70L, "r", 1L)).toDF("k", "s", "v"), root, "k")
      })
    assert(computes == 1, s"predicate-free append must rebase ($computes)")
    assert(stateOf(root)(2L) == ("s2", 999L))
    var computes2 = 0
    VersionedTable.update(spark, root, col("k") >= 70L,
      Map("v" -> lit(777L)),
      beforeCommit = () => {
        computes2 += 1
        if (computes2 == 1)
          VersionedTable.appendWithStats(
            Seq((80L, "m", 1L)).toDF("k", "s", "v"), root, "k")
      })
    assert(computes2 == 2, s"a matching append must recompute ($computes2)")
    val st = stateOf(root)
    assert(st(70L)._2 == 777L && st(80L)._2 == 777L,
      "the recompute must update the interleaved matching row too")
  }

  test("BY SOURCE clauses force recompute even for a disjoint append " +
    "— the interleaved row has no source match and must be processed") {
    import spark.implicits._
    val root = freshTable()
    var computes = 0
    val src = (1L to 20L).map(i => (i, s"s$i", i * 10L)).toDF("k", "s", "v")
    VersionedTable.mergeActions(spark, root, src, Seq("k"), Seq(
      Update(None, Map("v" -> expr("s.v"))),
      DeleteBySource(None)), // mirror: target rows without source match die
      beforeCommit = () => {
        computes += 1
        if (computes == 1)
          VersionedTable.appendWithStats(
            Seq((100L, "r", 1L)).toDF("k", "s", "v"), root, "k")
      })
    assert(computes == 2,
      s"by-source semantics must recompute ($computes)")
    val st = stateOf(root)
    assert(!st.contains(100L),
      "the mirror merge must have deleted the interleaved unmatched row")
    assert(st.size == 20)
  }
}
