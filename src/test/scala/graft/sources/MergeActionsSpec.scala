package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.VersionedTable.MergeClause.{Delete, DeleteBySource, Insert, Update, UpdateBySource}

/** [[VersionedTable.mergeActions]] — the general (conditional) MERGE:
  * first-true-clause precedence, NULL conditions not-true, unmatched
  * target rows untouched, insert-only merges skipping the rewrite
  * (untouched files carry byte-identical), type alignment, and the
  * multiple-source-matches refusal. */
class MergeActionsSpec extends SparkSuite {

  private def tmpRoot(): String =
    Files.createTempDirectory("graft_ma").resolve("t").toString

  /** k 1..6: (1,"a",10) .. (6,"f",60), two files. */
  private def freshTable(): String = {
    import spark.implicits._
    val root = tmpRoot()
    val df = (1 to 6).map(i => (i.toLong, ('a' + i - 1).toChar.toString,
      i * 10L)).toDF("k", "s", "v").repartitionByRange(2, col("k"))
    VersionedTable.overwrite(df, root)
    root
  }

  private def stateOf(root: String): Map[Long, (String, Long)] =
    VersionedTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  test("conditional update + delete + conditional insert, one commit") {
    import spark.implicits._
    val root = freshTable()
    // source: keys 2 (v=99), 4 (v=5), 7 (new), 8 (new)
    val src = Seq((2L, "X", 99L), (4L, "Y", 5L), (7L, "N", 70L),
      (8L, "M", 80L)).toDF("k", "s", "v")
    val v = VersionedTable.mergeActions(spark, root, src, Seq("k"), Seq(
      Delete(Some(expr("s.v > 50"))),               // kills k=2 (src v=99)
      Update(None, Map("v" -> expr("t.v + s.v"))), // k=4 → 40+5
      Insert(Some(expr("s.k % 2 = 1")), Map.empty) // only k=7 inserts
    ))
    assert(v == 1L)
    val st = stateOf(root)
    assert(!st.contains(2L), "matched delete clause must remove k=2")
    assert(st(4L) == ("d", 45L), "update keeps unset columns, adds v")
    assert(st(7L) == ("N", 70L), "insert condition admits odd keys")
    assert(!st.contains(8L), "insert condition rejects even keys")
    assert(st(1L) == ("a", 10L) && st(6L) == ("f", 60L),
      "unmatched target rows carry unchanged")
  }

  test("clause order is precedence: update-first shadows delete") {
    import spark.implicits._
    val root = freshTable()
    val src = Seq((3L, "Z", 999L)).toDF("k", "s", "v")
    VersionedTable.mergeActions(spark, root, src, Seq("k"), Seq(
      Update(Some(expr("s.v > 0")), Map("s" -> expr("s.s"))),
      Delete(None)), targetAlias = "t", sourceAlias = "s")
    val st = stateOf(root)
    assert(st(3L) == ("Z", 30L),
      "first-true clause (update) wins; delete never fires")
  }

  test("NULL clause condition is NOT TRUE (SQL), row falls through") {
    import spark.implicits._
    val root = freshTable()
    // s.x is NULL for k=5 → the delete condition evaluates NULL →
    // falls through to the unconditional update
    val src = Seq((5L, Option.empty[Long])).toDF("k", "x")
    VersionedTable.mergeActions(spark, root, src, Seq("k"), Seq(
      Delete(Some(expr("s.x > 0"))),
      Update(None, Map("v" -> expr("t.v + 1")))))
    assert(stateOf(root)(5L) == ("e", 51L))
  }

  test("no clause fires: matched row carries; complete no-op commits " +
    "no version") {
    import spark.implicits._
    val root = freshTable()
    val src = Seq((5L, 0L)).toDF("k", "x")
    val v = VersionedTable.mergeActions(spark, root, src, Seq("k"), Seq(
      Delete(Some(expr("s.x > 0")))))
    // the touched file is rewritten (the engine cannot know statically
    // that zero rows changed) but content is identical
    assert(stateOf(root)(5L) == ("e", 50L))
    // a merge matching NOTHING with insert-only clauses commits nothing
    val src2 = Seq((99L, "q", 1L)).toDF("k", "s", "v")
    val v2 = VersionedTable.mergeActions(spark, root, src2, Seq("k"), Seq(
      Insert(Some(expr("s.v > 100")), Map.empty)))
    assert(v2 == v, "no-effect merge must not churn history")
  }

  test("insert-only merge never rewrites: untouched files carry " +
    "byte-identical even for matched keys") {
    import spark.implicits._
    val root = freshTable()
    val before = VersionedTable.read(spark, root)
      .select(col("_metadata.file_path")).distinct()
      .collect().map(_.getString(0)).toSet
    // k=1 matches but there is no matched clause — its file must carry
    val src = Seq((1L, "dup", 1L), (9L, "i", 90L)).toDF("k", "s", "v")
    VersionedTable.mergeActions(spark, root, src, Seq("k"), Seq(
      Insert(None, Map.empty)))
    val after = VersionedTable.read(spark, root)
      .select(col("_metadata.file_path")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(before.subsetOf(after), "insert-only merge must not rewrite")
    val st = stateOf(root)
    assert(st(1L) == ("a", 10L), "matched key not re-inserted or updated")
    assert(st(9L) == ("i", 90L))
  }

  test("INSERT explicit values: listed columns get expressions, " +
    "unlisted take NULL; INSERT * null-fills missing source columns") {
    import spark.implicits._
    val root = freshTable()
    val src = Seq((10L, 100L)).toDF("k", "v")
    VersionedTable.mergeActions(spark, root, src, Seq("k"), Seq(
      Insert(None, Map("k" -> expr("s.k"), "v" -> expr("s.v * 2")))))
    val r = VersionedTable.read(spark, root).filter(col("k") === 10L)
      .collect().head
    assert(r.isNullAt(1) && r.getLong(2) == 200L)
    val src2 = Seq((11L, 110L)).toDF("k", "v") // no 's' column at all
    VersionedTable.mergeActions(spark, root, src2, Seq("k"), Seq(
      Insert(None, Map.empty)))
    val r2 = VersionedTable.read(spark, root).filter(col("k") === 11L)
      .collect().head
    assert(r2.isNullAt(1) && r2.getLong(2) == 110L)
  }

  test("duplicate source keys matching a target row are refused when " +
    "a matched clause exists; tolerated for insert-only") {
    import spark.implicits._
    val root = freshTable()
    val dup = Seq((2L, "p", 1L), (2L, "q", 2L)).toDF("k", "s", "v")
    val e = intercept[IllegalArgumentException] {
      VersionedTable.mergeActions(spark, root, dup, Seq("k"), Seq(
        Update(None, Map("v" -> expr("s.v")))))
    }
    assert(e.getMessage.contains("multiple rows per key"))
    // insert-only: duplicates are legal SQL MERGE (both rows insert)
    val dupNew = Seq((20L, "p", 1L), (20L, "q", 2L)).toDF("k", "s", "v")
    VersionedTable.mergeActions(spark, root, dupNew, Seq("k"), Seq(
      Insert(None, Map.empty)))
    assert(VersionedTable.read(spark, root)
      .filter(col("k") === 20L).count() == 2L)
  }

  test("updated and inserted values cast to the TABLE's column types") {
    import spark.implicits._
    val root = freshTable() // v is BIGINT
    val src = Seq((1, 7), (30, 3)).toDF("k", "v") // INT source
    VersionedTable.mergeActions(spark, root, src, Seq("k"), Seq(
      Update(None, Map("v" -> expr("s.v"))),
      Insert(None, Map("k" -> expr("s.k"), "v" -> expr("s.v")))))
    val sch = VersionedTable.read(spark, root).schema
    assert(sch("k").dataType == org.apache.spark.sql.types.LongType)
    assert(sch("v").dataType == org.apache.spark.sql.types.LongType)
    val st = stateOf(root)
    assert(st(1L) == ("a", 7L) && st(30L)._2 == 3L)
  }

  test("BY SOURCE full mirror: matched update + insert + by-source " +
    "delete sync the table to the source in ONE commit") {
    import spark.implicits._
    val root = freshTable() // k 1..6
    val base = VersionedTable.latestVersion(root).get
    // snapshot: keeps 2 and 4 (2 changed), adds 9 — everything else goes
    val snap = Seq((2L, "B", 200L), (4L, "d", 40L), (9L, "i", 90L))
      .toDF("k", "s", "v")
    val v = VersionedTable.mergeActions(spark, root, snap, Seq("k"), Seq(
      Update(None, Map.empty),  // SET * — replace matched rows
      Insert(None, Map.empty),
      DeleteBySource(None)))
    assert(v == base + 1, "the mirror is ONE atomic commit")
    val st = stateOf(root)
    assert(st == Map(2L -> ("B", 200L), 4L -> ("d", 40L),
      9L -> ("i", 90L)), s"table must equal the snapshot, got $st")
  }

  test("BY SOURCE conditional update + delete: first-true precedence " +
    "within the by-source family; matched rows untouched by it") {
    import spark.implicits._
    val root = freshTable()
    val src = Seq((1L, "a", 10L)).toDF("k", "s", "v") // only k=1 matches
    VersionedTable.mergeActions(spark, root, src, Seq("k"), Seq(
      // unmatched rows with v < 35: flag; others: delete. k=2,3 (20,30)
      // flag; k=4,5,6 (40,50,60) delete; k=1 matched → carries.
      UpdateBySource(Some(expr("t.v < 35")), Map("s" -> lit("stray"))),
      DeleteBySource(None)))
    val st = stateOf(root)
    assert(st == Map(1L -> ("a", 10L), 2L -> ("stray", 20L),
      3L -> ("stray", 30L)), s"got $st")
  }

  test("BY SOURCE pruning set: a file whose keys ALL match must not " +
    "rewrite under by-source-only clauses; only stray-holding files do") {
    import spark.implicits._
    val root = freshTable() // 2 range files: k 1..3 and k 4..6
    val before = VersionedTable.read(spark, root)
      .withColumn("f", col("_metadata.file_path"))
      .select("k", "f").collect().map(r => r.getLong(0) -> r.getString(1))
      .toMap
    // source covers ALL of file 1 (k=1,2,3) and part of file 2
    val src = Seq(1L, 2L, 3L, 4L).toDF("k")
    VersionedTable.mergeActions(spark, root, src, Seq("k"), Seq(
      DeleteBySource(None)))
    val after = VersionedTable.read(spark, root)
      .withColumn("f", col("_metadata.file_path"))
      .select("k", "f").collect().map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(after.keySet == Set(1L, 2L, 3L, 4L))
    assert(after(1L) == before(1L) && after(2L) == before(2L),
      "the fully-matched file must carry byte-identical (no rewrite)")
    assert(after(4L) != before(4L),
      "the stray-holding file must rewrite")
  }

  test("BY SOURCE clauses refuse source references; BY SOURCE UPDATE " +
    "refuses an empty SET; duplicate source keys are tolerated when no " +
    "matched clause exists") {
    import spark.implicits._
    val root = freshTable()
    val src = Seq((1L, "z", 1L)).toDF("k", "s", "v")
    val eRef = intercept[IllegalArgumentException] {
      VersionedTable.mergeActions(spark, root, src, Seq("k"), Seq(
        DeleteBySource(Some(expr("s.v IS NULL")))))
    }
    assert(eRef.getMessage.contains("reference the target only"))
    val eSet = intercept[IllegalArgumentException] {
      VersionedTable.mergeActions(spark, root, src, Seq("k"), Seq(
        UpdateBySource(None, Map.empty)))
    }
    assert(eSet.getMessage.contains("explicit SET"))
    // dup-keyed source + by-source-only clauses: carried matched rows
    // must NOT duplicate (the rewrite joins distinct keys)
    val dup = Seq((1L, "p", 1L), (1L, "q", 2L), (2L, "r", 3L))
      .toDF("k", "s", "v")
    VersionedTable.mergeActions(spark, root, dup, Seq("k"), Seq(
      DeleteBySource(Some(expr("t.k >= 5")))))
    val st = stateOf(root)
    assert(st.keySet == Set(1L, 2L, 3L, 4L) &&
      st(1L) == ("a", 10L),
      s"matched rows carry ONCE under a dup-keyed source, got $st")
  }

  test("SQL surface: WHEN NOT MATCHED BY SOURCE THEN UPDATE/DELETE " +
    "parse and execute; BY TARGET is the plain-insert alias") {
    import spark.implicits._
    val root = freshTable()
    val name = s"gma_${math.abs(root.hashCode)}"
    GraftSql.register(spark, name, root)
    Seq((2L, "B", 200L), (9L, "i", 90L)).toDF("k", "s", "v")
      .createOrReplaceTempView(s"${name}_src")
    GraftSql.execute(spark,
      s"""MERGE INTO $name AS t USING ${name}_src AS s ON t.k = s.k
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED BY TARGET THEN INSERT *
          WHEN NOT MATCHED BY SOURCE AND t.v < 45 THEN UPDATE SET
            t.s = 'old'
          WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    val st = stateOf(root)
    assert(st == Map(2L -> ("B", 200L), 9L -> ("i", 90L),
      1L -> ("old", 10L), 3L -> ("old", 30L), 4L -> ("old", 40L)),
      s"got $st")
    // a by-source clause referencing the source alias is refused loudly
    val e = intercept[Exception] {
      GraftSql.execute(spark,
        s"""MERGE INTO $name AS t USING ${name}_src AS s ON t.k = s.k
            WHEN NOT MATCHED BY SOURCE AND s.v IS NULL THEN DELETE""")
    }
    assert(e.getMessage.contains("reference the target only"))
  }

  test("optimistic retry: a racing append loses nothing — the merge " +
    "recomputes against the winner's snapshot") {
    import spark.implicits._
    val root = freshTable()
    var raced = false
    val src = Seq((6L, "w", 1L)).toDF("k", "s", "v")
    VersionedTable.mergeActions(spark, root, src, Seq("k"), Seq(
      Update(None, Map("v" -> expr("t.v + s.v")))),
      beforeCommit = () => {
        if (!raced) {
          raced = true
          VersionedTable.append(
            Seq((100L, "r", 1L)).toDF("k", "s", "v"), root)
        }
      })
    val st = stateOf(root)
    assert(st(100L) == ("r", 1L), "the racing append's row survives")
    assert(st(6L) == ("f", 61L))
  }
}
