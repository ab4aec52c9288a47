package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The ALTER-declared column must be carried by COMMITS, not by
  * reads: a pure write pipeline (ALTER → appends, nobody reading in
  * between) must still serve the column, COW rewrites at such bases
  * must materialize it, vacuum must not expire the declaration with
  * the old manifests, and an overwrite must still DROP it (the
  * declaration boundary). */
class AlterCarrySpec extends SparkSuite {

  private def tmpRoot(): String =
    Files.createTempDirectory("graft_alt").resolve("t").toString

  private def noteCol(): org.apache.spark.sql.types.StructField =
    org.apache.spark.sql.types.StructField("note",
      org.apache.spark.sql.types.StringType, nullable = true)

  test("write-only chain: ALTER then appends with NO intervening " +
    "reads still serves the declared column (walk-back declaration)") {
    import spark.implicits._
    val root = tmpRoot()
    VersionedTable.overwrite(Seq((1L, 10L)).toDF("k", "v"), root) // v0
    VersionedTable.alterAddColumns(spark, root, Seq(noteCol()))      // v1
    // appends write NO sidecar and nobody reads v1/v2 — the exact-
    // version lookup used to lose 'note' here and CACHE the loss
    VersionedTable.append(Seq((2L, 20L)).toDF("k", "v"), root)    // v2
    VersionedTable.append(Seq((3L, 30L)).toDF("k", "v"), root)    // v3
    val got = VersionedTable.read(spark, root)
    assert(got.schema.fieldNames.toSeq == Seq("k", "v", "note"))
    assert(got.filter(col("note").isNull).count() == 3L)
    // a COW rewrite at this base MATERIALIZES the declared column
    VersionedTable.update(spark, root, col("k") === 2L,
      Map("note" -> lit("hot")))
    val st = VersionedTable.read(spark, root)
    assert(st.filter(col("note") === "hot").count() == 1L)
    assert(st.schema.fieldNames.contains("note"))
  }

  test("declaration does not walk past a FULL manifest: overwrite " +
    "drops the declared column; restore-to-past serves its own era") {
    import spark.implicits._
    val root = tmpRoot()
    VersionedTable.overwrite(Seq((1L, 10L)).toDF("k", "v"), root) // v0
    VersionedTable.alterAddColumns(spark, root, Seq(noteCol()))      // v1
    VersionedTable.overwrite(Seq((9L, 90L)).toDF("k", "v"), root) // v2
    VersionedTable.append(Seq((8L, 80L)).toDF("k", "v"), root)    // v3
    assert(!VersionedTable.read(spark, root).schema.fieldNames
      .contains("note"), "overwrite is a declaration boundary")
  }

  test("vacuum materializes the declaration onto the oldest retained " +
    "version before the ALTER's own sidecar expires; evolution " +
    "columns appended AFTER the ALTER survive alongside") {
    import spark.implicits._
    val root = tmpRoot()
    VersionedTable.overwrite(Seq((1L, 10L)).toDF("k", "v"), root)  // v0
    VersionedTable.alterAddColumns(spark, root, Seq(noteCol()))       // v1
    // evolution append: a NEW footer column the declaration between
    // v1 and now does not know — both must survive the vacuum
    VersionedTable.append(
      Seq((2L, 20L, 3.5)).toDF("k", "v", "x"), root)               // v2
    VersionedTable.append(Seq((3L, 30L)).toDF("k", "v"), root)     // v3
    VersionedTable.vacuum(root, retainVersions = 2) // drops v0, v1
    assert(VersionedTable.versions(root) == Seq(2L, 3L))
    val sch = VersionedTable.read(spark, root).schema.fieldNames.toSet
    assert(sch.contains("note"),
      "the declaration must survive its own version's expiry")
    assert(sch.contains("x"),
      "an evolution column must not be hidden by the materialized " +
        "declaration (declaration-only sidecar, never authoritative)")
    // and a rewrite AFTER the vacuum still materializes 'note'
    VersionedTable.update(spark, root, col("k") === 3L,
      Map("note" -> lit("w")))
    assert(VersionedTable.read(spark, root)
      .filter(col("note") === "w").count() == 1L)
  }

  test("shallow clone carries the declaration as declaration-ONLY: " +
    "declared and evolution columns both serve on the clone") {
    import spark.implicits._
    val src = tmpRoot(); val dst = tmpRoot() + "_c"
    VersionedTable.overwrite(Seq((1L, 10L)).toDF("k", "v"), src)
    VersionedTable.alterAddColumns(spark, src, Seq(noteCol()))
    VersionedTable.append(Seq((2L, 20L, 7.0)).toDF("k", "v", "x"), src)
    VersionedTable.shallowClone(src, dst)
    val sch = VersionedTable.read(spark, dst).schema.fieldNames.toSet
    assert(sch.contains("note") && sch.contains("x"))
  }

  test("WIDEN and DEFAULT declarations survive vacuum past their own " +
    "version and ride shallow clones (metadata lives in the " +
    "declaration sidecars)") {
    import spark.implicits._
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val root = tmpRoot()
    VersionedTable.overwrite(
      Seq((1, 10L)).toDF("k", "v")
        .select(col("k").cast(IntegerType).as("k"), col("v")), root) // v0
    VersionedTable.alterWidenColumn(spark, root, "k", LongType)     // v1
    VersionedTable.alterSetDefault(spark, root, "v", "42")          // v2
    VersionedTable.append(Seq((5000000000L, 20L)).toDF("k", "v"), root)
    VersionedTable.append(Seq((3L, 30L)).toDF("k", "v"), root)      // v4
    VersionedTable.vacuum(root, retainVersions = 2) // drops v0..v2
    assert(VersionedTable.versions(root) == Seq(3L, 4L))
    val sch = VersionedTable.writeSchema(spark, root)
    assert(sch("k").dataType == LongType,
      "the widen must survive its own version's expiry")
    assert(sch("v").metadata.contains(VersionedTable.CurrentDefaultKey),
      "the default must survive its own version's expiry")
    assert(VersionedTable.read(spark, root)
      .filter(col("k") > 4000000000L).count() == 1L)
    // the default still FILLS after the vacuum
    val name = s"carry_${System.nanoTime()}"
    GraftSql.register(spark, name, root)
    GraftSql.execute(spark, s"INSERT INTO $name (k) VALUES (9)")
    assert(VersionedTable.read(spark, root)
      .filter(col("k") === 9L).head().getLong(1) == 42L)
    // shallow clone: both declarations ride along
    val dst = tmpRoot() + "_wc"
    VersionedTable.shallowClone(root, dst)
    val csch = VersionedTable.writeSchema(spark, dst)
    assert(csch("k").dataType == LongType)
    assert(csch("v").metadata.contains(VersionedTable.CurrentDefaultKey))
  }

  test("canonical merge / CDC feeds lacking a declared column refuse " +
    "with an actionable message, never an unresolved-column error") {
    import spark.implicits._
    val root = tmpRoot()
    VersionedTable.overwrite(Seq((1L, 10L)).toDF("k", "v"), root)
    VersionedTable.alterAddColumns(spark, root, Seq(noteCol()))
    val e = intercept[IllegalArgumentException] {
      VersionedTable.merge(spark, root,
        Seq((1L, 11L)).toDF("k", "v"), Seq("k"))
    }
    assert(e.getMessage.contains("note") &&
      e.getMessage.contains("mergeActions"))
    val e2 = intercept[IllegalArgumentException] {
      VersionedTable.applyChanges(spark, root,
        Seq((1L, 11L, 1L, "U")).toDF("k", "v", "seq", "op"),
        Seq("k"), "seq", "op")
    }
    assert(e2.getMessage.contains("note"))
    // mergeActions with explicit maps is the documented path — works
    VersionedTable.mergeActions(spark, root,
      Seq((1L, 11L)).toDF("k", "v"), Seq("k"),
      Seq(VersionedTable.MergeClause.Update(None,
        Map("v" -> expr("s.v")))))
    assert(VersionedTable.read(spark, root).head().getLong(1) == 11L)
  }
}
