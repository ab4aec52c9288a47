package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

class MaterializedViewSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).resolve("t").toString

  test("refresh chain: delta-only source reads, no-op when current, exact state") {
    val src = tmp("graft_mv_src"); val view = tmp("graft_mv_view")
    VersionedTable.overwrite(
      Seq(("a", 10.0), ("a", 20.0), ("b", 5.0)).toDF("k", "x"), src)
    val v1 = MaterializedView.refreshAdditive(spark, src, view, Seq("k"), "x")
    assert(v1 == 0L)
    assert(MaterializedView.refreshedVersion(view).contains(0L))

    VersionedTable.append(Seq(("a", 1.0), ("c", 2.0)).toDF("k", "x"), src)
    // the CHANGES read for the second refresh touches only v1's files
    val v0Files = VersionedTable.readVersion(spark, src, 0).inputFiles.toSet
    val changeFiles = VersionedTable.readChangesSince(spark, src, 0)
      .inputFiles.toSet
    assert(changeFiles.nonEmpty && changeFiles.intersect(v0Files).isEmpty)

    MaterializedView.refreshAdditive(spark, src, view, Seq("k"), "x")
    val got = VersionedTable.read(spark, view)
      .select(col("k"), col("n"), col("total").cast("double"))
      .as[(String, Long, Double)].collect().toSet
    assert(got == Set(("a", 3L, 31.0), ("b", 1L, 5.0), ("c", 1L, 2.0)))

    // refresh with nothing new: no new view version
    val viewV = VersionedTable.latestVersion(view)
    MaterializedView.refreshAdditive(spark, src, view, Seq("k"), "x")
    assert(VersionedTable.latestVersion(view) == viewV)

    // the view itself time-travels: refresh #1's state is version 0
    val first = VersionedTable.readVersion(spark, view, 0)
      .select(col("k"), col("n")).as[(String, Long)].collect().toSet
    assert(first == Set(("a", 2L), ("b", 1L)))
  }

  test("retraction refresh: deletes retract, updates adjust, emptied groups leave") {
    val src = tmp("graft_mvr_src"); val view = tmp("graft_mvr_view")
    VersionedTable.overwrite(
      Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 5.0))
        .toDF("id", "k", "x"), src)
    def refresh() =
      MaterializedView.refreshWithRetraction(spark, src, view, Seq("k"), "x")
    refresh()

    // MERGE update: id=2 price 20 -> 25 (delete+insert pair in the diff)
    VersionedTable.merge(spark, src,
      Seq((2L, "a", 25.0)).toDF("id", "k", "x"), Seq("id"))
    refresh()
    // DELETE: group b empties entirely
    VersionedTable.delete(spark, src, col("k") === "b")
    refresh()

    val got = VersionedTable.read(spark, view)
      .select(col("k"), col("n"), col("total").cast("double"))
      .as[(String, Long, Double)].collect().toSet
    assert(got == Set(("a", 2L, 35.0)))
  }
}
