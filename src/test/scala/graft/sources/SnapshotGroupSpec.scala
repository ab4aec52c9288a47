package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** SnapshotGroup: atomic multi-table publish — torn states invisible,
  * readAt pins the published pair. */
class SnapshotGroupSpec extends SparkSuite {

  test("readers only ever see version sets published together") {
    import spark.implicits._
    val grp = Files.createTempDirectory("graft_sg_spec").toString
    val a = new java.io.File(grp, "a").getPath
    val b = new java.io.File(grp, "b").getPath
    val av1 = VersionedTable.overwrite(Seq((1L, "x")).toDF("k", "s"), a)
    val bv1 = VersionedTable.overwrite(Seq((1L, 10L)).toDF("k", "n"), b)
    SnapshotGroup.publish(grp, Map(a -> av1, b -> bv1))
    assert(SnapshotGroup.current(grp).contains(Map(a -> av1, b -> bv1)))

    // a moves ahead; crash before publish → readers stay on the pair
    val av2 = VersionedTable.append(Seq((2L, "y")).toDF("k", "s"), a)
    assert(SnapshotGroup.readAt(spark, grp, a).count() == 1L,
      "unpublished commit must be invisible through the group")
    assert(SnapshotGroup.readAt(spark, grp, b).count() == 1L)

    val bv2 = VersionedTable.append(Seq((2L, 20L)).toDF("k", "n"), b)
    SnapshotGroup.publish(grp, Map(a -> av2, b -> bv2))
    assert(SnapshotGroup.readAt(spark, grp, a).count() == 2L)
    assert(SnapshotGroup.readAt(spark, grp, b).count() == 2L)
  }

  test("readAt rejects a table outside the group; empty group errors") {
    import spark.implicits._
    val grp = Files.createTempDirectory("graft_sg_err").toString
    val a = new java.io.File(grp, "a").getPath
    intercept[RuntimeException] { SnapshotGroup.readAt(spark, grp, a) }
    val av1 = VersionedTable.overwrite(Seq((1L, "x")).toDF("k", "s"), a)
    SnapshotGroup.publish(grp, Map(a -> av1))
    intercept[RuntimeException] {
      SnapshotGroup.readAt(spark, grp, "/nope")
    }
  }
}
