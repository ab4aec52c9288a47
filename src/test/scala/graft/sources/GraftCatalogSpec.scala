package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftCatalog

import graft.SparkSuite

/** GraftCatalog — the DSv2 TableCatalog (read path): `spark.sql` plans
  * `graft.db.t` natively with the manifest-pruning index underneath,
  * including Spark's own VERSION AS OF / TIMESTAMP AS OF syntax. */
class GraftCatalogSpec extends SparkSuite {

  private def tmpRoot(): String =
    Files.createTempDirectory("graft_catalog").resolve("t").toString

  /** Data files the DSv2 scan actually planned (post-execution, AQE
    * unwrapped) — the prune measure for the catalog path. */
  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val aqe = new org.apache.spark.sql.execution.adaptive
      .AdaptiveSparkPlanHelper {}
    aqe.collect(df.queryExecution.executedPlan) {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.map {
          case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
            fp.files.length.toLong
          case _ => 0L
        }.sum
    }.sum
  }

  test("SELECT over graft.db.t plans natively; ordinary WHERE prunes " +
    "files through the manifest index on the DSv2 path") {
    import spark.implicits._
    val root = tmpRoot()
    val rows = (0L until 600L).map(i => (i, s"s${i % 3}", i * 2L))
      .toDF("k", "tag", "v").repartitionByRange(6, col("k"))
    VersionedTable.overwriteWithStats(rows, root, "k")
    GraftCatalog.register(spark, "db", "t", root)
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.t")
      .head().getLong(0) == 600L)
    val all = spark.sql("SELECT k FROM graft.db.t")
    assert(plannedFiles(all) == 6L)
    val sliced = spark.sql("SELECT k, v FROM graft.db.t WHERE k < 100")
    assert(sliced.count() == 100L)
    assert(plannedFiles(sliced) < 6L,
      "the DSv2 scan must prune files from the manifest stats")
    // an unregistered name is a clean catalog miss
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft.db.nosuch").collect()
    }
    assert(e.getMessage.toLowerCase.contains("table"))
  }

  test("time travel through Spark's own syntax: VERSION AS OF and " +
    "TIMESTAMP AS OF read pinned snapshots") {
    import spark.implicits._
    val root = tmpRoot()
    VersionedTable.overwriteWithStats(
      (0L until 100L).map(i => (i, i * 2L)).toDF("k", "v"), root, "k")
    VersionedTable.appendWithStats(
      (100L until 150L).map(i => (i, i * 2L)).toDF("k", "v"), root, "k")
    GraftCatalog.register(spark, "db", "tt", root)
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.tt")
      .head().getLong(0) == 150L)
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft.db.tt VERSION AS OF 0")
      .head().getLong(0) == 100L)
    // two pinned versions in ONE statement
    val both = spark.sql(
      """SELECT count(*) AS n FROM (
           SELECT k FROM graft.db.tt VERSION AS OF 0
           UNION ALL
           SELECT k FROM graft.db.tt VERSION AS OF 1)""")
    assert(both.head().getLong(0) == 250L)
    // TIMESTAMP AS OF: a future timestamp resolves to the latest
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft.db.tt TIMESTAMP AS OF '2100-01-01'")
      .head().getLong(0) == 150L)
    // a missing version is refused loudly
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft.db.tt VERSION AS OF 99").collect()
    }
    assert(e.getMessage.contains("no version"))
  }

  test("partitioned tables serve their path-derived partition columns " +
    "through the catalog; MOR-pending tables refuse a raw latest read") {
    import spark.implicits._
    val root = tmpRoot()
    val rows = (0L until 400L).map(i => (i, s"p${i % 4}", i * 3L))
      .toDF("k", "part", "v").repartitionByRange(2, col("k"))
    VersionedTable.overwritePartitionedWithStats(rows, root, Seq("part"), "k")
    GraftCatalog.register(spark, "db", "pt", root)
    val one = spark.sql(
      "SELECT k, part FROM graft.db.pt WHERE part = 'p2'")
    assert(one.count() == 100L)
    assert(one.collect().forall(_.getString(1) == "p2"))
    assert(plannedFiles(one) <= 2L,
      "a partition predicate must prune directories on the DSv2 path")
    // MOR safety: pending tombstones refuse the raw latest read
    val root2 = tmpRoot()
    VersionedTable.overwriteWithStats(
      (0L until 50L).map(i => (i, i)).toDF("k", "v"), root2, "k")
    GraftCatalog.register(spark, "db", "mor", root2)
    Tombstones.deleteMor(spark, root2, Seq(1L, 2L).toDF("k"))
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft.db.mor").collect()
    }
    assert(e.getMessage.contains("merge-on-read"))
    // a PINNED read serves raw history by the time-travel contract
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft.db.mor VERSION AS OF 0")
      .head().getLong(0) == 50L)
    // after purge the latest read works and reflects the deletes
    Tombstones.purge(spark, root2)
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.mor")
      .head().getLong(0) == 48L)
  }
}
