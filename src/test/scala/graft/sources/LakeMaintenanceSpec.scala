package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Tables

class LakeMaintenanceSpec extends SparkSuite {

  private lazy val root = Files.createTempDirectory("graft-maint-").toString

  test("compact: many small files → few, content identical") {
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val path = s"$root/li_small"
    li.repartition(32).write.parquet(path)
    val before = new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before == 32)
    val after = Lake.compact(spark, path, targetFileMB = 128)
    assert(after < 4)
    val back = Lake.read(spark, path)
    assert(back.count() == li.count())
    assert(back.agg(sum(col("l_quantity"))).head.getDouble(0) ==
      li.agg(sum(col("l_quantity"))).head.getDouble(0))
  }

  test("writePartitioned: planning-time directory pruning (scan selects one partition)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val root = Files.createTempDirectory("graft_partp").resolve("t").toString
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_orderkey"), col("o_orderstatus"))
    graft.sources.Lake.writePartitioned(orders, root, Seq("o_orderstatus"))
    val nStatuses = orders.select("o_orderstatus").distinct().count()
    assert(nStatuses > 1)
    val one = spark.read.parquet(root).filter(col("o_orderstatus") === "F")
    // the scan node must have selected exactly ONE partition directory
    // BEFORE execution — that's planning-time pruning, not row filtering
    val scans = one.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    assert(scans.head.partitionFilters.nonEmpty, "no PartitionFilters pushed")
    val selected = scans.head.selectedPartitions.partitionCount
    assert(selected == 1, s"expected 1 partition, got $selected")
    // and the data routes correctly
    assert(one.count() ==
      orders.filter(col("o_orderstatus") === "F").count())
  }

  test("writeClustered: files hold disjoint key ranges (stats-prunable)") {
    val o = Tables(spark, "/root/testdata/sf0.001", "orders")
    val path = s"$root/orders_clustered"
    Lake.writeClustered(o.repartition(8), path, Seq("o_orderkey"),
      numFiles = Some(4))
    val ranges = Lake.read(spark, path)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("o_orderkey")).as("lo"), max(col("o_orderkey")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2,
        s"overlapping file ranges: $hi1 > $lo2")
      case _ =>
    }
  }
}
