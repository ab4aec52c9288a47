package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Phase profiler for the lake/DML gate family (q64 merge, q107
  * changes-since, q116 diff, q175 delete, q176 clone): how much is the
  * initial overwrite (common to all), and how much the DML op + read?
  * Usage: sbt 'runMain graft.ProfileLake [sfDir] [cpus]' */
object ProfileLake {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .appName("graft-profile-lake").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[lakeprof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    (1 to 2).foreach { rnd =>
      println(s"[lakeprof] ---- round $rnd (cpus=$cpus) ----")
      val orders = graft.core.Tables(spark, sf, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      orders.count()
      val root = java.nio.file.Files
        .createTempDirectory("graft_lakeprof").resolve("t").toString
      t("overwrite(orders)")(graft.sources.VersionedTable.overwrite(orders, root))
      val changes = orders
        .filter(substring(md5(col("o_orderkey").cast(StringType)), 1, 1) === "0")
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      t("merge(changes)")(graft.sources.VersionedTable
        .merge(spark, root, changes, Seq("o_orderkey")))
      t("read+agg")(noop(graft.sources.VersionedTable.read(spark, root)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))))
      t("diffVersions(0,1)+agg")(noop(
        graft.sources.VersionedTable.diffVersions(spark, root, 0L, 1L)
          .groupBy(col("_change")).agg(count(lit(1)).as("n"))))
      // changes-since shape (q107): fresh table, overwrite + 2 appends
      val root2 = java.nio.file.Files
        .createTempDirectory("graft_lakeprof2").resolve("t").toString
      val b = substring(md5(col("o_orderkey").cast(StringType)), 1, 1)
      val v0 = t("q107 overwrite")(graft.sources.VersionedTable.overwrite(
        orders.filter(b.between("0", "4")), root2))
      t("q107 append 1")(graft.sources.VersionedTable.append(
        orders.filter(b.between("5", "9")), root2))
      t("q107 append 2")(graft.sources.VersionedTable.append(
        orders.filter(!b.between("0", "9")), root2))
      t("q107 changesSince+agg")(noop(
        graft.sources.VersionedTable.readChangesSince(spark, root2, v0)
          .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))))
      t("q64 full")(noop(SparkEntry.queries("q64_merge_upsert")(spark, sf)))
      t("q107 full")(noop(SparkEntry.queries("q107_changes_since")(spark, sf)))
      t("q116 full")(noop(SparkEntry.queries("q116_version_diff")(spark, sf)))
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
