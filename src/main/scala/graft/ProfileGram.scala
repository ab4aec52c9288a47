package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level profiler for the q232 Gram-view refresh cycle — the
  * round-13 watch item: which phase of the commit-dense refresh pays
  * the round-12 per-commit additions (sidecar reads, constraint
  * probes, declaration walk-backs)? Prints one line per phase. */
object ProfileGram {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-profile-gram").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[gramprof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 2).foreach { round =>
      println(s"[gramprof] ---- round $round ----")
      val src = java.nio.file.Files
        .createTempDirectory("gramprof_s").resolve("t").toString
      val view = java.nio.file.Files
        .createTempDirectory("gramprof_v").resolve("v").toString
      val emb = graft.core.Tables(spark, sf, "embeddings")
        .select(col("vec_id"), col("embedding"))
      t("overwrite src (4/5)") {
        graft.sources.VersionedTable.overwrite(
          emb.filter(col("vec_id") % 5 =!= 0), src)
      }
      t("refreshGram #1 (full)") {
        graft.sources.MaterializedView.refreshGram(
          spark, src, view, "embedding", 64)
      }
      t("append src (1/5)") {
        graft.sources.VersionedTable.append(
          emb.filter(col("vec_id") % 5 === 0), src)
      }
      t("refreshGram #2 (delta)") {
        graft.sources.MaterializedView.refreshGram(
          spark, src, view, "embedding", 64)
      }
      t("readGram + sort + collect") {
        graft.sources.MaterializedView.readGram(spark, view)
          .select(col("i"), col("j"), col("s").cast("string"))
          .orderBy(col("i"), col("j")).collect().length
      }
      // micro: what does ONE view-sized overwrite cost at 32 vs 1
      // output partitions?
      val cells = spark.range(2080).select(col("id").as("i"),
        (col("id") * 2).as("j"), (col("id") * 3).cast("decimal(38,0)").as("s"))
        .repartition(32).localCheckpoint(true)
      val v32 = java.nio.file.Files
        .createTempDirectory("gramprof_w").resolve("w32").toString
      val v1 = java.nio.file.Files
        .createTempDirectory("gramprof_w").resolve("w1").toString
      t("overwrite 2080 rows @32 part") {
        graft.sources.VersionedTable.overwrite(cells, v32)
      }
      t("overwrite 2080 rows @1 part") {
        graft.sources.VersionedTable.overwrite(cells.repartition(1), v1)
      }
    }
    spark.stop()
  }
}
