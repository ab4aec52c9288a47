package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level profiler for the q172/q287 persisted-ANN-index bench
  * cycle — the round-13 watch item: the driver's single pass showed
  * q172 at 8.0× and q287 at 3.6× baseline while the committed
  * min-of-3 at the same HEAD had both under the gate. Which phase
  * moves, and does a gate-littered /tmp (the driver's actual state
  * after 329 queries) move it? Prints one line per phase; run once on
  * an idle box and once under `SPARK_GRAFT_PROF_LITTER=400` (which
  * pre-creates that many temp table roots first). */
object ProfileAnn {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val litter = sys.env.getOrElse("SPARK_GRAFT_PROF_LITTER", "0").toInt
    if (litter > 0) {
      (1 to litter).foreach { i =>
        val d = java.nio.file.Files.createTempDirectory(s"graft_litter")
        java.nio.file.Files.createDirectories(d.resolve("t/_log"))
        java.nio.file.Files.write(d.resolve("t/_log/000000000000.manifest"),
          "data/x.parquet\t__rows\t1\t1\n".getBytes)
      }
      println(s"[annprof] littered /tmp with $litter table roots")
    }
    val spark = SparkSession.builder()
      .appName("graft-profile-ann").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[annprof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 3).foreach { rnd =>
      println(s"[annprof] ---- round $rnd ----")
      val emb = graft.core.Tables(spark, sf, "embeddings")
      // ---- q172 cycle ----
      val ivfRoot = java.nio.file.Files
        .createTempDirectory("annprof_ivf").resolve("ix").toString
      t("ivf build") {
        graft.operators.IvfIndex.build(emb, ivfRoot, nlist = 16)
      }
      val q = emb.filter(col("vec_id") < 32)
      val exact = t("brute twin (shared)") {
        graft.operators.Similarity.bruteForceTopK(q, emb, k = 5)
          .localCheckpoint(true)
      }
      t("ivf topK") {
        graft.operators.IvfIndex.topK(spark, q, ivfRoot, k = 5, nprobe = 6)
          .count()
      }
      def certified(approx: org.apache.spark.sql.DataFrame,
                    floor: Double): Long =
        graft.operators.Certify.attach(
          exact.select(col("query_id"), col("neighbor_id"), col("rank"),
            round(col("cos"), 6).as("cos")),
          graft.operators.Certify.recallFlag(approx, exact,
            Seq("query_id", "neighbor_id"), floor, "recall_ok"))
          .orderBy("query_id", "rank").count()
      t("ivf certify collect") {
        certified(graft.operators.IvfIndex.topK(spark, q, ivfRoot, k = 5,
          nprobe = 6), floor = 0.6)
      }
      // ---- q287 cycle ----
      val pqRoot = java.nio.file.Files
        .createTempDirectory("annprof_ivfpq").resolve("ix").toString
      val b = col("vec_id") % 4
      t("ivfpq build (3/4)") {
        graft.operators.IvfPqIndex.build(emb.filter(b =!= 0), pqRoot,
          dim = 64)
      }
      t("ivfpq append (1/4)") {
        graft.operators.IvfPqIndex.append(emb.filter(b === 0), pqRoot)
      }
      t("ivfpq search") {
        graft.operators.IvfPqIndex.search(q, emb, pqRoot, k = 5,
          nprobe = 8, refine = 8).count()
      }
      t("ivfpq certify collect") {
        certified(graft.operators.IvfPqIndex.search(q, emb, pqRoot, k = 5,
          nprobe = 8, refine = 8), floor = 0.5)
      }
    }
    spark.stop()
  }
}
