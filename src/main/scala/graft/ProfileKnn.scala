package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profiler for q166 (knn_graph_ivf): pinned exact twin vs the
  * IVF graph vs the recall flag. Usage:
  * sbt 'runMain graft.ProfileKnn [sfDir] [cpus]' */
object ProfileKnn {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .appName("graft-profile-knn").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[knnprof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    (1 to 2).foreach { rnd =>
      println(s"[knnprof] ---- round $rnd (cpus=$cpus) ----")
      val emb = graft.core.Tables(spark, sf, "embeddings")
      emb.count()
      val exact = t("exact wide brute (pin)") {
        graft.operators.Certify.pin(
          graft.operators.Similarity.bruteForceTopK(emb, emb, k = 5, wide = true))
      }
      val approx = t("knnGraphIvf (exec)") {
        val a = graft.operators.Similarity.knnGraphIvf(
          emb, k = 5, nlist = 16, nprobe = 8)
        noop(a); a
      }
      t("recall flag (exec)") {
        noop(graft.operators.Certify.recallFlag(
          approx, exact, Seq("query_id", "neighbor_id"), 0.6, "recall_ok"))
      }
      t("q166 full")(noop(
        SparkEntry.queries("q166_knn_graph_ivf")(spark, sf)))
      t("q165 full")(noop(
        SparkEntry.queries("q165_knn_graph")(spark, sf)))
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
