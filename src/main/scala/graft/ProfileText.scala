package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profiler for the TextIndex gate family (q223/q230/q231/q290):
  * where do the seconds sit — tokenize+commit cycles, optimize,
  * the postings stats rollup, or the search?
  * Usage: sbt 'runMain graft.ProfileText [sfDir] [cpus]' */
object ProfileText {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .appName("graft-profile-text").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[txtprof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    (1 to 2).foreach { rnd =>
      println(s"[txtprof] ---- round $rnd (cpus=$cpus) ----")
      val docs = graft.core.Tables(spark, sf, "documents")
        .select(col("doc_id"), col("text"))
      docs.count()
      val root = java.nio.file.Files
        .createTempDirectory("graft_txtprof").resolve("ix").toString
      t("q230 build (1/4 docs)")(graft.operators.TextIndex.build(
        docs.filter(col("doc_id") % 4 === 0), root))
      for (r <- 1 to 3)
        t(s"q230 append $r")(graft.operators.TextIndex.append(
          docs.filter(col("doc_id") % 4 === r), root))
      t("q230 optimize")(
        graft.operators.TextIndex.optimize(spark, root, targetFiles = 4))
      val terms = t("q230 stats rollup") {
        graft.operators.TextIndex.postings(spark, root)
          .groupBy(col("term")).agg(sum(col("tf")).as("cf"))
          .orderBy(col("cf").desc, col("term")).limit(3)
          .select(col("term")).collect().map(_.getString(0)).toSeq
      }
      t("q230 searchBm25")(noop(
        graft.operators.TextIndex.searchBm25(spark, root, terms, 10)))
      t("q230 full")(noop(
        SparkEntry.queries("q230_text_index_optimize")(spark, sf)))
      t("q290 full")(noop(
        SparkEntry.queries("q290_phrase_index")(spark, sf)))
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
