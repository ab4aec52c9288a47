package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profiler for the q103/q119 semantic-dedup family: where do
  * the seconds sit — pair generation, the star-contraction loop, or
  * the certify joins? Prints one line per phase plus the round count.
  * Usage: sbt 'runMain graft.ProfileCc [sfDir]' */
object ProfileCc {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-profile-cc").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[ccprof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 2).foreach { rnd =>
      println(s"[ccprof] ---- round $rnd ----")
      val emb = graft.core.Tables(spark, sf, "embeddings")
      emb.count()
      val exactPairs = t("exact pairs (pin)") {
        graft.operators.Similarity.cosineNearDupPairs(emb, 0.4)
          .localCheckpoint(true)
      }
      println(s"[ccprof] exact pair count ${exactPairs.count()}")
      val (comp, rounds) = t("CC(exact)") {
        val r = graft.operators.Dedup.connectedComponentsStarWithRounds(
          exactPairs.select(col("id_a"), col("id_b")),
          emb.select(col("vec_id")))
        r._1.queryExecution.toRdd.count(); r
      }
      println(s"[ccprof] CC rounds $rounds")
      val lshPairs = t("lsh pairs (pin)") {
        graft.operators.Similarity.cosineNearDupPairsLSH(
          emb, 0.4, dim = 64, bits = 64, bands = 16)
          .localCheckpoint(true)
      }
      println(s"[ccprof] lsh pair count ${lshPairs.count()}")
      t("CC(lsh)") {
        graft.operators.Dedup.connectedComponentsStarWithRounds(
          lshPairs.select(col("id_a"), col("id_b")),
          emb.select(col("vec_id")))._1.queryExecution.toRdd.count()
      }
      t("q119 full") {
        SparkEntry.queries("q119_semantic_dedup_lsh")(spark, sf)
          .queryExecution.toRdd.count()
      }
      t("q103 full") {
        SparkEntry.queries("q103_semantic_dedup")(spark, sf)
          .queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
