package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profiler for the two round-15 32-core regressions: q133
  * (LshIndex build → check → append + exact twin + certify) and q66
  * (ngramJaccardPairs → min-label connectedComponents). Prints one
  * line per phase so the seconds can be attributed before touching
  * anything. Usage: sbt 'runMain graft.ProfileLsh [sfDir] [cpus]' */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .appName("graft-profile-lsh").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[lshprof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    (1 to 2).foreach { rnd =>
      println(s"[lshprof] ---- round $rnd (cpus=$cpus) ----")
      val docs = graft.core.Tables(spark, sf, "documents")
        .select(col("doc_id"), col("text"))
      docs.count()
      // ---- q133 phases ----
      val root = java.nio.file.Files
        .createTempDirectory("graft_lshprof").resolve("i").toString
      val b = col("doc_id") % 4
      val indexed = docs.filter(b =!= 0)
      val batch = docs.filter(b === 0)
      t("q133 build")(graft.operators.LshIndex.build(indexed, root))
      val approx = t("q133 check (plan)")(
        graft.operators.LshIndex.check(batch, indexed, root, threshold = 0.8))
      t("q133 check (exec)")(noop(approx))
      t("q133 append")(graft.operators.LshIndex.append(batch, root))
      val exact = t("q133 exact twin (exec)") {
        val e = graft.operators.Dedup
          .ngramJaccardJoin(batch, indexed, threshold = 0.8)
          .select(col("corpus_id").as("id_a"), col("new_id").as("id_b"),
            col("jaccard"))
        noop(e); e
      }
      t("q133 flags (exec)") {
        noop(graft.operators.Certify.subsetFlag(
          approx, exact, Seq("id_a", "id_b"), "subset_ok"))
        noop(graft.operators.Certify.recallFlag(
          approx, exact, Seq("id_a", "id_b"), 0.8, "recall_ok"))
      }
      t("q133 full")(noop(SparkEntry.queries("q133_lsh_index")(spark, sf)))
      // ---- q66 phases ----
      val pairs = t("q66 pairs (pin)") {
        graft.operators.Dedup.ngramJaccardPairs(docs, threshold = 0.8)
          .localCheckpoint(true)
      }
      println(s"[lshprof] q66 pair count ${pairs.count()}")
      t("q66 CC(min-label)") {
        noop(graft.operators.Dedup.connectedComponents(
          pairs, docs.select(col("doc_id"))))
      }
      t("q66 full")(noop(SparkEntry.queries("q66_dedup_groups")(spark, sf)))
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
