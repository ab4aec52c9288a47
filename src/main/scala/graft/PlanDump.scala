package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness: for each named query, build
  * the DataFrame (timed — pipeline queries do their writes at build
  * time, exactly as Bench charges them), dump `.explain("formatted")`
  * to `<outDir>/<query>_<tag>.txt`, and time the bench action
  * (`queryExecution.toRdd.count()`) `runs` times, reporting each.
  *
  * Usage: sbt 'runMain graft.PlanDump <outDir> <tag> <q1,q2,...> [runs]'
  *
  * The JSON-ish summary lines go to stdout prefixed `[plandump]` so
  * they survive sbt's stderr noise.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val prefixes = args(2).split(',').filter(_.nonEmpty).toSeq
    val runs = if (args.length > 3) args(3).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Tables.names.foreach(n =>
      graft.core.Tables(spark, sfDir, n).count())
    Files.createDirectories(Paths.get(outDir))
    val qs = SparkEntry.queries
    val names = SparkEntry.benchQueries.filter(n => prefixes.exists(n.startsWith))
    def dropAllBlocks(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    names.foreach { name =>
      spark.sparkContext.setJobDescription(s"plandump:$name")
      // plan capture (one untimed build; pipeline side effects run)
      dropAllBlocks()
      val df = qs(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${name}_$tag.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      val times = (1 to runs).map { _ =>
        dropAllBlocks()
        val t0 = System.nanoTime()
        qs(name)(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[plandump] $name%-26s ${times.map(t => f"$t%6.2f").mkString(" ")}  min ${times.min}%6.2f s")
    }
    spark.stop()
  }
}
