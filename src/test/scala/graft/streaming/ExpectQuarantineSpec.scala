package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.VersionedTable

/** runExpectOrQuarantineAvailableNow: per-batch gate routing and
  * exactly-once replay. */
class ExpectQuarantineSpec extends SparkSuite {

  private def mkBatch(dir: String, name: String,
                      rows: Seq[(Long, String, Option[Double])]): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_eq_mk").toString
    rows.toDF("event_id", "event_type", "value")
      .select(col("event_id"), col("event_type"),
        col("value").cast("double"))
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, new java.io.File(dir, name).toPath)
    ()
  }

  test("bad batch quarantined whole with gate names; replay is a no-op") {
    val in = Files.createTempDirectory("graft_eq_in").toString
    val main = Files.createTempDirectory("graft_eq_m").resolve("t").toString
    val quar = Files.createTempDirectory("graft_eq_q").resolve("q").toString
    mkBatch(in, "b0.parquet",
      (1L to 10L).map(i => (i, "view", Some(i * 1.0))))
    mkBatch(in, "b1.parquet", // 50% nulls → fails the 10% ceiling
      (11L to 20L).map(i => (i, "click",
        if (i % 2 == 0) None else Some(i * 1.0))))
    val gates = Seq(
      "null_rate_le_10pct" ->
        (sum(col("value").isNull.cast("long")) * 10 <= count(lit(1))))
    StreamingJobs.runExpectOrQuarantineAvailableNow(
      spark, in, main, quar, gates)
    assert(VersionedTable.read(spark, main).count() == 10L)
    val q = VersionedTable.read(spark, quar).collect()
    assert(q.length == 10, "failing batch must land WHOLE in quarantine")
    assert(q.forall(_.getAs[String]("failed_gates") == "null_rate_le_10pct"))
    val mv = VersionedTable.latestVersion(main).get
    val qv = VersionedTable.latestVersion(quar).get
    StreamingJobs.runExpectOrQuarantineAvailableNow(
      spark, in, main, quar, gates)
    assert(VersionedTable.latestVersion(main).get == mv)
    assert(VersionedTable.latestVersion(quar).get == qv)
  }
}
