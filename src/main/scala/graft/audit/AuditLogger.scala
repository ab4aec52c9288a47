package graft.audit

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.sources.Lake

/** Task-run audit log (audit_logger.py:11-52): the one explicitly
  * declared schema in the reference, appended once per pipeline task.
  */
object AuditLogger {

  /** audit_logger.py:11-21 — the 9-field audit schema. */
  val schema: StructType = StructType(Seq(
    StructField("timestamp", StringType),
    StructField("dag_id", StringType),
    StructField("task_id", StringType),
    StructField("state", StringType),
    StructField("start_time", StringType),
    StructField("end_time", StringType),
    StructField("duration_seconds", DoubleType),
    StructField("try_number", IntegerType),
    StructField("hostname", StringType)))

  final case class AuditRecord(
      timestamp: String, dagId: String, taskId: String, state: String,
      startTime: String, endTime: String, durationSeconds: Double,
      tryNumber: Int, hostname: String)

  /** S8: local rows → DataFrame with the explicit schema. */
  def toDf(spark: SparkSession, records: Seq[AuditRecord]): DataFrame = {
    val rows = records.map(r => Row(r.timestamp, r.dagId, r.taskId, r.state,
      r.startTime, r.endTime, r.durationSeconds, r.tryNumber, r.hostname))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Bootstrap-if-missing then append (audit_logger.py:24-52: the
    * tableExists probe + create-or-append, via the public Lake API
    * instead of py4j internals). */
  def log(spark: SparkSession, path: String, records: Seq[AuditRecord]): Unit = {
    val df = toDf(spark, records)
    if (Lake.isTable(spark, path)) Lake.writeAppend(df, path)
    else Lake.writeOverwrite(df, path)
  }
}
