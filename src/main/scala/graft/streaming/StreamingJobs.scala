package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming jobs over the events table — the engine's
  * incremental-ingestion story (SURVEY.md §2.10: the reference's
  * Airflow-cron micro-batching, upgraded to the idiomatic
  * `Trigger.AvailableNow` + watermark pattern).
  */
object StreamingJobs {

  /** Raw events schema as stored (ts arrives as nanos int64; see
    * graft.core.Tables). */
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming source over the events parquet (file source → the same
    * nanos→micros conversion as the batch path). */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling 1-hour windowed aggregation with a watermark; returns the
    * transformation (caller picks sink/trigger). */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("val_sum"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("hour_start"),
        col("event_type"), col("n"), col("val_sum"))

  /** Run the hourly aggregation as a synchronous AvailableNow batch —
    * processes everything currently in the source, then stops. This is
    * the reference's "daily append" protocol done right: restartable,
    * checkpointable, exactly-once into the sink. */
  def runHourlyAvailableNow(spark: SparkSession, dir: String,
                            queryName: String): DataFrame = {
    val q = hourlyAgg(readEvents(spark, dir))
      .writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Exactly-once over an at-least-once source: the input stream is the
    * events file source unioned with itself (every record delivered
    * twice — the replay/retry shape), deduplicated on event_id within
    * the watermark, then aggregated. The batch oracle is the plain
    * single-copy aggregate — equality proves the dedup. */
  def runDedupAvailableNow(spark: SparkSession, dir: String,
                           queryName: String): DataFrame = {
    val once = readEvents(spark, dir)
    val atLeastOnce = once.union(readEvents(spark, dir))
    val q = atLeastOnce
      .withWatermark("ts", "24 hours")
      .dropDuplicates("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("val_sum"))
      .writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Stream-static enrichment join: streaming events against a static
    * dimension table, aggregated per dim attribute. */
  def runStaticJoinAvailableNow(spark: SparkSession, dir: String,
                                dim: DataFrame, queryName: String): DataFrame = {
    val q = readEvents(spark, dir)
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long)
  // must be public: the state Encoder's generated code instantiates it
  final case class SessionState(start: Long, last: Long, n: Long)

  /** Gap-based sessionization (30-min inactivity) with
    * `flatMapGroupsWithState` — the custom-state streaming operator.
    * Emits a session when the gap to the next event exceeds the
    * timeout; `BatchSessionize.sessions` is the batch-SQL oracle it is
    * tested against. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) => {
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var cur = state.getOption
          val out = Seq.newBuilder[Session]
          for (e <- sorted) {
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.last <= gapMs =>
                cur = Some(s.copy(last = t, n = s.n + 1))
              case Some(s) =>
                out += Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n)
                cur = Some(SessionState(t, t, 1))
              case None =>
                cur = Some(SessionState(t, t, 1))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
        })
  }

  /** Flush every open session from a sessionize state pass — batch-mode
    * helper so tests can compare complete output against the SQL oracle. */
  def sessionizeBatchComplete(events: Dataset[Event], gapMinutes: Int = 30): DataFrame = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .groupByKey(_.user_id)
      .flatMapGroups { (userId: Long, rows: Iterator[Event]) =>
        val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        val out = Seq.newBuilder[Session]
        var cur: Option[SessionState] = None
        for (e <- sorted) {
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.last <= gapMs =>
              cur = Some(s.copy(last = t, n = s.n + 1))
            case Some(s) =>
              out += Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n)
              cur = Some(SessionState(t, t, 1))
            case None => cur = Some(SessionState(t, t, 1))
          }
        }
        cur.foreach(s => out += Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n))
        out.result().iterator
      }.toDF()
  }
}

/** Batch gaps-and-islands sessionization — the window-function
  * formulation (lag → gap flag → cumulative session id), which doubles
  * as the DuckDB-oracle-expressible equivalent of
  * StreamingJobs.sessionize. */
object BatchSessionize {
  def sessions(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // microsecond-precision gap compare (a seconds cast would truncate)
    val prev = lag(unix_micros(col("ts")), 1).over(byUser)
    val newSession = when(
      unix_micros(col("ts")) - prev > gapMinutes * 60000000L, 1L)
      .otherwise(when(prev.isNull, 1L).otherwise(0L))
    events
      .withColumn("is_new", newSession)
      .withColumn("session_seq",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
  }
}
