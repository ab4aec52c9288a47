package graft.core

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.streaming.StreamingJobs

/** The events fixture has shipped `ts` in two physical layouts across
  * driver rounds: parquet TIMESTAMP(NANOS) (readable only as a raw
  * int64 via `spark.sql.legacy.parquet.nanosAsLong`) and plain
  * TIMESTAMP(MICROS) ntz. Round 6 regressed exactly here — the
  * streaming reader hard-coded the nanos layout, so a micros fixture
  * was integer-divided by 1000 and 30 days of events collapsed into 43
  * minutes (q50 3385→10 rows, q55 40→12849, q56 3588→15, and the
  * bench warmup threw `(ts div 1000)` DATATYPE_MISMATCH). This spec
  * pins ABSOLUTE parsed instants for every layout through both the
  * batch and streaming readers — not reader-vs-reader equality, which
  * is blind to a uniform misparse. */
class TsLayoutSpec extends SparkSuite {

  // 2024-03-01T10:30:05.123456Z and one hour + one micro later
  private val usA = 1709289005123456L
  private val usB = usA + 3600L * 1000000L + 1L

  private def expected: Set[(Long, Timestamp)] = {
    def ts(us: Long): Timestamp = {
      val t = new Timestamp(Math.floorDiv(us, 1000L))
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    Set(1L -> ts(usA), 2L -> ts(usB))
  }

  /** Write a two-row events.parquet (single FILE named events.parquet,
    * the testdata convention) with ts in the given layout. */
  private def writeFixture(tsField: StructField, tsValue: Long => Any): String = {
    val dir = Files.createTempDirectory("graft_ts_layout").toFile
    val schema = StructType(Seq(
      StructField("event_id", LongType), tsField,
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val rows = Seq(
      Row(1L, tsValue(usA), 7L, "click", 1.5, "{}"),
      Row(2L, tsValue(usB), 7L, "purchase", 2.5, "{}"))
    val tmp = new java.io.File(dir, "stage")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
    val part = tmp.listFiles().filter(_.getName.startsWith("part-")).head
    val dest = new java.io.File(dir, "events.parquet")
    Files.move(part.toPath, dest.toPath)
    dir.getPath
  }

  private def microsTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private def layouts: Seq[(String, String)] = Seq(
    "nanos-int64" -> writeFixture(
      StructField("ts", LongType), us => us * 1000L),
    "micros-ntz" -> writeFixture(
      StructField("ts", TimestampNTZType),
      us => java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L),
        (Math.floorMod(us, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)),
    "micros-utc" -> writeFixture(
      StructField("ts", TimestampType), us => microsTs(us)))

  test("batch reader parses exact instants under every ts layout") {
    for ((name, dir) <- layouts) {
      val got = Tables(spark, dir, "events")
        .select(col("event_id"), col("ts"))
        .collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toSet
      assert(got == expected, s"layout $name")
      assert(Tables(spark, dir, "events").schema("ts").dataType ==
        TimestampType, s"layout $name normalizes to TimestampType")
    }
  }

  test("streaming reader parses exact instants under every ts layout") {
    for (((name, dir), i) <- layouts.zipWithIndex) {
      val q = s"graft_ts_layout_$i"
      val out = StreamingJobs.runHourlyAvailableNow(spark, dir, q)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      // usA is 10:30:05 UTC, usB 11:30:05 UTC — one group per hour
      assert(out == Set(
        ("2024-03-01 10:00", "click", 1L),
        ("2024-03-01 11:00", "purchase", 1L)), s"layout $name")
    }
  }
}
