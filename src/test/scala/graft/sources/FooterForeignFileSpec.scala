package graft.sources

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The driver-side footer-stat fold must BAIL (fall back to the Spark
  * job path) on footer shapes it cannot fold faithfully: unsigned
  * integer annotations (whose min/max would fold mis-ordered as signed
  * longs → wrong pruning) and NANOS timestamps. TIMESTAMP_NTZ at
  * MICROS folds since round 15 — the footer long IS the unadjusted
  * wall-clock micros the `__ntz_` kind records, byte-identical to the
  * job path's zone-free field arithmetic. */
class FooterForeignFileSpec extends SparkSuite {

  private def tmpDir(): File =
    Files.createTempDirectory("graft_foreign").toFile

  private def parquetFilesIn(d: File): Seq[String] =
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.getPath).toSeq

  /** One parquet file with an UNSIGNED-annotated int64 column, written
    * through parquet-java directly (Spark never stages one). */
  private def writeUnsignedFile(): String = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.MessageTypeParser
    val schema = MessageTypeParser.parseMessageType(
      "message m { required int64 u (INTEGER(64,false)); }")
    val out = new File(tmpDir(), "u.parquet")
    val w = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(out.getPath))
      .withType(schema)
      .build()
    val f = new SimpleGroupFactory(schema)
    // -1L as unsigned = 2^64-1, the max; 1L the min. A signed fold
    // would order them the other way round.
    try { w.write(f.newGroup().append("u", 1L))
          w.write(f.newGroup().append("u", -1L)) }
    finally w.close()
    out.getPath
  }

  test("unsigned-annotated int64 bails the footer fold to the job path") {
    val p = writeUnsignedFile()
    assert(VersionedTable.footerStatLines(Seq(p), Seq("u"), Map.empty).isEmpty,
      "an unsigned annotation must not fold as signed longs")
  }

  test("TIMESTAMP_NTZ at MICROS folds from footers as __ntz_ " +
    "(unadjusted wall-clock micros); NANOS still bails") {
    val d = tmpDir()
    spark.range(4)
      .withColumn("ts", to_timestamp_ntz(
        concat(lit("2024-01-0"), (col("id") + 1).cast("string"))))
      .coalesce(1).write.mode("overwrite").parquet(d.getPath)
    val files = parquetFilesIn(d)
    assert(files.nonEmpty)
    val folded = VersionedTable.footerStatLines(files, Seq("ts"), Map.empty)
    assert(folded.isDefined, "NTZ MICROS must fold driver-side")
    val lo = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    val hi = java.time.LocalDateTime.of(2024, 1, 4, 0, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    assert(folded.get.head.contains(s"\t__ntz_ts\t$lo\t$hi"),
      s"unadjusted micros expected: ${folded.get.head}")
    // NANOS (foreign writers; Spark never stages it) still bails
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.MessageTypeParser
    val schema = MessageTypeParser.parseMessageType(
      "message m { required int64 ts (TIMESTAMP(NANOS,false)); }")
    val out = new File(tmpDir(), "n.parquet")
    val w = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(out.getPath))
      .withType(schema).build()
    val f = new SimpleGroupFactory(schema)
    try w.write(f.newGroup().append("ts", 1700000000000000000L))
    finally w.close()
    assert(VersionedTable.footerStatLines(
      Seq(out.getPath), Seq("ts"), Map.empty).isEmpty,
      "NANOS timestamps must bail the fold")
  }

  test("control: signed long + UTC timestamp still fold from footers") {
    val d = tmpDir()
    // pin MICROS explicitly (GraftSession.tune sets it session-wide,
    // but this control must hold even on an untuned session; INT96
    // correctly bails the fold)
    val k = "spark.sql.parquet.outputTimestampType"
    val saved = spark.conf.get(k)
    try {
      spark.conf.set(k, "TIMESTAMP_MICROS")
      spark.range(4)
        .withColumn("ts", to_timestamp(
          concat(lit("2024-01-0"), (col("id") + 1).cast("string"))))
        .coalesce(1).write.mode("overwrite").parquet(d.getPath)
    } finally spark.conf.set(k, saved)
    val files = parquetFilesIn(d)
    val folded = VersionedTable.footerStatLines(files, Seq("id", "ts"),
      Map.empty)
    assert(folded.nonEmpty, "the happy path must keep folding")
    val line = folded.get.head
    assert(line.contains("\tid\t0\t3"), line)
    assert(line.contains("__ts_ts"), line)
  }
}
