package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.audit.AuditLogger
import graft.audit.AuditLogger.AuditRecord
import graft.gold.GoldQueries
import graft.silver.Silver
import graft.sources.Lake

/** Temp-dir lake round-trip of the full reference pipeline across two
  * simulated daily runs: raw CSV/JSON → bronze → silver (append +
  * max-key continuation) → gold → audit (SURVEY.md §5.2 item 4).
  */
class PipelineIntegrationSpec extends SparkSuite {

  private lazy val root = Files.createTempDirectory("graft-lake-").toString

  private val ticketCols = Seq("Bus_Key", "Bus_Name", "Start_Date", "Route",
    "Departure_Time", "Arrival_Time", "Departure_Place", "Arrival_Place",
    "Duration", "Type_Bus", "Price")

  private def writeRawCsv(day: String, rows: Seq[Seq[String]]): String = {
    val dir = s"$root/raw/ticket/$day"
    new java.io.File(dir).mkdirs()
    val f = new java.io.File(s"$dir/bus_data_$day.csv")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.println(ticketCols.mkString(","))
    rows.foreach(r => w.println(r.mkString(",")))
    w.close()
    dir
  }

  test("two daily runs: bronze → silver append with key continuation → gold → audit") {
    import spark.implicits._
    val busIds = Seq(("Phương Trang", "B01"), ("Thành Bưởi", "B02"))
      .toDF("Bus_Name", "Bus_Id")
    Lake.writeOverwrite(busIds, s"$root/silver/bus_ids")

    def runDay(day: String, rows: Seq[Seq[String]]): Unit = {
      val raw = writeRawCsv(day, rows)
      // bronze: raw CSV → all-string table at the day path (S1→S5)
      val bronze = Lake.readCsvAllString(spark, raw, ticketCols)
      Lake.writeOverwrite(bronze, s"$root/bronze/ticket/$day")
      // silver: transform + append with max-key continuation (S6)
      val maxId = Silver.maxKey(
        Lake.readIfExists(spark, s"$root/silver/ticket"), "Bus_Key")
      val silver = Silver.ticket(
        Lake.read(spark, s"$root/bronze/ticket/$day"),
        Lake.read(spark, s"$root/silver/bus_ids"), maxId)
      Lake.writeAppend(silver, s"$root/silver/ticket")
      // audit
      AuditLogger.log(spark, s"$root/audit/audit", Seq(AuditRecord(
        day, "kltn", "tickets_convert", "success", day, day, 1.0, 1, "local")))
    }

    runDay("01-06-2025", Seq(
      Seq("1", "Phương Trang", "01-06-2025", "HCM - Can Tho", "06:30", "10:00",
        "BX Mien Tay", "VP Q5", "3h30m", "Giường nằm 40 chỗ", "150.000đ"),
      Seq("2", "Thành Bưởi", "01-06-2025", "HCM - Da Lat", "22:00", "05:00",
        "SG", "TP Da Lat", "7h", "Limousine giường nằm", "300.000đ")))
    runDay("02-06-2025", Seq(
      Seq("1", "Phương Trang", "02-06-2025", "HCM - Can Tho", "07:00", "10:30",
        "BX Mien Tay", "VP Q5", "3h30m", "Giường nằm 40 chỗ", "140.000đ")))

    val silver = Lake.read(spark, s"$root/silver/ticket")
    assert(silver.count() == 3)
    // keys continue across runs: run1 → {1,2}, run2 → {3}
    assert(silver.select("Bus_Key").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))

    // gold over the accumulated silver
    val q4 = GoldQueries.q4(silver).collect()
    assert(q4.length == 2) // two distinct days
    assert(q4.map(_.getDouble(1)).toSeq == Seq(225000.0, 140000.0))

    val audit = Lake.read(spark, s"$root/audit/audit")
    assert(audit.count() == 2)
    assert(audit.schema == AuditLogger.schema)
  }

  test("idempotent re-run: dynamic partition overwrite replaces, never duplicates") {
    import spark.implicits._
    val day1 = Seq(("2025-06-01", 1L, "a"), ("2025-06-01", 2L, "b"))
      .toDF("day", "id", "v")
    val day2 = Seq(("2025-06-02", 3L, "c")).toDF("day", "id", "v")
    val path = s"$root/idem"
    Lake.writePartitionedOverwrite(day1, path, "day")
    Lake.writePartitionedOverwrite(day2, path, "day")
    // replay day1 (e.g. task retry) with corrected data
    val day1b = Seq(("2025-06-01", 1L, "a2"), ("2025-06-01", 2L, "b2"))
      .toDF("day", "id", "v")
    Lake.writePartitionedOverwrite(day1b, path, "day")
    val out = Lake.read(spark, path)
    assert(out.count() == 3) // no duplicates from the replay
    assert(out.filter(col("day") === "2025-06-01")
      .select("v").collect().map(_.getString(0)).sorted.toSeq == Seq("a2", "b2"))
  }

  test("appendDedup: keyed replay appends only unseen keys") {
    import spark.implicits._
    val path = s"$root/dedup_append"
    Lake.appendDedup(spark, Seq((1L, "x"), (2L, "y")).toDF("k", "v"), path, Seq("k"))
    Lake.appendDedup(spark, Seq((2L, "y"), (3L, "z")).toDF("k", "v"), path, Seq("k"))
    val out = Lake.read(spark, path)
    assert(out.select("k").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("facility pipeline: JSON bronze with schema drift → silver dims") {
    import spark.implicits._
    val busIds = Lake.read(spark, s"$root/silver/bus_ids")
    // line-delimited JSON with stringified list (the drift variant)
    val dir = s"$root/raw/facility"
    new java.io.File(dir).mkdirs()
    val w = new java.io.PrintWriter(s"$dir/bus_facilities.json", "UTF-8")
    w.println("""{"Id": 1, "Bus_Name": "Phương Trang", "Facilities": "['Wifi', 'Toilet']"}""")
    w.println("""{"Id": 2, "Bus_Name": "Thành Bưởi", "Facilities": "[]"}""")
    w.close()
    val bronze = Lake.readJsonLines(spark, s"$dir/bus_facilities.json")
    Lake.writeOverwrite(bronze, s"$root/bronze/facility")
    val (bridge, names) = Silver.facility(
      Lake.read(spark, s"$root/bronze/facility"), busIds)
    Lake.writeAppend(bridge, s"$root/silver/facility")
    Lake.writeAppend(names, s"$root/silver/facility_name")
    assert(Lake.read(spark, s"$root/silver/facility").count() == 2)
    assert(Lake.collectStringSet(
      Lake.read(spark, s"$root/silver/facility_name"), "Facility_Name") ==
      Set("Wifi", "Toilet"))
  }

  test("writeJsonArray: empty input is a literal [], not whitespace junk") {
    import spark.implicits._
    val path = s"$root/exchange/empty_array.json"
    Lake.writeJsonArray(
      Seq.empty[(Long, String)].toDF("Id", "Name"), path)
    assert(new String(Files.readAllBytes(new java.io.File(path).toPath),
      "UTF-8") == "[]")
  }

  test("review pipeline: multiline JSON array → scored → silver with keys") {
    import spark.implicits._
    val dir = s"$root/raw/review"
    new java.io.File(dir).mkdirs()
    val w = new java.io.PrintWriter(s"$dir/bus_reviews.json", "UTF-8")
    w.println("""[
      {"Bus_Name": "Phương Trang", "Customer_Name": "A", "Stars": 5,
       "Comment": "xe tốt sạch sẽ", "Date": "01/06/2025"},
      {"Bus_Name": "Thành Bưởi", "Customer_Name": "B", "Stars": 1,
       "Comment": "bad dirty bus", "Date": "02/06/2025"}
    ]""")
    w.close()
    val raw = graft.sources.Lake.readJsonMultiline(spark, s"$dir/bus_reviews.json")
    assert(raw.count() == 2) // multiLine parse of a JSON array
    val scored = graft.scoring.Sentiment.scoreReviews(raw, "Comment")
      .select($"Bus_Name", $"Comment", $"POS", $"NEG", $"NEU")
    val silver = Silver.review(scored,
      Lake.read(spark, s"$root/silver/bus_ids"), maxId = 7)
    val rows = silver.orderBy("Review_Key").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(8, 9))
    assert(rows(0).getAs[Double]("POS") == 0.5)
  }

  test("mergeAndRenumberJson: ids continue across merges, single part file") {
    import spark.implicits._
    val path = s"$root/exchange/bus_facilities.json"
    new java.io.File(path).getParentFile.mkdirs()
    val r1 = Lake.mergeAndRenumberJson(spark,
      path, Seq((99L, "PT", "Wifi"), (98L, "TB", "Toilet"))
        .toDF("Id", "Bus_Name", "Facility"), "Id")
    assert(r1.select("Id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    val r2 = Lake.mergeAndRenumberJson(spark,
      path, Seq((0L, "KH", "TV")).toDF("Id", "Bus_Name", "Facility"), "Id")
    // existing rows keep their ids; the new row continues from max
    assert(r2.count() == 3)
    assert(r2.select("Id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(new java.io.File(path).listFiles()
      .count(_.getName.startsWith("part-")) == 1)
  }

  test("isEmpty guard (S12)") {
    import spark.implicits._
    assert(Lake.isEmpty(Seq.empty[(Long, String)].toDF("a", "b")))
    assert(!Lake.isEmpty(Seq((1L, "x")).toDF("a", "b")))
  }

  test("single-file JSON exchange sink round-trips") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val path = s"$root/single_json"
    Lake.writeSingleJson(df, path)
    val parts = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(parts.length == 1)
    val back = Lake.readJsonLines(spark, path)
    assert(back.count() == 2)
  }

  test("gold catalog registration: 8 gold outputs + audit, idempotent re-run") {
    import spark.implicits._
    val d = java.sql.Date.valueOf("2025-06-01")
    val ticket = Seq(
      (1, "B01", "Phương Trang", d, "HCM - Cần Thơ", "06:30", 3.5f,
        "giường nằm", 150000, "giường nằm"),
      (2, "B02", "Thành Bưởi", d, "HCM - Đà Lạt", "22:00", 7.0f,
        "limousine", 300000, "limousine giường nằm"))
      .toDF("Bus_Key", "Bus_Id", "Bus_Name", "Start_Date", "Route",
        "Departure_Time", "Duration", "Type_Bus", "Price", "Bus_Type_Category")
    val vi = Seq((1, "B01", "Phương Trang", "xe tốt", 0.8, 0.1))
      .toDF("Review_Key", "Bus_Id", "Bus_Name", "Comment", "POS", "NEG")
    val en = Seq((2, "B02", "Thành Bưởi", "late bus", 0.2, 0.7))
      .toDF("Review_Key", "Bus_Id", "Bus_Name", "Comment", "POS", "NEG")
    val facility = Seq(("B01", "Phương Trang", 1))
      .toDF("Bus_Id", "Bus_Name", "Facility_Id")
    val facilityName = Seq(("Wifi", 1)).toDF("Facility_Name", "Facility_Id")
    val auditPath = s"$root/audit_catalog"
    AuditLogger.log(spark, auditPath, Seq(AuditRecord(
      "01-06-2025", "kltn", "gold_register", "success",
      "01-06-2025", "01-06-2025", 1.0, 1, "local")))

    // the to_gold.py:221-228 shape: every gold output + the audit table
    // registered under one serving database
    def outputs = Seq(
      "gold_q1" -> GoldQueries.q1(ticket),
      "gold_q2" -> GoldQueries.q2(ticket, vi, en),
      "gold_q3" -> GoldQueries.q3(ticket),
      "gold_q4" -> GoldQueries.q4(ticket),
      "gold_q5" -> GoldQueries.q5(vi),
      "gold_q6" -> GoldQueries.q6(vi, en),
      "gold_q7" -> GoldQueries.q7(ticket),
      "gold_q8" -> GoldQueries.q8(facility, facilityName),
      "audit" -> Lake.read(spark, auditPath))

    Lake.registerCatalog(spark, "gold", outputs)
    val counts = outputs.map { case (n, _) =>
      n -> spark.table(s"gold.$n").count()
    }.toMap
    // re-running the gold job re-registers without duplicating tables
    // or rows (the reference's daily DAG re-runs to_gold every day)
    Lake.registerCatalog(spark, "gold", outputs)
    outputs.foreach { case (n, _) =>
      assert(spark.catalog.tableExists(s"gold.$n"), s"missing gold.$n")
      assert(spark.table(s"gold.$n").count() == counts(n), s"count drift in gold.$n")
    }
    // listTables also reports session temp views (other suites register
    // them on the shared session) — count only permanent tables
    assert(spark.catalog.listTables("gold")
      .filter(!_.isTemporary).count() == 9)
    // a SQL-over-catalog client sees the gold layer by name
    assert(spark.sql("SELECT COUNT(*) FROM gold.gold_q1").head().getLong(0) > 0)
  }

  test("versioned silver: replayed daily batch is idempotent via MERGE") {
    import spark.implicits._
    val tbl = s"$root/vt_silver"
    // day 1 lands
    graft.sources.VersionedTable.overwrite(
      Seq((1, "2024-01-01", 100), (2, "2024-01-01", 150))
        .toDF("key", "day", "price"), tbl)
    // day 2 lands; then the SAME day-2 batch replays (retry) with one
    // corrected row — a blind append would duplicate, MERGE must not
    val day2 = Seq((3, "2024-01-02", 90), (4, "2024-01-02", 200))
      .toDF("key", "day", "price")
    graft.sources.VersionedTable.merge(spark, tbl, day2, Seq("key"))
    val day2Retry = Seq((3, "2024-01-02", 95), (4, "2024-01-02", 200))
      .toDF("key", "day", "price")
    graft.sources.VersionedTable.merge(spark, tbl, day2Retry, Seq("key"))
    val latest = graft.sources.VersionedTable.read(spark, tbl)
      .as[(Int, String, Int)].collect().toSet
    assert(latest == Set((1, "2024-01-01", 100), (2, "2024-01-01", 150),
      (3, "2024-01-02", 95), (4, "2024-01-02", 200)))
    // audit trail: the pre-retry state is still one time-travel away
    val beforeRetry = graft.sources.VersionedTable.readVersion(spark, tbl, 1)
      .as[(Int, String, Int)].collect().toSet
    assert(beforeRetry.contains((3, "2024-01-02", 90)))
  }
}
