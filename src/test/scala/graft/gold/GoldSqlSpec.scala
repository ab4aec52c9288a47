package graft.gold

import java.sql.Date

import graft.SparkSuite
import graft.sources.Lake

/** Entry-B demonstration (SURVEY.md §3.2): the gold workload runs
  * identically through `spark.sql` over registered temp views — same
  * Catalyst pipeline as the DataFrame builders, so results must match
  * row-for-row. */
class GoldSqlSpec extends SparkSuite {

  test("SQL entry point matches the DataFrame builders") {
    import spark.implicits._
    val d1 = Date.valueOf("2025-05-11")
    val ticket = Seq(
      (1, "B01", "Phương Trang", d1, "HCM - Cần Thơ", 150000),
      (2, "B01", "Phương Trang", d1, "HCM - Cần Thơ", 170000),
      (3, "B02", "Thành Bưởi", d1, "HCM - Đà Lạt", 300000))
      .toDF("Bus_Key", "Bus_Id", "Bus_Name", "Start_Date", "Route", "Price")
    Lake.registerViews("ticket" -> ticket)

    // case-insensitive resolution is part of the contract (the reference
    // mixes Ticket/ticket, Route/route — SURVEY §7.4)
    val sql3 = spark.sql("""
      SELECT t.Route, COUNT(DISTINCT t.Bus_Name) AS total_bus_operators
      FROM Ticket t GROUP BY t.Route ORDER BY total_bus_operators DESC, t.Route""")
    val df3 = GoldQueries.q3(ticket)
    assert(sql3.collect().map(_.mkString("|")).sorted.toSeq ==
      df3.collect().map(_.mkString("|")).sorted.toSeq)

    val sql4 = spark.sql("""
      SELECT start_date, ROUND(AVG(price), 0) AS avg_price_per_day
      FROM ticket GROUP BY start_date ORDER BY start_date""")
    val df4 = GoldQueries.q4(ticket)
    assert(sql4.collect().map(_.getDouble(1)).toSeq ==
      df4.collect().map(_.getDouble(1)).toSeq)
  }

  test("unionByName merge (U3): JSON batches with different column order") {
    import spark.implicits._
    val a = Seq((1L, "PT", "Wifi")).toDF("Id", "Bus_Name", "Facility")
    val b = Seq(("Toilet", "TB", 2L)).toDF("Facility", "Bus_Name", "Id")
    val merged = a.unionByName(b)
    assert(merged.count() == 2)
    assert(merged.select("Id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }
}
