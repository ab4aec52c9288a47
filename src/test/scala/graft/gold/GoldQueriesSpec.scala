package graft.gold

import java.sql.Date

import graft.SparkSuite
import graft.gold.GoldQueries.SilverTables

/** Gold-query tests on hand-computable silver fixtures (SURVEY.md §5.2
  * item 3, vexere-shaped side). */
class GoldQueriesSpec extends SparkSuite {

  private val d1 = Date.valueOf("2025-05-11")
  private val d2 = Date.valueOf("2025-05-12")

  private def tables = {
    import spark.implicits._
    val ticket = Seq(
      // Bus_Key, Bus_Id, Bus_Name, Start_Date, Route, Departure_Time, Duration, Type_Bus, Price, Bus_Type_Category
      (1, "B01", "Phương Trang", d1, "HCM - Cần Thơ", "06:30", 3.5f, "giường nằm", 150000, "giường nằm"),
      (2, "B01", "Phương Trang", d1, "HCM - Cần Thơ", "13:00", 3.5f, "giường nằm", 170000, "giường nằm"),
      (3, "B02", "Thành Bưởi", d1, "HCM - Cần Thơ", "23:30", 3.5f, "limousine", 150000, "limousine giường nằm"),
      (4, "B02", "Thành Bưởi", d1, "HCM - Đà Lạt", "08:00", 7.0f, "limousine", 300000, "limousine giường nằm"),
      (5, "B01", "Phương Trang", d2, "HCM - Cần Thơ", "06:30", 3.5f, "giường nằm", 140000, "giường nằm"),
      (6, "B03", "Kumho", d2, "HCM - Cần Thơ", null, 3.5f, "ghế ngồi", 140000, "ghế ngồi"))
      .toDF("Bus_Key", "Bus_Id", "Bus_Name", "Start_Date", "Route",
        "Departure_Time", "Duration", "Type_Bus", "Price", "Bus_Type_Category")

    def mkReviews(busId: String, busName: String, n: Int, pos: Double, neg: Double, from: Int) = {
      (from until (from + n)).map(i => (i, busId, busName, s"c$i", pos, neg))
    }
    // 60 vi reviews for Phương Trang (pos .8) → passes HAVING >= 50;
    // 30 vi + 30 en for Thành Bưởi (pos .3) → 60 combined, also passes
    val vi = (mkReviews("B01", "Phương Trang", 60, 0.8, 0.1, 1) ++
      mkReviews("B02", "Thành Bưởi", 30, 0.3, 0.6, 100))
      .toDF("Review_Key", "Bus_Id", "Bus_Name", "Comment", "POS", "NEG")
    val en = mkReviews("B02", "Thành Bưởi", 30, 0.3, 0.6, 200)
      .toDF("Review_Key", "Bus_Id", "Bus_Name", "Comment", "POS", "NEG")

    val facility = Seq(
      ("B01", "Phương Trang", 1), ("B01", "Phương Trang", 3),
      ("B02", "Thành Bưởi", 2))
      .toDF("Bus_Id", "Bus_Name", "Facility_Id")
    val facilityName = Seq(
      ("Nước uống", 1), ("Toilet", 2), ("Wifi", 3),
      ("Z-dup", 1)) // duplicate id → q8 MIN-dedup picks "Nước uống"
      .toDF("Facility_Name", "Facility_Id")
    SilverTables(ticket, vi, en, facility, facilityName)
  }

  test("q1: trips, avg fare, daybands per route+operator") {
    val got = GoldQueries.q1(tables.ticket).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getString(4).split(", ").sorted.toSeq)).toSeq
    val exp = Seq(
      ("HCM - Cần Thơ", "Phương Trang", 3L, 153333.0, Seq("06h-11h", "12h-17h")),
      ("HCM - Cần Thơ", "Thành Bưởi", 1L, 150000.0, Seq("18h-23h")),
      ("HCM - Cần Thơ", "Kumho", 1L, 140000.0, Seq("")),
      ("HCM - Đà Lạt", "Thành Bưởi", 1L, 300000.0, Seq("06h-11h")))
    // row order within equal Total_Trips is nondeterministic → compare as sets
    assert(got.toSet == exp.toSet)
    assert(got.map(_._1) == got.map(_._1).sorted) // Route ordering holds
  }

  test("q2: cheapest then best-reviewed per day+route, ties kept") {
    val st = tables
    val got = GoldQueries.q2(st.ticket, st.busReviewsVi, st.busReviewsEn)
      .collect()
      .map(r => (r.getDate(0), r.getString(1), r.getString(2), r.getInt(3))).toSeq
    // d1/Cần Thơ: min 150000 → {Phương Trang(avg_pos .8→good), Thành Bưởi(.3→not)}
    //   → rank by is_good desc → Phương Trang only
    // d1/Đà Lạt: only Thành Bưởi (not good, rank 1 anyway)
    // d2/Cần Thơ: min 140000 → {Phương Trang good, Kumho no reviews → 0}
    val exp = Seq(
      (d1, "HCM - Cần Thơ", "Phương Trang", 150000),
      (d1, "HCM - Đà Lạt", "Thành Bưởi", 300000),
      (d2, "HCM - Cần Thơ", "Phương Trang", 140000))
    assert(got == exp)
  }

  test("q3: operator count per route") {
    val got = GoldQueries.q3(tables.ticket).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("HCM - Cần Thơ", 3L), ("HCM - Đà Lạt", 1L)))
  }

  test("q4: avg price per day") {
    val got = GoldQueries.q4(tables.ticket).collect()
      .map(r => (r.getDate(0), r.getDouble(1))).toSeq
    assert(got == Seq((d1, 192500.0), (d2, 140000.0)))
  }

  test("q5: review volume per operator") {
    val got = GoldQueries.q5(tables.busReviewsVi).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("Phương Trang", 60L), ("Thành Bưởi", 30L)))
  }

  test("q6: 10pt rating with >=50 support, key dropped") {
    val st = tables
    val got = GoldQueries.q6(st.busReviewsVi, st.busReviewsEn).collect()
      .map(_.getDouble(0)).toSeq
    // PT: .1*5 + .8*10 = 8.5 (60 reviews); TB: .6*5 + .3*10 = 6.0 (60)
    assert(got == Seq(8.5, 6.0))
  }

  test("q7: dense operator×hour grid") {
    val got = GoldQueries.q7(tables.ticket)
    val rows = got.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    // Kumho has a null departure_time → excluded from bus_names
    assert(rows.length == 2 * 24)
    val flagged = rows.filter(_._3 == 1).toSet
    assert(flagged == Set(
      ("Phương Trang", 6, 1), ("Phương Trang", 13, 1),
      ("Thành Bưởi", 23, 1), ("Thành Bưởi", 8, 1)))
  }

  test("q8: dense operator×facility grid with MIN-dedup names") {
    val st = tables
    val rows = GoldQueries.q8(st.facility, st.facilityName).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2),
        if (r.isNullAt(3)) null else r.getString(3)))
    assert(rows.length == 2 * 21)
    val f1 = rows.filter(r => r._2 == 1).map(r => (r._1, r._3, r._4)).toSet
    // duplicate Facility_Id 1 → MIN("Nước uống","Z-dup") = "Nước uống"
    assert(f1 == Set(("Phương Trang", 1, "Nước uống"), ("Thành Bưởi", 0, "Nước uống")))
    assert(rows.count(_._3 == 1) == 3)
    // ids 4..21 have no dim row → null name
    assert(rows.filter(_._2 > 3).forall(_._4 == null))
  }
}
