package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.functions.VexereFunctions.dayband

/** The reference's 8 gold analytical queries (to_gold.py:28-218),
  * re-expressed as typed DataFrame builders — composable, unit-testable,
  * and identical to the SQL under Catalyst. Output schemas (column
  * names, case) match the reference SELECTs exactly.
  *
  * Scale notes: every dim/grid side of a join is broadcast; the only
  * fact-scale shuffles are the group-bys and the rank window in q2
  * (partitioned by (start_date, route) — parallel, no global sort
  * bottleneck).
  */
object GoldQueries {

  /** The silver tables the gold layer reads (to_gold.py:7-19). */
  final case class SilverTables(
      ticket: DataFrame,
      busReviewsVi: DataFrame,
      busReviewsEn: DataFrame,
      facility: DataFrame,
      facilityName: DataFrame)

  def all(st: SilverTables): Map[String, DataFrame] = Map(
    "cau_1" -> q1(st.ticket),
    "cau_2" -> q2(st.ticket, st.busReviewsVi, st.busReviewsEn),
    "cau_3" -> q3(st.ticket),
    "cau_4" -> q4(st.ticket),
    "cau_5" -> q5(st.busReviewsVi),
    "cau_6" -> q6(st.busReviewsVi, st.busReviewsEn),
    "cau_7" -> q7(st.ticket),
    "cau_8" -> q8(st.facility, st.facilityName))

  /** q1 (to_gold.py:28-45): trips / avg fare / departure daybands per
    * (Route, Bus_Name). collect_set order is nondeterministic in the
    * reference too — canonicalize when comparing (SURVEY.md §7.4). */
  def q1(ticket: DataFrame): DataFrame =
    ticket
      .groupBy(col("Route"), col("Bus_Name"))
      .agg(
        count(lit(1)).as("Total_Trips"),
        round(avg(col("Price")), 0).as("Avg_Price_Per_Day"),
        concat_ws(", ", collect_set(dayband(col("Departure_Time"))))
          .as("depart_time_ranges"))
      .orderBy(col("Route"), col("Total_Trips").desc)

  /** q2 (to_gold.py:48-95): best-reviewed among the cheapest operators
    * per (day, route); rank ties kept. */
  def q2(ticket: DataFrame, vi: DataFrame, en: DataFrame): DataFrame = {
    val cheapest = ticket
      .groupBy(col("Start_Date").as("c_start_date"), col("Route").as("c_route"))
      .agg(min(col("Price")).as("min_price"))
    val reviewScore = vi.select(col("Bus_Id"), col("POS"))
      .unionAll(en.select(col("Bus_Id"), col("POS")))
      .groupBy(col("Bus_Id"))
      .agg(round(avg(col("POS")), 2).as("avg_positive"))
    val candidates = ticket
      .join(cheapest,
        col("Start_Date") === col("c_start_date") &&
          col("Route") === col("c_route") &&
          col("Price") === col("min_price"))
      .join(reviewScore, Seq("Bus_Id"), "left")
      .select(
        col("Start_Date").as("start_date"),
        col("Route").as("route"),
        col("Bus_Name").as("bus_name"),
        col("Bus_Id"),
        col("Price").as("price"),
        coalesce(col("avg_positive"), lit(0)).as("avg_positive"))
      .withColumn("is_good",
        when(col("avg_positive") > 0.5, 1).otherwise(0))
      .distinct()
    val w = Window.partitionBy(col("start_date"), col("route"))
      .orderBy(col("is_good").desc)
    candidates
      .withColumn("rank_in_group", rank().over(w))
      .filter(col("rank_in_group") === 1)
      .select(col("start_date"), col("route"), col("bus_name"), col("price"))
      .orderBy(col("start_date"), col("route"), col("bus_name"))
  }

  /** q3 (to_gold.py:98-105): operator count per route. */
  def q3(ticket: DataFrame): DataFrame =
    ticket
      .groupBy(col("Route"))
      .agg(countDistinct(col("Bus_Name")).as("total_bus_operators"))
      .orderBy(col("total_bus_operators").desc)

  /** q4 (to_gold.py:107-114): average daily fare. */
  def q4(ticket: DataFrame): DataFrame =
    ticket
      .groupBy(col("Start_Date"))
      .agg(round(avg(col("Price")), 0).as("avg_price_per_day"))
      .orderBy(col("Start_Date"))

  /** q5 (to_gold.py:116-123): review volume per operator (vi). */
  def q5(vi: DataFrame): DataFrame =
    vi.groupBy(col("Bus_Name"))
      .agg(count(lit(1)).as("total_reviews"))
      .orderBy(col("total_reviews").desc)

  /** q6 (to_gold.py:125-147): 10-point rating over vi∪en with ≥50
    * review support. The reference deliberately drops the grouped key
    * from the projection — preserved. */
  def q6(vi: DataFrame, en: DataFrame): DataFrame = {
    val combined = vi
      .select(col("Bus_Name").cast("string").as("bus_name"), col("NEG"), col("POS"))
      .unionAll(en.select(
        col("Bus_Name").cast("string").as("bus_name"), col("NEG"), col("POS")))
    combined
      .groupBy(col("bus_name"))
      .agg(
        round(avg(col("NEG") * 5 + col("POS") * 10), 2).as("avg_rating_10pt"),
        count(lit(1)).as("__n"))
      .filter(col("__n") >= 50)
      .select(col("avg_rating_10pt"))
      .orderBy(col("avg_rating_10pt").desc)
  }

  /** q7 (to_gold.py:150-178): dense (operator × 24h) departure grid. */
  def q7(ticket: DataFrame): DataFrame = {
    val busHours = ticket
      .filter(col("Departure_Time").isNotNull)
      .select(
        col("Bus_Name").cast("string").as("bus_name"),
        substring(col("Departure_Time"), 1, 2).cast(IntegerType).as("hour"))
    val busNames = busHours.select(col("bus_name")).distinct()
    val hours = busHours.sparkSession.range(0, 24)
      .select(col("id").cast(IntegerType).as("hour"))
    val flags = busHours
      .select(col("bus_name"), col("hour"), lit(1).as("has_departure"))
      .distinct()
    busNames
      .crossJoin(broadcast(hours))
      .join(flags, Seq("bus_name", "hour"), "left")
      .select(col("bus_name"), col("hour"),
        coalesce(col("has_departure"), lit(0)).as("has_departure"))
      .orderBy(col("bus_name"), col("hour"))
  }

  /** q8 (to_gold.py:182-217): dense (operator × 21 facilities) grid
    * with the MIN-dedup of the unstable facility_name dim (SURVEY.md
    * §7.4 "Facility_Id instability"). */
  def q8(facility: DataFrame, facilityName: DataFrame): DataFrame = {
    val source = facility
      .filter(col("Bus_Name").isNotNull && col("Facility_Id").isNotNull)
      .select(
        col("Bus_Name").cast("string").as("bus_name"),
        col("Facility_Id").cast(IntegerType).as("facility_id"))
    val facilities = facility.sparkSession.range(1, 22)
      .select(col("id").cast(IntegerType).as("facility_id"))
    val busNames = source.select(col("bus_name")).distinct()
    val flags = source
      .select(col("bus_name"), col("facility_id"), lit(1).as("has_facility"))
      .distinct()
    val nameDedup = facilityName
      .filter(col("Facility_Name").isNotNull)
      .groupBy(col("Facility_Id").as("facility_id"))
      .agg(min(col("Facility_Name")).as("facility_name"))
    busNames
      .crossJoin(broadcast(facilities))
      .join(flags, Seq("bus_name", "facility_id"), "left")
      .join(broadcast(nameDedup), Seq("facility_id"), "left")
      .select(col("bus_name"), col("facility_id"),
        coalesce(col("has_facility"), lit(0)).as("has_facility"),
        col("facility_name"))
      .orderBy(col("bus_name"), col("facility_id"))
  }
}
