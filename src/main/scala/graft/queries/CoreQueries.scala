package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.core.Tables

/** Relational operator inventory (SURVEY.md §2) re-expressed over the
  * driver testdata star schema. Each query maps to the reference
  * operators it covers (cited in the per-query Scaladoc) and carries a
  * DuckDB oracle.
  *
  * Scale notes are inline: every join states its intended physical
  * strategy at 100 TB (broadcast for dims, shuffle-hash/sort-merge on
  * pre-partitioned keys for facts), every window states its partition
  * key. Plans are verified via `.explain("formatted")` in
  * `PlanSpec`.
  */
object CoreQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Exact-arithmetic sum of a 2dp money double: cast to DECIMAL so
    * Spark and DuckDB agree bit-for-bit regardless of summation order,
    * then back to DOUBLE for a stable output schema. */

  override def entries: Seq[(String, Q)] = Seq(

    // ----------------------------------------------------------------
    // A2/A6/A7-style grouped aggregation (reference to_gold.py:28-45,
    // 107-123): count / exact sums / average per group key.
    // Scale: partial (map-side) agg + 2-phase hash agg; no skew risk on
    // low-cardinality flags.
    "q01_group_agg" -> Q(
      run = (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            count(lit(1)).as("n_rows"),
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_price"),
            (dsum(col("l_discount"), 4) / count(lit(1))).as("avg_disc"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      oracle = Some("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ----------------------------------------------------------------
    // P1/P4/P6/O1 projection + filter + cast + sort (to_silver.py:110-132,
    // to_gold.py:157). Filter and 4-column projection must push to the
    // parquet scan (PushedFilters / ReadSchema — PlanSpec asserts).
    "q02_filter_project" -> Q(
      run = (s, dir) =>
        t(s, dir, "orders")
          .filter(col("o_totalprice") > 150000 && col("o_orderpriority").isNotNull)
          .select(
            col("o_orderkey"),
            col("o_orderstatus"),
            lower(col("o_orderpriority")).as("prio_lc"),
            floor(col("o_totalprice")).cast(LongType).as("price_floor"))
          .orderBy("o_orderkey"),
      oracle = Some("""
        SELECT o_orderkey, o_orderstatus, LOWER(o_orderpriority) AS prio_lc,
               CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor
        FROM orders
        WHERE o_totalprice > 150000 AND o_orderpriority IS NOT NULL
        ORDER BY o_orderkey""")),

    // ----------------------------------------------------------------
    // J1 dim-enrichment join chain (to_silver.py:78): fact → dims.
    // Scale: nation/region are tiny dims → explicit broadcast(), so the
    // only shuffle is the orders⋈customer equi-join + the final agg.
    "q03_join_dims" -> Q(
      run = (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
          .orderBy("r_name", "n_name")
      },
      oracle = Some("""
        SELECT r_name, n_name, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name""")),

    // ----------------------------------------------------------------
    // J3/A3 "cheapest per key then join back" (to_gold.py:48-55,77-80):
    // 2-predicate equi-join of a fact to its own grouped MIN.
    // Scale: both sides share the date key → AQE picks SMJ/SHJ on the
    // same partitioning; MIN of double is comparison-only (exact).
    "q04_cheapest_join" -> Q(
      run = (s, dir) => {
        val o = t(s, dir, "orders").withColumn("od", to_date(col("o_orderdate")))
        val cheapest = o.groupBy(col("od")).agg(min(col("o_totalprice")).as("min_price"))
        o.join(cheapest, Seq("od"))
          .filter(col("o_totalprice") === col("min_price"))
          .select(col("od"), col("o_orderkey"), col("o_totalprice").as("price"))
          .orderBy("od", "o_orderkey")
      },
      oracle = Some("""
        WITH cheapest AS (
          SELECT CAST(o_orderdate AS DATE) AS od, MIN(o_totalprice) AS min_price
          FROM orders GROUP BY 1)
        SELECT c.od AS od, o.o_orderkey, o.o_totalprice AS price
        FROM orders o
        JOIN cheapest c
          ON CAST(o.o_orderdate AS DATE) = c.od AND o.o_totalprice = c.min_price
        ORDER BY od, o_orderkey""")),

    // ----------------------------------------------------------------
    // W3 rank-within-group, ties kept (to_gold.py:83-94).
    // Scale: window is partitioned by nationkey → parallel; never a
    // global single-task sort.
    "q05_rank_window" -> Q(
      run = (s, dir) => {
        val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc)
        t(s, dir, "customer")
          .withColumn("rk", rank().over(w))
          .filter(col("rk") === 1)
          .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
          .orderBy("c_nationkey", "c_custkey")
      },
      oracle = Some("""
        SELECT c_nationkey, c_custkey, c_acctbal FROM (
          SELECT c_nationkey, c_custkey, c_acctbal,
                 RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rk
          FROM customer) WHERE rk = 1
        ORDER BY c_nationkey, c_custkey""")),

    // ----------------------------------------------------------------
    // W1/W2 surrogate-key assignment via row_number over a global
    // ordering (to_silver.py:130-132,158). Safe here because the input
    // is the tiny DISTINCT dim; the fact-scale variant uses the
    // partition-offset KeyGen (graft.operators.KeyGen) instead.
    "q06_rownum_ids" -> Q(
      run = (s, dir) =>
        t(s, dir, "customer")
          .select(col("c_mktsegment")).distinct()
          .withColumn("seg_id",
            row_number().over(Window.orderBy(col("c_mktsegment"))).cast(LongType))
          .orderBy("seg_id"),
      oracle = Some("""
        SELECT c_mktsegment,
               ROW_NUMBER() OVER (ORDER BY c_mktsegment) AS seg_id
        FROM (SELECT DISTINCT c_mktsegment FROM customer)
        ORDER BY seg_id""")),

    // ----------------------------------------------------------------
    // J5/J7 dense grid: cross join + left join + COALESCE backfill
    // (to_gold.py:150-178), sequence+explode (to_gold.py:151).
    // Scale: the grid side is tiny (|types|×24) → broadcast side of the
    // left join; events aggregate map-side first.
    "q07_grid_crossjoin" -> Q(
      run = (s, dir) => {
        val ev = t(s, dir, "events")
        val types = ev.select(col("event_type")).distinct()
        val hours = s.range(0, 24).select(col("id").as("hr"))
        val grid = types.crossJoin(hours)
        val counts = ev
          .groupBy(col("event_type"), hour(col("ts")).cast(LongType).as("hr"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("val_sum"))
        grid.join(counts, Seq("event_type", "hr"), "left")
          .select(
            col("event_type"), col("hr"),
            coalesce(col("n"), lit(0L)).as("n"),
            coalesce(col("val_sum"), lit(0.0)).as("val_sum"))
          .orderBy("event_type", "hr")
      },
      oracle = Some("""
        WITH grid AS (
          SELECT event_type, hr
          FROM (SELECT DISTINCT event_type FROM events)
          CROSS JOIN (SELECT UNNEST(range(0, 24)) AS hr)),
        counts AS (
          SELECT event_type, CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hr,
                 COUNT(*) AS n,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
          FROM events GROUP BY 1, 2)
        SELECT g.event_type, g.hr,
               COALESCE(c.n, 0) AS n, COALESCE(c.val_sum, 0.0) AS val_sum
        FROM grid g LEFT JOIN counts c
          ON g.event_type = c.event_type AND g.hr = c.hr
        ORDER BY g.event_type, g.hr""")),

    // ----------------------------------------------------------------
    // A5 COUNT(DISTINCT) per group (to_gold.py:98-105). Scale note: at
    // 100 TB swap for approx_count_distinct (see q22_approx_distinct).
    "q08_count_distinct" -> Q(
      run = (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"))
          .orderBy("l_returnflag"),
      oracle = Some("""
        SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_supps
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ----------------------------------------------------------------
    // U1/A4 UNION ALL of two typed projections then agg
    // (to_gold.py:56-66): the vi∪en review-score shape.
    "q09_union_all" -> Q(
      run = (s, dir) => {
        val ev = t(s, dir, "events")
        val a = ev.filter(col("event_type") === "click").select(col("user_id"), col("value"))
        val b = ev.filter(col("event_type") === "error").select(col("user_id"), col("value"))
        a.unionAll(b)
          .groupBy(col("user_id"))
          .agg((dsum(col("value")) / count(lit(1))).as("avg_value"), count(lit(1)).as("n"))
          .orderBy("user_id")
      },
      oracle = Some("""
        SELECT user_id,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value,
               COUNT(*) AS n
        FROM (
          SELECT user_id, value FROM events WHERE event_type = 'click'
          UNION ALL
          SELECT user_id, value FROM events WHERE event_type = 'error')
        GROUP BY user_id ORDER BY user_id""")),

    // ----------------------------------------------------------------
    // P8 CASE/LIKE classification cascade (to_silver.py:117-128,
    // to_gold.py:35-40) — the Bus_Type_Category / dayband shape.
    "q10_case_when" -> Q(
      run = (s, dir) =>
        t(s, dir, "part")
          .withColumn("size_class",
            when(col("p_size") < 10, "small")
              .when(col("p_size") < 25, "medium")
              .when(col("p_type").like("%ECONOMY%"), "econ-large")
              .otherwise("large"))
          .groupBy(col("size_class"))
          .agg(count(lit(1)).as("n"), dsum(col("p_retailprice")).as("tot_price"))
          .orderBy("size_class"),
      oracle = Some("""
        SELECT CASE WHEN p_size < 10 THEN 'small'
                    WHEN p_size < 25 THEN 'medium'
                    WHEN p_type LIKE '%ECONOMY%' THEN 'econ-large'
                    ELSE 'large' END AS size_class,
               COUNT(*) AS n,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS tot_price
        FROM part GROUP BY 1 ORDER BY 1""")),

    // ----------------------------------------------------------------
    // §2.8 scalar string functions: lower / regexp_replace / substring /
    // concat_ws / split+size (to_silver.py:115,150-151; to_gold.py:34,156).
    "q11_string_funcs" -> Q(
      run = (s, dir) =>
        t(s, dir, "part")
          .select(
            col("p_partkey"),
            lower(col("p_name")).as("name_lc"),
            regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"),
            substring(col("p_brand"), 7, 10).as("brand_num"),
            concat_ws("|", col("p_type"), col("p_brand")).as("type_brand"),
            size(split(col("p_name"), " ")).cast(LongType).as("n_words"))
          .orderBy("p_partkey"),
      oracle = Some("""
        SELECT p_partkey, LOWER(p_name) AS name_lc,
               regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
               substring(p_brand, 7, 10) AS brand_num,
               concat_ws('|', p_type, p_brand) AS type_brand,
               CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words
        FROM part ORDER BY p_partkey""")),

    // ----------------------------------------------------------------
    // explode → regroup (to_silver.py:157-160): word histogram.
    "q12_explode_regroup" -> Q(
      run = (s, dir) =>
        t(s, dir, "part")
          .select(explode(split(col("p_name"), " ")).as("word"))
          .groupBy(col("word"))
          .agg(count(lit(1)).as("n_parts"))
          .orderBy("word"),
      oracle = Some("""
        SELECT word, COUNT(*) AS n_parts
        FROM (SELECT UNNEST(string_split(p_name, ' ')) AS word FROM part)
        GROUP BY word ORDER BY word""")),

    // ----------------------------------------------------------------
    // A8 group + HAVING min-support (to_gold.py:125-147).
    "q13_having" -> Q(
      run = (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_suppkey"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
          .filter(col("n") >= 100)
          .select(col("l_suppkey"), col("n"), col("qty"))
          .orderBy("l_suppkey"),
      oracle = Some("""
        SELECT l_suppkey, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem GROUP BY l_suppkey HAVING COUNT(*) >= 100
        ORDER BY l_suppkey""")),

    // ----------------------------------------------------------------
    // Left-semi join — EXISTS (SURVEY §2.3 note: the clean realization
    // of the reference's J3+DISTINCT idiom).
    "q14_semi_join" -> Q(
      run = (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter(col("o_totalprice") > 200000)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_mktsegment"))
          .orderBy("c_custkey")
      },
      oracle = Some("""
        SELECT c_custkey, c_mktsegment FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
        ORDER BY c_custkey""")),

    // ----------------------------------------------------------------
    // Left-anti join — NOT EXISTS.
    "q15_anti_join" -> Q(
      run = (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy("c_custkey")
      },
      oracle = Some("""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        ORDER BY c_custkey""")),

    // ----------------------------------------------------------------
    // Datetime extraction (to_gold.py:36-39 HOUR/TO_TIMESTAMP;
    // to_silver.py:110 to_date): calendar rollup.
    "q16_datetime" -> Q(
      run = (s, dir) =>
        t(s, dir, "orders")
          .groupBy(
            year(col("o_orderdate")).cast(LongType).as("yr"),
            month(col("o_orderdate")).cast(LongType).as("mo"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("rev"))
          .orderBy("yr", "mo"),
      oracle = Some("""
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mo,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        FROM orders GROUP BY 1, 2 ORDER BY yr, mo""")),

    // ----------------------------------------------------------------
    // A1 scalar (ungrouped) aggregate — the max-key probe
    // (to_silver.py:106).
    "q17_scalar_agg" -> Q(
      run = (s, dir) =>
        t(s, dir, "orders")
          .agg(
            max(col("o_orderkey")).as("max_key"),
            min(to_date(col("o_orderdate"))).as("min_date"),
            max(to_date(col("o_orderdate"))).as("max_date"),
            count(lit(1)).as("n")),
      oracle = Some("""
        SELECT MAX(o_orderkey) AS max_key,
               MIN(CAST(o_orderdate AS DATE)) AS min_date,
               MAX(CAST(o_orderdate AS DATE)) AS max_date,
               COUNT(*) AS n
        FROM orders""")),

    // ----------------------------------------------------------------
    // A2's collect_set + concat_ws, canonicalized by sorting
    // (to_gold.py:34-41; SURVEY §7.4 nondeterminism note).
    "q18_collect_set" -> Q(
      run = (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            concat_ws(",", array_sort(collect_set(col("l_linestatus")))).as("statuses"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      oracle = Some("""
        SELECT l_returnflag,
               string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
               COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ----------------------------------------------------------------
    // P7 DISTINCT pairs (to_silver.py:157,161; to_gold.py:161-168).
    "q19_distinct" -> Q(
      run = (s, dir) =>
        t(s, dir, "customer")
          .select(col("c_mktsegment"), col("c_nationkey")).distinct()
          .orderBy("c_mktsegment", "c_nationkey"),
      oracle = Some("""
        SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        ORDER BY c_mktsegment, c_nationkey""")),

    // ----------------------------------------------------------------
    // Analytic windows beyond the reference's rank/row_number surface:
    // lag/lead, running sum over rowsBetween, ntile quartiles.
    "q35_analytic_windows" -> Q(
      run = (s, dir) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        t(s, dir, "lineitem")
          .filter(col("l_suppkey") < 5)
          .select(
            col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            lag(col("l_quantity"), 1).over(w).as("prev_qty"),
            lead(col("l_quantity"), 1).over(w).as("next_qty"),
            sum(col("l_quantity").cast(DecimalType(18, 2)))
              .over(w.rowsBetween(Window.unboundedPreceding, 0))
              .cast(DoubleType).as("running_qty"),
            ntile(4).over(w).cast(LongType).as("quartile"))
          .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
      },
      oracle = Some("""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               lag(l_quantity, 1) OVER w AS prev_qty,
               lead(l_quantity, 1) OVER w AS next_qty,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER
                 (PARTITION BY l_suppkey
                  ORDER BY l_shipdate, l_orderkey, l_linenumber
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_qty,
               ntile(4) OVER w AS quartile
        FROM lineitem
        WHERE l_suppkey < 5
        WINDOW w AS (PARTITION BY l_suppkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber)
        ORDER BY l_suppkey, l_orderkey, l_linenumber""")),

    // ----------------------------------------------------------------
    // Top-k: ORDER BY + LIMIT plans as TakeOrderedAndProject — a
    // per-partition heap + driver merge, never a full global sort
    // (PlanSpec asserts). Deterministic tiebreak on the key.
    "q36_topk_limit" -> Q(
      run = (s, dir) =>
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20),
      oracle = Some("""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""")),

    // ----------------------------------------------------------------
    // Ordered-set aggregates: interpolated percentiles and argmax/argmin
    // (max_by/min_by) per group.
    "q44_percentiles" -> Q(
      run = (s, dir) =>
        t(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(
            percentile_approx(col("o_totalprice"), lit(0.5), lit(1000000)).as("p50_approx"),
            expr("percentile(o_totalprice, 0.5)").as("median"),
            expr("percentile(o_totalprice, 0.9)").as("p90"),
            max_by(col("o_orderkey"), col("o_totalprice")).as("top_order"),
            min_by(col("o_orderkey"), col("o_totalprice")).as("bottom_order"))
          .drop("p50_approx") // approx sketch isn't cross-engine comparable
          .orderBy("o_orderstatus"),
      oracle = Some("""
        SELECT o_orderstatus,
               quantile_cont(o_totalprice, 0.5) AS median,
               quantile_cont(o_totalprice, 0.9) AS p90,
               max_by(o_orderkey, o_totalprice) AS top_order,
               min_by(o_orderkey, o_totalprice) AS bottom_order
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ----------------------------------------------------------------
    // Summary statistics profile (the describe()/data-profiling role):
    // stddev and correlation computed from exact decimal sums so both
    // engines produce bit-identical doubles (streaming/naive stddev
    // differs across summation orders).
    "q39_summary_stats" -> Q(
      run = (s, dir) => {
        val li = t(s, dir, "lineitem")
        def d(c: String, sc: Int = 2) = col(c).cast(DecimalType(24, sc))
        li.groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            sum(d("l_quantity")).cast(DoubleType).as("s_q"),
            sum((d("l_quantity") * d("l_quantity")).cast(DecimalType(30, 4)))
              .cast(DoubleType).as("ss_q"),
            sum(d("l_extendedprice")).cast(DoubleType).as("s_p"),
            sum((d("l_quantity") * d("l_extendedprice")).cast(DecimalType(34, 4)))
              .cast(DoubleType).as("s_qp"))
          .select(
            col("l_returnflag"), col("n"),
            (col("s_q") / col("n")).as("mean_qty"),
            sqrt((col("ss_q") - col("s_q") * col("s_q") / col("n"))
              / (col("n") - 1)).as("stddev_qty"),
            ((col("s_qp") - col("s_q") * col("s_p") / col("n")) / col("n"))
              .as("cov_qty_price"))
          .orderBy("l_returnflag")
      },
      oracle = Some("""
        WITH sums AS (
          SELECT l_returnflag, COUNT(*) AS n,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(24,2))) AS DOUBLE) AS s_q,
                 CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(24,2)) *
                               CAST(l_quantity AS DECIMAL(24,2)) AS DECIMAL(30,4))) AS DOUBLE) AS ss_q,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,2))) AS DOUBLE) AS s_p,
                 CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(24,2)) *
                               CAST(l_extendedprice AS DECIMAL(24,2)) AS DECIMAL(34,4))) AS DOUBLE) AS s_qp
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, n,
               s_q / n AS mean_qty,
               sqrt((ss_q - s_q * s_q / n) / (n - 1)) AS stddev_qty,
               (s_qp - s_q * s_p / n) / n AS cov_qty_price
        FROM sums ORDER BY l_returnflag""")),

    // ----------------------------------------------------------------
    // As-of join (graft.operators.AsOfJoin): each click event enriched
    // with the user's most recent purchase value at that instant.
    // Oracle: DuckDB's native ASOF JOIN — two entirely different
    // realizations of the operator must agree row-for-row.
    // NULL-key caveat (applies to the whole q38/q102/q108/q109/q120
    // family): both graft realizations group null keys together (window
    // semantics — a null-key left row sees null-key right rows), while
    // DuckDB's ASOF equi-join never matches null to null. events has no
    // null user_id, so the oracles agree here; on null-keyed data,
    // pre-filter right-side null keys for SQL semantics.
    "q38_asof_join" -> Q(
      run = (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value").as("last_purchase"))
        graft.operators.AsOfJoin.asOf(clicks, purchases, "user_id", "ts")
          .select(col("event_id"), col("user_id"),
            col("last_purchase"))
          .orderBy("event_id")
      },
      oracle = Some("""
        SELECT c.event_id, c.user_id, p.value AS last_purchase
        FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
        ASOF LEFT JOIN
             (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id AND c.ts >= p.ts
        ORDER BY event_id""")),

    // ----------------------------------------------------------------
    // Same as-of semantics through the NATIVE physical operator
    // (graft.plans.AsOfJoinExec: custom LogicalPlan + SparkStrategy +
    // SparkPlan, co-partitioned sorted-merge) — the brief's path (c) for
    // whole-operator extensions. Three independent realizations must
    // agree: this exec, q38's composed union+window, and DuckDB's
    // native ASOF JOIN (the oracle).
    "q102_asof_join_native" -> Q(
      run = (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value").as("last_purchase"))
        graft.operators.AsOfJoin.asOfNative(clicks, purchases, "user_id", "ts")
          .select(col("event_id"), col("user_id"), col("last_purchase"))
          .orderBy("event_id")
      },
      oracle = Some("""
        SELECT c.event_id, c.user_id, p.value AS last_purchase
        FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
        ASOF LEFT JOIN
             (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id AND c.ts >= p.ts
        ORDER BY event_id""")),

    // ----------------------------------------------------------------
    // FORWARD as-of through the native exec (pandas merge_asof
    // direction='forward'): each click enriched with the user's NEXT
    // purchase. Oracle: DuckDB ASOF with the inequality flipped.
    "q108_asof_forward" -> Q(
      run = (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value").as("next_purchase"))
        graft.operators.AsOfJoin
          .asOfNative(clicks, purchases, "user_id", "ts", "forward", None)
          .select(col("event_id"), col("user_id"), col("next_purchase"))
          .orderBy("event_id")
      },
      oracle = Some("""
        SELECT c.event_id, c.user_id, p.value AS next_purchase
        FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
        ASOF LEFT JOIN
             (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id AND c.ts <= p.ts
        ORDER BY event_id""")),

    // ----------------------------------------------------------------
    // As-of with a TOLERANCE window (pandas merge_asof tolerance):
    // the nearest preceding purchase only counts within 3 days — the
    // realistic attribution-window semantics. Oracle: plain ASOF, then
    // null-out matches beyond the window (any farther candidate is
    // farther still, so post-filtering the nearest is exact).
    "q109_asof_tolerance" -> Q(
      run = (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value").as("recent_purchase"))
        val threeDaysMicros = 3L * 24 * 3600 * 1000 * 1000
        graft.operators.AsOfJoin.asOfNative(clicks, purchases, "user_id",
          "ts", "backward", Some(threeDaysMicros))
          .select(col("event_id"), col("user_id"), col("recent_purchase"))
          .orderBy("event_id")
      },
      oracle = Some("""
        SELECT c.event_id, c.user_id,
               CASE WHEN p.ts IS NOT NULL
                     AND epoch_us(c.ts) - epoch_us(p.ts) <= 259200000000
                    THEN p.value END AS recent_purchase
        FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
        ASOF LEFT JOIN
             (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id AND c.ts >= p.ts
        ORDER BY event_id""")),

    // ----------------------------------------------------------------
    // NEAREST as-of through the native exec (pandas merge_asof
    // direction='nearest'): each click enriched with the purchase
    // CLOSEST in time, before or after, ties preferring the preceding
    // one. DuckDB's ASOF is backward-only, so the oracle ranks all
    // same-user purchases by |Δt| with an explicit backward tie-break —
    // a completely independent realization that must agree row-for-row.
    // Purchases are pre-aggregated to ONE row per (user, ts) on BOTH
    // sides: with duplicate per-user purchase timestamps, |Δt|+side
    // can't order equal-time rows, so the oracle's ROW_NUMBER (and the
    // native exec's equal-time keep-last) would each pick an arbitrary
    // survivor — collapsing duplicates first makes both engines
    // deterministic for any future dataset.
    "q120_asof_nearest" -> Q(
      run = (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("nearest_purchase"))
        graft.operators.AsOfJoin
          .asOfNative(clicks, purchases, "user_id", "ts", "nearest", None)
          .select(col("event_id"), col("user_id"), col("nearest_purchase"))
          .orderBy("event_id")
      },
      oracle = Some("""
        SELECT event_id, user_id, nearest_purchase FROM (
          SELECT c.event_id, c.user_id, p.value AS nearest_purchase,
                 ROW_NUMBER() OVER (PARTITION BY c.event_id ORDER BY
                   abs(epoch_us(c.ts) - epoch_us(p.ts)),
                   CASE WHEN p.ts <= c.ts THEN 0 ELSE 1 END) AS rn
          FROM (SELECT user_id, ts, event_id FROM events
                WHERE event_type = 'click') c
          LEFT JOIN (SELECT user_id, ts, MAX(value) AS value FROM events
                     WHERE event_type = 'purchase' GROUP BY 1, 2) p
            ON c.user_id = p.user_id)
        WHERE rn = 1 ORDER BY event_id""")),

    // ----------------------------------------------------------------
    // MULTI-KEY as-of through the native exec (pandas merge_asof
    // by=[...]): the match must agree on BOTH (user_id, band) — each
    // click gets the user's most recent purchase in the same value
    // band. Oracle: DuckDB ASOF with two equality conditions. The same
    // composite-key tuple drives the co-partitioning, so the plan shape
    // is unchanged from q102.
    "q121_asof_multikey" -> Q(
      run = (s, dir) => {
        val ev = t(s, dir, "events")
        val band = (floor(col("value") * 10) % 3).cast("long").as("band")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), band, col("ts"), col("event_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), band, col("ts"),
            col("value").as("band_purchase"))
        graft.operators.AsOfJoin.asOfNative(clicks, purchases,
          Seq("user_id", "band"), "ts", "backward", None)
          .select(col("event_id"), col("user_id"), col("band"),
            col("band_purchase"))
          .orderBy("event_id")
      },
      oracle = Some("""
        SELECT c.event_id, c.user_id, c.band, p.value AS band_purchase
        FROM (SELECT user_id, CAST(floor(value * 10) AS BIGINT) % 3 AS band,
                     ts, event_id
              FROM events WHERE event_type = 'click') c
        ASOF LEFT JOIN
             (SELECT user_id, CAST(floor(value * 10) AS BIGINT) % 3 AS band,
                     ts, value
              FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id AND c.band = p.band AND c.ts >= p.ts
        ORDER BY event_id""")),

    // ----------------------------------------------------------------
    // STRICT as-of (pandas merge_asof allow_exact_matches=False): each
    // click enriched with the user's best purchase from a STRICTLY
    // earlier day — a same-day purchase must NOT match. Times are
    // day-bucket longs so exact ties genuinely occur (752 click rows
    // share a day with a purchase at sf0.01); purchases reduce to one
    // row per (user, day) first so equal-time duplicates can't make
    // the match nondeterministic. Oracle: DuckDB ASOF with the strict
    // inequality.
    "q134_asof_strict" -> Q(
      run = (s, dir) => {
        val ev = t(s, dir, "events")
        val day = expr("unix_micros(ts) div 86400000000").as("d")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), day, col("event_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), day, col("value"))
          .groupBy(col("user_id"), col("d"))
          .agg(max(col("value")).as("prev_day_purchase"))
        graft.operators.AsOfJoin.asOfNative(clicks, purchases,
          "user_id", "d", "backward", None, allowExactMatches = false)
          .select(col("event_id"), col("user_id"),
            col("prev_day_purchase"))
          .orderBy("event_id")
      },
      oracle = Some("""
        SELECT c.event_id, c.user_id, p.v AS prev_day_purchase
        FROM (SELECT user_id, epoch_us(ts) // 86400000000 AS d, event_id
              FROM events WHERE event_type = 'click') c
        ASOF LEFT JOIN
             (SELECT user_id, epoch_us(ts) // 86400000000 AS d,
                     MAX(value) AS v
              FROM events WHERE event_type = 'purchase'
              GROUP BY 1, 2) p
          ON c.user_id = p.user_id AND c.d > p.d
        ORDER BY event_id""")),

    // ----------------------------------------------------------------
    // INTERSECT / EXCEPT — completing the set-operation family beyond
    // the reference's UNION ALL (SURVEY §2.7 "No INTERSECT / EXCEPT").
    "q37_setops" -> Q(
      run = (s, dir) => {
        val clickers = t(s, dir, "events")
          .filter(col("event_type") === "click").select(col("user_id"))
        val buyers = t(s, dir, "events")
          .filter(col("event_type") === "purchase").select(col("user_id"))
        val both = clickers.intersect(buyers)
          .withColumn("segment", lit("click_and_buy"))
        val onlyClick = clickers.except(buyers)
          .withColumn("segment", lit("click_only"))
        both.unionAll(onlyClick).orderBy("segment", "user_id")
      },
      oracle = Some("""
        SELECT user_id, 'click_and_buy' AS segment FROM (
          SELECT user_id FROM events WHERE event_type = 'click'
          INTERSECT
          SELECT user_id FROM events WHERE event_type = 'purchase')
        UNION ALL
        SELECT user_id, 'click_only' AS segment FROM (
          SELECT user_id FROM events WHERE event_type = 'click'
          EXCEPT
          SELECT user_id FROM events WHERE event_type = 'purchase')
        ORDER BY segment, user_id""")),

    // ----------------------------------------------------------------
    // Semi-structured: JSON field extraction from the events.props
    // column (engine extension; reference reads whole JSON docs §2.1 S2/S3).
    "q20_json_extract" -> Q(
      run = (s, dir) =>
        t(s, dir, "events")
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").cast(LongType).as("k"))
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n"))
          .orderBy("k"),
      oracle = Some("""
        SELECT CAST(props->>'$.k' AS BIGINT) AS k, COUNT(*) AS n
        FROM events GROUP BY 1 ORDER BY k"""))
  )
}
