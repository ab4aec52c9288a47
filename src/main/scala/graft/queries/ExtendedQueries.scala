package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.core.Tables

/** Round-2 relational extensions beyond the reference surface
  * (SURVEY.md §2 "not present" gaps, closed): range/interval join,
  * CUBE grouping sets, exact correlation statistics, deterministic
  * hash sampling, and changelog compaction (latest-row-per-key).
  *
  * Scale notes per query are inline; all five carry DuckDB oracles.
  */
object ExtendedQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)


  override def entries: Seq[(String, Q)] = Seq(

    // ----------------------------------------------------------------
    // Range (interval) join — the non-equi join class SURVEY §2.3 notes
    // as absent from the reference. Facts are banded by a small interval
    // table: Spark plans broadcast-nested-loop with the 6-row band side
    // broadcast, so each fact partition scans locally — no shuffle of
    // the big side. At 100 TB the same shape holds: NLJ cost is
    // |facts| × |bands| with bands tiny; for large band tables switch
    // to the bucket-point rewrite (band lo/hi → integer bucket keys →
    // equi-join), which q61's offset math demonstrates.
    "q45_range_join" -> Q(
      run = (s, dir) => {
        val bands = s.range(0, 6).select((col("id") * 100000L).as("lo"))
        t(s, dir, "orders")
          .join(broadcast(bands),
            col("o_totalprice") >= col("lo") &&
              col("o_totalprice") < col("lo") + 100000L)
          .groupBy(col("lo"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
          .orderBy("lo")
      },
      oracle = Some("""
        SELECT lo, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        JOIN (SELECT UNNEST(range(0, 6)) * 100000 AS lo) bands
          ON o_totalprice >= lo AND o_totalprice < lo + 100000
        GROUP BY lo ORDER BY lo""")),

    // The 100 TB form of q45: the bucket-point EQUI-JOIN rewrite of
    // the point-in-interval join (RangeJoin.bucketedPointJoin) — q45's
    // broadcast NLJ is fine for a 6-row band table and quadratic past
    // it; here the band table is FACT-DERIVED (50 md5-chosen anchor
    // orders, each spanning [price, price+20000]) and the join
    // manufactures its equi key: intervals explode to their W-aligned
    // covering buckets, points map to their home bucket, ONE hash join
    // + residual filter. Interval fan-out <= len/W + 1 = 2 rows here.
    "q181_range_join_bucketed" -> Q(
      run = (s, dir) => {
        val orders = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
        val anchors = orders
          .filter(substring(md5(col("o_orderkey").cast(StringType)), 1, 2)
            === "00")
          .select(col("o_orderkey").as("anchor_key"),
            col("o_totalprice").as("lo"),
            (col("o_totalprice") + 20000L).as("hi"))
        graft.operators.RangeJoin.bucketedPointJoin(
          orders, anchors, "o_totalprice", "lo", "hi", bucketWidth = 20000L)
          .groupBy(col("anchor_key"))
          .agg(count(lit(1)).as("n_in_band"))
          .orderBy("anchor_key")
      },
      oracle = Some("""
        SELECT a.anchor_key, COUNT(*) AS n_in_band
        FROM (SELECT o_orderkey AS anchor_key, o_totalprice AS lo,
                     o_totalprice + 20000 AS hi
              FROM orders
              WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) = '00') a
        JOIN orders p
          ON p.o_totalprice >= a.lo AND p.o_totalprice <= a.hi
        GROUP BY 1 ORDER BY anchor_key""")),

    // ----------------------------------------------------------------
    // Grid-blocked exact RADIUS JOIN (GridJoin) — the 2-D spatial
    // member of the blocked-join family (q72 blocks on nation × length,
    // q181 on 1-D buckets; this on grid cells): all customer pairs
    // within integer distance 1000 on a synthetic 100k × 100k plane
    // (coordinates md5-derived from the key — the q153 synthetic-
    // modality pattern — so both engines re-derive them exactly).
    // Candidates come from ONE hash equi-join on the cell id (probe
    // side exploded to its fixed 3×3 cell neighborhood, build side at
    // its home cell — complete for any pair within one cell side, each
    // pair matched exactly once); the exact integer-squared-distance
    // residual makes the result bit-identical to the cross join the
    // oracle runs. Scale: shuffle is 9·N + N rows, no broadcast, no
    // BNLJ; hot (dense) cells salt like any hot key.
    "q195_grid_radius" -> Q(
      run = (s, dir) => {
        val h = md5(col("c_custkey").cast(StringType))
        val pts = t(s, dir, "customer").select(
          col("c_custkey").as("id"),
          (conv(substring(h, 1, 7), 16, 10).cast(LongType) % 100000L).as("x"),
          (conv(substring(h, 9, 7), 16, 10).cast(LongType) % 100000L).as("y"))
        graft.operators.GridJoin
          .selfRadiusPairs(pts, "id", "x", "y", radius = 1000L)
          .orderBy("id_a", "id_b")
      },
      oracle = Some("""
        WITH p AS (
          SELECT c_custkey AS id,
                 CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 7))
                   AS BIGINT) % 100000 AS x,
                 CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 9, 7))
                   AS BIGINT) % 100000 AS y
          FROM customer)
        SELECT a.id AS id_a, b.id AS id_b,
               (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS dist2
        FROM p a JOIN p b ON a.id < b.id
        WHERE (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 1000*1000
        ORDER BY id_a, id_b""")),

    // ----------------------------------------------------------------
    // K-ANONYMITY audit + suppression (operators.Privacy — the
    // release-side governance stage after q92's PII scrub removes
    // DIRECT identifiers): events generalized to the quasi-identifier
    // (event_type, value-band of 25) still leak when a combination is
    // rarer than k=10 — those groups are the risk report (the anchor
    // rows), and the suppress_ok flag certifies that the enforced
    // release keeps exactly the ≥k groups (kept + risky rows = total;
    // min kept group ≥ k). One combinable group count + a semi-join;
    // no fact-scale window.
    "q208_k_anonymity" -> Q(
      run = (s, dir) => {
        val quasi = t(s, dir, "events").select(col("event_type"),
          graft.operators.Privacy.band(col("value"), 25.0).as("band"))
        val risky = graft.operators.Privacy
          .kAnonymityAudit(quasi, Seq("event_type", "band"), 10L)
        val kept = graft.operators.Privacy
          .suppressSmallGroups(quasi, Seq("event_type", "band"), 10L)
        val ok = kept.groupBy(col("event_type"), col("band"))
          .agg(count(lit(1)).as("kn"))
          .agg(min(col("kn")).as("mn"), sum(col("kn")).as("tot"))
          .crossJoin(broadcast(
            risky.agg(coalesce(sum(col("n")), lit(0L)).as("rt"))))
          .crossJoin(broadcast(quasi.agg(count(lit(1)).as("all"))))
          .select((col("mn") >= 10L && col("tot") + col("rt") === col("all"))
            .cast(LongType).as("suppress_ok"))
        graft.operators.Certify.attach(risky, ok)
          .orderBy("event_type", "band")
      },
      oracle = Some("""
        WITH g AS (
          SELECT event_type, CAST(FLOOR(value / 25) AS BIGINT) AS band,
                 COUNT(*) AS n
          FROM events GROUP BY 1, 2)
        SELECT event_type, band, n, CAST(1 AS BIGINT) AS suppress_ok
        FROM g WHERE n < 10 ORDER BY event_type, band""")),

    // ----------------------------------------------------------------
    // Expanding-ring NEAREST NEIGHBOR (GridJoin.nearestNeighbor — the
    // map-matching / snap-to-nearest primitive on q195's plane): each
    // customer's nearest other customer, found by rounds of the cell
    // equi-join at doubling radii over the still-unmatched points —
    // complete-within-radius makes each round's min the true NN, so
    // the whole thing is exact and the oracle recomputes it as the
    // all-pairs window minimum. Ring start 2000 covers most points in
    // round one (uniform NN distances ~√(area/n) ≈ 2.6k here);
    // stragglers escalate geometrically instead of forcing a global
    // worst-case radius on everyone.
    "q205_grid_nearest" -> Q(
      run = (s, dir) => {
        val h = md5(col("c_custkey").cast(StringType))
        val pts = t(s, dir, "customer").select(
          col("c_custkey").as("id"),
          (conv(substring(h, 1, 7), 16, 10).cast(LongType) % 100000L).as("x"),
          (conv(substring(h, 9, 7), 16, 10).cast(LongType) % 100000L).as("y"))
        graft.operators.GridJoin
          .nearestNeighbor(pts, "id", "x", "y", radius = 2000L)
          .orderBy("id")
      },
      oracle = Some("""
        WITH p AS (
          SELECT c_custkey AS id,
                 CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 7))
                   AS BIGINT) % 100000 AS x,
                 CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 9, 7))
                   AS BIGINT) % 100000 AS y
          FROM customer),
        d AS (
          SELECT a.id, b.id AS nn,
                 (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS d2
          FROM p a JOIN p b ON a.id != b.id),
        r AS (
          SELECT id, nn, d2,
                 ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, nn) AS rk
          FROM d)
        SELECT id, nn AS nn_id, d2 AS dist2 FROM r WHERE rk = 1
        ORDER BY id""")),

    // ----------------------------------------------------------------
    // KEYED TABLE DIFF (operators.TableDiff — diffVersions' ops
    // sibling for ARBITRARY table pairs): orders vs a deterministically
    // mutated copy (md5 bucket '0' removed, bucket '1' price-doubled,
    // bucket '2' re-keyed into fresh adds) classified per key as
    // added/removed/changed/unchanged through ONE full-outer equi-join
    // with a null-safe struct compare. Output: per-status count + key
    // checksum; the oracle re-derives the mutation and the
    // classification from scratch.
    "q219_table_diff" -> Q(
      run = (s, dir) => {
        val before = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val b = substring(md5(col("o_orderkey").cast(StringType)), 1, 1)
        val after = before.filter(b =!= "0")
          .withColumn("o_totalprice",
            when(b === "1", col("o_totalprice") * 2)
              .otherwise(col("o_totalprice")))
          .unionByName(before.filter(b === "2")
            .withColumn("o_orderkey", col("o_orderkey") + 10000000L))
        graft.operators.TableDiff.keyed(before, after, Seq("o_orderkey"))
          .groupBy(col("status"))
          .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
          .orderBy("status")
      },
      oracle = Some("""
        WITH before AS (
          SELECT o_orderkey AS k,
                 substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) AS b
          FROM orders),
        statuses AS (
          SELECT k, CASE WHEN b = '0' THEN 'removed'
                         WHEN b = '1' THEN 'changed'
                         ELSE 'unchanged' END AS status
          FROM before
          UNION ALL
          SELECT k + 10000000, 'added' FROM before WHERE b = '2')
        SELECT status, COUNT(*) AS n,
               CAST(SUM(k) AS BIGINT) AS key_sum
        FROM statuses GROUP BY status ORDER BY status""")),

    // ----------------------------------------------------------------
    // MASKED RELEASE (Privacy.maskHash/maskPartial — the
    // pseudonymization stage completing the governance family: q92
    // redacts patterns, q208 suppresses rare groups, this tokenizes
    // identifiers): keys become salted SHA-256 pseudonyms (stable →
    // joinable across releases sharing the salt, irreversible without
    // it) and names keep only their last 3 characters. Both masks are
    // deterministic map-local expressions, so the release hash-checks
    // against DuckDB's own sha256/repeat.
    "q218_masked_release" -> Q(
      run = (s, dir) =>
        t(s, dir, "customer")
          .filter(col("c_custkey") % 10 === 0)
          .select(
            graft.operators.Privacy.maskHash(col("c_custkey"), "s4lt")
              .as("cust_token"),
            graft.operators.Privacy.maskPartial(col("c_name"), 3)
              .as("name_masked"),
            col("c_mktsegment"))
          .orderBy("cust_token"),
      oracle = Some("""
        SELECT sha256('s4lt' || CAST(c_custkey AS VARCHAR)) AS cust_token,
               CASE WHEN length(c_name) <= 3 THEN c_name
                    ELSE repeat('*', length(c_name) - 3)
                         || substr(c_name, -3, 3) END AS name_masked,
               c_mktsegment
        FROM customer WHERE c_custkey % 10 = 0
        ORDER BY cust_token""")),

    // ----------------------------------------------------------------
    // Rank-window completeness (the analytic members q35 doesn't
    // carry): percent_rank, cume_dist, first/last/nth value over the
    // standard frame. The ordering key is made unique (totalprice,
    // orderkey) so every rank-derived double is the same exact
    // rational in both engines; emitted at 6 dp.
    "q216_rank_windows" -> Q(
      run = (s, dir) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        val wf = w.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
        t(s, dir, "orders")
          .select(col("o_orderstatus"), col("o_orderkey"),
            round(percent_rank().over(w), 6).as("pr"),
            round(cume_dist().over(w), 6).as("cd"),
            first(col("o_orderkey")).over(wf).as("first_key"),
            last(col("o_orderkey")).over(wf).as("last_key"),
            nth_value(col("o_orderkey"), 3).over(wf).as("third_key"))
          .filter(col("o_orderkey") % 31 === 0)
          .orderBy("o_orderstatus", "o_orderkey")
      },
      oracle = Some("""
        SELECT o_orderstatus, o_orderkey,
               ROUND(percent_rank() OVER w, 6) AS pr,
               ROUND(cume_dist() OVER w, 6) AS cd,
               first_value(o_orderkey) OVER wf AS first_key,
               last_value(o_orderkey) OVER wf AS last_key,
               nth_value(o_orderkey, 3) OVER wf AS third_key
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice, o_orderkey),
               wf AS (PARTITION BY o_orderstatus
                      ORDER BY o_totalprice, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING)
        QUALIFY o_orderkey % 31 = 0
        ORDER BY o_orderstatus, o_orderkey""")),

    // ----------------------------------------------------------------
    // NULL-SEMANTICS surface: the null-handling corners a production
    // join/aggregate hits — a NULL-SAFE equi-join (<=> / IS NOT
    // DISTINCT FROM: null keys MATCH the dim's null sentinel row
    // instead of dropping) and a GROUP BY over the nullable key (the
    // null group is a real group). Orders' custkey is deterministically
    // nulled on an md5 bucket; the dim is a key subset plus one
    // null-keyed UNKNOWN row. Catalyst plans <=> as a hash equi-join
    // (null-safe equality IS an equi-key), so the scale shape is
    // unchanged.
    "q214_null_semantics" -> Q(
      run = (s, dir) => {
        val nulled = when(
          substring(md5(col("o_orderkey").cast(StringType)), 1, 1) === "0",
          lit(null).cast(LongType)).otherwise(col("o_custkey"))
        val facts = t(s, dir, "orders")
          .select(nulled.as("k"), col("o_totalprice"))
        val dim = t(s, dir, "customer")
          .filter(col("c_custkey") % 10 === 0)
          .select(col("c_custkey").as("dk"), col("c_mktsegment").as("seg"))
          .unionByName(s.range(1).select(
            lit(null).cast(LongType).as("dk"), lit("UNKNOWN").as("seg")))
        facts.join(dim, facts("k") <=> dim("dk"))
          .groupBy(col("seg"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(DecimalType(18, 2)))
              .cast(DoubleType).as("total"))
          .orderBy("seg")
      },
      oracle = Some("""
        WITH facts AS (
          SELECT CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
                      THEN NULL ELSE o_custkey END AS k,
                 o_totalprice
          FROM orders),
        dim AS (
          SELECT c_custkey AS dk, c_mktsegment AS seg FROM customer
          WHERE c_custkey % 10 = 0
          UNION ALL SELECT NULL, 'UNKNOWN')
        SELECT seg, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM facts JOIN dim ON facts.k IS NOT DISTINCT FROM dim.dk
        GROUP BY seg ORDER BY seg""")),

    // ----------------------------------------------------------------
    // Grid k-NEAREST (GridJoin.kNearest, k=3): q205's expanding-ring
    // search generalized — a point resolves in the radius-R round iff
    // ≥ k candidates sit within R (then its true top-k all lie within
    // R and the round's ranking is exact); thinner neighborhoods
    // escalate whole. Oracle: the all-pairs window top-3.
    "q212_grid_knn" -> Q(
      run = (s, dir) => {
        val h = md5(col("c_custkey").cast(StringType))
        val pts = t(s, dir, "customer").select(
          col("c_custkey").as("id"),
          (conv(substring(h, 1, 7), 16, 10).cast(LongType) % 100000L).as("x"),
          (conv(substring(h, 9, 7), 16, 10).cast(LongType) % 100000L).as("y"))
        graft.operators.GridJoin
          .kNearest(pts, "id", "x", "y", k = 3, radius = 2000L)
          .orderBy("id", "rank")
      },
      oracle = Some("""
        WITH p AS (
          SELECT c_custkey AS id,
                 CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 7))
                   AS BIGINT) % 100000 AS x,
                 CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 9, 7))
                   AS BIGINT) % 100000 AS y
          FROM customer),
        d AS (
          SELECT a.id, b.id AS nn,
                 (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS d2
          FROM p a JOIN p b ON a.id != b.id),
        r AS (
          SELECT id, nn, d2,
                 ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, nn) AS rk
          FROM d)
        SELECT id, CAST(rk AS BIGINT) AS rank, nn AS nn_id, d2 AS dist2
        FROM r WHERE rk <= 3 ORDER BY id, rank""")),

    // ----------------------------------------------------------------
    // SCD TYPE-2 dimension history (operators.Scd2 — the Kimball
    // slowly-changing-dimension surface, completing the as-of family
    // q38/q102/q108/q120/q121 on the DIMENSION side): a 3-version
    // customer-segment change feed (versions synthesized
    // deterministically from the key so both engines re-derive them)
    // becomes [valid_from, valid_to) intervals via ONE per-key window;
    // orders then temporal-join to the segment valid at each fact's
    // timestamp through a hash EQUI-JOIN on the key with the interval
    // residual — fan-out = versions-per-key (3), never quadratic.
    "q201_scd2_temporal" -> Q(
      run = (s, dir) => {
        val cust = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
        val changes = cust
          .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
            lit(0L).as("ts"))
          .unionByName(cust.select(col("c_custkey").as("k"),
            concat(col("c_mktsegment"), lit("_B")).as("seg"),
            (col("c_custkey") % 100 + 1).as("ts")))
          .unionByName(cust.select(col("c_custkey").as("k"),
            concat(col("c_mktsegment"), lit("_C")).as("seg"),
            (col("c_custkey") % 100 + 51).as("ts")))
        val hist = graft.operators.Scd2.intervals(changes, Seq("k"), "ts")
        val facts = t(s, dir, "orders")
          .select(col("o_custkey").as("k"), (col("o_orderkey") % 150).as("t"))
        graft.operators.Scd2.temporalJoin(facts, hist, Seq("k"), "t")
          .select(hist("seg"), facts("t"))
          .groupBy(col("seg"))
          .agg(count(lit(1)).as("n"), sum(col("t")).as("sum_t"))
          .orderBy("seg")
      },
      oracle = Some("""
        WITH hist AS (
          SELECT c_custkey AS k, c_mktsegment AS seg, 0 AS ts FROM customer
          UNION ALL
          SELECT c_custkey, c_mktsegment || '_B', c_custkey % 100 + 1
          FROM customer
          UNION ALL
          SELECT c_custkey, c_mktsegment || '_C', c_custkey % 100 + 51
          FROM customer),
        iv AS (
          SELECT k, seg, ts AS valid_from,
                 LEAD(ts) OVER (PARTITION BY k ORDER BY ts) AS valid_to
          FROM hist),
        f AS (SELECT o_custkey AS k, o_orderkey % 150 AS t FROM orders)
        SELECT seg, COUNT(*) AS n, CAST(SUM(t) AS BIGINT) AS sum_t
        FROM f JOIN iv ON f.k = iv.k AND f.t >= iv.valid_from
                       AND (iv.valid_to IS NULL OR f.t < iv.valid_to)
        GROUP BY seg ORDER BY seg""")),

    // ----------------------------------------------------------------
    // CUBE grouping sets + grouping_id (completes the rollup/pivot
    // family, q28/q29). gid bit order follows Spark's grouping_id():
    // first cube column = most significant bit; the oracle reproduces
    // it as 2*GROUPING(a)+GROUPING(b). Same 2-phase hash agg as a
    // plain groupBy — CUBE expands to 4 grouping sets map-side, so the
    // shuffle carries 4x rows of a 6-key agg: still trivial at scale.
    "q46_cube" -> Q(
      run = (s, dir) =>
        t(s, dir, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
            dsum(col("l_quantity")).as("qty"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
            col("gid").cast(LongType).as("gid"), col("n"), col("qty"))
          .orderBy("gid", "l_returnflag", "l_linestatus"),
      oracle = Some("""
        SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
               COALESCE(l_linestatus, 'ALL') AS l_linestatus,
               CAST(2 * GROUPING(l_returnflag) + GROUPING(l_linestatus) AS BIGINT) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY gid, l_returnflag, l_linestatus""")),

    // ----------------------------------------------------------------
    // Correlation / covariance statistics via exact decimal moment sums.
    // Native corr()/covar_pop() accumulate doubles in partition order —
    // non-deterministic across plans and engines — so the five moments
    // are summed as DECIMAL (associative, exact, any partitioning),
    // cast to double once, and combined with the textbook formulas:
    // identical IEEE arithmetic in both engines → hash-equal output.
    // This is also the right 100 TB design: one map-side-combinable agg
    // pass, deterministic under AQE re-planning and speculative retries.
    "q47_corr_stats" -> Q(
      run = (s, dir) => {
        val x = col("l_quantity").cast(DecimalType(18, 2))
        val y = col("l_extendedprice").cast(DecimalType(18, 2))
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            sum(x).cast(DoubleType).as("sx"),
            sum(y).cast(DoubleType).as("sy"),
            sum(x * x).cast(DoubleType).as("sxx"),
            sum(y * y).cast(DoubleType).as("syy"),
            sum(x * y).cast(DoubleType).as("sxy"))
          .select(
            col("l_returnflag"),
            col("n"),
            round((col("sxy") / col("n")) - (col("sx") / col("n")) * (col("sy") / col("n")), 4)
              .as("covar_pop"),
            round(((col("sxy") / col("n")) - (col("sx") / col("n")) * (col("sy") / col("n"))) /
              (sqrt((col("sxx") / col("n")) - (col("sx") / col("n")) * (col("sx") / col("n"))) *
                sqrt((col("syy") / col("n")) - (col("sy") / col("n")) * (col("sy") / col("n")))), 6)
              .as("corr"))
          .orderBy("l_returnflag")
      },
      oracle = Some("""
        WITH m AS (
          SELECT l_returnflag, COUNT(*) AS n,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, n,
               ROUND((sxy / n) - (sx / n) * (sy / n), 4) AS covar_pop,
               ROUND(((sxy / n) - (sx / n) * (sy / n)) /
                     (sqrt((sxx / n) - (sx / n) * (sx / n)) *
                      sqrt((syy / n) - (sy / n) * (sy / n))), 6) AS corr
        FROM m ORDER BY l_returnflag""")),

    // ----------------------------------------------------------------
    // Deterministic stratified hash sampling — the training-data
    // pipeline primitive (down-sample over-represented strata without a
    // seed handshake between engines/runs). Membership is a pure
    // function of the key: first two hex chars of md5(key) under a
    // per-stratum threshold (256ths: URGENT 50%, HIGH 25%, rest 6.25%).
    // Scale: embarrassingly parallel scan-side filter — no shuffle, no
    // RNG state, reproducible on any cluster layout, and pushes the
    // stratum column read down to the parquet scan.
    "q48_hash_sample" -> Q(
      run = (s, dir) =>
        t(s, dir, "orders")
          .filter(
            substring(md5(col("o_orderkey").cast(StringType)), 1, 2) <
              when(col("o_orderpriority").startsWith("1"), lit("80"))
                .when(col("o_orderpriority").startsWith("2"), lit("40"))
                .otherwise(lit("10")))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_sampled"), dsum(col("o_totalprice")).as("rev_sampled"))
          .orderBy("o_orderpriority"),
      oracle = Some("""
        SELECT o_orderpriority, COUNT(*) AS n_sampled,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev_sampled
        FROM orders
        WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) <
              CASE WHEN o_orderpriority LIKE '1%' THEN '80'
                   WHEN o_orderpriority LIKE '2%' THEN '40'
                   ELSE '10' END
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ----------------------------------------------------------------
    // Changelog compaction: latest row per key (the batch form of
    // upsert/SCD "current view" — the reference's append-only silver
    // protocol compacted to one row per entity). row_number over a
    // per-key descending window; the window partitions on the key, so
    // the only shuffle is the hash partition by user_id — at 100 TB
    // this is the standard log-compaction shape (same key partitioning
    // a MERGE would use).
    "q49_changelog_latest" -> Q(
      run = (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        t(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
            col("event_type").as("last_type"), col("value").as("last_value"))
          .orderBy("user_id")
      },
      oracle = Some("""
        SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
               event_type AS last_type, value AS last_value
        FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) = 1
        ORDER BY user_id""")),

    // ----------------------------------------------------------------
    // Flagship multi-join analytical query (TPC-H Q5 shape): 6-table
    // star join with a cross-table predicate (customer and supplier in
    // the same nation) and a region filter. The intended 100 TB plan:
    // region+nation broadcast (the r_name filter prunes BEFORE the
    // broadcast), customer⋈orders⋈lineitem⋈supplier as shuffle joins on
    // their natural keys with AQE sizing; revenue in exact decimal.
    "q67_star_join" -> Q(
      run = (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        val su = t(s, dir, "supplier")
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        val revenue = col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 4)) - col("l_discount").cast(DecimalType(18, 4)))
        c.join(o, col("c_custkey") === col("o_custkey"))
          .join(l, col("o_orderkey") === col("l_orderkey"))
          .join(su, col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r.filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_items"),
            sum(revenue).cast(DoubleType).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      oracle = Some("""
        SELECT n_name, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name""")),

    // ----------------------------------------------------------------
    // Salted skew join: lineitem⋈supplier with the big side salted over
    // 8 sub-keys and the small side replicated 8× (the single-monster-
    // key fix AQE's partition splitting can't do). The oracle is the
    // PLAIN join — salting must be result-invariant by construction.
    "q68_salted_join" -> Q(
      run = (s, dir) =>
        graft.operators.SkewJoin.saltedInnerJoin(
          t(s, dir, "lineitem").select(col("l_suppkey"), col("l_extendedprice")),
          t(s, dir, "supplier").select(col("s_suppkey").as("l_suppkey"),
            col("s_nationkey")),
          keys = Seq("l_suppkey"), salts = 8)
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("price_sum"))
          .orderBy("s_nationkey"),
      oracle = Some("""
        SELECT s_nationkey, COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey ORDER BY s_nationkey""")),

    // ----------------------------------------------------------------
    // RANGE-frame rolling window (the frame class the reference never
    // uses — SURVEY §2.5 "defaults only"): per-customer trailing-30-day
    // order revenue, frame bounded by VALUE (days), not row count.
    // Partitioned by customer → parallel; exact decimal running sums.
    "q69_rolling_window" -> Q(
      run = (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("od_days"))
          .rangeBetween(-30, 0)
        t(s, dir, "orders")
          .withColumn("od_days",
            datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast(DateType))
              .cast(LongType))
          .withColumn("rev30",
            sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
              .cast(DoubleType))
          .select(col("o_custkey"), col("o_orderkey"),
            to_date(col("o_orderdate")).as("od"), col("rev30"))
          .orderBy("o_custkey", "od", "o_orderkey")
      },
      oracle = Some("""
        SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
                 RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
                 AS DOUBLE) AS rev30
        FROM orders
        ORDER BY o_custkey, od, o_orderkey""")),

    // ----------------------------------------------------------------
    // Fuzzy-match join (entity resolution): nearest customer name per
    // supplier by Levenshtein distance through the ADAPTIVE block
    // (graft.operators.FuzzyJoin): a dim-sized probe of the hot block
    // picks single-level (small blocks — the sf regime, where the
    // banded pass's extra shuffle costs more than it saves) or the
    // TWO-LEVEL nation × string-length band (exact by the
    // lev ≥ |len diff| bound with a full-block fallback), Σ block² →
    // Σ (block, length-bucket)² — the dial that survives a hot block
    // at 100× (FuzzyJoinSpec pins row-identity across the switch; the
    // `fuzzy` ScaleProbe measures the candidate cut and the ~4k-row
    // crossover). Oracle unchanged from the single-level formulation.
    "q72_fuzzy_join" -> Q(
      run = (s, dir) => {
        val sup = t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"),
            col("s_nationkey").as("nk"))
        val cust = t(s, dir, "customer")
          .select(col("c_name"), col("c_nationkey").as("nk"))
        graft.operators.FuzzyJoin.bestMatchAdaptive(
          sup, cust, "s_suppkey", "s_name", "c_name", "nk", band = 4)
          .orderBy("s_suppkey")
      },
      oracle = Some("""
        SELECT s_suppkey, s_name, c_name AS best_match,
               CAST(levenshtein(s_name, c_name) AS BIGINT) AS lev
        FROM supplier JOIN customer ON s_nationkey = c_nationkey
        QUALIFY row_number() OVER (PARTITION BY s_suppkey
          ORDER BY levenshtein(s_name, c_name), c_name) = 1
        ORDER BY s_suppkey""")),

    // ----------------------------------------------------------------
    // Typed COGROUP (KeyValueGroupedDataset.cogroup): merge two fact
    // streams per key in ONE pass — each side shuffles once on the key
    // and the function sees both groups together, where the join
    // formulation would aggregate each side separately and join the
    // results. The oracle IS that join formulation: equality across
    // the two strategies is the check.
    "q76_cogroup_stats" -> Q(
      run = (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
          .select(col("user_id"), col("ts"))
          .as[(Long, java.sql.Timestamp)]
        val ord = t(s, dir, "orders")
          .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"))
          .as[(Long, java.sql.Date)]
        ev.groupByKey(_._1).cogroup(ord.groupByKey(_._1)) { (k, evs, ords) =>
          // built per group: DateTimeFormatter is not Serializable
          val fmt = java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
          var n = 0L
          var first: java.sql.Timestamp = null
          evs.foreach { e =>
            n += 1; if (first == null || e._2.before(first)) first = e._2
          }
          var m = 0L
          var last: java.sql.Date = null
          ords.foreach { o =>
            m += 1; if (last == null || o._2.after(last)) last = o._2
          }
          Iterator.single((k, n, m,
            Option(first).map(ts => fmt.format(ts.toInstant)).orNull,
            Option(last).map(_.toString).orNull))
        }.toDF("user_id", "n_events", "n_orders", "first_event", "last_order")
          .orderBy("user_id")
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id AS k, COUNT(*) AS n_events,
                 strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_event
          FROM events GROUP BY 1),
        o AS (
          SELECT o_custkey AS k, COUNT(*) AS n_orders,
                 CAST(MAX(CAST(o_orderdate AS DATE)) AS VARCHAR) AS last_order
          FROM orders GROUP BY 1)
        SELECT COALESCE(e.k, o.k) AS user_id,
               COALESCE(n_events, 0) AS n_events,
               COALESCE(n_orders, 0) AS n_orders,
               first_event, last_order
        FROM e FULL OUTER JOIN o ON e.k = o.k
        ORDER BY user_id""")),

    // ----------------------------------------------------------------
    // Mergeable HLL sketches (DataSketches, Spark 3.5+): the
    // pre-aggregation primitive for incremental analytics at 100 TB —
    // build per-partition-of-the-data sketches ONCE (map-side
    // combinable binary agg), then answer any rollup by merging
    // sketches, never rescanning rows. Here: per-lang distinct-doc
    // sketches + the global count from hll_union_agg over the five
    // sketches. Sketch bytes aren't reproducible in DuckDB, so the
    // estimates can't hash-check — CERTIFIED instead: exact per-lang +
    // global distinct counts anchor the hash; every estimate (per-lang
    // AND the sketch-merged global) folds into one within-tolerance
    // flag (measured rel err 0.000 at the gate SF — DataSketches HLL
    // is exact at these cardinalities — bound 0.05). ExtendedOpsSpec
    // keeps merge-consistency.
    "q89_hll_mergeable" -> Q(
      run = (s, dir) => {
        val docs = t(s, dir, "documents")
        val perLang = docs
          .groupBy(col("lang"))
          .agg(hll_sketch_agg(col("doc_id")).as("sk"),
            countDistinct(col("doc_id")).as("n_exact"))
        val per = perLang.select(col("lang"),
          hll_sketch_estimate(col("sk")).as("n_est"), col("n_exact"))
        val global = perLang
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n_est"))
          .crossJoin(broadcast(
            docs.agg(countDistinct(col("doc_id")).as("n_exact"))))
          .select(lit("ALL").as("lang"), col("n_est"), col("n_exact"))
        val all = per.unionByName(global)
        graft.operators.Certify.attach(
          all.select(col("lang"), col("n_exact")),
          graft.operators.Certify.allRowsFlag(all,
            abs(col("n_est") - col("n_exact"))
              .cast(org.apache.spark.sql.types.DoubleType) /
              col("n_exact") <= 0.05,
            "within_tol"))
          .orderBy("lang")
      },
      oracle = Some("""
        SELECT lang, COUNT(DISTINCT doc_id) AS n_exact,
               CAST(1 AS BIGINT) AS within_tol
        FROM documents GROUP BY lang
        UNION ALL
        SELECT 'ALL' AS lang, COUNT(DISTINCT doc_id) AS n_exact,
               CAST(1 AS BIGINT) AS within_tol
        FROM documents
        ORDER BY lang""")),

    // Gap-based sessionization (batch form of q54's streaming
    // sessionize): a 6-hour silence starts a new session; session ids
    // are a running sum of session-start flags per user. One shuffle on
    // user_id drives both windows and the final per-session aggregate.
    // Times emitted as epoch-µs BIGINTs (the timestamp-output
    // convention).
    "q136_sessionize" -> Q(
      run = (s, dir) => {
        val gap = 6L * 3600 * 1000000
        val ev = t(s, dir, "events")
          .select(col("user_id"), expr("unix_micros(ts)").as("us"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        val prev = lag(col("us"), 1).over(w)
        ev.withColumn("__new",
            when(prev.isNull || col("us") - prev > gap, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("__new")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("us")).as("start_us"),
            (max(col("us")) - min(col("us"))).as("duration_us"))
          .orderBy("user_id", "session_id")
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        s AS (SELECT user_id, us,
                CASE WHEN LAG(us) OVER (PARTITION BY user_id ORDER BY us)
                          IS NULL
                     OR us - LAG(us) OVER (PARTITION BY user_id ORDER BY us)
                          > 21600000000
                     THEN 1 ELSE 0 END AS n
              FROM e),
        g AS (SELECT user_id, us,
                SUM(n) OVER (PARTITION BY user_id ORDER BY us
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              FROM s)
        SELECT user_id, CAST(sid AS BIGINT) AS session_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MIN(us) AS BIGINT) AS start_us,
               CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us
        FROM g GROUP BY 1, 2 ORDER BY user_id, session_id""")),

    // ----------------------------------------------------------------
    // SESSION_WINDOW TVF (the built-in gap-session surface — q136
    // derives sessions manually with lag+cumsum, q54 statefully with
    // flatMapGroupsWithState; this is Spark's native third way, and
    // the three must agree). Boundary nuance the oracle mirrors:
    // session_window is end-EXCLUSIVE — an event exactly gap after
    // its predecessor starts a NEW session (diff >= gap), while
    // q136's manual rule splits only on diff > gap.
    "q221_session_window" -> Q(
      run = (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), col("ts"), expr("unix_micros(ts)").as("us"))
        ev.groupBy(col("user_id"), session_window(col("ts"), "6 hours"))
          .agg(count(lit(1)).as("n_events"),
            min(col("us")).as("start_us"),
            (max(col("us")) - min(col("us"))).as("duration_us"))
          .withColumn("session_id", row_number().over(
            Window.partitionBy(col("user_id")).orderBy(col("start_us")))
            .cast(LongType))
          .select(col("user_id"), col("session_id"), col("n_events"),
            col("start_us"), col("duration_us"))
          .orderBy("user_id", "session_id")
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        s AS (SELECT user_id, us,
                CASE WHEN LAG(us) OVER (PARTITION BY user_id ORDER BY us)
                          IS NULL
                     OR us - LAG(us) OVER (PARTITION BY user_id ORDER BY us)
                          >= 21600000000
                     THEN 1 ELSE 0 END AS n
              FROM e),
        g AS (SELECT user_id, us,
                SUM(n) OVER (PARTITION BY user_id ORDER BY us
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              FROM s)
        SELECT user_id, CAST(sid AS BIGINT) AS session_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MIN(us) AS BIGINT) AS start_us,
               CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us
        FROM g GROUP BY 1, 2 ORDER BY user_id, session_id""")),

    // Ordered conversion funnel: first view → first click AFTER it →
    // first purchase after THAT — strictly ordered timestamps per user,
    // not mere co-occurrence. Per-stage min-aggregates + broadcast-able
    // user-level joins; no window over the full event stream.
    "q137_funnel" -> Q(
      run = (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            expr("unix_micros(ts)").as("us"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
        val c = ev.filter(col("event_type") === "click").as("e")
          .join(v, Seq("user_id")).filter(col("us") > col("t1"))
          .groupBy(col("user_id")).agg(min(col("us")).as("t2"))
        val p = ev.filter(col("event_type") === "purchase").as("e")
          .join(c, Seq("user_id")).filter(col("us") > col("t2"))
          .groupBy(col("user_id")).agg(min(col("us")).as("t3"))
        val stages = Seq(("1_view", v), ("2_click", c), ("3_purchase", p))
          .map { case (n, df) =>
            df.agg(count(lit(1)).as("users")).select(lit(n).as("stage"),
              col("users"))
          }
        stages.reduce(_ unionByName _).orderBy("stage")
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        v AS (SELECT user_id, MIN(us) AS t1 FROM e
              WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT e.user_id, MIN(us) AS t2 FROM e JOIN v USING (user_id)
              WHERE event_type = 'click' AND us > t1 GROUP BY 1),
        p AS (SELECT e.user_id, MIN(us) AS t3 FROM e JOIN c USING (user_id)
              WHERE event_type = 'purchase' AND us > t2 GROUP BY 1)
        SELECT stage, users FROM (
          SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS users FROM v
          UNION ALL
          SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM c
          UNION ALL
          SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM p)
        ORDER BY stage""")),

    // Retention cohort grid: users cohorted by first-event week, one
    // row per (cohort_week, week_offset) with distinct active users —
    // the dashboard staple. Two aggregates on user_id + one distinct;
    // week ids are epoch-µs floor-divisions so both engines bucket
    // identically.
    "q138_retention" -> Q(
      run = (s, dir) => {
        val wk = 604800000000L
        val ev = t(s, dir, "events")
          .select(col("user_id"), expr("unix_micros(ts)").as("us"))
        val first = ev.groupBy(col("user_id"))
          .agg(min(col("us")).as("f"))
          .select(col("user_id"), expr(s"f div $wk").as("cohort_week"))
        val active = ev
          .select(col("user_id"), expr(s"us div $wk").as("w"))
          .distinct()
        active.join(first, Seq("user_id"))
          .groupBy(col("cohort_week"),
            (col("w") - col("cohort_week")).as("week_offset"))
          .agg(countDistinct(col("user_id")).as("active_users"))
          .orderBy("cohort_week", "week_offset")
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        f AS (SELECT user_id, MIN(us) // 604800000000 AS cohort_week
              FROM e GROUP BY 1),
        a AS (SELECT DISTINCT user_id, us // 604800000000 AS w FROM e)
        SELECT cohort_week, w - cohort_week AS week_offset,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
        FROM a JOIN f USING (user_id)
        GROUP BY 1, 2 ORDER BY cohort_week, week_offset""")),

    // Count-Min sketch: point-frequency estimation as the fourth
    // mergeable sketch next to KLL/FreqItems/HLL — one depth×width
    // counter table over the token stream (map-side combinable; merge
    // is elementwise addition, so partials persist and roll up with
    // plain built-ins, bit-identical to the single pass — spec-pinned).
    // The query reports the 10 highest exact-count tokens with their
    // CMS estimates and overcounts at a deliberately narrow width so
    // collisions are visible. Murmur-seeded buckets aren't
    // reproducible in DuckDB, so the estimates can't hash-check —
    // CERTIFIED instead: the top-10 exact counts anchor the hash and
    // the CMS estimates fold into one bounds flag asserting the
    // one-sided error (est ≥ exact always; overcount ≤ 2·N/width —
    // 2× the expected per-row collision mass, min over 4 rows sits
    // well under it). CountMinSpec keeps partition invariance and the
    // merge path.
    "q146_countmin" -> Q(
      run = (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("term"))
          .filter(col("term") =!= "")
        val exact = toks.groupBy(col("term"))
          .agg(count(lit(1)).as("exact"))
          .orderBy(col("exact").desc, col("term")).limit(10)
        val sk = toks.agg(
          graft.operators.CountMin.sketch("term", 4, 16).as("sk"),
          count(lit(1)).as("n_total"))
        val est = exact.crossJoin(broadcast(sk))
          .select(col("term"), col("exact"),
            graft.operators.CountMin
              .estimate(col("sk"), col("term"), 4, 16).as("cms_est"),
            col("n_total"))
        graft.operators.Certify.attach(
          est.select(col("term"), col("exact")),
          graft.operators.Certify.allRowsFlag(est,
            col("cms_est") >= col("exact") &&
              (col("cms_est") - col("exact"))
                .cast(org.apache.spark.sql.types.DoubleType) <=
              col("n_total").cast(org.apache.spark.sql.types.DoubleType)
                * 2.0 / 16.0,
            "bounds_ok"))
          .orderBy(col("exact").desc, col("term"))
      },
      oracle = Some("""
        WITH toks AS (
          SELECT UNNEST(string_split(text, ' ')) AS term FROM documents),
        e AS (
          SELECT term, COUNT(*) AS exact FROM toks WHERE term <> ''
          GROUP BY term ORDER BY exact DESC, term LIMIT 10)
        SELECT term, exact, CAST(1 AS BIGINT) AS bounds_ok
        FROM e ORDER BY exact DESC, term""")),

    // INTERVAL-OVERLAP equi-join (RangeJoin.bucketedOverlapJoin — the
    // interval×interval member of the blocked-join family): concurrent
    // 30-minute event windows per user. Both sides explode to their
    // W-aligned buckets, ONE hash join on the bucket, and each pair
    // matches EXACTLY once via the later-start home-bucket rule (no
    // post-join dedup — GridJoin's rule in 1-D). W = the window
    // length, so fan-out ≤ 2 rows per interval. The user equality and
    // id ordering ride as residuals; the oracle is the NLJ this
    // rewrite replaces.
    "q235_overlap_join" -> Q(
      run = (s, dir) => {
        val w = 1800000000L // 30 min in µs
        val e = t(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            expr("unix_micros(ts)").as("lo"))
          .withColumn("hi", col("lo") + lit(w))
        val a = e.select(col("event_id").as("id_a"),
          col("user_id").as("u_a"), col("lo").as("lo_a"), col("hi").as("hi_a"))
        val b = e.select(col("event_id").as("id_b"),
          col("user_id").as("u_b"), col("lo").as("lo_b"), col("hi").as("hi_b"))
        graft.operators.RangeJoin.bucketedOverlapJoin(
          a, b, "lo_a", "hi_a", "lo_b", "hi_b", bucketWidth = w)
          .filter(col("u_a") === col("u_b") && col("id_a") < col("id_b"))
          .groupBy(col("u_a").as("user_id"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("user_id")
      },
      oracle = Some("""
        WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS lo,
                          epoch_us(ts) + 1800000000 AS hi FROM events)
        SELECT a.user_id AS user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM e a JOIN e b
          ON a.user_id = b.user_id AND a.event_id < b.event_id
         AND a.lo <= b.hi AND b.lo <= a.hi
        GROUP BY 1 ORDER BY 1""")),

    // ----------------------------------------------------------------
    // Time-series gap repair 1/2 — forward fill (LOCF): click/view
    // events carry no reading (derived NULL); each user's series fills
    // from its most recent observation. One window pass per series,
    // O(1) frame state (graft.operators.TimeSeries) — parallel across
    // users, no global sort. No arithmetic touches the carried value,
    // so the doubles hash exactly.
    "q243_forward_fill" -> Q(
      run = (s, dir) => {
        val ev = t(s, dir, "events").filter(col("user_id") < 30)
          .withColumn("reading",
            when(col("event_type").isin("click", "view"), lit(null))
              .otherwise(col("value")))
        graft.operators.TimeSeries
          .forwardFill(ev, "user_id", "ts", "event_id", "reading")
          .select(col("user_id"), col("event_id"), col("reading"),
            col("filled"))
          .orderBy("user_id", "event_id")
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN event_type IN ('click', 'view') THEN NULL
                      ELSE value END AS reading
          FROM events WHERE user_id < 30)
        SELECT user_id, event_id, reading,
               LAST_VALUE(reading IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        FROM e ORDER BY user_id, event_id""")),

    // ----------------------------------------------------------------
    // Time-series gap repair 2/2 — linear interpolation between the
    // nearest observations (edge gaps degrade to nearest-fill). The
    // value is pre-quantized to exact BIGINT micros and the
    // interpolation expression is evaluated step-for-step identically
    // by the oracle — correctly-rounded IEEE ops only (the q40
    // parity rule), no libm. Two O(1)-state window passes per series.
    "q244_interpolate" -> Q(
      run = (s, dir) => {
        val ev = t(s, dir, "events").filter(col("user_id") < 30)
          .withColumn("reading",
            when(col("event_type").isin("click", "view"), lit(null))
              .otherwise(col("value")))
        graft.operators.TimeSeries
          .interpolate(ev, "user_id", "ts", "event_id", "reading")
          .select(col("user_id"), col("event_id"),
            round(col("filled"), 6).as("filled"))
          .orderBy("user_id", "event_id")
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_us(ts) AS t,
                 CASE WHEN event_type IN ('click', 'view') THEN NULL
                      ELSE value END AS reading
          FROM events WHERE user_id < 30),
        w AS (
          SELECT user_id, event_id, t,
                 CASE WHEN reading IS NOT NULL
                      THEN CAST(round(reading * 1000000) AS BIGINT) END AS v,
                 CASE WHEN reading IS NOT NULL THEN t END AS tt
          FROM e),
        f AS (
          SELECT user_id, event_id, t, v,
                 LAST_VALUE(v IGNORE NULLS) OVER pw AS pv,
                 LAST_VALUE(tt IGNORE NULLS) OVER pw AS pt,
                 FIRST_VALUE(v IGNORE NULLS) OVER nw AS nv,
                 FIRST_VALUE(tt IGNORE NULLS) OVER nw AS nt
          FROM w
          WINDOW pw AS (PARTITION BY user_id ORDER BY t, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 nw AS (PARTITION BY user_id ORDER BY t, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        SELECT user_id, event_id,
               ROUND(CASE
                 WHEN v IS NOT NULL THEN CAST(v AS DOUBLE) / 1000000.0
                 WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                   (CAST(pv AS DOUBLE)
                     + CAST(nv - pv AS DOUBLE) * CAST(t - pt AS DOUBLE)
                       / CAST(nt - pt AS DOUBLE)) / 1000000.0
                 WHEN pv IS NOT NULL THEN CAST(pv AS DOUBLE) / 1000000.0
                 WHEN nv IS NOT NULL THEN CAST(nv AS DOUBLE) / 1000000.0
               END, 6) AS filled
        FROM f ORDER BY user_id, event_id""")),

    // ----------------------------------------------------------------
    // OHLC bar downsampling: hourly (event_type, bucket) bars with
    // first/last selected by a zero-padded unique (ts, id) order key,
    // so min_by/max_by and DuckDB arg_min/arg_max agree exactly. ONE
    // combinable hash agg — each partial carries a single (value, key)
    // pair per bar, the canonical metrics-rollup shape at fleet scale.
    "q245_ohlc_bars" -> Q(
      run = (s, dir) =>
        graft.operators.TimeSeries
          .ohlcBars(t(s, dir, "events"), "event_type", "ts", "event_id",
            "value", widthSec = 3600L)
          .orderBy("event_type", "bucket"),
      oracle = Some("""
        WITH e AS (
          SELECT event_type, epoch_us(ts) // 3600000000 AS bucket, value,
                 lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
                 lpad(CAST(event_id AS VARCHAR), 12, '0') AS ok
          FROM events)
        SELECT event_type, bucket,
               arg_min(value, ok) AS open, MAX(value) AS high,
               MIN(value) AS low, arg_max(value, ok) AS close,
               COUNT(*) AS n
        FROM e GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ----------------------------------------------------------------
    // GROUPING SETS with grouping() indicators — the general form of
    // the rollup/cube family (q28/q46): two independent 1-D marginals
    // plus the grand total in ONE pass (Spark plans a single Expand +
    // hash agg — one scan where three UNION'd GROUP BYs would scan
    // thrice). SQL-only surface in Spark → executed via spark.sql over
    // the registered views (the q210 serving pattern).
    "q255_grouping_sets" -> Q(
      run = (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT o_orderstatus, o_orderpriority,
                 CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
                 CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
                 COUNT(*) AS n,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total
          FROM orders
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""")
      },
      oracle = Some("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""")),

    // ----------------------------------------------------------------
    // Join-key SKEW DIAGNOSIS report — the operational audit behind
    // the salting dial (q68): one combinable key-count aggregation,
    // then a 1-row profile of the count distribution (max / mean /
    // interpolated percentiles / max-over-mean skew factor in exact
    // ppm). At 100 TB this report is what decides whether a join key
    // needs salting BEFORE the job burns a day discovering it; cost is
    // one histogram pass, never a sort of the fact table.
    "q257_skew_report" -> Q(
      run = (s, dir) => {
        val cnt = t(s, dir, "lineitem")
          .groupBy(col("l_suppkey")).agg(count(lit(1)).as("c"))
        cnt.agg(
            count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
            max(col("c")).as("max_c"),
            expr("percentile(c, 0.5D)").as("p50"),
            expr("percentile(c, 0.9D)").as("p90"),
            expr("percentile(c, 0.99D)").as("p99"))
          .select(col("n_keys"), col("n_rows"), col("max_c"),
            expr("n_rows * 1000000 div n_keys").as("mean_ppm"),
            expr("max_c * n_keys * 1000000 div n_rows").as("skew_ppm"),
            col("p50"), col("p90"), col("p99"))
      },
      oracle = Some("""
        WITH h AS (SELECT l_suppkey, COUNT(*) AS c FROM lineitem GROUP BY 1)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(c) AS BIGINT) AS n_rows,
               CAST(MAX(c) AS BIGINT) AS max_c,
               CAST(SUM(c) * 1000000 // COUNT(*) AS BIGINT) AS mean_ppm,
               CAST(MAX(c) * COUNT(*) * 1000000 // SUM(c) AS BIGINT)
                 AS skew_ppm,
               quantile_cont(c, 0.5) AS p50,
               quantile_cont(c, 0.9) AS p90,
               quantile_cont(c, 0.99) AS p99
        FROM h""")),

    // ----------------------------------------------------------------
    // Exact JOIN-SIZE audit from key histograms: |A ⋈ B on k| =
    // Σ_k cntA(k)·cntB(k) — answered from two cheap combinable
    // aggregations + one histogram-sized equi-join, WITHOUT running
    // the join. At 100 TB this is how you find out the fact-fact join
    // you're about to launch explodes 40× before you shuffle a byte
    // (the q257 skew report's companion). The size_verified flag runs
    // the real join at gate scale and pins the prediction exact.
    "q263_join_size" -> Q(
      run = (s, dir) => {
        val ho = t(s, dir, "orders")
          .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("ca"))
        val hc = t(s, dir, "customer")
          .groupBy(col("c_custkey").as("k")).agg(count(lit(1)).as("cb"))
        val predicted = ho.join(hc, "k")
          .agg(sum(col("ca") * col("cb")).as("predicted"),
            count(lit(1)).as("matched_keys"))
        val actual = t(s, dir, "orders").join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey")).count()
        predicted.select(col("predicted"), col("matched_keys"),
          (col("predicted") === actual).cast("long").as("size_verified"))
      },
      oracle = Some("""
        WITH ho AS (SELECT o_custkey AS k, COUNT(*) AS ca
                    FROM orders GROUP BY 1),
        hc AS (SELECT c_custkey AS k, COUNT(*) AS cb
               FROM customer GROUP BY 1)
        SELECT CAST(SUM(ca * cb) AS BIGINT) AS predicted,
               CAST(COUNT(*) AS BIGINT) AS matched_keys,
               CAST(1 AS BIGINT) AS size_verified
        FROM ho JOIN hc USING (k)""")),

    // ----------------------------------------------------------------
    // ANALYZE TABLE column statistics (Lake.analyzeReport): null count
    // + exact NDV per column, melted to one row per column in ONE
    // aggregation pass — the catalog-stats collection a cost-based
    // planner / data contract / q263 join-size audit feeds on. Exact
    // NDV here; approx_count_distinct is the documented fleet-scale
    // swap (q34's pattern).
    "q272_analyze_table" -> Q(
      run = (s, dir) =>
        graft.sources.Lake.analyzeReport(t(s, dir, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
          .orderBy("column"),
      oracle = Some("""
        SELECT 'o_orderkey' AS "column", COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS ndv FROM orders
        UNION ALL
        SELECT 'o_custkey', COUNT(*),
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT),
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders
        UNION ALL
        SELECT 'o_orderstatus', COUNT(*),
               CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT),
               CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) FROM orders
        UNION ALL
        SELECT 'o_orderpriority', COUNT(*),
               CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT),
               CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) FROM orders
        ORDER BY "column""""),
      bench = false),

    // ----------------------------------------------------------------
    // Functional-dependency discovery: A→B holds iff |distinct A| =
    // |distinct (A,B)| — two combinable distinct-counts per candidate,
    // no joins. Schema archaeology for undocumented data (which
    // columns are denormalized copies, which "keys" actually
    // determine attributes) before trusting a merge key.
    "q273_fd_check" -> Q(
      run = (s, dir) => {
        def fd(df: DataFrame, name: String, a: String, b: String) =
          df.agg(countDistinct(col(a)).as("lhs_card"),
            countDistinct(col(a), col(b)).as("pair_card"))
            .select(lit(name).as("fd"), col("lhs_card"), col("pair_card"),
              (col("lhs_card") === col("pair_card")).cast("long").as("holds"))
        fd(t(s, dir, "nation"), "nationkey->regionkey",
            "n_nationkey", "n_regionkey")
          .unionByName(fd(t(s, dir, "customer"), "custkey->mktsegment",
            "c_custkey", "c_mktsegment"))
          .unionByName(fd(t(s, dir, "customer"), "nationkey->mktsegment",
            "c_nationkey", "c_mktsegment"))
          .unionByName(fd(t(s, dir, "orders"), "custkey->orderpriority",
            "o_custkey", "o_orderpriority"))
          .orderBy("fd")
      },
      oracle = Some("""
        SELECT 'nationkey->regionkey' AS fd,
               CAST(COUNT(DISTINCT n_nationkey) AS BIGINT) AS lhs_card,
               CAST(COUNT(DISTINCT (n_nationkey, n_regionkey)) AS BIGINT)
                 AS pair_card,
               CAST(CASE WHEN COUNT(DISTINCT n_nationkey) =
                 COUNT(DISTINCT (n_nationkey, n_regionkey))
                 THEN 1 ELSE 0 END AS BIGINT) AS holds
        FROM nation
        UNION ALL
        SELECT 'custkey->mktsegment',
               CAST(COUNT(DISTINCT c_custkey) AS BIGINT),
               CAST(COUNT(DISTINCT (c_custkey, c_mktsegment)) AS BIGINT),
               CAST(CASE WHEN COUNT(DISTINCT c_custkey) =
                 COUNT(DISTINCT (c_custkey, c_mktsegment))
                 THEN 1 ELSE 0 END AS BIGINT)
        FROM customer
        UNION ALL
        SELECT 'nationkey->mktsegment',
               CAST(COUNT(DISTINCT c_nationkey) AS BIGINT),
               CAST(COUNT(DISTINCT (c_nationkey, c_mktsegment)) AS BIGINT),
               CAST(CASE WHEN COUNT(DISTINCT c_nationkey) =
                 COUNT(DISTINCT (c_nationkey, c_mktsegment))
                 THEN 1 ELSE 0 END AS BIGINT)
        FROM customer
        UNION ALL
        SELECT 'custkey->orderpriority',
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
               CAST(COUNT(DISTINCT (o_custkey, o_orderpriority)) AS BIGINT),
               CAST(CASE WHEN COUNT(DISTINCT o_custkey) =
                 COUNT(DISTINCT (o_custkey, o_orderpriority))
                 THEN 1 ELSE 0 END AS BIGINT)
        FROM orders
        ORDER BY fd"""),
      bench = false),

    // ----------------------------------------------------------------
    // Referential-integrity audit: orphan counts per FK edge via anti
    // joins — two real edges (clean) and one PLANTED break (customer
    // restricted to even keys) proving the detector fires. The
    // pre-merge data contract for a star schema.
    "q274_ri_audit" -> Q(
      run = (s, dir) => {
        def ri(name: String, child: DataFrame, fk: String,
               parent: DataFrame, pk: String) = {
          val orphans = child.join(parent.select(col(pk)),
            child(fk) === col(pk), "left_anti")
          child.agg(count(lit(1)).as("n_child"))
            .crossJoin(broadcast(orphans.agg(count(lit(1)).as("n_orphans"))))
            .select(lit(name).as("fk_edge"), col("n_child"),
              col("n_orphans"),
              (col("n_orphans") === 0L).cast("long").as("holds"))
        }
        val evenCustomers = t(s, dir, "customer")
          .filter(col("c_custkey") % 2 === 0)
        ri("orders.custkey->customer", t(s, dir, "orders"), "o_custkey",
            t(s, dir, "customer"), "c_custkey")
          .unionByName(ri("lineitem.orderkey->orders",
            t(s, dir, "lineitem"), "l_orderkey",
            t(s, dir, "orders"), "o_orderkey"))
          .unionByName(ri("orders.custkey->even_customers(planted)",
            t(s, dir, "orders"), "o_custkey",
            evenCustomers, "c_custkey"))
          .orderBy("fk_edge")
      },
      oracle = Some("""
        SELECT 'orders.custkey->customer' AS fk_edge,
               (SELECT COUNT(*) FROM orders) AS n_child,
               (SELECT COUNT(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey)) AS n_orphans,
               CAST(CASE WHEN (SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                   WHERE c.c_custkey = o.o_custkey)) = 0
                 THEN 1 ELSE 0 END AS BIGINT) AS holds
        UNION ALL
        SELECT 'lineitem.orderkey->orders',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_orderkey = l.l_orderkey)),
               CAST(CASE WHEN (SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                   WHERE o.o_orderkey = l.l_orderkey)) = 0
                 THEN 1 ELSE 0 END AS BIGINT)
        UNION ALL
        SELECT 'orders.custkey->even_customers(planted)',
               (SELECT COUNT(*) FROM orders),
               (SELECT COUNT(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey AND c.c_custkey % 2 = 0)),
               CAST(CASE WHEN (SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                   WHERE c.c_custkey = o.o_custkey AND c.c_custkey % 2 = 0))
                 = 0 THEN 1 ELSE 0 END AS BIGINT)
        ORDER BY fk_edge"""),
      bench = false),

    // ----------------------------------------------------------------
    // First-order Markov transition matrix over per-user event
    // sequences: (current, next) counts via one per-user lead window +
    // one hash agg, probabilities as exact ppm of each row's outgoing
    // mass — the behavioral-model substrate (next-event prediction,
    // anomaly scoring on rare transitions).
    "q275_markov_transitions" -> Q(
      run = (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val trans = t(s, dir, "events")
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("cur"), col("next_type").as("nxt"))
          .agg(count(lit(1)).as("n"))
        val outMass = trans.groupBy(col("cur")).agg(sum(col("n")).as("tot"))
        trans.join(outMass, "cur")
          .select(col("cur"), col("nxt"), col("n"),
            expr("n * 1000000 div tot").as("p_ppm"))
          .orderBy("cur", "nxt")
      },
      oracle = Some("""
        WITH seq AS (
          SELECT event_type AS cur,
                 LEAD(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS nxt
          FROM events),
        trans AS (SELECT cur, nxt, COUNT(*) AS n FROM seq
                  WHERE nxt IS NOT NULL GROUP BY 1, 2),
        om AS (SELECT cur, SUM(n) AS tot FROM trans GROUP BY 1)
        SELECT cur, nxt, CAST(n AS BIGINT) AS n,
               CAST(n * 1000000 // tot AS BIGINT) AS p_ppm
        FROM trans JOIN om USING (cur)
        ORDER BY cur, nxt""")),

    // ----------------------------------------------------------------
    // Windowed event dedup: keep the FIRST event per (user, type,
    // 5-minute bucket) — the telemetry retry/double-fire suppressor
    // (a client that fires the same event twice in a window counts
    // once). One partitioned window on the composite key, keyed by
    // (ts, id) for determinism; emits the survivor census + the
    // suppressed count per type.
    "q283_window_dedup" -> Q(
      run = (s, dir) => {
        val w = Window.partitionBy(col("user_id"), col("event_type"),
            col("bucket"))
          .orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .withColumn("bucket", expr("unix_micros(ts) div 300000000"))
          .withColumn("rn", row_number().over(w))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum((col("rn") === 1).cast("long")).as("n_kept"),
            sum((col("rn") > 1).cast("long")).as("n_suppressed"))
          .orderBy("event_type")
      },
      oracle = Some("""
        WITH e AS (
          SELECT event_type,
                 ROW_NUMBER() OVER (
                   PARTITION BY user_id, event_type,
                                epoch_us(ts) // 300000000
                   ORDER BY ts, event_id) AS rn
          FROM events)
        SELECT event_type, COUNT(*) AS n_events,
               CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_kept,
               CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_suppressed
        FROM e GROUP BY 1 ORDER BY 1"""))
  )
}
