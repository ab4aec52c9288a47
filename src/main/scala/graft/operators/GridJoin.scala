package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-blocked exact radius join over 2-D integer coordinates — the
  * spatial member of the blocked-join family (SetSimJoin blocks on
  * rare prefixes, FuzzyJoin on nation × length band, RangeJoin on 1-D
  * buckets; this blocks on grid cells). A radius predicate
  * `dist(a, b) <= r` has no equi-join key, so the naive plan is the
  * quadratic cross join. The standard rewrite manufactures the key:
  * tile the plane into square cells of side exactly `r`, map the
  * build side to its home cell, explode the probe side to its 3×3
  * cell neighborhood, equi-join on the cell id, and re-check the
  * exact predicate as a residual filter.
  *
  * COMPLETE by construction: if dist(a, b) <= r then |ax-bx| <= r and
  * |ay-by| <= r, so b's home cell is within ±1 of a's in each axis —
  * always inside a's 9-cell probe set (GridJoinSpec pins equality to
  * the brute-force join on adversarial boundary fixtures). Each
  * qualifying pair is emitted EXACTLY once — b's home cell is a
  * single cell, matched by a single probe row — so no dedup pass.
  *
  * EXACT: coordinates are BIGINT (caller quantizes, e.g. micro-units)
  * and the residual compares integer squared distance — no trig, no
  * doubles, so results are bit-identical in any engine. Bound: |x|,|y|
  * must stay under ~2^31 so dx²+dy² fits a BIGINT (documented, like
  * Anomaly's).
  *
  * Scale shape: ONE hash equi-join on the cell id; probe fan-out is a
  * fixed 9 rows per point, shuffle is 9·|probe| + |build| rows, and a
  * hot cell (urban-density skew) salts like any other hot key. At
  * 100 TB the cell id doubles as the table's cluster key so the join
  * co-locates with the layout (VersionedTable z-order plays the same
  * role for scans).
  *
  * Reference anchor: beyond-reference (the reference has no spatial
  * operator; the grid-file blocking is the classic spatial-join
  * rewrite, Patel & DeWitt SIGMOD'96 partition-based spatial merge). */
object GridJoin {

  /** All (left ++ right) pairs with squared euclidean distance
    * <= radius² — inner-join semantics, exactly the cross-join result.
    * Column names must be disjoint (pre-alias as in any join). */
  def radiusJoin(left: DataFrame, lx: String, ly: String,
                 right: DataFrame, rx: String, ry: String,
                 radius: Long): DataFrame = {
    require(radius > 0, s"radius must be positive, got $radius")
    val probe = left.withColumn("__cx",
        explode(sequence(floorDiv(col(lx), radius) - 1,
          floorDiv(col(lx), radius) + 1)))
      .withColumn("__cy",
        explode(sequence(floorDiv(col(ly), radius) - 1,
          floorDiv(col(ly), radius) + 1)))
    val build = right
      .withColumn("__cx", floorDiv(col(rx), radius))
      .withColumn("__cy", floorDiv(col(ry), radius))
    val dx = col(lx) - col(rx)
    val dy = col(ly) - col(ry)
    probe.join(build, Seq("__cx", "__cy"))
      .filter(dx * dx + dy * dy <= radius * radius)
      .drop("__cx", "__cy")
  }

  /** [[radiusJoin]] with HOT-CELL SALTING — the skew dial for
    * urban-density data (the ScaleProbe `grid` hot fixture measures
    * one cell at thousands of candidates/point vs ~16 uniform): build
    * cells holding more than `hotThreshold` rows are split into
    * `salts` hash sub-buckets, and probe rows targeting a hot cell
    * replicate across the sub-buckets, so the giant cell's candidate
    * work spreads over `salts` tasks instead of one straggler. EXACT:
    * the output equals [[radiusJoin]]'s (each build row keeps exactly
    * one salt; a probe row meets every salt of a hot cell) — only the
    * shuffle distribution changes. The hot-cell frame is bounded by
    * construction (≤ |build| / hotThreshold cells) and broadcasts.
    *
    * `cellCap` is the DENSITY dial with documented SAMPLING
    * semantics: cells holding more than `cellCap` build rows are
    * deterministically thinned to `cellCap` (ranked by xxhash64 over
    * the full build row — a content hash, so the kept sample is
    * stable across runs and partitionings). Pairs whose build
    * endpoint was thinned away are ABSENT from the output; per probe
    * point the candidate volume is bounded by 9·cellCap — the "cap
    * the pathological block" trade for when the hot cell's quadratic
    * OUTPUT itself is unwanted. Leave at MaxValue for exact
    * results. */
  def radiusJoinSalted(left: DataFrame, lx: String, ly: String,
                       right: DataFrame, rx: String, ry: String,
                       radius: Long, salts: Int = 16,
                       hotThreshold: Long = 100000L,
                       cellCap: Long = Long.MaxValue): DataFrame = {
    require(radius > 0, s"radius must be positive, got $radius")
    require(salts >= 2, s"salts must be >= 2, got $salts")
    // content hash over the WHOLE build row: deterministic thinning
    // rank and salt assignment even for coordinate-colliding rows
    val rowHash = xxhash64(right.columns.map(col).toSeq: _*)
    val build0 = right
      .withColumn("__cx", floorDiv(col(rx), radius))
      .withColumn("__cy", floorDiv(col(ry), radius))
    val capped =
      if (cellCap == Long.MaxValue) build0
      else {
        // one rank pass over rows (not row-pairs) per cell — the hot
        // cell costs O(its rows log rows) here, never occupancy²
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__cx"), col("__cy"))
          .orderBy(rowHash, col(rx), col(ry))
        build0.withColumn("__rk", row_number().over(w))
          .filter(col("__rk") <= cellCap).drop("__rk")
      }
    val hot = capped.groupBy(col("__cx"), col("__cy"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotThreshold)
      .select(col("__cx"), col("__cy"), lit(1).as("__hot"))
    val build = capped
      .join(broadcast(hot), Seq("__cx", "__cy"), "left")
      .withColumn("__salt",
        when(col("__hot").isNotNull, pmod(rowHash, lit(salts.toLong)))
          .otherwise(lit(0L)))
      .drop("__hot")
    val probe = left
      .withColumn("__cx", explode(sequence(floorDiv(col(lx), radius) - 1,
        floorDiv(col(lx), radius) + 1)))
      .withColumn("__cy", explode(sequence(floorDiv(col(ly), radius) - 1,
        floorDiv(col(ly), radius) + 1)))
      .join(broadcast(hot), Seq("__cx", "__cy"), "left")
      .withColumn("__salt", explode(
        when(col("__hot").isNotNull, sequence(lit(0L), lit(salts - 1L)))
          .otherwise(sequence(lit(0L), lit(0L)))))
      .drop("__hot")
    val dx = col(lx) - col(rx)
    val dy = col(ly) - col(ry)
    probe.join(build, Seq("__cx", "__cy", "__salt"))
      .filter(dx * dx + dy * dy <= radius * radius)
      .drop("__cx", "__cy", "__salt")
  }

  /** Self-join form of [[radiusJoinSalted]] — [[selfRadiusPairs]]'s
    * output through the skew-proof (and optionally density-capped)
    * path. */
  def selfRadiusPairsSalted(points: DataFrame, idCol: String,
                            xCol: String, yCol: String, radius: Long,
                            salts: Int = 16, hotThreshold: Long = 100000L,
                            cellCap: Long = Long.MaxValue): DataFrame = {
    val l = points.select(col(idCol).as("id_a"), col(xCol).as("__ax"),
      col(yCol).as("__ay"))
    val r = points.select(col(idCol).as("id_b"), col(xCol).as("__bx"),
      col(yCol).as("__by"))
    radiusJoinSalted(l, "__ax", "__ay", r, "__bx", "__by", radius,
      salts, hotThreshold, cellCap)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        ((col("__ax") - col("__bx")) * (col("__ax") - col("__bx")) +
          (col("__ay") - col("__by")) * (col("__ay") - col("__by")))
          .as("dist2"))
  }

  /** Self-join form: unordered point pairs (id_a < id_b) within
    * `radius`, with their exact squared distance. */
  def selfRadiusPairs(points: DataFrame, idCol: String,
                      xCol: String, yCol: String,
                      radius: Long): DataFrame = {
    val l = points.select(col(idCol).as("id_a"), col(xCol).as("__ax"),
      col(yCol).as("__ay"))
    val r = points.select(col(idCol).as("id_b"), col(xCol).as("__bx"),
      col(yCol).as("__by"))
    radiusJoin(l, "__ax", "__ay", r, "__bx", "__by", radius)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        ((col("__ax") - col("__bx")) * (col("__ax") - col("__bx")) +
          (col("__ay") - col("__by")) * (col("__ay") - col("__by")))
          .as("dist2"))
  }

  /** Nearest neighbor per left point (the map-matching / snap-to-road
    * primitive) by EXPANDING-RING search: round k runs [[radiusJoin]]
    * at radius·2ᵏ over the still-unmatched points and keeps each
    * point's minimum-distance candidate. Correct because radiusJoin is
    * complete within its radius: a point matched in the radius-R round
    * has ALL its ≤R neighbors as candidates, so the round's min IS the
    * global nearest (ties to the smaller neighbor id). Points with no
    * neighbor inside radius·2^(maxRounds−1) are absent from the output
    * — size radius/maxRounds to the data's NN-distance tail (uniform
    * density: NN distances concentrate at ~√(area/n), so a handful of
    * doublings covers the tail; the last ring must stay well under the
    * plane side or its 3×3 cells degenerate to all-pairs).
    *
    * Scale shape: each round is the one-equi-join radius join on the
    * REMAINING points only (typically collapsing geometrically), with
    * a bounded driver loop like the BSP operators; per-round state is
    * localCheckpointed to truncate lineage. Output:
    * (idCol, nn_id, dist2). */
  def nearestNeighbor(points: DataFrame, idCol: String,
                      xCol: String, yCol: String, radius: Long,
                      maxRounds: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxRounds >= 1)
    val build = points.select(col(idCol).as("__rid"), col(xCol).as("__rx"),
      col(yCol).as("__ry"))
    var remaining = points.select(col(idCol), col(xCol), col(yCol))
      .localCheckpoint(true)
    var found: DataFrame = null
    var r = radius
    var round = 0
    while (round < maxRounds && !remaining.isEmpty) {
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("__d2"), col("__rid"))
      val best = radiusJoin(remaining, xCol, yCol,
        build, "__rx", "__ry", r)
        .filter(col(idCol) =!= col("__rid"))
        .withColumn("__d2",
          (col(xCol) - col("__rx")) * (col(xCol) - col("__rx")) +
            (col(yCol) - col("__ry")) * (col(yCol) - col("__ry")))
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .select(col(idCol), col("__rid").as("nn_id"), col("__d2").as("dist2"))
        .localCheckpoint(true)
      found = if (found == null) best else found.unionByName(best)
      remaining = remaining
        .join(best.select(col(idCol)), Seq(idCol), "left_anti")
        .localCheckpoint(true)
      r = r * 2
      round += 1
    }
    found
  }

  /** k-nearest generalization of [[nearestNeighbor]]: a point is
    * resolved in the radius-R round iff it has ≥ k candidates within
    * R — then its true k nearest ALL lie within R (the k-th smallest
    * candidate distance is ≤ R, and radiusJoin is complete up to R),
    * so the round's top-k is exact. A point with fewer than k
    * candidates escalates to the next ring WHOLE — emitting its
    * partial list would under-report a point that has k corpus
    * neighbors further out. Points still unresolved after the last
    * ring are absent (size radius/maxRounds to the k-NN distance
    * tail, as in [[nearestNeighbor]]).
    * Output: (idCol, rank 1..k, nn_id, dist2). */
  def kNearest(points: DataFrame, idCol: String, xCol: String,
               yCol: String, k: Int, radius: Long,
               maxRounds: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && maxRounds >= 1)
    val build = points.select(col(idCol).as("__rid"), col(xCol).as("__rx"),
      col(yCol).as("__ry"))
    var remaining = points.select(col(idCol), col(xCol), col(yCol))
      .localCheckpoint(true)
    var found: DataFrame = null
    var r = radius
    var round = 0
    while (round < maxRounds && !remaining.isEmpty) {
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("__d2"), col("__rid"))
      val cand = radiusJoin(remaining, xCol, yCol, build, "__rx", "__ry", r)
        .filter(col(idCol) =!= col("__rid"))
        .withColumn("__d2",
          (col(xCol) - col("__rx")) * (col(xCol) - col("__rx")) +
            (col(yCol) - col("__ry")) * (col(yCol) - col("__ry")))
        .withColumn("__rk", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(
          Window.partitionBy(col(idCol))))
      val best = cand.filter(col("__n") >= k && col("__rk") <= k)
        .select(col(idCol), col("__rk").cast("long").as("rank"),
          col("__rid").as("nn_id"), col("__d2").as("dist2"))
        .localCheckpoint(true)
      found = if (found == null) best else found.unionByName(best)
      remaining = remaining
        .join(best.select(col(idCol)).distinct(), Seq(idCol), "left_anti")
        .localCheckpoint(true)
      r = r * 2
      round += 1
    }
    found
  }

  /** Floor division on BIGINT columns. `div` truncates toward zero —
    * wrong for negatives (it would split a cell at the origin) — and
    * flooring a double quotient can round up at scale; subtracting the
    * positive modulus first makes the numerator an exact multiple, so
    * the division is exact integer arithmetic. */
  private def floorDiv(c: org.apache.spark.sql.Column, d: Long) =
    ((c - pmod(c, lit(d))) / d).cast("long")
}
