package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph-centrality operators (the rank complement to
  * `Dedup.connectedComponentsStar`'s membership propagation).
  *
  * Reference anchor: the reference pipeline's analytics layer stops at
  * component membership; weighted PageRank is the beyond-reference
  * centrality op a corpus/graph pipeline needs (TextRank keyword
  * extraction, domain authority for crawl prioritization).
  */
object Graphs {

  /** Weighted PageRank over a directed edge list `(src, dst, w)`.
    *
    * pr_0(v) = 1/N;
    * pr_{i+1}(v) = (1-d)/N + d * Σ_{(u,v) ∈ E} pr_i(u) · w(u,v) / outw(u)
    *
    * where `outw(u)` is u's total outgoing weight and N the number of
    * distinct nodes (sources ∪ destinations). Dangling nodes (no
    * out-edges) contribute no mass — the standard simplification; feed
    * a symmetrized edge list (as TextRank does) when that matters.
    *
    * Scale shape: the BSP/Pregel loop — per iteration ONE equi-join of
    * the rank vector with the (localCheckpoint'ed once) edge list on
    * `src` and ONE groupBy on `dst` (map-side combinable). Lineage is
    * truncated per round exactly like
    * `Dedup.connectedComponentsStarWithRounds` — an iterated join/agg
    * plan doubles per round otherwise. The only driver-side values are
    * the two scalars N and the fixed-point base term.
    *
    * Determinism / oracle parity: the recurrence is computed entirely
    * in FIXED-POINT INTEGER arithmetic — ranks live in 1e-8 units
    * (`pr_s`, a long), the damping factor is quantized to 2 dp and
    * applied as an integer ratio d = dNum/100, and every division is a
    * floor `div`. No floating point touches the loop, so the rank
    * vector is exactly identical across partitionings, runs, and
    * engines (an iterated floating recurrence is NOT portable: Spark
    * round()/format_string and DuckDB ROUND()/printf were measured
    * disagreeing by 1 ulp at 8 dp on this corpus). Floor division
    * leaks < 1e-8 of mass per edge per iteration — ranking-irrelevant.
    * Only the final rescale to a double (`pr = pr_s / 1e8`, one exact
    * division) leaves integer space. Requires max(pr_s · w) < 2^63,
    * i.e. edge weights below ~9e10 — far past any real corpus graph.
    *
    * Returns `(node, pr)` for all N nodes, pr in [0, 1].
    */
  def weightedPageRank(edges: DataFrame, iters: Int = 5,
                       damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val dNum = math.round(damping * 100).toInt
    require(dNum > 0 && dNum < 100,
      s"damping must be in (0.005, 0.995) (2-dp fixed point), got $damping")
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    // (src, dst, w, outw) — built once, reused every round
    val ew = edges.join(outw, Seq("src")).localCheckpoint(true)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "weightedPageRank: empty edge list")
    // (1-d)/N in 1e-8 units, floor — exact long arithmetic
    val baseS = (100L - dNum) * 100000000L / (100L * n)
    var ranks = nodes.select(col("node"), lit(100000000L / n).as("pr_s"))
      .localCheckpoint(true)
    var i = 0
    while (i < iters) {
      val contrib = ew.join(ranks, ew("src") === ranks("node"))
        .selectExpr("dst", "(pr_s * w) div outw AS c")
        .groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
      val next = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .selectExpr("node",
          s"$baseS + ($dNum * coalesce(in_mass, 0)) div 100 AS pr_s")
        .localCheckpoint(true)
      ranks.unpersist()
      ranks = next
      i += 1
    }
    ew.unpersist()
    ranks.select(col("node"), (col("pr_s") / lit(1.0e8)).as("pr"))
  }
}
