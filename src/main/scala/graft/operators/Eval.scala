package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Offline evaluation of the engine's own retrieval and classifier
  * operators — the judging stage every curation pipeline needs before
  * trusting a ranker (q140 BM25 / q40 ANN) or a learned filter
  * (q167 perceptron / q180 Rocchio) on 100 TB of data.
  *
  * Exactness contract: every metric is pure integer arithmetic emitted
  * at ppm scale via truncating `div` on non-negative longs — identical
  * in Spark and DuckDB (the kappa_ppm / rep_micro rule). No floats, no
  * libm: AUC and calibration work from the SCORE HISTOGRAM, never from
  * per-row ranks, which is also what makes them scale — a global
  * `rank()` window over the corpus would funnel every row through one
  * task, while the histogram is one combinable hash aggregation plus a
  * distributed prefix sum over its (score-cardinality-sized) rows.
  */
object Eval {

  /** Per-query ranked-retrieval quality: hits in the top `k`,
    * precision/recall at `k`, and MRR — each exact ppm integers.
    *
    * `ranked`: (queryCol, docCol, rankCol) system output, rank 1-based;
    * `relevant`: (queryCol, docCol) ground-truth pairs. Queries with no
    * relevant docs are dropped (metrics undefined); queries whose
    * relevant docs all missed the top-k emit zeros. Cost: one equi-join
    * of the top-k slice against the qrels + two group-aggs — all keyed
    * on the query id, no windows. */
  def retrievalMetrics(ranked: DataFrame, relevant: DataFrame,
                       queryCol: String, docCol: String, rankCol: String,
                       k: Int): DataFrame = {
    val totals = relevant.groupBy(col(queryCol))
      .agg(count(lit(1)).as("rel_total"))
    val hits = ranked.filter(col(rankCol) <= k)
      .join(relevant, Seq(queryCol, docCol)) // inner: relevant hits only
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("hits"),
        min(col(rankCol)).cast("long").as("first_rank"))
    totals.join(hits, Seq(queryCol), "left")
      .select(col(queryCol), col("rel_total"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        expr(s"coalesce(hits, 0L) * 1000000 div $k").as("p_at_k_ppm"),
        expr("coalesce(hits, 0L) * 1000000 div rel_total").as("recall_ppm"),
        coalesce(expr("1000000 div first_rank"), lit(0L)).as("mrr_ppm"))
  }

  /** Histogram of an integer score against a 0/1 label, with the
    * running total in score order attached — the shared substrate for
    * [[aucExact]] and [[calibrationBins]]. `cum` includes the current
    * score's rows; cardinality = distinct scores. Score-NULL rows are
    * EXCLUDED here (and from every consumer's totals): an unscored row
    * is unrankable — left in, the nulls would form a histogram group
    * that sorts first in the prefix-sum order and silently skew every
    * rank-derived quantity. */
  private def scoredHistogram(df: DataFrame, scoreCol: String,
                              labelCol: String): DataFrame = {
    val hist = df.filter(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol).cast("long").as("score"))
      .agg(sum(col(labelCol).cast("long")).as("pos"),
        count(lit(1)).as("tot"))
    PrefixSum.running(hist, "score", "tot", "cum")
  }

  /** Exact tie-corrected AUC (Mann–Whitney U over average ranks) as one
    * (pos, neg, auc_ppm) row. With r_lo/r_hi the min/max rank of a
    * score's tie group, Σ_pos(r_lo + r_hi) = Σ_pos(2·cum − tot + 1)
    * falls straight out of the histogram's prefix sums, and
    *
    *   auc_ppm = (S₂ − P·(P+1)) · 10⁶ div (2·P·N)
    *
    * is exact BIGINT (S₂ ≤ 2·n·P — no overflow below ~3·10⁹ rows;
    * beyond that the multiply moves to DECIMAL, the Drift d_ppm rule).
    * Degenerate one-class inputs emit auc_ppm NULL rather than a
    * division blow-up. */
  def aucExact(df: DataFrame, scoreCol: String, labelCol: String): DataFrame =
    scoredHistogram(df, scoreCol, labelCol)
      .agg(sum(col("pos")).as("p"),
        sum(col("tot") - col("pos")).as("n"),
        sum(col("pos") * (lit(2) * col("cum") - col("tot") + lit(1)))
          .as("s2"))
      .select(col("p").as("pos"), col("n").as("neg"),
        when(col("p") > 0 && col("n") > 0,
          expr("(s2 - p * (p + 1)) * 1000000 div (2 * p * n)"))
          .as("auc_ppm"))

  /** Per-group [[aucExact]] — cross-validation folds, per-language or
    * per-source audits. The histogram gains the group key and the
    * running total becomes a window PARTITIONED by group over the
    * (group × score)-cardinality histogram — parallel across groups,
    * still never a per-row rank. */
  def aucByGroup(df: DataFrame, scoreCol: String, labelCol: String,
                 groupCol: String): DataFrame = {
    val hist = df.filter(col(scoreCol).isNotNull)
      .groupBy(col(groupCol), col(scoreCol).cast("long").as("score"))
      .agg(sum(col(labelCol).cast("long")).as("pos"),
        count(lit(1)).as("tot"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("score"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    hist.withColumn("cum", sum(col("tot")).over(w))
      .groupBy(col(groupCol))
      .agg(sum(col("pos")).as("p"),
        sum(col("tot") - col("pos")).as("n"),
        sum(col("pos") * (lit(2) * col("cum") - col("tot") + lit(1)))
          .as("s2"))
      .select(col(groupCol), col("p").as("pos"), col("n").as("neg"),
        when(col("p") > 0 && col("n") > 0,
          expr("(s2 - p * (p + 1)) * 1000000 div (2 * p * n)"))
          .as("auc_ppm"))
  }

  /** Poisson-bootstrap AUC: `reps` deterministic resampling replicates
    * in ONE pass — each (row, replicate) draws an integer weight from
    * the Poisson(1) pmf via an md5 hash (thresholds 368/736/920/981
    * per mille for w = 0..4 — the standard streaming-bootstrap trick:
    * Poisson weights ≈ multinomial resampling without materializing a
    * resample), and each replicate's AUC comes from the same histogram
    * algebra as [[aucExact]] on the WEIGHTED histogram (integer
    * weights = replicated multiset, so the tie formula holds
    * unchanged). The replicate spread is the confidence interval a
    * single AUC number hides — error bars without re-running anything.
    * Cost: one (reps × score)-keyed histogram agg + per-replicate
    * windows; the corpus is scanned once. */
  def aucBootstrap(df: DataFrame, scoreCol: String, labelCol: String,
                   idCol: String, reps: Int): DataFrame = {
    val h = expr(s"cast(conv(substring(md5(concat(cast($idCol as string), " +
      s"'_', cast(rep as string))), 1, 8), 16, 10) as bigint) % 1000")
    val w = when(h < 368, 0L).when(h < 736, 1L).when(h < 920, 2L)
      .when(h < 981, 3L).otherwise(4L)
    val hist = df.filter(col(scoreCol).isNotNull)
      .withColumn("rep", explode(lit((0 until reps).toArray)))
      .withColumn("__w", w)
      .groupBy(col("rep"), col(scoreCol).cast("long").as("score"))
      .agg(sum(col("__w") * col(labelCol).cast("long")).as("pos"),
        sum(col("__w")).as("tot"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("rep")).orderBy(col("score"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    hist.withColumn("cum", sum(col("tot")).over(win))
      .groupBy(col("rep"))
      .agg(sum(col("pos")).as("p"),
        sum(col("tot") - col("pos")).as("n"),
        sum(col("pos") * (lit(2) * col("cum") - col("tot") + lit(1)))
          .as("s2"))
      .select(col("rep").cast("long").as("rep"), col("p").as("pos"),
        col("n").as("neg"),
        when(col("p") > 0 && col("n") > 0,
          expr("(s2 - p * (p + 1)) * 1000000 div (2 * p * n)"))
          .as("auc_ppm"))
  }

  /** Reliability table: rows bucketed into `bins` rank-deciles of the
    * score (ties share a bin — the bin is a pure function of the score,
    * so re-runs and engines agree), each bin reporting its size, its
    * positive rate (the "accuracy" axis), and its mean score-percentile
    * midpoint (the "confidence" axis) — all exact ppm. The per-bin
    * |acc − conf| · n_bin terms sum to the (scaled) expected
    * calibration error; emitting the table rather than one ECE scalar
    * keeps the full diagnostic. */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
                      bins: Int = 10): DataFrame = {
    val hist = scoredHistogram(df, scoreCol, labelCol)
      // n_all counts only the scored rows (the histogram's population —
      // score-NULL rows are excluded there and must not inflate bins)
      .crossJoin(broadcast(df.filter(col(scoreCol).isNotNull)
        .agg(count(lit(1)).as("n_all"))))
      // cb = rows strictly below this score; percentile midpoint of the
      // tie group = (2·cb + tot) / (2·n) — integers at ppm scale
      .withColumn("cb", col("cum") - col("tot"))
      .withColumn("bin",
        least(lit(bins - 1L), expr(s"cb * $bins div n_all")))
      .withColumn("p_mid_ppm", expr("(2 * cb + tot) * 500000 div n_all"))
    hist.groupBy(col("bin"))
      .agg(sum(col("tot")).as("n"), sum(col("pos")).as("pos"),
        sum(col("p_mid_ppm") * col("tot")).as("__cn"))
      .select(col("bin"), col("n"), col("pos"),
        expr("pos * 1000000 div n").as("acc_ppm"),
        expr("__cn div n").as("conf_ppm"))
      .withColumn("ece_term",
        abs(col("acc_ppm") - col("conf_ppm")) * col("n"))
  }
}
