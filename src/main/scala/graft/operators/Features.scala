package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Supervised feature engineering for corpus classifiers — the steps
  * between raw text/categories and a learned filter (q167 perceptron,
  * q180 Rocchio): pick the vocabulary worth a weight, and turn
  * high-cardinality categoricals into leakage-safe numeric features.
  *
  * Exactness: all integer arithmetic (truncating `div` at ppm scale on
  * non-negative values; the one signed product is squared before use).
  * χ² numerators outgrow BIGINT — they run in DECIMAL(38,0), which
  * DuckDB mirrors in HUGEINT (the q224 BigInt-spill discipline).
  */
object Features {

  /** χ² feature selection: score each token's association with a 0/1
    * document label and keep the `topK` highest-scoring tokens.
    *
    * From per-token presence counts a (pos docs with token) and
    * b (neg docs with token) against totals P/N:
    *
    *   χ²_ppm = 10⁶ · n · (a·(N−b) − b·(P−a))² div ((a+b)·(n−a−b)·P·N)
    *
    * — one distinct (doc, token) explode + one token hash-agg (both
    * combinable, the q62 df-count shape) + a 1-row totals broadcast;
    * the quadratic-looking formula is plain per-row column math on the
    * vocabulary-sized aggregate. Tokens present in EVERY document have
    * an empty complement column (n−a−b = 0) and are dropped — they
    * carry no signal and would divide by zero. Ties break to the
    * lexicographically smaller token. */
  def chi2Select(docs: DataFrame, textCol: String, idCol: String,
                 labelCol: String, topK: Int): DataFrame = {
    val pairs = docs
      .select(col(idCol), col(labelCol).cast("long").as("__y"),
        explode(split(col(textCol), " ")).as("token"))
      .distinct() // presence, not frequency — document-level counts
    val perTok = pairs.groupBy(col("token"))
      .agg(sum(col("__y")).as("a"), sum(lit(1L) - col("__y")).as("b"))
    val totals = docs.agg(
      sum(col(labelCol).cast("long")).as("p_tot"),
      sum(lit(1L) - col(labelCol).cast("long")).as("n_tot"))
    perTok.crossJoin(broadcast(totals))
      .withColumn("n_all", col("p_tot") + col("n_tot"))
      .filter(col("a") + col("b") < col("n_all")) // drop zero-signal full-df tokens
      .withColumn("chi2_ppm", expr("""
        cast(n_all as decimal(38,0))
          * (a * (n_tot - b) - b * (p_tot - a))
          * (a * (n_tot - b) - b * (p_tot - a))
          * 1000000
        div ((a + b) * (n_all - a - b) * p_tot * n_tot)"""))
      .select(col("token"), col("a"), col("b"), col("chi2_ppm"))
      .orderBy(col("chi2_ppm").desc, col("token"))
      .limit(topK)
  }

  /** Leave-one-out target encoding: replace a categorical with the mean
    * label of the OTHER rows in its category —
    *
    *   loo_ppm = (Σ_cat y − y_row) · 10⁶ div (n_cat − 1)
    *
    * the standard leakage guard (including the row's own label leaks
    * the target straight into the feature). Singleton categories have
    * no "others" and emit NULL (callers impute with the global prior).
    * One category hash-agg broadcast back onto the rows — the category
    * table is dim-sized by assumption; for a fact-sized key use the
    * same two aggregates keyed and equi-joined. */
  def targetEncodeLoo(df: DataFrame, catCol: String, labelCol: String,
                      as: String = "loo_ppm"): DataFrame = {
    val stats = df.groupBy(col(catCol))
      .agg(sum(col(labelCol).cast("long")).as("__sy"),
        count(lit(1)).as("__nc"))
    df.join(broadcast(stats), Seq(catCol))
      .withColumn(as,
        when(col("__nc") > 1,
          expr(s"(__sy - cast(${labelCol} as long)) * 1000000 div (__nc - 1)")))
      .drop("__sy", "__nc")
  }
}
