package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted (tf·idf) cosine similarity join over text — the weighted
  * complement of [[SetSimJoin]]'s unweighted Jaccard: near-dup pairs
  * that share RARE vocabulary score high even when their token SETS
  * overlap modestly, which is what catches templated rewrites that
  * Jaccard under-scores.
  *
  * Weighting is the integer idf surrogate w = tf · (N div df) — exact
  * BIGINT (ln-idf would drag libm into the oracle contract; rank order
  * against ln(N/df) is preserved where it matters, at the rare end).
  * The only floats are one correctly-rounded sqrt per doc norm and one
  * divide per pair — bit-identical across engines for the same
  * expression tree (the q40 cosine-parity rule).
  *
  * Scale shape: candidate generation is the classic posting-list
  * equi-join on the token, capped at `dfCap` document frequency — the
  * join cost is Σ_token df² over CAPPED df (never corpus²), and the cap
  * is principled, not just a guard: a token in more than `dfCap` docs
  * has idf ≈ 0, so the pairs it alone would generate score ~0 anyway.
  * Everything else is combinable hash aggregation; no windows, no
  * broadcast of anything fact-sized. The dial at 100 TB is `dfCap`
  * (candidate volume) — lower it and recall at the LOW-cosine end
  * degrades first, exactly like SetSimJoin's prefix length.
  */
object SparseCosineJoin {

  /** Doc-doc pairs (a < b) with tf·idf cosine ≥ `minCos`, considering
    * only tokens with document frequency ≤ `dfCap`. Emits
    * (id_a, id_b, dot, cos) — `dot` is the exact integer weighted
    * dot product, `cos` the IEEE double. */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
            dfCap: Long, minCos: Double): DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("token"))
      .groupBy(col("id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfTab = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    // weighted postings: only capped tokens ever join; weights are
    // exact longs (tf ≤ doc length, N div df ≤ N)
    val w = tf.join(dfTab.filter(col("df") <= dfCap), Seq("token"))
      .crossJoin(broadcast(n))
      .select(col("token"), col("id"),
        (col("tf") * expr("n_docs div df")).as("w"))
      .localCheckpoint(true) // reused by norms AND the pair join
    val norms = w.groupBy(col("id"))
      .agg(sum(col("w") * col("w")).as("norm2"))
    val dots = w.as("a").join(w.as("b"),
        col("a.token") === col("b.token") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(sum(col("a.w") * col("b.w")).as("dot"))
    dots
      .join(norms.select(col("id").as("id_a"), col("norm2").as("na2")), "id_a")
      .join(norms.select(col("id").as("id_b"), col("norm2").as("nb2")), "id_b")
      .withColumn("cos",
        col("dot").cast("double") /
          (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double"))))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), col("dot"), col("cos"))
  }
}
