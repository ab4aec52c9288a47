package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY.md §4 / builder brief: "skewed
  * keys → salting or AQE skew-join").
  *
  * AQE's skew-join split handles sort-merge cases automatically, but it
  * only splits partitions, not a single monster key. Salting fixes the
  * single-hot-key case: the skewed (large) side gets a random salt in
  * [0, salts), the other side is replicated once per salt value, and
  * the join key becomes (key, salt) — the hot key's rows now spread
  * over `salts` tasks.
  *
  * The salt is `pmod(hash(monotonically_increasing_id()), salts)` —
  * deterministic per run layout, uniform, and no RNG (a nondeterministic
  * salt would break retry semantics: a re-executed task must re-derive
  * the same rows).
  */
object SkewJoin {

  /** Inner equi-join `big ⋈ small` on `keys`, with `big`'s rows salted
    * across `salts` sub-keys and `small` replicated `salts`×. */
  def saltedInnerJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                      salts: Int): DataFrame = {
    require(salts > 1)
    val salted = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Salted aggregation for a skewed group-by: two-phase — partial agg
    * on (key, salt), final agg on key. Spark's hash aggregate already
    * does map-side partials; explicit salting additionally spreads the
    * REDUCE side of one hot key over `salts` tasks. `partials` maps
    * each output column to (partialAgg, finalAgg). */
  def saltedCount(df: DataFrame, key: Column, salts: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(monotonically_increasing_id()), lit(salts)))
      .groupBy(key.as("__k"), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col("__k"))
      .agg(sum(col("__partial")).as("n"))
}
