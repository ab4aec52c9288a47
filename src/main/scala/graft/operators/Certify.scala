package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Driver-visible certification for APPROXIMATE operators.
  *
  * The correctness gate hash-compares a query's output against DuckDB
  * SQL over the same parquet — which an approximate result can never
  * match directly. The certified pattern (the q165/q166 twin idea made
  * mechanical): the gate query computes BOTH the approximate result and
  * its exact twin in the same job, emits the EXACT rows as the anchor
  * (SQL-expressible → hash-checked), and appends aggregate flag
  * columns — BIGINT 1/0, replicated on every row — that assert the
  * approximate side's quality (recall ≥ floor, subset-of-exact, error
  * within bound). The oracle emits the exact rows with literal 1s: if
  * the approximation ever degrades below its measured floor, the flag
  * flips to 0 on the Spark side and the driver records a hash FAIL.
  *
  * Floors are MEASURED, not aspirational — graft.RecallProbe prints
  * the actual recall of every approximate operator per parameter
  * setting; gate floors sit well under the measured value so only a
  * real regression (not run-to-run noise — the operators are
  * deterministic, seeded) can trip them.
  *
  * Flags are aggregates over the whole result (never per-anchor-row)
  * so per-query recall variance on tiny fixtures cannot flake the
  * gate; per-query minimums are asserted in the specs instead.
  */
object Certify {

  /** 1-row frame: 1 iff |approx ∩ exact| / |exact| ≥ floor on `keys`.
    * Both sides deduped on the keys so duplicates can't inflate hits.
    *
    * One pass over each side: hits and total come out of a single
    * left join + aggregate (the original formulation referenced the
    * exact twin TWICE — once for the intersection, once for the
    * total — and Spark re-executes unshared lineage per reference, so
    * the expensive exact subtree ran an extra time per flag). Both
    * sides are key-distinct, so the left join matches at most one
    * approx row per exact row: count(__hit) = |approx ∩ exact|,
    * count(*) = |exact| — bit-identical to the two-reference form,
    * including the empty-exact case (0/0 → NaN ≥ floor → false → 0). */
  def recallFlag(approx: DataFrame, exact: DataFrame, keys: Seq[String],
                 floor: Double, name: String): DataFrame = {
    val kc = keys.map(col)
    exact.select(kc: _*).distinct()
      .join(approx.select(kc: _*).distinct().withColumn("__hit", lit(1)),
        keys, "left")
      .agg(count(col("__hit")).as("__hits"), count(lit(1)).as("__tot"))
      .select((col("__hits").cast(DoubleType) / col("__tot") >= floor)
        .cast(LongType).as(name))
  }

  /** Eagerly materialize a frame that the certified-query pattern will
    * reference more than once (anchor + one reference per flag): Spark
    * re-executes unshared lineage per reference, so an un-pinned exact
    * twin would recompute its whole pipeline once per flag. Charged
    * inside the timed query (the builder runs in the benched region);
    * blocks are dropped between bench runs and freed by the
    * ContextCleaner — never a cross-run cache. */
  def pin(df: DataFrame): DataFrame = df.localCheckpoint(eager = true)

  /** 1-row frame: 1 iff every `approx` key-tuple appears in `exact`. */
  def subsetFlag(approx: DataFrame, exact: DataFrame, keys: Seq[String],
                 name: String): DataFrame =
    approx.select(keys.map(col): _*)
      .join(exact.select(keys.map(col): _*), keys, "left_anti")
      .agg((count(lit(1)) === 0).cast(LongType).as(name))

  /** 1-row frame: 1 iff `pred` holds on EVERY row of `df` (vacuously 1
    * on empty input — pair it with an anchor that pins cardinality). */
  def allRowsFlag(df: DataFrame, pred: Column, name: String): DataFrame =
    df.agg(coalesce(min(pred.cast(LongType)), lit(1L)).as(name))

  /** Anchor ∥ flags: cross-join each 1-row flag frame onto the exact
    * anchor rows (broadcast — the flag side is 1 row by construction). */
  def attach(anchor: DataFrame, flags: DataFrame*): DataFrame =
    flags.foldLeft(anchor)((a, f) => a.crossJoin(broadcast(f)))
}
