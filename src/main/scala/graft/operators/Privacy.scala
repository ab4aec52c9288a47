package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity auditing and enforcement over quasi-identifiers
  * (Sweeney 2002) — the release-side governance check for training
  * corpora and analytics extracts: a row whose quasi-identifier
  * combination is shared by fewer than k rows is re-identifiable by
  * linkage even after direct identifiers (q92's PII scrub) are gone.
  *
  * Scale shape: the audit is one combinable group-count; enforcement
  * joins the fact table to the ≥k group list on the quasi columns —
  * a hash semi-join on the grouping key, no window over fact-scale
  * partitions. Compose with generalization (bucket the quasi columns
  * coarser, e.g. value → band) and re-audit until clean.
  *
  * Reference anchor: beyond-reference (the reference publishes gold
  * tables with raw quasi-identifiers; SURVEY §6 flags governance as
  * an engine-side gap). */
object Privacy {

  /** Quasi-identifier combinations with fewer than `k` rows —
    * (quasiCols…, n), the re-identification risk report. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
                      k: Long): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)

  /** Rows whose quasi-group has at least `k` members — the k-anonymous
    * release. Suppression (dropping the risky tail), the conservative
    * default; generalize-and-retry keeps more rows. */
  def suppressSmallGroups(df: DataFrame, quasiCols: Seq[String],
                          k: Long): DataFrame = {
    val safe = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= k)
      .select(quasiCols.map(col): _*)
    df.join(safe, quasiCols, "left_semi")
  }

  /** Convenience: a bucketed (generalized) quasi column. */
  def band(c: Column, width: Double): Column =
    floor(c / width).cast("long")

  /** Salted one-way mask: a stable pseudonym (same input → same
    * token, joinable across releases with the same salt) that cannot
    * be reversed without the salt — the PSEUDONYMIZATION stage next
    * to q92's pattern scrub (which redacts) and [[kAnonymityAudit]]
    * (which suppresses). SHA-256 hex; map-local. */
  def maskHash(c: Column, salt: String): Column =
    sha2(concat(lit(salt), c.cast("string")), 256)

  /** Partial reveal: all but the last `keepLast` characters starred —
    * the debuggable mask (enough to eyeball record identity, not
    * enough to reconstruct). Strings no longer than `keepLast` pass
    * through whole. (The catalyst StringRepeat is used directly — the
    * Scala `repeat` API only accepts a literal count.) */
  def maskPartial(c: Column, keepLast: Int): Column = {
    val s = c.cast("string")
    val stars = org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.StringRepeat(
        org.apache.spark.sql.graft.ColumnBridge.expression(lit("*")),
        org.apache.spark.sql.graft.ColumnBridge.expression(
          length(s) - keepLast)))
    when(length(s) <= keepLast, s)
      .otherwise(concat(stars, substring(s, -keepLast, keepLast)))
  }
}
