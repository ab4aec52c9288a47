package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 dimension history (Kimball slowly-changing-dimension
  * type 2): turn a change feed into validity INTERVALS and join facts
  * to the dimension version that was valid at the fact's timestamp —
  * the dimension sibling of [[AsOfJoin]] (which matches fact-to-fact
  * without materializing intervals).
  *
  * Interval semantics: [valid_from, valid_to) half-open, valid_to
  * NULL = current version — so versions PARTITION the timeline per
  * key and every fact at/after the key's first change matches exactly
  * one version (Scd2Spec pins the boundary and uniqueness
  * properties).
  *
  * Scale shape: interval building is ONE window over the change feed
  * (per-key ordering, no global sort); the temporal join is a hash
  * EQUI-JOIN on the key with the interval predicate as a residual —
  * fan-out per fact is the key's version count (dimension histories
  * are shallow by nature; a fact-fact history would use AsOfJoin's
  * sort-merge-in-partition shape instead).
  *
  * Reference anchor: the reference overwrites its dims in place
  * (to_silver.py rewrites bus/operator attributes per run — history
  * is lost); this is the standard upgrade that keeps it. */
object Scd2 {

  /** Change feed (keyCols, tsCol, attrs…) → one row per version with
    * `valid_from` = its change time and `valid_to` = the key's next
    * change time (NULL = still current). Change times must be unique
    * per key (enforce upstream — two changes at one instant have no
    * defined order). */
  def intervals(changes: DataFrame, keyCols: Seq[String],
                tsCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    changes
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumnRenamed(tsCol, "valid_from")
  }

  /** Join each fact row to the dimension version valid at `factTs`:
    * valid_from <= t < valid_to (open-ended current version). Inner
    * semantics — facts before the key's first version (or keyless)
    * drop; pass joinType "left" to keep them with null attributes. */
  def temporalJoin(facts: DataFrame, history: DataFrame,
                   keyCols: Seq[String], factTs: String,
                   joinType: String = "inner"): DataFrame =
    facts.join(history,
      keyCols.map(k => facts(k) === history(k))
        .reduce(_ && _) &&
        facts(factTs) >= history("valid_from") &&
        (history("valid_to").isNull ||
          facts(factTs) < history("valid_to")),
      joinType)
}
