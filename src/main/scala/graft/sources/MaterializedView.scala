package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance over a [[VersionedTable]]
  * source — the Delta-Live-Tables / IVM role: an aggregate view that
  * REFRESHES from the source's changes feed instead of rescanning the
  * table.
  *
  * Scope: ADDITIVE aggregates (count + sums) over append-only
  * sources — the class where delta-maintenance is exact: new rows can
  * only add to a group, so
  * `view' = view ⊕ aggregate(changes-since-last-refresh)` (full-outer
  * join on the keys, null-safe addition). Non-additive aggregates
  * (distinct counts, max over deletes) and rewriting sources need
  * recompute or retraction logic — out of scope, enforced by the same
  * append-only check as [[VersionedTable.readChangesStream]] at
  * refresh time via readChangesSince on an append-only history.
  *
  * The view is itself a VersionedTable (time-travelable refresh
  * history) plus a `_refreshed_v` sidecar recording the source version
  * the state covers — written ATOMICALLY after the view commit, so a
  * crash between the two re-reads at most one delta (refresh is
  * idempotent only per-version; re-running a refresh for the SAME
  * source version is a no-op by the sidecar check).
  *
  * Scale shape: each refresh reads O(new files) of the source (the
  * CDF read), aggregates them (combinable), and joins against the
  * GROUP-CARDINALITY view state — never the source table. The view
  * overwrite is O(|groups|), the thing a view exists to keep small.
  *
  * Reference anchor: the reference's gold layer recomputes every
  * aggregate from silver on each DAG run (to_gold.py:7-12, full-table
  * SQL per day); this is that layer upgraded to delta maintenance. */
object MaterializedView {

  private def sidecar(viewRoot: String) = new File(viewRoot, "_refreshed_v")

  /** Source version the view state currently covers, if any. */
  def refreshedVersion(viewRoot: String): Option[Long] =
    if (!sidecar(viewRoot).exists()) None
    else Some(new String(Files.readAllBytes(sidecar(viewRoot).toPath),
      StandardCharsets.UTF_8).trim.toLong)

  private def writeRefreshed(viewRoot: String, v: Long): Unit = {
    val tmp = Files.createTempFile(new File(viewRoot).toPath, "_rv", ".tmp")
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, sidecar(viewRoot).toPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Refresh the additive view (group keys → `n` count + one summed
    * column `sumCol` as DECIMAL(18,2)) from `srcRoot`'s changes since
    * the last refresh. Returns the source version now covered; a
    * refresh with no new source commits is a no-op. */
  def refreshAdditive(spark: SparkSession, srcRoot: String, viewRoot: String,
                      keyCols: Seq[String], sumCol: String): Long = {
    val srcV = VersionedTable.latestVersion(srcRoot)
      .getOrElse(sys.error(s"no versions at $srcRoot"))
    val last = refreshedVersion(viewRoot)
    if (last.contains(srcV)) return srcV
    new File(viewRoot).mkdirs()

    val changes = last match {
      case None    => VersionedTable.read(spark, srcRoot)
      case Some(v) => VersionedTable.readChangesSince(spark, srcRoot, v)
    }
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val delta = changes.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(sumCol).cast(dec)).cast(dec).as("total"))

    val next = last match {
      case None => delta
      case Some(_) =>
        val prev = VersionedTable.read(spark, viewRoot)
        prev.select(keyCols.map(col) :+ col("n").as("__pn")
          :+ col("total").as("__pt"): _*)
          .join(delta, keyCols, "full_outer")
          .select(keyCols.map(col) ++ Seq(
            (coalesce(col("__pn"), lit(0L)) + coalesce(col("n"), lit(0L)))
              .as("n"),
            (coalesce(col("__pt"), lit(0).cast(dec)) +
              coalesce(col("total"), lit(0).cast(dec)))
              .cast(dec).as("total")): _*)
    }
    VersionedTable.overwrite(next, viewRoot)
    writeRefreshed(viewRoot, srcV)
    srcV
  }

  /** Retraction-aware refresh — drops [[refreshAdditive]]'s append-only
    * restriction: changes come from [[VersionedTable.diffVersions]]'s
    * multiset row diff (`insert`/`delete` tags), so DELETE WHERE and
    * MERGE commits maintain the view exactly — an update retracts its
    * old row (−1, −x) and asserts the new one (+1, +x). Groups whose
    * count AND sum both return to zero leave the view. File-level
    * pruning in the diff means an append-only stretch costs the same
    * as [[refreshAdditive]]; only rewritten files are re-read. */
  def refreshWithRetraction(spark: SparkSession, srcRoot: String,
                            viewRoot: String, keyCols: Seq[String],
                            sumCol: String): Long = {
    val srcV = VersionedTable.latestVersion(srcRoot)
      .getOrElse(sys.error(s"no versions at $srcRoot"))
    val last = refreshedVersion(viewRoot)
    if (last.contains(srcV)) return srcV
    new File(viewRoot).mkdirs()

    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val delta = last match {
      case None =>
        VersionedTable.read(spark, srcRoot)
          .groupBy(keyCols.map(col): _*)
          .agg(count(lit(1)).as("n"),
            sum(col(sumCol).cast(dec)).cast(dec).as("total"))
      case Some(v) =>
        val sign = when(col("_change") === "insert", lit(1L)).otherwise(lit(-1L))
        VersionedTable.diffVersions(spark, srcRoot, v, srcV)
          .groupBy(keyCols.map(col): _*)
          .agg(sum(sign).as("n"),
            sum(sign.cast(dec) * col(sumCol).cast(dec)).cast(dec).as("total"))
    }
    val next = last match {
      case None => delta
      case Some(_) =>
        VersionedTable.read(spark, viewRoot)
          .select(keyCols.map(col) :+ col("n").as("__pn")
            :+ col("total").as("__pt"): _*)
          .join(delta, keyCols, "full_outer")
          .select(keyCols.map(col) ++ Seq(
            (coalesce(col("__pn"), lit(0L)) + coalesce(col("n"), lit(0L)))
              .as("n"),
            (coalesce(col("__pt"), lit(0).cast(dec)) +
              coalesce(col("total"), lit(0).cast(dec)))
              .cast(dec).as("total")): _*)
          .filter(col("n") =!= 0L || col("total") =!= lit(0).cast(dec))
    }
    VersionedTable.overwrite(next, viewRoot)
    writeRefreshed(viewRoot, srcV)
    srcV
  }
}
