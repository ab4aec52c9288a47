package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE-ON-READ delete for [[VersionedTable]] — the deletion-vector /
  * positional-delete role (Delta DVs, Iceberg merge-on-read): a delete
  * lands as an O(keys) TOMBSTONE commit instead of a copy-on-write
  * file rewrite, reads subtract the tombstones with one anti-join, and
  * a background [[purge]] folds the accumulated tombstones into the
  * data files when the rewrite is worth it.
  *
  * Why both delete paths exist: COW ([[VersionedTable.delete]]) makes
  * READS pay nothing but each delete rewrites every touched file — at
  * 100 TB a daily trickle of takedown requests rewrites the same hot
  * files daily. MOR makes each DELETE O(its keys) and defers the
  * rewrite; the read-side anti-join costs one broadcast (tombstone
  * sets are request-sized) until purge resets it. Same trade Delta
  * ships; here it is explicit API.
  *
  * The tombstone store is itself a VersionedTable under the table root
  * (`_tombstones/`) — atomic commits, time travel, and countRows come
  * for free; [[purge]] applies the keys through ONE
  * [[VersionedTable.applyChanges]] commit (file-pruned, atomic) and
  * resets the store. Readers that bypass [[readActive]] see the
  * pre-purge rows — MOR is an API contract, exactly like Delta readers
  * that must understand DVs. */
object Tombstones {

  private def store(root: String): String =
    new File(root, "_tombstones").getPath

  /** Tombstone key rows currently pending (empty frame if none). */
  def pendingKeys(spark: SparkSession, root: String): Option[DataFrame] =
    VersionedTable.latestVersion(store(root))
      .map(_ => VersionedTable.read(spark, store(root)))

  /** MOR delete: record `keys` (one column per key component) as
    * tombstones — O(keys) write, the data files never move. Repeated
    * or already-absent keys are harmless (the anti-join and the purge
    * are both idempotent on duplicates). */
  def deleteMor(spark: SparkSession, root: String, keys: DataFrame): Long = {
    val k = keys.distinct()
    if (VersionedTable.latestVersion(store(root)).isEmpty)
      VersionedTable.overwrite(k, store(root))
    else VersionedTable.append(k, store(root))
  }

  /** Snapshot read MINUS pending tombstones (the merge-on-read). The
    * anti-join broadcasts the tombstone side while it is small — which
    * is the regime MOR is for; a tombstone set grown to fact scale is
    * the signal to [[purge]]. */
  def readActive(spark: SparkSession, root: String): DataFrame = {
    val base = VersionedTable.read(spark, root)
    pendingKeys(spark, root) match {
      case None    => base
      case Some(t) => base.join(broadcast(t), t.columns.toSeq, "left_anti")
    }
  }

  /** Fold every pending tombstone into the data files as ONE atomic
    * file-pruned [[VersionedTable.applyChanges]] commit, then reset
    * the store. Returns the table version (unchanged if nothing was
    * pending). After purge, plain [[VersionedTable.read]] and
    * [[readActive]] agree again. */
  def purge(spark: SparkSession, root: String): Long = {
    val current = VersionedTable.latestVersion(root)
      .getOrElse(sys.error(s"no versions at $root"))
    pendingKeys(spark, root) match {
      case None => current
      case Some(t) =>
        val keyCols = t.columns.toSeq
        val schema = VersionedTable.read(spark, root).schema
        // feed = keys as D ops, payload columns null-typed (applyChanges
        // selects the full table schema from its upsert side — which is
        // empty here, but the plan still needs the columns)
        val feed = schema.fields.foldLeft(t.withColumn("__seq", lit(1L))
          .withColumn("__op", lit("D"))) { (df, f) =>
          if (keyCols.contains(f.name)) df
          else df.withColumn(f.name, lit(null).cast(f.dataType))
        }
        val v = VersionedTable.applyChanges(spark, root, feed,
          keyCols, "__seq", "__op")
        Lake.deleteRecursively(new File(store(root)))
        v
    }
  }
}
