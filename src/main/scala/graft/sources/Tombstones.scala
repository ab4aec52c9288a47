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

  private def patchStore(root: String): String =
    new File(root, "_patches").getPath

  private def patchKeysFile(root: String): File =
    new File(root, "_patch_keys")

  private def readPatchKeys(root: String): Seq[String] = {
    val f = patchKeysFile(root)
    if (!f.exists()) Seq.empty
    else new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
      .split('\t').filter(_.nonEmpty).toSeq
  }

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

  /** Pending MOR-update patch rows (full table schema, one row per
    * patched key), if any update is outstanding. */
  def pendingPatches(spark: SparkSession, root: String): Option[DataFrame] =
    VersionedTable.latestVersion(patchStore(root))
      .map(_ => VersionedTable.read(spark, patchStore(root)))

  /** MERGE-ON-READ UPDATE (the deletion-vector-update role, completing
    * the MOR triad next to [[deleteMor]]): instead of a copy-on-write
    * rewrite of every touched file ([[VersionedTable.update]]), the
    * post-update image of just the MATCHING rows lands as an O(matched
    * keys) PATCH commit; [[readActive]] overlays patches (newest per
    * key — repeated updates stack because each computes from the
    * CURRENT active view) and [[purge]] folds them into the data files
    * when the rewrite is worth it. Same daily-trickle argument as MOR
    * delete: a steady drip of small updates must not rewrite the same
    * hot files daily.
    *
    * `keys` identify rows (the patch upsert key); all calls against
    * one table must use the same key set (persisted in a sidecar and
    * checked). SET semantics match [[VersionedTable.update]]: applies
    * where `predicate` is TRUE, NULL leaves the row unchanged, SET
    * expressions see the row's pre-update columns. Key columns must
    * not be SET (a key rewrite is a delete + insert, not a patch).
    * Returns the number of patched keys. */
  def updateMor(spark: SparkSession, root: String, keys: Seq[String],
                predicate: org.apache.spark.sql.Column,
                set: Map[String, org.apache.spark.sql.Column]): Long = {
    require(keys.nonEmpty, "updateMor needs key columns")
    require(!set.keySet.exists(keys.contains),
      "updateMor must not SET a key column")
    val stored = readPatchKeys(root)
    require(stored.isEmpty || stored == keys,
      s"updateMor keys $keys differ from the table's recorded $stored")
    require(keys.forall(k => !k.contains("\t") && !k.contains("\n")),
      "key names must contain no tab or newline")
    val active = readActive(spark, root)
    require(set.keySet.subsetOf(active.columns.toSet),
      s"SET columns ${set.keySet.diff(active.columns.toSet)} not in table")
    // patch = post-update image of the matching rows only; computed
    // once and pinned (the store it merges into feeds readActive).
    // The MAIN root's CHECK constraints apply HERE: the patch commits
    // into the _patches store (a different table root whose own
    // constraint set is empty), yet readActive serves these rows as
    // the table — the "EVERY writer enforces at stage time" contract
    // must hold for the MOR writer too, or a violating patch poisons
    // reads now and makes the eventual purge() fail permanently. The
    // eager localCheckpoint runs the assert, so a violation surfaces
    // at the updateMor call, before any commit.
    val patch = VersionedTable.enforceConstraints(
      active.filter(coalesce(predicate, lit(false)))
        .select(active.columns.toSeq.map { c =>
          set.get(c).map(_.as(c)).getOrElse(col(c))
        }: _*), root)
      .localCheckpoint(true)
    val n = patch.count()
    if (n > 0) {
      // record the key set only once an update actually lands (a
      // zero-match call must not pin the table to its keys forever),
      // SIDECAR FIRST so readActive never sees a store without its
      // keys; atomic move — a crash mid-write can't leave a truncated
      // key list for purge to fold on a wrong prefix
      if (stored.isEmpty) {
        val tmp = java.nio.file.Files.createTempFile(
          new File(root).toPath, "_patch_keys", ".tmp")
        java.nio.file.Files.write(tmp, keys.mkString("\t")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        java.nio.file.Files.move(tmp, patchKeysFile(root).toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      if (VersionedTable.latestVersion(patchStore(root)).isEmpty)
        VersionedTable.overwrite(patch, patchStore(root))
      else // newest patch per key wins by REPLACING it (merge upsert)
        VersionedTable.merge(spark, patchStore(root), patch, keys)
    }
    n
  }

  /** Are any tombstones or patches outstanding? O(two directory
    * probes) — the guard a read path checks before paying the overlay
    * plan. */
  def hasPending(root: String): Boolean =
    VersionedTable.latestVersion(store(root)).isDefined ||
      VersionedTable.latestVersion(patchStore(root)).isDefined

  /** The merge-on-read composition over an arbitrary `base` frame:
    * MINUS pending tombstones PLUS pending patches — patched keys read
    * their patch row, tombstoned keys disappear, everything else reads
    * `base` untouched. Catalyst pushes base-column filters through the
    * anti-joins and the union to `base` itself, so a plan-time-pruning
    * base ([[VersionedTable.scan]]) keeps its file skipping under the
    * overlay. Both overlays broadcast while small — which is the
    * regime MOR is for; an overlay grown to fact scale is the signal
    * to [[purge]]. A key both patched and tombstoned is dead (deletes
    * always win — [[updateMor]] computes from the active view, so it
    * never patches a deleted key, and a delete AFTER a patch must hide
    * it). */
  def overlay(spark: SparkSession, root: String,
              base: DataFrame): DataFrame = {
    val patched = pendingPatches(spark, root) match {
      case None => base
      case Some(p) =>
        val keys = readPatchKeys(root)
        base.join(broadcast(p.select(keys.map(col): _*)), keys, "left_anti")
          .unionByName(p.select(base.columns.toSeq.map(col): _*))
    }
    pendingKeys(spark, root) match {
      case None    => patched
      case Some(t) => patched.join(broadcast(t), t.columns.toSeq, "left_anti")
    }
  }

  /** Snapshot read under the merge-on-read [[overlay]]. */
  def readActive(spark: SparkSession, root: String): DataFrame =
    overlay(spark, root, VersionedTable.read(spark, root))

  /** METADATA-FAST active-row COUNT under a TOMBSTONE-ONLY overlay:
    * `manifest row total − |pending keys present in the base|`. The
    * manifest total folds O(manifest) ([[VersionedTable.countRows]]);
    * the present-key term is exact but not free — it reads the base's
    * KEY COLUMNS only (column-pruned scan), with the pending keys
    * pushed as an IN-list filter when few (≤ [[CountActiveInListMax]])
    * so bloom/min-max file pruning applies: on a key-clustered or
    * bloom-indexed 100 TB table the term opens only the files that
    * contain tombstoned keys. (A pure plan-time fold is impossible
    * here without per-file deletion cardinalities — Delta's metadata
    * COUNT under DVs works because each DV RECORDS its cardinality;
    * these tombstones are key-valued, and a recorded key may be absent
    * from the base, so presence must be checked once.)
    *
    * `None` when patches pend (a patch can change nothing the manifest
    * knows — callers take the full overlay count), when the manifest
    * lacks row totals, or when the table has no versions. */
  def countActive(spark: SparkSession, root: String): Option[Long] = {
    if (VersionedTable.latestVersion(patchStore(root)).isDefined) return None
    val total = VersionedTable.countRows(root) match {
      case Some(t) => t
      case None => return None
    }
    pendingKeys(spark, root) match {
      case None => Some(total)
      case Some(t) =>
        val keyCols = t.columns.toSeq
        val keys = t.distinct().localCheckpoint(true)
        val base = VersionedTable.read(spark, root).select(keyCols.map(col): _*)
        // count matching ROWS, never distinct keys: the overlay's
        // anti-join removes EVERY base row carrying a tombstoned key,
        // and a non-unique base (plain appends enforce no key) can
        // hold several. Single-key small sets push as an IN-list so
        // the manifest stats/blooms prune files at plan time;
        // otherwise one broadcast semi-join (one output row per
        // matching base row — keys are pre-distinct).
        val removed =
          if (keyCols.length == 1 && keys.count() <= CountActiveInListMax) {
            val vals = keys.collect().map(_.get(0))
            if (vals.isEmpty) 0L
            else base.filter(col(keyCols.head).isin(vals.toSeq: _*)).count()
          } else
            base.join(broadcast(keys), keyCols, "left_semi").count()
        Some(total - removed)
    }
  }

  /** IN-list pushdown cap for [[countActive]]'s present-key probe. */
  private[sources] val CountActiveInListMax = 1000L

  /** Fold every pending patch AND tombstone into the data files via
    * file-pruned [[VersionedTable.applyChanges]] commits, then reset
    * both stores. When the patch key set and the tombstone key set
    * coincide the whole fold is ONE atomic commit (patches at seq 1,
    * deletes at seq 2 — deletes win a shared key, matching
    * [[readActive]]); differing key sets fold as two commits, patches
    * first. Returns the table version (unchanged if nothing was
    * pending). After purge, plain [[VersionedTable.read]] and
    * [[readActive]] agree again — the COW-equivalence UpdateMorSpec
    * pins. */
  def purge(spark: SparkSession, root: String): Long = {
    var current = VersionedTable.latestVersion(root)
      .getOrElse(sys.error(s"no versions at $root"))
    val schema = VersionedTable.read(spark, root).schema
    val patches = pendingPatches(spark, root)
    val tombs = pendingKeys(spark, root)
    val patchKeys = readPatchKeys(root)
    def delFeed(t: DataFrame, keyCols: Seq[String]): DataFrame =
      // keys as D ops, payload columns null-typed (applyChanges
      // selects the full table schema from its upsert side — empty
      // here, but the plan still needs the columns)
      schema.fields.foldLeft(t.withColumn("__seq", lit(2L))
        .withColumn("__op", lit("D"))) { (df, f) =>
        if (keyCols.contains(f.name)) df
        else df.withColumn(f.name, lit(null).cast(f.dataType))
      }
    def upFeed(p: DataFrame): DataFrame = p
      .select(schema.fieldNames.toSeq.map(col): _*)
      .withColumn("__seq", lit(1L)).withColumn("__op", lit("U"))
    (patches, tombs) match {
      case (None, None) =>
        // nothing pending — but clear a key-set sidecar stranded by a
        // crash between the sidecar write and the patch-store commit,
        // or the table stays pinned to keys no patch ever used
        patchKeysFile(root).delete()
        return current
      case (Some(p), Some(t)) if t.columns.toSeq == patchKeys =>
        current = VersionedTable.applyChanges(spark, root,
          upFeed(p).unionByName(delFeed(t, patchKeys)),
          patchKeys, "__seq", "__op")
      case _ =>
        patches.foreach { p =>
          current = VersionedTable.applyChanges(spark, root, upFeed(p),
            patchKeys, "__seq", "__op")
        }
        tombs.foreach { t =>
          current = VersionedTable.applyChanges(spark, root,
            delFeed(t, t.columns.toSeq), t.columns.toSeq, "__seq", "__op")
        }
    }
    Lake.deleteRecursively(new File(store(root)))
    Lake.deleteRecursively(new File(patchStore(root)))
    patchKeysFile(root).delete()
    current
  }
}
