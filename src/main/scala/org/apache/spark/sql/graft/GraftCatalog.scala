package org.apache.spark.sql.graft

import java.util

import org.apache.spark.sql.classic
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.{Tombstones, VersionedTable}

/** DataSource V2 CATALOG over [[graft.sources.VersionedTable]] roots —
  * the DeltaCatalog role, scoped (this round) to the READ PATH: once
  * registered, `spark.sql` plans `graft.db.t` NATIVELY, including
  * Spark's own time-travel syntax,
  *
  * {{{
  *   GraftCatalog.register(spark, "db", "t", root)
  *   spark.sql("SELECT * FROM graft.db.t WHERE k > 5")
  *   spark.sql("SELECT * FROM graft.db.t VERSION AS OF 3")
  *   spark.sql("SELECT * FROM graft.db.t TIMESTAMP AS OF '2026-01-01'")
  * }}}
  *
  * with the SAME manifest-backed pruning index underneath as
  * [[GraftScan.scan]]: `loadTable` returns a table whose
  * `newScanBuilder` is Spark's own `ParquetScanBuilder` over the
  * [[GraftScan.GraftFileIndex]], so pushed filters meet the per-file
  * [min, max]/bloom/partition stats identically on both surfaces and
  * the physical scan stays a vectorized parquet read. DML stays on
  * [[graft.sources.GraftSql]] (the thin router) until the write path
  * moves here; create/alter/drop/rename are rejected loudly.
  *
  * MOR safety: a LATEST read refuses while tombstones/patches pend —
  * the raw snapshot would silently serve deleted rows (a GDPR hazard);
  * read through `VersionedTable.scan` (which overlays) or [[Tombstones.purge]]
  * first. Version/timestamp-pinned reads serve the RAW snapshot by the
  * time-travel contract, exactly like `scan(v)`.
  *
  * The registry is JVM-global (one catalog instance is constructed by
  * Spark per session via reflection and must see tables registered
  * before it existed); production would back it with a metastore. */
class GraftCatalog extends TableCatalog {

  private var catName = "graft"

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catName = name
  }

  override def name(): String = catName

  private def rootOf(ident: Identifier): String = {
    val r = GraftCatalog.registry.get(GraftCatalog.key(ident))
    if (r == null) throw new NoSuchTableException(ident)
    r
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val db = namespace.mkString(".")
    import scala.jdk.CollectionConverters._
    val found = GraftCatalog.registry.keySet.asScala.toSeq.sorted.collect {
      case k if k.stripSuffix("." + k.split('.').last) == db =>
        Identifier.of(namespace, k.split('.').last)
    }
    if (found.isEmpty && !GraftCatalog.registry.isEmpty)
      throw new NoSuchNamespaceException(namespace)
    found.toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    GraftCatalog.registry.containsKey(GraftCatalog.key(ident))

  override def loadTable(ident: Identifier): Table = {
    val root = rootOf(ident)
    // latest-state reads must not silently serve MOR-deleted rows
    if (Tombstones.hasPending(root))
      throw new IllegalStateException(
        s"table ${key(ident)} has pending merge-on-read overlays " +
          "(tombstones/patches): a raw catalog read would serve deleted " +
          "rows — purge() them or read via VersionedTable.scan")
    new GraftTableV2(key(ident), root, None)
  }

  /** `VERSION AS OF n` — Spark routes the version string here. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val root = rootOf(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new NoSuchTableException(ident)
    }
    require(VersionedTable.versions(root).contains(v),
      s"table ${key(ident)} has no version $v")
    new GraftTableV2(s"${key(ident)}@v$v", root, Some(v))
  }

  /** `TIMESTAMP AS OF ts` — Spark hands epoch MICROseconds. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val root = rootOf(ident)
    val v = VersionedTable.versionAsOf(root, timestamp / 1000L)
      .getOrElse(throw new NoSuchTableException(ident))
    new GraftTableV2(s"${key(ident)}@v$v", root, Some(v))
  }

  private def key(ident: Identifier): String = GraftCatalog.key(ident)

  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "GraftCatalog is read-path-only: ALTER goes through the " +
        "VersionedTable API")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "GraftCatalog is read-path-only: unregister() removes the name; " +
        "data removal goes through the VersionedTable API")

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "GraftCatalog is read-path-only: re-register under the new name")
}

object GraftCatalog {

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def key(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".").toLowerCase

  /** Register `catalog.db.table` → a VersionedTable root and install
    * the catalog in the session (catalog instances are constructed
    * lazily by Spark on first reference — setting the conf at runtime
    * is the supported path). */
  def register(spark: org.apache.spark.sql.SparkSession, db: String,
               table: String, root: String,
               catalog: String = "graft"): Unit = {
    require(db.matches("[A-Za-z_][A-Za-z0-9_]*") &&
      table.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"db and table must be bare identifiers, got '$db'.'$table'")
    spark.conf.set(s"spark.sql.catalog.$catalog",
      classOf[GraftCatalog].getName)
    registry.put(s"$db.$table".toLowerCase, root)
    ()
  }

  def unregister(db: String, table: String): Unit = {
    registry.remove(s"$db.$table".toLowerCase)
    ()
  }
}

/** One pinned (or latest) snapshot as a DSv2 [[Table]]: schema from
  * the version's cached sidecar, partition columns surfaced as
  * identity transforms, and `newScanBuilder` = Spark's
  * `ParquetScanBuilder` over the manifest-pruning index — DSv2 pushes
  * its filters into `listFiles` exactly as the V1 scan does. */
private[graft] class GraftTableV2(ident: String, root: String,
                                  version: Option[Long])
    extends Table with SupportsRead {

  private lazy val (idx, dataSchema, partSchema) = GraftScan.indexFor(
    classic.SparkSession.active, root, version)

  override def name(): String = ident

  override def schema(): StructType =
    StructType(dataSchema.fields ++ partSchema.fields)

  override def partitioning(): Array[Transform] =
    partSchema.fieldNames.map(Expressions.identity(_): Transform)

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    ParquetScanBuilder(classic.SparkSession.active, idx, schema(),
      dataSchema, options)
}
