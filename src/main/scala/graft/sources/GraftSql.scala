package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL DML surface over [[VersionedTable]] — the serving layer's
  * write-side contract (the reference serves its lakehouse through a
  * SQL engine; reads are covered by `Lake.registerCatalog` + portable
  * SQL, and this routes the DML verbs to the SAME engine paths the
  * Scala API uses, so SQL text gets identical semantics: file-pruned
  * copy-on-write, atomic manifest commits, optimistic retry).
  *
  * Deliberately a THIN ROUTER, not a dialect: statement shape is
  * recognized up front (INSERT INTO / DELETE FROM / UPDATE / MERGE
  * INTO over REGISTERED table names), while every predicate,
  * assignment, and source query inside the statement is parsed by
  * Spark itself (`expr(...)` / `spark.sql(...)`) — no second
  * expression grammar to drift from Catalyst's. Anything else
  * (SELECT, CTEs, …) passes through to `spark.sql` over the
  * registered tables' CURRENT snapshots, so reads observe committed
  * DML immediately.
  *
  * Supported statements (case-insensitive keywords):
  *  - `INSERT INTO t [(a, b, ...)] SELECT ...` / `... VALUES (...), ...`
  *    (positional columns — against the explicit list when given,
  *    unlisted columns NULL — cast to the table schema) → append
  *    commit; `INSERT INTO t REPLACE WHERE p SELECT ...` → the
  *    idempotent partition-reload ([[VersionedTable.replaceWhere]]:
  *    one atomic swap, batch rows validated against `p`);
  *  - `ALTER TABLE t ADD CONSTRAINT n CHECK (p)` / `DROP CONSTRAINT n`
  *    → [[VersionedTable.addConstraint]] (existing rows validated
  *    once; every later write on ANY surface enforces per-row,
  *    in-job);
  *  - `ALTER TABLE t DROP COLUMN c` / `RENAME COLUMN a TO b` →
  *    metadata-only column-mapping commits
  *    ([[VersionedTable.alterDropColumn]]/[[VersionedTable.alterRenameColumn]]);
  *  - listings: `SHOW TABLES` (registry), `DESCRIBE [TABLE] t` (one
  *    sidecar read — name/type/nullability/partition role),
  *    `SHOW PARTITIONS t` (manifest-path parse), `DESCRIBE DETAIL t`
  *    (the Delta table card: version/files/bytes/rows/partitioning/
  *    constraint count from the manifest alone) — all metadata-only;
  *  - maintenance: `OPTIMIZE t [ZORDER BY (a, b)]` →
  *    [[VersionedTable.compact]] / `compactZOrderedK` (~128 MiB
  *    targets from manifest byte totals); `VACUUM t [RETAIN n HOURS]`
  *    (168 h default, the Delta retention) → horizon-respecting
  *    [[VersionedTable.vacuum]]; `DESCRIBE HISTORY t` → one
  *    metadata-only row per commit (version, files, rows,
  *    commit_time); `DESCRIBE CHANGES t BETWEEN v1 AND v2` → the
  *    row-level diff ([[VersionedTable.diffVersions]] — the Delta
  *    table_changes role, `_change` = insert/delete, common files
  *    cancel at plan time); `RESTORE TABLE t TO VERSION AS OF v` →
  *    [[VersionedTable.restore]] (rollback as roll-forward);
  *    `CREATE TABLE n SHALLOW CLONE t [VERSION AS OF v] LOCATION
  *    '...'` → [[VersionedTable.shallowCloneAt]] (zero-copy, clone
  *    registered immediately);
  *  - `DELETE FROM t [WHERE p]` → [[VersionedTable.delete]] (file-pruned
  *    COW, SQL null-predicate semantics; no WHERE deletes every row);
  *  - `UPDATE t SET c = e, ... [WHERE p]` → [[VersionedTable.update]];
  *  - `MERGE INTO t [AS a] USING s [AS b] ON t.k = s.k [AND ...]`
  *    followed by WHEN clauses. The canonical pair — `WHEN MATCHED
  *    THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *` — routes to
  *    [[VersionedTable.merge]] (the keyed upsert). The general form —
  *    `WHEN MATCHED [AND c] THEN UPDATE SET a = e, ...` (or `SET *`),
  *    `WHEN MATCHED [AND c] THEN DELETE`, `WHEN NOT MATCHED
  *    [BY TARGET] [AND c] THEN INSERT (cols) VALUES (exprs)` (or
  *    `INSERT *`), and the Delta full-sync family `WHEN NOT MATCHED
  *    BY SOURCE [AND c] THEN UPDATE SET a = e, .../DELETE` (target
  *    rows with no source match; conditions/SETs reference the target
  *    only), first true clause wins in declared order per family —
  *    routes to [[VersionedTable.mergeActions]];
  *    `s` is a registered/temp table name or a parenthesized
  *    subquery (aliased, so clause expressions can reference it).
  *    The ON condition must stay same-column equalities (it is the
  *    file-pruning key); other shapes are rejected with a clear error
  *    rather than silently narrowed.
  *
  * DML returns a one-row DataFrame `(op, table, version, rows)` —
  * the committed version and the rows written/affected where the
  * engine path reports them. */
object GraftSql {

  private val tables =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  // DURABLE registry (the metastore role — optional, enabled by
  // [[useWarehouse]]): name→root persisted under <warehouse>/_sqlcatalog
  // via the CAS-guarded [[CatalogStore]], so SHOW TABLES and name
  // resolution survive a fresh JVM. The map above is the cache;
  // [[sync]] merges on generation change, register/unregister write
  // through. Names the store dropped (another JVM's DROP) are evicted;
  // session-local temp registrations (no write-through before
  // useWarehouse, or after useWarehouse(None)) stay untouched.
  private var store: Option[java.io.File] = None
  private var storeGen = -1L
  private var storeOwned = Set.empty[String]

  /** Persist this registry under `warehouse` (and load what previous
    * JVMs persisted there). Pass the SAME warehouse every run — that
    * is what makes the SQL surface a serving layer instead of a
    * session toy. */
  def useWarehouse(warehouse: String): Unit = this.synchronized {
    store = Some(new java.io.File(warehouse, "_sqlcatalog"))
    storeGen = -1L
    sync()
  }

  /** Detach from the durable store (session-local mode; nothing is
    * deleted). */
  def detachWarehouse(): Unit = this.synchronized {
    store = None
    storeGen = -1L
    storeOwned = Set.empty
  }

  private def sync(): Unit = this.synchronized {
    store.foreach { d =>
      val g = CatalogStore.gen(d)
      if (g != storeGen) {
        val (g2, m) = CatalogStore.load(d)
        (storeOwned -- m.keySet).foreach(tables.remove)
        m.foreach { case (k, v) => tables.put(k, v) }
        storeOwned = m.keySet
        storeGen = g2
      }
    }
  }

  /** Register `name` → a VersionedTable root. SELECT statements see
    * the table's latest snapshot (re-resolved per [[execute]] call,
    * MOR overlays included via [[VersionedTable.scan]]). Durable when
    * a warehouse is attached. */
  def register(spark: SparkSession, name: String, root: String): Unit = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"table name must be a bare identifier, got '$name'")
    store.foreach(d => CatalogStore.upsert(d, name.toLowerCase, root))
    tables.put(name.toLowerCase, root)
    refreshView(spark, name)
  }

  /** Register REFUSING an existing binding — the `SHALLOW CLONE` path's
    * contract, mirroring the DSv2 catalog's createExclusive CREATE: on
    * a durable warehouse a last-wins [[register]] here could silently
    * rebind a name created by another JVM between this session's parse
    * and its write-through. The CAS inside
    * [[CatalogStore.createExclusive]] serializes racing creators so
    * exactly one wins; session-local mode refuses on the cached map.
    * The explicit [[register]] helper stays last-wins on purpose (it
    * is the user-facing "bind this name HERE" verb, documented). */
  private def registerExclusive(spark: SparkSession, name: String,
                                root: String): Unit = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"table name must be a bare identifier, got '$name'")
    val key = name.toLowerCase
    this.synchronized {
      sync() // see another JVM's bindings before the local-map check
      store match {
        case Some(d) =>
          require(CatalogStore.createExclusive(d, key, root),
            s"table $name already exists in the attached warehouse — " +
              "CLONE refuses to rebind it (DROP it first, or pick " +
              "another name)")
        case None =>
          require(!tables.containsKey(key),
            s"table $name is already registered — CLONE refuses to " +
              "rebind it (unregister it first, or pick another name)")
      }
      tables.put(key, root)
    }
    refreshView(spark, name)
  }

  /** Drop `name` from the registry (its temp view, if any, is left to
    * the session). A finished job's temp-rooted table must not stay
    * registered — [[execute]] re-resolves every registered root, and a
    * vanished one would otherwise fail unrelated statements. Removes
    * durable state too when a warehouse is attached. */
  def unregister(name: String): Unit = {
    store.foreach(d => CatalogStore.remove(d, name.toLowerCase))
    tables.remove(name.toLowerCase)
    ()
  }

  /** Forget cached bindings (the fresh-JVM simulation seam; the next
    * resolution reloads from the attached warehouse, if any). */
  def resetCache(): Unit = this.synchronized {
    tables.clear()
    storeGen = -1L
    storeOwned = Set.empty
  }

  private def rootOf(name: String): String = {
    sync()
    val r = tables.get(name.toLowerCase)
    require(r != null, s"table '$name' is not registered with GraftSql")
    r
  }

  private def refreshView(spark: SparkSession, name: String): Unit =
    VersionedTable.scan(spark, rootOf(name))
      .createOrReplaceTempView(name)

  /** Refresh every registered table's view to its current snapshot. A
    * root that no longer resolves (a finished job's temp table never
    * unregistered — `scan` raises "no versions at ...") is SKIPPED,
    * never allowed to fail an unrelated statement; the stale name
    * errors only if the statement actually references it. Any OTHER
    * failure (a genuinely corrupt manifest) propagates here, at the
    * statement that observed it — a broad catch would surface it later
    * as a confusing stale-view read instead of the root cause. */
  private def refreshAll(spark: SparkSession): Unit = {
    sync() // pick up other JVMs' CREATEs before the passthrough plans
    val it = tables.keySet.iterator()
    while (it.hasNext) {
      val n = it.next()
      try refreshView(spark, n)
      catch {
        case e: RuntimeException
            if e.getMessage != null &&
              e.getMessage.startsWith("no versions at") => ()
      }
    }
  }

  private def result(spark: SparkSession, op: String, table: String,
                     version: Long, rows: Long): DataFrame = {
    import spark.implicits._
    Seq((op, table, version, rows)).toDF("op", "table", "version", "rows")
  }

  // Statement-shape recognizers match only the statement HEAD (verb +
  // bare table identifier, enforced at register()); everything after —
  // SET lists, WHERE predicates, ON conditions — is located by the
  // QUOTE-AWARE scanners below, never by regex over the body: a string
  // literal containing ' WHERE ' or ' AND ' must not split the
  // statement at the wrong point. DOTALL so clauses span lines.
  private val InsertSql = // \s* before the body: `INSERT INTO t(a,b)`
    """(?is)\s*INSERT\s+INTO\s+([A-Za-z_][A-Za-z0-9_]*)\s*(.+)""".r
  private val DeleteSql =
    """(?is)\s*DELETE\s+FROM\s+([A-Za-z_][A-Za-z0-9_]*)\s+WHERE\s+(.+?)\s*;?\s*""".r
  // SQL's DELETE-everything shape, explicit: without it the statement
  // would fall through to spark.sql over a read-only temp view and
  // surface a confusing Catalyst error instead of a full-table delete
  private val DeleteAllSql =
    """(?is)\s*DELETE\s+FROM\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*""".r
  private val UpdateSql =
    """(?is)\s*UPDATE\s+([A-Za-z_][A-Za-z0-9_]*)\s+SET\s+(.+?)\s*;?\s*""".r
  private val MergeHead =
    """(?is)\s*MERGE\s+INTO\s+([A-Za-z_][A-Za-z0-9_]*)(?:\s+AS\s+(\w+))?\s+USING\s+(.+)""".r
  // CHECK constraint DDL (the Delta ALTER TABLE ADD CONSTRAINT role —
  // Spark's own parser has no CHECK grammar, so the text surface
  // lives here): the CHECK body is captured from its open paren and
  // span-matched quote-aware (a regex close-paren would bite inside
  // a nested expression).
  //
  // Concurrency (round 15 — the round-12 residual closed): the
  // constraint set lives INSIDE the versioned commit protocol. ADD
  // CONSTRAINT validates the snapshot at its base version and commits
  // a `#constraint` state line under the same CAS every writer uses —
  // a win proves the validated snapshot was the pre-commit state;
  // writers revalidate (append family) or recompute (rebase
  // classifiers) when a constraint commit interleaves, so neither
  // interleaving of ADD-vs-violating-write can land a committed
  // violation. The one remaining corner is MOR overlay patches (they
  // commit outside the chain): ADD re-scans after its commit when
  // overlays are pending and withdraws loudly on a hit.
  private val AddConstraintSql =
    ("""(?is)\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+ADD\s+""" +
      """CONSTRAINT\s+([A-Za-z_][A-Za-z0-9_]*)\s+CHECK\s*(\(.+)""").r
  private val DropConstraintSql =
    ("""(?is)\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+DROP\s+""" +
      """CONSTRAINT\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*""").r
  // Column-lifecycle DDL (the Delta column-mapping role — metadata-only
  // commits, zero files moved): DROP COLUMN retires the physical slot,
  // RENAME COLUMN pins it under the new logical name
  private val DropColumnSql =
    ("""(?is)\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+DROP\s+""" +
      """COLUMN\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*""").r
  private val RenameColumnSql =
    ("""(?is)\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+RENAME\s+""" +
      """COLUMN\s+([A-Za-z_][A-Za-z0-9_]*)\s+TO\s+""" +
      """([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*""").r
  // ALTER COLUMN c TYPE <sql-type> — metadata-only WIDENING (the Delta
  // type-widening role); the type text parses through Spark's own DDL
  // parser, so DECIMAL(20,2) etc. work
  private val WidenColumnSql =
    ("""(?is)\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+ALTER\s+""" +
      """COLUMN\s+([A-Za-z_][A-Za-z0-9_]*)\s+(?:SET\s+DATA\s+)?TYPE\s+""" +
      """([A-Za-z0-9_(), ]+?)\s*;?\s*""").r
  // ALTER COLUMN c SET GENERATED ALWAYS AS IDENTITY [START WITH n] —
  // the Delta identity-column role: the high-water mark lives in the
  // manifest and keys are allocated inside the commit
  private val SetIdentitySql =
    ("""(?is)\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+ALTER\s+""" +
      """COLUMN\s+([A-Za-z_][A-Za-z0-9_]*)\s+SET\s+GENERATED\s+ALWAYS\s+""" +
      """AS\s+IDENTITY(?:\s+START\s+WITH\s+(-?\d+))?\s*;?\s*""").r
  private val DropIdentitySql =
    ("""(?is)\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+ALTER\s+""" +
      """COLUMN\s+([A-Za-z_][A-Za-z0-9_]*)\s+DROP\s+IDENTITY\s*;?\s*""").r
  // ALTER COLUMN c SET DEFAULT <expr> / DROP DEFAULT — the Delta
  // column-default role: unlisted INSERT columns fill the expression
  private val SetDefaultSql =
    ("""(?is)\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+ALTER\s+""" +
      """COLUMN\s+([A-Za-z_][A-Za-z0-9_]*)\s+SET\s+DEFAULT\s+""" +
      """(.+?)\s*;?\s*""").r
  private val DropDefaultSql =
    ("""(?is)\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+ALTER\s+""" +
      """COLUMN\s+([A-Za-z_][A-Za-z0-9_]*)\s+DROP\s+DEFAULT\s*;?\s*""").r
  // Maintenance verbs (the Delta OPTIMIZE / VACUUM / DESCRIBE HISTORY
  // SQL surface): ZORDER BY columns are bare identifiers (validated),
  // so a regex paren capture is safe here
  private val OptimizeSql =
    ("""(?is)\s*OPTIMIZE\s+([A-Za-z_][A-Za-z0-9_]*)""" +
      """(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*""").r
  private val VacuumSql =
    ("""(?is)\s*VACUUM\s+([A-Za-z_][A-Za-z0-9_]*)""" +
      """(?:\s+RETAIN\s+(\d+)\s+HOURS)?\s*;?\s*""").r
  private val DescribeHistorySql =
    """(?is)\s*DESCRIBE\s+HISTORY\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*""".r
  // row-level CDC between two versions (the Delta table_changes role)
  private val DescribeChangesSql =
    ("""(?is)\s*DESCRIBE\s+CHANGES\s+([A-Za-z_][A-Za-z0-9_]*)\s+""" +
      """BETWEEN\s+(\d+)\s+AND\s+(\d+)\s*;?\s*""").r
  private val RestoreSql =
    ("""(?is)\s*RESTORE\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+TO\s+""" +
      """VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""").r
  // CREATE TABLE n SHALLOW CLONE t [VERSION AS OF v] LOCATION '...'
  private val CloneSql =
    ("""(?is)\s*CREATE\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+SHALLOW\s+""" +
      """CLONE\s+([A-Za-z_][A-Za-z0-9_]*)""" +
      """(?:\s+VERSION\s+AS\s+OF\s+(\d+))?""" +
      """\s+LOCATION\s+'([^']+)'\s*;?\s*""").r

  // Metadata listing verbs (the last Presto-shaped serving surface:
  // SHOW TABLES / DESCRIBE TABLE / SHOW PARTITIONS) — all answered
  // from the registry + sidecars + manifest paths, zero file opens
  private val ShowTablesSql = """(?is)\s*SHOW\s+TABLES\s*;?\s*""".r
  private val DescribeTableSql =
    """(?is)\s*DESCRIBE\s+(?:TABLE\s+)?([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*""".r
  private val ShowPartitionsSql =
    """(?is)\s*SHOW\s+PARTITIONS\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*""".r
  private val DescribeDetailSql =
    """(?is)\s*DESCRIBE\s+DETAIL\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*""".r

  private val MergeActions =
    ("""(?is)\s*WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*""" +
      """\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*;?\s*""").r

  /** Index of the first TOP-LEVEL occurrence of keyword `kw` in `s` —
    * outside single-quoted literals, outside parentheses, outside
    * CASE ... END expressions, whole-word (identifier characters on
    * neither side) — or -1. The shared boundary locator for
    * WHERE/ON/AND/WHEN/THEN: regex splits would bite on the same
    * keyword inside a string literal, a subquery, or a CASE arm
    * (`SET v = CASE WHEN ... THEN ... END` must not split a MERGE
    * clause at the CASE's own WHEN/THEN). */
  private def topLevelKeyword(s: String, kw: String, from: Int = 0): Int = {
    var i = math.max(0, from)
    var inStr = false
    var depth = 0
    var caseDepth = 0
    val n = s.length
    val k = kw.length
    def ident(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    def word(at: Int, w: String) =
      s.regionMatches(true, at, w, 0, w.length) &&
        (at == 0 || !ident(s.charAt(at - 1))) &&
        (at + w.length >= n || !ident(s.charAt(at + w.length)))
    while (i < n) {
      val c = s.charAt(i)
      if (inStr && c == '\\') i += 1 // backslash-escaped char in a literal
      else if (c == '\'') inStr = !inStr
      else if (!inStr && c == '(') depth += 1
      else if (!inStr && c == ')') depth -= 1
      else if (!inStr && depth == 0 && word(i, "CASE")) {
        caseDepth += 1; i += 3
      } else if (!inStr && depth == 0 && caseDepth > 0 && word(i, "END")) {
        caseDepth -= 1; i += 2
      } else if (!inStr && depth == 0 && caseDepth == 0 && word(i, kw))
        return i
      i += 1
    }
    -1
  }

  /** Split `s` on every top-level occurrence of keyword `kw`. */
  private def splitTopLevel(s: String, kw: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var i = topLevelKeyword(s, kw, 0)
    while (i >= 0) {
      out += s.substring(start, i)
      start = i + kw.length
      i = topLevelKeyword(s, kw, start)
    }
    out += s.substring(start)
    out.toSeq
  }

  /** First top-level (quote/paren-aware) index of `ch`, or -1. */
  private def topLevelChar(s: String, ch: Char): Int = {
    var i = 0
    var inStr = false
    var depth = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr && c == '\\') i += 1 // backslash-escaped char in a literal
      else if (c == '\'') inStr = !inStr
      else if (!inStr && c == '(') depth += 1
      else if (!inStr && c == ')') depth -= 1
      else if (!inStr && depth == 0 && c == ch) return i
      i += 1
    }
    -1
  }

  /** Index just past the close paren matching the OPEN at position 0 —
    * single-quote-aware, so a subquery source containing `JOIN ... ON`
    * or string literals parses whole instead of splitting at the first
    * keyword a regex would bite on. */
  private def parenSpan(s: String): Int = {
    var depth = 0
    var i = 0
    var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr && c == '\\') i += 1 // backslash-escaped char in a literal
      else if (c == '\'') inStr = !inStr
      else if (!inStr && c == '(') depth += 1
      else if (!inStr && c == ')') {
        depth -= 1
        if (depth == 0) return i + 1
      }
      i += 1
    }
    sys.error(s"unbalanced parentheses in MERGE source: $s")
  }

  /** Execute one statement: DML routes to the engine paths; anything
    * else runs as `spark.sql` over the registered tables' current
    * snapshots. */
  def execute(spark: SparkSession, sql: String): DataFrame = sql match {
    case AddConstraintSql(t, n, rest) =>
      val e = parenSpan(rest)
      require(rest.drop(e).trim.stripSuffix(";").trim.isEmpty,
        s"trailing text after CHECK (...): '${rest.drop(e)}'")
      VersionedTable.addConstraint(spark, rootOf(t), n,
        rest.substring(1, e - 1).trim)
      result(spark, "ADD CONSTRAINT", t,
        VersionedTable.latestVersion(rootOf(t)).getOrElse(-1L), -1L)
    case DropConstraintSql(t, n) =>
      VersionedTable.dropConstraint(rootOf(t), n)
      result(spark, "DROP CONSTRAINT", t,
        VersionedTable.latestVersion(rootOf(t)).getOrElse(-1L), -1L)
    case DropColumnSql(t, c) =>
      val v = VersionedTable.alterDropColumn(spark, rootOf(t), c)
      result(spark, "DROP COLUMN", t, v, -1L)
    case RenameColumnSql(t, from, to) =>
      val v = VersionedTable.alterRenameColumn(spark, rootOf(t), from, to)
      result(spark, "RENAME COLUMN", t, v, -1L)
    case WidenColumnSql(t, c, tpe) =>
      val dt = org.apache.spark.sql.types.DataType
        .fromDDL(tpe.trim) // Spark's own type grammar
      val v = VersionedTable.alterWidenColumn(spark, rootOf(t), c, dt)
      result(spark, "ALTER COLUMN TYPE", t, v, -1L)
    case SetDefaultSql(t, c, d) =>
      val v = VersionedTable.alterSetDefault(spark, rootOf(t), c, d.trim)
      result(spark, "SET DEFAULT", t, v, -1L)
    case DropDefaultSql(t, c) =>
      val v = VersionedTable.alterDropDefault(spark, rootOf(t), c)
      result(spark, "DROP DEFAULT", t, v, -1L)
    case SetIdentitySql(t, c, start) =>
      val v = VersionedTable.alterSetIdentity(spark, rootOf(t), c,
        Option(start).map(_.toLong).getOrElse(1L))
      result(spark, "SET IDENTITY", t, v, -1L)
    case DropIdentitySql(t, c) =>
      val v = VersionedTable.alterDropIdentity(spark, rootOf(t), c)
      result(spark, "DROP IDENTITY", t, v, -1L)
    case OptimizeSql(t, zcols) =>
      val root = rootOf(t)
      val v =
        if (zcols == null) VersionedTable.compact(spark, root)
        else {
          val cols = zcols.split(',').map(_.trim).toSeq
          require(cols.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
            s"ZORDER BY columns must be bare identifiers, got $cols")
          val latest = VersionedTable.latestVersion(root)
            .getOrElse(sys.error(s"no versions at $root"))
          // re-layout file count sized to ~128 MiB targets from the
          // manifest's own byte totals (filesystem fallback for
          // legacy stat-less lines)
          val bytes = VersionedTable.scanListing(root, Some(latest))
            .map(f => f.bytes.getOrElse(new java.io.File(f.path).length()))
            .sum
          val numFiles = math.max(1,
            math.ceil(bytes.toDouble / (128L << 20)).toInt)
          VersionedTable.compactZOrderedK(spark, root, cols, numFiles)
        }
      result(spark, "OPTIMIZE", t, v, -1L)
    case VacuumSql(t, hours) =>
      // Delta's default retention (168h) unless RETAIN is explicit;
      // the engine's horizon rule keeps pinned readers safe
      val retainMs = Option(hours).map(_.toLong * 3600000L)
        .getOrElse(168L * 3600000L)
      val n = VersionedTable.vacuum(rootOf(t), retainVersions = 1,
        retainMillis = retainMs)
      result(spark, "VACUUM", t,
        VersionedTable.latestVersion(rootOf(t)).getOrElse(-1L), n.toLong)
    case DescribeHistorySql(t) =>
      import spark.implicits._
      VersionedTable.historyWithRetention(rootOf(t), 0L)
        .map { case (v, files, rows, ts, _) =>
          (v, files.toLong, rows, new java.sql.Timestamp(ts)) }
        .toDF("version", "files", "rows", "commit_time")
        .orderBy(col("version"))
    case DescribeDetailSql(t) =>
      // the Delta DESCRIBE DETAIL card: one row of table-level facts,
      // ALL from the manifest/sidecars (format, location, committed
      // version, file count, total bytes, row total when every file
      // records one, partition columns, constraint count) — zero file
      // opens at any table size
      import spark.implicits._
      val root = rootOf(t)
      val v = VersionedTable.latestVersion(root)
        .getOrElse(sys.error(s"no versions at $root"))
      val files = VersionedTable.scanListing(root, Some(v))
      Seq((
        "graft", t, root, v,
        files.length.toLong,
        files.flatMap(_.bytes).sum,
        VersionedTable.countRows(root).getOrElse(-1L),
        VersionedTable.partitionSchema(root).fieldNames.mkString(","),
        VersionedTable.constraintsOf(root).length.toLong
      )).toDF("format", "name", "location", "version", "num_files",
        "size_bytes", "num_rows", "partition_columns", "num_constraints")
    case ShowTablesSql() =>
      import spark.implicits._
      import scala.jdk.CollectionConverters._
      sync() // other JVMs' CREATE/DROP must show
      tables.asScala.toSeq.sortBy(_._1).map { case (n, r) =>
        (n, r, VersionedTable.latestVersion(r).getOrElse(-1L))
      }.toDF("table", "location", "version")
    case DescribeTableSql(t) =>
      // one sidecar read (scan-cached), zero file opens: name, Spark
      // SQL type, nullability, partition role — schema order
      import spark.implicits._
      val root = rootOf(t)
      val part = VersionedTable.partitionSchema(root)
        .fieldNames.map(_.toLowerCase).toSet
      VersionedTable.scan(spark, root).schema.fields.toSeq.map { f =>
        (f.name, f.dataType.sql.toLowerCase, f.nullable,
          part.contains(f.name.toLowerCase))
      }.toDF("col_name", "data_type", "nullable", "is_partition")
    case ShowPartitionsSql(t) =>
      // manifest-path parse, metadata-only at any table size — the
      // Hive `col=value` segments of the CURRENT listing, distinct
      import spark.implicits._
      val root = rootOf(t)
      val ps = VersionedTable.partitionSchema(root)
      require(ps.nonEmpty, s"table '$t' is not partitioned")
      val v = VersionedTable.latestVersion(root)
        .getOrElse(sys.error(s"no versions at $root"))
      VersionedTable.listingPaths(root, v).flatMap { p =>
        val segs = p.split('/')
        val vals = ps.fieldNames.map(n => segs.collectFirst {
          case seg if seg.startsWith(n + "=") =>
            org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .unescapePathName(seg.substring(n.length + 1))
        })
        if (vals.forall(_.isDefined))
          Some(ps.fieldNames.zip(vals.map(_.get))
            .map { case (n, x) => s"$n=$x" }.mkString("/"))
        else None
      }.distinct.sorted.toDF("partition")
    case DescribeChangesSql(t, v1, v2) =>
      // row-level CDC (the Delta table_changes role): every row of v2
      // not in v1 tagged insert, every v1 row gone from v2 tagged
      // delete (updates = their delete+insert pair, multiset
      // semantics); files common to both manifests cancel at PLAN
      // time and are never read
      require(v1.toLong <= v2.toLong,
        s"DESCRIBE CHANGES range is empty: $v1 > $v2")
      VersionedTable.diffVersions(spark, rootOf(t), v1.toLong, v2.toLong)
    case RestoreSql(t, v) =>
      // rollback-as-roll-forward: a NEW version pointing at the old
      // file set — history is preserved, vacuum governs reclamation
      val committed = VersionedTable.restore(rootOf(t), v.toLong)
      result(spark, "RESTORE", t, committed, -1L)
    case CloneSql(n, t, v, loc) =>
      // zero-copy table: version 0 of the clone references the
      // source's files by path (vacuum the SOURCE with care); the
      // clone registers under its own name immediately
      val srcRoot = rootOf(t)
      val pinned = Option(v).map(_.toLong)
      // fail fast on a visibly-taken name before materializing the
      // clone; registerExclusive below is the authoritative (CAS)
      // check — a racer that slips between the two loses there, and
      // the already-written clone metadata stays at `loc` for the
      // caller to inspect or delete
      require(!tables.containsKey(n.toLowerCase),
        s"table $n already exists — CLONE refuses to rebind it")
      VersionedTable.shallowCloneAt(srcRoot, loc, pinned)
      registerExclusive(spark, n, loc)
      result(spark, "CLONE", n, 0L,
        VersionedTable.countRows(loc, Some(0L)).getOrElse(-1L))
    case InsertSql(t, sourceSql) => insert(spark, t, sourceSql)
    case DeleteSql(t, pred) =>
      val v = VersionedTable.delete(spark, rootOf(t), expr(pred))
      result(spark, "DELETE", t, v, -1L)
    case DeleteAllSql(t) => // SQL semantics: no WHERE deletes every row
      val v = VersionedTable.delete(spark, rootOf(t), lit(true))
      result(spark, "DELETE", t, v, -1L)
    case UpdateSql(t, body) =>
      // the WHERE boundary is located quote-aware: a SET expression
      // containing ' WHERE ' in a string literal must not split there
      val (sets, p) = topLevelKeyword(body, "WHERE") match {
        case -1 => (body, lit(true))
        case i => (body.take(i), expr(body.drop(i + "WHERE".length)))
      }
      val v = VersionedTable.update(spark, rootOf(t), p, parseSets(sets))
      result(spark, "UPDATE", t, v, -1L)
    case MergeHead(t, tAlias, rest) =>
      val r = rest.trim
      val (source, afterSrc) =
        if (r.startsWith("(")) {
          val e = parenSpan(r)
          (r.take(e), r.drop(e))
        } else {
          val id = "^[A-Za-z_][A-Za-z0-9_.]*".r.findFirstIn(r)
            .getOrElse(sys.error(s"bad MERGE USING source: '$r'"))
          (id, r.drop(id.length))
        }
      def canonical(): Nothing = sys.error(
        "MERGE shape: MERGE INTO t [AS a] USING s [AS b] " +
          "ON <same-column equalities> then WHEN clauses — " +
          "WHEN MATCHED [AND c] THEN UPDATE SET */<assignments>, " +
          "WHEN MATCHED [AND c] THEN DELETE, " +
          "WHEN NOT MATCHED [BY TARGET] [AND c] THEN INSERT */(cols) " +
          "VALUES (exprs), " +
          "WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET " +
          "<assignments>/DELETE")
      // [AS alias] ON <cond> WHEN ... — boundaries scanned quote-aware,
      // so an ON condition containing ' WHEN ' or ' ON ' in a string
      // literal parses whole
      val onIdx = topLevelKeyword(afterSrc, "ON")
      if (onIdx < 0) canonical()
      val sAlias = afterSrc.take(onIdx).trim match {
        case "" => None
        case a if a.toUpperCase.startsWith("AS") =>
          Some(a.drop(2).trim).filter(_.matches("\\w+"))
            .orElse(canonical())
        case _ => canonical()
      }
      val whenIdx = topLevelKeyword(afterSrc, "WHEN", onIdx + 2)
      if (whenIdx < 0) canonical()
      val onCond = afterSrc.substring(onIdx + 2, whenIdx)
      val actions = afterSrc.substring(whenIdx)
      // canonical upsert keeps its dedicated engine path (merge());
      // any other clause combination routes to the general
      // first-true-clause executor (mergeActions)
      if (MergeActions.pattern.matcher(actions).matches())
        merge(spark, t, Option(tAlias), source, sAlias, onCond)
      else
        mergeGeneral(spark, t, Option(tAlias), source, sAlias, onCond,
          parseMergeClauses(actions))
    case other =>
      refreshAll(spark)
      spark.sql(other)
  }

  private def insert(spark: SparkSession, t: String,
                     sourceSql: String): DataFrame = {
    val root = rootOf(t)
    refreshAll(spark)
    // optional explicit column list: INSERT INTO t (a, b) SELECT ... —
    // listed columns map positionally, unlisted table columns take
    // NULL (SQL semantics); without a list, positions map to the full
    // table schema as before
    val body0 = sourceSql.trim
    val (cols, bodyC) =
      if (body0.startsWith("(")) {
        val e = parenSpan(body0)
        val listed = body0.substring(1, e - 1).split(',').map(_.trim).toSeq
        require(listed.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
          s"INSERT column list must be bare identifiers, got $listed")
        (Some(listed), body0.drop(e).trim)
      } else (None, body0)
    // Delta's idempotent partition-reload verb: INSERT INTO t
    // REPLACE WHERE <pred> SELECT ... — atomically swaps the rows
    // matching the predicate for the batch (VersionedTable.replaceWhere,
    // batch rows validated against the predicate). The predicate ends
    // where the top-level SELECT/VALUES source begins.
    val (replacePred, body) =
      if (topLevelKeyword(bodyC, "REPLACE") == 0) {
        val afterR = bodyC.drop("REPLACE".length).trim
        require(topLevelKeyword(afterR, "WHERE") == 0,
          "REPLACE must be followed by WHERE <predicate>")
        val afterW = afterR.drop("WHERE".length)
        val cut = Seq(topLevelKeyword(afterW, "SELECT"),
          topLevelKeyword(afterW, "VALUES")).filter(_ >= 0)
          .minOption.getOrElse(sys.error(
            "REPLACE WHERE needs a SELECT or VALUES source"))
        require(afterW.take(cut).trim.nonEmpty,
          "REPLACE WHERE needs a predicate before the source")
        (Some(expr(afterW.take(cut).trim)), afterW.drop(cut))
      } else (None, bodyC)
    val src = body.stripSuffix(";").trim match {
      case v if v.toUpperCase.startsWith("VALUES") =>
        spark.sql(s"SELECT * FROM ($v)")
      case q => spark.sql(q)
    }
    // the DECLARED schema (metadata kept): unlisted columns fill their
    // declared DEFAULT, not bare NULL
    val schema = VersionedTable.writeSchema(spark, root)
    // GENERATED ALWAYS AS IDENTITY: the engine assigns the column —
    // an INSERT may not list it (and a list-free INSERT on an identity
    // table is refused with guidance, since its positional mapping
    // would have to cover it); the aligned frame simply omits it and
    // append()'s transactional fill takes over
    val idCol = VersionedTable.identityColumnOf(schema).map(_.name)
    val target = cols.getOrElse(schema.fieldNames.toSeq)
    idCol.foreach { c =>
      require(!target.exists(_.equalsIgnoreCase(c)),
        s"column $c is GENERATED ALWAYS AS IDENTITY — omit it from the " +
          "INSERT (use an explicit column list without it)")
      require(replacePred.isEmpty,
        "INSERT REPLACE WHERE is not supported on identity tables — " +
          "the replaced rows' keys cannot be reassigned in place")
    }
    target.foreach(c => require(schema.fieldNames.exists(_.equalsIgnoreCase(c)),
      s"INSERT column '$c' not in table $t"))
    require(target.map(_.toLowerCase).distinct.length == target.length,
      s"INSERT column list repeats a column: $target")
    require(src.schema.length == target.length,
      s"INSERT column count ${src.schema.length} != ${target.length}")
    val byPos = target.map(_.toLowerCase).zip(src.columns).toMap
    // positional mapping + cast to the table schema, SQL INSERT style;
    // pinned once — the count and the append must see the SAME rows
    // (a non-deterministic source evaluated twice could write rows the
    // reported count never saw), and a large SELECT must not run twice
    val aligned = src.select(schema.fields.toSeq
      .filterNot(f => idCol.exists(_.equalsIgnoreCase(f.name))).map { f =>
      byPos.get(f.name.toLowerCase) match {
        case Some(c) => col(c).cast(f.dataType).as(f.name)
        case None => VersionedTable.defaultOrNull(f).as(f.name)
      }
    }: _*).localCheckpoint(true)
    val n = aligned.count()
    val v = replacePred match {
      case Some(p) => VersionedTable.replaceWhere(spark, root, p, aligned)
      case None => VersionedTable.append(aligned, root)
    }
    result(spark, "INSERT", t, v, n)
  }

  /** Top-level comma split — paren/quote/escape-aware. */
  private def splitTopComma(s: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var inStr = false
    var esc = false
    val cur = new StringBuilder
    s.foreach {
      case c if esc => esc = false; cur += c
      case '\\' if inStr => esc = true; cur += '\\'
      case '\'' => inStr = !inStr; cur += '\''
      case '(' if !inStr => depth += 1; cur += '('
      case ')' if !inStr => depth -= 1; cur += ')'
      case ',' if !inStr && depth == 0 => parts += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) parts += cur.toString
    parts.toSeq
  }

  /** Top-level comma split of `SET a = e1, b = e2`; each right-hand
    * side is Spark-parsed. The `=` is located quote-aware — an RHS
    * string literal containing '=' must not split the assignment. */
  private def parseSets(
      sets: String): Map[String, org.apache.spark.sql.Column] =
    splitTopComma(sets).map { a =>
      val i = topLevelChar(a, '=')
      require(i > 0, s"bad SET assignment: '$a'")
      a.take(i).trim -> expr(a.drop(i + 1).trim)
    }.toMap

  /** Parse the WHEN-clause tail of a non-canonical MERGE into
    * [[VersionedTable.MergeClause]]s (declared order preserved — it is
    * the first-true-clause precedence). Every boundary (WHEN/THEN/AND/
    * VALUES, commas, parens) is located quote-aware. */
  private def parseMergeClauses(
      actions: String): Seq[VersionedTable.MergeClause] = {
    import VersionedTable.MergeClause._
    val parts = splitTopLevel(actions, "WHEN").map(_.trim).filter(_.nonEmpty)
    require(parts.nonEmpty, "MERGE needs at least one WHEN clause")
    parts.map { c0 =>
      val c = c0.stripSuffix(";").trim
      val thenIdx = topLevelKeyword(c, "THEN")
      require(thenIdx > 0, s"MERGE clause missing THEN: 'WHEN $c'")
      val head = c.take(thenIdx).trim
      val action = c.drop(thenIdx + "THEN".length).trim
      val neg = head.toUpperCase.startsWith("NOT")
      val afterNot = if (neg) head.drop(3).trim else head
      require(afterNot.toUpperCase.startsWith("MATCHED"),
        s"MERGE clause must open WHEN [NOT] MATCHED: 'WHEN $c'")
      val afterM0 = afterNot.drop("MATCHED".length).trim
      // WHEN NOT MATCHED [BY TARGET | BY SOURCE]: BY TARGET is the
      // explicit spelling of the plain insert family; BY SOURCE is the
      // Delta full-sync family (target rows with no source match)
      val (bySource, afterM) =
        if (neg && afterM0.toUpperCase.matches("(?s)BY\\s+SOURCE\\b.*"))
          (true, afterM0.drop(2).trim.drop("SOURCE".length).trim)
        else if (neg && afterM0.toUpperCase.matches("(?s)BY\\s+TARGET\\b.*"))
          (false, afterM0.drop(2).trim.drop("TARGET".length).trim)
        else (false, afterM0)
      val cond =
        if (afterM.isEmpty) None
        else {
          require(topLevelKeyword(afterM, "AND") == 0,
            s"only AND <condition> may follow MATCHED: 'WHEN $c'")
          Some(expr(afterM.drop(3).trim))
        }
      val au = action.toUpperCase
      if (bySource && au.startsWith("UPDATE")) {
        val setIdx = topLevelKeyword(action, "SET")
        require(setIdx > 0, s"UPDATE action needs SET: '$action'")
        val body = action.drop(setIdx + "SET".length).trim
        require(body != "*",
          "BY SOURCE UPDATE needs an explicit SET list — there is no " +
            "source row to take SET * values from")
        UpdateBySource(cond, parseSets(body))
      } else if (bySource && au == "DELETE") DeleteBySource(cond)
      else if (bySource) sys.error(
        s"WHEN NOT MATCHED BY SOURCE supports UPDATE SET/DELETE only: " +
          s"'WHEN $c'")
      else if (!neg && au.startsWith("UPDATE")) {
        val setIdx = topLevelKeyword(action, "SET")
        require(setIdx > 0, s"UPDATE action needs SET: '$action'")
        val body = action.drop(setIdx + "SET".length).trim
        if (body == "*") Update(cond, Map.empty)
        else Update(cond, parseSets(body))
      } else if (!neg && au == "DELETE") Delete(cond)
      else if (neg && au.startsWith("INSERT")) {
        val body = action.drop("INSERT".length).trim
        if (body == "*") Insert(cond, Map.empty)
        else {
          require(body.startsWith("("),
            s"INSERT action must be INSERT * or INSERT (cols) VALUES " +
              s"(exprs): '$action'")
          val e = parenSpan(body)
          val cols = splitTopComma(body.substring(1, e - 1)).map(_.trim)
          require(cols.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
            s"INSERT column list must be bare identifiers, got $cols")
          require(cols.map(_.toLowerCase).distinct.length == cols.length,
            s"INSERT column list repeats a column: $cols")
          val rest = body.drop(e).trim
          require(topLevelKeyword(rest, "VALUES") == 0,
            s"INSERT (cols) needs VALUES (exprs): '$action'")
          val vb = rest.drop("VALUES".length).trim
          require(vb.startsWith("("), s"VALUES needs (exprs): '$action'")
          val e2 = parenSpan(vb)
          require(vb.drop(e2).trim.isEmpty,
            s"exactly one VALUES row per INSERT clause: '$action'")
          val exprs = splitTopComma(vb.substring(1, e2 - 1))
            .map(t => expr(t.trim))
          require(cols.length == exprs.length,
            s"INSERT lists ${cols.length} columns but ${exprs.length} values")
          Insert(cond, cols.zip(exprs).toMap)
        }
      } else sys.error(
        s"unsupported MERGE action (UPDATE SET/DELETE need MATCHED or " +
          s"NOT MATCHED BY SOURCE, INSERT needs NOT MATCHED): 'WHEN $c'")
    }
  }

  /** Keys from the ON conjunction: every conjunct must be an equality
    * between the SAME column name on both sides (the keyed upsert —
    * also the file-pruning key) — anything else is not
    * VersionedTable merge semantics. Conjuncts and equality splits are
    * located QUOTE-AWARE — ' AND ' or '=' inside a string literal must
    * not split the condition. */
  private def onKeyCols(t: String, tAlias: Option[String], srcText: String,
                        sAlias: Option[String], onCond: String): Seq[String] = {
    val tNames = Set(t.toLowerCase) ++ tAlias.map(_.toLowerCase)
    val sNames = sAlias.map(_.toLowerCase).toSet + srcText.toLowerCase
    splitTopLevel(onCond, "AND").map { c =>
      val eq = topLevelChar(c, '=')
      require(eq > 0 && topLevelChar(c, '<') < 0 && topLevelChar(c, '>') < 0 &&
        c.charAt(eq - 1) != '!' && topLevelChar(c.drop(eq + 1), '=') < 0,
        s"MERGE ON conjunct must be an equality: '$c'")
      val sides = Seq(c.take(eq).trim, c.drop(eq + 1).trim)
      val cols = sides.map { s =>
        val p = s.split('.')
        if (p.length == 2) {
          require(tNames.contains(p(0).toLowerCase) ||
            sNames.contains(p(0).toLowerCase),
            s"unknown qualifier '${p(0)}' in MERGE ON")
          p(1)
        } else s
      }
      require(cols(0).equalsIgnoreCase(cols(1)),
        s"MERGE ON must equate the same column on both sides, got '$c'")
      cols(0)
    }
  }

  private def merge(spark: SparkSession, t: String, tAlias: Option[String],
                    source: String, sAlias: Option[String],
                    onCond: String): DataFrame = {
    val root = rootOf(t)
    refreshAll(spark)
    val srcText = source.trim
    // pinned ONCE before both uses (mirrors insert()): the merge and
    // the reported row count must see the SAME rows — a
    // non-deterministic source evaluated twice could report a count
    // the merge never saw, and a large SELECT must not pay its scan
    // twice
    val src = spark.sql(s"SELECT * FROM $srcText").localCheckpoint(true)
    val keys = onKeyCols(t, tAlias, srcText, sAlias, onCond)
    val n = src.count()
    val v = VersionedTable.merge(spark, root, src, keys)
    result(spark, "MERGE", t, v, n)
  }

  /** Non-canonical MERGE → [[VersionedTable.mergeActions]]. Clause
    * conditions and values resolve against the target alias (default:
    * the table name) and the source alias (default: the source's own
    * name when it is a bare table; a subquery source with clauses
    * needs an explicit alias to be referenceable at all). The source
    * is NOT pinned here — mergeActions pins it once internally. */
  private def mergeGeneral(spark: SparkSession, t: String,
                           tAlias: Option[String], source: String,
                           sAlias: Option[String], onCond: String,
                           clauses: Seq[VersionedTable.MergeClause]): DataFrame = {
    val root = rootOf(t)
    refreshAll(spark)
    val srcText = source.trim
    val keys = onKeyCols(t, tAlias, srcText, sAlias, onCond)
    val src = spark.sql(s"SELECT * FROM $srcText")
    val ta = tAlias.getOrElse(t)
    val sa = sAlias
      .orElse(Some(srcText).filter(_.matches("[A-Za-z_][A-Za-z0-9_]*")))
      .getOrElse(sys.error(
        "a subquery MERGE source with conditional clauses needs an " +
          "alias: USING (...) AS s"))
    // SQL MERGE allows target-qualified SET columns (`SET t.v = ...`);
    // the engine keys SET/INSERT maps by BARE column name — strip a
    // target qualifier, reject any other (a source-qualified SET
    // target is not assignable)
    val tNames = Set(t.toLowerCase, ta.toLowerCase)
    def bare(k: String): String = {
      val p = k.split('.')
      if (p.length == 1) k
      else {
        require(p.length == 2 && tNames.contains(p(0).toLowerCase),
          s"SET/INSERT column must be a target column, got '$k'")
        p(1)
      }
    }
    val normalized = clauses.map {
      case VersionedTable.MergeClause.Update(c, set) =>
        VersionedTable.MergeClause.Update(c,
          set.map { case (k, e) => bare(k) -> e })
      case VersionedTable.MergeClause.Insert(c, vs) =>
        VersionedTable.MergeClause.Insert(c,
          vs.map { case (k, e) => bare(k) -> e })
      case VersionedTable.MergeClause.UpdateBySource(c, set) =>
        VersionedTable.MergeClause.UpdateBySource(c,
          set.map { case (k, e) => bare(k) -> e })
      case d => d
    }
    val v = VersionedTable.mergeActions(
      spark, root, src, keys, normalized, ta, sa)
    result(spark, "MERGE", t, v, -1L)
  }
}
