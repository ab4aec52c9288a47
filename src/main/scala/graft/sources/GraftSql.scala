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
  *  - `INSERT INTO t SELECT ...` / `INSERT INTO t VALUES (...), ...`
  *    (positional columns, cast to the table schema) → append commit;
  *  - `DELETE FROM t WHERE p` → [[VersionedTable.delete]] (file-pruned
  *    COW, SQL null-predicate semantics);
  *  - `UPDATE t SET c = e, ... [WHERE p]` → [[VersionedTable.update]];
  *  - `MERGE INTO t USING s ON t.k = s.k [AND ...] WHEN MATCHED THEN
  *    UPDATE SET * WHEN NOT MATCHED THEN INSERT *` — the canonical
  *    keyed upsert (exactly [[VersionedTable.merge]]); `s` is a
  *    registered/temp table name or a parenthesized subquery. Other
  *    MERGE action shapes are rejected with a clear error rather than
  *    silently narrowed.
  *
  * DML returns a one-row DataFrame `(op, table, version, rows)` —
  * the committed version and the rows written/affected where the
  * engine path reports them. */
object GraftSql {

  private val tables =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Register `name` → a VersionedTable root. SELECT statements see
    * the table's latest snapshot (re-resolved per [[execute]] call,
    * MOR overlays included via [[VersionedTable.scan]]). */
  def register(spark: SparkSession, name: String, root: String): Unit = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"table name must be a bare identifier, got '$name'")
    tables.put(name.toLowerCase, root)
    refreshView(spark, name)
  }

  /** Drop `name` from the registry (its temp view, if any, is left to
    * the session). A finished job's temp-rooted table must not stay
    * registered — [[execute]] re-resolves every registered root, and a
    * vanished one would otherwise fail unrelated statements. */
  def unregister(name: String): Unit = {
    tables.remove(name.toLowerCase)
    ()
  }

  private def rootOf(name: String): String = {
    val r = tables.get(name.toLowerCase)
    require(r != null, s"table '$name' is not registered with GraftSql")
    r
  }

  private def refreshView(spark: SparkSession, name: String): Unit =
    VersionedTable.scan(spark, rootOf(name))
      .createOrReplaceTempView(name)

  /** Refresh every registered table's view to its current snapshot. A
    * root that no longer resolves (a finished job's temp table never
    * unregistered) is SKIPPED, never allowed to fail an unrelated
    * statement — the stale name errors only if the statement actually
    * references it. */
  private def refreshAll(spark: SparkSession): Unit = {
    val it = tables.keySet.iterator()
    while (it.hasNext) {
      val n = it.next()
      try refreshView(spark, n)
      catch { case _: RuntimeException => () }
    }
  }

  private def result(spark: SparkSession, op: String, table: String,
                     version: Long, rows: Long): DataFrame = {
    import spark.implicits._
    Seq((op, table, version, rows)).toDF("op", "table", "version", "rows")
  }

  // Statement-shape recognizers. DOTALL so WHERE clauses span lines;
  // table names are bare identifiers (enforced at register()).
  private val InsertSql =
    """(?is)\s*INSERT\s+INTO\s+([A-Za-z_][A-Za-z0-9_]*)\s+(.+)""".r
  private val DeleteSql =
    """(?is)\s*DELETE\s+FROM\s+([A-Za-z_][A-Za-z0-9_]*)\s+WHERE\s+(.+?)\s*;?\s*""".r
  private val UpdateSql =
    """(?is)\s*UPDATE\s+([A-Za-z_][A-Za-z0-9_]*)\s+SET\s+(.+?)(?:\s+WHERE\s+(.+?))?\s*;?\s*""".r
  private val MergeHead =
    """(?is)\s*MERGE\s+INTO\s+([A-Za-z_][A-Za-z0-9_]*)(?:\s+AS\s+(\w+))?\s+USING\s+(.+)""".r

  private val MergeTail =
    ("""(?is)\s+(?:AS\s+(\w+)\s+)?ON\s+(.+?)""" +
      """\s+WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*""" +
      """\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*;?\s*""").r

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
      if (c == '\'') inStr = !inStr
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
    case InsertSql(t, sourceSql) => insert(spark, t, sourceSql)
    case DeleteSql(t, pred) =>
      val v = VersionedTable.delete(spark, rootOf(t), expr(pred))
      result(spark, "DELETE", t, v, -1L)
    case UpdateSql(t, sets, pred) =>
      val p = if (pred == null) lit(true) else expr(pred)
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
      afterSrc match {
        case MergeTail(sAlias, onCond) =>
          merge(spark, t, Option(tAlias), source, Option(sAlias), onCond)
        case _ => sys.error(
          "MERGE must be the canonical upsert: MERGE INTO t USING s " +
            "ON <equalities> WHEN MATCHED THEN UPDATE SET * " +
            "WHEN NOT MATCHED THEN INSERT *")
      }
    case other =>
      refreshAll(spark)
      spark.sql(other)
  }

  private def insert(spark: SparkSession, t: String,
                     sourceSql: String): DataFrame = {
    val root = rootOf(t)
    refreshAll(spark)
    val src = sourceSql.trim.stripSuffix(";").trim match {
      case v if v.toUpperCase.startsWith("VALUES") =>
        spark.sql(s"SELECT * FROM ($v)")
      case q => spark.sql(q)
    }
    val schema = VersionedTable.read(spark, root).schema
    require(src.schema.length == schema.length,
      s"INSERT column count ${src.schema.length} != table ${schema.length}")
    // positional mapping + cast to the table schema, SQL INSERT style;
    // pinned once — the count and the append must see the SAME rows
    // (a non-deterministic source evaluated twice could write rows the
    // reported count never saw), and a large SELECT must not run twice
    val aligned = src.select(src.columns.zip(schema.fields).map {
      case (c, f) => col(c).cast(f.dataType).as(f.name)
    }.toSeq: _*).localCheckpoint(true)
    val n = aligned.count()
    val v = VersionedTable.append(aligned, root)
    result(spark, "INSERT", t, v, n)
  }

  /** Top-level comma split (paren/quote-aware) of `SET a = e1, b = e2`;
    * each right-hand side is Spark-parsed. */
  private def parseSets(
      sets: String): Map[String, org.apache.spark.sql.Column] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var inStr = false
    val cur = new StringBuilder
    sets.foreach {
      case '\'' => inStr = !inStr; cur += '\''
      case '(' if !inStr => depth += 1; cur += '('
      case ')' if !inStr => depth -= 1; cur += ')'
      case ',' if !inStr && depth == 0 => parts += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) parts += cur.toString
    parts.map { a =>
      val i = a.indexOf('=')
      require(i > 0, s"bad SET assignment: '$a'")
      a.take(i).trim -> expr(a.drop(i + 1).trim)
    }.toMap
  }

  private def merge(spark: SparkSession, t: String, tAlias: Option[String],
                    source: String, sAlias: Option[String],
                    onCond: String): DataFrame = {
    val root = rootOf(t)
    refreshAll(spark)
    val srcText = source.trim
    val src =
      if (srcText.startsWith("(")) spark.sql(s"SELECT * FROM $srcText")
      else spark.sql(s"SELECT * FROM $srcText")
    // keys from the ON conjunction: every conjunct must be an equality
    // between the SAME column name on both sides (the canonical keyed
    // upsert) — anything else is not VersionedTable.merge semantics
    val tNames = Set(t.toLowerCase) ++ tAlias.map(_.toLowerCase)
    val sNames = sAlias.map(_.toLowerCase).toSet + srcText.toLowerCase
    val keys = onCond.split("(?i)\\s+AND\\s+").toSeq.map { c =>
      require(!c.exists(ch => ch == '<' || ch == '>') && !c.contains("!="),
        s"MERGE ON conjunct must be an equality: '$c'")
      val sides = c.split("=").map(_.trim)
      require(sides.length == 2, s"MERGE ON conjunct must be an equality: '$c'")
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
    val v = VersionedTable.merge(spark, root, src, keys)
    result(spark, "MERGE", t, v, src.count())
  }
}
