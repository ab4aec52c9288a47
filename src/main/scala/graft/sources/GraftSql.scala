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
  *    commit;
  *  - `DELETE FROM t [WHERE p]` → [[VersionedTable.delete]] (file-pruned
  *    COW, SQL null-predicate semantics; no WHERE deletes every row);
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
    * unregistered — `scan` raises "no versions at ...") is SKIPPED,
    * never allowed to fail an unrelated statement; the stale name
    * errors only if the statement actually references it. Any OTHER
    * failure (a genuinely corrupt manifest) propagates here, at the
    * statement that observed it — a broad catch would surface it later
    * as a confusing stale-view read instead of the root cause. */
  private def refreshAll(spark: SparkSession): Unit = {
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

  private val MergeActions =
    ("""(?is)\s*WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*""" +
      """\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*;?\s*""").r

  /** Index of the first TOP-LEVEL occurrence of keyword `kw` in `s` —
    * outside single-quoted literals, outside parentheses, whole-word
    * (identifier characters on neither side) — or -1. The shared
    * boundary locator for WHERE/ON/AND/WHEN: regex splits would bite on
    * the same keyword inside a string literal or a subquery. */
  private def topLevelKeyword(s: String, kw: String, from: Int = 0): Int = {
    var i = math.max(0, from)
    var inStr = false
    var depth = 0
    val n = s.length
    val k = kw.length
    def ident(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    while (i < n) {
      val c = s.charAt(i)
      if (inStr && c == '\\') i += 1 // backslash-escaped char in a literal
      else if (c == '\'') inStr = !inStr
      else if (!inStr && c == '(') depth += 1
      else if (!inStr && c == ')') depth -= 1
      else if (!inStr && depth == 0 && s.regionMatches(true, i, kw, 0, k) &&
          (i == 0 || !ident(s.charAt(i - 1))) &&
          (i + k >= n || !ident(s.charAt(i + k))))
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
        "MERGE must be the canonical upsert: MERGE INTO t USING s " +
          "ON <equalities> WHEN MATCHED THEN UPDATE SET * " +
          "WHEN NOT MATCHED THEN INSERT *")
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
      if (!MergeActions.pattern.matcher(afterSrc.substring(whenIdx))
        .matches()) canonical()
      merge(spark, t, Option(tAlias), source, sAlias, onCond)
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
    val (cols, body) =
      if (body0.startsWith("(")) {
        val e = parenSpan(body0)
        val listed = body0.substring(1, e - 1).split(',').map(_.trim).toSeq
        require(listed.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
          s"INSERT column list must be bare identifiers, got $listed")
        (Some(listed), body0.drop(e).trim)
      } else (None, body0)
    val src = body.stripSuffix(";").trim match {
      case v if v.toUpperCase.startsWith("VALUES") =>
        spark.sql(s"SELECT * FROM ($v)")
      case q => spark.sql(q)
    }
    val schema = VersionedTable.read(spark, root).schema
    val target = cols.getOrElse(schema.fieldNames.toSeq)
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
    val aligned = src.select(schema.fields.toSeq.map { f =>
      byPos.get(f.name.toLowerCase) match {
        case Some(c) => col(c).cast(f.dataType).as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }: _*).localCheckpoint(true)
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
    var esc = false
    val cur = new StringBuilder
    sets.foreach {
      case c if esc => esc = false; cur += c
      case '\\' if inStr => esc = true; cur += '\\'
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
    // pinned ONCE before both uses (mirrors insert()): the merge and
    // the reported row count must see the SAME rows — a
    // non-deterministic source evaluated twice could report a count
    // the merge never saw, and a large SELECT must not pay its scan
    // twice
    val src = spark.sql(s"SELECT * FROM $srcText").localCheckpoint(true)
    // keys from the ON conjunction: every conjunct must be an equality
    // between the SAME column name on both sides (the canonical keyed
    // upsert) — anything else is not VersionedTable.merge semantics.
    // Conjuncts and equality splits are located QUOTE-AWARE — ' AND '
    // or '=' inside a string literal must not split the condition.
    val tNames = Set(t.toLowerCase) ++ tAlias.map(_.toLowerCase)
    val sNames = sAlias.map(_.toLowerCase).toSet + srcText.toLowerCase
    val keys = splitTopLevel(onCond, "AND").map { c =>
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
    val n = src.count()
    val v = VersionedTable.merge(spark, root, src, keys)
    result(spark, "MERGE", t, v, n)
  }
}
