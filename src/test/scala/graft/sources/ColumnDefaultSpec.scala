package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Column DEFAULT values (the Delta column-default role): declared in
  * the declaration sidecar (`CURRENT_DEFAULT`, Spark's own key);
  * INSERT column-lists and merge-INSERT clauses fill the expression
  * for unlisted columns; existing rows are unaffected; DROP DEFAULT
  * restores NULL fills; the DSv2 surface accepts CREATE TABLE ...
  * DEFAULT and fills through Spark's own analyzer. */
class ColumnDefaultSpec extends SparkSuite {

  private def freshTable(): (String, String) = {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_def").resolve("t").toString
    VersionedTable.overwrite(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "s", "v"), root)
    val name = s"def_${System.nanoTime()}"
    GraftSql.register(spark, name, root)
    (root, name)
  }

  test("SET DEFAULT fills unlisted INSERT columns; existing rows are " +
    "untouched; DROP DEFAULT restores NULL") {
    val (root, t) = freshTable()
    GraftSql.execute(spark,
      s"ALTER TABLE $t ALTER COLUMN v SET DEFAULT 99")
    GraftSql.execute(spark,
      s"ALTER TABLE $t ALTER COLUMN s SET DEFAULT upper('pad')")
    GraftSql.execute(spark, s"INSERT INTO $t (k) VALUES (3)")
    val rows = VersionedTable.read(spark, root)
      .orderBy("k").collect().map(r => (r.getLong(0),
        Option(r.getString(1)), if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(rows.toSeq == Seq((1L, Some("a"), 10L), (2L, Some("b"), 20L),
      (3L, Some("PAD"), 99L)),
      s"existing rows untouched, new row filled: ${rows.toSeq}")
    GraftSql.execute(spark, s"ALTER TABLE $t ALTER COLUMN v DROP DEFAULT")
    GraftSql.execute(spark, s"INSERT INTO $t (k, s) VALUES (4, 'd')")
    val r4 = VersionedTable.read(spark, root).filter(col("k") === 4)
      .head()
    assert(r4.isNullAt(2), "after DROP DEFAULT unlisted columns fill NULL")
    // a column reference is not a self-contained default
    intercept[Exception] {
      GraftSql.execute(spark, s"ALTER TABLE $t ALTER COLUMN v SET DEFAULT k + 1")
    }
    // the validation probe must not leak ITS OWN columns: a range(1)
    // probe exposes `id`, so `SET DEFAULT id` would pass as a column
    // reference and then bind confusingly at INSERT fill time — the
    // probe resolves against a zero-column frame instead
    intercept[Exception] {
      GraftSql.execute(spark, s"ALTER TABLE $t ALTER COLUMN v SET DEFAULT id")
    }
    intercept[Exception] {
      GraftSql.execute(spark,
        s"ALTER TABLE $t ALTER COLUMN v SET DEFAULT id + 1")
    }
  }

  test("merge-INSERT clauses fill the declared default for unlisted " +
    "target columns (explicit list and INSERT *)") {
    import spark.implicits._
    val (root, t) = freshTable()
    GraftSql.execute(spark,
      s"ALTER TABLE $t ALTER COLUMN v SET DEFAULT 77")
    // explicit column list omitting v
    Seq((5L, "e")).toDF("k", "s").createOrReplaceTempView("def_src1")
    GraftSql.execute(spark,
      s"""MERGE INTO $t AS g USING def_src1 AS m ON g.k = m.k
          WHEN NOT MATCHED THEN INSERT (k, s) VALUES (m.k, m.s)""")
    // INSERT * with a source that lacks v entirely
    Seq((6L, "f")).toDF("k", "s").createOrReplaceTempView("def_src2")
    GraftSql.execute(spark,
      s"""MERGE INTO $t AS g USING def_src2 AS m ON g.k = m.k
          WHEN MATCHED THEN UPDATE SET s = m.s
          WHEN NOT MATCHED THEN INSERT *""")
    val got = VersionedTable.read(spark, root)
      .filter(col("k") >= 5).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got == Seq((5L, 77L), (6L, 77L)), got.toString)
  }

  test("DSv2 surface: CREATE TABLE ... DEFAULT persists; the analyzer " +
    "fills INSERT column-lists; ALTER COLUMN SET DEFAULT routes " +
    "through the catalog") {
    val root = Files.createTempDirectory("graft_defv2")
      .resolve("t").toString
    org.apache.spark.sql.graft.GraftCatalog.install(spark)
    spark.sql("DROP TABLE IF EXISTS graft.db.defv2")
    spark.sql(
      s"""CREATE TABLE graft.db.defv2
          (k BIGINT, s STRING DEFAULT 'unk', v BIGINT)
          LOCATION '$root'""")
    spark.sql("INSERT INTO graft.db.defv2 (k, v) VALUES (1, 10)")
    spark.sql(
      "ALTER TABLE graft.db.defv2 ALTER COLUMN v SET DEFAULT 42")
    spark.sql("INSERT INTO graft.db.defv2 (k) VALUES (2)")
    val got = spark.sql(
      "SELECT k, s, v FROM graft.db.defv2 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(got == Seq((1L, "unk", 10L), (2L, "unk", 42L)), got.toString)
  }

  test("pinned time-travel snapshots serve NO defaults (read-only, and " +
    "the LATEST version's defaults would be wrong for them); the live " +
    "table resolves defaults once per instance") {
    import org.apache.spark.sql.connector.catalog.Identifier
    val root = Files.createTempDirectory("graft_defpin")
      .resolve("t").toString
    org.apache.spark.sql.graft.GraftCatalog.install(spark)
    spark.sql("DROP TABLE IF EXISTS graft.db.defpin")
    spark.sql(
      s"""CREATE TABLE graft.db.defpin (k BIGINT, v BIGINT)
          LOCATION '$root'""")
    spark.sql("INSERT INTO graft.db.defpin VALUES (1, 10)") // v1
    spark.sql(
      "ALTER TABLE graft.db.defpin ALTER COLUMN v SET DEFAULT 42") // v2
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val ident = Identifier.of(Array("db"), "defpin")
    val live = cat.loadTable(ident)
    assert(live.schema().fields.find(_.name == "v").exists(
      _.metadata.contains(VersionedTable.CurrentDefaultKey)),
      "the live table reports the declared default")
    val atV1 = cat.loadTable(ident, "1")
    assert(atV1.schema().fields.forall(
      !_.metadata.contains(VersionedTable.CurrentDefaultKey)),
      "a pinned snapshot must not serve the LATEST version's defaults")
  }
}
