package graft.sources

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftCatalog

import graft.SparkSuite

/** The durable catalog registry (the metastore role): name→root
  * bindings persist under the warehouse in a CAS-guarded
  * [[CatalogStore]], survive a "fresh JVM" (cache reset + fresh
  * catalog instance), DROP removes durable state, racing CREATEs
  * serialize through the CAS, and other-JVM mutations surface on the
  * next resolution via the generation probe. */
class DurableCatalogSpec extends SparkSuite {

  private def freshWarehouse(): String =
    Files.createTempDirectory("graft_dwh").toString

  test("CatalogStore: upsert/load/remove/rename round-trip; rename is " +
    "atomic and collision-refusing") {
    val d = new File(freshWarehouse(), "_catalog")
    assert(CatalogStore.load(d)._2.isEmpty)
    CatalogStore.upsert(d, "db.a", "/roots/a")
    CatalogStore.upsert(d, "db.b", "/roots/b with space")
    assert(CatalogStore.load(d)._2 ==
      Map("db.a" -> "/roots/a", "db.b" -> "/roots/b with space"))
    CatalogStore.rename(d, "db.a", "db.c")
    assert(CatalogStore.load(d)._2.keySet == Set("db.b", "db.c"))
    intercept[IllegalArgumentException] {
      CatalogStore.rename(d, "db.c", "db.b") // target taken
    }
    intercept[IllegalArgumentException] {
      CatalogStore.rename(d, "db.gone", "db.x") // source missing
    }
    assert(CatalogStore.remove(d, "db.b"))
    assert(!CatalogStore.remove(d, "db.b"))
    assert(CatalogStore.load(d)._2 == Map("db.c" -> "/roots/a"))
  }

  test("racing CREATEs of one name serialize through the CAS: exactly " +
    "one winner") {
    val d = new File(freshWarehouse(), "_catalog")
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map { i =>
      new Thread(() => {
        if (CatalogStore.createExclusive(d, "db.t", s"/root_$i"))
          wins.incrementAndGet()
        ()
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(wins.get() == 1, s"${wins.get()} CREATEs claimed the name")
    assert(CatalogStore.load(d)._2.contains("db.t"))
  }

  test("graft.db.t survives a fresh JVM: CREATE under a warehouse, " +
    "reset every cache, reinstall — SELECT and SHOW TABLES still " +
    "resolve; DROP removes durable state") {
    import spark.implicits._
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.graftd",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftd.warehouse", wh)
    spark.sql("CREATE TABLE graftd.db.pers (k BIGINT, s STRING)")
    spark.sql("INSERT INTO graftd.db.pers VALUES (1, 'a'), (2, 'b')")
    // "fresh JVM": forget every cached binding — the catalog instance
    // itself holds no names (only its warehouse), so the next
    // resolution must reload from the durable store
    GraftCatalog.resetCache()
    assert(spark.sql("SELECT count(*) FROM graftd.db.pers")
      .head().getLong(0) == 2L,
      "the durable store must resolve the name after a cache wipe")
    assert(spark.sql("SHOW TABLES IN graftd.db").collect()
      .map(_.getString(1)).contains("pers"))
    // DROP removes the durable binding: a fresh cache can't see it
    spark.sql("DROP TABLE graftd.db.pers")
    GraftCatalog.resetCache()
    val e = intercept[Exception] {
      spark.sql("SELECT count(*) FROM graftd.db.pers").collect()
    }
    assert(e.getMessage.toLowerCase.contains("pers"), e.getMessage)
  }

  test("RENAME TABLE writes through; a binding created by 'another " +
    "JVM' (direct store write) surfaces on the next resolution") {
    import spark.implicits._
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.graftd2",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftd2.warehouse", wh)
    spark.sql("CREATE TABLE graftd2.db.a (k BIGINT)")
    spark.sql("INSERT INTO graftd2.db.a VALUES (7)")
    spark.sql("ALTER TABLE graftd2.db.a RENAME TO db.b")
    GraftCatalog.resetCache()
    assert(spark.sql("SELECT k FROM graftd2.db.b").head().getLong(0) == 7L)
    // another JVM binds a new name by writing the store directly
    val root = Files.createTempDirectory("graft_dcs").resolve("t").toString
    VersionedTable.overwrite(Seq((1L, 10L)).toDF("k", "v"), root)
    CatalogStore.upsert(new File(wh, "_catalog"), "db.external", root)
    assert(spark.sql("SELECT sum(v) FROM graftd2.db.external")
      .head().getLong(0) == 10L,
      "the generation probe must surface other-JVM CREATEs")
  }

  test("a SESSION-LOCAL binding (register helper) on a durable catalog " +
    "renames memory-only instead of failing against the store") {
    import spark.implicits._
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.graftd3",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftd3.warehouse", wh)
    val root = Files.createTempDirectory("graft_dloc").resolve("t").toString
    VersionedTable.overwrite(Seq((1L, 5L)).toDF("k", "v"), root)
    GraftCatalog.register(spark, "db", "localb", root, catalog = "graftd3")
    spark.sql("ALTER TABLE graftd3.db.localb RENAME TO db.localc")
    assert(spark.sql("SELECT v FROM graftd3.db.localc").head().getLong(0)
      == 5L)
    // and the durable store never learned either name
    assert(!CatalogStore.load(new File(wh, "_catalog"))._2.keySet
      .exists(_.contains("local")))
  }

  test("GraftSql registry persists through a warehouse: names survive " +
    "a cache reset, unregister removes durable state") {
    import spark.implicits._
    val wh = freshWarehouse()
    val root = Files.createTempDirectory("graft_dsql").resolve("t").toString
    VersionedTable.overwrite(Seq((1L, "x"), (2L, "y")).toDF("k", "s"), root)
    GraftSql.useWarehouse(wh)
    try {
      GraftSql.register(spark, "persql", root)
      GraftSql.resetCache() // fresh JVM
      assert(GraftSql.execute(spark, "SELECT count(*) AS n FROM persql")
        .head().getLong(0) == 2L)
      assert(GraftSql.execute(spark, "SHOW TABLES").collect()
        .map(_.getString(0)).contains("persql"))
      GraftSql.unregister("persql")
      GraftSql.resetCache()
      // probe through the registry path (DESCRIBE resolves rootOf) —
      // the session temp view deliberately outlives unregister, so a
      // SELECT passthrough would still see it
      val e = intercept[Exception] {
        GraftSql.execute(spark, "DESCRIBE TABLE persql").collect()
      }
      assert(e.getMessage.contains("persql"), e.getMessage)
    } finally GraftSql.detachWarehouse()
  }

  test("SQL SHALLOW CLONE registers EXCLUSIVELY: it refuses to rebind " +
    "a durable name created by another JVM (and a session-local one)") {
    import spark.implicits._
    val wh = freshWarehouse()
    val root = Files.createTempDirectory("graft_dclx").resolve("t").toString
    VersionedTable.overwrite(Seq((1L, "x"), (2L, "y")).toDF("k", "s"), root)
    GraftSql.useWarehouse(wh)
    try {
      GraftSql.register(spark, "clx_src", root)
      // "another JVM" binds the clone's target name durably, unseen by
      // this session's cache
      val other = Files.createTempDirectory("graft_dclx_o")
        .resolve("t").toString
      VersionedTable.overwrite(Seq((9L, "z")).toDF("k", "s"), other)
      CatalogStore.upsert(new File(wh, "_sqlcatalog"), "clx_taken", other)
      val loc = Files.createTempDirectory("graft_dclx_c")
        .resolve("c").toString
      val e = intercept[Exception] {
        GraftSql.execute(spark,
          s"CREATE TABLE clx_taken SHALLOW CLONE clx_src LOCATION '$loc'")
      }
      assert(e.getMessage.contains("clx_taken"), e.getMessage)
      // the other JVM's binding is INTACT (upsert would have clobbered)
      assert(CatalogStore.load(new File(wh, "_sqlcatalog"))
        ._2("clx_taken") == other,
        "CLONE must never silently rebind an existing durable name")
      // a fresh name clones fine
      val loc2 = Files.createTempDirectory("graft_dclx_c2")
        .resolve("c").toString
      GraftSql.execute(spark,
        s"CREATE TABLE clx_fresh SHALLOW CLONE clx_src LOCATION '$loc2'")
      assert(GraftSql.execute(spark,
        "SELECT count(*) AS n FROM clx_fresh").head().getLong(0) == 2L)
      GraftSql.unregister("clx_fresh")
      GraftSql.unregister("clx_src")
      GraftSql.unregister("clx_taken")
    } finally GraftSql.detachWarehouse()
    // session-local mode refuses too (the cached map is authority)
    val root2 = Files.createTempDirectory("graft_dclx2").resolve("t").toString
    VersionedTable.overwrite(Seq((1L, "x")).toDF("k", "s"), root2)
    GraftSql.register(spark, "clx_mem_src", root2)
    GraftSql.register(spark, "clx_mem_taken", root2)
    val e2 = intercept[Exception] {
      GraftSql.execute(spark,
        s"""CREATE TABLE clx_mem_taken SHALLOW CLONE clx_mem_src
            LOCATION '${Files.createTempDirectory("graft_dclx3")
          .resolve("c")}'""")
    }
    assert(e2.getMessage.contains("clx_mem_taken"), e2.getMessage)
    GraftSql.unregister("clx_mem_src")
    GraftSql.unregister("clx_mem_taken")
  }
}
