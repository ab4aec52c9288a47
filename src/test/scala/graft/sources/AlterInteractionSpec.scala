package graft.sources

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.SparkSuite

/** Interactions between this round's declaration features and the
  * existing column-mapping machinery: widening a RENAMED column,
  * defaults on mapped tables, and the catalog store's generation
  * chain past the CAS retention window. */
class AlterInteractionSpec extends SparkSuite {

  test("widen a RENAMED column: the physical slot up-casts under the " +
    "logical name; time travel serves old name AND old type") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ai").resolve("t").toString
    VersionedTable.overwrite(
      Seq((1, 10L), (2, 20L)).toDF("n", "v")
        .select(col("n").cast(IntegerType).as("n"), col("v")), root) // v0
    VersionedTable.alterRenameColumn(spark, root, "n", "num")        // v1
    VersionedTable.alterWidenColumn(spark, root, "num", LongType)    // v2
    val df = VersionedTable.read(spark, root)
    assert(df.schema("num").dataType == LongType)
    assert(df.agg(sum(col("num"))).head().getLong(0) == 3L,
      "the renamed physical slot must serve up-cast under the new name")
    VersionedTable.append(
      Seq((5000000000L, 50L)).toDF("num", "v"), root)                // v3
    assert(VersionedTable.read(spark, root)
      .filter(col("num") > 4000000000L).count() == 1L)
    val v0 = VersionedTable.readVersion(spark, root, 0L)
    assert(v0.schema.fieldNames.toSeq == Seq("n", "v"))
    assert(v0.schema("n").dataType == IntegerType)
  }

  test("a DEFAULT declared on a RENAMED column fills through the " +
    "logical name and stages into the physical slot") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ai2").resolve("t").toString
    VersionedTable.overwrite(Seq((1L, 10L)).toDF("k", "old"), root)
    VersionedTable.alterRenameColumn(spark, root, "old", "amount")
    VersionedTable.alterSetDefault(spark, root, "amount", "7")
    val name = s"aidef_${System.nanoTime()}"
    GraftSql.register(spark, name, root)
    GraftSql.execute(spark, s"INSERT INTO $name (k) VALUES (2)")
    val got = VersionedTable.read(spark, root).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 10L), (2L, 7L)), got.toString)
  }

  test("CatalogStore survives generation pruning: 80 mutations (past " +
    "the CAS retention window of 64) still resolve the full registry") {
    val d = new File(Files.createTempDirectory("graft_ai3").toFile,
      "_catalog")
    (1 to 80).foreach(i => CatalogStore.upsert(d, s"db.t$i", s"/r$i"))
    val (g, m) = CatalogStore.load(d)
    assert(g == 80L && m.size == 80 && m("db.t1") == "/r1" &&
      m("db.t80") == "/r80")
    // mutations keep working at the pruned head
    assert(CatalogStore.remove(d, "db.t40"))
    assert(CatalogStore.load(d)._2.size == 79)
  }

  test("a widened-then-defaulted column declared in ONE chain: both " +
    "survive a COW rewrite that materializes them") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ai4").resolve("t").toString
    VersionedTable.overwrite(
      Seq((1, 10L), (2, 20L)).toDF("k", "v")
        .select(col("k").cast(IntegerType).as("k"), col("v")), root)
    VersionedTable.alterWidenColumn(spark, root, "k", LongType)
    VersionedTable.alterSetDefault(spark, root, "v", "99")
    VersionedTable.update(spark, root, col("k") === 2L,
      Map("v" -> lit(21L))) // COW rewrite materializes the widen
    val sch = VersionedTable.writeSchema(spark, root)
    assert(sch("k").dataType == LongType)
    assert(sch("v").metadata.contains(VersionedTable.CurrentDefaultKey),
      "the rewrite must not strip the default from the declaration")
    val name = s"aiwd_${System.nanoTime()}"
    GraftSql.register(spark, name, root)
    GraftSql.execute(spark, s"INSERT INTO $name (k) VALUES (3)")
    assert(VersionedTable.read(spark, root).filter(col("k") === 3L)
      .head().getLong(1) == 99L)
  }

  test("identity × rename/widen: OTHER columns stay alterable on an " +
    "identity table and the fill keeps working through the mapping; " +
    "the identity column itself refuses both verbs") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ai4").resolve("t").toString
    VersionedTable.overwrite(
      Seq((1L, "a", 10)).toDF("k", "s", "n")
        .select(col("k"), col("s"), col("n").cast(IntegerType).as("n")),
      root)
    VersionedTable.alterSetIdentity(spark, root, "k")
    // rename + widen a NON-identity column — the declaration chain and
    // the identity fill must compose
    VersionedTable.alterRenameColumn(spark, root, "s", "label")
    VersionedTable.alterWidenColumn(spark, root, "n", LongType)
    VersionedTable.append(
      Seq(("b", 5000000000L)).toDF("label", "n").coalesce(1), root)
    val rows = VersionedTable.read(spark, root).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getAs[String]("label"),
        r.getAs[Long]("n"))).toSeq
    assert(rows == Seq((1L, "a", 10L), (2L, "b", 5000000000L)),
      rows.toString)
    // the identity column itself refuses rename and widen (the mark is
    // keyed by name, allocation by declared type)
    val e1 = intercept[Exception] {
      VersionedTable.alterRenameColumn(spark, root, "k", "kk")
    }
    assert(e1.getMessage.contains("identity"), e1.getMessage)
    // widen refusal needs an INT identity column
    val root2 = Files.createTempDirectory("graft_ai5").resolve("t").toString
    VersionedTable.overwrite(Seq((1, "a")).toDF("k", "s")
      .select(col("k").cast(IntegerType).as("k"), col("s")), root2)
    VersionedTable.alterSetIdentity(spark, root2, "k")
    val e2 = intercept[Exception] {
      VersionedTable.alterWidenColumn(spark, root2, "k", LongType)
    }
    assert(e2.getMessage.contains("identity"), e2.getMessage)
  }

  test("protocol-feature × time-travel: a fence commits ABOVE altered " +
    "history — old versions keep serving their declarations, a clone " +
    "of a pre-fence version opens, a clone of the fenced head refuses") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ai6").resolve("t").toString
    VersionedTable.overwrite(
      Seq((1, 10L), (2, 20L)).toDF("n", "v")
        .select(col("n").cast(IntegerType).as("n"), col("v")), root) // v0
    VersionedTable.alterRenameColumn(spark, root, "n", "num")        // v1
    VersionedTable.alterWidenColumn(spark, root, "num", LongType)    // v2
    VersionedTable.requireFeature(root, "r", "future-codec-x9")      // v3
    // pre-fence versions: full declaration stack intact
    val v2 = VersionedTable.readVersion(spark, root, 2L)
    assert(v2.schema("num").dataType == LongType)
    assert(VersionedTable.readVersion(spark, root, 0L)
      .schema.fieldNames.toSeq == Seq("n", "v"))
    intercept[RuntimeException] { VersionedTable.read(spark, root).count() }
    // a clone PINNED below the fence inherits features as of THAT
    // version (column-mapping + widening, not the fence) and serves
    val dst = Files.createTempDirectory("graft_ai7").resolve("c").toString
    VersionedTable.shallowCloneAt(root, dst, Some(2L))
    assert(VersionedTable.requiredFeatures(dst, 0L)._1 ==
      Set("column-mapping", "type-widening"))
    assert(VersionedTable.read(spark, dst)
      .agg(sum(col("num"))).head().getLong(0) == 3L)
    // a clone of the fenced HEAD carries the fence — and refuses
    val dst2 = Files.createTempDirectory("graft_ai8").resolve("c").toString
    VersionedTable.shallowCloneAt(root, dst2, Some(3L))
    val e = intercept[RuntimeException] {
      VersionedTable.read(spark, dst2).count()
    }
    assert(e.getMessage.contains("future-codec-x9"), e.getMessage)
  }
}
