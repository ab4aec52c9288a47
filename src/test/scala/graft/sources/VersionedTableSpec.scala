package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

class VersionedTableSpec extends SparkSuite {

  private def tmpRoot(): String =
    Files.createTempDirectory("graft_vt").resolve("t").toString

  import scala.language.implicitConversions

  test("overwrite/append produce versions; append does not rewrite") {
    import spark.implicits._
    val root = tmpRoot()
    val v0 = VersionedTable.overwrite(Seq((1, "a"), (2, "b")).toDF("k", "v"), root)
    assert(v0 == 0L)
    val filesAfterV0 = new java.io.File(root, "data").listFiles().map(_.getName).toSet
    val v1 = VersionedTable.append(Seq((3, "c")).toDF("k", "v"), root)
    assert(v1 == 1L)
    // every v0 data file is still there, untouched (no rewrite on append)
    val filesAfterV1 = new java.io.File(root, "data").listFiles().map(_.getName).toSet
    assert(filesAfterV0.subsetOf(filesAfterV1))
    assert(VersionedTable.read(spark, root).count() == 3)
    assert(VersionedTable.readVersion(spark, root, 0).count() == 2)
  }

  test("merge upserts by key (update + insert) as a new version") {
    import spark.implicits._
    val root = tmpRoot()
    VersionedTable.overwrite(Seq((1, "a"), (2, "b")).toDF("k", "v"), root)
    VersionedTable.merge(spark, root,
      Seq((2, "B"), (3, "C")).toDF("k", "v"), Seq("k"))
    val got = VersionedTable.read(spark, root).as[(Int, String)].collect().toSet
    assert(got == Set((1, "a"), (2, "B"), (3, "C")))
    // the pre-merge snapshot is still readable (time travel)
    val old = VersionedTable.readVersion(spark, root, 0).as[(Int, String)].collect().toSet
    assert(old == Set((1, "a"), (2, "b")))
  }

  test("restore rolls the table forward to an old snapshot") {
    import spark.implicits._
    val root = tmpRoot()
    VersionedTable.overwrite(Seq((1, "a")).toDF("k", "v"), root)
    VersionedTable.overwrite(Seq((9, "z")).toDF("k", "v"), root)
    val v2 = VersionedTable.restore(root, 0)
    assert(v2 == 2L)
    assert(VersionedTable.read(spark, root).as[(Int, String)].collect().toSeq
      == Seq((1, "a")))
    // history preserved: version 1 still readable until vacuumed
    assert(VersionedTable.readVersion(spark, root, 1)
      .as[(Int, String)].collect().toSeq == Seq((9, "z")))
  }

  test("vacuum deletes only unreachable data files") {
    import spark.implicits._
    val root = tmpRoot()
    VersionedTable.overwrite(Seq((1, "a")).toDF("k", "v"), root)
    VersionedTable.overwrite(Seq((2, "b")).toDF("k", "v"), root) // v0 now dead
    val deleted = VersionedTable.vacuum(root, retainVersions = 1)
    assert(deleted >= 1)
    assert(VersionedTable.versions(root) == Seq(1L))
    assert(VersionedTable.read(spark, root).as[(Int, String)].collect().toSeq
      == Seq((2, "b")))
  }

  test("schema evolution: appended batch with a new column merges") {
    import spark.implicits._
    val root = tmpRoot()
    VersionedTable.overwrite(Seq((1, "a")).toDF("k", "v"), root)
    VersionedTable.append(Seq((2, "b", 9.5)).toDF("k", "v", "score"), root)
    val latest = VersionedTable.read(spark, root)
    assert(latest.columns.toSet == Set("k", "v", "score"))
    val rows = latest.orderBy("k").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("score"))) // old file → null
    assert(rows(1).getDouble(rows(1).fieldIndex("score")) == 9.5)
    // time travel still sees the original 2-column schema
    assert(VersionedTable.readVersion(spark, root, 0).columns.toSet == Set("k", "v"))
  }

  test("concurrent commit of the same version: exactly one wins") {
    import spark.implicits._
    val root = tmpRoot()
    VersionedTable.overwrite(Seq((1, "a")).toDF("k", "v"), root)
    // simulate a racing writer that already committed version 1
    VersionedTable.overwrite(Seq((2, "b")).toDF("k", "v"), root)
    // a stale writer targeting version 1 must fail, not clobber
    intercept[java.nio.file.FileAlreadyExistsException] {
      val m = classOf[VersionedTable.type].getDeclaredMethods
        .find(_.getName == "commitManifest").get
      m.setAccessible(true)
      try m.invoke(VersionedTable, root, java.lang.Long.valueOf(1L), Seq("x"))
      catch {
        case e: java.lang.reflect.InvocationTargetException => throw e.getCause
      }
    }
    assert(VersionedTable.read(spark, root).as[(Int, String)].collect().toSeq
      == Seq((2, "b")))
  }
}
