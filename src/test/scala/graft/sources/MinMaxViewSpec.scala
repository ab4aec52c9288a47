package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** MaterializedView.refreshMinMax: incremental folds ≡ full recompute,
  * no-op refresh, new-group arrival, extreme widening. */
class MinMaxViewSpec extends SparkSuite {

  private def roots(tag: String): (String, String) = (
    Files.createTempDirectory(s"graft_mmv_${tag}_s").resolve("t").toString,
    Files.createTempDirectory(s"graft_mmv_${tag}_v").resolve("v").toString)

  private def view(viewRoot: String): Set[(String, Double, Double, Long)] =
    VersionedTable.read(spark, viewRoot).collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Double]("lo"),
        r.getAs[Double]("hi"), r.getAs[Long]("n"))).toSet

  test("incremental folds land exactly on the full recompute") {
    import spark.implicits._
    val (src, v) = roots("fold")
    VersionedTable.overwrite(
      Seq(("a", 5.0), ("a", 3.0), ("b", 10.0)).toDF("g", "x"), src)
    MaterializedView.refreshMinMax(spark, src, v, Seq("g"), "x")
    assert(view(v) == Set(("a", 3.0, 5.0, 2L), ("b", 10.0, 10.0, 1L)))

    // batch 2 widens a's max, adds group c; b untouched
    VersionedTable.append(
      Seq(("a", 9.0), ("c", -1.0)).toDF("g", "x"), src)
    MaterializedView.refreshMinMax(spark, src, v, Seq("g"), "x")
    assert(view(v) == Set(
      ("a", 3.0, 9.0, 3L), ("b", 10.0, 10.0, 1L), ("c", -1.0, -1.0, 1L)))

    // batch 3 narrows nothing (inside the range) — extremes hold
    VersionedTable.append(Seq(("a", 4.0)).toDF("g", "x"), src)
    MaterializedView.refreshMinMax(spark, src, v, Seq("g"), "x")
    assert(view(v) == Set(
      ("a", 3.0, 9.0, 4L), ("b", 10.0, 10.0, 1L), ("c", -1.0, -1.0, 1L)))
  }

  test("refresh with no new source commits is a no-op") {
    import spark.implicits._
    val (src, v) = roots("noop")
    VersionedTable.overwrite(Seq(("a", 1.0)).toDF("g", "x"), src)
    MaterializedView.refreshMinMax(spark, src, v, Seq("g"), "x")
    val viewV = VersionedTable.latestVersion(v).get
    MaterializedView.refreshMinMax(spark, src, v, Seq("g"), "x")
    assert(VersionedTable.latestVersion(v).get == viewV,
      "no-op refresh must not commit a new view version")
  }

  test("null values do not poison extremes and are not counted") {
    import spark.implicits._
    val (src, v) = roots("nulls")
    VersionedTable.overwrite(
      Seq(("a", Some(2.0)), ("a", None), ("b", None))
        .toDF("g", "x"), src)
    MaterializedView.refreshMinMax(spark, src, v, Seq("g"), "x")
    val rows = VersionedTable.read(spark, v).collect()
      .map(r => (r.getAs[String]("g"),
        Option(r.getAs[java.lang.Double]("lo")),
        r.getAs[Long]("n"))).toSet
    assert(rows == Set(("a", Some(2.0), 1L), ("b", None, 0L)))
  }
}
