package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

class MaterializedViewSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).resolve("t").toString

  test("refresh chain: delta-only source reads, no-op when current, exact state") {
    val src = tmp("graft_mv_src"); val view = tmp("graft_mv_view")
    VersionedTable.overwrite(
      Seq(("a", 10.0), ("a", 20.0), ("b", 5.0)).toDF("k", "x"), src)
    val v1 = MaterializedView.refreshAdditive(spark, src, view, Seq("k"), "x")
    assert(v1 == 0L)
    assert(MaterializedView.refreshedVersion(view).contains(0L))

    VersionedTable.append(Seq(("a", 1.0), ("c", 2.0)).toDF("k", "x"), src)
    // the CHANGES read for the second refresh touches only v1's files
    val v0Files = VersionedTable.readVersion(spark, src, 0).inputFiles.toSet
    val changeFiles = VersionedTable.readChangesSince(spark, src, 0)
      .inputFiles.toSet
    assert(changeFiles.nonEmpty && changeFiles.intersect(v0Files).isEmpty)

    MaterializedView.refreshAdditive(spark, src, view, Seq("k"), "x")
    val got = VersionedTable.read(spark, view)
      .select(col("k"), col("n"), col("total").cast("double"))
      .as[(String, Long, Double)].collect().toSet
    assert(got == Set(("a", 3L, 31.0), ("b", 1L, 5.0), ("c", 1L, 2.0)))

    // refresh with nothing new: no new view version
    val viewV = VersionedTable.latestVersion(view)
    MaterializedView.refreshAdditive(spark, src, view, Seq("k"), "x")
    assert(VersionedTable.latestVersion(view) == viewV)

    // the view itself time-travels: refresh #1's state is version 0
    val first = VersionedTable.readVersion(spark, view, 0)
      .select(col("k"), col("n")).as[(String, Long)].collect().toSet
    assert(first == Set(("a", 2L), ("b", 1L)))
  }

  test("gram view: delta refresh == from-scratch gram; no-op when current") {
    val src = tmp("graft_mvg_src"); val view = tmp("graft_mvg_view")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    VersionedTable.overwrite(emb.filter(col("vec_id") % 3 =!= 0), src)
    MaterializedView.refreshGram(spark, src, view, "embedding", 64)
    VersionedTable.append(emb.filter(col("vec_id") % 3 === 0), src)
    MaterializedView.refreshGram(spark, src, view, "embedding", 64)
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)),
        r.getDecimal(2).toBigInteger)).toMap
    val got = cells(MaterializedView.readGram(spark, view))
    val expect = cells(graft.operators.LinAlg
      .gramFixedPoint(emb, col("embedding"), 64))
    assert(got == expect)
    // current source version → refresh writes no new view version
    val viewV = VersionedTable.latestVersion(view)
    MaterializedView.refreshGram(spark, src, view, "embedding", 64)
    assert(VersionedTable.latestVersion(view) == viewV)
  }

  test("retraction refresh: deletes retract, updates adjust, emptied groups leave") {
    val src = tmp("graft_mvr_src"); val view = tmp("graft_mvr_view")
    VersionedTable.overwrite(
      Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 5.0))
        .toDF("id", "k", "x"), src)
    def refresh() =
      MaterializedView.refreshWithRetraction(spark, src, view, Seq("k"), "x")
    refresh()

    // MERGE update: id=2 price 20 -> 25 (delete+insert pair in the diff)
    VersionedTable.merge(spark, src,
      Seq((2L, "a", 25.0)).toDF("id", "k", "x"), Seq("id"))
    refresh()
    // DELETE: group b empties entirely
    VersionedTable.delete(spark, src, col("k") === "b")
    refresh()

    val got = VersionedTable.read(spark, view)
      .select(col("k"), col("n"), col("total").cast("double"))
      .as[(String, Long, Double)].collect().toSet
    assert(got == Set(("a", 2L, 35.0)))
  }

  test("crash between view commit and sidecar: orphan version ignored, no double-count") {
    // ADVICE round-7 finding: refresh must derive from the SIDECAR's
    // recorded (srcV, viewV) pair, never the view's latest version —
    // a crash after the view overwrite but before the sidecar move
    // leaves an orphaned view version that a latest-reading refresh
    // would re-apply the same delta onto (additive double-count).
    val src = tmp("graft_mvc_src"); val view = tmp("graft_mvc_view")
    VersionedTable.overwrite(Seq(("a", 10.0), ("b", 5.0)).toDF("k", "x"), src)
    MaterializedView.refreshAdditive(spark, src, view, Seq("k"), "x")
    VersionedTable.append(Seq(("a", 1.0)).toDF("k", "x"), src)

    // simulate the crash: the refresh's view OVERWRITE landed (an
    // orphan version with the delta already applied) but the sidecar
    // still records the pre-refresh pair
    val sidecarBytes = Files.readAllBytes(
      new java.io.File(view, "_refreshed_v").toPath)
    MaterializedView.refreshAdditive(spark, src, view, Seq("k"), "x")
    Files.write(new java.io.File(view, "_refreshed_v").toPath, sidecarBytes)

    // the re-run refresh must supersede the orphan, not stack onto it
    MaterializedView.refreshAdditive(spark, src, view, Seq("k"), "x")
    val got = VersionedTable.read(spark, view)
      .select(col("k"), col("n"), col("total").cast("double"))
      .as[(String, Long, Double)].collect().toSet
    assert(got == Set(("a", 2L, 11.0), ("b", 1L, 5.0)),
      s"delta re-applied onto orphaned state: $got")
  }

  test("join view: interleaved deltas, delta-sized appends, no-op, orphan recovery") {
    val a = tmp("graft_mvj_a"); val b = tmp("graft_mvj_b")
    val view = tmp("graft_mvj_v")
    def fullJoin = VersionedTable.read(spark, a)
      .join(VersionedTable.read(spark, b), Seq("k"))
      .select("k", "x", "y").as[(String, Double, String)].collect().toSet
    def served = MaterializedView.readJoin(spark, view)
      .select("k", "x", "y").as[(String, Double, String)].collect().toSet

    VersionedTable.overwrite(Seq(("a", 1.0), ("b", 2.0), ("z", 9.0)).toDF("k", "x"), a)
    VersionedTable.overwrite(Seq(("a", "A1"), ("b", "B1")).toDF("k", "y"), b)
    MaterializedView.refreshJoin(spark, a, b, view, Seq("k"))
    assert(served == fullJoin && served.size == 2)

    // ΔA only: new fact rows join the existing dimension
    VersionedTable.append(Seq(("a", 3.0), ("c", 4.0)).toDF("k", "x"), a)
    MaterializedView.refreshJoin(spark, a, b, view, Seq("k"))
    assert(served == fullJoin && served.size == 3)

    // ΔB only: the NEW dimension row must pick up EARLIER fact rows
    // (z was unmatched until now) — the A_old ⋈ ΔB term
    VersionedTable.append(Seq(("z", "Z1"), ("c", "C1")).toDF("k", "y"), b)
    val viewVBefore = VersionedTable.latestVersion(view).get
    MaterializedView.refreshJoin(spark, a, b, view, Seq("k"))
    assert(served == fullJoin && served.size == 5)
    // the refresh APPENDED a delta (one new version), no rewrite
    assert(VersionedTable.latestVersion(view).contains(viewVBefore + 1))

    // both sides at once: ΔA⋈ΔB must appear exactly once
    VersionedTable.append(Seq(("d", 5.0), ("z", 6.0)).toDF("k", "x"), a)
    VersionedTable.append(Seq(("d", "D1")).toDF("k", "y"), b)
    MaterializedView.refreshJoin(spark, a, b, view, Seq("k"))
    assert(served == fullJoin && served.size == 7)

    // no-op refresh: no new view version
    val vv = VersionedTable.latestVersion(view)
    MaterializedView.refreshJoin(spark, a, b, view, Seq("k"))
    assert(VersionedTable.latestVersion(view) == vv)

    // crash simulation: view append landed, sidecar did not move —
    // the re-run must supersede the orphan, not duplicate the delta
    val sidecarBytes = Files.readAllBytes(
      new java.io.File(view, "_refreshed_vj").toPath)
    VersionedTable.append(Seq(("e", 7.0)).toDF("k", "x"), a)
    MaterializedView.refreshJoin(spark, a, b, view, Seq("k"))
    Files.write(new java.io.File(view, "_refreshed_vj").toPath, sidecarBytes)
    MaterializedView.refreshJoin(spark, a, b, view, Seq("k"))
    assert(served == fullJoin,
      s"delta duplicated onto orphaned state: $served vs $fullJoin")
  }

  test("readChangesBetween bounds the read: a commit after the probe is excluded") {
    val src = tmp("graft_mvb_src")
    VersionedTable.overwrite(Seq(("a", 1.0)).toDF("k", "x"), src)
    VersionedTable.append(Seq(("b", 2.0)).toDF("k", "x"), src)
    val probed = VersionedTable.latestVersion(src).get // = 1
    VersionedTable.append(Seq(("c", 3.0)).toDF("k", "x"), src)
    val rows = VersionedTable.readChangesBetween(spark, src, 0, probed)
      .select(col("k")).as[String].collect().toSet
    assert(rows == Set("b"), s"unbounded read leaked a later commit: $rows")
  }

  test("distinct-count view: HLL-merge refresh equals full recompute across appends") {
    val src = tmp("graft_mvd_src"); val view = tmp("graft_mvd_view")
    def refresh() =
      MaterializedView.refreshDistinct(spark, src, view, Seq("k"), "u")
    // batch 1: a has 2 distinct, b has 1
    VersionedTable.overwrite(
      Seq(("a", "u1"), ("a", "u2"), ("a", "u1"), ("b", "u9"))
        .toDF("k", "u"), src)
    refresh()
    // batch 2: overlap (a:u2 again) must NOT inflate; new group c
    VersionedTable.append(
      Seq(("a", "u2"), ("a", "u3"), ("c", "u5")).toDF("k", "u"), src)
    refresh()
    // batch 3: pure overlap — refresh is a merge, counts unchanged
    VersionedTable.append(Seq(("a", "u1"), ("c", "u5")).toDF("k", "u"), src)
    refresh()
    val got = MaterializedView.readDistinct(spark, view, Seq("k"))
      .as[(String, Long)].collect().toSet
    assert(got == Set(("a", 3L), ("b", 1L), ("c", 1L)), got.toString)
    // idempotent: nothing new → no new view version
    val viewV = VersionedTable.latestVersion(view)
    refresh()
    assert(VersionedTable.latestVersion(view) == viewV)
  }
}
