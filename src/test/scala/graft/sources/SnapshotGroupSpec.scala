package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** SnapshotGroup: atomic multi-table publish — torn states invisible,
  * readAt pins the published pair. */
class SnapshotGroupSpec extends SparkSuite {

  test("readers only ever see version sets published together") {
    import spark.implicits._
    val grp = Files.createTempDirectory("graft_sg_spec").toString
    val a = new java.io.File(grp, "a").getPath
    val b = new java.io.File(grp, "b").getPath
    val av1 = VersionedTable.overwrite(Seq((1L, "x")).toDF("k", "s"), a)
    val bv1 = VersionedTable.overwrite(Seq((1L, 10L)).toDF("k", "n"), b)
    SnapshotGroup.publish(grp, Map(a -> av1, b -> bv1))
    assert(SnapshotGroup.current(grp).contains(Map(a -> av1, b -> bv1)))

    // a moves ahead; crash before publish → readers stay on the pair
    val av2 = VersionedTable.append(Seq((2L, "y")).toDF("k", "s"), a)
    assert(SnapshotGroup.readAt(spark, grp, a).count() == 1L,
      "unpublished commit must be invisible through the group")
    assert(SnapshotGroup.readAt(spark, grp, b).count() == 1L)

    val bv2 = VersionedTable.append(Seq((2L, 20L)).toDF("k", "n"), b)
    SnapshotGroup.publish(grp, Map(a -> av2, b -> bv2))
    assert(SnapshotGroup.readAt(spark, grp, a).count() == 2L)
    assert(SnapshotGroup.readAt(spark, grp, b).count() == 2L)
  }

  test("shallowCloneAt: branch from a historical version; bad version rejected") {
    import spark.implicits._
    val grp = Files.createTempDirectory("graft_sg_clone").toString
    val src = new java.io.File(grp, "src").getPath
    val br = new java.io.File(grp, "br").getPath
    VersionedTable.overwrite(Seq((1L, 10.0)).toDF("k", "v"), src)
    VersionedTable.append(Seq((2L, 20.0)).toDF("k", "v"), src)
    VersionedTable.shallowCloneAt(src, br, Some(0L))
    assert(VersionedTable.read(spark, br).count() == 1L,
      "branch must see only v0's rows")
    assert(VersionedTable.read(spark, src).count() == 2L)
    // branch writes diverge without touching the source
    VersionedTable.append(Seq((9L, 90.0)).toDF("k", "v"), br)
    assert(VersionedTable.read(spark, src).count() == 2L)
    intercept[IllegalArgumentException] {
      VersionedTable.shallowCloneAt(src,
        new java.io.File(grp, "br2").getPath, Some(99L))
    }
  }

  test("racing publishers serialize through publishCas: every publish " +
    "lands, readers never observe a torn version set") {
    import spark.implicits._
    import java.util.concurrent.CyclicBarrier
    val grp = Files.createTempDirectory("graft_sg_race").toString
    val tables = (0 until 2).map { i =>
      val t = new java.io.File(grp, s"t$i").getPath
      VersionedTable.overwrite(Seq((0L, i.toLong)).toDF("k", "v"), t)
      t
    }
    // each publisher repeatedly: read gen + current set, add ITS OWN
    // entry (a fresh version of its table), CAS; on a lost race,
    // rebuild on the winner's snapshot — the multi-writer contract
    val rounds = 10
    val barrier = new CyclicBarrier(2)
    val retries = new java.util.concurrent.atomic.AtomicLong(0)
    def publisher(i: Int): Thread = new Thread(() => {
      (1 to rounds).foreach { r =>
        val v = VersionedTable.append(
          Seq((r.toLong, i.toLong)).toDF("k", "v"), tables(i))
        barrier.await() // maximize collision probability per round
        var ok = false
        while (!ok) {
          val g = SnapshotGroup.currentGen(grp)
          val cur = SnapshotGroup.current(grp).getOrElse(Map.empty)
          ok = SnapshotGroup.publishCas(grp, cur + (tables(i) -> v), g)
          if (!ok) retries.incrementAndGet()
        }
      }
    })
    // a reader hammering current() concurrently: every observed set
    // must be internally consistent (only versions that exist, all
    // parseable) — atomic pointer moves mean never a torn file
    @volatile var torn = false
    @volatile var stop = false
    val reader = new Thread(() => {
      while (!stop) SnapshotGroup.current(grp).foreach { m =>
        if (!m.forall { case (t, v) =>
          t.startsWith(grp) && VersionedTable.versions(t).contains(v)
        }) torn = true
      }
    })
    reader.start()
    val ps = Seq(publisher(0), publisher(1))
    ps.foreach(_.start()); ps.foreach(_.join())
    stop = true; reader.join()
    assert(!torn, "reader observed a torn/invalid version set")
    // NEITHER publisher's final entry was silently overwritten
    val fin = SnapshotGroup.current(grp).get
    assert(fin.keySet == tables.toSet)
    tables.zipWithIndex.foreach { case (t, i) =>
      assert(VersionedTable.readVersion(spark, t, fin(t))
        .filter(col("k") === rounds.toLong && col("v") === i.toLong)
        .count() == 1L, s"publisher $i's last publish must survive")
    }
    info(s"lost-race retries observed: ${retries.get()}")
  }

  test("PointerCas: exclusive-create CAS — exactly one winner per " +
    "generation, stale expected-gen refused, content atomic, old " +
    "generations pruned") {
    val dir = Files.createTempDirectory("graft_cas").toFile
    assert(PointerCas.gen(dir) == 0L && PointerCas.read(dir).isEmpty)
    assert(PointerCas.commitIfGen(dir, 0L, "alpha"))
    assert(PointerCas.gen(dir) == 1L && PointerCas.read(dir).contains("alpha"))
    // stale expected generation → refused, committed content unchanged
    assert(!PointerCas.commitIfGen(dir, 0L, "stale"))
    assert(PointerCas.read(dir).contains("alpha"))
    assert(PointerCas.commitIfGen(dir, 1L, "beta") &&
      PointerCas.gen(dir) == 2L && PointerCas.read(dir).contains("beta"))
    // N writers race the SAME generation: the exclusive link create has
    // exactly one winner — no lock to steal, no pause window to exploit
    val won = new java.util.concurrent.atomic.AtomicInteger(0)
    val barrier = new java.util.concurrent.CyclicBarrier(8)
    val ts = (0 until 8).map { i =>
      new Thread(() => {
        barrier.await()
        if (PointerCas.commitIfGen(dir, 2L, s"racer-$i")) { won.incrementAndGet(); () }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(won.get() == 1, "exactly one CAS winner per generation")
    assert(PointerCas.gen(dir) == 3L)
    assert(PointerCas.read(dir).exists(_.startsWith("racer-")))
    // long chains prune behind the retention window; reads stay exact
    val horizon = PointerCas.Keep + 10L
    (3L until horizon).foreach { g =>
      assert(PointerCas.commitIfGen(dir, g, s"v${g + 1}"))
    }
    assert(PointerCas.gen(dir) == horizon &&
      PointerCas.read(dir).contains(s"v$horizon"))
    val ptrs = dir.list().count(_.startsWith("_ptr."))
    assert(ptrs <= PointerCas.Keep + 1,
      s"generations behind the retention window must be pruned, saw $ptrs")
  }

  test("PointerCas: generations stranded below a prune gap are cleared " +
    "by a later commit's listing-based prune") {
    val dir = Files.createTempDirectory("graft_cas_gap").toFile
    val n = PointerCas.Keep + 12L
    (0L until n).foreach { g =>
      assert(PointerCas.commitIfGen(dir, g, s"v${g + 1}"))
    }
    // simulate an interrupted old prune: a stranded generation far
    // below the retention window, behind a gap
    java.nio.file.Files.write(new java.io.File(dir, "_ptr.2").toPath,
      "stranded".getBytes("UTF-8"))
    assert(PointerCas.commitIfGen(dir, n, s"v${n + 1}"))
    assert(!new java.io.File(dir, "_ptr.2").exists(),
      "a stranded generation below the window must be pruned")
    assert(PointerCas.read(dir).contains(s"v${n + 1}"))
  }

  test("legacy fixed-name _published groups stay readable; the first " +
    "post-upgrade publish migrates them onto the generation chain") {
    import spark.implicits._
    val grp = Files.createTempDirectory("graft_sg_legacy").toString
    val a = new java.io.File(grp, "a").getPath
    val av1 = VersionedTable.overwrite(Seq((1L, "x")).toDF("k", "s"), a)
    // pre-upgrade layout: fixed-name pointer, no _ptr.* chain
    java.nio.file.Files.write(new java.io.File(grp, "_published").toPath,
      s"$a\t$av1".getBytes("UTF-8"))
    assert(SnapshotGroup.current(grp).contains(Map(a -> av1)),
      "legacy pointer must resolve")
    assert(SnapshotGroup.readAt(spark, grp, a).count() == 1L)
    // first post-upgrade publish lands on the chain and wins reads
    val av2 = VersionedTable.append(Seq((2L, "y")).toDF("k", "s"), a)
    SnapshotGroup.publish(grp, Map(a -> av2))
    assert(SnapshotGroup.current(grp).contains(Map(a -> av2)))
    assert(PointerCas.gen(new java.io.File(grp)) == 1L)
  }

  test("readAt rejects a table outside the group; empty group errors") {
    import spark.implicits._
    val grp = Files.createTempDirectory("graft_sg_err").toString
    val a = new java.io.File(grp, "a").getPath
    intercept[RuntimeException] { SnapshotGroup.readAt(spark, grp, a) }
    val av1 = VersionedTable.overwrite(Seq((1L, "x")).toDF("k", "s"), a)
    SnapshotGroup.publish(grp, Map(a -> av1))
    intercept[RuntimeException] {
      SnapshotGroup.readAt(spark, grp, "/nope")
    }
  }
}
