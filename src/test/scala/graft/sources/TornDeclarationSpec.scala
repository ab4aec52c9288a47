package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** The `#declared` marker protocol: a commit whose declaration lives
  * in its `_schema.v{v}.json` sidecar (ALTER rename/drop/add, RESTORE
  * of a declared version) is marked inside the manifest, atomically
  * with the commit. Schema resolution treats marker-without-sidecar
  * as IN FLIGHT — it spins for the sidecar instead of walking back to
  * the stale pre-ALTER declaration — and as TORN after the spin
  * budget, failing loudly. Pins the round-13 ADVICE race: a writer
  * that lost an ALTER race and retried at base+1 before the winner's
  * sidecar landed would silently erase the winner's rename. */
class TornDeclarationSpec extends SparkSuite {

  private def freshTable(): String = {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_torn").resolve("t").toString
    val df = (1 to 6).map(i => (i.toLong, i * 10L)).toDF("k", "v")
      .repartitionByRange(2, col("k"))
    VersionedTable.overwrite(df, root)
    root
  }

  /** Hand-commit an empty preserving+declared delta at `v` WITHOUT its
    * sidecar — the exact on-disk state between an ALTER's manifest
    * commit and its sidecar move (or after a crash between the two). */
  private def plantMarkerCommit(root: String, v: Long): Unit = {
    val f = new File(new File(root, "_log"), f"$v%012d.manifest")
    Files.write(f.toPath,
      "#delta\n#preserving\n#declared\n".getBytes(StandardCharsets.UTF_8))
    ()
  }

  test("declaration resolution WAITS for an in-flight ALTER's sidecar " +
    "instead of serving the stale pre-ALTER declaration") {
    val root = freshTable()
    val v1 = VersionedTable.alterRenameColumn(spark, root, "v", "amount")
    assert(v1 == 1L)
    // a second ALTER won the v2 manifest but hasn't moved its sidecar yet
    plantMarkerCommit(root, 2L)
    val winner = StructType(Seq(StructField("k", LongType),
      StructField("renamed_by_winner", LongType,
        metadata = Metadata.fromJson("""{"graft.physical":"v"}"""))))
    val t = new Thread(() => {
      Thread.sleep(300)
      val tmp = Files.createTempFile(new File(root).toPath, "_schema", ".tmp")
      Files.write(tmp, winner.json.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, new File(root, "_schema.v2.json").toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      ()
    })
    t.start()
    // a lost racer re-resolving at base=2 must see the WINNER's
    // declaration (after the spin), never the stale v1 sidecar
    val resolved = VersionedTable.declaredSchemaAt(root, 2L)
    t.join()
    assert(resolved.map(_.fieldNames.toSeq)
      .contains(Seq("k", "renamed_by_winner")),
      s"resolved $resolved — the stale pre-ALTER declaration leaked")
  }

  test("a TORN declared commit (crash between manifest and sidecar) " +
    "fails loudly after the spin budget, never serving a stale schema") {
    val root = freshTable()
    VersionedTable.alterRenameColumn(spark, root, "v", "amount")
    plantMarkerCommit(root, 2L)
    val saved = VersionedTable.declarationSpinMillis
    VersionedTable.declarationSpinMillis = 250L
    try {
      val e = intercept[RuntimeException] {
        VersionedTable.declaredSchemaAt(root, 2L)
      }
      assert(e.getMessage.contains("sidecar never landed"), e.getMessage)
      // the mapped-table write path resolves through the same walk: an
      // append must fail loudly too, not stage under the stale mapping
      val e2 = intercept[RuntimeException] {
        import spark.implicits._
        VersionedTable.append(Seq((7L, 70L)).toDF("k", "amount"), root)
      }
      assert(e2.getMessage.contains("sidecar never landed"), e2.getMessage)
    } finally VersionedTable.declarationSpinMillis = saved
  }

  test("RESTORE of a declared version carries the marker: its listing " +
    "is unpolluted and a torn restore is detected loudly") {
    val root = freshTable()
    VersionedTable.alterRenameColumn(spark, root, "v", "amount")
    import spark.implicits._
    VersionedTable.append(Seq((7L, 70L)).toDF("k", "amount"), root) // v2
    val rv = VersionedTable.restore(root, 1L) // back to pre-append
    assert(rv == 3L)
    val df = VersionedTable.read(spark, root)
    assert(df.columns.toSeq == Seq("k", "amount"),
      "the restored declaration serves the logical name")
    assert(df.count() == 6L, "the marker line must not enter the listing")
    // tear the restore: delete its sidecar — reads must fail loudly,
    // not silently serve physical names from a footer sweep
    assert(new File(root, s"_schema.v$rv.json").delete())
    val saved = VersionedTable.declarationSpinMillis
    VersionedTable.declarationSpinMillis = 250L
    try {
      val e = intercept[RuntimeException] {
        VersionedTable.declaredSchemaAt(root, rv)
      }
      assert(e.getMessage.contains("sidecar never landed"), e.getMessage)
    } finally VersionedTable.declarationSpinMillis = saved
  }

  test("never-ALTERed chains resolve declarations O(1): with no sidecar " +
    "and no intent breadcrumb the walk reads NO manifests") {
    val root = freshTable()
    import spark.implicits._
    (1 to 5).foreach(i =>
      VersionedTable.append(Seq((10L + i, 1L)).toDF("k", "v"), root))
    // make a mid-chain manifest UNREADABLE (a directory in its place —
    // any read throws): the short-circuit must return None WITHOUT
    // touching it (the old code walked every delta manifest down the
    // chain hunting for a torn marker)
    val mid = new File(new File(root, "_log"), f"${3L}%012d.manifest")
    val saved = Files.readAllBytes(mid.toPath)
    assert(mid.delete() && mid.mkdir())
    try assert(VersionedTable.declaredSchemaAt(root, 5L).isEmpty,
      "no sidecar + no intent = None, no manifest IO")
    finally { assert(mid.delete()); Files.write(mid.toPath, saved) }
    // with an intent breadcrumb present the full walk runs (and is
    // fine here: no marker, so it just returns None the slow way)
    val intent = new File(root, "_declintent.test")
    Files.write(intent.toPath, Array.empty[Byte])
    try assert(VersionedTable.declaredSchemaAt(root, 5L).isEmpty)
    finally { intent.delete(); () }
  }

  test("the intent breadcrumb keeps a tear on a never-ALTERed table " +
    "visible; a completed ALTER leaves no breadcrumb behind") {
    val root = freshTable()
    import spark.implicits._
    VersionedTable.append(Seq((7L, 70L)).toDF("k", "v"), root) // v1
    // a real writer plants the intent BEFORE its marker commit — a
    // torn state is marker + intent, no sidecar
    val intent = new File(root, "_declintent.crashed")
    Files.write(intent.toPath, Array.empty[Byte])
    plantMarkerCommit(root, 2L)
    val saved = VersionedTable.declarationSpinMillis
    VersionedTable.declarationSpinMillis = 250L
    try {
      val e = intercept[RuntimeException] {
        VersionedTable.declaredSchemaAt(root, 2L)
      }
      assert(e.getMessage.contains("sidecar never landed"), e.getMessage)
    } finally {
      VersionedTable.declarationSpinMillis = saved
      assert(new File(new File(root, "_log"), f"${2L}%012d.manifest")
        .delete())
      intent.delete()
    }
    // a COMPLETED declaration commit cleans its breadcrumb up: the
    // fast path stays available afterwards
    VersionedTable.alterRenameColumn(spark, root, "v", "amount")
    assert(!new File(root).list().exists(_.startsWith("_declintent.")),
      "completed ALTERs must delete their intent breadcrumb")
  }

  test("vacuum reclaims STALE intent litter only when no retained " +
    "marker-bearing commit is missing its sidecar") {
    val root = freshTable()
    import spark.implicits._
    VersionedTable.append(Seq((7L, 70L)).toDF("k", "v"), root) // v1
    val litter = new File(root, "_declintent.litter")
    Files.write(litter.toPath, Array.empty[Byte])
    assert(litter.setLastModified(
      System.currentTimeMillis() - VersionedTable.declIntentStaleMs - 5000))
    // fresh intents survive (a live ALTER between breadcrumb and commit)
    val fresh = new File(root, "_declintent.fresh")
    Files.write(fresh.toPath, Array.empty[Byte])
    VersionedTable.vacuum(root, retainVersions = 10)
    assert(!litter.exists(), "stale pre-commit litter is reclaimed")
    assert(fresh.exists(), "fresh intents are a live writer's — kept")
    // now a genuine TEAR in the retained range: even stale intents stay
    Files.write(litter.toPath, Array.empty[Byte])
    assert(litter.setLastModified(
      System.currentTimeMillis() - VersionedTable.declIntentStaleMs - 5000))
    plantMarkerCommit(root, 2L)
    VersionedTable.vacuum(root, retainVersions = 10)
    assert(litter.exists(),
      "a torn declaration must keep every intent visible until repaired")
    litter.delete(); fresh.delete()
    assert(new File(new File(root, "_log"), f"${2L}%012d.manifest").delete())
  }

  test("history/time-travel surfaces ignore the marker lines") {
    val root = freshTable()
    VersionedTable.alterRenameColumn(spark, root, "v", "amount")
    VersionedTable.restore(root, 1L)
    val h = VersionedTable.history(root)
    assert(h.map(_._2) == Seq(2, 2, 2), s"file counts polluted: $h")
    assert(VersionedTable.readVersion(spark, root, 2L).count() == 6L)
  }
}
