package graft.pipeline

import java.nio.file.Files

import scala.collection.mutable

import graft.SparkSuite
import graft.pipeline.DagRunner.Task

class DagRunnerSpec extends SparkSuite {

  private def auditTmp = Files.createTempDirectory("graft_dagspec")
    .resolve("audit").toString

  test("dependency order respected; same-depth ties run in id order") {
    val seen = mutable.ListBuffer.empty[String]
    def t(id: String, deps: String*) =
      Task(id, deps, () => { seen += id; () })
    val res = DagRunner.run(spark, "d", Seq(
      t("z_root"), t("a_root"), t("mid", "z_root"),
      t("leaf", "mid", "a_root")), auditTmp)
    assert(seen.toList == List("a_root", "z_root", "mid", "leaf"))
    assert(res.forall(_.state == "success"))
  }

  test("retry honors maxTries; downstream of a failure is skipped, siblings run") {
    var calls = 0
    val res = DagRunner.run(spark, "d", Seq(
      Task("flaky", Seq.empty, () => {
        calls += 1; if (calls < 2) sys.error("boom")
      }, maxTries = 2),
      Task("dead", Seq.empty, () => sys.error("always"), maxTries = 3),
      Task("after_dead", Seq("dead"), () => ()),
      Task("after_flaky", Seq("flaky"), () => ())), auditTmp)
    val byId = res.map(r => r.id -> r).toMap
    assert(byId("flaky").state == "success" && byId("flaky").tries == 2)
    assert(byId("dead").state == "failed" && byId("dead").tries == 3)
    assert(byId("after_dead").state == "upstream_failed" &&
      byId("after_dead").tries == 0)
    assert(byId("after_flaky").state == "success")
  }

  test("cycles and unknown dependencies rejected before anything runs") {
    var ran = false
    intercept[IllegalArgumentException] {
      DagRunner.run(spark, "d", Seq(
        Task("a", Seq("b"), () => { ran = true }),
        Task("b", Seq("a"), () => { ran = true })), auditTmp)
    }
    intercept[IllegalArgumentException] {
      DagRunner.run(spark, "d", Seq(
        Task("a", Seq("ghost"), () => { ran = true })), auditTmp)
    }
    assert(!ran)
  }

  test("audit: one row per task with the injected clock and hostname") {
    val path = auditTmp
    DagRunner.run(spark, "mydag", Seq(
      Task("only", Seq.empty, () => ())), path,
      clock = () => "T0", hostname = "h1")
    val rows = graft.sources.Lake.read(spark, path).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(1) == "mydag" && r.getString(2) == "only" &&
      r.getString(3) == "success" && r.getString(4) == "T0" &&
      r.getString(8) == "h1")
  }
}
