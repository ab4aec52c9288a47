package graft.pipeline

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

import graft.audit.AuditLogger
import graft.audit.AuditLogger.AuditRecord

/** Native task-DAG execution with the reference's orchestration
  * semantics (kltn.dag.py: three parallel bronze→silver pipelines →
  * gold → audit, under Airflow) — dependency-ordered execution,
  * per-task RETRY, Airflow's `upstream_failed` propagation (a task
  * whose dependency failed is SKIPPED, not run against missing
  * inputs), and one audit row per task appended through
  * [[AuditLogger]] (audit_logger.py's schema).
  *
  * Determinism for tests/gates: the wall clock and hostname are
  * injected — with a fixed clock the audit table is a pure function
  * of the DAG outcome. Ready tasks at the same depth run in task-id
  * order (single-threaded by design: tasks are SPARK JOBS — the
  * cluster parallelizes inside each task; racing whole jobs against
  * each other on one driver mostly thrashes the scheduler). */
object DagRunner {

  final case class Task(id: String, deps: Seq[String],
                        run: () => Unit, maxTries: Int = 1)

  final case class TaskResult(id: String, state: String, tries: Int)

  /** Execute the DAG; append one audit row per task to `auditPath`;
    * return results in execution order (skipped tasks carry
    * state "upstream_failed", tries 0). Throws on cyclic or unknown
    * dependencies before running anything. */
  def run(spark: SparkSession, dagId: String, tasks: Seq[Task],
          auditPath: String,
          clock: () => String = () => java.time.Instant.now().toString,
          hostname: String = "driver"): Seq[TaskResult] = {
    val byId = tasks.map(t => t.id -> t).toMap
    require(byId.size == tasks.size, "duplicate task ids")
    tasks.foreach(t => t.deps.foreach(d =>
      require(byId.contains(d), s"task ${t.id}: unknown dependency $d")))

    // Kahn topological order, ready set kept sorted for determinism
    val indeg = mutable.Map(tasks.map(t => t.id -> t.deps.size): _*)
    val out = tasks.flatMap(t => t.deps.map(_ -> t.id))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val ready = mutable.SortedSet(
      tasks.filter(_.deps.isEmpty).map(_.id): _*)
    val order = mutable.ListBuffer.empty[String]
    while (ready.nonEmpty) {
      val id = ready.head
      ready.remove(id)
      order += id
      out.getOrElse(id, Seq.empty).foreach { d =>
        indeg(d) -= 1
        if (indeg(d) == 0) { ready.add(d); () }
      }
    }
    require(order.size == tasks.size,
      s"cyclic dependencies among ${tasks.map(_.id).toSet -- order.toSet}")

    val failed = mutable.Set.empty[String]
    val audit = mutable.ListBuffer.empty[AuditRecord]
    val results = order.map { id =>
      val t = byId(id)
      val start = clock()
      val t0 = System.nanoTime()
      val res =
        if (t.deps.exists(failed)) {
          failed += id
          TaskResult(id, "upstream_failed", 0)
        } else {
          var tries = 0
          var ok = false
          while (!ok && tries < t.maxTries) {
            tries += 1
            try { t.run(); ok = true }
            catch {
              // the failure lands in the audit row; the DAG continues
              // so independent pipelines still complete (Airflow
              // behavior — only DOWNSTREAM of the failure is skipped)
              case scala.util.control.NonFatal(_) => ()
            }
          }
          if (!ok) failed += id
          TaskResult(id, if (ok) "success" else "failed", tries)
        }
      audit += AuditRecord(start, dagId, id, res.state, start, clock(),
        (System.nanoTime() - t0) / 1e9, res.tries, hostname)
      res
    }.toSeq

    AuditLogger.log(spark, auditPath, audit.toSeq)
    results
  }
}
