package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark builder plus (optionally) the equivalent
  * ANSI SQL the driver runs in DuckDB as the correctness oracle.
  *
  * Conventions that keep the Spark result and the DuckDB result
  * hash-identical (see SURVEY.md §5.2):
  *  - every computed column is aliased to the same name on both sides;
  *  - sums/avgs over doubles go through DECIMAL so both engines do
  *    exact arithmetic (double summation order differs between engines);
  *  - integer-valued outputs are BIGINT on both sides (DuckDB window
  *    functions and EXTRACT return BIGINT, Spark returns INT — we cast);
  *  - result carries a deterministic ORDER BY on both sides;
  *  - timestamps are emitted as DATE or formatted strings (Spark writes
  *    parquet TIMESTAMP as UTC-adjusted, DuckDB's is naive — the types
  *    would mismatch).
  */
final case class Q(
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** include in the Bench headline set */
    bench: Boolean = true)

trait QueryModule {
  def entries: Seq[(String, Q)]

  /** DuckDB-parity decimal sum published as DOUBLE (oracle rule: sum
    * in DECIMAL(18, scale) for summation-order-free exactness, then
    * cast back for a stable output schema). ONE definition — every
    * module's oracle convention must move together. */
  protected def dsum(c: org.apache.spark.sql.Column,
                     scale: Int = 2): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.sum(
      c.cast(org.apache.spark.sql.types.DecimalType(18, scale)))
      .cast(org.apache.spark.sql.types.DoubleType)

  /** Temp work dir for queries that build tables/indexes inside the
    * run, deleted on JVM exit — repeated gate/bench runs must not leak
    * disk (cleanup is exit-time because lazily-evaluated reads may
    * re-open the files until the session ends). ONE shared shutdown
    * hook drains the queue — registering a hook per call would
    * accumulate an unbounded number of hook threads across repeated
    * gate/bench runs in a long-lived session. */
  protected def tempRoot(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    QueryModule.tempDirs.add(p)
    p
  }
}

object QueryModule {
  private val tempDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    var p = tempDirs.poll()
    while (p != null) {
      graft.sources.Lake.deleteRecursively(p.toFile)
      p = tempDirs.poll()
    }
  }))
}
