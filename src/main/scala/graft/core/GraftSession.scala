package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the engine (parity with the reference's
  * spark_config.py:5-25, minus the Delta/S3A wiring which is deployment
  * config, not engine semantics).
  *
  * Settings that carry semantics:
  *  - `ansi.enabled=false`: the reference runs Spark 3.4 (pre-ANSI
  *    default) and relies on null-on-error casts/datetime parses
  *    (SURVEY.md §7.4 "Python-UDF error semantics"); Spark 4 flipped the
  *    default to throw.
  *  - `caseSensitive` stays default-false: the reference's gold SQL mixes
  *    `Ticket`/`ticket` and `pos`/`POS` (SURVEY.md §7.4).
  *  - session timezone UTC, shuffle partitions sized to local cores (the
  *    200 default is wrong for local mode; a real cluster deployment
  *    would size this to 2-3× total executor cores).
  */
object GraftSession {

  /** Apply engine-required runtime confs and register the engine's
    * custom expressions on any externally-built session. */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // write timestamps as INT64 MICROS, not the legacy 12-byte INT96:
    // INT96 footers carry NO usable min/max (row-group pruning on a
    // timestamp predicate is impossible inside every staged file, and
    // the driver-side footer stats fold must bail to the stats job) —
    // at 100 TB that is lost pruning on every time-filtered read of
    // engine-written data. MICROS is also what the reference's own
    // testdata ships (TESTDATA.md) and what every modern reader speaks.
    spark.conf.set("spark.sql.parquet.outputTimestampType",
      "TIMESTAMP_MICROS")
    graft.plans.GraftFunctions.registerAll(spark)
    org.apache.spark.sql.graft.PlanBridge
      .registerStrategy(spark, graft.plans.AsOfJoinStrategy)
    org.apache.spark.sql.graft.PlanBridge
      .registerOptimization(spark, graft.plans.AsOfJoinFilterPushdown)
    spark
  }

  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
            appName: String = "graft"): SparkSession =
    tune(SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
}
