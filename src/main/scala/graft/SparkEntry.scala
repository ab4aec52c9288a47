package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every query module's (name → Q) entries. Each Q pairs a
  * Spark DataFrame builder with (when SQL-expressible) a DuckDB oracle
  * over the same parquet tables.
  */
object SparkEntry {

  /** All query modules, in presentation order. */
  def modules: Seq[QueryModule] = Seq(
    CoreQueries, ExtendedQueries, LakeQueries, TextQueries, DedupQueries,
    SimilarityQueries, StreamQueries, EvalQueries, VexereGateQueries)

  private lazy val all: Seq[(String, Q)] = modules.flatMap(_.entries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The 4-table dim-join aggregation exercises scans,
    * broadcasts, a shuffle join, decimal aggregation and ordering in
    * one plan, and is robustly non-empty at the smoke scale (the
    * 6-table q67 collapses to one ASIA row at sf0.001). */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_join_dims")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, q) => n -> q.run }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (n, Q(_, Some(sql), _)) => n -> sql.trim }.toMap

  /** Headline subset for Bench. */
  def benchQueries: Seq[String] = all.collect { case (n, q) if q.bench => n }
}
