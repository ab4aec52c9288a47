package graft.core

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism floor for compute-heavy map stages
  * (optimization guide §2.5 "input skew": one huge unsplittable file —
  * or here, a single-row-group parquet file — leaves a stage on one
  * task; "repartition immediately after the read").
  *
  * The gate-scale base tables ship as ONE single-row-group parquet
  * file each, so a scan stage cannot split below one task no matter
  * what `maxPartitionBytes`/`minPartitionNum` say (byte-range splits
  * of a single row group collapse to the range holding the row-group
  * start). Any operator that does heavy per-row/per-pair work inside
  * the scan stage — brute-force vector scoring against a broadcast
  * side, Morton-code clustering, shingling — therefore runs
  * single-threaded while every other core idles.
  *
  * [[fanOut]] raises the partition count to the session default
  * parallelism ONLY when the input is below it: at 100 TB the input
  * arrives in thousands of scan partitions and this is a no-op (no
  * shuffle is ever added to an already-parallel input — a blanket
  * `repartition(cores)` would instead SHRINK a large scan); locally it
  * costs one round-robin shuffle of the narrow input rows and buys a
  * cores-wide compute stage. Round-robin repartition is
  * deterministic (sort-before-repartition, SPARK-23207) and row
  * placement never affects any declared result (all downstream
  * operators here are order-insensitive aggregations/joins or
  * explicitly ordered windows). */
object FanOut {
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // toRdd is the already-planned physical RDD (cached on the
    // QueryExecution) — reading its partition count runs no job
    val have = df.queryExecution.toRdd.getNumPartitions
    if (have < target) df.repartition(target) else df
  }

  /** [[fanOut]] for inputs consumed by SEVERAL passes (write-side
    * clustering: quantile scan, range sampling, shuffle map): when the
    * input is below the parallelism floor, additionally materialize it
    * (eager localCheckpoint) so every pass reads cores-wide in-memory
    * blocks instead of re-running the single-task scan per pass. At
    * scale this is a pass-through — a parallel input is never
    * repartitioned, and NEVER materialized (checkpointing a 100 TB
    * scan would be fatal; re-scanning is the right trade there — the
    * gate is the same partitions-below-cores probe as [[fanOut]]).
    * Blocks free via the ContextCleaner when the caller's frames drop;
    * never a cross-run cache (the builder runs inside the timed
    * region). */
  def fanOutPinned(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val have = df.queryExecution.toRdd.getNumPartitions
    if (have < target) df.repartition(target).localCheckpoint(true) else df
  }
}
