package graft.core

import org.apache.spark.sql.SparkSession

/** Data-size-aware shuffle-partition cap for ITERATIVE driver loops
  * (optimization guide §2.2 "fewer, larger reduce partitions").
  *
  * An iterative operator (connected components) runs a handful of
  * joins/aggregations per round, each shuffling at the session's
  * `spark.sql.shuffle.partitions`. AQE coalesces the exchanges inside
  * one round's plan, but the per-round fixed cost — task launches,
  * checkpoint block registration, scheduler round-trips — still
  * tracks the configured partition count, and at gate scale the loop
  * runs ~6 rounds over a few hundred edges: the 32-partition rounds
  * cost more than the data (round-15 driver bench: q66 5.33 s @32
  * cores vs 2.3 s @8 cores — core-count-proportional overhead, not
  * compute).
  *
  * [[withRowCap]] bounds `spark.sql.shuffle.partitions` to
  * ceil(rows / rowsPerPartition) for the duration of `body` and
  * restores the previous value after. The cap NEVER RAISES the
  * setting: at production scale rows/rowsPerPartition exceeds any
  * sane session value and the override is a no-op, so cluster-sized
  * configs pass through untouched; only a loop whose data is far
  * smaller than the session's partitioning gets trimmed. Partition
  * count never affects join/aggregate results, so this is
  * result-invariant by construction. */
object ShuffleScale {
  private val Key = "spark.sql.shuffle.partitions"

  /** ~1M-edge rows per reduce partition (≈ tens of MB of (long,long)
    * pairs — guide §2.2's 100 MB–1 GB guidance, erring small because
    * iterative rounds re-shuffle the same rows repeatedly). */
  val RowsPerPartition: Long = 1L << 20

  def withRowCap[T](spark: SparkSession, rows: Long)(body: => T): T =
    withCap(spark,
      math.max(1L, (rows + RowsPerPartition - 1) / RowsPerPartition))(body)

  /** [[withRowCap]] from a Catalyst size estimate: cap the shuffle
    * width of `body`'s EAGER pipeline stages to ceil(bytes /
    * bytesPerPartition). Unknown estimates (the near-Long.MaxValue
    * defaults) disable the cap entirely — conservative: only a
    * confidently-small input ever narrows the shuffle, production
    * plans pass through. */
  def withBytesCap[T](spark: SparkSession, bytes: BigInt,
                      bytesPerPartition: Long = 4L << 20)(body: => T): T =
    if (bytes <= 0 || bytes >= UnknownBytes) body
    else withCap(spark,
      ((bytes + bytesPerPartition - 1) / bytesPerPartition).toLong)(body)

  /** Catalyst's size estimate for a frame (guide §1: plan-time stats);
    * near-Long.MaxValue defaults mean "unknown". */
  def statBytes(df: org.apache.spark.sql.DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  val UnknownBytes: BigInt = BigInt(1L << 50)

  private def withCap[T](spark: SparkSession, cap: Long)(body: => T): T = {
    val prev = spark.conf.get(Key)
    val target = math.min(prev.toLong, math.max(1L, cap))
    if (target == prev.toLong) body
    else {
      spark.conf.set(Key, target.toString)
      try body finally spark.conf.set(Key, prev)
    }
  }
}
