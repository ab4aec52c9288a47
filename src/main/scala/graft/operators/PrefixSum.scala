package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running (prefix) sum in global key order — the building
  * block for sequence packing, running offsets, and any "position in
  * the concatenated stream" computation.
  *
  * A naive `sum().over(Window.orderBy(key))` funnels the whole table
  * through ONE task. This is the scalable two-pass form:
  *   1. range-partition by the key and sort within partitions (range
  *      boundaries keep global order across partitions);
  *   2. per-partition totals → tiny cumulative offsets (a global window
  *      over #partitions rows, not #rows) broadcast back;
  *   3. per-partition local running sum (window PARTITIONED by the
  *      physical partition → parallel) + the partition's offset.
  *
  * The partition id is captured AFTER an eager localCheckpoint:
  * spark_partition_id is layout-dependent, and a lazily-cached subtree
  * can materialize under different layouts per consumer (same hazard as
  * monotonically_increasing_id — see SetSimJoin).
  */
object PrefixSum {

  /** Adds `outCol` = Σ value over all rows with orderCol ≤ this row's
    * (ties summed in arbitrary-but-consistent order within the same
    * orderCol value — pass a unique key for determinism). */
  def running(df: DataFrame, orderCol: String, valueCol: String,
              outCol: String): DataFrame =
    running(df, Seq(orderCol), valueCol, outCol)

  /** Composite-key form: global order is the ASCENDING lexicographic
    * order of `orderCols` (derive a negated column for a descending
    * dimension — e.g. curriculum order is `-margin, id`). Same two-pass
    * scale shape. */
  def running(df: DataFrame, orderCols: Seq[String], valueCol: String,
              outCol: String): DataFrame = {
    require(orderCols.nonEmpty, "running needs at least one order column")
    val keys = orderCols.map(col)
    val parted = df
      .repartitionByRange(keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val offsets = parted
      .groupBy(col("__pid")).agg(sum(col(valueCol)).as("__t"))
      .withColumn("__off",
        coalesce(sum(col("__t")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    val local = Window.partitionBy(col("__pid")).orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    parted
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(outCol, sum(col(valueCol)).over(local) + col("__off"))
      .drop("__pid", "__off")
  }
}
