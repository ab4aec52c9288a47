package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Tables

/** approx_count_distinct must track the exact count within HLL error
  * bounds — the contract for swapping it in for COUNT(DISTINCT) at
  * scale (SURVEY.md §4.2). */
class ApproxDistinctSpec extends SparkSuite {

  test("approx distinct within 5% of exact per group") {
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val both = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey")).as("approx"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getString(0)}: exact=$exact approx=$approx")
    }
  }
}
