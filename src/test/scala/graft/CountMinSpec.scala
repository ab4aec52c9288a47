package graft

import org.apache.spark.sql.functions._

import graft.operators.CountMin

class CountMinSpec extends SparkSuite {
  import spark.implicits._

  // 500 items over 37 distinct terms with known exact counts
  private val words = Seq.tabulate(500)(i => s"w${i % 37}")

  test("estimates are one-sided: est >= exact with bounded overcount") {
    val df = words.toDF("term")
    val sk = df.agg(CountMin.sketch("term", 4, 64).as("sk"))
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = df.distinct()
      .crossJoin(sk)
      .select(col("term"),
        CountMin.estimate(col("sk"), col("term"), 4, 64).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"$t underestimated: ${est(t)} < $c")
      // deterministic data + seeds: a loose 3N/width cap documents the
      // εN error shape without flaking
      assert(est(t) <= c + 3L * words.size / 64 + 1,
        s"$t overcount too large: ${est(t)} vs $c")
    }
  }

  test("partition-invariant; built-in merge equals single pass exactly") {
    val df = words.toDF("term")
    def arr(d: org.apache.spark.sql.DataFrame): Seq[Long] =
      d.collect().head.getSeq[Long](0)
    val whole = arr(df.agg(CountMin.sketch("term", 4, 64)))
    val repart = arr(df.repartition(7).agg(CountMin.sketch("term", 4, 64)))
    assert(whole == repart)
    // persisted-partial path: per-group sketches rolled up with
    // posexplode + positional sum reproduce the single-pass table
    val halves = df.withColumn("h", length(col("term")) % 2)
      .groupBy(col("h")).agg(CountMin.sketch("term", 4, 64).as("sk"))
    assert(halves.count() == 2)
    val merged = arr(CountMin.mergeAll(halves, "sk"))
    assert(merged == whole)
  }

  test("unseen item sees only collision mass; nulls propagate") {
    val df = words.toDF("term")
    val sk = df.agg(CountMin.sketch("term", 4, 4096).as("sk"))
    val e = sk.select(CountMin
        .estimate(col("sk"), lit("never-seen"), 4, 4096))
      .collect().head.getLong(0)
    assert(e >= 0 && e <= 40)
    val n = sk.select(CountMin.estimate(col("sk"),
        lit(null).cast("string"), 4, 4096)).collect().head
    assert(n.isNullAt(0))
  }
}
