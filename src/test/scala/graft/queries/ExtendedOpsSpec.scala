package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.{SparkEntry, SparkSuite}
import graft.streaming.{BatchSessionize, StreamingJobs}

/** Unit coverage for the round-2 operator batch (q45-q49, q54/q55,
  * q62/q63) — hand-computed expectations on tiny frames; the sf0.01
  * DuckDB oracle is the end-to-end gate. */
class ExtendedOpsSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q45 range join: every order lands in exactly one band") {
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    val banded = q("q45_range_join")
      .agg(sum(col("n_orders"))).head().getLong(0)
    assert(banded == total, "bands must partition the price domain")
  }

  test("q46 cube: grouping-set totals are consistent") {
    val rows = q("q46_cube").collect()
    val grand = rows.filter(_.getLong(2) == 3L) // gid=3: both rolled up
    assert(grand.length == 1)
    val n = grand.head.getLong(3)
    // each gid level must sum to the grand total
    Seq(0L, 1L, 2L).foreach { gid =>
      val s = rows.filter(_.getLong(2) == gid).map(_.getLong(3)).sum
      assert(s == n, s"gid=$gid level sums to $s != $n")
    }
  }

  test("q47 exact moments reproduce corr on a hand-checked frame") {
    import spark.implicits._
    val df = Seq(("A", 1.0, 2.0), ("A", 2.0, 4.0), ("A", 3.0, 6.0))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
    df.createOrReplaceTempView("tiny_li")
    // perfectly correlated → corr 1.0, covar_pop of (1,2,3)x(2,4,6) = 4/3
    val x = col("l_quantity").cast("decimal(18,2)")
    val y = col("l_extendedprice").cast("decimal(18,2)")
    val m = df.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n"),
      sum(x).cast(DoubleType).as("sx"), sum(y).cast(DoubleType).as("sy"),
      sum(x * x).cast(DoubleType).as("sxx"), sum(y * y).cast(DoubleType).as("syy"),
      sum(x * y).cast(DoubleType).as("sxy"))
      .select(
        round((col("sxy") / col("n")) - (col("sx") / col("n")) * (col("sy") / col("n")), 4).as("cv"),
        round(((col("sxy") / col("n")) - (col("sx") / col("n")) * (col("sy") / col("n"))) /
          (sqrt((col("sxx") / col("n")) - (col("sx") / col("n")) * (col("sx") / col("n"))) *
            sqrt((col("syy") / col("n")) - (col("sy") / col("n")) * (col("sy") / col("n")))), 6).as("cr"))
      .head()
    assert(m.getDouble(0) == 1.3333 && m.getDouble(1) == 1.0)
    // and the full query agrees with Spark's native corr to 1e-6
    val full = q("q47_corr_stats").collect()
    val native = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    full.foreach { r =>
      assert(math.abs(r.getDouble(3) - native(r.getString(0))) < 1e-6)
    }
  }

  test("q48 hash sample: deterministic, a subset, and rate-plausible") {
    val a = q("q48_hash_sample").collect().toSeq
    val b = q("q48_hash_sample").collect().toSeq
    assert(a == b, "membership must be a pure function of the key")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val rates = orders.groupBy(col("o_orderpriority")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    a.foreach { r =>
      val prio = r.getString(0)
      val expect = if (prio.startsWith("1")) 0.5 else if (prio.startsWith("2")) 0.25 else 0.0625
      val got = r.getLong(1).toDouble / rates(prio)
      assert(math.abs(got - expect) < 0.08, s"$prio sampled at $got, expected ~$expect")
    }
  }

  test("q49 changelog compaction: one row per user, the max-ts row") {
    import spark.implicits._
    val users = q("q49_changelog_latest").select("user_id").as[Long].collect()
    assert(users.length == users.distinct.length)
    val nUsers = spark.read.parquet(s"$sf/events.parquet")
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(users.length == nUsers)
  }

  test("q62 tfidf: hand-computed scores on a 2-doc corpus") {
    import spark.implicits._
    val docs = Seq((1L, "cat dog"), (2L, "cat bird bird"))
      .toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = toks.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    val out = tf.join(df, Seq("term"))
      .withColumn("score", col("tf") * log(lit(2.0) / col("df")))
      .collect().map(r => (r.getLong(1), r.getString(0)) -> r.getDouble(4)).toMap
    assert(out((1L, "cat")) == 0.0) // df=2 → idf 0
    assert(math.abs(out((1L, "dog")) - math.log(2.0)) < 1e-12)
    assert(math.abs(out((2L, "bird")) - 2 * math.log(2.0)) < 1e-12)
  }

  test("q63 centroids: fixed-point mean is exact and plan-invariant") {
    import spark.implicits._
    val df = Seq((0, Seq(0.25f, -0.5f)), (0, Seq(0.75f, 0.5f)))
      .toDF("label", "embedding")
    val out = df.select(col("label"), posexplode(col("embedding")))
      .select(col("label"), col("pos"),
        floor(col("col").cast(DoubleType) * 1000000L).cast(LongType).as("q"))
      .groupBy(col("label"), col("pos"))
      .agg(floor(sum(col("q")).cast(DoubleType) / count(lit(1))).cast(LongType).as("c"))
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(out(0) == 500000L) // mean(0.25, 0.75)
    assert(out(1) == 0L)      // mean(-0.5, 0.5)
  }

  test("q74 chunking edges: exact-fit, one-over, single-token docs") {
    import spark.implicits._
    def chunks(nTok: Int): Seq[(Long, Long, Int)] = {
      val text = (1 to nTok).map(i => s"t$i").mkString(" ")
      val toks = split(col("text"), " ")
      Seq((1L, text)).toDF("doc_id", "text")
        .select(col("doc_id"), toks.as("toks"), size(toks).as("n_tok"))
        .select(col("doc_id"),
          posexplode(sequence(lit(0), greatest(col("n_tok") - 1, lit(0)), lit(24))),
          col("toks"))
        .select(col("pos").cast("long"), col("col").cast("long"),
          size(slice(col("toks"), col("col") + 1, lit(32))))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    }
    assert(chunks(1) == Seq((0L, 0L, 1)))
    assert(chunks(32) == Seq((0L, 0L, 32), (1L, 24L, 8)))
    assert(chunks(24) == Seq((0L, 0L, 24)))
    assert(chunks(25) == Seq((0L, 0L, 25), (1L, 24L, 1)))
  }

  test("q75 prefix sum equals a single-partition cumulative sum") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, i % 7 + 1)).toDF("k", "v").repartition(13)
    val got = graft.operators.PrefixSum.running(df, "k", "v", "cum")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(2)))
    var acc = 0L
    val want = (1L to 500L).map { i => acc += i % 7 + 1; (i, acc) }
    assert(got.toSeq == want)
  }

  test("q54 streaming fMGWS sessionize equals the batch oracle at sf0.001") {
    val stream = StreamingJobs
      .runSessionizeAvailableNow(spark, sf, "spec_stream_sessionize")
      .orderBy("user_id", "session_start").collect().toSeq
    val batch = BatchSessionize.sessions(graft.core.Tables(spark, sf, "events"))
      .orderBy("user_id", "session_start").collect().toSeq
    assert(stream.nonEmpty && stream == batch)
  }

  test("q55 stream-stream interval join equals the batch join at sf0.001") {
    val stream = StreamingJobs
      .runStreamStreamJoinAvailableNow(spark, sf, "spec_stream_join2")
      .orderBy("user_id", "view_id", "purchase_id").collect().toSeq
    val ev = graft.core.Tables(spark, sf, "events")
    val batch = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"), col("event_id").as("view_id"))
      .join(ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
            col("event_id").as("purchase_id")),
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("view_ts") &&
          col("p_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("view_ts"))).as("lag_us"))
      .orderBy("user_id", "view_id", "purchase_id").collect().toSeq
    assert(stream.nonEmpty && stream == batch)
  }

  test("q89 HLL sketches: merge-consistent and within error of exact") {
    import org.apache.spark.sql.functions.{hll_sketch_agg, hll_sketch_estimate, hll_union_agg}
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.01", "documents")
    // union is order-insensitive (per-bucket max), but DataSketches
    // DENSIFIES when merging sparse-mode sketches, so merge-of-parts
    // and sketch-of-whole may differ slightly below lgK capacity —
    // both must still sit within HLL error of the exact distinct
    val merged = docs.groupBy(col("lang"))
      .agg(hll_sketch_agg(col("doc_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))).head().getLong(0)
    val whole = docs
      .agg(hll_sketch_estimate(hll_sketch_agg(col("doc_id")))).head().getLong(0)
    val exact = docs.select(col("doc_id")).distinct().count()
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged estimate $merged vs exact $exact")
    assert(math.abs(whole - exact).toDouble / exact < 0.05,
      s"whole estimate $whole vs exact $exact")
    // determinism: the merged estimate is stable across evaluations
    val merged2 = docs.groupBy(col("lang"))
      .agg(hll_sketch_agg(col("doc_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))).head().getLong(0)
    assert(merged == merged2)
  }
}
