package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Tables

/** FreqItemsAgg (mergeable heavy-hitters sketch) behavior:
  * exact-below-capacity, partitioning-invariance, and the graceful
  * degradation bounds above capacity. */
class FreqItemsSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  private def words = Tables(spark, sf, "documents")
    .select(col("lang"), explode(split(col("text"), " ")).as("w"))

  test("below capacity: sketch counts equal exact groupBy counts") {
    val exact = words.groupBy("lang", "w").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val sk = words.groupBy(col("lang"))
      .agg(FreqItems.sketch("w", maxMapSize = 256).as("fi"))
      .select(col("lang"), explode(col("fi")).as("r"))
      .select(col("lang"), col("r.item"), col("r.est"), col("r.lb"), col("r.ub"))
      .collect()
    assert(sk.nonEmpty)
    sk.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == exact(key), s"est mismatch at $key")
      // no purges → bounds collapse onto the exact count
      assert(r.getLong(3) == exact(key) && r.getLong(4) == exact(key))
    }
    // every exact key is present (NO_FALSE_POSITIVES below capacity
    // returns everything)
    assert(sk.length == exact.size)
  }

  test("partitioning-invariant: 1-partition and 16-partition merges agree") {
    def run(parts: Int) = FreqItems
      .topK(words.repartition(parts), Seq("lang"), "w", 3, maxMapSize = 256)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    assert(run(1) == run(16))
  }

  test("sketch bytes survive a parquet round-trip and merge to the direct answer") {
    val direct = FreqItems.topK(words, Seq("lang"), "w", 3, maxMapSize = 256)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    // partials per (lang, source-of-origin partition), persisted like an
    // incremental pipeline would
    val dir = java.nio.file.Files.createTempDirectory("graft_sketch")
      .toString + "/partials"
    Tables(spark, sf, "documents")
      .select(col("lang"), col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("lang"), col("source"))
      .agg(FreqItems.sketchBytes("w", maxMapSize = 256).as("sk"))
      .write.parquet(dir)
    val viaStore = spark.read.parquet(dir)
      .groupBy(col("lang"))
      .agg(FreqItems.mergeSketches("sk", maxMapSize = 256).as("fi"))
      .select(col("lang"), posexplode(col("fi")))
      .filter(col("pos") < 3)
      .select(col("lang"), (col("pos") + 1).cast("long").as("rank"),
        col("col.item"), col("col.est"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    assert(viaStore == direct)
  }

  test("KLL: partitioning-invariant below capacity, rank-error bound above") {
    import spark.implicits._
    // below capacity (k=1024 > 500 values): exact + layout-invariant
    def exactRun(parts: Int) = Tables(spark, sf, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("n_tok"))
      .repartition(parts)
      .agg(KllQuantiles.quantiles("n_tok", Seq(0.5), k = 1024).as("qs"))
      .select(col("qs").getItem(0)).collect().head.getDouble(0)
    assert(exactRun(1) == exactRun(16))
    // above capacity: 100k uniform values through k=64 — estimated p50
    // must sit within 3x the published normalized rank error of k=64
    // (~2.9% of rank mass → value error ~±2.9k on uniform 0..100k)
    val big = (0 until 100000).map(_.toDouble).toDF("v").repartition(32)
    val est = big.agg(KllQuantiles.quantiles("v", Seq(0.5), k = 64).as("qs"))
      .select(col("qs").getItem(0)).collect().head.getDouble(0)
    val tol = 3 * 0.029 * 100000
    assert(math.abs(est - 50000) < tol, s"p50 estimate $est off by > $tol")
  }

  test("KLL bytes partials: parquet round-trip + merge == direct quantiles") {
    import spark.implicits._
    val vals = Tables(spark, sf, "documents")
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    val direct = vals.groupBy(col("lang"))
      .agg(KllQuantiles.quantiles("n_tok", Seq(0.25, 0.5, 0.9)).as("qs"))
      .select(col("lang"), col("qs")).as[(String, Seq[Double])]
      .collect().toMap
    // three per-"batch" partials through a parquet round-trip, merged
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_kll_bytes").resolve("p").toString
    vals.withColumn("b", col("n_tok") % 3)
      .groupBy(col("lang"), col("b"))
      .agg(KllQuantiles.sketchBytes("n_tok").as("sk"))
      .write.mode("overwrite").parquet(tmp)
    val merged = spark.read.parquet(tmp)
      .groupBy(col("lang"))
      .agg(KllQuantiles.mergeQuantiles("sk", Seq(0.25, 0.5, 0.9)).as("qs"))
      .select(col("lang"), col("qs")).as[(String, Seq[Double])]
      .collect().toMap
    assert(merged == direct) // exact below capacity, any partitioning
  }

  test("above capacity: top item survives purges within the error bound") {
    import spark.implicits._
    // skewed stream: one item at 5000, 200 tail items at ~25 each,
    // through a deliberately tiny sketch (maxMapSize 8 → constant
    // purging)
    val rows = Seq.fill(5000)("hot") ++
      (1 to 200).flatMap(i => Seq.fill(25)(s"tail_$i"))
    val df = rows.toDF("w").repartition(8)
    val out = df.agg(FreqItems.sketch("w", maxMapSize = 8).as("fi"))
      .select(explode(col("fi")).as("r"))
      .select(col("r.item"), col("r.est"), col("r.lb"), col("r.ub"))
      .collect()
    val hot = out.find(_.getString(0) == "hot")
    assert(hot.isDefined, "dominant item must survive purging")
    // the true count lies within the sketch's own [lb, ub] envelope
    assert(hot.get.getLong(2) <= 5000 && hot.get.getLong(3) >= 5000,
      s"bounds ${hot.get.getLong(2)}..${hot.get.getLong(3)} must bracket 5000")
  }
}
