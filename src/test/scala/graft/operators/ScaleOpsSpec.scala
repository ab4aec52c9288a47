package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Tables
import graft.sources.Lake

/** Scale-path operators: salted skew joins and bucketed co-located
  * joins must produce identical results to their naive forms, and the
  * bucketed join must show a shuffle-free plan. */
class ScaleOpsSpec extends SparkSuite {

  test("saltedInnerJoin equals plain join on a skewed key") {
    import spark.implicits._
    // 10k rows of one hot key + a tail
    val big = ((1 to 10000).map(i => ("hot", i)) ++ (1 to 100).map(i => (s"k$i", i)))
      .toDF("k", "v").repartition(8)
    val small = (Seq("hot") ++ (1 to 100).map(i => s"k$i")).zipWithIndex
      .map { case (k, i) => (k, s"dim$i") }.toDF("k", "d")
    val plain = big.join(small, Seq("k")).groupBy(col("k")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = SkewJoin.saltedInnerJoin(big, small, Seq("k"), salts = 8)
      .groupBy(col("k")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain)
  }

  test("saltedCount equals plain groupBy count") {
    import spark.implicits._
    val df = ((1 to 5000).map(_ => "hot") ++ (1 to 50).map(i => s"k$i"))
      .toDF("k").repartition(8)
    val plain = df.groupBy(col("k")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = SkewJoin.saltedCount(df, col("k"), salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain)
  }

  test("bucketed tables join with zero shuffle") {
    val sf = "/root/testdata/sf0.001"
    Lake.writeBucketed(Tables(spark, sf, "orders"), "b_orders", "o_orderkey", 8)
    Lake.writeBucketed(Tables(spark, sf, "lineitem"), "b_lineitem", "l_orderkey", 8)
    // force the shuffle-family join path: at real scale neither side
    // broadcasts, which is exactly when bucketing pays off
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem").join(
        spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("o_totalprice"), col("l_quantity"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() == Tables(spark, sf, "lineitem").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("mixture sampling: rates honored, deterministic, missing groups dropped") {
    val sf = "/root/testdata/sf0.01"
    val docs = Tables(spark, sf, "documents")
    val rates = Map("en" -> 0.25, "de" -> 1.0, "zh" -> 0.0)
    def run() = Sampling.mixture(docs, "lang", col("doc_id"), rates)
    val kept = run().groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rate 1.0 keeps everything EXACTLY; rate 0 and absent groups drop
    assert(kept("de") == totals("de"))
    assert(!kept.contains("zh") && !kept.contains("es") && !kept.contains("fr"))
    // rate 0.25 lands near a quarter (keyed Bernoulli, ~240 en docs)
    val enFrac = kept("en").toDouble / totals("en")
    assert(enFrac > 0.1 && enFrac < 0.4, s"en fraction $enFrac")
    // determinism: same membership on a re-run
    assert(run().select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == run().select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    // threshold edge cases: anything that ROUNDS to 2^32 must map to
    // "g" (keep-all) — formatting 2^32 itself would emit 9 hex digits,
    // which compares BELOW most 8-digit prefixes (keep ~6%, not ~100%)
    assert(Sampling.hexThreshold(1.0) == "g")
    assert(Sampling.hexThreshold(0.9999999999) == "g")
    assert(Sampling.hexThreshold(0.0) == "00000000")
    assert(Sampling.hexThreshold(0.5) == "80000000")
    // out-of-range rates fail loudly (a 1.5 "rate" is a mis-specified
    // mixture, not a keep-all)
    intercept[IllegalArgumentException](Sampling.hexThreshold(1.5))
    intercept[IllegalArgumentException](Sampling.hexThreshold(-0.1))
  }

  test("temperatureMixture: rarest group kept whole, larger groups damped by (n/n_min)^(α-1)") {
    val sf = "/root/testdata/sf0.01"
    val docs = Tables(spark, sf, "documents")
    val totals = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = totals.values.min
    val rarest = totals.collect { case (g, n) if n == nMin => g }.toSet
    val kept = Sampling.temperatureMixture(docs, "lang", col("doc_id"), 0.5)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the rarest group's rate is exactly 1.0 → kept whole
    rarest.foreach(g => assert(kept(g) == totals(g), g))
    // every other group lands near its (n/n_min)^(-1/2) target
    totals.foreach { case (g, n) =>
      val want = math.pow(n.toDouble / nMin, -0.5)
      val got = kept(g).toDouble / n
      assert(math.abs(got - want) < 0.15, s"$g: got $got want $want")
    }
    // α = 1 is the identity mixture
    assert(Sampling.temperatureMixture(docs, "lang", col("doc_id"), 1.0)
      .count() == docs.count())
    intercept[IllegalArgumentException](
      Sampling.temperatureMixture(docs, "lang", col("doc_id"), 1.5))
    // a NULL group is a group, not a silent drop (mixture()'s equi-join
    // would lose it): α = 1 identity holds with nulls present, and at
    // α < 1 the null group is sampled at its own rate
    val withNull = docs.withColumn("lang",
      when(col("doc_id") % 5 === 0, lit(null)).otherwise(col("lang")))
    assert(Sampling.temperatureMixture(withNull, "lang", col("doc_id"), 1.0)
      .count() == docs.count())
    val sampledNull = Sampling
      .temperatureMixture(withNull, "lang", col("doc_id"), 0.5)
      .filter(col("lang").isNull).count()
    val totalNull = withNull.filter(col("lang").isNull).count()
    assert(sampledNull > 0 && sampledNull <= totalNull)
  }

  test("mixture and temperatureMixture accept non-string group columns") {
    val sf = "/root/testdata/sf0.01"
    val docs = Tables(spark, sf, "documents")
      .withColumn("lang_id",
        when(col("lang") === "en", 0).otherwise(1)) // IntegerType group
    // mixture: rates keyed by the string RENDER of the int group
    val kept = Sampling.mixture(docs, "lang_id", col("doc_id"),
      Map("0" -> 1.0, "1" -> 0.0))
    assert(kept.count() == docs.filter(col("lang") === "en").count())
    assert(kept.columns.toSeq == docs.columns.toSeq) // schema preserved
    // temperatureMixture: used to throw ClassCastException at getString
    val t1 = Sampling.temperatureMixture(docs, "lang_id", col("doc_id"), 1.0)
    assert(t1.count() == docs.count()) // α = 1 identity holds for int groups
    val t05 = Sampling.temperatureMixture(docs, "lang_id", col("doc_id"), 0.5)
    assert(t05.count() > 0 && t05.count() < docs.count())
  }

  test("takePerGroup: equals the window formulation, layout-invariant") {
    val sf = "/root/testdata/sf0.01"
    val docs = Tables(spark, sf, "documents").select(col("doc_id"), col("lang"))
    def run(parts: Int) = Sampling
      .takePerGroup(docs.repartition(parts), "lang", "doc_id", 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val expected = {
      import org.apache.spark.sql.expressions.Window
      docs.withColumn("rk", row_number().over(Window.partitionBy(col("lang"))
          .orderBy(md5(col("doc_id").cast("string")))).cast("long"))
        .filter(col("rk") <= 7)
        .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(0))).toSet
    }
    assert(run(1) == expected)
    assert(run(16) == expected)
    // groups smaller than k return the whole group, ranked
    val tiny = docs.limit(3)
    assert(Sampling.takePerGroup(tiny, "lang", "doc_id", 100).count() == 3)
  }

  test("weightedSamplePerGroup: heavy rows dominate, zero/null weights excluded, layout-invariant") {
    import spark.implicits._
    val df = ((1L to 100L).map(i => (i, "g", 0.001)) ++
      Seq((999L, "g", 1e9), (1000L, "g", 0.0), (1001L, "g", -3.0)))
      .toDF("doc_id", "lang", "w")
    def run(parts: Int) = Sampling
      .weightedSamplePerGroup(df.repartition(parts), "lang", "doc_id", "w", 5)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val s1 = run(1); val s16 = run(16)
    assert(s1.toSeq == s16.toSeq) // pure function of the data, not layout
    // w=1e9 → u^(1/w) ≈ 1 → always the top-ranked sample
    assert(s1.head == ((1L, 999L)))
    // zero and negative weights carry no probability mass
    val ids = s1.map(_._2).toSet
    assert(!ids.contains(1000L) && !ids.contains(1001L))
    assert(s1.length == 5)
    // proportionality direction: across many distinct weights, a 100×
    // heavier row out-ranks a lighter one far more often than not —
    // spot-check the math on one pair analytically instead of an RNG:
    // key(w) = u^(1/w) is increasing in w for fixed u < 1
    val u = 0.3
    assert(math.pow(u, 1.0 / 10.0) > math.pow(u, 1.0 / 2.0))
  }

  test("assignSplit: disjoint+exhaustive, near target fractions, growth-stable") {
    val sf = "/root/testdata/sf0.01"
    val docs = Tables(spark, sf, "documents")
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val split = docs.withColumn("split",
      Sampling.assignSplit(col("doc_id"), fr))
    val counts = split.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.count()
    // exhaustive: every row in exactly one split (one column ⇒ disjoint)
    assert(counts.values.sum == total)
    assert(counts.keySet == Set("train", "val", "test"))
    assert(math.abs(counts("train").toDouble / total - 0.8) < 0.06)
    // growth stability: membership on a subset equals membership on the
    // full corpus restricted to that subset (assignment is per-key)
    val half = docs.filter(col("doc_id") < 250).withColumn("split",
      Sampling.assignSplit(col("doc_id"), fr))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val fullRestricted = split.filter(col("doc_id") < 250)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(half == fullRestricted)
  }

  test("leakageSafeSplit: no near-dup edge crosses splits; singletons match assignSplit") {
    val sf = "/root/testdata/sf0.01"
    val docs = Tables(spark, sf, "documents")
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.8)
      .select(col("id_a"), col("id_b"))
    val split = Sampling.leakageSafeSplit(docs, pairs, "doc_id", fr)
    val byId = split.select("id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId.size == docs.count())
    // the leakage guarantee: both endpoints of EVERY near-dup pair
    // land in the same split
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    edges.foreach { case (a, b) => assert(byId(a) == byId(b), s"($a,$b)") }
    // docs in no pair are their own component → plain assignSplit
    val inPair = edges.flatMap(e => Seq(e._1, e._2)).toSet
    val solo = split.filter(!col("id").isin(inPair.toSeq: _*))
      .withColumn("plain", Sampling.assignSplit(col("id"), fr))
    assert(solo.filter(col("split") =!= col("plain")).count() == 0)
    assert(solo.count() > 0)
  }

  test("epochShuffle: permutation per epoch, dense per-shard positions, layout-invariant, epochs independent") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables(spark, sf, "documents").select(col("doc_id"))
    val n = docs.count()
    val e3 = Sampling.epochShuffle(docs, "doc_id", epoch = 3, numShards = 8)
    val rows = e3.select("shard", "pos", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every doc appears exactly once — it IS a permutation
    assert(rows.length == n)
    assert(rows.map(_._3).distinct.length == n)
    // positions are dense 1..|shard| within each shard
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._2).sorted.toSeq == (1L to g.length).toSeq)
    }
    // deterministic + layout-invariant: a different input partitioning
    // yields the identical (shard, pos) assignment
    val relaid = Sampling.epochShuffle(
      docs.repartition(13), "doc_id", epoch = 3, numShards = 8)
      .select("shard", "pos", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(relaid == rows.toSet)
    // a different epoch is a genuinely different permutation
    val e4 = Sampling.epochShuffle(docs, "doc_id", epoch = 4, numShards = 8)
      .select("shard", "pos", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(e4 != rows.toSet)
  }

  test("unimaxAlloc: caps honored, budget exhausted, uniform fill, epoch caps") {
    import spark.implicits._
    // group sizes 5, 10, 20, 100
    val rows = Seq(("a", 5), ("b", 10), ("c", 20), ("d", 100))
      .flatMap { case (g, n) => (1 to n).map(i => (g, s"$g$i")) }
    val df = rows.toDF("grp", "id")

    def allocMap(budget: Long, epochs: Int = 1) =
      Sampling.unimaxAlloc(df, "grp", budget, epochs).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap

    // budget below total: a/b/c saturate, d absorbs the slack
    val m = allocMap(60)
    assert(m("a") == ((5L, 5L, 5L)) && m("b") == ((10L, 10L, 10L))
      && m("c") == ((20L, 20L, 20L)))
    assert(m("d")._3 == 25L)
    assert(m.values.map(_._3).sum == 60L)

    // budget above total caps: everyone keeps everything
    val all = allocMap(1000)
    assert(all.values.forall { case (n, cap, alloc) => alloc == cap && cap == n })

    // tight budget: uniform split with remainder to the sort-order head
    val tight = allocMap(10)
    assert(tight.values.map(_._3).sum == 10L)
    assert(tight.values.map(_._3).max - tight.values.map(_._3).min <= 1L)

    // epochs scale the caps (alloc may exceed n, never epochs*n)
    val ep = allocMap(300, epochs = 2)
    assert(ep.values.forall { case (n, cap, alloc) => cap == 2 * n && alloc <= cap })
    assert(ep.values.map(_._3).sum == 270L) // min(300, sum caps = 270)

    // sample materializes the allocation exactly, layout-invariant
    val s1 = Sampling.unimaxSample(df, "grp", "id", 60).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val s2 = Sampling.unimaxSample(df.repartition(7), "grp", "id", 60).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(s1 == s2)
    assert(s1.size == 60)
    assert(s1.groupBy(_._1).view.mapValues(_.size).toMap ==
      Map("a" -> 5, "b" -> 10, "c" -> 20, "d" -> 25))
  }
}
