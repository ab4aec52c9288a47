package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Deterministic sampling operators for training-data pipelines.
  *
  * All sampling here is KEYED, not RNG-based: membership is a pure
  * function of a stable key (first 8 hex chars of md5(key) compared to
  * a rate threshold), so samples are reproducible across runs, engines
  * and cluster layouts, survive retries/replays unchanged, and never
  * need seed plumbing. The comparison is string-ordered hex — exactly
  * portable to any engine with md5 (the q48 convention).
  */
object Sampling {

  /** 8-hex-digit threshold for `rate` ∈ [0,1]: key kept iff
    * md5-prefix < threshold. Rates that round to ≥ 2³² (1.0 and values
    * within rounding of it) map to "g", which orders after every hex
    * digit — keeps ALL keys, exactly. (Formatting 2³² itself would emit
    * NINE hex digits, and "100000000" compares lexicographically BELOW
    * most 8-digit prefixes — a ~100% rate silently keeping ~6% of
    * keys.) */
  def hexThreshold(rate: Double): String = {
    // epsilon headroom only for float accumulation (assignSplit's
    // cumulative sums) — a genuinely out-of-range rate like 1.5 (an
    // up-weighting mistake in a mixture map) must fail loudly, not
    // silently keep 100%
    require(rate >= 0 && rate <= 1.0 + 1e-9,
      s"rate must be in [0, 1], got $rate")
    val v = math.round(rate * (1L << 32))
    if (v >= (1L << 32)) "g" else f"$v%08x"
  }

  /** Source-weighted mixture sampling — the data-mixing primitive
    * (re-weight heterogeneous sources toward a target distribution
    * before training): each row is kept iff its key's md5-uniform falls
    * under its group's target rate. Groups absent from `rates` are
    * DROPPED (rate 0).
    *
    * Scale shape: the rates table is tiny → broadcast; the corpus is
    * filtered map-locally, never shuffled. Changing the mixture is a
    * re-filter, not a re-shuffle. */
  def mixture(df: DataFrame, groupCol: String, key: Column,
              rates: Map[String, Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rdf = rates.toSeq.map { case (g, r) => (g, hexThreshold(r)) }
      .toDF("__g", "__thr")
    // the group column joins through an explicit string render, so a
    // non-string group column (int language id, date bucket) matches its
    // rates key instead of hitting engine-chosen equality coercion
    df.join(broadcast(rdf), col(groupCol).cast(StringType) === col("__g"))
      .filter(substring(md5(key.cast(StringType)), 1, 8) < col("__thr"))
      .drop("__g", "__thr")
  }

  /** Temperature-based mixture sampling (the multilingual/source
    * re-balancing rule: sample group i with weight ∝ pᵢ^α, α < 1
    * up-weighting rare groups): realized as keyed rates
    * rateᵢ = (nᵢ/n_min)^(α−1), so the rarest group keeps 100% and a
    * group 16× larger keeps 25% at α = 0.5. Group counts are a
    * dim-sized aggregate collected to the driver (#groups rows — the
    * sanctioned S9 pattern); the corpus itself is filtered map-locally
    * via [[mixture]], never shuffled. α = 1 keeps everything
    * (rate 1 ∀ i). */
  def temperatureMixture(df: DataFrame, groupCol: String, key: Column,
                         alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    // group rendered as string up front: a non-string group column would
    // otherwise throw a bare ClassCastException at getString, and the
    // rendered value is exactly what mixture() joins on
    val counts = df.groupBy(col(groupCol).cast(StringType).as("__g"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "temperatureMixture over an empty frame")
    val nMin = counts.values.min.toDouble
    def rate(n: Long) = math.pow(n / nMin, alpha - 1.0)
    val named = counts.collect { case (Some(g), n) => g -> rate(n) }
    val sampled = mixture(df.filter(col(groupCol).isNotNull),
      groupCol, key, named)
    // a NULL group is a real group here (mixture()'s equi-join would
    // silently drop it — null never equals null — breaking the α = 1
    // identity); sample it directly at its own temperature rate
    counts.get(None) match {
      case Some(n) => sampled.unionByName(
        df.filter(col(groupCol).isNull).filter(
          substring(md5(key.cast(StringType)), 1, 8) < lit(hexThreshold(rate(n)))))
      case None => sampled
    }
  }

  /** Deterministic EXACT-k sample per group (eval-set builder): the k
    * smallest-md5(key) ids of each group, via the bounded-heap
    * TopKByKeyAgg — the map-side partial reduces every group to ≤ k
    * pairs per input partition, so the shuffle carries ≤ k·partitions
    * pairs per group, never the group itself (a
    * `row_number().over(partitionBy(group))` window would sort whole
    * fact-scale groups through single tasks). Output:
    * (groupCol, sample_rank 1..k, idCol) — a pure function of the
    * data, stable across runs, engines and layouts. */
  def takePerGroup(df: DataFrame, groupCol: String, idCol: String,
                   k: Int): DataFrame =
    topKByStringKey(df, groupCol, idCol,
      md5(col(idCol).cast(StringType)), k)

  /** Efraimidis–Spirakis weighted sampling WITHOUT replacement, exact k
    * per group: row i is sampled with probability proportional to
    * `weightCol` by ranking on uᵢ^(1/wᵢ) (the A-ES key) and keeping the
    * k largest per group. uᵢ is the md5-uniform of the id — the same
    * keyed-determinism contract as every sampler here: reproducible
    * across runs, engines and layouts, no seed plumbing.
    *
    * Implementation detail: the bounded heap keeps the k SMALLEST
    * string keys, so the A-ES key is flipped to 1 - u^(1/w) and
    * fixed-point-formatted ("%.18f" — lexicographic order equals
    * numeric order on [0,1)). Rows with null/non-positive weight are
    * excluded (zero probability mass). Scale shape = [[takePerGroup]]:
    * map-side partials cap every group at k pairs per partition. */
  def weightedSamplePerGroup(df: DataFrame, groupCol: String,
                             idCol: String, weightCol: String,
                             k: Int): DataFrame = {
    val w = col(weightCol).cast("double")
    val u = (conv(substring(md5(col(idCol).cast(StringType)), 1, 8), 16, 10)
      .cast("double") + 1.0) / 4294967296.0
    val esKey = format_string("%.18f", lit(1.0) - pow(u, lit(1.0) / w))
    topKByStringKey(df.filter(w > 0.0), groupCol, idCol, esKey, k)
  }

  /** Shared bounded-heap top-k: the k smallest `key` strings per group
    * via TopKByKeyAgg — the map-side partial reduces every group to ≤ k
    * pairs per input partition, so the shuffle carries ≤ k·partitions
    * pairs per group, never the group itself (a
    * `row_number().over(partitionBy(group))` window would sort whole
    * fact-scale groups through single tasks). */
  private def topKByStringKey(df: DataFrame, groupCol: String,
                              idCol: String, key: org.apache.spark.sql.Column,
                              k: Int): DataFrame = {
    // the buffer stores ids as longs; a lossy cast (string ids, nulls)
    // would SILENTLY drop rows from an "exact" sample — reject instead
    val idType = df.schema(idCol).dataType
    require(Seq(org.apache.spark.sql.types.LongType,
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.ShortType).contains(idType),
      s"exact-k sampling needs an integral id column, $idCol is $idType")
    val agg = graft.plans.TopKByKeyAgg(
      org.apache.spark.sql.graft.ColumnBridge.expression(key),
      org.apache.spark.sql.graft.ColumnBridge.expression(
        col(idCol).cast("long")),
      k)
    df.groupBy(col(groupCol))
      .agg(org.apache.spark.sql.graft.ColumnBridge
        .column(agg.toAggregateExpression()).as("__top"))
      .select(col(groupCol), posexplode(col("__top")))
      .select(col(groupCol), (col("pos") + 1).cast("long").as("sample_rank"),
        col("col").getField("id").as(idCol))
  }

  /** Deterministic train/val/test assignment: cumulative thresholds
    * over the same keyed md5-uniform, so every row lands in EXACTLY one
    * split (disjoint and exhaustive by construction), membership is
    * stable across runs/engines/cluster layouts, and growing the corpus
    * never moves an existing row between splits. Pure map-local CASE —
    * no shuffle, no sampling pass.
    *
    * `fractions` in order, e.g. Seq("train" -> 0.8, "val" -> 0.1,
    * "test" -> 0.1); must sum to 1 (±1e-9). */
  def assignSplit(key: Column, fractions: Seq[(String, Double)]): Column = {
    require(fractions.nonEmpty && fractions.forall(_._2 >= 0))
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val prefix = substring(md5(key.cast(StringType)), 1, 8)
    val cums = fractions.scanLeft(0.0)(_ + _._2).tail
    // last split is the CASE default → exhaustive even under rounding
    fractions.init.zip(cums.init).foldRight(
      lit(fractions.last._1): Column) { case (((name, _), cum), rest) =>
      when(prefix < hexThreshold(cum), name).otherwise(rest)
    }
  }

  /** Leakage-safe dataset split — [[assignSplit]] hardened against
    * near-duplicate leakage (the held-out-contamination failure mode:
    * doc A in train, its near-dup B in test, and the eval measures
    * memorization). Splits are assigned to whole NEAR-DUP COMPONENTS:
    * hash the component representative, not the doc id, so every
    * member of a dup cluster lands in the same split by construction
    * (SamplingSpec asserts no `pairs` edge crosses splits).
    *
    * `pairs` is any symmetric near-dup pair set (id_a, id_b) — exact
    * n-gram Jaccard for an oracle-checkable gate, MinHash-LSH bands as
    * the 100 TB drop-in (the q103/q119 pairing). Scale shape: the
    * component contraction is the star-operation BSP (O(log n)
    * rounds); the split itself is one map-local md5 CASE. Singleton
    * docs are their own component → plain assignSplit behavior.
    *
    * Output: (id, component, split) — one row per `docs` row. */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame, idCol: String,
                       fractions: Seq[(String, Double)]): DataFrame =
    Dedup.connectedComponentsStar(pairs, docs.select(col(idCol)))
      .withColumn("split", assignSplit(col("component"), fractions))

  /** Deterministic epoch shuffle — the training-data ordering stage:
    * assign every row a (shard, pos) so that reading shards in pos
    * order yields a uniform pseudo-random permutation of the corpus
    * that is a pure function of (epoch, id). Different epochs give
    * independent permutations (the md5 key mixes the epoch in); the
    * same epoch replays byte-identically across runs, engines and
    * cluster layouts — resumable training without persisting an order.
    *
    * Scale shape: shard = md5-uniform % numShards is map-local; the
    * only movement is ONE hash shuffle on shard, and each shard is then
    * sorted independently (pos = rank of the md5 key within the shard).
    * A shard is the training-side read unit — pick numShards so a shard
    * (≈ corpus/numShards) fits a writer task; the global permutation is
    * never materialized through one node. Epoch re-shuffles re-run the
    * map + one shuffle; nothing is stateful. */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
                   numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    // 'shard'/'pos' are the operator's output columns and '__h' its
    // scratch key — refuse inputs that already carry them rather than
    // silently overwriting caller data.
    Seq("shard", "pos", "__h").foreach(c =>
      require(!df.columns.contains(c),
        s"epochShuffle reserves output column '$c'; input already has it"))
    // concat (not concat_ws): a NULL id must propagate to a NULL hash
    // key — concat_ws would skip the NULL element and collapse every
    // NULL id onto md5("<epoch>:"), one shared (shard,pos) neighborhood.
    val h = md5(concat(lit(epoch.toString + ":"),
      col(idCol).cast(StringType)))
    // conv(hex,16,10) returns a decimal STRING — cast before the mod;
    // 8 hex chars < 2³² always fits a long, and is non-negative so
    // % == pmod (and matches DuckDB's ('0x'||…)::BIGINT % n)
    val shard = (conv(substring(h, 1, 8), 16, 10).cast("long")
      % numShards.toLong).as("shard")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): split a total sampling `budget` across groups
    * (languages/sources) as UNIFORMLY as possible subject to a per-
    * group cap of `epochs`×(group size) — small languages are never
    * over-repeated past the epoch cap, head languages absorb the
    * slack. The frequency-proportional and temperature alternatives
    * ([[mixture]]/[[temperatureMixture]]) over-sample the head or
    * over-repeat the tail; UniMax is the budget-feasible uniform fill.
    *
    * Exact integer waterfilling, deterministic: groups sorted by cap
    * ascending (ties on name), a prefix saturates at its cap (prefix
    * property: cap_i·m_i + cum_{i-1} is non-decreasing, so the
    * criterion cap_i·m_i ≤ B − cum_{i−1} flips once), the rest split
    * the remainder evenly with the first `remainder mod u` groups (in
    * sort order) taking one extra. Pure longs — bit-identical in any
    * engine.
    *
    * Scale shape: ONE group-count agg over the corpus; everything
    * after runs on the GROUP table (dim-sized: languages/sources, not
    * documents), where unpartitioned windows are fine. Output:
    * (group, n, cap, alloc), Σ alloc = min(budget, Σ cap). */
  def unimaxAlloc(df: DataFrame, groupCol: String, budget: Long,
                  epochs: Int = 1): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.orderBy(col("cap"), col("grp"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    df.groupBy(col(groupCol).as("grp")).agg(count(lit(1)).as("n"))
      .withColumn("cap", col("n") * epochs)
      .withColumn("i", row_number().over(
        Window.orderBy(col("cap"), col("grp"))).cast("long"))
      .withColumn("cum", sum(col("cap")).over(wOrd))
      .withColumn("g", count(lit(1)).over(wAll))
      .withColumn("sat",
        col("cap") * (col("g") - col("i") + 1) <=
          lit(budget) - (col("cum") - col("cap")))
      .withColumn("s", sum(when(col("sat"), col("cap")).otherwise(0L)).over(wAll))
      .withColumn("k", sum(when(col("sat"), 1L).otherwise(0L)).over(wAll))
      .withColumn("u", col("g") - col("k"))
      .withColumn("alloc", when(col("sat"), col("cap")).otherwise(
        expr(s"($budget - s) div u") +
          when(col("i") - col("k") <= expr(s"($budget - s) % u"), 1L)
            .otherwise(0L)))
      .select(col("grp").as(groupCol), col("n"), col("cap"), col("alloc"))
  }

  /** UniMax sampling at `epochs = 1`: materialize [[unimaxAlloc]]'s
    * allocation as an actual document pick — the `alloc_g` smallest-
    * md5(id) documents of each group (the q48 keyed convention:
    * reproducible across runs, engines, layouts). The allocation table
    * is dim-sized → broadcast; the corpus pays one per-group window.
    * Output: (group, rank, id). */
  def unimaxSample(df: DataFrame, groupCol: String, idCol: String,
                   budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val alloc = unimaxAlloc(df.select(col(groupCol), col(idCol)), groupCol, budget)
      .select(col(groupCol), col("alloc"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast(StringType)), col(idCol))
    df.select(col(groupCol), col(idCol))
      .withColumn("rank", row_number().over(w).cast("long"))
      .join(broadcast(alloc), Seq(groupCol))
      .filter(col("rank") <= col("alloc"))
      .select(col(groupCol), col("rank"), col(idCol))
  }
}
