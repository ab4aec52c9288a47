package graft

import org.apache.spark.sql.execution.ExplainMode

/** Sweep every registered query's physical plan for scale
  * anti-patterns. Every tolerated pattern is an explicit allowlist
  * entry with its justification — anything new fails the build until
  * it's reviewed (the brief's "explain the plan and iterate until it's
  * the plan you'd want", enforced).
  */
class PlanAuditSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  // streaming queries run their own sinks — covered by StreamingSpec
  private val skip = Set("q50_stream_hourly", "q52_stream_dedup",
    "q53_stream_static_join", "q54_stream_sessionize", "q55_stream_stream_join",
    "q56_stream_sliding", "q71_stream_upsert", "q124_stream_asof",
    "q171_changes_stream", "q185_stream_view", "q192_stream_drift",
    "q204_stream_quarantine", "q211_stream_sketch", "q217_stream_hll",
    "q222_stream_join_view", "q226_stream_dedup_watermark",
    "q228_stream_text_index", "q237_stream_kll", "q240_stream_cdc",
    "q252_stream_ohlc", "q266_stream_expectations",
    "q277_stream_atomic_publish", "q285_stream_outer_join",
    "q294_media_lifecycle", "q295_ann_ingest", "q296_zorder_ingest",
    "q300_ivfpq_ingest", "q304_scan_stream", "q306_stream_compact",
    "q317_stream_ratelimit", "q322_native_sink")

  /** pattern → queries where it is the intended plan shape. */
  private val allowed: Map[String, Set[String]] = Map(
    "CartesianProduct" -> Set.empty,
    "BroadcastNestedLoopJoin" -> Set(
      // dense-grid cross join against a tiny broadcast side
      "q07_grid_crossjoin",
      // the vexere-literal gold grids: q7's (operator × 24h) and q8's
      // (operator × 21 facilities) dense cross joins — same tiny
      // broadcast-grid shape as q07_grid_crossjoin
      "cau_7", "cau_8",
      // distinct-count view gate: the 1-row exact-anchor flag cross
      // (q62's 1-row-broadcast shape)
      "q186_distinct_view",
      // brute-force EXACT similarity: deliberate all-pairs scoring with
      // the small side broadcast; the scale path is q42's sign-LSH
      "q40_cosine_topk", "q41_cosine_neardup",
      // hard-negative mining: q40's exact broadcast-queries shape with
      // group + ceiling pruning before the window
      "q157_hard_negatives",
      // SQ8 compressed scan: q40's broadcast-queries shape reading
      // byte codes instead of floats — the win is 4× scan bandwidth,
      // not candidates; IVF cells compose in front for pruning
      "q197_sq8_topk",
      // exact kNN graph: q40's brute shape with queries = corpus — the
      // deliberate ORACLE TWIN of q166's IVF-blocked equi-join form
      // (q166 appears below only because its certified output embeds
      // this same twin as the hash anchor; its IVF path is equi-join)
      "q165_knn_graph",
      // RRF fusion's dense side embeds q40's exact broadcast-queries
      // scan (LSH/IVF are the swap-in scale paths; fusion itself is an
      // outer equi-join of rank tables)
      "q159_hybrid_rrf",
      // MaxSim late interaction: query TOKENS broadcast, corpus tokens
      // stream through map-local scoring into combine-able aggregates
      "q130_maxsim",
      // range join against a 6-row broadcast band table: NLJ cost is
      // |facts|×6 with no shuffle of the fact side (the intended shape;
      // big band tables would use the bucket-point equi-join rewrite)
      "q45_range_join",
      // contamination scoring against a ~10-row broadcast benchmark:
      // |corpus|×|bench| map-local dot products, corpus never shuffles;
      // a fact-sized benchmark would switch to q83's LSH banding
      "q88_embedding_contamination",
      // corpus-size N as a 1-row broadcast dim crossed into the tf×df join
      "q62_tfidf",
      // BM25: the (N, avgdl) scalars as a 1-row broadcast dim crossed
      // into the tf×query-term join (q62's shape)
      "q140_bm25",
      // two-stage retrieval: q140's (N, avgdl) 1-row dim plus the
      // 1-row query-vector frame crossed onto the 20-row shortlist
      "q206_two_stage_retrieval",
      // PMI: the (N, M) token/bigram totals as 1-row broadcast dims
      // crossed into the bigram×unigram join (q62's shape)
      "q141_pmi_collocations",
      // PQ ADC scan: the 32-query LUT side is broadcast and every
      // corpus CODE row (m ints, not the vector) is scored map-locally —
      // the intended IVFADC scoring shape; cell pruning (ivfTopK)
      // composes in front of it when the corpus is cell-clustered
      "q122_pq_topk",
      // same ADC scan shape over the PERSISTED codes table
      "q125_pq_index",
      // triangle census: the 1-row triangle-count and wedge-count
      // scalars crossed into the single output row (q62's shape)
      "q145_triangles",
      // CMS: the 1-row sketch table broadcast into the top-10 exact
      // counts (q62's shape)
      "q146_countmin",
      // KMV overlap matrix: the src_a < src_b pairing of the
      // #sources-row SKETCH table with itself — both sides are
      // dim-sized synopses (20 rows of 256 hashes), the entire point
      // of sketch algebra; the fact-scale work is the one combinable
      // sketch agg upstream
      "q199_kmv_overlap",
      // assortativity: the two 1-row stats frames crossed into the
      // single output row (q62's shape)
      "q148_graph_assortativity",
      // CERTIFIED gate queries (graft.operators.Certify): the BNLJ is
      // the EXACT ORACLE TWIN that anchors the hash-checked output —
      // the approximate path being certified stays a banded/cell
      // equi-join (audited by SimilaritySpec's plan assertions); the
      // twin is gate-scale-only by the same q165 rationale
      "q42_lsh_topk", "q43_ivf_topk", "q123_ivfpq_topk",
      "q166_knn_graph_ivf", "q172_ivf_index", "q287_ivfpq_index",
      "q83_cosine_neardup_lsh", "q119_semantic_dedup_lsh",
      "q293_ivf_recluster",
      // certified queries whose only BNLJ is Certify.attach's 1-ROW
      // flag frame crossed onto the anchor (q62's 1-row-broadcast
      // shape); their exact twins are equi-joins
      "q33_simhash", "q133_lsh_index", "q34_approx_distinct",
      "q89_hll_mergeable",
      // k-anonymity: the suppress_ok flag frame (built from two 1-row
      // aggregates crossed together) attaches to the risky-group
      // anchor — q62's 1-row-broadcast shape
      "q208_k_anonymity",
      // retrieval evaluation ranks with the deliberate EXACT retriever
      // (q40's brute broadcast-queries shape) so the metrics judge the
      // true ranking; an ANN system-under-test would swap in its own
      // equi-join plan, the harness itself is keyed joins + aggs
      "q246_retrieval_eval",
      // calibration: the 1-row corpus-count dim crossed into the
      // histogram (q62's 1-row-broadcast shape)
      "q248_calibration_bins",
      // χ²: the 1-row class-totals dim crossed into the vocabulary
      // aggregate (q62's shape)
      "q249_chi2_select",
      // sparse cosine join: the 1-row corpus-count dim crossed into
      // the capped posting table (q62's shape); candidate generation
      // itself is the posting-list equi-join
      "q251_sparse_cosine_join",
      // matryoshka audit compares TWO deliberate exact brute rankings
      // (q40's broadcast-queries shape × full and truncated dims) —
      // the comparison is what certifies a cheaper truncated INDEX
      "q256_matryoshka_eval",
      // bitext margin mining: gate-scale candidates are the exact
      // brute broadcast (q40's shape); the LSH equi-join swaps in at
      // corpus scale (operator scaladoc), margins evaluate on
      // candidates either way
      "q262_bitext_margin",
      // RI audit: each edge's 1-row orphan-count frame crossed onto
      // its 1-row child-count frame (q62's 1-row-broadcast shape);
      // the orphan detection itself is an anti equi-join
      "q274_ri_audit",
      // vocab drift: the 1-row corpus-totals dim crossed into the
      // vocabulary histogram (q62's shape)
      "q276_vocab_drift",
      // rank normalization: the 1-row corpus-count dim crossed into
      // the score histogram (q62's shape)
      "q281_rank_normalize"),
    "Exchange SinglePartition" -> Set(
      // global row_number over the tiny DISTINCT dim (W1 parity shape;
      // fact-scale keys use PartitionOffsetKeyGen)
      "q06_rownum_ids",
      // scalar (ungrouped) aggregates and global sorts of small finals
      "q17_scalar_agg", "q25_rolling_hash",
      // ORDER BY of a small final result (driver-bound anyway)
      "q36_topk_limit",
      // rerank window over the 20-row shortlist (small final)
      "q206_two_stage_retrieval",
      // distributed prefix sum: the only global window is over the
      // per-partition totals (#partitions rows), by construction
      "q75_sequence_pack", "q95_token_budget_sample", "q100_token_shards",
      // PartitionOffsetKeyGen inside the silver path: same prefix-sum-
      // over-partition-totals shape as q75
      "cau_4_decimal",
      // global GramAgg: ONE dim²/2 buffer per partition reaches the
      // final agg (q17's scalar-aggregate shape — the corpus never
      // moves); the 2145-row triangle join/sort after is dim-sized
      "q224_gram_matrix",
      // AUC / calibration: the prefix sum over the score HISTOGRAM
      // runs PrefixSum's partition-totals window (#partitions rows,
      // q75's shape); q247 additionally folds to a 1-row scalar
      // aggregate (q17's shape)
      "q247_auc_exact", "q248_calibration_bins",
      // skew report: 1-row profile of the key-count histogram —
      // q17's scalar-aggregate shape (the fact table never moves;
      // only per-partition partials reach the final agg)
      "q257_skew_report",
      // join-size audit: 1-row fold of the histogram equi-join —
      // q17's scalar-aggregate shape again
      "q263_join_size",
      // rank normalization: PrefixSum's partition-totals window over
      // the score histogram (q75's shape)
      "q281_rank_normalize"))

  test("every plan is free of non-allowlisted scale anti-patterns") {
    val violations = scala.collection.mutable.ListBuffer.empty[String]
    val cacheLeaks = scala.collection.mutable.ListBuffer.empty[String]
    spark.sharedState.cacheManager.clearCache()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!skip(name)) {
        val df = fn(spark, sf)
        // the same check users get as a library call (core.PlanAudit)
        graft.core.PlanAudit.audit(df,
          allowed.collect { case (p, ok) if ok(name) => p }.toSet)
          .foreach(f => violations += s"$name: ${f.pattern}")
        // Gate-schema rule: no DecimalType may reach a published
        // result (driver hashers canonicalize wide decimals
        // differently — the round-8 q224/q229/q232 pathology). No
        // allowlist: wide integers go out as VARCHAR/BIGINT.
        graft.core.PlanAudit.auditSchema(df)
          .foreach(f => violations += s"$name: ${f.pattern}")
        // Cache-lifecycle guard: a builder may persist internally only if
        // it unpersists before returning (Dedup's loop pattern) — a
        // persist that survives builder return can never be freed by the
        // caller and leaks a CacheManager entry per invocation (the
        // round-2/3 memory-squeeze pathology; see README cache rule).
        if (!spark.sharedState.cacheManager.isEmpty) {
          cacheLeaks += s"$name: CacheManager entry leaked by builder"
          spark.sharedState.cacheManager.clearCache()
        }
      }
    }
    assert(violations.isEmpty, violations.mkString("\n"))
    assert(cacheLeaks.isEmpty, cacheLeaks.mkString("\n"))
  }

  test("PlanAudit library surface: findings returned, require throws, allowlist honored") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("k", "va")
    val b = Seq((1L, "y")).toDF("j", "vb")
    val nlj = a.join(b, col("k") >= col("j"))
    val got = graft.core.PlanAudit.audit(nlj).map(_.pattern)
    assert(got.contains("BroadcastNestedLoopJoin"))
    intercept[IllegalArgumentException] { graft.core.PlanAudit.require(nlj) }
    // tolerated explicitly → clean
    graft.core.PlanAudit.require(nlj, Set("BroadcastNestedLoopJoin"))
    // a plain equi-join is clean with no allowlist
    assert(graft.core.PlanAudit.audit(
      a.join(b.withColumnRenamed("j", "k"), Seq("k"))).isEmpty)
  }

  test("auditSchema flags DecimalType outputs, incl. nested; clean schemas pass") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("k", "v")
    assert(graft.core.PlanAudit.auditSchema(df).isEmpty)
    val top = df.select(col("k").cast(DecimalType(38, 0)).as("d"))
    assert(graft.core.PlanAudit.auditSchema(top)
      .map(_.pattern) === Seq("DecimalType in output column 'd'"))
    val nested = df.select(
      array(col("k").cast(DecimalType(10, 2))).as("arr"),
      struct(col("k").cast(DecimalType(5, 0)).as("inner")).as("st"))
    assert(graft.core.PlanAudit.auditSchema(nested).map(_.pattern) === Seq(
      "DecimalType in output column 'arr'",
      "DecimalType in output column 'st'"))
    // the canonical route out: cast to string — clean
    assert(graft.core.PlanAudit.auditSchema(
      top.select(col("d").cast("string").as("d"))).isEmpty)
  }
}
