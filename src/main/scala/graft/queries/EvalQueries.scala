package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Eval, Features, Similarity}

/** Offline evaluation + supervised feature engineering — judging the
  * engine's own retrievers and quality classifiers before trusting
  * them at corpus scale (graft.operators.Eval/Features scaladoc for
  * the scale shapes). All metrics are exact integer ppm via truncating
  * `div` on non-negative longs, mirrored token-for-token by the
  * DuckDB oracles; only χ² needs wide arithmetic (DECIMAL(38,0) /
  * HUGEINT).
  */
object EvalQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  override def entries: Seq[(String, Q)] = Seq(

    // ----------------------------------------------------------------
    // Ranked-retrieval evaluation: the exact cosine retriever (q40)
    // judged against label-match relevance — hits@10, P@10, R@10, MRR
    // per query. One top-k join against the qrels + two keyed aggs —
    // no windows, nothing driver-side; at 100 TB the qrels join is a
    // key-partitioned equi-join like any fact-fact join.
    "q246_retrieval_eval" -> Q(
      run = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 32)
        val ranked = Similarity.bruteForceTopK(q, emb, k = 10)
        val rel = q.select(col("vec_id").as("query_id"), col("label"))
          .join(emb.select(col("vec_id").as("neighbor_id"), col("label")),
            Seq("label"))
          .filter(col("query_id") =!= col("neighbor_id"))
          .select(col("query_id"), col("neighbor_id"))
        Eval.retrievalMetrics(ranked, rel,
            "query_id", "neighbor_id", "rank", k = 10)
          .orderBy("query_id")
      },
      oracle = Some("""
        WITH ranked AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                                   c.embedding::DOUBLE[]) DESC,
                            c.vec_id) AS rank
          FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
          WHERE q.vec_id < 32),
        rel AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
          FROM embeddings q JOIN embeddings c
            ON q.vec_id != c.vec_id AND q.label = c.label
          WHERE q.vec_id < 32),
        tot AS (SELECT query_id, COUNT(*) AS rel_total FROM rel GROUP BY 1),
        hit AS (
          SELECT r.query_id, COUNT(*) AS hits, MIN(r.rank) AS first_rank
          FROM ranked r JOIN rel
            ON r.query_id = rel.query_id AND r.neighbor_id = rel.neighbor_id
          WHERE r.rank <= 10 GROUP BY 1)
        SELECT t.query_id, CAST(t.rel_total AS BIGINT) AS rel_total,
               CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
               CAST(COALESCE(h.hits, 0) * 1000000 // 10 AS BIGINT) AS p_at_k_ppm,
               CAST(COALESCE(h.hits, 0) * 1000000 // t.rel_total AS BIGINT)
                 AS recall_ppm,
               CAST(COALESCE(1000000 // h.first_rank, 0) AS BIGINT) AS mrr_ppm
        FROM tot t LEFT JOIN hit h USING (query_id)
        ORDER BY query_id""")),

    // ----------------------------------------------------------------
    // Exact tie-corrected AUC (Mann–Whitney) of doc length as an
    // English-detector — the canonical threshold-free classifier
    // metric, computed from the SCORE HISTOGRAM + a distributed prefix
    // sum (never a global per-row rank window; the Rocchio margin
    // discipline). Oracle replays the identical histogram algebra.
    "q247_auc_exact" -> Q(
      run = (s, dir) =>
        Eval.aucExact(
          t(s, dir, "documents")
            .withColumn("is_en", (col("lang") === "en").cast("long")),
          "n_chars", "is_en"),
      oracle = Some("""
        WITH h AS (
          SELECT n_chars AS score,
                 SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos,
                 COUNT(*) AS tot
          FROM documents GROUP BY 1),
        c AS (
          SELECT score, pos, tot,
                 SUM(tot) OVER (ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM h)
        SELECT CAST(SUM(pos) AS BIGINT) AS pos,
               CAST(SUM(tot - pos) AS BIGINT) AS neg,
               CAST((SUM(pos * (2 * cum - tot + 1)) - SUM(pos) * (SUM(pos) + 1))
                    * 1000000 // (2 * SUM(pos) * SUM(tot - pos)) AS BIGINT)
                 AS auc_ppm
        FROM c""")),

    // ----------------------------------------------------------------
    // Reliability table (calibration diagnostic): rank-decile bins of
    // the score, each reporting positive rate vs mean score-percentile
    // midpoint + the scaled ECE term — all exact ppm integers off the
    // same histogram substrate as q247.
    "q248_calibration_bins" -> Q(
      run = (s, dir) =>
        Eval.calibrationBins(
          t(s, dir, "documents")
            .withColumn("is_en", (col("lang") === "en").cast("long")),
          "n_chars", "is_en", bins = 10)
          .orderBy("bin"),
      oracle = Some("""
        WITH h AS (
          SELECT n_chars AS score,
                 SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos,
                 COUNT(*) AS tot
          FROM documents GROUP BY 1),
        c AS (
          SELECT score, pos, tot,
                 SUM(tot) OVER (ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM h),
        nn AS (SELECT COUNT(*) AS n_all FROM documents),
        e AS (
          SELECT pos, tot, cum - tot AS cb,
                 LEAST(9, (cum - tot) * 10 // n_all) AS bin,
                 (2 * (cum - tot) + tot) * 500000 // n_all AS p_mid_ppm
          FROM c CROSS JOIN nn)
        SELECT CAST(bin AS BIGINT) AS bin, CAST(SUM(tot) AS BIGINT) AS n,
               CAST(SUM(pos) AS BIGINT) AS pos,
               CAST(SUM(pos) * 1000000 // SUM(tot) AS BIGINT) AS acc_ppm,
               CAST(SUM(p_mid_ppm * tot) // SUM(tot) AS BIGINT) AS conf_ppm,
               CAST(ABS(SUM(pos) * 1000000 // SUM(tot)
                        - SUM(p_mid_ppm * tot) // SUM(tot))
                    * SUM(tot) AS BIGINT) AS ece_term
        FROM e GROUP BY bin ORDER BY bin""")),

    // ----------------------------------------------------------------
    // χ² feature selection: top-20 tokens by association with the
    // English label. One distinct (doc, token) explode + one
    // vocabulary-sized agg + a 1-row totals broadcast; the χ² formula
    // is per-row column math in DECIMAL(38,0) (HUGEINT in the oracle).
    "q249_chi2_select" -> Q(
      run = (s, dir) =>
        Features.chi2Select(
          t(s, dir, "documents")
            .withColumn("is_en", (col("lang") === "en").cast("long")),
          "text", "doc_id", "is_en", topK = 20),
      oracle = Some("""
        WITH pairs AS (
          SELECT DISTINCT * FROM (
            SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                   unnest(string_split(text, ' ')) AS token
            FROM documents)),
        tok AS (SELECT token, SUM(y) AS a, SUM(1 - y) AS b
                FROM pairs GROUP BY 1),
        tots AS (
          SELECT SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS p_tot,
                 SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS n_tot
          FROM documents)
        SELECT token, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
               CAST(CAST(p_tot + n_tot AS HUGEINT)
                    * (a * (n_tot - b) - b * (p_tot - a))
                    * (a * (n_tot - b) - b * (p_tot - a))
                    * 1000000
                    // ((a + b) * (p_tot + n_tot - a - b) * p_tot * n_tot)
                 AS BIGINT) AS chi2_ppm
        FROM tok CROSS JOIN tots
        WHERE a + b < p_tot + n_tot
        ORDER BY chi2_ppm DESC, token LIMIT 20""")),

    // ----------------------------------------------------------------
    // Leave-one-out target encoding of order priority against the
    // F-status label — the leakage-safe categorical feature (the row's
    // own label excluded from its mean). Category stats are one
    // dim-sized agg broadcast back onto the facts.
    "q250_target_encode" -> Q(
      run = (s, dir) =>
        Features.targetEncodeLoo(
          t(s, dir, "orders")
            .withColumn("y", (col("o_orderstatus") === "F").cast("long")),
          "o_orderpriority", "y")
          .filter(col("o_orderkey") < 3000)
          .select(col("o_orderkey"), col("o_orderpriority"), col("loo_ppm"))
          .orderBy("o_orderkey"),
      oracle = Some("""
        WITH st AS (
          SELECT o_orderpriority,
                 SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS sy,
                 COUNT(*) AS nc
          FROM orders GROUP BY 1)
        SELECT o_orderkey, o_orderpriority,
               CAST((sy - CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    * 1000000 // (nc - 1) AS BIGINT) AS loo_ppm
        FROM orders JOIN st USING (o_orderpriority)
        WHERE o_orderkey < 3000 ORDER BY o_orderkey""")),

    // ----------------------------------------------------------------
    // Matryoshka-style dimension-truncation audit: top-10 retrieval on
    // the FIRST 16 of 64 dimensions vs the full-dimension ranking —
    // overlap@10 per query, exact ppm. Both rankings are
    // deterministic, so the oracle replays the WHOLE comparison (no
    // Certify flags): the question "how much retrieval quality does a
    // 4× cheaper index keep" answered engine-side before committing to
    // a truncated index at scale.
    "q256_matryoshka_eval" -> Q(
      run = (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 32)
        val full = Similarity.bruteForceTopK(q, emb, k = 10)
          .select(col("query_id"), col("neighbor_id"))
        val q16 = q.withColumn("embedding", slice(col("embedding"), 1, 16))
        val c16 = emb.withColumn("embedding", slice(col("embedding"), 1, 16))
        val trunc = Similarity.bruteForceTopK(q16, c16, k = 10)
          .select(col("query_id"), col("neighbor_id"))
        val hits = trunc.join(full, Seq("query_id", "neighbor_id"))
          .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
        q.select(col("vec_id").as("query_id"))
          .join(hits, Seq("query_id"), "left")
          .select(col("query_id"),
            coalesce(col("hits"), lit(0L)).as("hits"),
            (coalesce(col("hits"), lit(0L)) * 100000L).as("overlap_ppm"))
          .orderBy("query_id")
      },
      oracle = Some("""
        WITH full_r AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                                   c.embedding::DOUBLE[]) DESC,
                            c.vec_id) AS rank
          FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
          WHERE q.vec_id < 32),
        trunc_r AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(
                              (q.embedding::DOUBLE[])[1:16],
                              (c.embedding::DOUBLE[])[1:16]) DESC,
                            c.vec_id) AS rank
          FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
          WHERE q.vec_id < 32),
        h AS (
          SELECT t.query_id, COUNT(*) AS hits
          FROM trunc_r t JOIN full_r f
            ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
          WHERE t.rank <= 10 AND f.rank <= 10
          GROUP BY 1)
        SELECT q.vec_id AS query_id,
               CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
               CAST(COALESCE(h.hits, 0) * 100000 AS BIGINT) AS overlap_ppm
        FROM embeddings q LEFT JOIN h ON q.vec_id = h.query_id
        WHERE q.vec_id < 32
        ORDER BY query_id""")),

    // ----------------------------------------------------------------
    // Cross-validated AUC: md5-derived 5-fold assignment (the q48
    // keyed-hash pattern — engines re-derive folds identically) ×
    // per-fold exact AUC (Eval.aucByGroup — the q247 histogram
    // algebra with the running sum PARTITIONED by fold). Fold spread
    // is the stability check a single global AUC hides.
    "q258_cv_auc" -> Q(
      run = (s, dir) =>
        Eval.aucByGroup(
          t(s, dir, "documents")
            .withColumn("is_en", (col("lang") === "en").cast("long"))
            .withColumn("fold",
              conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
                .cast("long") % 5),
          "n_chars", "is_en", "fold")
          .orderBy("fold"),
      oracle = Some("""
        WITH d AS (
          SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))
                   AS BIGINT) % 5 AS fold,
                 n_chars,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
          FROM documents),
        h AS (SELECT fold, n_chars AS score, SUM(y) AS pos, COUNT(*) AS tot
              FROM d GROUP BY 1, 2),
        c AS (
          SELECT fold, pos, tot,
                 SUM(tot) OVER (PARTITION BY fold ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM h)
        SELECT fold, CAST(SUM(pos) AS BIGINT) AS pos,
               CAST(SUM(tot - pos) AS BIGINT) AS neg,
               CAST((SUM(pos * (2 * cum - tot + 1)) - SUM(pos) * (SUM(pos) + 1))
                    * 1000000 // (2 * SUM(pos) * SUM(tot - pos)) AS BIGINT)
                 AS auc_ppm
        FROM c GROUP BY fold ORDER BY fold""")),

    // ----------------------------------------------------------------
    // Skip-gram training pairs (word2vec data generation, Mikolov et
    // al. 2013) with deterministic ∝1/f frequency subsampling of
    // centers — an occurrence survives iff md5(doc,pos) mod f < C, an
    // exact integer rule both engines replay. ±2 positional equi-joins
    // (the q151 positional-index plan); vocab-sized frequency
    // broadcast; nothing quadratic.
    "q264_skipgram_pairs" -> Q(
      run = (s, dir) =>
        graft.operators.TrainPrep.skipGramPairs(
          t(s, dir, "documents"), "doc_id", "text",
          window = 2, keepC = 400L)
          .groupBy(col("center"), col("context"))
          .agg(count(lit(1)).as("n"))
          .orderBy("center", "context"),
      oracle = Some("""
        WITH t AS (SELECT doc_id AS doc, string_split(text, ' ') AS toks
                   FROM documents),
        tok AS (SELECT doc, gs AS pos, toks[gs + 1] AS tok
                FROM t, (SELECT unnest(range(0, 200)) AS gs) g
                WHERE gs < len(toks)),
        freq AS (SELECT tok, COUNT(*) AS f FROM tok GROUP BY 1),
        centers AS (
          SELECT doc, pos, tok AS center FROM tok JOIN freq USING (tok)
          WHERE CAST(('0x' || substr(md5(doc || '_' || pos), 1, 8)) AS BIGINT)
                % f < 400),
        ctx AS (SELECT doc, pos AS cpos, tok AS context FROM tok),
        pairs AS (
          SELECT center, context FROM centers c
          JOIN (SELECT unnest([-2, -1, 1, 2]) AS off) o ON true
          JOIN ctx ON ctx.doc = c.doc AND ctx.cpos = c.pos + o.off)
        SELECT center, context, COUNT(*) AS n
        FROM pairs GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ----------------------------------------------------------------
    // Length-bucketed batch packing + padding-waste audit: docs bucket
    // by 16-token band, order by md5(id) inside the bucket (the
    // q48/q164 deterministic-shuffle rule), cut into batches of 8;
    // each batch reports its Σ(max−len) padding and waste ppm — the
    // measurement that justifies bucketing over naive batching.
    // Windows are per-BUCKET (parallel), never corpus-global.
    "q265_length_batching" -> Q(
      run = (s, dir) =>
        graft.operators.TrainPrep.lengthBatches(
          t(s, dir, "documents"), "doc_id", "text",
          band = 16L, batchSize = 8)
          .orderBy("bucket", "batch_id"),
      oracle = Some("""
        WITH d AS (
          SELECT doc_id AS id,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE len(string_split_regex(trim(text), '\s+')) END
                   AS len
          FROM documents),
        b AS (SELECT id, CAST(len AS BIGINT) AS len,
                     CAST(len // 16 AS BIGINT) AS bucket,
                     md5(CAST(id AS VARCHAR)) AS ord
              FROM d),
        r AS (SELECT *, row_number() OVER (PARTITION BY bucket
                ORDER BY ord, id) AS rn FROM b),
        g AS (
          SELECT bucket, CAST((rn - 1) // 8 AS BIGINT) AS batch_id,
                 COUNT(*) AS n_docs, MAX(len) AS max_len, SUM(len) AS sum_len
          FROM r GROUP BY 1, 2)
        SELECT bucket, batch_id, CAST(n_docs AS BIGINT) AS n_docs,
               CAST(max_len AS BIGINT) AS max_len,
               CAST(sum_len AS BIGINT) AS sum_len,
               CAST(max_len * n_docs - sum_len AS BIGINT) AS padding,
               CAST(CASE WHEN max_len > 0
                 THEN (max_len * n_docs - sum_len) * 1000000
                      // (max_len * n_docs)
                 ELSE 0 END AS BIGINT) AS waste_ppm
        FROM g ORDER BY bucket, batch_id""")),

    // ----------------------------------------------------------------
    // Tokenizer fertility per language: subword-per-word ratio (exact
    // ppm over the corpus sums) — the standard tokenizer-quality audit
    // (high fertility = a language the vocab serves badly, paying more
    // compute per word). One combinable aggregation.
    "q269_fertility" -> Q(
      run = (s, dir) => {
        import graft.functions.TextFunctions._
        t(s, dir, "documents")
          .select(col("lang"), tokenCount(col("text")).as("w"),
            subwordTokenCount(col("text")).as("sw"))
          .groupBy(col("lang"))
          .agg(sum(col("w")).as("words"), sum(col("sw")).as("subwords"))
          .withColumn("fertility_ppm", expr("subwords * 1000000 div words"))
          .orderBy("lang")
      },
      oracle = Some("""
        SELECT lang,
               CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
                 AS words,
               CAST(SUM(len(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))) AS BIGINT) AS subwords,
               CAST(SUM(len(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))) * 1000000
                 // SUM(len(string_split_regex(trim(text), '\s+')))
                 AS BIGINT) AS fertility_ppm
        FROM documents GROUP BY lang ORDER BY lang"""),
      bench = false),

    // ----------------------------------------------------------------
    // Context-length truncation audit: token mass lost per source at a
    // 128-token context — Σ max(0, len−128) over Σ len, exact ppm.
    // The measurement behind choosing a context length / chunking
    // policy before burning compute at scale. One aggregation.
    "q270_truncation_loss" -> Q(
      run = (s, dir) => {
        import graft.functions.TextFunctions._
        t(s, dir, "documents")
          .select(col("source"), tokenCount(col("text")).as("len"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("total_tokens"),
            sum(greatest(col("len") - 128, lit(0L))).as("lost_tokens"),
            sum((col("len") > 128).cast("long")).as("docs_truncated"))
          .withColumn("loss_ppm",
            expr("lost_tokens * 1000000 div total_tokens"))
          .orderBy("source")
      },
      oracle = Some("""
        WITH d AS (
          SELECT source,
                 CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                   AS len
          FROM documents)
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(len) AS BIGINT) AS total_tokens,
               CAST(SUM(GREATEST(len - 128, 0)) AS BIGINT) AS lost_tokens,
               CAST(SUM(CASE WHEN len > 128 THEN 1 ELSE 0 END) AS BIGINT)
                 AS docs_truncated,
               CAST(SUM(GREATEST(len - 128, 0)) * 1000000 // SUM(len)
                 AS BIGINT) AS loss_ppm
        FROM d GROUP BY source ORDER BY source"""),
      bench = false),

    // ----------------------------------------------------------------
    // Mislabel screen: distance of each vector to its OWN label's
    // fixed-point centroid (q63's exact integer centroid math), top-20
    // farthest as relabel candidates — the embedding-space data-QA
    // audit before trusting labels for training or eval. One explode +
    // one centroid agg + one combinable distance agg; all integers.
    "q271_mislabel_screen" -> Q(
      run = (s, dir) => {
        val comp = t(s, dir, "embeddings")
          .select(col("label"), col("vec_id"), posexplode(col("embedding")))
          .select(col("label"), col("vec_id"), col("pos"),
            floor(col("col").cast("double") * 1000000L).cast("long").as("q"))
        val cent = comp.groupBy(col("label"), col("pos"))
          .agg(floor(sum(col("q")).cast("double") / count(lit(1)))
            .cast("long").as("c"))
        comp.join(cent, Seq("label", "pos"))
          .groupBy(col("vec_id"), col("label"))
          .agg(sum((col("q") - col("c")) * (col("q") - col("c"))).as("dist2"))
          .orderBy(col("dist2").desc, col("vec_id"))
          .limit(20)
      },
      oracle = Some("""
        WITH comp AS (
          SELECT label, vec_id, generate_subscripts(embedding, 1) AS pos,
                 CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE) * 1000000)
                   AS BIGINT) AS q
          FROM embeddings),
        cent AS (
          SELECT label, pos,
                 CAST(FLOOR(CAST(SUM(q) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
          FROM comp GROUP BY 1, 2),
        d AS (
          SELECT vec_id, comp.label, SUM((q - c) * (q - c)) AS dist2
          FROM comp JOIN cent USING (label, pos) GROUP BY 1, 2)
        SELECT vec_id, label, CAST(dist2 AS BIGINT) AS dist2
        FROM d ORDER BY dist2 DESC, vec_id LIMIT 20""")),

    // ----------------------------------------------------------------
    // Vocabulary drift between two corpus snapshots (here: even/odd
    // doc halves standing in for version N vs N+1): per-token χ²-style
    // contribution in the cross-multiplied integer form
    // (nB·cA − nA·cB)² · 10⁶ div (nA·nB·(cA+cB)) — the q178 KS idea
    // for CATEGORICAL (token) distributions, exact in
    // DECIMAL(38,0)/HUGEINT. Top-20 most-drifted tokens are the
    // monitoring headline when a crawl's composition shifts. One
    // token histogram agg + vocabulary-sized column math.
    "q276_vocab_drift" -> Q(
      run = (s, dir) => {
        val toks = t(s, dir, "documents")
          .select((col("doc_id") % 2 === 0).cast("int").as("side"),
            explode(split(col("text"), " ")).as("token"))
        val hist = toks.groupBy(col("token"))
          .agg(sum(col("side").cast("long")).as("ca"),
            sum(lit(1L) - col("side")).as("cb"))
        val tots = hist.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
        hist.crossJoin(broadcast(tots))
          .withColumn("drift_ppm", expr("""
            cast(nb * ca - na * cb as decimal(38,0))
              * (nb * ca - na * cb) * 1000000
            div (na * nb * (ca + cb))"""))
          .select(col("token"), col("ca"), col("cb"), col("drift_ppm"))
          .orderBy(col("drift_ppm").desc, col("token"))
          .limit(20)
      },
      oracle = Some("""
        WITH toks AS (
          SELECT CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS side,
                 unnest(string_split(text, ' ')) AS token
          FROM documents),
        hist AS (SELECT token, SUM(side) AS ca, SUM(1 - side) AS cb
                 FROM toks GROUP BY 1),
        tots AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM hist)
        SELECT token, CAST(ca AS BIGINT) AS ca, CAST(cb AS BIGINT) AS cb,
               CAST(CAST(nb * ca - na * cb AS HUGEINT)
                    * (nb * ca - na * cb) * 1000000
                    // (na * nb * (ca + cb)) AS BIGINT) AS drift_ppm
        FROM hist CROSS JOIN tots
        ORDER BY drift_ppm DESC, token LIMIT 20"""),
      bench = false),

    // ----------------------------------------------------------------
    // Poisson-bootstrap AUC: 16 deterministic resampling replicates in
    // ONE corpus pass (md5-drawn Poisson(1) weights; weighted
    // histogram algebra per replicate) — the confidence interval a
    // single AUC hides, with zero RNG state and a full oracle replay.
    "q278_bootstrap_auc" -> Q(
      run = (s, dir) =>
        Eval.aucBootstrap(
          t(s, dir, "documents")
            .withColumn("is_en", (col("lang") === "en").cast("long")),
          "n_chars", "is_en", "doc_id", reps = 16)
          .orderBy("rep"),
      oracle = Some("""
        WITH reps AS (SELECT unnest(range(0, 16)) AS rep),
        d AS (
          SELECT rep, n_chars AS score,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_' ||
                   CAST(rep AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS hh
          FROM documents CROSS JOIN reps),
        wts AS (
          SELECT rep, score, y,
                 CASE WHEN hh < 368 THEN 0 WHEN hh < 736 THEN 1
                      WHEN hh < 920 THEN 2 WHEN hh < 981 THEN 3
                      ELSE 4 END AS w
          FROM d),
        h AS (SELECT rep, score, SUM(w * y) AS pos, SUM(w) AS tot
              FROM wts GROUP BY 1, 2),
        c AS (
          SELECT rep, pos, tot,
                 SUM(tot) OVER (PARTITION BY rep ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM h)
        SELECT rep, CAST(SUM(pos) AS BIGINT) AS pos,
               CAST(SUM(tot - pos) AS BIGINT) AS neg,
               CAST((SUM(pos * (2 * cum - tot + 1)) - SUM(pos) * (SUM(pos) + 1))
                    * 1000000 // (2 * SUM(pos) * SUM(tot - pos)) AS BIGINT)
                 AS auc_ppm
        FROM c GROUP BY rep ORDER BY rep"""),
      bench = false),

    // ----------------------------------------------------------------
    // Percentile-rank normalization: each doc's length score mapped to
    // its tie-group percentile MIDPOINT in exact ppm — the score
    // calibration that makes thresholds comparable across sources
    // (the q248 substrate exposed as a per-row FEATURE). Histogram +
    // distributed prefix sum + one join back; never a per-row rank
    // window.
    "q281_rank_normalize" -> Q(
      run = (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"))
        val hist = graft.operators.PrefixSum.running(
          docs.groupBy(col("n_chars").as("score"))
            .agg(count(lit(1)).as("tot")),
          "score", "tot", "cum")
        docs.join(
            hist.crossJoin(broadcast(docs.agg(count(lit(1)).as("n_all"))))
              .select(col("score").as("n_chars"),
                expr("(2 * (cum - tot) + tot) * 500000 div n_all")
                  .as("pct_ppm")),
            "n_chars")
          .select(col("doc_id"), col("n_chars"), col("pct_ppm"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH h AS (SELECT n_chars AS score, COUNT(*) AS tot
                   FROM documents GROUP BY 1),
        c AS (SELECT score, tot,
                     SUM(tot) OVER (ORDER BY score
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum
              FROM h),
        nn AS (SELECT COUNT(*) AS n_all FROM documents),
        p AS (SELECT score, (2 * (cum - tot) + tot) * 500000 // n_all
                       AS pct_ppm
              FROM c CROSS JOIN nn)
        SELECT doc_id, n_chars, CAST(pct_ppm AS BIGINT) AS pct_ppm
        FROM documents JOIN p ON n_chars = score
        ORDER BY doc_id"""),
      bench = false),

    // ----------------------------------------------------------------
    // Overlapping (strided) chunking — the RAG indexing shape (window
    // 10 tokens, stride 5: every token covered twice, boundaries never
    // split a fact across BOTH copies): chunk starts are pure column
    // math (sequence + explode), text via slice — map-local, the q74
    // pattern with overlap. Emits per-chunk token counts + md5.
    "q282_stride_chunking" -> Q(
      run = (s, dir) => {
        val toks = t(s, dir, "documents")
          .filter(col("doc_id") < 100)
          .select(col("doc_id"), split(col("text"), " ").as("w"))
        toks
          .withColumn("start",
            explode(sequence(lit(0),
              greatest(size(col("w")) - 1, lit(0)), lit(5))))
          .select(col("doc_id"), (col("start") / 5).cast("long").as("chunk_id"),
            concat_ws(" ", slice(col("w"), col("start") + 1, lit(10)))
              .as("chunk"))
          .filter(col("chunk") =!= "")
          .select(col("doc_id"), col("chunk_id"),
            size(split(col("chunk"), " ")).cast("long").as("n_tok"),
            md5(col("chunk")).as("chunk_md5"))
          .orderBy("doc_id", "chunk_id")
      },
      oracle = Some("""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
                   FROM documents WHERE doc_id < 100),
        starts AS (
          SELECT doc_id, w, gs AS start
          FROM t, (SELECT unnest(range(0, 200, 5)) AS gs) g
          WHERE gs <= GREATEST(len(w) - 1, 0)),
        chunks AS (
          SELECT doc_id, start // 5 AS chunk_id,
                 array_to_string(w[start + 1 : start + 10], ' ') AS chunk
          FROM starts)
        SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
               CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_tok,
               md5(chunk) AS chunk_md5
        FROM chunks WHERE chunk != ''
        ORDER BY doc_id, chunk_id"""),
      bench = false)
  )
}
