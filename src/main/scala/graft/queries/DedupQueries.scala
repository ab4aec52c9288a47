package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Certify, Dedup}

/** Deduplication operator inventory over `documents`. The exact-Jaccard
  * brute force in DuckDB is the shared oracle for both the
  * inverted-index and the MinHash-LSH implementations — two independent
  * engines computing the same pair set. */
object DedupQueries extends QueryModule {

  /** All-pairs word-3-gram Jaccard ≥ 0.8 in DuckDB (feasible at the
    * sf0.01 correctness gate: 500 docs → 125k pairs). */
  private val bruteForceJaccardSql = """
    WITH sh AS (
      SELECT doc_id,
             list_distinct([string_split(text, ' ')[i] || ' ' ||
                            string_split(text, ' ')[i+1] || ' ' ||
                            string_split(text, ' ')[i+2]
                            for i in range(1, len(string_split(text, ' ')) - 1)]) AS s
      FROM documents
      WHERE len(string_split(text, ' ')) >= 3)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
    ORDER BY id_a, id_b"""

  /** [[bruteForceJaccardSql]] with certification flags appended as
    * literal-1 BIGINT columns (see [[graft.operators.Certify]]). */
  private def jaccardAnchorSql(split: String, flags: String*): String = {
    val flagCols = flags.map(f => s", CAST(1 AS BIGINT) AS $f").mkString
    s"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([string_split(text, ' ')[i] || ' ' ||
                            string_split(text, ' ')[i+1] || ' ' ||
                            string_split(text, ' ')[i+2]
                            for i in range(1, len(string_split(text, ' ')) - 1)]) AS s
      FROM documents
      WHERE len(string_split(text, ' ')) >= 3)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard$flagCols
    FROM sh a JOIN sh b ON $split
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
    ORDER BY id_a, id_b"""
  }

  override def entries: Seq[(String, Q)] = Seq(

    // Exact dedup census per source (hash-groupBy on a text digest).
    "q30_dedup_exact" -> Q(
      run = (s, dir) =>
        Tables(s, dir, "documents")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(md5(col("text"))).as("n_distinct"))
          .withColumn("n_dups", col("n_docs") - col("n_distinct"))
          .orderBy("source"),
      oracle = Some("""
        SELECT source, COUNT(*) AS n_docs,
               COUNT(DISTINCT md5(text)) AS n_distinct,
               COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dups
        FROM documents GROUP BY source ORDER BY source""")),

    // Exact n-gram Jaccard near-dup pairs via shingle inverted index —
    // never materializes n² pairs.
    // ----------------------------------------------------------------
    // DIRECTED n-gram CONTAINMENT pairs (Broder's resemblance vs
    // containment split): |Sa ∩ Sb| / |Sa| ≥ 0.8 catches sub-document
    // inclusion — a doc quoted whole inside a longer one — which
    // Jaccard (q31) structurally under-scores by the size asymmetry.
    // Exact ppm integers; same Σ df² shingle equi-join candidate shape
    // as q31, with the df cap as the boilerplate dial (capped shingles
    // still count in |Sa|, so the cap only lowers measured
    // containment, never invents a pair).
    "q268_containment_join" -> Q(
      run = (s, dir) =>
        graft.operators.Dedup.containmentPairs(
          Tables(s, dir, "documents"), thresholdPpm = 800000L)
          .orderBy("id_a", "id_b"),
      oracle = Some("""
        WITH sh AS (
          SELECT doc_id,
                 list_distinct([string_split(text, ' ')[i] || ' ' ||
                                string_split(text, ' ')[i+1] || ' ' ||
                                string_split(text, ' ')[i+2]
                                for i in range(1, len(string_split(text, ' ')) - 1)]) AS s
          FROM documents),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS sa
          FROM sh a JOIN sh b ON a.doc_id != b.doc_id
          WHERE len(a.s) > 0)
        SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter,
               CAST(sa AS BIGINT) AS sa,
               CAST(inter * 1000000 // sa AS BIGINT) AS containment_ppm
        FROM pairs WHERE inter * 1000000 // sa >= 800000
        ORDER BY id_a, id_b""")),

    // The CAPPED form of q268 — the 100 TB dial ITSELF hash-certified:
    // dfCap=4 genuinely bites at this scale (max shingle df is 7;
    // 44 pairs survive vs q268's 50), and because the cap is a
    // DETERMINISTIC frequency filter, the oracle replays it exactly —
    // shingles in more than dfCap docs leave candidate generation but
    // still count in |Sa|, so the capped containment only ever drops
    // below the exact value, never invents a pair. ScaleProbe
    // `containment` measures the linearity the cap buys.
    "q284_containment_capped" -> Q(
      run = (s, dir) =>
        graft.operators.Dedup.containmentPairs(
          Tables(s, dir, "documents"), thresholdPpm = 800000L, dfCap = 4L)
          .orderBy("id_a", "id_b"),
      oracle = Some("""
        WITH sh AS (
          SELECT doc_id,
                 UNNEST(list_distinct([string_split(text, ' ')[i] || ' ' ||
                                string_split(text, ' ')[i+1] || ' ' ||
                                string_split(text, ' ')[i+2]
                                for i in range(1, len(string_split(text, ' ')) - 1)])) AS g
          FROM documents),
        dfv AS (SELECT g, COUNT(*) AS df FROM sh GROUP BY g),
        sizes AS (SELECT doc_id, COUNT(*) AS sa FROM sh GROUP BY doc_id),
        kept AS (SELECT s.doc_id, s.g FROM sh s JOIN dfv USING (g)
                 WHERE df <= 4),
        i AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
          FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id != b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter,
               CAST(sa AS BIGINT) AS sa,
               CAST(inter * 1000000 // sa AS BIGINT) AS containment_ppm
        FROM i JOIN sizes ON sizes.doc_id = i.id_a
        WHERE inter * 1000000 // sa >= 800000
        ORDER BY id_a, id_b""")),

    "q31_ngram_jaccard" -> Q(
      run = (s, dir) =>
        Dedup.ngramJaccardPairs(Tables(s, dir, "documents"), threshold = 0.8)
          .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("id_a", "id_b"),
      oracle = Some(bruteForceJaccardSql)),

    // Same pair set through MinHash signatures + LSH banding + exact
    // verification; oracle identical to q31 by construction.
    "q32_minhash_lsh" -> Q(
      run = (s, dir) =>
        Dedup.minhashNearDupPairs(Tables(s, dir, "documents"), threshold = 0.8)
          .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("id_a", "id_b"),
      oracle = Some(bruteForceJaccardSql)),

    // Dedup capstone — keep the BEST copy per near-dup group (by
    // n_chars, id tiebreak), drop the rest: pairs → star components →
    // per-group window. Output is the kept census per group; oracle
    // recomputes components with the recursive CTE and applies the
    // same keep rule. bench=false like q80: the pair generation +
    // component cost is already benched via q31/q66.
    "q90_dedup_keep_best" -> Q(
      bench = false,
      run = (s, dir) =>
        Dedup.dedupKeepBest(
          Tables(s, dir, "documents")
            .select(col("doc_id"), col("text"), col("n_chars")),
          threshold = 0.8, keepBy = "n_chars")
          .filter(col("keep"))
          .select(col("component"), col("doc_id").as("kept_id"),
            col("n_chars"))
          .orderBy("component"),
      oracle = Some("""
        WITH RECURSIVE sh AS (
          SELECT doc_id,
                 list_distinct([string_split(text, ' ')[i] || ' ' ||
                                string_split(text, ' ')[i+1] || ' ' ||
                                string_split(text, ' ')[i+2]
                                for i in range(1, len(string_split(text, ' ')) - 1)]) AS s
          FROM documents
          WHERE len(string_split(text, ' ')) >= 3),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
        reach(node, lbl) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
        comp AS (
          SELECT node AS doc_id, MIN(lbl) AS component
          FROM reach GROUP BY node)
        SELECT component, d.doc_id AS kept_id, d.n_chars
        FROM comp JOIN documents d ON comp.doc_id = d.doc_id
        QUALIFY row_number() OVER (PARTITION BY component
          ORDER BY d.n_chars DESC, d.doc_id) = 1
        ORDER BY component""")),

    // Incremental dedup: a "daily batch" (doc_id % 10 = 0) checked
    // against the rest of the corpus through the prefix-filtered A-vs-B
    // join — the ingestion-time dedup shape (no corpus self-join).
    // Oracle: DuckDB brute-force cross-split Jaccard.
    "q84_incremental_dedup" -> Q(
      run = (s, dir) => {
        val docs = Tables(s, dir, "documents")
        Dedup.ngramJaccardJoin(
          docs.filter(col("doc_id") % 10 === 0),
          docs.filter(col("doc_id") % 10 =!= 0), threshold = 0.8)
          .select(col("new_id"), col("corpus_id"),
            round(col("jaccard"), 6).as("jaccard"))
          .orderBy("new_id", "corpus_id")
      },
      oracle = Some("""
        WITH sh AS (
          SELECT doc_id,
                 list_distinct([string_split(text, ' ')[i] || ' ' ||
                                string_split(text, ' ')[i+1] || ' ' ||
                                string_split(text, ' ')[i+2]
                                for i in range(1, len(string_split(text, ' ')) - 1)]) AS s
          FROM documents
          WHERE len(string_split(text, ' ')) >= 3)
        SELECT a.doc_id AS new_id, b.doc_id AS corpus_id,
               ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id % 10 = 0 AND b.doc_id % 10 != 0
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
        ORDER BY new_id, corpus_id""")),

    // SimHash near-dup pairs (Hamming ≤ 6 on 64-bit token-vote hashes).
    // Spark-native xxhash isn't reproducible in DuckDB, so the pairs
    // themselves can't hash-check — CERTIFIED instead: the exact
    // n-gram-Jaccard pairs anchor the hash and SimHash's candidate set
    // folds into one recall flag (RecallProbe: SimHash at maxDist=6
    // recovers 100% of the jaccard≥0.8 pairs → floor 0.8). SimHashSpec
    // pins the hash algorithm itself; q104 oracle-checks it via MD5.
    "q33_simhash" -> Q(
      run = (s, dir) => {
        val docs = Tables(s, dir, "documents")
        // pinned: exact anchors the output AND feeds the recall flag —
        // un-pinned, the prefix-filtered verify joins re-execute per
        // reference (Certify.pin scaladoc)
        val exact = Certify.pin(Dedup.ngramJaccardPairs(docs, threshold = 0.8))
        val approx = Dedup.simhashNearDupPairs(docs, maxDist = 6)
        Certify.attach(
          exact.select(col("id_a"), col("id_b"),
            round(col("jaccard"), 6).as("jaccard")),
          Certify.recallFlag(approx, exact, Seq("id_a", "id_b"),
            0.8, "recall_ok"))
          .orderBy("id_a", "id_b")
      },
      oracle = Some(jaccardAnchorSql("a.doc_id < b.doc_id", "recall_ok"))),

    // The SimHash ALGORITHM (per-token ±1 bit votes, ties set, 64-bit
    // assembly) oracle-verified end-to-end: same expression as q33 with
    // the token hash swapped to MD5 (exists in both engines), emitted as
    // hex so signedness never enters the comparison. Gate-only
    // (bench=false): MD5 per token is the slow path — production SimHash
    // stays on XXH64 (q33, rows-only + DocHashSpec); this row proves the
    // only thing q33's oracle can't reach is the hash primitive itself.
    "q104_simhash_md5" -> Q(
      bench = false,
      run = (s, dir) =>
        Tables(s, dir, "documents").select(
          col("doc_id"),
          lower(lpad(hex(graft.plans.DocHashExpressions
            .simhash64Md5(col("text"))), 16, "0")).as("simhash_hex"))
          .orderBy("doc_id"),
      oracle = Some("""
        WITH th AS (
          SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 16)) AS UBIGINT) AS h
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
                FROM documents)
        ),
        votes AS (
          SELECT doc_id, b.bit,
                 SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
          FROM th CROSS JOIN (SELECT unnest(range(64)) AS bit) b
          GROUP BY doc_id, b.bit
        ),
        sh AS (
          SELECT doc_id, bit_or(CASE WHEN v >= 0 THEN CAST(1 AS UBIGINT) << bit
                                     ELSE CAST(0 AS UBIGINT) END) AS simhash
          FROM votes GROUP BY doc_id
        )
        SELECT doc_id, lower(lpad(to_hex(simhash), 16, '0')) AS simhash_hex
        FROM sh ORDER BY doc_id""")),

    // Dedup-cluster AUDIT: the component-size histogram — how much
    // mass dedup removes, by cluster size (the report a 100 TB dedup
    // run ships with). bench=false: it re-runs q31's pair generation +
    // q80's components verbatim; correctness gate only.
    "q113_cluster_histogram" -> Q(
      bench = false,
      run = (s, dir) => {
        val docs = Tables(s, dir, "documents")
        Dedup.connectedComponentsStar(
          Dedup.ngramJaccardPairs(docs, threshold = 0.8),
          docs.select(col("doc_id")))
          .groupBy(col("component")).agg(count(lit(1)).as("sz"))
          .groupBy(col("sz"))
          .agg(count(lit(1)).as("n_clusters"),
            sum(col("sz")).as("n_docs"),
            (sum(col("sz")) - count(lit(1))).as("n_removable"))
          .orderBy("sz")
      },
      oracle = Some("""
        WITH RECURSIVE sh AS (
          SELECT doc_id,
                 list_distinct([string_split(text, ' ')[i] || ' ' ||
                                string_split(text, ' ')[i+1] || ' ' ||
                                string_split(text, ' ')[i+2]
                                for i in range(1, len(string_split(text, ' ')) - 1)]) AS s
          FROM documents
          WHERE len(string_split(text, ' ')) >= 3),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
        reach(node, lbl) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
        comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node),
        sizes AS (SELECT component, COUNT(*) AS sz FROM comp GROUP BY component)
        SELECT sz, COUNT(*) AS n_clusters, CAST(SUM(sz) AS BIGINT) AS n_docs,
               CAST(SUM(sz) - COUNT(*) AS BIGINT) AS n_removable
        FROM sizes GROUP BY sz ORDER BY sz""")),

    // LEAKAGE-SAFE train/val/test split (Sampling.leakageSafeSplit):
    // q86's md5 split hardened against near-dup leakage — splits are
    // assigned to whole near-dup COMPONENTS (hash the component
    // representative, not the doc id), so a train doc's near-duplicate
    // can never land in test and turn the eval into a memorization
    // probe. Exact Jaccard pairs here (oracle-checkable); the LSH pair
    // generator is the 100 TB drop-in (q103/q119 pairing). bench=false:
    // pair generation re-runs q31 verbatim; correctness gate only.
    // Oracle: the q113 recursive-CTE components + q86's md5 CASE, on
    // the component id.
    "q196_leakage_split" -> Q(
      bench = false,
      run = (s, dir) => {
        val docs = Tables(s, dir, "documents")
        graft.operators.Sampling.leakageSafeSplit(
          docs, Dedup.ngramJaccardPairs(docs, threshold = 0.8), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
          .select(col("id").as("doc_id"), col("component"), col("split"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH RECURSIVE sh AS (
          SELECT doc_id,
                 list_distinct([string_split(text, ' ')[i] || ' ' ||
                                string_split(text, ' ')[i+1] || ' ' ||
                                string_split(text, ' ')[i+2]
                                for i in range(1, len(string_split(text, ' ')) - 1)]) AS s
          FROM documents
          WHERE len(string_split(text, ' ')) >= 3),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
        reach(node, lbl) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
        comp AS (SELECT node AS doc_id, MIN(lbl) AS component
                 FROM reach GROUP BY node)
        SELECT doc_id, component,
               CASE WHEN substr(md5(CAST(component AS VARCHAR)), 1, 8) < 'cccccccd'
                    THEN 'train'
                    WHEN substr(md5(CAST(component AS VARCHAR)), 1, 8) < 'e6666666'
                    THEN 'val'
                    ELSE 'test' END AS split
        FROM comp ORDER BY doc_id""")),

    // ENSEMBLE dedup: production dedup unions independent signals —
    // lexical (3-gram Jaccard, q31's pairs) ∪ semantic (embedding
    // cosine, q41's pairs; vec_id ≡ doc_id) — then groups transitively,
    // so a paraphrase chain bridging a lexical pair and a semantic pair
    // collapses into ONE cluster. bench=false: re-runs both pair
    // generators verbatim; correctness gate only. Oracle: recursive CTE
    // over the UNION of both pair sets, computed independently.
    "q114_ensemble_dedup" -> Q(
      bench = false,
      run = (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val lexical = Dedup.ngramJaccardPairs(docs, threshold = 0.8)
          .select(col("id_a"), col("id_b"))
        val semantic = graft.operators.Similarity
          .cosineNearDupPairs(Tables(s, dir, "embeddings"), 0.4)
          .select(col("id_a"), col("id_b"))
        Dedup.connectedComponentsStar(
          lexical.unionByName(semantic).distinct(),
          docs.select(col("doc_id")))
          .select(col("id").as("doc_id"), col("component"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH RECURSIVE sh AS (
          SELECT doc_id,
                 list_distinct([string_split(text, ' ')[i] || ' ' ||
                                string_split(text, ' ')[i+1] || ' ' ||
                                string_split(text, ' ')[i+2]
                                for i in range(1, len(string_split(text, ' ')) - 1)]) AS s
          FROM documents
          WHERE len(string_split(text, ' ')) >= 3),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
          UNION
          SELECT a.vec_id, b.vec_id
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                       b.embedding::DOUBLE[]) >= 0.4),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
        reach(node, lbl) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node)
        SELECT node AS doc_id, MIN(lbl) AS component
        FROM reach GROUP BY node ORDER BY doc_id""")),

    // Near-dup pairs → dedup GROUPS: iterative min-label connected
    // components over the q31 pair set, every doc mapped to its
    // component representative (what a 100 TB dedup actually keeps).
    // Oracle: DuckDB recursive CTE over the same brute-force pairs —
    // an independent fixpoint computation.
    "q66_dedup_groups" -> Q(
      run = (s, dir) => {
        val docs = Tables(s, dir, "documents")
        Dedup.connectedComponents(
          Dedup.ngramJaccardPairs(docs, threshold = 0.8),
          docs.select(col("doc_id")))
          .select(col("id").as("doc_id"), col("component"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH RECURSIVE sh AS (
          SELECT doc_id,
                 list_distinct([string_split(text, ' ')[i] || ' ' ||
                                string_split(text, ' ')[i+1] || ' ' ||
                                string_split(text, ' ')[i+2]
                                for i in range(1, len(string_split(text, ' ')) - 1)]) AS s
          FROM documents
          WHERE len(string_split(text, ' ')) >= 3),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
        reach(node, lbl) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node)
        SELECT node AS doc_id, MIN(lbl) AS component
        FROM reach GROUP BY node ORDER BY doc_id""")),

    // Same pairs → groups reduction through the LARGE-STAR/SMALL-STAR
    // alternation (Kiveris et al.) — the O(log n)-round path for
    // adversarially deep dedup graphs. Same recursive-CTE oracle as
    // q66: both component algorithms must produce identical labels.
    // bench=false: it would re-run q31's candidate generation verbatim —
    // correctness gate only; q66 stays the benchmarked groups query.
    "q80_dedup_groups_star" -> Q(
      bench = false,
      run = (s, dir) => {
        val docs = Tables(s, dir, "documents")
        Dedup.connectedComponentsStar(
          Dedup.ngramJaccardPairs(docs, threshold = 0.8),
          docs.select(col("doc_id")))
          .select(col("id").as("doc_id"), col("component"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH RECURSIVE sh AS (
          SELECT doc_id,
                 list_distinct([string_split(text, ' ')[i] || ' ' ||
                                string_split(text, ' ')[i+1] || ' ' ||
                                string_split(text, ' ')[i+2]
                                for i in range(1, len(string_split(text, ' ')) - 1)]) AS s
          FROM documents
          WHERE len(string_split(text, ' ')) >= 3),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
        reach(node, lbl) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node)
        SELECT node AS doc_id, MIN(lbl) AS component
        FROM reach GROUP BY node ORDER BY doc_id""")),

    // Persisted LSH dedup index (LshIndex — the lexical sibling of
    // q125's PQ index): the corpus' MinHash band rows live as a
    // VersionedTable; an incoming batch is signed once and checked via
    // an equi-join against the STORED bands (never a corpus re-sign),
    // exact-Jaccard verified on the candidate sliver, then appended.
    // CERTIFIED: the exact cross-split jaccard pairs anchor the hash
    // (prefix-filtered A-vs-B join, same oracle CTE as q31 restricted
    // to the split); the index's candidate pairs fold into a subset
    // flag (precision 1 — exact verify) and a recall flag (128/32
    // MinHash banding at j≥0.8: band-hit probability ≈ 1 → floor 0.8).
    // LshIndexSpec keeps the append/copy-detection contract.
    "q133_lsh_index" -> Q(
      run = (s, dir) => {
        val root = tempRoot("graft_lsh_idx").resolve("i").toString
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id"), col("text"))
        val b = col("doc_id") % 4
        val indexed = docs.filter(b =!= 0)
        val batch = docs.filter(b === 0)
        graft.operators.LshIndex.build(indexed, root)
        val approx = graft.operators.LshIndex
          .check(batch, indexed, root, threshold = 0.8)
        graft.operators.LshIndex.append(batch, root)
        // NOT pinned (tried in this optimization round, measured
        // slower): both twins are shuffle-based, so their repeated
        // references already fold through ReuseExchange — the eager
        // checkpoint jobs only added to the critical path
        val exact = Dedup.ngramJaccardJoin(batch, indexed, threshold = 0.8)
          .select(col("corpus_id").as("id_a"), col("new_id").as("id_b"),
            col("jaccard"))
        Certify.attach(
          exact.select(col("id_a"), col("id_b"),
            round(col("jaccard"), 6).as("jaccard")),
          Certify.subsetFlag(approx, exact, Seq("id_a", "id_b"), "subset_ok"),
          Certify.recallFlag(approx, exact, Seq("id_a", "id_b"),
            0.8, "recall_ok"))
          .orderBy("id_a", "id_b")
      },
      oracle = Some(jaccardAnchorSql(
        "a.doc_id % 4 != 0 AND b.doc_id % 4 = 0",
        "subset_ok", "recall_ok"))),

    // URL canonicalization + metadata dedup — the RefinedWeb/CCNet
    // PRE-content-dedup stage: canonicalize each document's URL
    // (lowercase authority, www./default-port strip, tracking-param
    // strip, fragment/trailing-slash strip), then keep-best per
    // canonical URL (longest text, doc_id tie-break). URLs are derived
    // deterministically from (doc_id, source) on BOTH sides (the
    // documents table carries no URL column — the q60/q73 synthetic
    // modality pattern), exercising every canonicalization rule:
    // mixed-case scheme/host, default ports, a path trailing slash,
    // interleaved tracking + real params, fragments. Scale shape:
    // canonicalization is a map-local regexp chain; the dedup is ONE
    // shuffle on the canonical URL (window keep-best) — this runs
    // ahead of the content-dedup battery and shrinks ITS input.
    "q153_url_dedup" -> Q(
      run = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val id = col("doc_id")
        val url = concat(
          when(id % 2 === 0, lit("HTTPS://")).otherwise(lit("http://")),
          lit("WWW."), col("source"), lit(".Example.COM"),
          when(id % 3 === 0,
            when(id % 2 === 0, lit(":443")).otherwise(lit(":80")))
            .otherwise(lit("")),
          lit("/articles/"), (id % 50).cast("string"),
          when(id % 4 === 0, lit("/")).otherwise(lit("")),
          lit("?utm_source=feed"),
          when(id % 5 === 0, concat(lit("&page="), (id % 2).cast("string")))
            .otherwise(lit("")),
          concat(lit("&utm_campaign=c"), (id % 7).cast("string")),
          lit("#sec"), (id % 3).cast("string"))
        val canon = Tables(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"),
            graft.functions.TextFunctions.canonicalizeUrl(url).as("url"))
        val w = Window.partitionBy(col("url"))
          .orderBy(col("n_chars").desc, col("doc_id"))
        canon
          .withColumn("rk", row_number().over(w))
          .withColumn("n_dups",
            count(lit(1)).over(Window.partitionBy(col("url"))).cast("long"))
          .filter(col("rk") === 1)
          .select(col("url"), col("doc_id").as("kept_doc"), col("n_dups"))
          .orderBy("url")
      },
      oracle = Some("""
        WITH raw AS (
          SELECT doc_id, n_chars,
            (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'http://' END ||
             'WWW.' || source || '.Example.COM' ||
             CASE WHEN doc_id % 3 = 0 THEN
               CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END
             ELSE '' END ||
             '/articles/' || CAST(doc_id % 50 AS VARCHAR) ||
             CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END ||
             '?utm_source=feed' ||
             CASE WHEN doc_id % 5 = 0
                  THEN '&page=' || CAST(doc_id % 2 AS VARCHAR) ELSE '' END ||
             '&utm_campaign=c' || CAST(doc_id % 7 AS VARCHAR) ||
             '#sec' || CAST(doc_id % 3 AS VARCHAR)) AS u
          FROM documents),
        step AS (
          SELECT doc_id, n_chars, regexp_replace(u, '#.*', '') AS nofrag
          FROM raw),
        parts AS (
          SELECT doc_id, n_chars,
            lower(regexp_extract(nofrag,
              '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*')) AS head0,
            regexp_replace(nofrag,
              '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*', '') AS tail0
          FROM step),
        heads AS (
          SELECT doc_id, n_chars, tail0,
            CASE WHEN regexp_extract(h1, '^([a-z0-9+.-]+)://', 1) = 'http'
                 THEN regexp_replace(h1, ':80$', '')
                 WHEN regexp_extract(h1, '^([a-z0-9+.-]+)://', 1) = 'https'
                 THEN regexp_replace(h1, ':443$', '')
                 ELSE h1 END AS head
          FROM (SELECT doc_id, n_chars, tail0,
                  regexp_replace(head0, '://(?:www\.)+', '://') AS h1 FROM parts)),
        tails AS (
          SELECT doc_id, n_chars, head,
            regexp_replace(regexp_replace(regexp_replace(regexp_replace(
              regexp_replace(tail0, '/\?', '?'),
              '&(?:utm_[A-Za-z0-9]+|gclid|fbclid|ref)=[^&]*', '', 'g'),
              '\?(?:utm_[A-Za-z0-9]+|gclid|fbclid|ref)=[^&]*&', '?'),
              '\?(?:utm_[A-Za-z0-9]+|gclid|fbclid|ref)=[^&]*$', ''),
              '/$', '') AS tail
          FROM heads),
        canon AS (SELECT doc_id, n_chars, head || tail AS url FROM tails),
        ranked AS (
          SELECT url, doc_id,
            ROW_NUMBER() OVER (PARTITION BY url
              ORDER BY n_chars DESC, doc_id) AS rk,
            CAST(COUNT(*) OVER (PARTITION BY url) AS BIGINT) AS n_dups
          FROM canon)
        SELECT url, doc_id AS kept_doc, n_dups
        FROM ranked WHERE rk = 1 ORDER BY url""")),

    // Cross-source overlap matrix: pairwise shared distinct word-3-gram
    // shingles + shingle-set Jaccard for every source pair — the
    // corpus-composition analytic behind mixture weighting and
    // cross-source contamination review (which sources are near-copies
    // of each other BEFORE computing mixture weights on them). Scale
    // shape: one explode+distinct to (source, shingle); the pair list
    // pivots through the SHINGLE key, so the join fan-out per shingle
    // is bounded by the source count (≤ #sources rows per key, never
    // doc-pair-quadratic); per-source totals are a #sources-row
    // broadcast dim. Parity: exact integer counts; jaccard is one
    // long/long double division written identically on both sides.
    "q155_source_overlap" -> Q(
      run = (s, dir) => {
        import graft.functions.TextFunctions.wordShingles
        val sh = Tables(s, dir, "documents")
          .select(col("source"), explode(wordShingles(col("text"), 3)).as("sh"))
          .distinct()
          .localCheckpoint(true) // reused: self-join both sides + totals
        val tot = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
        val pairs = sh.toDF("src_a", "sh")
          .join(sh.toDF("src_b", "sh"), Seq("sh"))
          .filter(col("src_a") < col("src_b"))
          .groupBy(col("src_a"), col("src_b"))
          .agg(count(lit(1)).as("shared"))
        pairs
          .join(broadcast(tot.toDF("src_a", "na")), Seq("src_a"))
          .join(broadcast(tot.toDF("src_b", "nb")), Seq("src_b"))
          .withColumn("jaccard",
            round(col("shared") / (col("na") + col("nb") - col("shared")), 6))
          .select(col("src_a"), col("src_b"), col("shared"), col("jaccard"))
          .orderBy("src_a", "src_b")
      },
      oracle = Some("""
        WITH sh0 AS (
          SELECT DISTINCT source,
                 UNNEST([string_split(text, ' ')[i] || ' ' ||
                         string_split(text, ' ')[i+1] || ' ' ||
                         string_split(text, ' ')[i+2]
                         for i in range(1, len(string_split(text, ' ')) - 1)]) AS sh
          FROM documents
          WHERE len(string_split(text, ' ')) >= 3),
        tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
                FROM sh0 GROUP BY source),
        p AS (SELECT a.source AS src_a, b.source AS src_b,
                     CAST(COUNT(*) AS BIGINT) AS shared
              FROM sh0 a JOIN sh0 b ON a.sh = b.sh AND a.source < b.source
              GROUP BY 1, 2)
        SELECT src_a, src_b, shared,
               ROUND(shared / (ta.n + tb.n - shared), 6) AS jaccard
        FROM p JOIN tot ta ON ta.source = src_a
               JOIN tot tb ON tb.source = src_b
        ORDER BY src_a, src_b""")),

    // q155's SKETCH form (operators.Kmv, KmvSketchAgg): the same
    // cross-source overlap matrix from k-minimum-values sketches —
    // n sketches + n² array ops on 256-hash arrays instead of the n²
    // shingle join (at 100 TB the sketches build in one combinable agg
    // pass and the matrix is dim-sized algebra). KMV, unlike HLL,
    // estimates INTERSECTIONS: the k smallest of skA ∪ skB is the
    // union's own sketch; the fraction present in both sides is
    // Jaccard. The md5 bottom-k and the all-BIGINT estimator are
    // deterministic, so the oracle REPLAYS the whole estimator in SQL
    // (the q197 property) — no Certify flags; KmvSpec asserts the
    // error bounds vs q155's exact matrix.
    "q199_kmv_overlap" -> Q(
      run = (s, dir) => {
        import graft.functions.TextFunctions.wordShingles
        val sh = Tables(s, dir, "documents")
          .select(col("source"), explode(wordShingles(col("text"), 3)).as("sh"))
        val sk = graft.operators.Kmv.sketch(sh, "source", md5(col("sh")), 256)
        graft.operators.Kmv.pairStats(sk, "source", 256)
          .orderBy("src_a", "src_b")
      },
      oracle = Some("""
        WITH sh0 AS (
          SELECT DISTINCT source,
                 UNNEST([string_split(text, ' ')[i] || ' ' ||
                         string_split(text, ' ')[i+1] || ' ' ||
                         string_split(text, ' ')[i+2]
                         for i in range(1, len(string_split(text, ' ')) - 1)]) AS sh
          FROM documents
          WHERE len(string_split(text, ' ')) >= 3),
        h AS (SELECT DISTINCT source, md5(sh) AS h FROM sh0),
        r AS (SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source
                ORDER BY h) AS rn FROM h),
        sk AS (SELECT source, list(h ORDER BY h) AS sk
               FROM r WHERE rn <= 256 GROUP BY source),
        pairs AS (
          SELECT a.source AS src_a, b.source AS src_b,
                 a.sk AS ska, b.sk AS skb,
                 list_sort(list_distinct(list_concat(a.sk, b.sk)))[1:256] AS merged
          FROM sk a JOIN sk b ON a.source < b.source),
        m AS (
          SELECT src_a, src_b, ska, skb, merged,
                 CAST(len(merged) AS BIGINT) AS kp,
                 CAST(len(list_intersect(list_intersect(merged, ska), skb))
                   AS BIGINT) AS mt
          FROM pairs)
        SELECT src_a, src_b,
               CASE WHEN len(ska) < 256 THEN CAST(len(ska) AS BIGINT)
                    ELSE (255 * 4294967296)
                         // (CAST(('0x' || substr(ska[256], 1, 8)) AS BIGINT) + 1)
               END AS est_a,
               CASE WHEN len(skb) < 256 THEN CAST(len(skb) AS BIGINT)
                    ELSE (255 * 4294967296)
                         // (CAST(('0x' || substr(skb[256], 1, 8)) AS BIGINT) + 1)
               END AS est_b,
               CASE WHEN len(merged) < 256 THEN CAST(len(merged) AS BIGINT)
                    ELSE (255 * 4294967296)
                         // (CAST(('0x' || substr(merged[256], 1, 8)) AS BIGINT) + 1)
               END AS est_union,
               CASE WHEN kp = 0 THEN 0
                    ELSE (CASE WHEN len(merged) < 256 THEN CAST(len(merged) AS BIGINT)
                               ELSE (255 * 4294967296)
                                    // (CAST(('0x' || substr(merged[256], 1, 8)) AS BIGINT) + 1)
                          END) * mt // kp
               END AS est_inter,
               CASE WHEN kp = 0 THEN 0 ELSE mt * 1000000 // kp END AS jaccard_micro
        FROM m ORDER BY src_a, src_b"""))
  )
}
