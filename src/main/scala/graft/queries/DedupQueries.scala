package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Dedup

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

    // SimHash near-dup pairs (Hamming ≤ 6 on 64-bit token-vote hashes).
    // Spark-native murmur/xxhash aren't reproducible in DuckDB →
    // rows-only check + SimHashSpec.
    "q33_simhash" -> Q(
      run = (s, dir) =>
        Dedup.simhashNearDupPairs(Tables(s, dir, "documents"), maxDist = 6)
          .orderBy("id_a", "id_b"))
  )
}
