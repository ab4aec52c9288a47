package graft.operators

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions.wordShingles
import graft.sources.VersionedTable

/** Persisted MinHash-LSH dedup index — the lexical sibling of
  * [[PqIndex]]: instead of re-signing the whole corpus every time a
  * batch arrives (the [[Dedup.minhashNearDupPairs]] shape), the
  * corpus' band-bucket rows are committed once as a durable
  * [[graft.sources.VersionedTable]] and daily ingestion
  * (a) `check`s the incoming batch against the STORED bands — an
  * equi-join on (band, band_hash), O(batch) new signatures — and
  * (b) `append`s the admitted docs' bands, O(batch) again.
  *
  * Layout under `root`:
  *  - `scheme.v{v}.txt` — `numHashes bands n`: the banding scheme,
  *    VERSION-PINNED to the bands version it governs
  *    ([[IndexModelFiles]]: staged before the table commit, resolved
  *    at the reader's pinned version — a re-build with a new scheme
  *    never pairs it with old band rows; legacy unversioned
  *    `scheme.txt` resolves through the fallback). MinHash
  *    permutations are seeded constants (Dedup.perms), so signatures
  *    are reproducible from the scheme alone — but bands from a
  *    DIFFERENT scheme never collide with stored ones, so append/check
  *    always re-read the stored scheme rather than trusting defaults;
  *  - `bands/` — VersionedTable of (id, band, band_hash): `bands` ints
  *    per doc, the ~text-free scan side. Shingle sets are NOT stored:
  *    exact-Jaccard verification re-reads only the candidate ids from
  *    the caller-supplied corpus (semi-join), the [[PqIndex.search]]
  *    rescore pattern.
  */
object LshIndex {

  private def bandsRoot(root: String) = new File(root, "bands").getPath

  private def pinnedVersion(root: String): Long =
    VersionedTable.latestVersion(bandsRoot(root))
      .getOrElse(sys.error(s"no committed index at $root"))

  private def readSchemeAt(root: String, v: Long): (Int, Int, Int) = {
    val Array(nh, b, n) = IndexModelFiles.readAt(root, "scheme", v)
      .trim.split(" ").map(_.toInt)
    (nh, b, n)
  }

  private def bandRowsOf(docs: DataFrame, numHashes: Int, bands: Int,
                         n: Int, idCol: String, textCol: String): DataFrame =
    Dedup.bandRows(
      Dedup.minhashSignatures(docs, numHashes, n, textCol, idCol),
      bands, numHashes / bands)

  /** [[bandRowsOf]] for the COMMIT paths (build/append): fan the
    * MinHash signature map out of the single-task scan stage (guide
    * §2.5 — the whole-signature projection is the heavy map; round 15
    * left it single-task here because a bare repartition multiplied
    * staged files per commit), then REBALANCE so the staged file count
    * follows bytes, not task count (guide §6; FanOut.rebalance). The
    * read-side [[check]] keeps plain [[bandRowsOf]] — its output feeds
    * a join, never a commit. */
  private def bandRowsForCommit(docs: DataFrame, numHashes: Int, bands: Int,
                                n: Int, idCol: String,
                                textCol: String): DataFrame =
    graft.core.FanOut.rebalance(
      bandRowsOf(graft.core.FanOut.fanOut(docs), numHashes, bands, n,
        idCol, textCol))

  /** Sign `corpus` and commit its band rows as version 0 (plus the
    * scheme sidecar). */
  def build(corpus: DataFrame, root: String,
            numHashes: Int = 128, bands: Int = 32, n: Int = 3,
            idCol: String = "doc_id", textCol: String = "text"): Long = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    new File(root).mkdirs()
    // stage for the version this build WILL commit (single maintenance
    // writer): a re-build with a new scheme never pairs with old rows
    IndexModelFiles.write(root, "scheme",
      VersionedTable.latestVersion(bandsRoot(root)).map(_ + 1).getOrElse(0L),
      s"$numHashes $bands $n")
    VersionedTable.overwrite(
      bandRowsForCommit(corpus, numHashes, bands, n, idCol, textCol),
      bandsRoot(root))
  }

  /** Sign a NEW batch with the stored scheme and append its band rows —
    * O(batch); existing rows inherited untouched. */
  def append(batch: DataFrame, root: String,
             idCol: String = "doc_id", textCol: String = "text"): Long = {
    val pin = pinnedVersion(root)
    // drop orphan stages from a crashed re-build (see IvfIndex.append)
    IndexModelFiles.dropAbove(root, "scheme", pin)
    val (nh, b, n) = readSchemeAt(root, pin)
    VersionedTable.append(
      bandRowsForCommit(batch, nh, b, n, idCol, textCol), bandsRoot(root))
  }

  /** Near-duplicate pairs between `batch` and the INDEXED corpus:
    * candidates from the stored-bands × batch-bands equi-join
    * (never a corpus self-join, never a corpus re-sign), verified with
    * exact shingle Jaccard — shingles recomputed for the batch and,
    * via a candidate-id semi-join, for ONLY the matched sliver of
    * `corpus`. Same-id pairs are excluded (re-ingesting a doc is not a
    * duplicate of itself). Output: (id_a = indexed id, id_b = batch id,
    * jaccard ≥ threshold). Recall is the banding recall of
    * [[Dedup.minhashNearDupPairs]]; precision is 1 (exact verify). */
  def check(batch: DataFrame, corpus: DataFrame, root: String,
            threshold: Double,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = batch.sparkSession
    // pin the bands version FIRST, then resolve the scheme that signed
    // it — a concurrent re-build can never serve mixed state
    val pin = pinnedVersion(root)
    val (nh, b, n) = readSchemeAt(root, pin)
    val stored = VersionedTable.readVersion(spark, bandsRoot(root), pin)
    // fanOut: the batch signature map is the heavy per-row work of the
    // check (guide §2.5); this path feeds the candidate join, never a
    // commit, so no rebalance is needed
    val fresh = bandRowsOf(graft.core.FanOut.fanOut(batch), nh, b, n,
      idCol, textCol).localCheckpoint(true)
    val candidates = stored.as("l")
      .join(fresh.as("r"),
        col("l.band") === col("r.band") &&
          col("l.band_hash") === col("r.band_hash") &&
          col("l.id") =!= col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    val shCorpus = corpus
      .select(col(idCol).as("id_a"), wordShingles(col(textCol), n).as("sh_a"))
      .join(candidates.select(col("id_a")).distinct(), Seq("id_a"), "left_semi")
    val shBatch = batch
      .select(col(idCol).as("id_b"), wordShingles(col(textCol), n).as("sh_b"))
    candidates
      .join(shCorpus, Seq("id_a"))
      .join(shBatch, Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
