package graft.operators

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.sources.VersionedTable

/** Persisted INVERTED INDEX with incremental ingest — the lexical
  * retrieval sibling of [[LshIndex]] (dedup) and [[PqIndex]] (ANN):
  * instead of re-tokenizing the whole corpus per query (the q140
  * shape, correct but O(corpus) at serve time), the postings are
  * committed ONCE as durable [[graft.sources.VersionedTable]]s and
  * both maintenance and serving are sub-corpus:
  *
  *  - `append` tokenizes ONLY the incoming batch and appends its
  *    postings + doc lengths — O(batch), the daily-ingest door;
  *  - `searchBm25` reads ONLY the query terms' postings: the postings
  *    table carries a per-file BLOOM FILTER on `term`
  *    ([[VersionedTable.appendWithBloomIndex]]), so the term probe
  *    opens ~(files containing the term + fpp·total) files, never the
  *    corpus — the Lucene/Elasticsearch role on lake storage.
  *
  * Layout under `root`:
  *  - `postings/` — VersionedTable `(doc_id, term, tf)`, bloom on
  *    `term`. At 100 TB the writer would additionally cluster batches
  *    by term so a term's rows concentrate in few files ([[optimize]]
  *    does exactly that on the maintenance cadence); correctness
  *    never depends on clustering.
  *  - `doclen/` — VersionedTable `(doc_id, dl)`: BM25's length
  *    normalizer. Joined only against the candidate docs.
  *  - `_ptr.{gen}` — the index's ATOMIC COMMIT POINTER
  *    ([[graft.sources.PointerCas]]): `(n_docs, sum_dl, postingsV,
  *    doclenV)`, committed as a generation-numbered file only after
  *    BOTH table commits land. Every read serves AT the recorded
  *    versions, so a crash between the postings append and the doclen
  *    append (or before the pointer commit) leaves ORPHAN table
  *    versions that serving never sees and the next maintenance op
  *    restores over (the
  *    [[graft.sources.MaterializedView.refreshJoin]] recovery
  *    pattern) — the index is torn-commit-safe, and concurrent
  *    writers serialize through the pointer generation, like the rest
  *    of the persisted-index family.
  *
  * Scoring is bit-compatible with the ad-hoc corpus query (q140):
  * same Robertson/Sparck-Jones idf `ln((N − df + 0.5)/(df + 0.5) + 1)`,
  * same k1=1.2 / b=0.75, scores rounded to 6dp and summed as
  * DECIMAL(18,6) so the result hash-matches an engine-independent
  * recompute — an index must return exactly what the scan would.
  *
  * Reference anchor: the reference serves ad-hoc SQL over gold tables
  * (Presto/Metabase, out of engine scope); text retrieval is
  * beyond-reference LLM-pipeline surface (BM25: Robertson et al.,
  * TREC-3 1994).
  */
object TextIndex {

  private def postingsRoot(root: String) = new File(root, "postings").getPath
  private def doclenRoot(root: String) = new File(root, "doclen").getPath
  private def positionsRoot(root: String) = new File(root, "positions").getPath
  // pre-upgrade indexes committed a fixed-name `_stats` pointer;
  // without the fallback the bootstrap path would see an empty index
  // and RESET it (zeroed pointer → overwrite on append)
  private def pointerOf(root: String): Option[String] =
    graft.sources.PointerCas.readOrLegacy(new File(root), "_stats")

  /** Sentinel for "this index keeps no positional postings" (5-field
    * pointer); a positional index records posV ≥ −1 as a 6th field. */
  private val PosAbsent = Long.MinValue

  /** Whitespace tokenization → `(doc_id, term, tf)`; ONE explode +
    * map-side-combinable count, the q140 postings convention (docs
    * with no tokens contribute nothing, including to n_docs). */
  private def postingsOf(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** POSITIONAL postings `(doc_id, pos, term)` — raw 0-based token
    * positions (the q151 positional-index base), so phrase adjacency
    * is position arithmetic on equi-join keys. Empty tokens are
    * dropped but their positions are NOT renumbered: a phrase word is
    * never the empty string, and relative offsets stay exact. */
  private def positionsOf(docs: DataFrame, idCol: String,
                          textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))
      .filter(col("term") =!= "")

  /** The committed pointer: (n_docs, sum_dl, postingsV, doclenV).
    * Legacy 2-field sidecars (first TextIndex cut) carry no versions —
    * fall back to the tables' latest, the best available pointer. */
  private def commitState(root: String): (Long, Long, Long, Long) = {
    val toks = pointerOf(root)
      .getOrElse(sys.error(s"no committed index at $root"))
      .trim.split("\\s+")
    if (toks.length >= 4)
      (toks(0).toLong, toks(1).toLong, toks(2).toLong, toks(3).toLong)
    else {
      val pV = VersionedTable.latestVersion(postingsRoot(root)).getOrElse(-1L)
      val dV = VersionedTable.latestVersion(doclenRoot(root)).getOrElse(-1L)
      (toks(0).toLong, toks(1).toLong, pV, dV)
    }
  }

  /** The ingest-writer transaction recorded IN the commit pointer
    * (−1 when never stamped / legacy pointer) — the replay guard a
    * streaming ingest door checks before [[append]]ing a batchId it
    * may already have landed. Stamped by `append(..., txn)` in the
    * SAME atomic pointer move as the data commit, so there is no
    * crash window between "postings visible" and "progress
    * recorded". */
  def committedTxn(root: String): Long =
    pointerOf(root).map(_.trim.split("\\s+")) match {
      case Some(toks) if toks.length >= 5 => toks(4).toLong
      case _ => -1L
    }

  /** (n_docs, sum_dl) covered by the committed index. */
  def stats(root: String): (Long, Long) = {
    val (n, s, _, _) = commitState(root)
    (n, s)
  }

  /** The committed positional-postings version: `Some(posV)` iff this
    * index keeps positional postings (6-field pointer). */
  def posVersion(root: String): Option[Long] =
    pointerOf(root).map(_.trim.split("\\s+")) match {
      case Some(toks) if toks.length >= 6 => Some(toks(5).toLong)
      case _ => None
    }

  private def commitContent(nDocs: Long, sumDl: Long,
                            pV: Long, dV: Long, txn: Long,
                            posV: Long = PosAbsent): String = {
    val tail = if (posV == PosAbsent) "" else s" $posV"
    s"$nDocs $sumDl $pV $dV $txn$tail"
  }

  /** Land `df` on `tableRoot` as the next COMMITTED state on top of
    * `recordedV` — content-deterministically: the staged version is
    * exactly readVersion(recordedV) + the batch
    * ([[VersionedTable.appendOnto]]), never "latest + the batch". A
    * plain append would build on whatever is latest AT COMMIT TIME, so
    * a concurrent appender's table version landing between this
    * writer's pointer read and its append would be silently absorbed
    * into the staged version; if this writer then won the pointer CAS,
    * the published n_docs/sum_dl would exclude that batch and the
    * loser's retry would re-append it — duplicated postings and
    * permanently double-counted BM25 stats. With appendOnto, concurrent
    * versions (and orphans from crashed maintenance ops) stay invisible
    * above the base — no O(|table|) restore rewrite either. Returns the
    * new version to record. */
  private def appendCommitted(df: DataFrame, tableRoot: String,
                              recordedV: Long,
                              bloomCol: Option[String]): Long =
    (bloomCol, recordedV < 0) match {
      case (Some(c), true)  => // fresh (orphans discarded)
        VersionedTable.overwriteWithBloomIndex(df, tableRoot, c)
      case (None, true)     => VersionedTable.overwrite(df, tableRoot)
      case (Some(c), false) =>
        VersionedTable.appendOntoWithBloomIndex(df, tableRoot, recordedV, c)
      case (None, false)    =>
        VersionedTable.appendOnto(df, tableRoot, recordedV)
    }

  /** Tokenize `docs` and commit them as the index's first batch.
    * `positional = true` additionally keeps POSITIONAL postings
    * (`positions/` — (doc_id, pos, term), bloom on term) so
    * [[searchPhrase]] serves k-word phrase queries from the index;
    * the shape is recorded in the commit pointer, so every later
    * [[append]]/[[optimize]]/[[delete]] maintains it without being
    * told. */
  def build(docs: DataFrame, root: String, idCol: String = "doc_id",
            textCol: String = "text", positional: Boolean = false): Unit = {
    new File(root).mkdirs()
    while (!graft.sources.PointerCas.commitIfGen(new File(root),
      graft.sources.PointerCas.gen(new File(root)),
      commitContent(0L, 0L, -1L, -1L, -1L,
        if (positional) -1L else PosAbsent))) ()
    append(docs, root, idCol, textCol)
  }

  /** O(batch) ingest: tokenize ONLY `docs`, append postings (bloom on
    * term) + doc lengths, then move the commit pointer — one atomic
    * rename covering both tables and the stats delta. Batches must not
    * re-send already-indexed doc_ids (append-only corpus — the
    * [[LshIndex]] `check`-then-append door is the dedup gate).
    * Self-initializing on a fresh root (streaming sinks call append
    * only, never build).
    *
    * `txn` ≥ 0 stamps the batch id into the SAME atomic pointer move
    * as the commit (the [[graft.sources.VersionedTable.appendTxn]]
    * protocol): a replayed `txn` ≤ [[committedTxn]] is a NO-OP, and
    * because serving reads AT the pointer, even a crash after the
    * table appends but before the pointer leaves the replayed batch's
    * orphan versions invisible — exactly-once with no sidecar
    * window. Maintenance ops ([[optimize]]/[[delete]]) carry the
    * stamp forward.
    *
    * `autoOptimizeFiles` > 0 is the AUTO-COMPACTION policy (the Delta
    * auto-compaction role): when the committed postings table holds at
    * least that many files after the append, [[optimize]] runs in the
    * same call — incremental appends interleave each batch's whole
    * vocabulary across its own files and degrade the serve-time bloom
    * prune toward a full open; the trigger re-clusters by term before
    * fragmentation compounds. Results are bit-identical before/after
    * (optimize rewrites layout, never rows) and the txn stamp carries
    * through; 0 (default) leaves compaction on the manual maintenance
    * cadence. */
  def append(docs: DataFrame, root: String, idCol: String = "doc_id",
             textCol: String = "text", txn: Long = -1L,
             autoOptimizeFiles: Int = 0,
             autoOptimizeTarget: Int = 8): Unit = {
    while (pointerOf(root).isEmpty) {
      new File(root).mkdirs()
      // bootstrap pointer, generation-guarded like every commit (two
      // racing first-appends: the loser finds the winner's pointer)
      graft.sources.PointerCas.commitIfGen(new File(root),
        graft.sources.PointerCas.gen(new File(root)),
        commitContent(0L, 0L, -1L, -1L, -1L))
      ()
    }
    val spark = docs.sparkSession
    // OPTIMISTIC multi-writer cycle (PointerCas): read the pointer
    // generation, stage the table commits, then commit the pointer iff
    // the generation is unchanged. A lost race leaves this attempt's
    // table versions as invisible orphans (the crash-window stance)
    // and re-runs the WHOLE cycle against the winner's pointer —
    // racing appenders serialize, neither batch is lost, and readers
    // (who read AT the pointer) never see a torn postings/doclen set.
    var committed = false
    // fanOut: whitespace tokenization is the heavy per-row map of the
    // ingest (guide §2.5); postings/positions pass through their own
    // groupBy/AQE-sized exchanges before staging, so the fan never
    // multiplies committed files (unlike the round-15 experiment that
    // fanned the post-aggregation postings frame — measured 2× loss).
    // A/B'd this round with SPARK_GRAFT_BENCH_ONLY: neutral within
    // targeted-run noise locally (q223 3.16 vs 2.84, q231 3.30 vs
    // 3.75, q290 4.01 vs 4.41) — kept for the single-unsplittable-file
    // ingest case the fan exists for.
    val fanned = graft.core.FanOut.fanOut(docs)
    while (!committed) {
      if (txn >= 0 && committedTxn(root) >= txn) return
      val g0 = graft.sources.PointerCas.gen(new File(root))
      val (n0, s0, pV0, dV0) = commitState(root)
      // localCheckpoint: the batch postings feed three consumers
      // (postings append, doclen append, stats roll-up) — tokenize once
      val p = postingsOf(fanned, idCol, textCol).localCheckpoint(true)
      val pV = appendCommitted(p, postingsRoot(root), pV0, Some("term"))
      // doclen derives from the CHECKPOINTED postings with one cheap
      // shuffle — staging materializes it; a second eager checkpoint
      // here bought nothing but an extra job per batch (guide §2.4)
      val dl = p.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      val dV = appendCommitted(dl, doclenRoot(root), dV0, None)
      // positional shape recorded in the pointer → maintain it here.
      // REBALANCE before staging: positionsOf is a pure projection
      // (no aggregation exchange like postingsOf), so the fanned
      // tokenize width would otherwise become the staged file count —
      // measured 4 files/append vs 1 this round (guide §6 small-files;
      // the round-15 q290 regression signature)
      val posV = posVersion(root) match {
        case Some(v0) => appendCommitted(
          graft.core.FanOut.rebalance(positionsOf(fanned, idCol, textCol)),
          positionsRoot(root), v0, Some("term"))
        case None => PosAbsent
      }
      // one 1-row driver aggregate — the O(1) stats delta, computed
      // straight off the checkpointed postings (n_docs = docs with ≥1
      // posting = distinct doc_id; sum_dl = Σ tf — identical to the
      // doclen-frame rollup it replaces, one shuffle fewer)
      val row = p.agg(count_distinct(col("doc_id")).as("n"),
        coalesce(sum(col("tf")), lit(0L)).as("s")).head()
      committed = graft.sources.PointerCas.commitIfGen(new File(root), g0,
        commitContent(n0 + row.getLong(0), s0 + row.getLong(1), pV, dV,
          math.max(txn, committedTxn(root)), posV))
    }
    if (autoOptimizeFiles > 0) {
      // O(manifest) fragmentation probe at the RECORDED version — no
      // relation build / footer reads on the per-batch hot path
      val (_, _, pVNow, _) = commitState(root)
      if (pVNow >= 0 && VersionedTable.fileCount(postingsRoot(root),
          Some(pVNow)) >= autoOptimizeFiles) {
        optimize(spark, root, autoOptimizeTarget)
        ()
      }
    }
  }

  /** The committed postings `(doc_id, term, tf)` — full scan at the
    * RECORDED version (orphans invisible; for audits / term-statistics
    * rollups — serving goes through the pruned path below). */
  def postings(spark: SparkSession, root: String): DataFrame = {
    val (_, _, pV, _) = commitState(root)
    VersionedTable.readVersion(spark, postingsRoot(root), pV)
  }

  /** OPTIMIZE: rewrite the postings RANGE-CLUSTERED on `term` (one
    * overwrite commit, blooms re-derived per file). Incremental
    * appends interleave each batch's whole vocabulary across its own
    * files, so every file's bloom matches every common term and the
    * serve-time prune degrades toward a full open; after clustering,
    * a term's rows live in 1-2 contiguous files and [[searchBm25]]
    * opens ~that many — the Delta `OPTIMIZE ZORDER` role for the
    * retrieval index. Query results are bit-identical before/after
    * (same rows, new layout); time travel keeps the old layout
    * readable. Run it on the maintenance cadence, not per batch. */
  def optimize(spark: SparkSession, root: String,
               targetFiles: Int = 8): Long = {
    // same optimistic cycle as append: a maintenance rewrite racing an
    // ingest must not publish a pointer that drops the ingest's batch
    var out = -1L
    var committed = false
    while (!committed) {
      val g0 = graft.sources.PointerCas.gen(new File(root))
      val (n0, s0, _, dV0) = commitState(root)
      val p = postings(spark, root)
        .repartitionByRange(targetFiles, col("term"), col("doc_id"))
        .sortWithinPartitions(col("term"), col("doc_id"))
      val pV = VersionedTable.overwriteWithBloomIndex(p, postingsRoot(root), "term")
      // positional postings recluster by term too (same fragmentation
      // story: appends interleave each batch's vocabulary)
      val posV = posVersion(root) match {
        case Some(v0) if v0 >= 0 =>
          val pos = VersionedTable.readVersion(spark, positionsRoot(root), v0)
            .repartitionByRange(targetFiles, col("term"), col("doc_id"),
              col("pos"))
            .sortWithinPartitions(col("term"), col("doc_id"), col("pos"))
          VersionedTable.overwriteWithBloomIndex(pos, positionsRoot(root), "term")
        case Some(v0) => v0
        case None => PosAbsent
      }
      committed = graft.sources.PointerCas.commitIfGen(new File(root), g0,
        commitContent(n0, s0, pV, dV0, committedTxn(root), posV))
      out = pV
    }
    out
  }

  /** TAKEDOWN: remove `docIds` from the index (the GDPR/DMCA path for
    * the retrieval layer) — copy-on-write deletes on postings and
    * doclen (only FILES containing a target row are rewritten;
    * [[graft.sources.VersionedTable.delete]]), stats decremented by
    * the removed docs' exact lengths (read BEFORE the delete), commit
    * pointer moved once at the end. After the call, serving behaves
    * as if the docs were never ingested — n_docs, df, avgdl all
    * reflect the removal. COW-rewritten posting files carry no bloom
    * line → the listing prune degrades to a conservative open for
    * those files only; [[optimize]] restores full pruning on the
    * maintenance cadence. */
  def delete(spark: SparkSession, root: String, docIds: Seq[Long]): Unit = {
    require(docIds.nonEmpty, "delete needs at least one doc id")
    var committed = false
    while (!committed) {
    val g0 = graft.sources.PointerCas.gen(new File(root))
    val (n0, s0, pV0, dV0) = commitState(root)
    val gone = VersionedTable.readVersion(spark, doclenRoot(root), dV0)
      .filter(col("doc_id").isin(docIds: _*))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("dl")), lit(0L)).as("s")).head()
    // COW deletes PINNED at the recorded versions (deleteAt): the
    // rewrite is deterministic from the pointer this cycle read —
    // orphans from crashed maintenance ops and a concurrent appender's
    // unpublished versions are equally invisible to it (a delete
    // acting on latest could absorb either into the rewrite)
    val pV = VersionedTable.deleteAt(spark, postingsRoot(root), pV0,
      col("doc_id").isin(docIds: _*))
    val dV = VersionedTable.deleteAt(spark, doclenRoot(root), dV0,
      col("doc_id").isin(docIds: _*))
    val posV = posVersion(root) match {
      case Some(v0) if v0 >= 0 =>
        VersionedTable.deleteAt(spark, positionsRoot(root), v0,
          col("doc_id").isin(docIds: _*))
      case Some(v0) => v0
      case None => PosAbsent
    }
    committed = graft.sources.PointerCas.commitIfGen(new File(root), g0,
      commitContent(n0 - gone.getLong(0), s0 - gone.getLong(1), pV, dV,
        committedTxn(root), posV))
    }
  }

  /** Top-`k` docs by BM25 over `terms` — `(doc_id, n_terms, bm25)`,
    * ties broken by doc_id. Touches: the query terms' posting files
    * (bloom-pruned listing AT the committed version), the doclen
    * table (candidate-doc join), and the stats sidecar. Never the
    * corpus text. */
  def searchBm25(spark: SparkSession, root: String, terms: Seq[String],
                 k: Int): DataFrame = {
    require(terms.nonEmpty, "searchBm25 needs at least one term")
    val (nDocs, sumDl, pV, dV) = commitState(root)
    require(nDocs > 0, s"empty index at $root")
    val avgdl = sumDl.toDouble / nDocs
    val tf = VersionedTable.readWhereEq(spark, postingsRoot(root), "term",
      terms, atVersion = Some(pV))
    // document frequency per query term — exact, from the term's own
    // postings (the pruned read returns ALL rows of each probed term)
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dl = VersionedTable.readVersion(spark, doclenRoot(root), dV)
    val score =
      log((lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1)) *
        (col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / lit(avgdl)))
    tf.join(broadcast(dft), Seq("term"))
      .join(dl, Seq("doc_id"))
      .withColumn("s", round(score, 6))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("s").cast(DecimalType(18, 6))).cast(DoubleType).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** PHRASE search from the positional index: `(doc_id, n_occ)` — one
    * row per document containing the exact k-word phrase, with its
    * occurrence count. Touches ONLY the phrase words' posting files
    * (bloom-pruned listing AT the committed positional version — the
    * [[searchBm25]] prune applied to `positions/`), never the corpus:
    * word i must appear at the first word's position + i, closed by
    * (doc_id, pos) EQUI-joins — position arithmetic is a join-key
    * expression, nothing scans pairs. This is the plan a phrase query
    * compiles to over a positional inverted index (Lucene's phrase
    * scorer role), byte-equal to the q151 corpus-scan formulation. */
  def searchPhrase(spark: SparkSession, root: String,
                   words: Seq[String]): DataFrame = {
    require(words.nonEmpty && words.forall(_.nonEmpty),
      "searchPhrase needs a non-empty phrase of non-empty words")
    val posV = posVersion(root).getOrElse(
      sys.error(s"index at $root keeps no positional postings " +
        "(build with positional = true)"))
    require(posV >= 0, s"empty positional index at $root")
    val pos = VersionedTable.readWhereEq(spark, positionsRoot(root), "term",
      words.distinct, atVersion = Some(posV))
    var cur = pos.filter(col("term") === words.head)
      .select(col("doc_id"), col("pos").as("p0"))
    for (i <- 1 until words.length)
      cur = cur.join(
        pos.filter(col("term") === words(i))
          .select(col("doc_id"), (col("pos") - i).as("p0")),
        Seq("doc_id", "p0"))
    cur.groupBy(col("doc_id")).agg(count(lit(1)).as("n_occ"))
  }
}
