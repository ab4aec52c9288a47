package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Blocked fuzzy-match join (entity resolution) with a TWO-LEVEL block
  * that stays EXACT — the q72 scale fix.
  *
  * Single-level blocking (join on a block key, Levenshtein inside the
  * block) costs Σ block² candidate pairs: fine at 25 nations × small
  * blocks, but at 100× a hot block dominates the stage. The second
  * level cuts the candidate set on STRING LENGTH, which is sound for
  * edit distance because `lev(a,b) ≥ |len(a) − len(b)|`:
  *
  *  1. banded pass — candidates join on (block, length bucket) with
  *     the left side exploded to its ±`band` bucket range, so a pair
  *     differing more than `band` in length never materializes;
  *  2. any left row whose banded best distance exceeds `band` (or that
  *     found no banded candidate) is the ONLY case where a better
  *     match could hide outside the band — those rows (rare: a name's
  *     nearest neighbor usually sits within a few edits) fall back to
  *     the full block.
  *
  * The union is row-for-row identical to the single-level form — a
  * strictly-better or tie-breaking candidate for a resolved row has
  * `lev ≤ best ≤ band`, hence `|len diff| ≤ band`, hence was in the
  * banded pass (FuzzyJoinSpec pins equality; the `fuzzy` ScaleProbe
  * measures the candidate-pair cut). Candidate cost becomes
  * Σ (block, length-bucket)² · (2·band+1) + Σ unresolved·block — the
  * length distribution inside a hot block is what a hot block is made
  * of, so the cut compounds exactly where it matters.
  *
  * Output: one row per left row that has ≥ 1 same-block right row —
  * (leftId, leftName, best_match, lev), ties broken to the smallest
  * right name (the reference ordering).
  */
object FuzzyJoin {

  def bestMatch(left: DataFrame, right: DataFrame,
                leftId: String, leftName: String, rightName: String,
                blockCol: String, band: Int = 4): DataFrame = {
    require(band >= 0, "band must be non-negative")
    // fanOut: the per-candidate Levenshtein runs in the probe side's
    // scan stage — single-task on a single-file dim (guide §2.5)
    val l = graft.core.FanOut.fanOut(
      left.select(col(leftId).as("__lid"), col(leftName).as("__ln"),
        col(blockCol).as("__blk")))
    val r = right.select(col(rightName).as("__rn"), col(blockCol).as("__blk"))
      .withColumn("__rlen", length(col("__rn")))
    val w = Window.partitionBy(col("__lid"))
      .orderBy(col("lev"), col("__rn"))

    def best(cands: DataFrame): DataFrame = cands
      .withColumn("lev", levenshtein(col("__ln"), col("__rn")))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("__lid"), col("__ln"), col("__rn"), col("lev"))

    // pass 1: (block, length-bucket) equi-join, left exploded to its
    // ±band bucket range
    val banded = best(
      l.withColumn("__rlen",
        explode(sequence(length(col("__ln")) - band,
          length(col("__ln")) + band)))
        .filter(col("__rlen") >= 1)
        .join(r, Seq("__blk", "__rlen")))
    val resolved = banded.filter(col("lev") <= band)

    // pass 2: full block for the rows the band could not certify
    val unresolved = l.join(resolved.select(col("__lid")), Seq("__lid"),
      "left_anti")
    val fallback = best(unresolved.join(r.drop("__rlen"), Seq("__blk")))

    resolved.unionByName(fallback)
      .select(col("__lid").as(leftId), col("__ln").as(leftName),
        col("__rn").as("best_match"),
        col("lev").cast(LongType).as("lev"))
  }

  /** The blocking dial, automated: one dim-sized count agg probes the
    * hot-block size and the two-level band engages only past
    * `bandThreshold` rows in the largest block — below it the banded
    * pass's extra shuffle + anti-join costs more than it saves (the
    * `fuzzy` ScaleProbe puts the wall-clock crossover around 4k rows
    * per block; at sf0.1's ~400-row nation blocks single-level wins
    * 2×). Output is row-identical on either side of the switch, so the
    * dial changes COST only, never answers. */
  def bestMatchAdaptive(left: DataFrame, right: DataFrame,
                        leftId: String, leftName: String, rightName: String,
                        blockCol: String, band: Int = 4,
                        bandThreshold: Long = 4000): DataFrame = {
    val row = right.groupBy(col(blockCol)).agg(count(lit(1)).as("__n"))
      .agg(max(col("__n"))).head()
    val maxBlock = if (row.isNullAt(0)) 0L else row.getLong(0)
    if (maxBlock >= bandThreshold)
      bestMatch(left, right, leftId, leftName, rightName, blockCol, band)
    else
      bestMatchSingleLevel(left, right, leftId, leftName, rightName, blockCol)
  }

  /** The single-level (block-only) formulation — the oracle twin
    * [[bestMatch]] must equal row-for-row. */
  def bestMatchSingleLevel(left: DataFrame, right: DataFrame,
                           leftId: String, leftName: String,
                           rightName: String,
                           blockCol: String): DataFrame = {
    val w = Window.partitionBy(col(leftId))
      .orderBy(col("lev"), col(rightName))
    // fanOut: see bestMatch — the Levenshtein map dominates
    graft.core.FanOut.fanOut(
      left.select(col(leftId), col(leftName), col(blockCol)))
      .join(right.select(col(rightName), col(blockCol)), Seq(blockCol))
      .withColumn("lev", levenshtein(col(leftName), col(rightName)))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col(leftId), col(leftName),
        col(rightName).as("best_match"),
        col("lev").cast(LongType).as("lev"))
  }

  /** Candidate-pair counts of the two formulations on the same inputs —
    * the ScaleProbe measurement (banded pass + fallback vs full
    * Σ block²). */
  def candidateCounts(left: DataFrame, right: DataFrame,
                      leftId: String, leftName: String, rightName: String,
                      blockCol: String, band: Int = 4): (Long, Long, Long) = {
    val l = left.select(col(leftId).as("__lid"), col(leftName).as("__ln"),
      col(blockCol).as("__blk"))
    val r = right.select(col(rightName).as("__rn"), col(blockCol).as("__blk"))
      .withColumn("__rlen", length(col("__rn")))
    val bandedCands = l.withColumn("__rlen",
      explode(sequence(length(col("__ln")) - band,
        length(col("__ln")) + band)))
      .filter(col("__rlen") >= 1)
      .join(r, Seq("__blk", "__rlen"))
    val bandedN = bandedCands.count()
    val w = Window.partitionBy(col("__lid")).orderBy(col("lev"), col("__rn"))
    val resolved = bandedCands
      .withColumn("lev", levenshtein(col("__ln"), col("__rn")))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1 && col("lev") <= band)
    val unresolved = l.join(resolved.select(col("__lid")), Seq("__lid"),
      "left_anti")
    val fallbackN = unresolved.join(r, Seq("__blk")).count()
    val fullN = l.join(r, Seq("__blk")).count()
    (bandedN, fallbackN, fullN)
  }
}
