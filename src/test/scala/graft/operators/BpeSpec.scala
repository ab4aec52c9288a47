package graft.operators

import graft.SparkSuite

/** Hand-computed BPE training goldens (the GraphsSpec pattern: tiny
  * input, every intermediate derivable on paper). */
class BpeSpec extends SparkSuite {

  import Bpe.MergeRule

  test("train: hand-computed merges on a 2-word vocabulary") {
    import spark.implicits._
    // vocab: "aaab"×2, "ab"×1
    // iter 1 pairs: (a,a) = 2 per "aaab" × wc 2 = 4; (a,b) = 1×2 + 1 = 3
    //   → merge (a,a), cnt 4;  "aaab" → [aa, a, b] (leftmost: rn1 taken,
    //     rn2 consumed; rn2's own match overlapped and is skipped)
    // iter 2 pairs: (aa,a) = 2; (a,b) = 2 + 1 = 3 → merge (a,b), cnt 3
    //   "aaab" → [aa, ab]; "ab" → [ab]
    // iter 3 pairs: (aa,ab) = 2 → merge (aa,ab), cnt 2
    val vocab = Seq(("aaab", 2L), ("ab", 1L)).toDF("word", "wc")
    val rules = Bpe.train(vocab, 3)
    assert(rules == Seq(
      MergeRule(1, "a", "a", 4L),
      MergeRule(2, "a", "b", 3L),
      MergeRule(3, "aa", "ab", 2L)))
  }

  test("applyMerge: leftmost non-overlapping parity on an identical-pair run") {
    import spark.implicits._
    // "aaaaa" under (a,a): matches at rn 1..4, run offsets 0..3 →
    // taken at 1 and 3 (even offsets), consumed 2 and 4 → [aa, aa, a]
    val syms = Bpe.initialSymbols(Seq(("aaaaa", 1L)).toDF("word", "wc"))
    val merged = Bpe.applyMerge(syms, "a", "a")
      .orderBy("rn").as[(String, Long, Long, String)].collect()
    assert(merged.map(_._4).toSeq == Seq("aa", "aa", "a"))
    assert(merged.map(_._3).toSeq == Seq(1L, 2L, 3L))
    // and the merged symbols pair-count correctly for the next round
    val next = Bpe.pairCounts(Bpe.applyMerge(syms, "a", "a"))
      .orderBy("a", "b").as[(String, String, Long)].collect().toSeq
    assert(next == Seq(("aa", "a", 1L), ("aa", "aa", 1L)))
  }

  test("encode applies the trained rules in order") {
    import spark.implicits._
    val vocab = Seq(("aaab", 2L), ("ab", 1L)).toDF("word", "wc")
    val rules = Bpe.train(vocab, 3)
    // after (a,a), (a,b), (aa,ab): "aaab" → [aa, ab] → [aaab]; "ab" → [ab]
    val segs = Bpe.encode(vocab, rules)
      .groupBy("sym").agg(org.apache.spark.sql.functions.sum("wc").as("t"))
      .as[(String, Long)].collect().toMap
    assert(segs == Map("aaab" -> 2L, "ab" -> 1L))
  }

  test("train is partitioning-invariant and encode reassembles every word") {
    import spark.implicits._
    val words = Seq("banana" -> 3L, "bandana" -> 2L, "ananas" -> 4L,
      "cabana" -> 1L, "nab" -> 5L)
    val vocab = words.toDF("word", "wc")
    val rules = Bpe.train(vocab, 3)
    // deterministic regardless of physical layout (exact integer
    // counts + total tie-break order)
    assert(Bpe.train(vocab.repartition(7), 3) == rules)
    // segmentation losslessness: concatenating each word's symbols in
    // rn order reproduces the word, for every trained prefix of rules
    (0 to 3).foreach { k =>
      val segs = Bpe.encode(vocab, rules.take(k))
        .groupBy("w")
        .agg(org.apache.spark.sql.functions.concat_ws("",
          org.apache.spark.sql.functions.array_sort(
            org.apache.spark.sql.functions.collect_list(
              org.apache.spark.sql.functions.struct("rn", "sym")))
            .getField("sym")).as("joined"))
        .as[(String, String)].collect().toMap
      words.foreach { case (w, _) => assert(segs(w) == w, s"k=$k word=$w") }
    }
  }

  test("train stops early when no adjacent pairs remain") {
    import spark.implicits._
    val vocab = Seq(("ab", 3L)).toDF("word", "wc")
    // iter 1 merges (a,b) → every word is a single symbol; iter 2 finds
    // no pairs and training stops
    val rules = Bpe.train(vocab, 5)
    assert(rules == Seq(MergeRule(1, "a", "b", 3L)))
  }
}
