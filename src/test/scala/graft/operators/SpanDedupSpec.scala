package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SpanDedupSpec extends SparkSuite {

  // A and B share the 4-token span "a b c d"; C is unrelated; D is
  // shorter than the window; E repeats the span TWICE (overlapping the
  // shared one at pos 2 and a disjoint one at pos 7).
  private def corpus = {
    import spark.implicits._
    Seq(
    (1L, "x a b c d y z w"),
    (2L, "q a b c d r s t"),
    (3L, "nothing shared here at all ok"),
    (4L, "tiny doc"),
    (5L, "k a b c d u a b c d")
    ).toDF("doc_id", "text")
  }

  test("duplicatedSpans finds exactly the cross-doc spans") {
    val dups = SpanDedup.duplicatedSpans(corpus, w = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // "a b c d" appears in docs 1, 2, 5 (twice in 5) = 3 docs / 4 occ
    val h = dups.find(_._2 == 3L)
    assert(h.isDefined && h.get._3 == 4L)
    // every reported span really is in >= 2 docs
    assert(dups.forall(_._2 >= 2L))
  }

  test("coverage interval-merges overlapping occurrences per doc") {
    val cov = SpanDedup.duplicationCoverage(corpus, w = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // doc 1: span at pos 2..5 of 8 tokens -> 4/8
    assert(cov(1L) == ((8L, 4L, 0.5)))
    // doc 5: occurrences at pos 2..5 and 7..10 of 10 -> 8/10, two
    // islands, no double count
    assert(cov(5L) == ((10L, 8L, 0.8)))
    // docs 3 and 4 have no duplicated spans at all
    assert(!cov.contains(3L) && !cov.contains(4L))
  }

  test("strip keeps the first (id,pos) occurrence, drops the rest, round-trips untouched docs") {
    val out = SpanDedup.stripDuplicatedSpans(corpus, w = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 5) // every doc survives, even unaffected ones
    assert(out(1L) == "x a b c d y z w") // first occurrence: kept whole
    assert(out(2L) == "q r s t") // span removed, surroundings intact
    assert(out(3L) == "nothing shared here at all ok")
    assert(out(4L) == "tiny doc") // shorter than w: untouched
    assert(out(5L) == "k u") // both non-first occurrences removed
  }

  test("w larger than every doc yields no dups and full round-trip") {
    assert(SpanDedup.duplicatedSpans(corpus, w = 50).count() == 0)
    val out = SpanDedup.stripDuplicatedSpans(corpus, w = 50)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val orig = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == orig)
  }

  test("hash64 scale path finds the same duplicated span multiset") {
    val a = SpanDedup.duplicatedSpans(corpus, w = 4)
      .select("n_docs", "n_occ").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = SpanDedup.duplicatedSpans(corpus, w = 4, hash64 = true)
      .select("n_docs", "n_occ").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }
}
