package graft.operators

import java.nio.file.Files

import graft.SparkSuite

class SpanIndexSpec extends SparkSuite {

  private def tmpRoot(): String =
    Files.createTempDirectory("graft_span_idx").resolve("i").toString

  test("stripAgainst removes corpus-known spans only; append makes new spans known") {
    import spark.implicits._
    val root = tmpRoot()
    val corpus = Seq((1L, "x a b c d y")).toDF("doc_id", "text")
    SpanIndex.build(corpus, root, w = 4)
    val batch = Seq(
      (10L, "q a b c d r"), // "a b c d" is corpus-known → stripped
      (11L, "fresh new words only here"), // nothing known → untouched
      (12L, "tiny")) // shorter than w → untouched
      .toDF("doc_id", "text")
    val out = SpanIndex.stripAgainst(batch, root)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(10L -> "q r",
      11L -> "fresh new words only here", 12L -> "tiny"))
    // within-batch-only duplication is NOT this operator's job
    val twins = Seq((20L, "p q r s t u"), (21L, "p q r s t u"))
      .toDF("doc_id", "text")
    val untouched = SpanIndex.stripAgainst(twins, root)
      .collect().map(_.getString(1))
    assert(untouched.forall(_ == "p q r s t u"))
    // after appending the admitted batch, ITS spans are corpus-known
    assert(SpanIndex.append(batch, root) == 1L)
    val batch2 = Seq((30L, "zz q a b c d r ww")).toDF("doc_id", "text")
    val got2 = SpanIndex.stripAgainst(batch2, root)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // "q a b c d r" came in with doc 10 — every 4-window inside it is
    // now indexed, so the whole run is stripped
    assert(got2 == Map(30L -> "zz ww"))
  }
}
