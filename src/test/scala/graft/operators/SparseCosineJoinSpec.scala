package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** SparseCosineJoin: equivalence to a driver-side brute-force tf·idf
  * cosine, df-cap semantics, and the weighted-vs-Jaccard contrast. */
class SparseCosineJoinSpec extends SparkSuite {

  private val corpus = Seq(
    (1L, "rare gem common common common"),
    (2L, "rare gem common common"),
    (3L, "common common common common"),
    (4L, "other words common entirely"),
    (5L, "rare gem"))

  /** Driver-side reference: same integer weights, brute all-pairs. */
  private def brute(docs: Seq[(Long, String)], dfCap: Long)
      : Map[(Long, Long), Double] = {
    val n = docs.size
    val tf = docs.map { case (id, t) =>
      id -> t.split(" ").groupBy(identity).map { case (w, a) => w -> a.length.toLong }
    }.toMap
    val df = docs.flatMap(_._2.split(" ").distinct).groupBy(identity)
      .map { case (w, a) => w -> a.length.toLong }
    val w = tf.map { case (id, m) =>
      id -> m.collect {
        case (tok, f) if df(tok) <= dfCap => tok -> f * (n / df(tok))
      }
    }
    def norm2(id: Long) = w(id).values.map(x => x * x).sum
    (for {
      (a, _) <- docs; (b, _) <- docs if a < b
      dot = w(a).keySet.intersect(w(b).keySet).toSeq
        .map(t => w(a)(t) * w(b)(t)).sum
      if dot > 0
    } yield (a, b) ->
      dot.toDouble / (math.sqrt(norm2(a).toDouble) * math.sqrt(norm2(b).toDouble))
    ).toMap
  }

  test("pairs ≡ brute-force tf·idf cosine (no cap, threshold 0)") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val got = SparseCosineJoin.pairs(docs, "doc_id", "text",
        dfCap = 100L, minCos = 0.0)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("cos")).toMap
    val want = brute(corpus, 100L)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, c) =>
      assert(math.abs(c - want(k)) < 1e-12, s"$k: $c vs ${want(k)}") }
  }

  test("df cap drops common-vocabulary-only pairs, keeps rare ones") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    // cap 3: "common" (df=4) is out; only rare/gem/other/words/entirely
    val got = SparseCosineJoin.pairs(docs, "doc_id", "text",
        dfCap = 3L, minCos = 0.0)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // docs {1,2,5} share rare+gem → 3 pairs; docs 3 and 4 have no
    // capped token in common with anyone
    assert(got == Set((1L, 2L), (1L, 5L), (2L, 5L)))
    val gotCos = SparseCosineJoin.pairs(docs, "doc_id", "text",
        dfCap = 3L, minCos = 0.0)
      .collect().map(r => r.getAs[Double]("cos"))
    assert(gotCos.forall(c => math.abs(c - 1.0) < 1e-12),
      "identical capped-token profiles → cosine exactly 1")
  }

  test("weighting catches what Jaccard under-scores") {
    import spark.implicits._
    // docs 1/2 share ONE rare token among common filler (set-Jaccard
    // 1/11 ≈ 0.09); ten filler-only docs make the filler cheap. The
    // idf-weighted cosine ranks (1,2) far above (1, any filler doc).
    val filler = "aa bb cc dd ee ff gg hh ii jj"
    val docs = (Seq(
      (1L, s"needle aa bb cc dd ee"),
      (2L, s"needle ff gg hh ii jj")) ++
      (3L to 12L).map(i => (i, filler))).toDF("doc_id", "text")
    val cos = SparseCosineJoin.pairs(docs, "doc_id", "text",
        dfCap = 100L, minCos = 0.0)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("cos")).toMap
    // w(needle) = tf·(12 div 2) = 6; w(filler) = tf·1 = 1
    // cos(1,2) = 36/41 ≈ 0.878; cos(1,3) = 5/(√41·√10) ≈ 0.247
    assert(cos((1L, 2L)) > 0.85)
    assert(cos((1L, 3L)) < 0.3)
  }
}
