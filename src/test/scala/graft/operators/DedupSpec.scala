package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class DedupSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("exact dedup keeps min id per distinct text") {
    import spark.implicits._
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(df).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 3L), (2L, 1L)))
  }

  test("minhash LSH finds exactly the exact-jaccard pair set (recall check)") {
    val exact = Dedup.ngramJaccardPairs(docs, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashNearDupPairs(docs, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "testdata should contain planted near-dups")
    assert(lsh == exact)
  }

  test("incremental A-vs-B join equals the cross-split slice of the self-join") {
    val exactAll = Dedup.ngramJaccardPairs(docs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // split by parity; expected = self-join pairs straddling the split,
    // oriented (even, odd)
    val expected = exactAll.collect {
      case (a, b) if a % 2 == 0 && b % 2 != 0 => (a, b)
      case (a, b) if a % 2 != 0 && b % 2 == 0 => (b, a)
    }
    val got = Dedup.ngramJaccardJoin(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 =!= 0), 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "fixture should contain cross-split near-dups")
    assert(got == expected)
  }

  test("simhash: identical docs at distance 0; near-dups are close") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark table scan merge join filter"),
      (2L, "spark table scan merge join filter"),
      (3L, "completely different words entirely here now"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDupPairs(df, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0)))
  }

  test("simhash near-dup pairs cover the planted high-jaccard pairs") {
    val planted = Dedup.ngramJaccardPairs(docs, 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhashNearDupPairs(docs, maxDist = 6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.nonEmpty)
    assert(planted.subsetOf(sim),
      s"missing: ${planted.diff(sim)}")
  }

  test("df-cut drops hot shingles but keeps true near-dup pairs") {
    val withCut = Dedup.ngramJaccardPairs(docs, 0.8, maxShingleFreq = Some(50))
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val noCut = Dedup.ngramJaccardPairs(docs, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // near-dup docs share mostly rare shingles; a mild df-cut must not
    // change the verified pair set on this corpus
    assert(withCut == noCut)
  }

  test("connected components: chain, triangle, singleton") {
    import spark.implicits._
    // 1-2-3 chain (diameter 2), 5-6-7 triangle, 9 isolated
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L), (5L, 7L))
      .toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 5L, 6L, 7L, 9L).toDF("id")
    val got = Dedup.connectedComponents(pairs, nodes).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 9L -> 9L))
  }

  test("connected components converge on a deep path graph") {
    import spark.implicits._
    // path 0-1-2-...-12: worst-case diameter for min-label propagation
    val pairs = (0L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val nodes = (0L to 12L).toDF("id")
    val got = Dedup.connectedComponents(pairs, nodes).collect()
      .map(r => r.getLong(1)).toSet
    assert(got == Set(0L))
  }

  test("star connected components agree with min-label on mixed graphs") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L), (5L, 7L),
      (20L, 11L), (11L, 15L))
      .toDF("id_a", "id_b")
    val nodes = (Seq(1L, 2L, 3L, 5L, 6L, 7L, 9L, 11L, 15L, 20L)).toDF("id")
    val star = Dedup.connectedComponentsStar(pairs, nodes).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val label = Dedup.connectedComponents(pairs, nodes).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == label)
    assert(star(9L) == 9L) // singleton maps to itself
  }

  test("star and min-label agree with a driver union-find on random graphs") {
    import spark.implicits._
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val n = 30
      val edgeList = Seq.fill(35)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // ground truth: driver union-find attaching larger roots under
      // smaller, so every root IS its component minimum
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edgeList.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      val pairs = edgeList.toDF("id_a", "id_b")
      val nodes = (0L until n.toLong).toDF("id")
      val star = Dedup.connectedComponentsStar(pairs, nodes).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val label = Dedup.connectedComponents(pairs, nodes).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star == expected, s"star vs union-find, seed $seed")
      assert(label == expected, s"min-label vs union-find, seed $seed")
    }
  }

  test("star components: 1000-link chain converges in O(log n) rounds") {
    import spark.implicits._
    // adversarially deep: diameter 1000 — min-label propagation would
    // need 1000 rounds; the star alternation contracts multiplicatively
    val pairs = (0L until 1000L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val nodes = (0L to 1000L).toDF("id")
    val (out, rounds) =
      Dedup.connectedComponentsStarWithRounds(pairs, nodes, maxIter = 30)
    assert(out.select("component").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(0L))
    assert(out.count() == 1001)
    assert(rounds <= 20, s"took $rounds rounds — not O(log n)")
  }

  test("containmentPairs: directional, catches sub-document inclusion") {
    import spark.implicits._
    val quote = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, quote), // short doc...
      (2L, s"intro words here $quote closing words trail off now"), // ...quoted whole
      (3L, "completely different content with no overlap at all ok")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, thresholdPpm = 900000L)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("containment_ppm"))).toSet
    // all of doc1's 4 shingles appear in doc2 → containment(1→2)=1.0;
    // reverse direction is well below 0.9; doc3 pairs with nobody
    assert(got == Set((1L, 2L, 1000000L)))
  }

  test("containmentPairs: df cap only lowers containment, never invents") {
    import spark.implicits._
    val docs = (1L to 6L).map(i =>
      (i, s"shared common boiler plate text everywhere unique$i tail$i end$i"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.containmentPairs(docs, 0L)
      .collect().map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Long]("containment_ppm"))).toMap
    val capped = Dedup.containmentPairs(docs, 0L, dfCap = 3L)
      .collect().map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Long]("containment_ppm"))).toMap
    assert(capped.keySet.subsetOf(uncapped.keySet))
    capped.foreach { case (k, v) => assert(v <= uncapped(k), s"$k") }
  }
}
