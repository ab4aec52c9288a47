package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Tables

class KmvSpec extends SparkSuite {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  private def shingles = {
    import graft.functions.TextFunctions.wordShingles
    Tables(spark, sf, "documents")
      .select(col("source"), explode(wordShingles(col("text"), 3)).as("sh"))
  }

  test("sketch: k smallest distinct hashes, layout-invariant, duplicates ignored") {
    val sh = shingles
    val sk = Kmv.sketch(sh, "source", md5(col("sh")), 64)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // reference: exact k smallest distinct md5 per source
    val want = sh.select(col("source"), md5(col("sh")).as("h")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (s, hs) =>
        s -> hs.map(_._2).distinct.sorted.take(64).toSeq }
    assert(sk == want)
    // layout invariance: different partitioning, same sketches
    val sk2 = Kmv.sketch(sh.repartition(17), "source", md5(col("sh")), 64)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(sk2 == sk)
    // duplicated input rows change nothing (sketch is a SET synopsis)
    val sk3 = Kmv.sketch(sh.unionAll(sh), "source", md5(col("sh")), 64)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(sk3 == sk)
  }

  test("estimates: distinct counts within KMV error; jaccard within additive bound") {
    val sh = shingles
    val k = 256
    val sk = Kmv.sketch(sh, "source", md5(col("sh")), k)
    val est = Kmv.pairStats(sk, "source", k).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(est.size == 190) // 20 sources choose 2
    val exactN = sh.distinct().groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // per-source estimate: SE ≈ 1/√(k−2) ≈ 6.3% at k=256; assert 3σ
    est.foreach { case ((a, b), (ea, eb, _, _, _)) =>
      assert(math.abs(ea - exactN(a)).toDouble / exactN(a) < 0.19, s"$a: $ea vs ${exactN(a)}")
      assert(math.abs(eb - exactN(b)).toDouble / exactN(b) < 0.19, s"$b: $eb vs ${exactN(b)}")
    }
    // pairwise: union estimate within 19%, jaccard within ±0.15 absolute
    val pairs = sh.distinct().select(col("source"), col("sh")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySrc = pairs.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
    est.foreach { case ((a, b), (_, _, eu, ei, jm)) =>
      val u = bySrc(a).union(bySrc(b)).size
      val i = bySrc(a).intersect(bySrc(b)).size
      assert(math.abs(eu - u).toDouble / u < 0.19, s"($a,$b) union: $eu vs $u")
      val jExact = i.toDouble / u
      assert(math.abs(jm / 1e6 - jExact) < 0.15, s"($a,$b) jaccard: $jm vs $jExact")
      assert(ei >= 0 && ei <= eu)
    }
  }
}
