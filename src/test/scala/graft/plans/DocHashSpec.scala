package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.TextFunctions.LangProfiles
import graft.operators.Dedup

/** The map-local DocHashExpressions must reproduce the round-1
  * explode+aggregate formulations bit-for-bit — these are regression
  * oracles, not semantic tests. */
class DocHashSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("expression token hash matches the xxhash64 builtin") {
    // single-token frame: simhash of one token t has bit b set iff
    // xxhash64(t) bit b is 1 (one +1 vote per set bit, -1 per clear)
    import spark.implicits._
    val toks = Seq("spark", "täble", "合并", "x").toDF("text")
    val got = toks.select(col("text"),
      DocHashExpressions.simhash64(col("text")).as("sh"),
      xxhash64(col("text")).as("xx")).collect()
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"single-token simhash must BE the token's xxhash64 (${r.getString(0)})")
    }
  }

  test("SimHash64 equals the explode + 64-sum formulation") {
    val viaExpr = Dedup.simhashes(docs).orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val toks = docs
      .select(col("doc_id").as("id"),
        explode(split(trim(col("text")), "\\s+")).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val aggs = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"b$b")
    }
    val viaAgg = toks.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
      .select(col("id"),
        (0 until 64).map(b =>
          when(col(s"b$b") >= 0, lit(1L << b)).otherwise(0L)).reduce(_ + _).as("sh"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaExpr.nonEmpty && viaExpr.sameElements(viaAgg))
  }

  test("MinHashSig equals the explode + MinHashAgg formulation") {
    val viaExpr = Dedup.minhashSignatures(docs, 128, 3, "text", "doc_id")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val viaAgg = Dedup.minhashSignaturesAgg(docs, 128, 3, "text", "doc_id")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(viaExpr.nonEmpty && viaExpr.sameElements(viaAgg))
  }

  test("DictHitsMulti equals the explode + conditional-sum scoring") {
    val hits = DocHashExpressions
      .dictHits(lower(trim(col("text"))), LangProfiles.map(_._2))
    val viaExpr = docs.select(col("doc_id"), hits.as("hits"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val toks = docs.select(col("doc_id"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
    val aggs = LangProfiles.map { case (lang, words) =>
      sum(when(col("t").isInCollection(words), 1L).otherwise(0L)).as(s"s_$lang")
    }
    val viaAgg = toks.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array(LangProfiles.map { case (l, _) => col(s"s_$l") }: _*).as("hits"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(viaExpr.nonEmpty && viaExpr.sameElements(viaAgg))
  }

  test("WordNgramsAll matches the higher-order-function formulation") {
    import graft.functions.TextFunctions.wordShinglesAll
    val viaExpr = docs.select(col("doc_id"),
      wordShinglesAll(col("text"), 2).as("b"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    val w = split(trim(col("text")), "\\s+")
    val viaHof = docs.select(col("doc_id"),
      when(size(w) >= 2,
        transform(sequence(lit(1), size(w) - 1),
          i => concat(element_at(w, i), lit(" "), element_at(w, i + 1))))
        .otherwise(array().cast("array<string>")).as("b"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    assert(viaExpr.nonEmpty && viaExpr.sameElements(viaHof))
    // multiplicity preserved (this is the LM-counts variant, not the set)
    assert(viaExpr.exists { case (_, b) => b.size != b.distinct.size })
  }
}
