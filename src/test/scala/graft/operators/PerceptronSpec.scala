package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class PerceptronSpec extends SparkSuite {

  import scala.jdk.CollectionConverters._
  private def docsOf(rows: Seq[(Long, String)]) = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2)).asJava, schema)
  }

  test("separable vocab: the learned scorer fits the labels") {
    // positive docs speak one vocabulary, negative docs another — a
    // linear scorer over hashed unigrams must separate them
    val docs = docsOf(
      (0L until 20L).map(i =>
        i -> (if (i % 2 == 0) "alpha beta gamma alpha" else "zork quux blarg zork")))
    val out = Perceptron.trainScore(docs,
      label = col("doc_id") % 2 === 0, buckets = 64, iters = 3)
      .collect()
    assert(out.length == 20)
    out.foreach(r => assert(r.getLong(3) == r.getLong(1),
      s"doc ${r.getLong(0)} predicted ${r.getLong(3)} label ${r.getLong(1)}"))
  }

  test("training is deterministic and partitioning-invariant") {
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Perceptron.trainScore(d, label = length(col("text")) >= 300,
        buckets = 64, iters = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    val a = run(docs)
    val b = run(docs.repartition(7))
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("a doc with margin exactly zero predicts -1 (conservative keep-out)") {
    // one doc, one round: w1 = y*x with y=-1 → margin = -Σx² < 0; use
    // two docs with identical text and opposite labels so updates
    // cancel and margins are exactly zero
    val docs = docsOf(Seq(1L -> "same words here", 2L -> "same words here"))
    val out = Perceptron.trainScore(docs, label = col("doc_id") === 1L,
      buckets = 16, iters = 1).collect()
    assert(out.forall(r => r.getLong(2) == 0L && r.getLong(3) == -1L))
  }
}
