package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class RocchioSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text"))

  private def judgeLabel = {
    def toks(c: String) = size(filter(split(col("text"), " "), t => t === c))
    toks("window") > toks("batch")
  }

  test("learns the content label the batch perceptron cannot") {
    val out = Rocchio.trainScore(docs, judgeLabel, buckets = 64, topK = 2)
      .collect()
    val acc = out.count(r => r.getLong(1) == r.getLong(3)).toDouble / out.length
    info(f"rocchio acc = $acc%.3f (${out.length} docs)")
    assert(acc >= 0.9)
    // the same label through the 2-round batch perceptron stays at a
    // one-class baseline — the oscillation RocchioSpec exists to pin
    val p = Perceptron.trainScore(docs, judgeLabel, buckets = 64, iters = 2)
      .collect()
    val pAcc = p.count(r => r.getLong(1) == r.getLong(3)).toDouble / p.length
    val oneClass = math.max(
      p.count(_.getLong(1) == 1L), p.count(_.getLong(1) == -1L))
      .toDouble / p.length
    info(f"batch perceptron acc = $pAcc%.3f vs one-class $oneClass%.3f")
    assert(acc > pAcc)
  }

  test("deterministic and partitioning-invariant") {
    def run(d: org.apache.spark.sql.DataFrame) =
      Rocchio.trainScore(d, judgeLabel).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    assert(run(docs) == run(docs.repartition(7)))
  }

  test("single-class labels are rejected") {
    val e = intercept[IllegalArgumentException] {
      Rocchio.trainScore(docs, lit(true))
    }
    assert(e.getMessage.contains("both label classes"))
  }
}
