package graft

import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}

/** Stage-level profiling harness for the hot queries — times the
  * sub-pipelines of an operator so optimization targets the stage that
  * actually costs, not the one that looks expensive.
  *
  * Usage: sbt 'runMain graft.Profile [sfDir]'
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(
      math.max(32, Runtime.getRuntime.availableProcessors()), "graft-profile")
    val docs = Tables(spark, dir, "documents")
    docs.count() // warm FS cache + codegen

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime
      val r = f
      println(f"[prof] $label%-34s ${(System.nanoTime - t0) / 1e9}%6.2f s")
      r
    }

    // ---- q31 set-similarity join stages ----
    val shingled = docs
      .select(col("doc_id").as("id"),
        graft.functions.TextFunctions.wordShingles(col("text"), 3).as("toks"))
      .filter(size(col("toks")) > 0)
    time("q31 shingle")(shingled.count())
    val tokens = shingled.select(col("id"), explode(col("toks")).as("tok"))
    time("q31 explode tokens")(tokens.count())
    time("q31 df agg")(
      tokens.groupBy(col("tok")).agg(count(lit(1)).as("df")).count())
    time("q31 full")(graft.operators.Dedup.ngramJaccardPairs(docs, 0.8).count())

    // ---- q32 minhash stages ----
    time("q32 signatures")(
      graft.operators.Dedup.minhashSignatures(docs, 128, 3, "text", "doc_id").count())
    time("q32 full")(graft.operators.Dedup.minhashNearDupPairs(docs, 0.8).count())

    // ---- q42 lsh topk ----
    val emb = Tables(spark, dir, "embeddings")
    emb.count()
    time("q42 full")(
      graft.operators.Similarity.lshTopK(
        emb.filter(col("vec_id") < 32), emb, k = 5, dim = 64).count())

    spark.stop()
  }
}
