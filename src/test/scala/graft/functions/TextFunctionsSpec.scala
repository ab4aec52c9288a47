package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSuite {

  test("tokenCount edge cases") {
    import spark.implicits._
    val got = Seq("", "   ", "a", "a b", "  a  b  c  ")
      .toDF("t").select(tokenCount(col("t"))).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 0L, 1L, 2L, 3L))
  }

  test("subwordTokenCount splits letter runs, digits, marks") {
    import spark.implicits._
    val got = Seq("hello world", "a1b2", "x.y,z", "")
      .toDF("t").select(subwordTokenCount(col("t"))).collect().map(_.getLong(0)).toSeq
    // "a1b2" → a,1,b,2 ; "x.y,z" → x,.,y,,,z
    assert(got == Seq(2L, 4L, 5L, 0L))
  }

  test("langId picks the dominant stopword profile, und when none") {
    import spark.implicits._
    val cases = Seq(
      "the cat and the dog is in the house" -> "en",
      "der hund und die katze ist nicht da" -> "de",
      "el perro y la casa de que un es" -> "es",
      "le chien est une de la que" -> "fr",
      "的 是 了 在 我" -> "zh",
      "zzz qqq www" -> "und")
    val got = cases.map(_._1).toDF("t").select(langId(col("t"))).collect()
      .map(_.getString(0)).toSeq
    assert(got == cases.map(_._2))
  }

  test("wordShingles produces distinct n-grams, empty below n words") {
    import spark.implicits._
    val got = Seq("a b c d", "a b", "x y z x y z")
      .toDF("t").select(wordShingles(col("t"), 3)).collect()
      .map(_.getSeq[String](0).toSet)
    assert(got(0) == Set("a b c", "b c d"))
    assert(got(1) == Set.empty)
    assert(got(2) == Set("x y z", "y z x", "z x y")) // distinct
  }

  test("qualityScore stays in [0,1] and ranks clean text above noise") {
    import spark.implicits._
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and runs to the house in the field",
      "!!!??? ### $$$ %%% ^^^ &&&",
      "").toDF("t").select(qualityScore(col("t")).as("q"))
    val scores = df.collect().map(_.getDouble(0))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(0) > scores(1))
  }

  test("canonicalizeUrl: every rule, hand-computed") {
    import spark.implicits._
    val cases = Seq(
      // lowercase scheme+authority, www strip, default https port,
      // tracking strip (first + interleaved), fragment strip
      ("HTTPS://WWW.News.Example.COM:443/Articles/3?utm_source=f&page=1&utm_campaign=c2#sec",
        "https://news.example.com/Articles/3?page=1"),
      // http default port, lone tracking query collapses away,
      // path trailing slash before the query
      ("http://Example.COM:80/a/?utm_medium=x#f", "http://example.com/a"),
      // non-default port kept; path case preserved; real params kept
      ("https://Example.com:8443/A/B?id=2&ref=home", "https://example.com:8443/A/B?id=2"),
      // bare trailing slash; no query
      ("HTTP://WWW.a.com/", "http://a.com"),
      // non-URL input: authority-less pass-through, never throws
      ("not a url", "not a url"))
    val got = cases.map(_._1).toDF("u")
      .select(canonicalizeUrl(col("u"))).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }
}
