package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ChunksSpec extends SparkSuite {

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("stripBoilerplate removes cross-doc chunks per source, keeps unique bodies in order") {
    import spark.implicits._
    val hdr = words("boiler", 4) // one full 4-token chunk, shared
    val docs = Seq(
      (1L, "s1", s"$hdr ${words("a", 8)}"),  // hdr + 2 unique chunks
      (2L, "s1", s"$hdr ${words("b", 8)}"),
      (3L, "s1", s"$hdr ${words("c", 8)}"),
      (4L, "s1", hdr),                        // all boilerplate → empty
      (5L, "s2", s"$hdr ${words("d", 4)}"))   // other source: hdr appears ONCE → kept
      .toDF("doc_id", "source", "text")
    val got = Chunks.stripBoilerplate(docs, size = 4, minDocs = 3)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((words("a", 8), 1L)))
    assert(got(2L) == ((words("b", 8), 1L)))
    assert(got(3L) == ((words("c", 8), 1L)))
    assert(got(4L) == (("", 1L)))
    // s2 saw the header only once — below minDocs, untouched
    assert(got(5L) == ((s"$hdr ${words("d", 4)}", 0L)))
  }

  test("stripBoilerplate reassembles multi-chunk docs in original chunk order") {
    import spark.implicits._
    // 3 unique chunks (12 tokens, size 4) — nothing stripped, text intact
    val text = words("w", 12)
    val docs = Seq((1L, "s", text)).toDF("doc_id", "source", "text")
    val got = Chunks.stripBoilerplate(docs, size = 4, minDocs = 2)
      .select("clean_text").as[String].collect().head
    assert(got == text)
  }
}
