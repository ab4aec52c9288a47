package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSuite

/** ScalaCheck properties for URL canonicalization: for ANY URL built
  * from components, (1) canonicalization is idempotent and (2) every
  * perturbation the function claims to remove — scheme/host case,
  * leading www. labels, the scheme's default port, tracking params
  * inserted anywhere in the query, fragments, trailing slashes — maps
  * to the same canonical form as the clean URL. These are the
  * properties URL-keyed dedup (q153) actually relies on: equal logical
  * URLs MUST collide. */
class UrlPropertySpec extends SparkSuite {

  private def canon(u: String): String = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    Seq(u).toDF("u")
      .select(TextFunctions.canonicalizeUrl(col("u"))).as[String].head()
  }

  private def check(name: String, prop: Prop, n: Int = 40): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(n)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)),
      prop)
    assert(res.passed, s"$name: $res")
  }

  private case class Core(scheme: String, host: String, port: String,
                          path: String, real: List[String]) {
    def url: String = {
      val q = if (real.isEmpty) "" else "?" + real.mkString("&")
      s"$scheme://$host$port$path$q"
    }
  }

  private val coreGen: Gen[Core] = for {
    scheme <- Gen.oneOf("http", "https")
    host <- Gen.oneOf("example.com", "news.site.org", "a-b.io")
    port <- Gen.oneOf("", ":8080")
    path <- Gen.oneOf("", "/a", "/A/b")
    real <- Gen.oneOf(List.empty[String], List("id=3"), List("page=2", "id=3"))
  } yield Core(scheme, host, port, path, real)

  private val noisyGen: Gen[(String, String)] = for {
    c <- coreGen
    upScheme <- Gen.oneOf(false, true)
    upHost <- Gen.oneOf(false, true)
    www <- Gen.oneOf("", "www.", "WWW.", "www.www.")
    defPort <- Gen.oneOf(false, true)
    trk <- Gen.someOf(List("utm_source=x", "utm_campaign=c1", "gclid=9",
      "fbclid=f", "ref=home"))
    pos <- Gen.chooseNum(0, c.real.length)
    slash <- Gen.oneOf(false, true)
    frag <- Gen.oneOf("", "#sec", "#a#b")
  } yield {
    val scheme = if (upScheme) c.scheme.toUpperCase else c.scheme
    val host = www + (if (upHost) c.host.toUpperCase else c.host)
    val port =
      if (c.port.nonEmpty) c.port
      else if (defPort) (if (c.scheme == "http") ":80" else ":443")
      else ""
    val path = c.path + (if (slash) "/" else "")
    val params = {
      val (before, after) = c.real.splitAt(pos)
      before ++ trk.toList ++ after
    }
    val q = if (params.isEmpty) "" else "?" + params.mkString("&")
    (s"$scheme://$host$port$path$q$frag", c.url)
  }

  test("canonicalizeUrl is idempotent for any component-built URL") {
    check("idempotence", Prop.forAll(noisyGen) { (t: (String, String)) =>
      val once = canon(t._1)
      canon(once) == once
    })
  }

  test("every removable perturbation maps to the clean URL's canonical form") {
    check("perturbation invariance", Prop.forAll(noisyGen) {
      (t: (String, String)) => canon(t._1) == canon(t._2)
    })
  }
}
