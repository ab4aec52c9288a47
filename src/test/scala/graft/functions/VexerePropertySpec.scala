package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSuite

/** ScalaCheck properties for the native UDF ports (SURVEY.md §5.2
  * item 1): invariants that must hold for ANY input, not just the
  * committed fixtures. Each property evaluates the Column expression
  * through a real (local) Spark projection; generation is seeded for
  * reproducibility. */
class VexerePropertySpec extends SparkSuite {

  private def evalOne(input: String, c: Column => Column): Option[Any] = {
    import spark.implicits._
    val r = Seq(input).toDF("x").select(c(col("x")).as("y")).head()
    if (r.isNullAt(0)) None else Some(r.get(0))
  }

  private def check(name: String, prop: Prop, n: Int = 40): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(n)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)),
      prop)
    assert(res.passed, s"$name: $res")
  }

  test("priceVnd: digits of the result are exactly the digits of the input") {
    val formats: Seq[Int => String] = Seq(
      (i: Int) => "%,d".format(i), (i: Int) => "%d".format(i),
      (i: Int) => "%,dđ".format(i), (i: Int) => s"VND $i")
    val priceGen: Gen[(Int, String)] = for {
      n <- Gen.chooseNum(0, 2000000)
      fmt <- Gen.oneOf(formats)
    } yield (n, fmt(n))
    check("priceVnd digits", Prop.forAll(priceGen) { (t: (Int, String)) =>
      evalOne(t._2, VexereFunctions.priceVnd).contains(t._1)
    })
  }

  test("priceVnd: strings with no digits map to null") {
    check("priceVnd no-digit", Prop.forAll(
      Gen.asciiPrintableStr.map(_.filterNot(_.isDigit))) { s =>
      evalOne(s, VexereFunctions.priceVnd).isEmpty
    })
  }

  test("durationHours: inverse of 'XhYm' formatting") {
    val hm = for {
      h <- Gen.chooseNum(0, 48)
      m <- Gen.chooseNum(0, 59)
    } yield (h, m)
    check("durationHours inverse", Prop.forAll(hm) { (t: (Int, Int)) =>
      val (h, m) = t
      val want = h + m / 60.0
      evalOne(s"${h}h${m}m", VexereFunctions.durationHours)
        .exists(v => math.abs(v.asInstanceOf[Double] - want) < 1e-9)
    })
  }

  test("standardizeVn: output stays in the allowed character class, collapsed") {
    val allowed = ("abcdefghijklmnopqrstuvwxyz0123456789 " +
      "àáảãạăằắẳẵặâầấẩẫậèéẻẽẹêềếểễệìíỉĩịòóỏõọôồốổỗộơờớởỡợ" +
      "ùúủũụưừứửữựỳýỷỹỵđ").toSet
    check("standardizeVn charclass", Prop.forAll(Gen.asciiPrintableStr) { s =>
      evalOne(s, VexereFunctions.standardizeVn).forall { v =>
        val out = v.asInstanceOf[String]
        out.forall(allowed.contains) && !out.contains("  ") && out == out.trim
      }
    })
  }
}
