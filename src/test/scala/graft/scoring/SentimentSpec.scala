package graft.scoring

import graft.SparkSuite
import graft.silver.Silver

class SentimentSpec extends SparkSuite {

  test("lexicon scorer: deterministic ratios, 4dp, null-safe") {
    assert(LexiconSentimentScorer.score("xe tốt sạch sẽ") == (0.5, 0.0, 0.5))
    assert(LexiconSentimentScorer.score("bad dirty bus") == (0.0, 0.6667, 0.3333))
    assert(LexiconSentimentScorer.score(null) == (0.0, 0.0, 1.0))
    assert(LexiconSentimentScorer.score("...") == (0.0, 0.0, 1.0))
  }

  test("language routing: diacritics → vi, else en") {
    assert(DiacriticLanguageDetector.detect("xe rất tốt") == "vi")
    assert(DiacriticLanguageDetector.detect("the bus was great") == "en")
    assert(DiacriticLanguageDetector.detect(null) == "en")
  }

  test("scoreReviews produces the silver A4 contract and feeds Silver.review") {
    import spark.implicits._
    val raw = Seq(
      ("Phương Trang", "Nguyễn A", 5L, "xe tốt", "01/06/2025"),
      ("Thành Bưởi", "Trần B", 1L, "bad dirty", "02/06/2025"))
      .toDF("Bus_Name", "Customer_Name", "Stars", "Comment", "Date")
    val scored = Sentiment.scoreReviews(raw, "Comment")
    assert(scored.columns.takeRight(3).toSeq == Seq("POS", "NEG", "NEU"))
    val busIds = Seq(("Phương Trang", "B01"), ("Thành Bưởi", "B02"))
      .toDF("Bus_Name", "Bus_Id")
    val silver = Silver.review(
      scored.select("Bus_Name", "Comment", "POS", "NEG", "NEU"), busIds, maxId = 0)
    val rows = silver.orderBy("Review_Key").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(rows(0).getAs[Double]("POS") == 0.5)
    assert(rows(1).getAs[Double]("NEG") == 1.0)
  }

  test("batched scoring equals per-row scoring, rows stay aligned") {
    import spark.implicits._
    val raw = (1 to 100)
      .map(i => (i.toLong, if (i % 3 == 0) s"good trip $i" else s"bad seat $i"))
      .toDF("id", "Comment")
      .repartition(7) // uneven partitions → ragged trailing batches
    val batched = Sentiment.scoreReviewsBatched(raw, "Comment")
      .select("id", "POS", "NEG", "NEU").orderBy("id").collect()
    val perRow = Sentiment.scoreReviews(raw, "Comment")
      .select("id", "POS", "NEG", "NEU").orderBy("id").collect()
    assert(batched.toSeq == perRow.toSeq)
  }

  test("scorer receives batches of at most batchSize texts") {
    import spark.implicits._
    // probe scorer: leaks the observed batch size through POS
    object BatchProbe extends SentimentScorer {
      override def score(text: String) = (0.0, 0.0, 1.0)
      override def scoreBatch(texts: Seq[String]) =
        texts.map(_ => (texts.size.toDouble, 0.0, 0.0))
    }
    val raw = (1 to 100).map(i => (i.toLong, s"c$i")).toDF("id", "Comment")
      .repartition(2)
    val sizes = Sentiment.scoreReviewsBatched(raw, "Comment", BatchProbe, 16)
      .select("POS").collect().map(_.getDouble(0))
    assert(sizes.max <= 16.0)
    // 100 rows over 2 partitions → full batches dominate
    assert(sizes.count(_ == 16.0) >= 80)
  }
}
