package graft.scoring

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sentiment-scoring contract (SURVEY.md §2.9): the reference scores
  * reviews with a HuggingFace transformer OUTSIDE Spark
  * (sentiment_analysis.py) and hands the pipeline a
  * {Bus_Name, Comment, POS, NEG[, NEU]} JSON. Model inference stays out
  * of the engine; what the engine owns is the contract — a pluggable
  * scorer surfaced as a struct<POS,NEG,NEU> column — plus a
  * deterministic lexicon implementation for tests and pipelines without
  * a model server.
  */
trait SentimentScorer extends Serializable {
  /** Returns (POS, NEG, NEU), each in [0,1], 4-decimal rounded
    * (sentiment_analysis.py:76-82 contract). */
  def score(text: String): (Double, Double, Double)
}

/** Language routing contract (langdetect's role, sentiment_analysis
  * .py:10-14): vi reviews get the 3-way scorer, everything else 2-way. */
trait LanguageDetector extends Serializable {
  def detect(text: String): String
}

/** Deterministic heuristic: Vietnamese diacritics → "vi", else "en". */
object DiacriticLanguageDetector extends LanguageDetector {
  private val VietChars =
    "áàảãạăắằẳẵặâấầẩẫậéèẻẽẹêếềểễệíìỉĩịóòỏõọôốồổỗộơớờởỡợúùủũụưứừửữựýỳỷỹỵđ".toSet
  override def detect(text: String): String =
    if (text != null && text.toLowerCase.exists(VietChars.contains)) "vi" else "en"
}

/** Deterministic lexicon scorer: positive/negative token ratios with
  * the remainder as neutral mass. */
object LexiconSentimentScorer extends SentimentScorer {
  private val Positive = Set(
    "tốt", "tuyệt", "hài", "lòng", "sạch", "nhanh", "thân", "thiện", "êm",
    "good", "great", "excellent", "clean", "friendly", "comfortable", "nice")
  private val Negative = Set(
    "tệ", "bẩn", "chậm", "trễ", "xấu", "kém", "hỏng",
    "bad", "dirty", "late", "slow", "terrible", "broken", "rude")

  private def r4(x: Double): Double = math.round(x * 10000.0) / 10000.0

  override def score(text: String): (Double, Double, Double) = {
    if (text == null) return (0.0, 0.0, 1.0)
    // (?U): Unicode word chars — ASCII \W would split Vietnamese
    // diacritic letters out of their words
    val toks = text.toLowerCase.split("(?U)\\W+").filter(_.nonEmpty)
    if (toks.isEmpty) return (0.0, 0.0, 1.0)
    val pos = toks.count(Positive.contains).toDouble
    val neg = toks.count(Negative.contains).toDouble
    val n = toks.length.toDouble
    (r4(pos / n), r4(neg / n), r4((n - pos - neg) / n))
  }
}

object Sentiment {

  /** The scorer as a Spark UDF returning struct<POS,NEG,NEU> — the one
    * place a UDF is the right call: the scorer is an arbitrary external
    * model behind a trait, not something expressible in Columns. */
  def scoreUdf(scorer: SentimentScorer): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((text: String) => scorer.score(text))

  /** Score a review frame into the silver contract: adds POS/NEG/NEU
    * (vi 3-way) or POS/NEG (en 2-way) per the detected language —
    * reproducing the scored-JSON shape the reference's silver layer
    * consumes (FIXTURES.md A4). */
  def scoreReviews(reviews: DataFrame, commentCol: String,
                   scorer: SentimentScorer = LexiconSentimentScorer): DataFrame = {
    val s = scoreUdf(scorer)(col(commentCol))
    reviews
      .withColumn("POS", s.getField("_1"))
      .withColumn("NEG", s.getField("_2"))
      .withColumn("NEU", s.getField("_3"))
  }

  /** Language routing column. */
  def langOf(detector: LanguageDetector): Column => Column = {
    val u = udf((t: String) => detector.detect(t))
    c => u(c)
  }
}
