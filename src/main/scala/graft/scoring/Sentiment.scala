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

  /** Score a whole batch in one call — the shape a transformer model
    * wants (the reference feeds the tokenizer batches of 16,
    * sentiment_analysis.py:61-84, because per-row inference wastes the
    * accelerator). Default: per-row delegation, so pure-function
    * scorers need only implement `score`; a model-backed impl overrides
    * this with one padded forward pass per batch. */
  def scoreBatch(texts: Seq[String]): Seq[(Double, Double, Double)] =
    texts.map(score)
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
  * the remainder as neutral mass. Lexicons are constructor parameters
  * so a pipeline can score any domain's vocabulary through the same
  * contract. */
class LexiconScorer(positive: Set[String], negative: Set[String])
    extends SentimentScorer {

  private def r4(x: Double): Double = math.round(x * 10000.0) / 10000.0

  override def score(text: String): (Double, Double, Double) = {
    if (text == null) return (0.0, 0.0, 1.0)
    // (?U): Unicode word chars — ASCII \W would split Vietnamese
    // diacritic letters out of their words
    val toks = text.toLowerCase.split("(?U)\\W+").filter(_.nonEmpty)
    if (toks.isEmpty) return (0.0, 0.0, 1.0)
    val pos = toks.count(positive.contains).toDouble
    val neg = toks.count(negative.contains).toDouble
    val n = toks.length.toDouble
    (r4(pos / n), r4(neg / n), r4((n - pos - neg) / n))
  }
}

/** Default review-domain lexicon (Vietnamese + English). */
object LexiconSentimentScorer extends LexiconScorer(
  Set("tốt", "tuyệt", "hài", "lòng", "sạch", "nhanh", "thân", "thiện", "êm",
    "good", "great", "excellent", "clean", "friendly", "comfortable", "nice"),
  Set("tệ", "bẩn", "chậm", "trễ", "xấu", "kém", "hỏng",
    "bad", "dirty", "late", "slow", "terrible", "broken", "rude"))

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

  /** Batched inference through the scorer trait — the Spark-side shape
    * the reference's transformer scoring needs (sentiment_analysis
    * .py:61-84 feeds the model 16 comments per forward pass): one
    * mapPartitions, each partition's rows grouped into `batchSize`
    * batches, ONE `scoreBatch` call per batch. Executors each hold their
    * own scorer (broadcast via closure — a model impl lazily loads its
    * weights once per executor), no per-row model dispatch, no data
    * movement: scoring is a map-local projection, embarrassingly
    * parallel over partitions at any corpus size. */
  def scoreReviewsBatched(reviews: DataFrame, commentCol: String,
                          scorer: SentimentScorer = LexiconSentimentScorer,
                          batchSize: Int = 16): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StructType}
    val outSchema = StructType(reviews.schema
      .add("POS", DoubleType).add("NEG", DoubleType).add("NEU", DoubleType))
    val idx = reviews.schema.fieldIndex(commentCol)
    reviews.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val scores = scorer.scoreBatch(
          batch.map(r => if (r.isNullAt(idx)) null else r.getString(idx)))
        batch.lazyZip(scores).map { case (r, (p, n, u)) =>
          Row.fromSeq(r.toSeq ++ Seq(p, n, u))
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
