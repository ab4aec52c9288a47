package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-grams ("shingles") of a whitespace-tokenized string —
  * the unit set for Jaccard/MinHash dedup.
  *
  * Semantics (must stay aligned with the DuckDB oracle in
  * DedupQueries): trim → split on `\s+` → consecutive n-word windows
  * joined by a single space → distinct; fewer than n tokens → empty
  * array.
  *
  * This replaces an `array_distinct(transform(sequence(...), ...))`
  * composition: higher-order functions evaluate interpreted, re-running
  * a small expression tree per element (~20 s for 5 000 docs at sf0.1);
  * this flat Scala loop does the same work in milliseconds.
  * CodegenFallback is fine here — the surrounding projection still
  * codegens and calls eval() once per row. */
case class WordNgrams(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(text: Any, nAny: Any): Any = {
    val n = nAny.asInstanceOf[Int]
    val toks = text.asInstanceOf[UTF8String].toString.trim.split("\\s+")
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = mutable.LinkedHashSet.empty[String]
      var i = 0
      while (i <= toks.length - n) {
        val sb = new StringBuilder(toks(i))
        var k = 1
        while (k < n) { sb.append(' ').append(toks(i + k)); k += 1 }
        seen += sb.result()
        i += 1
      }
      new GenericArrayData(seen.iterator.map(s =>
        UTF8String.fromString(s): Any).toArray)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNgrams =
    copy(left = newLeft, right = newRight)
}

/** ALL word n-grams in order WITH multiplicity — the language-model
  * counts shape (`WordNgrams` above returns the distinct SET for
  * dedup). Same tokenization contract: trim → split on `\s+` →
  * consecutive n-word windows joined by single spaces; fewer than n
  * tokens → empty array. Replaces the interpreted
  * `transform(sequence(...), i -> concat(element_at...))` composition
  * with one flat loop per row. */
case class WordNgramsAll(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams_all"

  override protected def nullSafeEval(text: Any, nAny: Any): Any = {
    val n = nAny.asInstanceOf[Int]
    val toks = text.asInstanceOf[UTF8String].toString.trim.split("\\s+")
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](toks.length - n + 1)
      var i = 0
      while (i <= toks.length - n) {
        val sb = new StringBuilder(toks(i))
        var k = 1
        while (k < n) { sb.append(' ').append(toks(i + k)); k += 1 }
        out(i) = UTF8String.fromString(sb.result())
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNgramsAll =
    copy(left = newLeft, right = newRight)
}

/** Unicode NFC normalization (java.text.Normalizer) — the text-hygiene
  * pass every web-scale corpus needs BEFORE hashing/dedup: canonically
  * equivalent byte sequences (decomposed "e"+U+0301 vs precomposed "é")
  * otherwise hash apart, so visually identical documents dodge exact
  * AND shingle dedup. Map-local; aligned with DuckDB's `nfc_normalize`
  * (the q117 oracle). CodegenFallback: the surrounding projection still
  * codegens and calls eval() once per row. */
case class NfcNormalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(s: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
    // fast path: already-NFC strings (the overwhelming majority) skip
    // the allocation in Normalizer.normalize
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

object NfcNormalize {
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      NfcNormalize(org.apache.spark.sql.graft.ColumnBridge.expression(c)))
}
