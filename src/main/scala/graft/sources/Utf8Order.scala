package graft.sources

import java.nio.charset.StandardCharsets

/** Spark compares strings as UNSIGNED UTF-8 BYTES (`UTF8String
  * .compareTo`), while Java's `String.compareTo` compares UTF-16 code
  * units — the two orders DISAGREE for supplementary-plane characters
  * (surrogates 0xD800-0xDFFF sort below 0xE000-0xFFFF in UTF-16 but
  * their UTF-8 encodings sort above). String manifest stats are
  * WRITTEN by Spark min/max (byte order), so every prune, fold, and
  * comparison against them must use this same order or a file holding
  * an emoji-keyed row gets wrongly skipped. */
object Utf8Order {

  /** Negative / zero / positive like compareTo, in UTF-8 byte order. */
  def cmp(a: String, b: String): Int = {
    val x = a.getBytes(StandardCharsets.UTF_8)
    val y = b.getBytes(StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  def lteq(a: String, b: String): Boolean = cmp(a, b) <= 0
  def lt(a: String, b: String): Boolean = cmp(a, b) < 0

  def min(a: String, b: String): String = if (cmp(a, b) <= 0) a else b
  def max(a: String, b: String): String = if (cmp(a, b) >= 0) a else b
}
