package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document hashing expressions that collapse whole
  * explode→shuffle→aggregate pipelines into a single map-local pass.
  *
  * The round-1 formulations computed per-doc sketches by exploding the
  * token/shingle stream and aggregating back by doc_id — one full
  * shuffle of every token in the corpus just to come back to where the
  * row already was. At 100 TB that shuffle IS the job; these
  * expressions make the sketch a projection, so the only shuffle left
  * in the dedup pipelines is the (tiny) band-bucket self-join.
  *
  * All token hashing is bit-identical to the `xxhash64` builtin
  * (XXH64.hashUTF8String, seed 42) — asserted in DocHashSpec — so the
  * banding/verification stages and the recorded fixtures are unchanged.
  * CodegenFallback: the surrounding projection still codegens and calls
  * eval() once per row (same pattern as WordNgrams).
  */
object DocHashExpressions {

  /** Seed used by Spark's xxhash64() builtin. */
  val XxSeed = 42L

  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))

  /** SimHash with MD5 token hashing instead of xxhash64 — same votes/
    * ties/bit-assembly algorithm, but the token hash exists in DuckDB
    * too, so the WHOLE algorithm is oracle-checkable cross-engine
    * (q104). Gate-only: MD5 per token is far slower than XXH64 — the
    * production path stays [[simhash64]]. */
  def simhash64Md5(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text), useMd5 = true))

  def minhashSig(text: Column, n: Int, as: Seq[Long], bs: Seq[Long],
                 prime: Long): Column =
    ColumnBridge.column(
      MinHashSig(ColumnBridge.expression(text), n, as, bs, prime))

  def dictHits(text: Column, dicts: Seq[Seq[String]]): Column =
    ColumnBridge.column(DictHitsMulti(ColumnBridge.expression(text), dicts))
}

/** 64-bit SimHash of a whitespace-tokenized string: every token
  * occurrence votes ±1 per bit by its xxhash64 bit (term frequency is
  * the natural weight); ties set the bit — exactly the semantics of the
  * round-1 explode + 64×SUM formulation, minus its corpus-wide shuffle. */
case class SimHash64(child: Expression, useMd5: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  /** First 8 bytes of MD5(token), big-endian — the same value DuckDB's
    * `('0x' || substr(md5(tok), 1, 16))::UBIGINT` produces. */
  private def md5First8(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }

  override protected def nullSafeEval(text: Any): Any = {
    val toks = text.asInstanceOf[UTF8String].toString.trim.split("\\s+")
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = if (useMd5) md5First8(toks(i))
      else XXH64.hashUTF8String(
        UTF8String.fromString(toks(i)), DocHashExpressions.XxSeed)
      var b = 0
      while (b < 64) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sh = 0L
    var b = 0
    while (b < 64) { if (votes(b) >= 0) sh |= (1L << b); b += 1 }
    sh
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** MinHash signature (array<bigint>, length `as.size`) of a string's
  * word-`n`-gram shingle set: sig[i] = min over shingles of
  * (aᵢ·xxhash64(shingle) + bᵢ) mod prime — identical arithmetic to
  * MinHashAgg (wrapping overflow included), computed map-locally.
  * Fewer than `n` tokens → null (no shingles → no signature). */
case class MinHashSig(child: Expression, n: Int,
                      as: Seq[Long], bs: Seq[Long], prime: Long)
    extends UnaryExpression with CodegenFallback {

  private val numHashes = as.length
  private val aArr = as.toArray
  private val bArr = bs.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(text: Any): Any = {
    val toks = text.asInstanceOf[UTF8String].toString.trim.split("\\s+")
    if (toks.length < n) return null
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var k = 1
      while (k < n) { sb.append(' ').append(toks(i + k)); k += 1 }
      val h = XXH64.hashUTF8String(
        UTF8String.fromString(sb.toString), DocHashExpressions.XxSeed)
      var j = 0
      while (j < numHashes) {
        val x = aArr(j) * h + bArr(j) // wrapping overflow is part of the hash
        val m = x % prime
        val p = if (m < 0) m + prime else m
        if (p < sig(j)) sig(j) = p
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** Per-dictionary token-hit counts: array<bigint> with, for each
  * dictionary, the number of whitespace-token occurrences contained in
  * it — the language-ID scorer as one map-local pass instead of an
  * explode + K×SUM aggregation over the full token stream. */
case class DictHitsMulti(child: Expression, dicts: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {

  private val sets: Array[java.util.HashSet[String]] = dicts.map { d =>
    val s = new java.util.HashSet[String](d.size * 2)
    d.foreach(s.add)
    s
  }.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dict_hits"

  override protected def nullSafeEval(text: Any): Any = {
    val toks = text.asInstanceOf[UTF8String].toString.trim.split("\\s+")
    val hits = new Array[Long](sets.length)
    var i = 0
    while (i < toks.length) {
      var d = 0
      while (d < sets.length) {
        if (sets(d).contains(toks(i))) hits(d) += 1
        d += 1
      }
      i += 1
    }
    new GenericArrayData(hits)
  }

  override protected def withNewChildInternal(c: Expression): DictHitsMulti =
    copy(child = c)
}
