package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns next to typed metadata, and per-batch
  * transforms run as `mapPartitions` over a typed Dataset (the JVM
  * analogue of Arrow-batched pandas UDFs: one iterator per partition,
  * amortized setup, no per-row dispatch).
  *
  * The actual codec work (JPEG decode, resample, frame extraction) is
  * STUBBED — media libraries are not available in this environment — as
  * `FakeCodec`, a deterministic stand-in. Everything Spark-side is
  * real and tested: schema, batch iteration shape, partitioning,
  * null handling.
  */
object MultiModal {

  /** media row: payload + envelope metadata. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long, kind: String, byte_len: Long,
      checksum: Long, width: Int, height: Int)

  /** STUB codec: deterministic pseudo-decode. A real deployment swaps
    * this for an actual image/audio library behind the same interface;
    * the Spark plumbing does not change. */
  object FakeCodec {
    def decodeDims(payload: Array[Byte]): (Int, Int) = {
      // pretend the first bytes encode dimensions
      val w = 64 + (checksum(payload) % 1024).toInt.abs
      (w, (w * 3) / 4)
    }
    def checksum(payload: Array[Byte]): Long = {
      var h = 0L
      var i = 0
      while (i < payload.length) { h = h * 31 + (payload(i) & 0xFF); i += 1 }
      h
    }
    /** pretend-resize: returns a deterministic shrunken payload. */
    def resize(payload: Array[Byte], maxBytes: Int): Array[Byte] =
      payload.take(maxBytes)

    /** STUB perceptual hash (pHash role): a real deployment decodes the
      * image, downsamples to a luma grid, DCTs and thresholds the
      * coefficients against their median; the stand-in uses the first
      * 63 payload bytes as the "grid" and thresholds against their
      * integer mean. 63 bits, not 64: the sign bit stays clear so the
      * value is a portable positive BIGINT in engines with checked
      * shifts (DuckDB errors on `1::BIGINT << 63`). The binarize-
      * against-central-tendency shape — the part that makes near-
      * identical inputs land at small Hamming distance — is the real
      * pHash contract and is what [[MultiModal.pHashNearDupPairs]]
      * exercises. */
    def pHash63(payload: Array[Byte]): Long = {
      val cells = new Array[Long](63)
      var i = 0
      while (i < 63) {
        cells(i) = if (i < payload.length) (payload(i) & 0xFF).toLong else 0L
        i += 1
      }
      var sum = 0L
      i = 0
      while (i < 63) { sum += cells(i); i += 1 }
      val mu = sum / 63
      var h = 0L
      i = 0
      while (i < 63) { if (cells(i) > mu) h |= 1L << i; i += 1 }
      h
    }
  }

  /** Batch feature extraction over the binary payload column —
    * `mapPartitions` so codec setup happens once per partition, not per
    * row (the Arrow/pandas-UDF batching shape on the JVM). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      // per-partition codec init would go here (one-time cost)
      rows.map { r =>
        val (w, h) = FakeCodec.decodeDims(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          FakeCodec.checksum(r.payload), w, h)
      }
    }
  }

  final case class ResizedMedia(media_id: Long, orig_bytes: Long,
                                new_bytes: Long, new_checksum: Long)

  /** Batch resize over the payload column (stub codec truncation in
    * place of a real resample) — same mapPartitions batching shape as
    * extractFeatures; emits before/after sizes and the resized
    * payload's checksum so the transform is oracle-checkable. */
  def resizeBatch(media: Dataset[MediaRow], maxBytes: Int): Dataset[ResizedMedia] = {
    implicit val enc = Encoders.product[ResizedMedia]
    media.mapPartitions { rows =>
      rows.map { r =>
        val out = FakeCodec.resize(r.payload, maxBytes)
        ResizedMedia(r.media_id, r.payload.length.toLong, out.length.toLong,
          FakeCodec.checksum(out))
      }
    }
  }

  final case class MediaHash(media_id: Long, phash: Long)

  /** Per-payload perceptual hash at the codec boundary — mapPartitions
    * like [[extractFeatures]] so real-codec init (decode + DCT setup)
    * amortizes per partition. */
  def pHash(media: Dataset[MediaRow]): Dataset[MediaHash] = {
    implicit val enc = Encoders.product[MediaHash]
    media.mapPartitions { rows =>
      rows.map(r => MediaHash(r.media_id, FakeCodec.pHash63(r.payload)))
    }
  }

  /** Multimodal NEAR-dup: all pairs of media whose perceptual hashes
    * sit within `maxHamming` bits, via banded Hamming blocking — the
    * missing sibling of the text-side MinHash/SimHash dedup family
    * ([[Dedup]]) for image/audio payloads.
    *
    * Exactness: the 63-bit hash splits into 7 bands of 9 bits; a pair
    * differing in ≤ 6 bits cannot differ in all 7 bands (pigeonhole),
    * so the band equi-join is a COMPLETE candidate generator for
    * `maxHamming` ≤ 6 — the output is exactly the brute-force pair set,
    * never approximate (enforced by `require`; MultiModalSpec pins the
    * brute-force equivalence).
    *
    * Scale: hashes are one map pass over the payloads (the only time
    * bytes are touched); candidates come from a shuffle equi-join on
    * (band, 9-bit key) — Σ bucket² over 512 buckets per band, never
    * all-pairs — and verification is a map-local `bit_count(xor)` on
    * the hashes carried through the join (no second join back to the
    * corpus). At larger corpora the dial is wider bands with a smaller
    * guaranteed radius (e.g. 4×16 bits complete to 3) or an extra
    * blocking key (media dimensions) prefixed to the band key. */
  def pHashNearDupPairs(media: Dataset[MediaRow], maxHamming: Int = 4): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 6,
      s"7 bands of 9 bits are complete only for maxHamming <= 6, got $maxHamming")
    val bands = pHash(media).toDF()
      .select(col("media_id"), col("phash"),
        explode(sequence(lit(0), lit(6))).as("band"))
      .withColumn("bkey", expr("shiftright(phash, band * 9) & 511"))
    val a = bands.select(col("band"), col("bkey"),
      col("media_id").as("a_id"), col("phash").as("a_hash"))
    val b = bands.select(col("band"), col("bkey"),
      col("media_id").as("b_id"), col("phash").as("b_hash"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("a_id") < col("b_id"))
      // hash is a function of the id → this is DISTINCT over pairs
      .select(col("a_id"), col("b_id"), col("a_hash"), col("b_hash"))
      .distinct()
      .withColumn("dist",
        bit_count(col("a_hash").bitwiseXOR(col("b_hash"))).cast(LongType))
      .filter(col("dist") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("dist"))
  }

  /** Deterministic frame sampling plan for a video payload: emit
    * `frames` evenly-spaced (media_id, frame_index, byte_offset) rows —
    * pure column math + posexplode, no codec needed to *plan* the
    * sampling at scale. */
  def sampleFrameOffsets(media: DataFrame, frames: Int): DataFrame =
    media
      .select(col("media_id"), length(col("payload")).as("n_bytes"),
        posexplode(sequence(lit(0), lit(frames - 1))))
      .withColumnRenamed("pos", "frame_index")
      .select(col("media_id"), col("frame_index"),
        floor(col("col") * col("n_bytes") / frames).cast(LongType).as("byte_offset"))
}
