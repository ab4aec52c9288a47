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
