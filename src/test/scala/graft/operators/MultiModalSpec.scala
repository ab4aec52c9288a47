package graft.operators

import graft.SparkSuite
import graft.operators.MultiModal._

class MultiModalSpec extends SparkSuite {

  test("extractFeatures: mapPartitions batch over binary payloads") {
    import spark.implicits._
    val media = Seq(
      MediaRow(1L, "image", Array[Byte](1, 2, 3, 4)),
      MediaRow(2L, "audio", Array.fill[Byte](100)(7))).toDS()
    val feats = extractFeatures(media).collect().sortBy(_.media_id)
    assert(feats.map(_.byte_len).toSeq == Seq(4L, 100L))
    assert(feats(0).checksum == FakeCodec.checksum(Array[Byte](1, 2, 3, 4)))
    assert(feats.forall(f => f.width > 0 && f.height == f.width * 3 / 4))
  }

  test("sampleFrameOffsets: evenly spaced plan, no codec needed") {
    import spark.implicits._
    val media = Seq((1L, Array.fill[Byte](1000)(0))).toDF("media_id", "payload")
    val got = sampleFrameOffsets(media, frames = 4).collect()
      .map(r => (r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(got == Seq((0, 0L), (1, 250L), (2, 500L), (3, 750L)))
  }
}
