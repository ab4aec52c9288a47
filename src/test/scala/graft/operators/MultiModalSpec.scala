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

  test("pHash63: grid/threshold vectors, sign bit always clear") {
    // all-equal bytes: no cell exceeds the mean → hash 0
    assert(FakeCodec.pHash63(Array.fill[Byte](63)(7)) == 0L)
    assert(FakeCodec.pHash63(Array.emptyByteArray) == 0L)
    // one hot byte at i: mean = 255/63 = 4 → only bit i set
    val one = new Array[Byte](63); one(5) = -1 // 0xFF unsigned
    assert(FakeCodec.pHash63(one) == (1L << 5))
    // unsigned byte handling: 0x80 (= -128 signed) must count as 128
    val neg = new Array[Byte](63); neg(62) = -128
    assert(FakeCodec.pHash63(neg) == (1L << 62))
    // sign bit clear on adversarial input
    assert(FakeCodec.pHash63(Array.fill[Byte](200)(-1)) >= 0L)
    // payload shorter than the grid zero-pads: tail bits can still set
    val short = Array[Byte](100, 1) // mean (101/63)=1 → bit 0 only
    assert(FakeCodec.pHash63(short) == 1L)
  }

  test("pHashNearDupPairs: equals brute force (band completeness ≤ 6)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val base = Array.fill[Byte](80)(rnd.nextInt(256).toByte)
    def mutate(n: Int): Array[Byte] = {
      val p = base.clone()
      (0 until n).foreach(i => p(rnd.nextInt(63)) = rnd.nextInt(256).toByte)
      p
    }
    val media = (0L until 40L).map { i =>
      MediaRow(i, "image",
        if (i < 20) mutate(i.toInt % 5) // clustered near-dups
        else Array.fill[Byte](80)(rnd.nextInt(256).toByte))
    }.toDS()
    val hashes = pHash(media).collect().map(h => h.media_id -> h.phash).toMap
    val brute = (for {
      a <- 0L until 40L; b <- (a + 1) until 40L
      d = java.lang.Long.bitCount(hashes(a) ^ hashes(b)) if d <= 6
    } yield (a, b, d.toLong)).toSet
    val got = pHashNearDupPairs(media, maxHamming = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute)
    assert(brute.nonEmpty, "fixture produced no near pairs — not exercising the join")
    intercept[IllegalArgumentException](pHashNearDupPairs(media, maxHamming = 7))
  }

  test("sampleFrameOffsets: evenly spaced plan, no codec needed") {
    import spark.implicits._
    val media = Seq((1L, Array.fill[Byte](1000)(0))).toDF("media_id", "payload")
    val got = sampleFrameOffsets(media, frames = 4).collect()
      .map(r => (r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(got == Seq((0, 0L), (1, 250L), (2, 500L), (3, 750L)))
  }
}
