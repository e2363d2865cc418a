package graft

import org.apache.spark.sql.functions._

import graft.ops.{Multimodal, Video}

class VideoSpec extends SparkSpec {
  import spark.implicits._

  private def jpeg(w: Int, h: Int): Array[Byte] = Multimodal.makeDecodable(w, h, "jpg")

  test("parseAviHeader + frameOffsets: roundtrip, truncation, garbage") {
    val frames = (0 until 5).map(_ => jpeg(16, 12))
    val avi = Video.makeMjpegAvi(frames, 16, 12, fps = 25)
    val m = Video.parseAviHeader(avi).get
    assert(m.width === 16 && m.height === 12 && m.nFrames === 5 &&
      m.usPerFrame === 40000)
    val offs = Video.frameOffsets(avi)
    assert(offs.size === 5)
    // every extracted frame is byte-identical to what was planted
    offs.zip(frames).foreach { case ((o, s), f) =>
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(avi, o, o + s), f))
    }
    assert(Video.parseAviHeader(avi.take(30)).isEmpty)
    assert(Video.parseAviHeader("RIFFxxxxWAVE".getBytes ++ new Array[Byte](40)).isEmpty)
    assert(Video.frameOffsets(Array[Byte](1, 2, 3)).isEmpty)
    // crafted chunk size near Int.MaxValue: bound checks run in Long so the
    // walk refuses instead of overflowing negative and throwing (ADVICE r16)
    val crafted = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    crafted.put("RIFF".getBytes).putInt(56).put("AVI ".getBytes)
    crafted.put("JUNK".getBytes).putInt(0x7FFFFFF0)
    assert(Video.parseAviHeader(crafted.array()).isEmpty)
    assert(Video.frameOffsets(crafted.array()).isEmpty)
  }

  test("sampleFrames: even spacing, fewer-frames-than-n, quarantine; frames chain into image ops") {
    val rows = Seq(
      (1L, Video.makeMjpegAvi((0 until 10).map(_ => jpeg(16, 12)), 16, 12)),
      (2L, Video.makeMjpegAvi((0 until 2).map(_ => jpeg(8, 6)), 8, 6)),
      (3L, Array[Byte](7, 7, 7, 7))).toDF("doc_id", "media")
    val got = Video.sampleFrames(rows, "doc_id", "media", n = 4).collect()
    val byId = got.groupBy(_.getLong(0))
    // 10 frames sampled at 4: indices k*10/4 = 0, 2, 5, 7
    assert(byId(1L).map(_.getLong(1)).sorted.toSeq === Seq(0L, 2L, 5L, 7L))
    // 2 frames < n=4: both frames, once each
    assert(byId(2L).map(_.getLong(1)).sorted.toSeq === Seq(0L, 1L))
    // garbage quarantines as ONE null-frame row (the video never vanishes)
    assert(byId(3L).length === 1 && byId(3L).head.isNullAt(1) &&
      byId(3L).head.getString(3) != null)
    // the sampled bytes are REAL JPEGs: the image header parser reads the
    // planted dims, and the perceptual hasher decodes them
    val frames = Video.sampleFrames(rows.filter(col("doc_id") === 1L),
      "doc_id", "media", 4)
      .select(col("frame_idx").as("fid"), col("frame_bytes"))
    val dims = frames.collect().map(r =>
      Multimodal.parseMediaHeader(r.getAs[Array[Byte]](1)).get)
    assert(dims.forall(_ == ("image/jpeg", 16, 12)))
    val hashed = Multimodal.imageHash64(frames, "fid", "frame_bytes")
    assert(hashed.filter(col("hash_error").isNotNull).count() === 0)
  }

  test("sampleFrames property: indices strictly increasing, first included, count = min(n, F)") {
    val rnd = new scala.util.Random(13)
    val frame = jpeg(4, 4)
    for (_ <- 0 until 12) {
      val f = 1 + rnd.nextInt(40)
      val n = 1 + rnd.nextInt(12)
      val got = Video.sampleFrames(
          Seq((1L, Video.makeMjpegAvi(Seq.fill(f)(frame), 4, 4)))
            .toDF("doc_id", "media"), "doc_id", "media", n)
        .collect().map(_.getLong(1)).sorted.toSeq
      assert(got.length === math.min(n, f), s"f=$f n=$n got=$got")
      assert(got.distinct.length === got.length, s"f=$f n=$n repeated: $got")
      assert(got.head === 0L, s"f=$f n=$n first frame missing: $got")
      assert(got.forall(i => i >= 0 && i < f), s"f=$f n=$n out of range: $got")
      // the declared formula
      assert(got === (0 until math.min(n, f)).map(k => k.toLong * f / math.min(n, f)),
        s"f=$f n=$n")
    }
  }

  test("videoNearDupPairs: shared-frame videos pair with per-frame links; singletons and junk do not") {
    def video(frameParams: Seq[Long]): Array[Byte] = {
      val frames = frameParams.map(p => Multimodal.makeBlockImage(p, "jpg"))
      Video.makeMjpegAvi(frames, 72, 64)
    }
    val rows = Seq(
      (0L, video(Seq(10L, 11L, 12L, 13L))), // group A
      (1L, video(Seq(10L, 11L, 12L, 13L))), // group A (same sequence)
      (2L, video(Seq(20L, 21L, 22L, 23L))), // group B
      (3L, video(Seq(20L, 21L, 22L, 23L))), // group B
      (4L, video(Seq(30L, 31L, 32L, 33L))), // singleton
      (5L, Array[Byte](1, 2, 3))).toDF("doc_id", "media") // junk
    val got = Video.videoNearDupPairs(rows, "doc_id", "media",
        sampleN = 8, maxHamming = 4, minLinks = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map((0L, 1L) -> 4L, (2L, 3L) -> 4L))
    // a raised minLinks threshold drops pairs below it
    assert(Video.videoNearDupPairs(rows, "doc_id", "media",
      sampleN = 8, maxHamming = 4, minLinks = 5).count() === 0)
  }

  test("videoNearDupPairs: a >=1024-frame video cannot alias into other videos' id space") {
    // Regression (ADVICE r16): frame identity used to pack the RAW frame
    // index (unbounded), so a long video's frames landed in the NEXT
    // video id's space — here video 0's frame 1137 would read as video 1
    // and its self-matches would fabricate a (0, 1) pair. The pack key is
    // now the sample ordinal (< sampleN < 1024).
    def video(frameParams: Seq[Long]): Array[Byte] = {
      val frames = frameParams.map(p => Multimodal.makeBlockImage(p, "jpg"))
      Video.makeMjpegAvi(frames, 72, 64)
    }
    val rows = Seq(
      (0L, video(Seq.fill(1300)(50L))), // 1300 identical frames
      (1L, video(Seq(60L, 61L, 62L, 63L))), // genuine dup pair ...
      (2L, video(Seq(60L, 61L, 62L, 63L)))) // ... with video 1
      .toDF("doc_id", "media")
    val got = Video.videoNearDupPairs(rows, "doc_id", "media",
        sampleN = 8, maxHamming = 4, minLinks = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map((1L, 2L) -> 4L), s"aliased pairs leaked: $got")
  }
}
