package graft

import org.apache.spark.sql.functions._

import graft.ops.Audio

class AudioSpec extends SparkSpec {
  import spark.implicits._

  test("parseWavHeader: roundtrip, chunk walking, truncation, garbage") {
    val wav = Audio.makeWav(8000, 256)
    val m = Audio.parseWavHeader(wav).get
    assert(m.sampleRate === 8000 && m.channels === 1 &&
      m.bitsPerSample === 16 && m.nFrames === 256)
    // real encoders put LIST/fact chunks between fmt and data — the walk
    // must skip them by size (odd sizes word-align)
    val extra = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val patched = java.nio.ByteBuffer.allocate(wav.length + extra.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    patched.put(wav, 0, 36)           // RIFF..fmt chunk end
    patched.put(extra)                // interloper chunk (odd size + pad)
    patched.put(wav, 36, wav.length - 36) // data chunk onward
    val pm = Audio.parseWavHeader(patched.array()).get
    assert(pm.nFrames === 256 && pm.sampleRate === 8000)
    // truncated mid-data refuses (declared size exceeds the bytes)
    assert(Audio.parseWavHeader(wav.take(100)).isEmpty)
    assert(Audio.parseWavHeader(Array[Byte](1, 2, 3)).isEmpty)
    assert(Audio.parseWavHeader("RIFFxxxxNOPE".getBytes ++ new Array[Byte](40)).isEmpty)
    // crafted chunk size near Int.MaxValue: the bound check must run in
    // Long (Int overflow used to pass it, then throw on a negative index —
    // ADVICE r16) — refuse, never throw
    val crafted = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    crafted.put("RIFF".getBytes).putInt(56).put("WAVE".getBytes)
    crafted.put("JUNK".getBytes).putInt(0x7FFFFFF0)
    assert(Audio.parseWavHeader(crafted.array()).isEmpty)
  }

  test("decodeWavFeatures: exact integer features; non-PCM16-mono and garbage quarantine") {
    // triangle wave, period 64 amp 8000: mean |s| over a full period is
    // EXACTLY 4000 (60000+128000+68000 = 256000 over 64 samples)
    val rows = Seq(
      (1L, Audio.makeWav(8000, 512)),
      (2L, Audio.makeWav(16000, 640)),
      (3L, Array[Byte](1, 2, 3, 4))).toDF("doc_id", "media")
    val got = Audio.decodeWavFeatures(rows, "doc_id", "media")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getInt(1) === 8000 && got(1L).getLong(2) === 512L &&
      got(1L).getLong(3) === 64L && got(1L).getLong(4) === 4000L)
    assert(got(2L).getInt(1) === 16000 && got(2L).getLong(2) === 640L &&
      got(2L).getLong(3) === 40L && got(2L).getLong(4) === 4000L)
    assert(got(3L).isNullAt(1) && got(3L).getString(5) != null)
  }

  test("resamplePcm16: identity is byte-exact, 2:1 is exact subsampling, 1:2 interpolates midpoints") {
    def pcmOk(bytes: Array[Byte]): Seq[Int] = {
      val m = Audio.parseWavHeader(bytes).get
      (0 until m.nFrames).map { i =>
        val lo = bytes(m.dataOffset + 2 * i) & 0xFF
        val hi = bytes(m.dataOffset + 2 * i + 1).toInt
        (hi << 8) | lo
      }
    }
    val src = Audio.makeWav(8000, 200)
    val in = pcmOk(src)
    def out(target: Int): (Seq[Int], Int) = {
      val r = Audio.resamplePcm16(Seq((1L, src)).toDF("doc_id", "media"),
        "doc_id", "media", target).head()
      assert(r.getString(4) == null, s"unexpected quarantine: ${r.getString(4)}")
      val bytes = r.getAs[Array[Byte]]("media")
      (pcmOk(bytes), r.getInt(2))
    }
    val (same, rSame) = out(8000)
    assert(rSame === 8000 && same === in)
    val (half, rHalf) = out(4000)
    assert(rHalf === 4000)
    assert(half === (0 until half.size).map(k => in(2 * k)))
    assert(half.size === (199 * 4000) / 8000 + 1)
    val (dbl, _) = out(16000)
    assert(dbl.size === (199 * 16000) / 8000 + 1)
    // even positions copy, odd positions are floor midpoints
    (0 until in.size).foreach(i => assert(dbl(2 * i) === in(i)))
    (0 until in.size - 1).foreach { i =>
      val mid = in(i) + Math.floorDiv((in(i + 1) - in(i)).toLong * 8000, 16000).toInt
      assert(dbl(2 * i + 1) === mid, s"i=$i")
    }
    // quarantine: garbage and unsupported shapes carry no payload
    val stereoish = {
      val w = Audio.makeWav(8000, 8)
      w(22) = 2 // channels patched to 2 — unsupported shape
      w
    }
    val q = Audio.resamplePcm16(Seq((1L, Array[Byte](1, 2)), (2L, stereoish))
        .toDF("doc_id", "media"), "doc_id", "media", 4000)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(q(1L).isNullAt(1) && q(1L).getString(4).contains("unrecognized"))
    assert(q(2L).isNullAt(1) && q(2L).getString(4).contains("unsupported"))
  }

  test("resamplePcm16 property: frame-count contract, bounds, and value envelope at random rates") {
    val rnd = new scala.util.Random(31)
    val src = Audio.makeWav(8000, 160)
    val inMax = 8000 // triangle amplitude bound
    for (_ <- 0 until 10) {
      val target = 500 + rnd.nextInt(20000)
      val r = Audio.resamplePcm16(Seq((1L, src)).toDF("doc_id", "media"),
        "doc_id", "media", target).head()
      assert(r.getString(4) == null, s"target=$target: ${r.getString(4)}")
      val bytes = r.getAs[Array[Byte]]("media")
      val m = Audio.parseWavHeader(bytes).get
      // the declared contract: nOut = (nIn−1)·dst DIV src + 1
      assert(m.nFrames === (Math.floorDiv(159L * target, 8000) + 1).toInt,
        s"target=$target frames=${m.nFrames}")
      assert(m.sampleRate === target)
      // linear interpolation can never leave the input value envelope
      (0 until m.nFrames).foreach { i =>
        val lo = bytes(m.dataOffset + 2 * i) & 0xFF
        val hi = bytes(m.dataOffset + 2 * i + 1).toInt
        val v = (hi << 8) | lo
        assert(v >= -inMax && v <= inMax, s"target=$target i=$i v=$v")
      }
    }
  }

  test("silenceSegments: maximal loud runs, edges, all-silent, trailing partial, quarantine") {
    def segs(pattern: Seq[Boolean]): Seq[(Long, Long, Long)] =
      Audio.silenceSegments(
          Seq((1L, Audio.makePatternWav(pattern))).toDF("doc_id", "media"),
          "doc_id", "media", windowFrames = 64, threshold = 100L)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
        .sortBy(_._1)
    // [s L L s L] → two segments, exclusive ends
    assert(segs(Seq(false, true, true, false, true)) ===
      Seq((0L, 64L, 192L), (1L, 256L, 320L)))
    // loud at both edges
    assert(segs(Seq(true, false, true)) === Seq((0L, 0L, 64L), (1L, 128L, 192L)))
    // single run spanning everything
    assert(segs(Seq(true, true, true)) === Seq((0L, 0L, 192L)))
    // all-silent → zero rows (not a quarantine)
    assert(segs(Seq(false, false)) === Seq.empty)
    // trailing PARTIAL window: 2.5 windows of loud → end clamps to n
    val oddWav = {
      val full = Audio.makePatternWav(Seq(true, true, true))
      val m = Audio.parseWavHeader(full).get
      // keep 160 frames (2.5 windows) of the data
      val kept = java.util.Arrays.copyOfRange(full, m.dataOffset, m.dataOffset + 320)
      val buf = java.nio.ByteBuffer.allocate(44 + kept.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put(full, 0, 40); buf.putInt(kept.length); buf.put(kept)
      buf.array()
    }
    val odd = Audio.silenceSegments(Seq((1L, oddWav)).toDF("doc_id", "media"),
        "doc_id", "media", 64, 100L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(odd === Seq((0L, 0L, 160L)))
    // garbage quarantines as one null-segment row
    val q = Audio.silenceSegments(
        Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "media"),
        "doc_id", "media", 64, 100L).collect()
    assert(q.length === 1 && q.head.isNullAt(1) && q.head.getString(4) != null)
  }

  test("audioHash64: invariant under REAL 2:1 resampling and volume scaling; groups separate") {
    def hashOf(bytes: Array[Byte]): Long = {
      val r = Audio.audioHash64(
        Seq((1L, bytes)).toDF("doc_id", "media"), "doc_id", "media").head()
      assert(r.getString(2) == null, s"unexpected quarantine: ${r.getString(2)}")
      r.getLong(1)
    }
    val base = Audio.makeSegmentWav(3L)
    val h = hashOf(base)
    // resample through the REAL operator (not a fixture shortcut): slice
    // energies are duration-proportional and the fixture's exact integer
    // construction survives 2:1 subsampling bit-for-bit
    val resampled = Audio.resamplePcm16(
        Seq((1L, base)).toDF("doc_id", "media"), "doc_id", "media", 4000)
      .head().getAs[Array[Byte]]("media")
    assert(hashOf(resampled) === h, "2:1 resample changed the acoustic hash")
    // volume doubling preserves every energy comparison
    assert(hashOf(Audio.makeSegmentWav(3L, ampScale = 2)) === h)
    // NON-integer ratio (8000 → 3000): slice boundaries no longer align to
    // segment boundaries exactly, so bits may drift a little — the claim
    // is NEARNESS (well inside the near-dup radius), not bit-equality
    val r3000 = Audio.resamplePcm16(
        Seq((1L, base)).toDF("doc_id", "media"), "doc_id", "media", 3000)
      .head().getAs[Array[Byte]]("media")
    val d3000 = java.lang.Long.bitCount(h ^ hashOf(r3000))
    assert(d3000 <= 4, s"8000->3000 drifted $d3000 bits (> near-dup radius)")
    // a different group's envelope is far away
    assert(java.lang.Long.bitCount(h ^ hashOf(Audio.makeSegmentWav(4L))) > 8)
    // exhaustive separation over 1700 groups (covers any fixture size the
    // oracle query plants) — protects the combinatorial oracle
    val many = Audio.audioHash64(
      spark.range(0, 1700).select(col("id").as("doc_id"))
        .as[Long].mapPartitions(_.map(g => (g, Audio.makeSegmentWav(g))))
        .toDF("doc_id", "media"),
      "doc_id", "media").collect().map(_.getLong(1))
    val minD = (for {
      i <- many.indices.iterator; j <- (i + 1 until many.length).iterator
    } yield java.lang.Long.bitCount(many(i) ^ many(j))).min
    assert(minD > 6, s"min cross-group Hamming $minD too small for radius 4")
    // too-short and garbage quarantine
    val bad = Audio.audioHash64(Seq(
        (1L, Audio.makeWav(8000, 10)), (2L, Array[Byte](1, 2, 3)))
        .toDF("doc_id", "media"), "doc_id", "media")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(bad(1L).isNullAt(1) && bad(1L).getString(2).contains("unsupported"))
    assert(bad(2L).isNullAt(1) && bad(2L).getString(2).contains("unrecognized"))
    // banded pairing is shared with the image kernel — smoke the delegate
    val pairs = Audio.audioNearDupPairs(
      Seq((1L, h), (2L, h), (3L, ~h)).toDF("id", "phash"), "id", "phash", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }
}
