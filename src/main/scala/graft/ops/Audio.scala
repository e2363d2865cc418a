package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Audio column plumbing over opaque `binary` payloads — the WAV/PCM half
  * of the multimodal story, REAL in pure JVM: RIFF/WAVE is an uncompressed
  * container (the published byte layout needs no codec), so header parse,
  * decode and resample are all integer arithmetic this engine can run
  * bit-reproducibly anywhere. Compressed audio (mp3/ogg) would need codecs
  * this container does not ship — those stay behind the byte-budget
  * stand-in ([[Multimodal.resizeStub]]), exactly like video.
  *
  * Operator shape matches [[Multimodal.decodeHeaders]]/[[Multimodal.resize]]:
  * typed-Dataset mapPartitions, payloads never on the driver, malformed
  * bytes QUARANTINE with an error label instead of throwing.
  */
object Audio {

  /** Parsed WAV facts: PCM16 mono is the decodable subset ([[resamplePcm16]]
    * refuses the rest loudly per row, into quarantine).
    */
  final case class WavMeta(sampleRate: Int, channels: Int, bitsPerSample: Int,
                           dataOffset: Int, dataBytes: Int) {
    def nFrames: Int =
      if (channels <= 0 || bitsPerSample <= 0) 0
      else dataBytes / (channels * (bitsPerSample / 8))
  }

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

  /** Parse a RIFF/WAVE header by WALKING the chunk list (fmt may be
    * followed by LIST/fact/cue chunks before data — real encoders emit
    * them). O(header) bytes; None = not an intact PCM WAV container.
    */
  def parseWavHeader(bytes: Array[Byte]): Option[WavMeta] = {
    if (bytes == null || bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F')) return None
    if (!(bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')) return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    while (i + 8 <= bytes.length) {
      val id = new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(bytes, i + 4)
      // bound arithmetic in Long: a crafted size near Int.MaxValue would
      // overflow `i + 8 + size` negative and pass an Int comparison, then
      // drive `i` negative and throw out of mapPartitions (ADVICE r16)
      if (size < 0 || i.toLong + 8 + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = le16(bytes, i + 8)
          if (audioFormat != 1) return None // PCM only
          fmt = Some((le16(bytes, i + 10), le32(bytes, i + 12), le16(bytes, i + 22)))
        case "data" =>
          return fmt.collect { case (ch, rate, bits)
              if ch > 0 && rate > 0 && (bits == 8 || bits == 16) =>
            WavMeta(rate, ch, bits, i + 8, size)
          }
        case _ => // skip unknown chunks (LIST, fact, cue, ...)
      }
      i += 8 + size + (size & 1) // chunks are word-aligned
    }
    None
  }

  /** Build a spec-valid PCM16 MONO WAV carrying a deterministic triangle
    * wave (integer amplitude arithmetic — no libm): the fixture builder
    * for [[resamplePcm16]] tests and oracles.
    */
  def makeWav(sampleRate: Int, nFrames: Int, period: Int = 64,
              amplitude: Int = 8000): Array[Byte] = {
    require(sampleRate > 0 && nFrames >= 0 && period >= 2)
    val data = new Array[Byte](nFrames * 2)
    var k = 0
    while (k < nFrames) {
      val ph = k % period
      val tri = // triangle: 0 → amp → 0 → −amp → 0 over one period
        if (ph < period / 4) ph * 4 * amplitude / period
        else if (ph < 3 * period / 4) amplitude * 2 - ph * 4 * amplitude / period
        else ph * 4 * amplitude / period - amplitude * 4
      data(2 * k) = (tri & 0xFF).toByte
      data(2 * k + 1) = ((tri >> 8) & 0xFF).toByte
      k += 1
    }
    wrapPcm16(data, sampleRate)
  }

  private def wrapPcm16(data: Array[Byte], sampleRate: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(36 + data.length)
    buf.put("WAVE".getBytes)
    buf.put("fmt ".getBytes); buf.putInt(16)
    buf.putShort(1); buf.putShort(1) // PCM, mono
    buf.putInt(sampleRate); buf.putInt(sampleRate * 2)
    buf.putShort(2); buf.putShort(16) // block align, bits
    buf.put("data".getBytes); buf.putInt(data.length)
    buf.put(data)
    buf.array()
  }

  /** 64-bit ENERGY DIFFERENCE HASH over PCM16 mono audio — the acoustic
    * sibling of [[Multimodal.imageHash64]]: the signal splits into 65
    * equal-duration slices, each slice's loudness is its exact integer
    * mean |amplitude|, and bit j compares slice j to slice j+1. Ordering
    * of slice energies survives what byte fingerprints cannot: sample-rate
    * conversion (slices are duration-proportional — integer-ratio
    * resamples of the fixtures are hash-IDENTICAL, non-integer ratios
    * drift a few bits and stay inside the near-dup radius; AudioSpec
    * proves both) and uniform volume changes (scaling preserves order).
    * Pure integer arithmetic —
    * bit-reproducible everywhere. Tracks shorter than 65 frames carry no
    * envelope to compare and quarantine. Returns (id, phash, hash_error).
    */
  def audioHash64(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .filter(col(idCol).isNotNull && col(binCol).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        parseWavHeader(bytes) match {
          case Some(m) if m.bitsPerSample == 16 && m.channels == 1 &&
              m.nFrames >= 65 =>
            val n = m.nFrames
            val e = new Array[Long](65)
            var j = 0
            while (j < 65) {
              val lo = (j.toLong * n / 65).toInt
              val hi = ((j + 1).toLong * n / 65).toInt
              var sum = 0L
              var k = lo
              while (k < hi) {
                val s = (le16(bytes, m.dataOffset + 2 * k) << 16) >> 16
                sum += math.abs(s.toLong); k += 1
              }
              e(j) = sum / (hi - lo)
              j += 1
            }
            var bits = 0L
            var b = 0
            while (b < 64) {
              if (e(b) > e(b + 1)) bits |= (1L << b)
              b += 1
            }
            (id, Option(bits), Option.empty[String])
          case Some(_) =>
            (id, None,
              Option("unsupported WAV shape (need PCM16 mono, >= 65 frames)"))
          case None =>
            (id, None, Option("unrecognized or truncated WAV container"))
        }
      })
      .toDF("id", "phash", "hash_error")
  }

  /** Near-duplicate audio pairs by banded Hamming join over [[audioHash64]]
    * fingerprints — the same pigeonhole band kernel as
    * [[Multimodal.imageNearDupPairs]] (a 64-bit perceptual hash is a
    * 64-bit perceptual hash); see there for the candidate-generation and
    * scale contract.
    */
  def audioNearDupPairs(hashes: DataFrame, idCol: String, hashCol: String,
                        maxHamming: Int, bands: Int = 8): DataFrame =
    Multimodal.imageNearDupPairs(hashes, idCol, hashCol, maxHamming, bands)

  /** A deterministic SEGMENT-ENVELOPE fixture for acoustic-hash tests: 65
    * segments of `periodsPerSegment` whole triangle periods, per-segment
    * amplitude = 16·(rank+2)·ampScale where ranks are a group-seeded
    * permutation (full-avalanche mix — the [[Multimodal.makeBlockImage]]
    * construction on the time axis). Amplitudes divisible by 16 keep the
    * triangle arithmetic EXACT, so the slice energies — and therefore the
    * hash — are identical across 2:1 resampling and volume scaling.
    */
  def makeSegmentWav(group: Long, sampleRate: Int = 8000,
                     periodsPerSegment: Int = 2, ampScale: Int = 1): Array[Byte] = {
    require(periodsPerSegment >= 1, "periodsPerSegment must be >= 1")
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val order = (0 until 65).sortBy(k => mix(group * 65 + k))
    val ampOf = new Array[Int](65)
    order.zipWithIndex.foreach { case (seg, rank) =>
      ampOf(seg) = 16 * (rank + 2) * ampScale
    }
    val period = 64
    val segFrames = periodsPerSegment * period
    val n = 65 * segFrames
    val data = new Array[Byte](n * 2)
    var k = 0
    while (k < n) {
      val amp = ampOf(k / segFrames)
      val ph = k % period
      val tri =
        if (ph < period / 4) ph * 4 * amp / period
        else if (ph < 3 * period / 4) amp * 2 - ph * 4 * amp / period
        else ph * 4 * amp / period - amp * 4
      data(2 * k) = (tri & 0xFF).toByte
      data(2 * k + 1) = ((tri >> 8) & 0xFF).toByte
      k += 1
    }
    wrapPcm16(data, sampleRate)
  }

  /** Non-silent SEGMENTS of PCM16 mono audio — the chunking stage of an
    * ASR/speech corpus pipeline: the track splits into fixed windows of
    * `windowFrames`, a window is silent iff its EXACT integer mean
    * |amplitude| < `threshold`, and each maximal run of non-silent windows
    * becomes one segment. Integer arithmetic throughout (bit-reproducible);
    * a trailing partial window is judged by its own mean. Same quarantine
    * discipline as the rest of the family: malformed/unsupported payloads
    * emit one null-segment row with an error label (a track never silently
    * vanishes); an all-silent track emits no segment rows.
    *
    * Returns (id, seg_idx, start_frame, end_frame, seg_error) with
    * `end_frame` exclusive.
    */
  def silenceSegments(df: DataFrame, idCol: String, binCol: String,
                      windowFrames: Int, threshold: Long): DataFrame = {
    require(windowFrames > 0, s"windowFrames must be positive, got $windowFrames")
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .filter(col(idCol).isNotNull && col(binCol).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseWavHeader(bytes) match {
          case Some(m) if m.bitsPerSample == 16 && m.channels == 1 =>
            val n = m.nFrames
            val nWin = (n + windowFrames - 1) / windowFrames
            val loud = new Array[Boolean](nWin)
            var w = 0
            while (w < nWin) {
              val lo = w * windowFrames
              val hi = math.min(n, lo + windowFrames)
              var sum = 0L
              var k = lo
              while (k < hi) {
                val s = (le16(bytes, m.dataOffset + 2 * k) << 16) >> 16
                sum += math.abs(s.toLong); k += 1
              }
              loud(w) = hi > lo && sum / (hi - lo) >= threshold
              w += 1
            }
            val segs = Seq.newBuilder[(Long, Option[Long], Option[Long],
              Option[Long], Option[String])]
            var segIdx = 0L
            var i = 0
            while (i < nWin) {
              if (loud(i)) {
                var j = i
                while (j < nWin && loud(j)) j += 1
                segs += ((id, Some(segIdx),
                  Some(i.toLong * windowFrames),
                  Some(math.min(n, j.toLong * windowFrames)),
                  None))
                segIdx += 1
                i = j
              } else i += 1
            }
            segs.result()
          case Some(_) =>
            Seq((id, Option.empty[Long], Option.empty[Long], Option.empty[Long],
              Option("unsupported WAV shape (need PCM16 mono)")))
          case None =>
            Seq((id, Option.empty[Long], Option.empty[Long], Option.empty[Long],
              Option("unrecognized or truncated WAV container")))
        }
      })
      .toDF("id", "seg_idx", "start_frame", "end_frame", "seg_error")
  }

  /** A loud/silent PATTERN fixture for [[silenceSegments]]: a WAV whose
    * windows follow the given booleans — `true` windows carry whole
    * triangle periods of amplitude 8000 (exact window mean |amplitude|
    * 4000, so `windowFrames` must be a multiple of the 64-frame period),
    * `false` windows are zeros.
    */
  def makePatternWav(pattern: Seq[Boolean], windowFrames: Int = 64,
                     sampleRate: Int = 8000): Array[Byte] = {
    require(windowFrames % 64 == 0, "windowFrames must be a multiple of 64")
    val n = pattern.length * windowFrames
    val data = new Array[Byte](n * 2)
    var k = 0
    while (k < n) {
      if (pattern(k / windowFrames)) {
        val ph = k % 64
        val amp = 8000
        val tri =
          if (ph < 16) ph * 4 * amp / 64
          else if (ph < 48) amp * 2 - ph * 4 * amp / 64
          else ph * 4 * amp / 64 - amp * 4
        data(2 * k) = (tri & 0xFF).toByte
        data(2 * k + 1) = ((tri >> 8) & 0xFF).toByte
      } // silent windows stay zero
      k += 1
    }
    wrapPcm16(data, sampleRate)
  }

  /** WAV metadata + an integer loudness feature per blob — the
    * feature-extract stage: (id, sample_rate, n_frames, duration_ms,
    * mean_abs_amplitude, decode_error). Quarantine discipline throughout;
    * mean amplitude is an exact integer mean (sum of |s| div n) so the
    * output hashes identically everywhere.
    */
  def decodeWavFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .filter(col(idCol).isNotNull && col(binCol).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          parseWavHeader(bytes) match {
            case Some(m) if m.bitsPerSample == 16 && m.channels == 1 =>
              val n = m.nFrames
              var sum = 0L
              var k = 0
              while (k < n) {
                val s = (le16(bytes, m.dataOffset + 2 * k) << 16) >> 16
                sum += math.abs(s.toLong); k += 1
              }
              (id, Option(m.sampleRate), Option(n.toLong),
                Option(n.toLong * 1000L / m.sampleRate),
                Option(if (n == 0) 0L else sum / n), Option.empty[String])
            case Some(_) =>
              (id, None, None, None, None,
                Option("unsupported WAV shape (need PCM16 mono)"))
            case None =>
              (id, None, None, None, None,
                Option("unrecognized or truncated WAV container"))
          }
        }
      }
      .toDF("id", "sample_rate", "n_frames", "duration_ms",
        "mean_abs_amplitude", "decode_error")
  }

  /** REAL sample-rate conversion for PCM16 mono WAV: linear interpolation
    * at rational positions in pure integer arithmetic (`floorDiv` — no
    * float, no libm; bit-identical on any JVM), re-encoded as PCM16 WAV.
    * Output frame k samples input position k·src/dst; frame count is
    * `floorDiv((n−1)·dst, src) + 1` (the last input sample stays in
    * range). Emitted rate/frame metadata is RE-PARSED from the produced
    * container — the operator validates its own output like
    * [[Multimodal.resize]]. Non-PCM16-mono or malformed blobs quarantine.
    *
    * Returns (id, media: binary, sample_rate, n_frames, resample_error).
    */
  def resamplePcm16(df: DataFrame, idCol: String, binCol: String,
                    targetRate: Int): DataFrame = {
    require(targetRate > 0, s"targetRate must be positive, got $targetRate")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .filter(col(idCol).isNotNull && col(binCol).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          parseWavHeader(bytes) match {
            case Some(m) if m.bitsPerSample == 16 && m.channels == 1 && m.nFrames > 0 =>
              val src = m.sampleRate
              val nIn = m.nFrames
              def sample(i: Int): Int = (le16(bytes, m.dataOffset + 2 * i) << 16) >> 16
              val nOut = (Math.floorDiv((nIn - 1).toLong * targetRate, src) + 1).toInt
              val out = new Array[Byte](nOut * 2)
              var k = 0
              while (k < nOut) {
                val num = k.toLong * src
                val idx = Math.floorDiv(num, targetRate).toInt
                val frac = num - idx.toLong * targetRate
                val s0 = sample(idx)
                val v =
                  if (frac == 0 || idx + 1 >= nIn) s0
                  else (s0 + Math.floorDiv(
                    (sample(idx + 1) - s0).toLong * frac, targetRate)).toInt
                out(2 * k) = (v & 0xFF).toByte
                out(2 * k + 1) = ((v >> 8) & 0xFF).toByte
                k += 1
              }
              val wav = wrapPcm16(out, targetRate)
              // self-validate: the emitted metadata comes from re-parsing
              val re = parseWavHeader(wav)
              (id, Option(wav), re.map(_.sampleRate), re.map(_.nFrames.toLong),
                if (re.isDefined) Option.empty[String]
                else Option("re-encoded WAV failed its own header parse"))
            case Some(_) =>
              (id, None, None, None,
                Option("unsupported WAV shape (need PCM16 mono, nonempty)"))
            case None =>
              (id, None, None, None,
                Option("unrecognized or truncated WAV container"))
          }
        }
      }
      .toDF("id", "media", "sample_rate", "n_frames", "resample_error")
  }
}
