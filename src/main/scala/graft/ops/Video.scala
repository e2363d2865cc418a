package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Video column plumbing over opaque `binary` payloads — REAL for
  * MJPEG-in-AVI, in pure JVM: AVI is a RIFF container (the same published
  * chunk grammar WAV uses) and an MJPEG stream's frames are ordinary JPEG
  * images, so container walk + frame extraction need no codec, and the
  * extracted frames chain straight into the REAL image operators
  * ([[Multimodal.parseMediaHeader]], [[Multimodal.resize]],
  * [[Multimodal.imageHash64]]) — a decode → frame-sample → perceptual-dedup
  * pipeline with no stand-ins anywhere. Inter-frame codecs (H.264 …) would
  * need decoders this container does not ship; those stay behind the
  * byte-chunk stand-in ([[Multimodal.frameSample]]).
  *
  * Operator shape matches the rest of the media family: typed-Dataset
  * mapPartitions, payloads never on the driver, malformed bytes QUARANTINE
  * with an error label instead of throwing. Frame extraction copies only
  * the SAMPLED frames' bytes — O(header + sampled frames), never a full
  * re-buffer of the video.
  */
object Video {

  /** Parsed AVI facts from the `avih` main header. */
  final case class AviMeta(width: Int, height: Int, nFrames: Int,
                           usPerFrame: Int)

  // NOTE: every chunk-walk bound check below runs in Long — a crafted size
  // near Int.MaxValue overflows an Int sum negative, passes the check, and
  // throws out of mapPartitions, violating the quarantine contract (ADVICE r16)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
  private def fourCC(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse the RIFF/AVI main header by walking the chunk list — `avih`
    * lives inside `LIST hdrl`; unknown chunks skip by size (word-aligned).
    * None = not an intact AVI container.
    */
  def parseAviHeader(bytes: Array[Byte]): Option[AviMeta] = {
    if (bytes == null || bytes.length < 24) return None
    if (fourCC(bytes, 0) != "RIFF" || fourCC(bytes, 8) != "AVI ") return None
    var i = 12
    while (i + 8 <= bytes.length) {
      val id = fourCC(bytes, i)
      val size = le32(bytes, i + 4)
      if (size < 0 || i.toLong + 8 + size > bytes.length) return None
      if (id == "LIST" && size >= 4 && fourCC(bytes, i + 8) == "hdrl") {
        // walk inside hdrl for avih
        var j = i + 12
        val end = i + 8 + size
        while (j + 8 <= end) {
          val cid = fourCC(bytes, j)
          val csize = le32(bytes, j + 4)
          if (csize < 0 || j.toLong + 8 + csize > end) return None
          if (cid == "avih" && csize >= 40)
            return Some(AviMeta(
              width = le32(bytes, j + 8 + 32),
              height = le32(bytes, j + 8 + 36),
              nFrames = le32(bytes, j + 8 + 16),
              usPerFrame = le32(bytes, j + 8)))
          j += 8 + csize + (csize & 1)
        }
        return None
      }
      i += 8 + size + (size & 1)
    }
    None
  }

  /** (offset, size) of every video frame chunk (`##dc`/`##db`) inside
    * `LIST movi`, in stream order. Empty = no movi list / malformed.
    */
  private[graft] def frameOffsets(bytes: Array[Byte]): Seq[(Int, Int)] = {
    if (bytes == null || bytes.length < 24) return Nil
    if (fourCC(bytes, 0) != "RIFF" || fourCC(bytes, 8) != "AVI ") return Nil
    var i = 12
    while (i + 8 <= bytes.length) {
      val id = fourCC(bytes, i)
      val size = le32(bytes, i + 4)
      if (size < 0 || i.toLong + 8 + size > bytes.length) return Nil
      if (id == "LIST" && size >= 4 && fourCC(bytes, i + 8) == "movi") {
        val frames = Seq.newBuilder[(Int, Int)]
        var j = i + 12
        val end = i + 8 + size
        while (j + 8 <= end) {
          val cid = fourCC(bytes, j)
          val csize = le32(bytes, j + 4)
          if (csize < 0 || j.toLong + 8 + csize > end) return Nil
          if (cid.length == 4 && cid(0).isDigit && cid(1).isDigit &&
            (cid.endsWith("dc") || cid.endsWith("db")))
            frames += ((j + 8, csize))
          j += 8 + csize + (csize & 1)
        }
        return frames.result()
      }
      i += 8 + size + (size & 1)
    }
    Nil
  }

  /** Build a spec-valid MJPEG AVI from JPEG frame payloads — the fixture
    * builder for [[sampleFrames]] tests and oracles. Every frame should be
    * a real JPEG ([[Multimodal.makeDecodable]](w, h, "jpg")).
    */
  def makeMjpegAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
                   fps: Int = 25): Array[Byte] = {
    require(fps > 0, s"fps must be positive, got $fps")
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = payload.length & 1
      val b = java.nio.ByteBuffer.allocate(8 + payload.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(id.getBytes); b.putInt(payload.length); b.put(payload)
      b.array()
    }
    def list(subtype: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(12 + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("LIST".getBytes); b.putInt(4 + payload.length)
      b.put(subtype.getBytes); b.put(payload)
      b.array()
    }
    val avih = {
      val b = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(1000000 / fps); b.putInt(0); b.putInt(0); b.putInt(0)
      b.putInt(frames.length); b.putInt(0); b.putInt(1); b.putInt(0)
      b.putInt(w); b.putInt(h)
      b.array() // reserved[4] stays zero
    }
    val strh = {
      val b = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("vids".getBytes); b.put("MJPG".getBytes)
      b.putInt(0); b.putShort(0); b.putShort(0); b.putInt(0)
      b.putInt(1); b.putInt(fps) // scale, rate
      b.putInt(0); b.putInt(frames.length)
      b.array()
    }
    val strf = {
      val b = java.nio.ByteBuffer.allocate(40)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(40); b.putInt(w); b.putInt(h)
      b.putShort(1); b.putShort(24)
      b.put("MJPG".getBytes)
      b.array()
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val moviBody = new java.io.ByteArrayOutputStream() // linear, not fold-concat
    frames.foreach(f => moviBody.write(chunk("00dc", f)))
    val movi = list("movi", moviBody.toByteArray)
    val body = "AVI ".getBytes ++ hdrl ++ movi
    val out = java.nio.ByteBuffer.allocate(8 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes); out.putInt(body.length); out.put(body)
    out.array()
  }

  /** AVI metadata as a frame: (id, width, height, n_frames, fps_millis,
    * decode_error). `fps_millis` = frames/sec × 1000, exact integer
    * (1e9 / usPerFrame DIV 1). Quarantine discipline throughout.
    */
  def decodeAviMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .filter(col(idCol).isNotNull && col(binCol).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        parseAviHeader(bytes) match {
          case Some(m) if m.usPerFrame > 0 =>
            (id, Option(m.width), Option(m.height), Option(m.nFrames.toLong),
              Option(1000000000L / m.usPerFrame), Option.empty[String])
          case _ =>
            (id, None, None, None, None,
              Option("unrecognized or truncated AVI container"))
        }
      })
      .toDF("id", "width", "height", "n_frames", "fps_millis", "decode_error")
  }

  /** Near-duplicate VIDEO pairs by perceptual frame matching — the
    * composition the real primitives make possible: sample up to
    * `sampleN` frames per video ([[sampleFrames]]), perceptual-hash each
    * frame ([[Multimodal.imageHash64]]), band-join frame hashes across
    * videos ([[Multimodal.imageNearDupPairs]]'s pigeonhole kernel), and
    * keep video pairs linked by at least `minLinks` DISTINCT near-matching
    * frame pairs (a single coincidental frame collision is not a
    * duplicated video). Frame identity rides a synthetic
    * `video_id · 1024 + sample_ordinal` key — the ORDINAL k (< sampleN <
    * 1024 by the guard), never the raw frame index, which is unbounded:
    * a video with ≥1024 frames would alias its frames into other videos'
    * id space and silently attribute matches to the wrong pair (ADVICE
    * r16). Returns (vid_a, vid_b, n_links) with vid_a < vid_b.
    *
    * Scale: inherits the band-bucket candidate bound — cost is the frame
    * sample + the frame-hash band join, never all-pairs of videos.
    */
  def videoNearDupPairs(df: DataFrame, idCol: String, binCol: String,
                        sampleN: Int = 8, maxHamming: Int = 4,
                        minLinks: Int = 2, bands: Int = 8): DataFrame = {
    require(sampleN > 0 && sampleN < 1024,
      s"sampleN must be in [1, 1023], got $sampleN")
    require(minLinks >= 1, s"minLinks must be >= 1, got $minLinks")
    val frames = sampleFramesOrdinal(df, idCol, binCol, sampleN)
      .filter(col("sample_ord").isNotNull)
      .select((col("id") * 1024 + col("sample_ord")).as("fid"),
        col("frame_bytes"))
    val hashes = Multimodal.imageHash64(frames, "fid", "frame_bytes")
    Multimodal.imageNearDupPairs(hashes, "id", "phash", maxHamming, bands)
      .select(expr("id_a DIV 1024").as("va"), col("id_a").as("fa"),
        expr("id_b DIV 1024").as("vb"), col("id_b").as("fb"))
      .filter(col("va") =!= col("vb"))
      // normalize the pair orientation to the VIDEO ids (frame-level
      // ordering interleaves across videos)
      .select(least(col("va"), col("vb")).as("vid_a"),
        greatest(col("va"), col("vb")).as("vid_b"),
        least(col("fa"), col("fb")).as("fa"),
        greatest(col("fa"), col("fb")).as("fb"))
      .groupBy("vid_a", "vid_b")
      .agg(countDistinct(col("fa"), col("fb")).as("n_links"))
      .filter(col("n_links") >= minLinks)
  }

  /** REAL frame sampling: up to `n` evenly spaced frames per video,
    * extracted as their ORIGINAL JPEG bytes (offset-sliced — only sampled
    * frames are copied). Sampled indices are `k·F DIV m` for
    * `m = min(n, F)` — strictly increasing, first frame always included.
    * Undecodable containers quarantine as a single null-frame row so no
    * video silently vanishes. Returns (id, frame_idx, frame_bytes,
    * sample_error).
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
                   n: Int): DataFrame =
    sampleFramesOrdinal(df, idCol, binCol, n)
      .select("id", "frame_idx", "frame_bytes", "sample_error")

  /** [[sampleFrames]] plus the bounded sample ordinal k (< n) each frame
    * was drawn at — the key [[videoNearDupPairs]] packs frame identity
    * with, since the raw frame index is unbounded by `n`. Returns
    * (id, sample_ord, frame_idx, frame_bytes, sample_error).
    */
  private[graft] def sampleFramesOrdinal(df: DataFrame, idCol: String,
                                         binCol: String, n: Int): DataFrame = {
    require(n > 0, s"sample count must be positive, got $n")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .filter(col(idCol).isNotNull && col(binCol).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val offsets = frameOffsets(bytes)
        if (offsets.isEmpty)
          Iterator.single((id, Option.empty[Long], Option.empty[Long],
            Option.empty[Array[Byte]],
            Option("unrecognized AVI or no MJPEG frames")))
        else {
          val f = offsets.length
          val m = math.min(n, f)
          (0 until m).iterator.map { k =>
            val idx = (k.toLong * f / m).toInt // Long mul: k·f can top Int
            val (off, size) = offsets(idx)
            (id, Option(k.toLong), Option(idx.toLong),
              Option(java.util.Arrays.copyOfRange(bytes, off, off + size)),
              Option.empty[String])
          }
        }
      })
      .toDF("id", "sample_ord", "frame_idx", "frame_bytes", "sample_error")
  }
}
