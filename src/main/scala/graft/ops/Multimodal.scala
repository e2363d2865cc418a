package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus partition-iterator transforms for the
  * decode/feature steps.
  *
  * The header decode is REAL: [[parseMediaHeader]] reads PNG/JPEG/GIF
  * dimensions from the container bytes (pure JVM — the published byte
  * layouts need no codec library), and [[decodeHeaders]] runs it as the
  * typed-Dataset mapPartitions operator a production pipeline would use,
  * quarantining malformed blobs instead of throwing. IMAGE pixel work is
  * real too: [[resize]] decodes/rescales/re-encodes through the JDK's own
  * `javax.imageio` codecs. Only non-image media (audio/video resampling)
  * keeps a byte-budget stand-in ([[resizeStub]]) — those codecs the
  * container genuinely does not ship.
  *
  * Scale notes: decode runs via `mapPartitions` so per-partition setup
  * amortizes across rows; header parsing touches O(header) bytes per blob
  * and never decompresses; binary payloads stay off the driver;
  * metadata-only queries never deserialize the blob (column pruning drops
  * the binary column at the scan).
  */
object Multimodal {

  /** Typed metadata carried next to every blob. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum64", LongType)))

  /** Wrap a text/binary source column as (media binary, media_meta struct).
    * Stand-in for ingesting real image/audio bytes.
    */
  def attachBinary(df: DataFrame, srcCol: String, mime: String): DataFrame = {
    val bin = encode(col(srcCol), "UTF-8")
    df.withColumn("media", bin)
      .withColumn("media_meta", struct(
        lit(mime).as("mime"),
        octet_length(bin).cast("long").as("n_bytes"),
        xxhash64(bin).as("checksum64")))
  }

  // ---- real container-header decode (pure JVM, no codec libraries) -------
  //
  // PNG, JPEG and GIF all publish their dimensions in the first bytes of
  // the container — parsing them needs no pixel codec, just the published
  // byte layouts (PNG: RFC 2083 §4.1.1 IHDR; JPEG: ITU T.81 SOFn segment;
  // GIF: the 89a/87a logical screen descriptor). This is the metadata a
  // 100 TB media pipeline extracts at ingest: it reads O(header) bytes per
  // blob, never decompresses, and never throws — malformed bytes yield a
  // quarantine row, the dead-letter discipline every other source here has.

  /** Parsed header: (mime, width, height). None = not a recognized/intact
    * container — the caller's quarantine case.
    */
  def parseMediaHeader(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    if (bytes == null) return None
    parsePng(bytes).map(("image/png", _)).orElse(
      parseJpeg(bytes).map(("image/jpeg", _))).orElse(
      parseGif(bytes).map(("image/gif", _)))
      .map { case (m, (w, h)) => (m, w, h) }
  }

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)

  private val PngSig =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** PNG: 8-byte signature, then the IHDR chunk MUST come first (length 13,
    * type "IHDR", width/height as 31-bit big-endian ints). Truncated or
    * out-of-spec dimensions (0, or above 2^31-1) parse as None.
    */
  private def parsePng(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 24 || !b.take(8).sameElements(PngSig)) return None
    if (be32(b, 8) != 13L) return None // first chunk length must be IHDR's 13
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val w = be32(b, 16); val h = be32(b, 20)
    if (w < 1 || h < 1 || w > Int.MaxValue || h > Int.MaxValue) None
    else Some((w.toInt, h.toInt))
  }

  /** JPEG: SOI (FF D8) then a marker-segment walk — every non-standalone
    * segment carries a 2-byte big-endian length (inclusive); dimensions
    * live in the first SOFn frame header (precision, height, width). C4
    * (DHT), C8 (JPG) and CC (DAC) share the Cx range but are NOT frame
    * headers. Reaching SOS/EOI without a SOFn, a broken marker stream, or
    * running off the buffer all parse as None.
    */
  private def parseJpeg(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || b(0) != 0xFF.toByte || b(1) != 0xD8.toByte) return None
    var i = 2
    while (i + 3 < b.length) {
      if (b(i) != 0xFF.toByte) return None
      val m = b(i + 1) & 0xFF
      if (m == 0xFF) i += 1 // fill byte before a marker
      else if (m == 0x01 || (m >= 0xD0 && m <= 0xD8)) i += 2 // standalone
      else {
        val segLen = be16(b, i + 2)
        if (segLen < 2) return None
        val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
        if (isSof) {
          if (i + 8 >= b.length || segLen < 7) return None
          val h = be16(b, i + 5); val w = be16(b, i + 7)
          return if (w < 1 || h < 1) None else Some((w, h))
        }
        if (m == 0xD9 || m == 0xDA) return None // EOI/SOS before any SOFn
        i += 2 + segLen
      }
    }
    None
  }

  /** GIF: "GIF87a"/"GIF89a" then the logical screen descriptor's
    * little-endian 16-bit width and height.
    */
  private def parseGif(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 10) return None
    val sig = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val w = (b(6) & 0xFF) | ((b(7) & 0xFF) << 8)
    val h = (b(8) & 0xFF) | ((b(9) & 0xFF) << 8)
    if (w < 1 || h < 1) None else Some((w, h))
  }

  /** Decode every blob's container header: TYPED `Dataset.mapPartitions`,
    * so per-partition setup amortizes across rows while the operator stays
    * inside the Dataset plan (object-serde nodes, not a severed `.rdd` →
    * `createDataFrame` round trip — column pruning above, AQE below, and
    * codegen on both sides of the serde boundary all keep working).
    * Output is (id, mime, width, height, decode_error): a recognized
    * header fills mime/width/height; anything malformed/truncated/unknown
    * QUARANTINES (null media columns + the error label) instead of
    * throwing — one bad blob must never kill a 100 TB ingest job.
    */
  def decodeHeaders(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // rows with a NULL id or NULL blob carry nothing decodable — drop them
    // up front (the primitive (Long, Array[Byte]) encoder would otherwise
    // throw, killing the job on one bad row)
    df.select(col(idCol).cast("long"), col(binCol))
      .filter(col(idCol).isNotNull && col(binCol).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          parseMediaHeader(bytes) match {
            case Some((m, w, h)) =>
              (id, Option(m), Option(w), Option(h), Option.empty[String])
            case None =>
              (id, Option.empty[String], Option.empty[Int], Option.empty[Int],
                Option("unrecognized or truncated media container"))
          }
        }
      }
      .toDF("id", "mime", "width", "height", "decode_error")
  }

  // ---- deterministic container builders (fixtures/tests) -----------------
  // Minimal but SPEC-VALID containers: real signatures, real segment
  // layouts, CRC computed for PNG — what a planted-fixture test needs to
  // prove the parser reads genuine structure rather than echoing inputs.

  /** A minimal spec-valid PNG: signature, IHDR (with a real CRC32), IEND. */
  def makePng(w: Int, h: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(8 + 25 + 12)
    buf.put(PngSig)
    val ihdr = java.nio.ByteBuffer.allocate(17)
    ihdr.put("IHDR".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    ihdr.putInt(w); ihdr.putInt(h)
    ihdr.put(8.toByte)  // bit depth
    ihdr.put(2.toByte)  // color type: truecolor
    ihdr.put(0.toByte); ihdr.put(0.toByte); ihdr.put(0.toByte)
    val crc = new java.util.zip.CRC32
    crc.update(ihdr.array())
    buf.putInt(13); buf.put(ihdr.array()); buf.putInt(crc.getValue.toInt)
    val iend = "IEND".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val crcEnd = new java.util.zip.CRC32
    crcEnd.update(iend)
    buf.putInt(0); buf.put(iend); buf.putInt(crcEnd.getValue.toInt)
    buf.array()
  }

  /** A minimal JPEG: SOI, a JFIF APP0 (which the parser must SKIP by its
    * length), a single-component SOF0 carrying the dimensions, EOI.
    */
  def makeJpeg(w: Int, h: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(2 + 18 + 13 + 2)
    buf.put(0xFF.toByte); buf.put(0xD8.toByte)                 // SOI
    buf.put(0xFF.toByte); buf.put(0xE0.toByte); buf.putShort(16) // APP0 len 16
    buf.put("JFIF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    buf.put(Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    buf.put(0xFF.toByte); buf.put(0xC0.toByte); buf.putShort(11) // SOF0 len 11
    buf.put(8.toByte)                                            // precision
    buf.putShort(h.toShort); buf.putShort(w.toShort)
    buf.put(1.toByte)                                            // 1 component
    buf.put(1.toByte); buf.put(0x11.toByte); buf.put(0.toByte)
    buf.put(0xFF.toByte); buf.put(0xD9.toByte)                 // EOI
    buf.array()
  }

  /** A minimal GIF89a: signature + logical screen descriptor + trailer. */
  def makeGif(w: Int, h: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(6 + 7 + 1)
    buf.put("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    buf.put((w & 0xFF).toByte); buf.put(((w >> 8) & 0xFF).toByte)
    buf.put((h & 0xFF).toByte); buf.put(((h >> 8) & 0xFF).toByte)
    buf.put(0.toByte); buf.put(0.toByte); buf.put(0.toByte)
    buf.put(0x3B.toByte) // trailer
    buf.array()
  }

  /** Frame sampling stub: split the blob into `n` even chunks ("frames"),
    * emit (id, frame_idx, frame_bytes). Real video sampling keeps exactly
    * this output shape.
    */
  def frameSample(df: DataFrame, idCol: String, binCol: String, n: Int): DataFrame =
    df.select(col(idCol), posexplode(split_part_bytes(col(binCol), n))
      .as(Seq("frame_idx", "frame_bytes")))

  /** REAL pixel resize via the JDK's own codecs (`javax.imageio` — zero
    * new dependencies): decode PNG/JPEG/GIF pixels, bilinear-rescale into
    * the `targetW`×`targetH` box with Graphics2D, re-encode as PNG (the
    * JDK's PNG writer is deterministic for a given raster). Keeps
    * [[decodeHeaders]]' operator shape — typed-Dataset mapPartitions,
    * blobs never on the driver, ImageIO's temp-file cache disabled per
    * partition — and its quarantine discipline: a blob ImageIO cannot
    * decode (corrupt bytes, or a header-only container with no pixel
    * data) yields a null payload + error label, never a thrown job.
    *
    * The emitted width/height/mime are RE-PARSED from the produced PNG by
    * [[parseMediaHeader]] — the output validates itself against the
    * header parser instead of echoing the requested box back.
    *
    * Returns (id, media: binary, mime, width, height, resize_error).
    */
  def resize(df: DataFrame, idCol: String, binCol: String,
             targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0,
      s"resize target must be positive, got ${targetW}x$targetH")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .filter(col(idCol).isNotNull && col(binCol).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // stream, no executor temp files
        rows.map { case (id, bytes) =>
          val decoded =
            try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes)))
            catch { case scala.util.control.NonFatal(_) => None }
          decoded match {
            case Some(img) =>
              val out = new java.awt.image.BufferedImage(targetW, targetH,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, targetW, targetH, null)
              g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              val png = bos.toByteArray
              val hdr = parseMediaHeader(png) // self-validate the output
              (id, Option(png), hdr.map(_._1), hdr.map(_._2), hdr.map(_._3),
                if (hdr.isDefined) Option.empty[String]
                else Option("re-encoded PNG failed its own header parse"))
            case None =>
              (id, Option.empty[Array[Byte]], Option.empty[String],
                Option.empty[Int], Option.empty[Int],
                Option("ImageIO could not decode pixel data"))
          }
        }
      }
      .toDF("id", "media", "mime", "width", "height", "resize_error")
  }

  /** 64-bit DIFFERENCE HASH (dHash) over real pixels — the standard
    * perceptual image fingerprint: decode (any of the JDK's containers),
    * bilinear-rescale to a 9×8 luma grid, one bit per horizontally
    * adjacent cell pair (`luma(x,y) > luma(x+1,y)`). Robust to container
    * re-encodes and global brightness shifts (both preserve adjacent-cell
    * ORDER — bilinear is linear, so a uniform shift moves every resampled
    * value equally), which byte-level fingerprints
    * ([[chunkFingerprints]]) cannot see past. Integer luma
    * (299r+587g+114b)/1000 — bit-reproducible everywhere.
    *
    * Same operator shape as [[resize]]: typed mapPartitions, blobs off
    * the driver, undecodable bytes quarantine with an error label.
    * Returns (id, phash: long, hash_error).
    */
  def imageHash64(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .filter(col(idCol).isNotNull && col(binCol).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes) =>
          val decoded =
            try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes)))
            catch { case scala.util.control.NonFatal(_) => None }
          decoded match {
            case Some(img) =>
              val grid = new java.awt.image.BufferedImage(9, 8,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = grid.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, 9, 8, null)
              g.dispose()
              def luma(x: Int, y: Int): Int = {
                val p = grid.getRGB(x, y)
                (299 * ((p >> 16) & 0xFF) + 587 * ((p >> 8) & 0xFF) +
                  114 * (p & 0xFF)) / 1000
              }
              var bits = 0L
              var k = 0
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  if (luma(x, y) > luma(x + 1, y)) bits |= (1L << k)
                  k += 1; x += 1
                }
                y += 1
              }
              (id, Option(bits), Option.empty[String])
            case None =>
              (id, Option.empty[Long],
                Option("ImageIO could not decode pixel data"))
          }
        }
      }
      .toDF("id", "phash", "hash_error")
  }

  /** Near-duplicate image PAIRS by banded Hamming join over [[imageHash64]]
    * fingerprints — the MinHash-band trick applied to perceptual hashes:
    * the 64-bit hash splits into `bands` equal slices, and by pigeonhole
    * two hashes within Hamming distance `maxHamming` < `bands` must agree
    * on at least one whole band, so candidate generation is a BAND
    * EQUI-JOIN (the exact-dedup shuffle shape — never all-pairs), followed
    * by the exact `bit_count(xor)` filter. Quarantined rows (null hash)
    * never pair. Returns (id_a, id_b, hamming) with id_a < id_b, distinct.
    *
    * Scale: candidates are bounded by per-band bucket collisions, exactly
    * like LSH near-dup over text shingles; a degenerate corpus of
    * near-identical images concentrates buckets the same way a duplicated
    * shingle does — cap upstream with exact-dup removal first
    * (identical bytes need no perceptual pass).
    */
  def imageNearDupPairs(hashes: DataFrame, idCol: String, hashCol: String,
                        maxHamming: Int, bands: Int = 8): DataFrame = {
    require(bands > 0 && 64 % bands == 0,
      s"bands must divide 64, got $bands")
    require(maxHamming >= 0 && maxHamming < bands,
      s"the pigeonhole guarantee needs maxHamming < bands " +
        s"(got $maxHamming >= $bands); raise bands or lower the radius")
    val w = 64 / bands
    val mask = if (w == 64) -1L else (1L << w) - 1L
    // checkpoint the band rows BEFORE the self-join: both join sides would
    // otherwise recompute the hash lineage — for image/audio/video hashes
    // that lineage DECODES the payloads, so an uncheckpointed self-join
    // decodes the whole corpus twice. Band rows are `bands` fixed-width
    // longs per item (~tens of bytes) — nothing next to the payloads.
    val banded = hashes
      .filter(col(hashCol).isNotNull)
      .select(col(idCol).as("__id"), col(hashCol).as("__h"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => call_function("shiftright", col(hashCol), b * lit(w))
            .bitwiseAND(lit(mask))))
          .as(Seq("__band", "__bv")))
      .localCheckpoint(true)
    val a = banded.select(col("__band"), col("__bv"),
      col("__id").as("id_a"), col("__h").as("__ha"))
    val b = banded.select(col("__band"), col("__bv"),
      col("__id").as("id_b"), col("__h").as("__hb"))
    a.join(b, Seq("__band", "__bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(__ha ^ __hb)").cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  // ---- incremental perceptual-hash index ---------------------------------
  //
  // [[graft.ops.FuzzyDedup.indexSimhash]]'s pattern for the IMAGE modality:
  // one maintained table of (b, bv, id) band-bucket rows with the full
  // 64-bit dHash riding along as a value column (Hamming verify needs no
  // image bytes, so no blob store). Bands are FIXED at 8 × 8 bits — the
  // band layout is the index's on-disk contract, exactly like SimHash's
  // four quarters; by pigeonhole the probe's recall guarantee covers any
  // radius ≤ 7. Keyed (b, bv, id), bucketed by (b, bv): a probe batch's
  // bands prune the read to their touched buckets, O(batch) as the corpus
  // grows. Same immutability assumption as the text indexes: a changed
  // image's old bands stay behind under the same id — treat images as
  // immutable or unindex-then-index.

  private val PhashBands = 8
  private val PhashBandWidth = 64 / PhashBands

  /** (b, bv, id, phash) band rows of a hashed batch; null hashes
    * (quarantined blobs) contribute nothing.
    */
  private def phashBandRows(hashes: DataFrame): DataFrame =
    hashes.filter(col("phash").isNotNull)
      .select(col("id"), col("phash"), posexplode(
        transform(sequence(lit(0), lit(PhashBands - 1)),
          b => call_function("shiftright", col("phash"), b * lit(PhashBandWidth))
            .bitwiseAND(lit((1L << PhashBandWidth) - 1))))
        .as(Seq("b", "bv")))
      .select(col("b"), col("bv"), col("id"), col("phash"))

  /** Fold a batch of images into the maintained perceptual-hash index.
    * Undecodable blobs quarantine OUT of the index (they have no hash to
    * stand behind) — count them upstream via [[imageHash64]] if takedown
    * bookkeeping needs the misses.
    */
  def indexImageHashes(bandTable: graft.cdc.KeyedParquetTable,
                       batch: DataFrame, idCol: String, binCol: String): Unit = {
    require(bandTable.keys == Seq("b", "bv", "id") &&
      bandTable.bucketKeys == Seq("b", "bv"),
      s"bandTable must be keyed (b, bv, id) and bucketed by (b, bv); " +
        s"got keys=${bandTable.keys} buckets=${bandTable.bucketKeys}")
    val rows = phashBandRows(imageHash64(batch, idCol, binCol))
    bandTable.createIfNotExists(rows.schema)
    bandTable.merge(rows.withColumn("operation", lit("u")))
  }

  /** Remove images from the maintained index ([[indexImageHashes]]'s
    * takedown half). The band table stores no blobs, so the removal batch
    * carries the images (id + bytes — the shape takedown requests arrive
    * in): their band rows recompute to exactly the index-time (b, bv, id)
    * keys, deleted merge-on-read. O(removed batch), never O(corpus); with
    * [[indexImageHashes]] this is also the image-update path.
    */
  def unindexImageHashes(bandTable: graft.cdc.KeyedParquetTable,
                         removed: DataFrame, idCol: String, binCol: String): Unit = {
    require(bandTable.keys == Seq("b", "bv", "id"),
      s"bandTable must be keyed (b, bv, id); got ${bandTable.keys}")
    bandTable.deleteKeys(phashBandRows(imageHash64(removed, idCol, binCol))
      .select("b", "bv", "id"))
  }

  /** Perceptual near-dup pairs between a candidate batch and the corpus
    * indexed by [[indexImageHashes]]: band-bucket probe (bucket-pruned
    * read via `readForKeys`), exact Hamming verify on the stored hashes.
    * Returns (id_a = candidate id, id_b = indexed id, hamming), distinct.
    */
  def checkImageNearDups(bandTable: graft.cdc.KeyedParquetTable,
                         candidates: DataFrame, idCol: String, binCol: String,
                         maxHamming: Int = 4): DataFrame = {
    require(maxHamming >= 0 && maxHamming < PhashBands,
      s"8-band bucketing guarantees recall only for maxHamming <= 7, got $maxHamming")
    // localCheckpoint: drives the probe's bucket computation AND the join
    val cand = phashBandRows(imageHash64(candidates, idCol, binCol))
      .select(col("id").as("id_a"), col("phash").as("__pa"), col("b"), col("bv"))
      .localCheckpoint(true)
    val indexed = bandTable.readForKeys(cand.select("b", "bv"))
      .select(col("b"), col("bv"), col("id").as("id_b"), col("phash").as("__pb"))
    cand.join(indexed, Seq("b", "bv"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(__pa ^ __pb)").cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** A deterministic BLOCK-PATTERN image fixture for perceptual-hash
    * tests: a 72×64 raster of 8×8-pixel constant-luma blocks laid out on
    * the dHash 9×8 grid, block lumas a group-seeded PERMUTATION spaced 3
    * gray levels apart (no adjacent ties — re-encodes and uniform shifts
    * cannot flip a comparison). `lumaShift` brightens every block equally
    * (≤ 16 stays clamp-free), exercising dHash's shift invariance.
    */
  def makeBlockImage(group: Long, format: String, lumaShift: Int = 0): Array[Byte] = {
    require(lumaShift >= 0 && lumaShift <= 16, s"lumaShift 0..16, got $lumaShift")
    // splitmix64 finalizer (Vigna, public domain): a bare linear hash of
    // (group, k) sorts as a shifted arithmetic progression, making every
    // group's rank layout nearly identical — full avalanche is what makes
    // distinct groups land ~24 bits apart in the dHash domain
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val order = (0 until 72).sortBy(k => mix(group * 72 + k))
    val lumaOf = new Array[Int](72)
    order.zipWithIndex.foreach { case (block, rank) =>
      lumaOf(block) = 3 * rank + lumaShift // 0..213 (+shift ≤ 229): clamp-free
    }
    val img = new java.awt.image.BufferedImage(72, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 64) {
      var x = 0
      while (x < 72) {
        val l = lumaOf((y / 8) * 9 + (x / 8))
        img.setRGB(x, y, (l << 16) | (l << 8) | l)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** A DECODABLE image fixture: a deterministic gradient raster encoded by
    * the JDK's own writer in the requested container (`"png"`, `"jpg"`,
    * `"gif"`) — what [[resize]] tests plant where the header-only builders
    * above (no pixel data) would quarantine.
    */
  def makeDecodable(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, (x * 37 + y * 101) & 0xFFFFFF); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** Resize stub: normalize every blob to exactly `targetBytes` (truncate
    * long payloads, zero-pad short ones) and refresh the metadata struct.
    * The byte-budget stand-in for NON-image media (audio/video need codecs
    * this container does not ship); images have the real pixel path in
    * [[resize]]. Pure column expressions: codegen'd, no shuffle, no driver
    * involvement.
    */
  def resizeStub(df: DataFrame, binCol: String, mime: String,
                 targetBytes: Int): DataFrame = {
    val resized = rpad(col(binCol).substr(lit(1), lit(targetBytes)),
      targetBytes, Array(0.toByte))
    df.withColumn(binCol, resized)
      .withColumn("media_meta", struct(
        lit(mime).as("mime"),
        octet_length(col(binCol)).cast("long").as("n_bytes"),
        xxhash64(col(binCol)).as("checksum64")))
  }

  /** Even byte-range chunks of a binary column as array<binary>.
    * Chunk size is computed with INTEGER ceil-division — Column `/` is
    * double division, and a fractional chunk width makes frame starts
    * drift and skip bytes at some lengths.
    */
  private def split_part_bytes(bin: org.apache.spark.sql.Column, n: Int) = {
    val len = octet_length(bin)
    val chunk = floor((len + n - 1) / n).cast("int")
    transform(sequence(lit(0), lit(n - 1)),
      i => bin.substr((i * chunk + 1).cast("int"), chunk))
  }

  /** Fixed-window chunk fingerprints over an opaque binary column — the
    * media analog of text shingle hashing: `window`-byte ALIGNED slices,
    * md5 over the hex of each slice (hex first so the digest input is a
    * deterministic string on every engine). Aligned windows catch the
    * dominant media-dup cases — identical files, shared containers and
    * headers, repeated segments — at scan speed with pure column ops;
    * content-defined chunking would add shift-resistance at the cost of a
    * per-byte rolling pass. Empty blobs yield an empty array (guarded:
    * `sequence(0, -1)` would DESCEND, not return empty).
    */
  def chunkFingerprints(bin: org.apache.spark.sql.Column,
                        window: Int): org.apache.spark.sql.Column = {
    require(window >= 1, s"window must be >= 1, got $window")
    // hex FIRST, then slice the hex string (2 chars/byte): byte-exact
    // windows, and string slicing is the one form every engine supports
    // on binary-derived data (SQL substring over BLOB is not portable)
    val h = hex(bin)
    val w2 = window * 2
    val nChunks = ceil(length(h).cast("double") / w2).cast("int")
    val starts = when(length(h) === 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), nChunks - 1))
    transform(starts, i => md5(h.substr(i * w2 + 1, lit(w2))))
  }

  /** Per-item binary near-dup degree: for each row, how many OTHER items
    * share at least one chunk fingerprint — the screening stat a media
    * dedup pass thresholds on. One distinct-explode + one equi-self-join
    * on the fingerprint (the exact-dedup shuffle shape, never a
    * cartesian) + one count; items sharing nothing report 0 via the
    * left join back. The fingerprint array — hex of the whole blob +
    * per-window md5, the dominant CPU cost on large media — is computed
    * ONCE per row and materialized (Catalyst does no cross-branch CSE, so
    * the three plan references — both self-join sides and `n_chunks` —
    * would each re-decode the blobs otherwise); the materialized frame
    * holds only (id, md5 array), a tiny fraction of the blob bytes.
    */
  def binaryDupDegree(df: DataFrame, idCol: String, binCol: String,
                      window: Int): DataFrame = {
    val withFps = df.select(col(idCol),
      array_distinct(chunkFingerprints(col(binCol), window)).as("__fps"))
      .localCheckpoint(true)
    val fps = withFps.select(col(idCol).as("__id"),
      explode(col("__fps")).as("__fp"))
    val other = fps.select(col("__id").as("__id2"), col("__fp"))
    val degrees = fps.join(other, "__fp")
      .where(col("__id") =!= col("__id2"))
      .groupBy("__id")
      .agg(countDistinct("__id2").as("dup_degree"))
    withFps.select(col(idCol), size(col("__fps")).cast("long").as("n_chunks"))
      .join(degrees.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .withColumn("dup_degree", coalesce(col("dup_degree"), lit(0L)))
  }
}
