package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus partition-iterator transforms for the
  * decode/feature steps.
  *
  * The actual codec work is STUBBED (this container ships no image/audio
  * libraries): [[decodeStub]] produces a deterministic fake feature vector
  * from the bytes. Everything around it — schema, batching, partitioning,
  * output shape — is the real Spark plumbing a production decode would use,
  * and is what the tests exercise. Swap `fakeDecode` for a real codec call
  * (JNI/onnx) without touching the plan shape.
  *
  * Scale notes: decode runs via `mapPartitions` so per-partition setup
  * (codec init) amortizes across rows; binary payloads stay off the driver;
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

  private val FeatureDim = 8

  /** STUB — deterministic fake "decode + feature extraction": derives a
    * FeatureDim-float vector from the blob bytes via hashing. A real
    * implementation would decode the image/audio here; the signature,
    * batch shape, and schema are what production code would keep.
    */
  def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    var h = 1125899906842597L
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    var j = 0
    while (j < FeatureDim) {
      val hj = h ^ (0x9E3779B97F4A7C15L * (j + 1))
      out(j) = ((hj % 1000L).toFloat) / 1000.0f
      j += 1
    }
    out
  }

  /** Decode/feature-extract every blob: TYPED `Dataset.mapPartitions`, so
    * per-partition codec init amortizes across rows while the operator stays
    * inside the Dataset plan (object-serde nodes, not a severed `.rdd` →
    * `createDataFrame` round trip — column pruning above, AQE below, and
    * codegen on both sides of the serde boundary all keep working).
    * Output is (original id, features array<float>).
    */
  def decodeStub(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // rows with a NULL id or NULL blob carry nothing decodable — drop them
    // up front (the primitive (Long, Array[Byte]) encoder would otherwise
    // throw, killing the job on one bad row)
    df.select(col(idCol).cast("long"), col(binCol))
      .filter(col(idCol).isNotNull && col(binCol).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real impl: initialize codec once here
        rows.map { case (id, bytes) => (id, fakeDecode(bytes)) }
      }
      .toDF("id", "features")
  }

  /** Frame sampling stub: split the blob into `n` even chunks ("frames"),
    * emit (id, frame_idx, frame_bytes). Real video sampling keeps exactly
    * this output shape.
    */
  def frameSample(df: DataFrame, idCol: String, binCol: String, n: Int): DataFrame =
    df.select(col(idCol), posexplode(split_part_bytes(col(binCol), n))
      .as(Seq("frame_idx", "frame_bytes")))

  /** Resize stub: normalize every blob to exactly `targetBytes` (truncate
    * long payloads, zero-pad short ones) and refresh the metadata struct.
    * A real image/audio resample keeps exactly this shape — binary in,
    * fixed-budget binary out, metadata recomputed. Pure column expressions:
    * codegen'd, no shuffle, no driver involvement.
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
