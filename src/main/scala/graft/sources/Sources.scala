package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source factories — the engine's ingest surface (SURVEY §2.1).
  *
  * Kafka (S1/S2) and JDBC (S7) are thin declarative builders over Spark's
  * own connectors: the engine adds the CDC-specific defaults the reference
  * hardcodes (earliest offsets, fail-on-data-loss tolerance, explicit
  * per-partition offset positioning). NOTE: this container ships neither the
  * spark-sql-kafka nor a JDBC driver jar, so these builders are
  * compile-checked here and exercised end-to-end only where the connector
  * exists (production / MemoryStream tests cover the downstream path).
  */
object Sources {

  /** S4: parquet table scan. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JSONL (newline-delimited JSON) batch source with a dead-letter
    * quarantine: (parsed rows, rejected raw lines). Deliberately a TEXT
    * scan + codegen'd `from_json`, NOT `spark.read.json` with
    * `_corrupt_record` — Spark's corrupt-column machinery requires caching
    * the frame before the corrupt column can be filtered (a documented
    * trap that means materializing the whole source), while this pattern
    * is a single streamed pass with the same quarantine semantics the CDC
    * front door already proves ([[graft.cdc.CdcParse.parseWithDeadLetter]]).
    * Lines that are not valid JSON (or are blank/null, or parse all-null)
    * route to the quarantine with the raw text preserved. NOTE the
    * PERMISSIVE `from_json` granularity: a syntactically valid JSON line
    * whose ONE field carries type garbage (`"event_id": "oops"`) parses as
    * a good row with that field silently null — per-field type garbage is
    * NOT quarantined unless you name the fields that must type-check via
    * `requiredCols` (the same required-field rejection the CSV twin uses):
    * any line where a required field parses null then quarantines instead.
    */
  def jsonlWithDeadLetter(spark: SparkSession, path: String,
                          schema: StructType,
                          requiredCols: Seq[String] = Nil): (DataFrame, DataFrame) = {
    require(requiredCols.forall(schema.fieldNames.contains),
      s"requiredCols $requiredCols must be schema fields ${schema.fieldNames.toSeq}")
    val raw = spark.read.text(path)
    val parsed = raw.withColumn("__rec",
      when(trim(col("value")) === "", lit(null))
        .otherwise(from_json(col("value"), schema)))
    // a line whose every field is null is indistinguishable from garbage
    // under PERMISSIVE from_json — treat all-null records as rejects too
    val allNull = schema.fieldNames
      .map(f => col(s"__rec.$f").isNull).reduce(_ && _)
    val requiredNull = requiredCols
      .map(f => col(s"__rec.$f").isNull)
      .reduceOption(_ || _).getOrElse(lit(false))
    val good = parsed.filter(col("__rec").isNotNull && !allNull && !requiredNull)
      .select(col("__rec.*"))
    val bad = parsed.filter(col("__rec").isNull || allNull || requiredNull)
      .select(col("value").as("raw_value"))
    (good, bad)
  }

  /** CSV batch source with a dead-letter quarantine — same single-pass
    * text + `from_csv` pattern as [[jsonlWithDeadLetter]] (and the same
    * reason: the `_corrupt_record` route needs a full materialization).
    * `from_csv` under PERMISSIVE turns untypeable fields into nulls, so
    * rejection is by REQUIRED-FIELD nullness: a line whose `requiredCols`
    * parse null (type garbage, too few fields, blank) quarantines with
    * the raw text. Choose required columns that are never null in valid
    * data (keys).
    */
  def csvWithDeadLetter(spark: SparkSession, path: String,
                        schema: StructType, requiredCols: Seq[String],
                        options: Map[String, String] = Map.empty): (DataFrame, DataFrame) = {
    require(requiredCols.nonEmpty && requiredCols.forall(schema.fieldNames.contains),
      s"requiredCols $requiredCols must be schema fields ${schema.fieldNames.toSeq}")
    val raw = spark.read.text(path)
    val parsed = raw.withColumn("__rec",
      from_csv(col("value"), schema, options))
    val invalid = requiredCols.map(f => col(s"__rec.$f").isNull).reduce(_ || _)
    val good = parsed.filter(col("__rec").isNotNull && !invalid).select(col("__rec.*"))
    val bad = parsed.filter(col("__rec").isNull || invalid)
      .select(col("value").as("raw_value"))
    (good, bad)
  }

  /** S1-alternative: STREAMING text-file source — the "drop envelope
    * dumps in a directory" ingest channel, and the one streaming source
    * this environment can run END-TO-END (no Kafka jar ships here; the
    * Kafka builders below stay compile-checked). Each line is a raw
    * envelope exactly like a Kafka `value`, so the stream plugs straight
    * into [[graft.streaming.Ingest.drainAvailableRaw]] /
    * [[graft.streaming.Ingest.applyRawBatchEvolving]] — checkpoint tracks
    * WHICH FILES are consumed (the file-source analog of offsets), so a
    * restart resumes with only new files.
    *
    * `maxFilesPerTrigger` bounds each micro-batch; note the file ORDER
    * across triggers follows source listing, so only order-insensitive
    * downstreams (idempotent merges keyed on a total order, appends)
    * should rely on multi-trigger splits.
    */
  def textFileStream(spark: SparkSession, dir: String,
                     maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.text(dir)
  }

  /** Multimodal FILE ingest: whole files as rows — (path, modificationTime,
    * length, content binary) via Spark's `binaryFile` source. This is how
    * image/audio corpora actually arrive (a directory of media files, not
    * rows in a table); the loaded frame feeds
    * [[graft.ops.Multimodal]] directly (metadata without deserializing
    * blobs, chunk fingerprints, stub decode). Column pruning applies: a
    * metadata-only query never reads `content` bytes. Use `glob` to scope
    * (e.g. `*.jpg`); files over `spark.sql.files.maxPartitionBytes` stay
    * one-row-per-file (the source never splits a blob).
    */
  def binaryFiles(spark: SparkSession, dir: String,
                  glob: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
    glob.foreach(g => r.option("pathGlobFilter", g))
    r.load(dir)
  }

  /** STREAMING multimodal file ingest — [[binaryFiles]] as a stream: new
    * media files under `dir` arrive as (path, modificationTime, length,
    * content) rows, the checkpoint tracks WHICH FILES are consumed (the
    * file-source offset analog), and a restart resumes with only new
    * files. The per-batch frame feeds the media operators directly —
    * decode headers, resize, perceptual-hash index maintenance
    * ([[graft.ops.Multimodal.indexImageHashes]] in `foreachBatch`) — which
    * is how a growing image/audio corpus is actually indexed: files land,
    * the maintained band table absorbs each batch, probes stay O(batch).
    * File schemas are fixed by the source, declared here explicitly (file
    * streams do not infer).
    */
  def binaryFileStream(spark: SparkSession, dir: String,
                       glob: Option[String] = None,
                       maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    val r = spark.readStream.format("binaryFile").schema(schema)
    glob.foreach(g => r.option("pathGlobFilter", g))
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.load(dir)
  }

  /** S1: streaming Kafka source (checkpoint owns offsets — replaces the
    * reference's hand-rolled poll loop, spark_batch.py:304-406).
    */
  def kafkaStream(spark: SparkSession, bootstrap: String, topic: String,
                  startingOffsets: String = "earliest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .option("failOnDataLoss", "false")
      .load()

  /** S2: bounded Kafka replay with explicit offset positioning — the batch
    * twin used for backfill (reference: consumer.assign(offset+1),
    * spark_exactly_once.py:564-597). Offsets are JSON like
    * {"topic":{"0":42,"1":17}}; LONG offsets by design (the reference's INT
    * is a latent overflow, SURVEY §7.4.2).
    */
  def kafkaBatch(spark: SparkSession, bootstrap: String, topic: String,
                 startingOffsets: String, endingOffsets: String = "latest"): DataFrame =
    spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .option("endingOffsets", endingOffsets)
      .load()

  /** S7: JDBC comparison scan (the validation suite's Postgres side,
    * validation.py:221-280) — predicate pushdown and partitioned reads via
    * Spark's JDBC source instead of a driver-side psycopg2 cursor.
    */
  def jdbc(spark: SparkSession, url: String, table: String,
           partitionColumn: Option[String] = None,
           numPartitions: Int = 8,
           bounds: Option[(Long, Long)] = None): DataFrame = {
    // half-specified partitioning would silently fall back to ONE jdbc task
    // reading the whole table — the exact bottleneck this helper exists to
    // avoid; fail loudly instead
    require(partitionColumn.isDefined == bounds.isDefined,
      "jdbc partitioned read needs BOTH partitionColumn and bounds (or neither)")
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    val partitioned = (partitionColumn, bounds) match {
      case (Some(c), Some((lo, hi))) => base
        .option("partitionColumn", c)
        .option("lowerBound", lo.toString)
        .option("upperBound", hi.toString)
        .option("numPartitions", numPartitions.toString)
      case _ => base
    }
    partitioned.load()
  }
}
