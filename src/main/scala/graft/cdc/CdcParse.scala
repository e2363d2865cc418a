package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Debezium envelope parsing, operation classification, and enrichment —
  * the ingest front door, as executor-side column expressions.
  *
  * The reference does all of this in driver-side Python, record at a time
  * (`/root/reference/src/processor/spark_batch.py:118-244`). Here the same
  * semantics are `from_json` + `when/otherwise` + date functions: fully
  * codegen'd, distributed, and (because the plan is declarative) subject to
  * Catalyst column pruning — at 100 TB the scan only reads the `value` bytes.
  */
object CdcParse {

  /** Parse raw message bytes/strings into payload columns and drop invalid
    * messages.
    *
    * Validity rules mirror `process_kafka_message`
    * (`spark_batch.py:118-190`): reject null values, empty strings, the
    * literal `"empty"` sentinel, unparseable JSON, and envelopes without a
    * payload. `from_json` runs PERMISSIVE, so malformed JSON surfaces as a
    * null struct and is filtered — same end state as the reference's
    * try/except-continue, without a driver loop.
    *
    * @param raw      frame holding one message per row
    * @param valueCol column with the JSON envelope (string or binary)
    */
  def parseEnvelope(raw: DataFrame, valueCol: String = "value",
                    schema: org.apache.spark.sql.types.StructType = CdcModel.envelopeSchema): DataFrame = {
    requireNoShadow(valueCol, schema)
    val asString = col(valueCol).cast("string")
    raw
      .withColumn("__envelope",
        when(asString.isNull || asString === "" || asString === "empty", lit(null))
          .otherwise(from_json(asString, schema)))
      .filter(col("__envelope").isNotNull && col("__envelope.payload").isNotNull)
      .select(col("*"), col("__envelope.payload.*"))
      .drop("__envelope", valueCol)
  }

  /** The parse paths end with `.drop(valueCol)`, and Spark's drop-by-name
    * removes EVERY column with that name — so a payload field named like
    * the raw column would be silently destroyed after the `payload.*`
    * expansion (a text-file source's default "value" column against a CDC
    * payload carrying a "value" field is the live case). Refuse loudly;
    * the caller renames the raw column (the `__raw` convention).
    */
  private def requireNoShadow(valueCol: String,
                              schema: org.apache.spark.sql.types.StructType): Unit = {
    val payloadFields = schema("payload").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
    require(!payloadFields.contains(valueCol),
      s"payload field '$valueCol' shadows the raw value column — rename the " +
        s"raw column (e.g. to __raw) before parsing")
  }

  /** Parse with a dead-letter channel: returns (valid, rejected). The
    * reference silently drops invalid messages (try/except-continue,
    * `spark_batch.py:152-190`); routing them to a quarantine table instead
    * preserves them for replay/debugging — at scale, silent drops are
    * unauditable data loss.
    */
  def parseWithDeadLetter(raw: DataFrame, valueCol: String = "value",
                          schema: org.apache.spark.sql.types.StructType = CdcModel.envelopeSchema)
      : (DataFrame, DataFrame) = {
    requireNoShadow(valueCol, schema)
    val asString = col(valueCol).cast("string")
    val withEnv = raw.withColumn("__envelope",
      when(asString.isNull || asString === "" || asString === "empty", lit(null))
        .otherwise(from_json(asString, schema)))
    val valid = withEnv
      .filter(col("__envelope").isNotNull && col("__envelope.payload").isNotNull)
      .select(col("*"), col("__envelope.payload.*"))
      .drop("__envelope", valueCol)
    val rejected = withEnv
      .filter(col("__envelope").isNull || col("__envelope.payload").isNull)
      .select(asString.as("raw_value"), current_timestamp().as("rejected_at"))
    (valid, rejected)
  }

  /** [[parseWithDeadLetter]] plus an Observation of the quarantine volume:
    * the observe node sits BEFORE the validity filter on the valid side's
    * plan, so the FIRST action on the valid frame (the ingest merge) also
    * yields `n_raw` / `n_malformed` — per-batch dead-letter metrics at zero
    * extra scans (same Observation-API pattern as
    * [[graft.validate.Validation.observedStats]]). `obs.get` blocks until
    * that action runs; an Observation is single-use, so callers create one
    * per micro-batch (as [[graft.streaming.Ingest.applyRawBatch]] does).
    */
  def parseWithDeadLetterObserved(raw: DataFrame, valueCol: String = "value",
                                  schema: org.apache.spark.sql.types.StructType = CdcModel.envelopeSchema)
      : (DataFrame, DataFrame, org.apache.spark.sql.Observation) = {
    requireNoShadow(valueCol, schema)
    val asString = col(valueCol).cast("string")
    val obs = org.apache.spark.sql.Observation()
    val isMalformed = col("__envelope").isNull || col("__envelope.payload").isNull
    val withEnv = raw.withColumn("__envelope",
        when(asString.isNull || asString === "" || asString === "empty", lit(null))
          .otherwise(from_json(asString, schema)))
      .observe(obs,
        count(lit(1)).as("n_raw"),
        sum(when(isMalformed, 1L).otherwise(0L)).as("n_malformed"))
    val valid = withEnv
      .filter(!isMalformed)
      .select(col("*"), col("__envelope.payload.*"))
      .drop("__envelope", valueCol)
    val rejected = withEnv
      .filter(isMalformed)
      .select(asString.as("raw_value"), current_timestamp().as("rejected_at"))
    (valid, rejected, obs)
  }

  /** Operation classifier (`determine_operation`, `spark_batch.py:101-116`):
    * `__deleted == 'true'` → 'd'; missing id → 'c'; otherwise 'u'.
    * Kept bug-compatible on purpose: Debezium rewrite payloads always carry
    * an id, so 'c' is effectively unreachable (SURVEY.md §7.4.4) — merge
    * semantics (NOT MATCHED → INSERT) make that harmless.
    */
  def classifyOperation(deleted: Column, id: Column): Column =
    when(lower(coalesce(deleted.cast("string"), lit("false"))) === "true", lit("d"))
      .when(id.isNull, lit("c"))
      .otherwise(lit("u"))

  /** Enrichment (`spark_batch.py:224-236`): stamp processing time, derive
    * `year`/`month` partition columns from it, and default `on_offer` to
    * false. `eventTime` defaults to `current_timestamp()`; tests pass a
    * deterministic column.
    */
  def enrich(df: DataFrame, eventTime: Column = current_timestamp()): DataFrame =
    df.withColumn("operation", classifyOperation(col("__deleted"), col("id")))
      .withColumn("processing_time", eventTime)
      .withColumn("year", date_format(col("processing_time"), "yyyy"))
      .withColumn("month", date_format(col("processing_time"), "MM"))
      .withColumn("on_offer", coalesce(col("on_offer"), lit(false)))
      .drop("__deleted")

  /** Full front door: parse → classify → enrich. */
  def pipeline(raw: DataFrame, valueCol: String = "value",
               eventTime: Column = current_timestamp()): DataFrame =
    enrich(parseEnvelope(raw, valueCol), eventTime)

  // ---- Upstream schema drift ------------------------------------------------

  /** Distinct top-level payload field names across a batch of raw
    * envelopes — the schema-DRIFT detector: an upstream ALTER TABLE shows
    * up here as field names the declared envelope schema doesn't know,
    * BEFORE `from_json` silently drops them. One distributed
    * distinct over exploded `json_object_keys`; O(distinct field names)
    * to the driver, rows without a parseable payload object contribute
    * nothing (they are the dead-letter channel's business).
    */
  def payloadFieldNames(raw: DataFrame, valueCol: String = "value"): Seq[String] = {
    val payloadJson = get_json_object(col(valueCol).cast("string"), "$.payload")
    raw.select(explode(json_object_keys(payloadJson)).as("__f"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
  }

  /** The envelope schema extended with drifted payload fields, STRING-typed
    * — the safe landing type for unknown upstream additions (a consumer
    * can cast/promote once the semantics are known; guessing a numeric
    * type here would turn one odd value into a silent null). Fields the
    * payload already declares are left untouched.
    */
  def withPayloadFields(base: org.apache.spark.sql.types.StructType,
                        extra: Seq[String]): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val payload = base("payload").dataType.asInstanceOf[StructType]
    val known = payload.fieldNames.toSet
    val added = extra.distinct.filterNot(known).map(f => StructField(f, StringType))
    StructType(base.map {
      case f if f.name == "payload" =>
        f.copy(dataType = StructType(payload.fields ++ added))
      case f => f
    })
  }
}
