package graft.cdc

import org.apache.spark.sql.types._

/** Schemas and typed rows for the CDC pipeline.
  *
  * The payload shape follows the reference's Debezium-unwrapped envelope:
  * `{schema: ..., payload: {id, name, description, price, on_offer, __deleted}}`
  * (`/root/reference/src/processor/spark_batch.py:118-190`, unwrap SMT config
  * `/root/reference/src/kafka/create_source_connector.py:32-35`).
  *
  * Deviations from the reference, by design (SURVEY.md §7.4):
  *  - Kafka offsets are LONG, not INT (the reference's IntegerType offset is a
  *    latent overflow, `spark_exactly_once.py:67`).
  *  - Dedup ordering carries `(kafka_partition, kafka_offset)` so latest-wins is
  *    deterministic, instead of a driver-assigned wall-clock tiebreak
  *    (`spark_batch.py:221,255`).
  */
object CdcModel {

  /** Source row of the `items` table (`/root/reference/src/service/app/main.py:15-22`). */
  final case class Item(
      id: Int,
      name: String,
      description: String,
      price: Int,
      on_offer: Boolean)

  /** One enriched CDC record as landed in the sink table
    * (`/root/reference/src/processor/spark_batch.py:71-85`).
    */
  final case class ItemCdc(
      id: Int,
      name: String,
      description: String,
      price: Int,
      on_offer: Boolean,
      operation: String, // 'c' | 'u' | 'd'
      processing_time: java.sql.Timestamp,
      year: String,
      month: String)

  /** Debezium-unwrapped payload: row after-image + `__deleted` flag. */
  val payloadSchema: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("price", IntegerType),
    StructField("on_offer", BooleanType),
    StructField("__deleted", StringType)))

  /** Full `{schema, payload}` envelope as produced by Debezium with the
    * ExtractNewRecordState SMT in rewrite mode.
    */
  val envelopeSchema: StructType = StructType(Seq(
    // Debezium's `schema` member is a deeply nested descriptor we never use;
    // typing it as StringType lets from_json skip it cheaply.
    StructField("schema", StringType),
    StructField("payload", payloadSchema)))

  /** Offset bookkeeping row (`spark_exactly_once.py:97-106`, offset widened to LONG). */
  final case class KafkaOffset(
      topic: String,
      partition: Int,
      offset: Long,
      commit_time: java.sql.Timestamp)

  /** Processed-batch lineage row (`spark_exactly_once.py:133-139`). */
  final case class ProcessedBatch(
      batch_id: String,
      processed_time: java.sql.Timestamp,
      record_count: Long,
      status: String)
}
