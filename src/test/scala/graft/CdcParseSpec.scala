package graft

import org.apache.spark.sql.functions._

import graft.cdc.{CdcModel, CdcParse}

/** Parser edge cases (reference behavior: process_kafka_message,
  * /root/reference/src/processor/spark_batch.py:118-190) and the operation
  * classifier truth table (determine_operation, spark_batch.py:101-116).
  */
class CdcParseSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    """{"schema":"s","payload":{"id":1,"name":"n","description":"d","price":5,"on_offer":true,"__deleted":"false"}}"""
  private val deleted =
    """{"schema":"s","payload":{"id":2,"name":"x","description":"d","price":9,"on_offer":false,"__deleted":"true"}}"""

  test("parseEnvelope keeps valid messages, drops null/empty/sentinel/invalid/payload-less") {
    val raw = Seq(
      Some(good), Some(deleted),
      None,                       // null value
      Some(""),                   // empty string
      Some("empty"),              // literal sentinel
      Some("{not json"),          // unparseable
      Some("""{"schema":"only"}""") // no payload
    ).toDF("value")
    val parsed = CdcParse.parseEnvelope(raw)
    assert(parsed.count() === 2)
    assert(parsed.select("id").as[Int].collect().sorted === Array(1, 2))
  }

  test("classifyOperation truth table") {
    val df = Seq(
      (Some(1), Some("true")),  // deleted flag set → d
      (Some(2), Some("TRUE")),  // case-insensitive → d
      (Some(3), Some("false")), // live with id → u
      (Some(4), None),          // missing flag → treated false → u
      (None, Some("false"))     // no id → c
    ).toDF("id", "__deleted")
    val got = df.select(col("id"),
        CdcParse.classifyOperation(col("__deleted"), col("id")).as("op"))
      .collect().map(r => (if (r.isNullAt(0)) -1 else r.getInt(0)) -> r.getString(1)).toMap
    assert(got === Map(1 -> "d", 2 -> "d", 3 -> "u", 4 -> "u", -1 -> "c"))
  }

  test("enrich stamps processing_time, year, month and defaults on_offer") {
    val raw = Seq(good.replace("\"on_offer\":true,", "")).toDF("value")
    val out = CdcParse.pipeline(raw, eventTime = lit("2024-03-05 10:00:00").cast("timestamp"))
    val row = out.select("operation", "year", "month", "on_offer").head()
    assert(row.getString(0) === "u")
    assert(row.getString(1) === "2024")
    assert(row.getString(2) === "03")
    assert(row.getBoolean(3) === false) // null payload on_offer coalesced to false
  }

  test("malformed payload fields null out without killing the row (PERMISSIVE)") {
    val weird =
      """{"schema":"s","payload":{"id":"not-an-int","name":"n","__deleted":"false"}}"""
    val parsed = CdcParse.parseEnvelope(Seq(weird).toDF("value"))
    assert(parsed.count() === 1)
    assert(parsed.select("id").head().isNullAt(0))
  }

  test("parseEnvelope accepts binary-typed value columns (Kafka value shape)") {
    val raw = Seq(good.getBytes("UTF-8"), "garbage".getBytes("UTF-8"))
      .toDF("value")
    val parsed = CdcParse.parseEnvelope(raw)
    assert(parsed.count() === 1)
    assert(parsed.select("id").head().getInt(0) === 1)
  }

  test("parseEnvelope tolerates duplicate envelopes (at-least-once delivery)") {
    val raw = Seq(good, good, deleted).toDF("value")
    assert(CdcParse.parseEnvelope(raw).count() === 3) // parse keeps both; dedup is downstream
  }

  test("parseWithDeadLetter routes invalid messages to the quarantine side") {
    val raw = Seq(Some(good), Some("{not json"), None, Some("empty")).toDF("value")
    val (valid, rejected) = CdcParse.parseWithDeadLetter(raw)
    assert(valid.count() === 1)
    assert(rejected.count() === 3)
    val rejectedVals = rejected.select("raw_value").collect().map(r =>
      Option(r.getString(0))).toSet
    assert(rejectedVals === Set(Some("{not json"), None, Some("empty")))
  }
}
