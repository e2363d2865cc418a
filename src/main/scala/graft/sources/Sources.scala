package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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
