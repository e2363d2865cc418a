package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic

/** The one Spark-internal bridge the engine needs: a V1 streaming
  * [[org.apache.spark.sql.execution.streaming.Source]]'s `getBatch` must
  * return a frame flagged `isStreaming` (MicroBatchExecution asserts it),
  * and the only constructor for that flag — the same one the built-in
  * file stream source uses — is `private[sql]`. This object lives under
  * `org.apache.spark.sql` purely to reach it; no other internals are
  * touched, and the wrapped plan is the ordinary optimized batch plan
  * (parquet pushdown intact) riding as an RDD scan.
  */
object Internals {
  def asStreamingFrame(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse hop, for a V1 streaming [[org.apache.spark.sql.execution
    * .streaming.Sink]]: `addBatch` receives a STREAMING frame that batch
    * writers refuse; re-wrap its executed plan as an ordinary batch frame
    * (what ForeachBatchSink does before invoking the user function). */
  def asBatchFrame(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** The V1 streaming-relation leaf `readStream.format(source)` would
    * produce — what `spark.readStream.table("graft.ns.t")` rewrites to
    * (see graft.catalog.GraftStreamRelationRule): Spark's analyzer routes
    * a streaming identifier to `StreamingRelationV2` over the catalog's
    * DSv2 Table and then requires MICRO_BATCH_READ, which a V1
    * StreamSourceProvider cannot declare — so the engine claims the
    * still-unresolved relation and plants the exact leaf the provider
    * path would have planted. Both classes are `private[sql]`, hence the
    * bridge.
    */
  def v1StreamingRelation(spark: org.apache.spark.sql.SparkSession,
                          source: String,
                          options: Map[String, String])
  : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    org.apache.spark.sql.execution.streaming.runtime.StreamingRelation(
      org.apache.spark.sql.execution.datasources.DataSource(
        cs, className = source, options = options))
  }
}

/** Public face of the `private[sql]` [[org.apache.spark.sql.connector
  * .catalog.V2TableWithV1Fallback]] trait: a DSv2 table extending this is
  * routed by `DataStreamWriter.toTable` into its V1 provider + location —
  * the hook that lets a V1 streaming sink claim the native
  * `writeStream.toTable("catalog.ns.t")` API. Same bridge rationale as
  * [[Internals]]: the trait's contract is stable and public in bytecode,
  * only its Scala access is sql-private.
  */
trait V1FallbackTable
  extends org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback
