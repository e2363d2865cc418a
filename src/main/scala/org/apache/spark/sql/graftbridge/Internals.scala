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
}
