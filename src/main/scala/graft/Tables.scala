package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders for the harness testdata (TESTDATA.md). */
object Tables {

  /** The engine-wide convention (documented at each use site) is that
    * `events.ts` is a LONG of nanos-since-epoch: every consumer does pure
    * integer arithmetic on it (range-join bucketing, session gaps, cohort
    * weeks, curve layouts), which is exact, tz-free and cross-engine
    * reproducible. Which PHYSICAL type the fixture carries has varied by
    * driver generation — parquet TIMESTAMP(NANOS) reads as Long already
    * (`nanosAsLong`, Session.tuned), but micros-precision fixtures read as
    * TIMESTAMP_NTZ (no tz metadata) or TIMESTAMP (UTC-adjusted) — so the
    * loader normalizes all three to the same Long nanos. The NTZ form uses
    * timestampdiff against the epoch NTZ literal: pure wall-clock
    * arithmetic, no session-timezone dependence; DuckDB's `epoch_ns` over
    * the same naive values agrees (the oracles' formulation).
    */
  private def normalizeTsNanos(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampNTZType => df.withColumn("ts",
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000"))
      case TimestampType => df.withColumn("ts", expr("unix_micros(ts) * 1000"))
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other — expected long nanos or a timestamp")
    }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.columns.contains("ts")) normalizeTsNanos(df) else df
  }
}
