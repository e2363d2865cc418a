package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cdc.KeyedParquetTable
import graft.core.Session

/** Dev utility: replicate q_incremental_agg_cdc's batch fold and print the
  * per-version parquet file/byte counts of both maintained tables — the
  * fragmentation evidence for the per-batch commit cost
  * (`runMain graft.tools.IvmFileAudit [sfDir]`).
  */
object IvmFileAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Session.tuned(
      SparkSession.builder().master("local[32]").appName("ivm-audit"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val parsed = graft.Queries.parsedEvents(graft.Tables.load(spark, dir, "events"))
        .select("user_id", "event_id", "event_type", "value", "operation")
        .localCheckpoint(true)
      val maxId = parsed.agg(max("event_id")).head().getLong(0)
      val nBatches = 4L
      val base = java.nio.file.Files.createTempDirectory("graft_ivmaudit_").toString
      val entity = new KeyedParquetTable(spark, s"$base/entity", Seq("user_id"), Nil, 8)
      val aggT = new KeyedParquetTable(spark, s"$base/agg", Seq("event_type"), Nil, 4)
      graft.streaming.IncrementalAgg.applyCdcBatches(entity, aggT,
        (0L until nBatches).map { b =>
          val lo = b * (maxId + 1) / nBatches
          val hi = (b + 1) * (maxId + 1) / nBatches
          parsed.filter(col("event_id") >= lo && col("event_id") < hi)
        },
        "event_type", "value", Seq(col("event_id").desc))
      for (t <- Seq(entity, aggT)) {
        val root = java.nio.file.Paths.get(t.root)
        java.nio.file.Files.list(root).sorted().forEach { v =>
          if (java.nio.file.Files.isDirectory(v) &&
              v.getFileName.toString.startsWith("v")) {
            var n = 0L; var bytes = 0L
            java.nio.file.Files.walk(v).forEach { p =>
              if (p.toString.endsWith(".parquet")) {
                n += 1; bytes += java.nio.file.Files.size(p)
              }
            }
            println(s"[audit] ${t.root.split('/').last}/${v.getFileName} " +
              s"files=$n bytes=$bytes avg=${if (n > 0) bytes / n else 0}")
          }
        }
      }
    } finally spark.stop()
  }
}
