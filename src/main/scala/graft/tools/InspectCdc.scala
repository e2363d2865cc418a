package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Disposable inspection harness for the CDC view-maintenance hot path. */
object InspectCdc {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = graft.core.Session.tuned(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.cdc.KeyedParquetTable
    import graft.streaming.IncrementalAgg
    val parsed = graft.Queries.parsedEvents(graft.Tables.load(spark, sfDir, "events"))
      .select("user_id", "event_id", "event_type", "value", "operation")
      .localCheckpoint(true)
    println(s"[inspect] parsed rows=${parsed.count()} users=${parsed.select("user_id").distinct().count()}")
    val maxId = parsed.agg(max("event_id")).head().getLong(0)
    val base = java.nio.file.Files.createTempDirectory("graft_inspect_").toString
    val entity = new KeyedParquetTable(spark, s"$base/entity", Seq("user_id"), Nil, 8)
    val aggT = new KeyedParquetTable(spark, s"$base/agg", Seq("event_type"), Nil, 4)
    val nB = 4L
    def tstep[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[inspect]   $label: ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    (0L until nB).foreach { b =>
      val lo = b * (maxId + 1) / nB
      val hi = (b + 1) * (maxId + 1) / nB
      val batch = parsed.filter(col("event_id") >= lo && col("event_id") < hi)
      val t0 = System.nanoTime()
      // mirror of applyCdcBatchN's action sequence, timed step by step
      val latest = tstep("ckpt(latest)")(
        graft.ops.Dedup.dedupLatest(batch, Seq("user_id"), Seq(col("event_id").desc))
          .localCheckpoint(true))
      val eb = tstep("bucketsFor(entity)")(entity.bucketsFor(latest.select(col("user_id"))))
      val additions = latest.filter(col("operation") =!= "d" || col("operation").isNull)
        .select(col("event_type").as("__g"), lit(1L).as("__dn"),
          col("value").cast("decimal(28,6)").as("__ds"))
      val delta0 = if (entity.exists && entity.currentVersion > 0) {
        val pre = tstep("plan pre")(entity.readForKeys(latest.select(col("user_id")), Some(eb)))
        val keySet = broadcast(latest.select(col("user_id").as("__t")))
        val retr = pre.join(keySet, pre("user_id") <=> keySet("__t"), "left_semi")
          .select(col("event_type").as("__g"), lit(-1L).as("__dn"),
            (-col("value").cast("decimal(28,6)")).as("__ds"))
        additions.unionByName(retr)
      } else additions
      val delta = tstep("ckpt(delta)")(delta0.groupBy(col("__g"))
        .agg(sum(col("__dn")).as("__dnet"),
          coalesce(sum(col("__ds")), lit(BigDecimal(0))).cast("decimal(38,6)").as("__dsum"))
        .localCheckpoint(true))
      val deltaRows = delta.select(col("__g").as("event_type"),
        col("__dnet").as("n_rows"), col("__dsum").as("sum_value"))
      val ab = tstep("bucketsFor(agg)")(aggT.bucketsFor(deltaRows.select(col("event_type"))))
      aggT.createIfNotExists(org.apache.spark.sql.types.StructType(deltaRows.schema.fields))
      val firstA = aggT.currentVersion == 0
      val cur = if (firstA) deltaRows.limit(0)
                else aggT.readBuckets(ab).select(deltaRows.columns.map(col): _*)
      val folded = cur.unionByName(deltaRows).groupBy(col("event_type"))
        .agg(sum(col("n_rows")).as("n_rows"),
          sum(col("sum_value")).cast("decimal(38,6)").as("sum_value"))
        .filter(col("n_rows") =!= 0)
      tstep("write(agg replaceBuckets)")(aggT.replaceBuckets(folded, ab))
      entity.createIfNotExists(org.apache.spark.sql.types.StructType(latest.drop("operation").schema.fields))
      tstep("write(entity merge)")(entity.merge(latest, "operation", None, Some(eb)))
      println(f"[inspect] batch $b took ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    import scala.jdk.CollectionConverters._
    Seq("entity", "agg").foreach { t =>
      java.nio.file.Files.list(java.nio.file.Paths.get(s"$base/$t")).iterator.asScala
        .filter(java.nio.file.Files.isDirectory(_)).toSeq.sortBy(_.toString).foreach { v =>
          val files = java.nio.file.Files.walk(v).iterator.asScala
            .filter(p => p.toString.endsWith(".parquet")).toSeq
          println(s"[inspect] $t/${v.getFileName}: ${files.size} parquet files")
        }
    }
    spark.stop()
  }
}
