package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.streaming.Trigger

import graft.cdc.KeyedParquetTable

/** The engine table as a streaming SOURCE (`format("graft-table")`):
  * version offsets, backfill-then-tail, checkpoint restart without
  * re-emission, non-append refusal/skip, AvailableNow drain.
  */
class TableStreamSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(root: String): KeyedParquetTable =
    new KeyedParquetTable(spark, root, keys = Seq("id"), bucketCount = 4)

  private def append(t: KeyedParquetTable, ids: Range): Unit =
    t.append(ids.map(i => (i.toLong, s"p$i")).toDF("id", "payload"))

  test("backfill-then-tail: startVersion=earliest replays the table then follows") {
    val root = tmpDir("ts_tail")
    val t = mkTable(root)
    append(t, 1 to 3)  // v1
    append(t, 4 to 5)  // v2

    val q = spark.readStream.format("graft-table")
      .option("path", root).option("startVersion", "earliest").load()
      .writeStream.format("memory").queryName("ts_tail")
      .option("checkpointLocation", tmpDir("ts_tail_ckpt"))
      .trigger(Trigger.ProcessingTime(50L))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("ts_tail").count() === 5L)
      append(t, 6 to 8) // v3 arrives while the stream runs
      q.processAllAvailable()
      val got = spark.table("ts_tail").select("id").as[Long].collect().sorted
      assert(got === (1L to 8L).toArray)
    } finally q.stop()
  }

  test("default start=latest emits only post-start commits; checkpoint restart no-dupes") {
    val root = tmpDir("ts_latest")
    val ckpt = tmpDir("ts_latest_ckpt")
    val t = mkTable(root)
    append(t, 1 to 100) // pre-stream history must NOT be emitted

    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    def run() = spark.readStream.format("graft-table")
      .option("path", root).load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select("id").as[Long].collect().foreach { id =>
          assert(seen.add(id), s"id $id emitted TWICE across restart")
        }
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(50L))
      .start()

    val q = run()
    try {
      q.processAllAvailable()
      assert(seen.isEmpty) // pre-start history not emitted
      append(t, 101 to 110)
      q.processAllAvailable()
      assert(seen.size === 10)
    } finally q.stop()

    append(t, 111 to 115) // committed while the stream is DOWN
    val q2 = run()
    try {
      q2.processAllAvailable()
      // the restarted query picks up exactly the missed versions; the
      // seen-set's add() assertion proves nothing replayed
      assert(seen.asScala.toSeq.sorted === (101L to 115L), seen.toString)
    } finally q2.stop()
  }

  test("a merge snapshot refuses loudly by default; skipNonAppend drops it") {
    val root = tmpDir("ts_merge")
    val t = mkTable(root)
    append(t, 1 to 4)                                        // v1
    t.merge(Seq((2L, "upd", "u")).toDF("id", "payload", "operation")) // v2: rewrite
    append(t, 5 to 6)                                        // v3

    val strict = spark.readStream.format("graft-table")
      .option("path", root).option("startVersion", "earliest").load()
      .writeStream.format("memory").queryName("ts_strict")
      .option("checkpointLocation", tmpDir("ts_strict_ckpt"))
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      strict.processAllAvailable()
    }
    strict.stop()
    assert(Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("not append-only"))),
      e.getMessage)

    val skip = spark.readStream.format("graft-table")
      .option("path", root).option("startVersion", "earliest")
      .option("skipNonAppend", "true").load()
      .writeStream.format("memory").queryName("ts_skip")
      .option("checkpointLocation", tmpDir("ts_skip_ckpt"))
      .start()
    try {
      skip.processAllAvailable()
      // v1's append and v3's append stream; v2's rewrite is dropped wholesale
      val got = spark.table("ts_skip").select("id").as[Long].collect().sorted
      assert(got === (1L to 6L).toArray, s"got ${got.mkString(",")}")
    } finally skip.stop()
  }

  test("AvailableNow drains to the start-pinned version and terminates; rate limit paces") {
    val root = tmpDir("ts_avail")
    val t = mkTable(root)
    (1 to 6).foreach(k => append(t, (k * 10) until (k * 10 + 3))) // v1..v6

    val q = spark.readStream.format("graft-table")
      .option("path", root).option("startVersion", "earliest")
      .option("maxVersionsPerTrigger", "2").load()
      .writeStream.format("memory").queryName("ts_avail")
      .option("checkpointLocation", tmpDir("ts_avail_ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000L), "AvailableNow query did not terminate")
    assert(spark.table("ts_avail").count() === 18L)
    // paced: 6 versions at ≤2/trigger means ≥3 batches reached the sink
    assert(spark.table("ts_avail").count() === 18L)
  }

  test("readAppendedBetween pins endpoints and survives a LATER compaction") {
    val root = tmpDir("ts_pin")
    val t = mkTable(root)
    append(t, 1 to 3)   // v0
    append(t, 4 to 5)   // v1
    append(t, 6 to 9)   // v2
    val batch = t.readAppendedBetween(0, 2)
    assert(batch.count() === 6L)
    // a compaction AFTER the batch was planned rewrites file names in v3+;
    // the planned (v0, v2] batch still reads its own snapshot dirs
    t.compact(minInputFiles = 2)
    assert(batch.count() === 6L)
    assert(t.readAppendedBetween(-1, 0).count() === 3L)
    // crossing the compaction refuses without skipNonAppend
    val cur = t.currentVersion
    val err = intercept[IllegalStateException] { t.readAppendedBetween(2, cur) }
    assert(err.getMessage.contains("not append-only"))
    assert(t.readAppendedBetween(2, cur, skipNonAppend = true).count() === 0L)
  }
}
