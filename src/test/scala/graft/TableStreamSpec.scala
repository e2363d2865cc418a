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

  test("changefeedBetween: post-images for insert/update, pre-images for delete") {
    val root = tmpDir("cf_sem")
    val t = mkTable(root)
    append(t, 1 to 4)                                    // v0
    val v0 = t.currentVersion
    t.merge(Seq((2L, "two-updated", "u"), (3L, "p3", "d"), (9L, "nine", "u"))
      .toDF("id", "payload", "operation"))               // v1
    val cf = t.changefeedBetween(v0, t.currentVersion)
      .select("id", "payload", "_change_type").as[(Long, String, String)]
      .collect().sortBy(_._1)
    assert(cf === Array(
      (2L, "two-updated", "update"),  // post-image
      (3L, "p3", "delete"),           // pre-image
      (9L, "nine", "insert")))
    // backfill form: from = -1 is the whole snapshot as inserts
    assert(t.changefeedBetween(-1L, v0).filter($"_change_type" === "insert")
      .count() === 4L)
    // net effect over a wider range: insert-then-delete vanishes
    t.merge(Seq((9L, "nine", "d")).toDF("id", "payload", "operation")) // v2
    val net = t.changefeedBetween(v0, t.currentVersion)
      .select("id", "_change_type").as[(Long, String)].collect().sortBy(_._1)
    assert(net === Array((2L, "update"), (3L, "delete")))
  }

  test("changelog stream into a graft-table merge sink replicates through merges/deletes") {
    val srcRoot = tmpDir("cf_src")
    val dstRoot = tmpDir("cf_dst")
    val t = mkTable(srcRoot)
    append(t, 1 to 50)                                             // v0
    t.merge((1 to 10).map(i => (i.toLong, s"upd$i", "u")).toDF("id", "payload", "operation")) // v1
    t.merge((41 to 50).map(i => (i.toLong, "x", "d")).toDF("id", "payload", "operation"))     // v2
    append(t, 51 to 60)                                            // v3
    val ckpt = tmpDir("cf_ckpt")
    def run() = spark.readStream.format("graft-table")
      .option("path", srcRoot).option("startVersion", "earliest")
      .option("mode", "changelog")
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream.format("graft-table")
      .option("path", dstRoot)
      .option("commitMode", "merge")
      .option("keys", "id").option("buckets", "4")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(50L))
      .start()
    val q = run()
    try {
      q.processAllAvailable()
      val dst = graft.cdc.KeyedParquetTable.openRoot(spark, dstRoot)
      assert(dst.read().count() === t.read().count())
      assert(dst.read().except(t.read()).isEmpty &&
        t.read().except(dst.read()).isEmpty, "replica diverged from upstream")
    } finally q.stop()
    // upstream keeps moving while the stream is DOWN; restart converges
    t.merge(Seq((1L, "upd-again", "u"), (60L, "x", "d"))
      .toDF("id", "payload", "operation"))
    val q2 = run()
    try {
      q2.processAllAvailable()
      val dst = graft.cdc.KeyedParquetTable.openRoot(spark, dstRoot)
      assert(dst.read().except(t.read()).isEmpty &&
        t.read().except(dst.read()).isEmpty, "replica diverged after restart")
    } finally q2.stop()
  }

  test("commitMode=overwrite: a Complete-mode aggregation stream replaces the snapshot per batch") {
    val srcRoot = tmpDir("ov_src")
    val dstRoot = tmpDir("ov_dst")
    val t = mkTable(srcRoot)
    append(t, 1 to 10)
    val q = spark.readStream.format("graft-table")
      .option("path", srcRoot).option("startVersion", "earliest").load()
      .groupBy((org.apache.spark.sql.functions.col("id") % 2).as("parity"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .writeStream.format("graft-table")
      .outputMode("complete")
      .option("path", dstRoot)
      .option("commitMode", "overwrite")
      .option("keys", "parity")
      .option("checkpointLocation", tmpDir("ov_ckpt"))
      .trigger(Trigger.ProcessingTime(50L))
      .start()
    try {
      q.processAllAvailable()
      val dst = graft.cdc.KeyedParquetTable.openRoot(spark, dstRoot)
      assert(dst.read().as[(Long, Long)].collect().sortBy(_._1).toSeq
        === Seq((0L, 5L), (1L, 5L)))
      append(t, 11 to 13)
      q.processAllAvailable()
      assert(dst.read().as[(Long, Long)].collect().sortBy(_._1).toSeq
        === Seq((0L, 6L), (1L, 7L)))
      // prior full state stays time-travelable
      assert(dst.readVersion(dst.currentVersion - 1)
        .as[(Long, Long)].collect().sortBy(_._1).toSeq === Seq((0L, 5L), (1L, 5L)))
    } finally q.stop()
  }

  test("live replication: producer keeps merging while the changelog stream drains") {
    val srcRoot = tmpDir("live_src")
    val dstRoot = tmpDir("live_dst")
    val t = mkTable(srcRoot)
    append(t, 1 to 20) // v0
    val q = spark.readStream.format("graft-table")
      .option("path", srcRoot).option("startVersion", "earliest")
      .option("mode", "changelog")
      .load()
      .writeStream.format("graft-table")
      .option("path", dstRoot)
      .option("commitMode", "merge")
      .option("keys", "id").option("buckets", "4")
      .option("checkpointLocation", tmpDir("live_ckpt"))
      .trigger(Trigger.ProcessingTime(25L))
      .start()
    try {
      // concurrent producer: upserts, group-moving updates and deletes land
      // WHILE batches are being planned — version-pinned offsets must keep
      // every batch stable regardless of interleave
      val writer = new Thread(() => {
        val w = graft.cdc.KeyedParquetTable.openRoot(spark, srcRoot)
        (1 to 8).foreach { k =>
          w.merge(Seq((k.toLong, s"upd$k", "u"), ((20 + k).toLong, s"new$k", "u"),
            ((k % 5 + 10).toLong, "x", "d"))
            .toDF("id", "payload", "operation"))
          Thread.sleep(30L)
        }
      })
      writer.start(); writer.join()
      q.processAllAvailable()
      val dst = graft.cdc.KeyedParquetTable.openRoot(spark, dstRoot)
      assert(dst.read().except(t.read()).isEmpty &&
        t.read().except(dst.read()).isEmpty,
        "replica diverged from upstream under concurrent commits")
    } finally q.stop()
  }

  test("sink commits survive a racing direct writer (claim race -> retry, no losses)") {
    val root = tmpDir("sink_race")
    val sink = new graft.streaming.GraftTableSink(spark, root,
      commitMode = "append", opCol = "operation", txnAppId = "race-spec",
      keys = Seq("id"), buckets = 4)
    val t = new KeyedParquetTable(spark, root, keys = Seq("id"), bucketCount = 4)
    t.createIfNotExists(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.StringType))))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def safely(body: => Unit): Runnable = () =>
      try body catch { case e: Throwable => errs.add(e) }
    val sinkThread = new Thread(safely {
      (0 until 6).foreach { b =>
        sink.addBatch(b.toLong,
          Seq(((1000 + b).toLong, s"sink$b")).toDF("id", "payload"))
      }
    })
    val writerThread = new Thread(safely {
      val w = new KeyedParquetTable(spark, root, keys = Seq("id"), bucketCount = 4)
      (0 until 6).foreach { k =>
        // direct appends race the sink's claims on the same snapshot chain
        graft.catalog.CommitRetry.retrying("race-spec direct append") {
          w.append(Seq(((2000 + k).toLong, s"direct$k")).toDF("id", "payload"))
        }
      }
    })
    sinkThread.start(); writerThread.start()
    sinkThread.join(120000L); writerThread.join(120000L)
    assert(errs.isEmpty, errs.asScala.map(_.toString).mkString("; "))
    val ids = t.read().select("id").as[Long].collect().sorted
    assert(ids === ((1000L to 1005L) ++ (2000L to 2005L)).toArray,
      s"lost commits: got ${ids.mkString(",")}")
    // versions are linear: 12 commits on top of the empty create
    assert(t.currentVersion === 12L)
  }

  test("sink replay with the same batchId commits nothing twice (txn marker)") {
    val root = tmpDir("sink_replay")
    val sink = new graft.streaming.GraftTableSink(spark, root,
      commitMode = "append", opCol = "operation", txnAppId = "spec",
      keys = Seq("id"), buckets = 4)
    // a plain batch frame stands in for MicroBatchExecution's incremental
    // frame — addBatch's replay/commit logic is identical either way
    val df = (1 to 5).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
    sink.addBatch(0L, df)
    sink.addBatch(0L, df) // the crash-replay: same id, must be a no-op
    val t = graft.cdc.KeyedParquetTable.openRoot(spark, root)
    assert(t.read().count() === 5L)
    assert(t.currentVersion === 0L)
    sink.addBatch(1L, df) // a NEW batch id does commit
    assert(t.read().count() === 10L)
  }

  test("two sinks with different txnAppIds interleave without reopening each other's replay window") {
    val root = tmpDir("sink_two_apps")
    def mkSink(app: String) = new graft.streaming.GraftTableSink(spark, root,
      commitMode = "append", opCol = "operation", txnAppId = app,
      keys = Seq("id"), buckets = 4)
    val a = mkSink("ckptA")
    val b = mkSink("ckptB")
    def batch(ids: Range) = ids.map(i => (i.toLong, s"p$i")).toDF("id", "payload")
    a.addBatch(0L, batch(1 to 3))
    b.addBatch(0L, batch(11 to 13)) // a DIFFERENT writer commits in between
    // crash replay of A's batch 0 after B's commit: with a single-slot
    // marker B's commit erased A's, and this would double-append — the
    // per-appId ledger must recognize it
    a.addBatch(0L, batch(1 to 3))
    val t = graft.cdc.KeyedParquetTable.openRoot(spark, root)
    assert(t.read().count() === 6L,
      s"A's replayed batch double-appended: ${t.read().count()} rows")
    // and a sync_into-style txn-carrying direct commit doesn't mask either
    t.append(batch(21 to 22), Some("sync#0"))
    b.addBatch(0L, batch(11 to 13)) // B's own replay, after the third writer
    a.addBatch(1L, batch(4 to 5))   // fresh batch still commits
    assert(t.read().count() === 10L)
    assert(t.txnLedger === Map("ckptA" -> 1L, "ckptB" -> 0L, "sync" -> 0L))
  }

  test("readStream.table + sink option(table): catalog-identifier streaming end to end") {
    def sql(q: String) = spark.sql(q)
    sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    sql("DROP TABLE IF EXISTS graft.spec.src_stream")
    sql("DROP TABLE IF EXISTS graft.spec.dst_stream")
    sql("""CREATE TABLE graft.spec.src_stream (id BIGINT, payload STRING)
           PARTITIONED BY (bucket(4, id)) TBLPROPERTIES ('graft.keys'='id')""")
    sql("INSERT INTO graft.spec.src_stream VALUES (1,'a'), (2,'b'), (3,'c')")
    sql("""CREATE TABLE graft.spec.dst_stream (id BIGINT, payload STRING)
           PARTITIONED BY (bucket(4, id)) TBLPROPERTIES ('graft.keys'='id')""")
    val ckpt = tmpDir("ident_ckpt")
    // a CDC replica with no filesystem path in sight: identifier read
    // (changelog mode via reader option), identifier write
    def drain(): Unit = {
      val q = spark.readStream
        .option("startVersion", "earliest").option("mode", "changelog")
        .table("graft.spec.src_stream")
        .writeStream.format("graft-table")
        .option("table", "graft.spec.dst_stream")
        .option("commitMode", "merge")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000L), "identifier stream did not drain")
    }
    drain()
    assert(sql("SELECT id, payload FROM graft.spec.dst_stream ORDER BY id")
      .as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // source keeps evolving (append + keyed delete through SQL); the next
    // drain replicates the NET change from the checkpointed offset
    sql("INSERT INTO graft.spec.src_stream VALUES (4,'d')")
    sql("DELETE FROM graft.spec.src_stream WHERE id = 2")
    drain()
    assert(sql("SELECT id, payload FROM graft.spec.dst_stream ORDER BY id")
      .as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (3L, "c"), (4L, "d")))
    // a sink identifier that names no catalog table refuses (creating
    // tables is DDL's job, not a sink side effect)
    val err = intercept[Exception] {
      spark.readStream.option("startVersion", "earliest")
        .table("graft.spec.src_stream")
        .writeStream.format("graft-table")
        .option("table", "graft.spec.nope")
        .option("checkpointLocation", tmpDir("ident_ckpt_bad"))
        .trigger(Trigger.AvailableNow()).start()
    }
    assert(err.getMessage.contains("nope"), err.getMessage)
    sql("DROP TABLE graft.spec.src_stream")
    sql("DROP TABLE graft.spec.dst_stream")
  }

  test("writeStream.toTable: Spark's native sink API routes into the engine, replay-safe") {
    def sql(q: String) = spark.sql(q)
    sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    sql("DROP TABLE IF EXISTS graft.spec.src_tot")
    sql("DROP TABLE IF EXISTS graft.spec.dst_tot")
    sql("""CREATE TABLE graft.spec.src_tot (id BIGINT, payload STRING)
           PARTITIONED BY (bucket(4, id)) TBLPROPERTIES ('graft.keys'='id')""")
    sql("INSERT INTO graft.spec.src_tot VALUES (1,'a'), (2,'b'), (3,'c')")
    sql("""CREATE TABLE graft.spec.dst_tot (id BIGINT, payload STRING)
           PARTITIONED BY (bucket(4, id)) TBLPROPERTIES ('graft.keys'='id')""")
    val ckpt = tmpDir("totable_ckpt")
    // identifier in, identifier out — via Spark's OWN toTable API (the
    // V2TableWithV1Fallback hook routes it into the graft-table sink);
    // Spark's guard requires the matching format() call
    def drain(): Unit = {
      val q = spark.readStream
        .option("startVersion", "earliest").option("mode", "changelog")
        .table("graft.spec.src_tot")
        .writeStream.format("graft-table")
        .option("commitMode", "merge")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable("graft.spec.dst_tot")
      assert(q.awaitTermination(120000L), "toTable stream did not drain")
    }
    drain()
    assert(sql("SELECT id, payload FROM graft.spec.dst_tot ORDER BY id")
      .as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // replay safety rides the same _txns ledger as the option(table) sink:
    // re-draining from the same checkpoint commits nothing twice
    def dstVersion: Long = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.catalog.GraftCatalog]
      .tableFor(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("spec"), "dst_tot")).currentVersion
    val vBefore = dstVersion
    drain()
    assert(dstVersion === vBefore,
      "replayed drain must not commit a new snapshot")
    // source evolves; the next drain replicates the net change
    sql("INSERT INTO graft.spec.src_tot VALUES (4,'d')")
    sql("DELETE FROM graft.spec.src_tot WHERE id = 2")
    drain()
    assert(sql("SELECT id, payload FROM graft.spec.dst_tot ORDER BY id")
      .as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (3L, "c"), (4L, "d")))
    sql("DROP TABLE graft.spec.src_tot")
    sql("DROP TABLE graft.spec.dst_tot")
  }

  test("readStream.table: temp views shadow a same-named table under the current catalog") {
    def sql(q: String) = spark.sql(q)
    sql("CREATE NAMESPACE IF NOT EXISTS graft.spec")
    sql("DROP TABLE IF EXISTS graft.spec.shadowed")
    sql("""CREATE TABLE graft.spec.shadowed (id BIGINT, payload STRING)
           PARTITIONED BY (bucket(4, id)) TBLPROPERTIES ('graft.keys'='id')""")
    val prevCat = spark.catalog.currentCatalog()
    try {
      sql("USE graft.spec")
      // unqualified name binds to the current (graft) namespace
      assert(spark.readStream.table("shadowed").schema.fieldNames.toSeq
        === Seq("id", "payload"))
      // a streaming TEMP VIEW of the same name must win (Spark's own
      // precedence — the claim rule checks before touching the name)
      spark.readStream.format("rate").load().createOrReplaceTempView("shadowed")
      assert(spark.readStream.table("shadowed").schema.fieldNames.toSeq
        === Seq("timestamp", "value"))
    } finally {
      spark.catalog.dropTempView("shadowed")
      spark.catalog.setCurrentCatalog(prevCat)
      sql("DROP TABLE IF EXISTS graft.spec.shadowed")
    }
    // a stored graft VIEW refuses with the reason named, not a bare
    // not-found (views are batch text expansions)
    sql("DROP TABLE IF EXISTS graft.spec.sv_base")
    sql("""CREATE TABLE graft.spec.sv_base (id BIGINT, v BIGINT)
           TBLPROPERTIES ('graft.keys'='id')""")
    sql("CREATE VIEW graft.spec.sv AS SELECT id FROM graft.spec.sv_base")
    val e = intercept[UnsupportedOperationException] {
      spark.readStream.table("graft.spec.sv")
    }
    assert(e.getMessage.contains("cannot be streamed"), e.getMessage)
    sql("DROP VIEW graft.spec.sv")
    sql("DROP TABLE graft.spec.sv_base")
  }

  test("batch reads: spark.read.format(graft-table) snapshot/time-travel/incremental/changelog") {
    val root = tmpDir("batch_read")
    val t = mkTable(root)
    append(t, 1 to 4)                                    // v0
    append(t, 5 to 7)                                    // v1
    t.merge(Seq((1L, "one-upd", "u"), (7L, "x", "d"))
      .toDF("id", "payload", "operation"))               // v2
    def rd = spark.read.format("graft-table").option("path", root)

    assert(rd.load().count() === 6L)                                  // current
    assert(rd.option("versionAsOf", "0").load().count() === 4L)       // pin
    val incr = rd.option("startVersion", "0").option("endVersion", "1")
      .load().select("id").as[Long].collect().sorted
    assert(incr === Array(5L, 6L, 7L))                                // appends
    val cl = rd.option("startVersion", "1").option("mode", "changelog")
      .load().select("id", "_change_type").as[(Long, String)].collect().sortBy(_._1)
    assert(cl === Array((1L, "update"), (7L, "delete")))              // changelog
    // appends crossing the merge refuses; exclusive option pairs refuse
    assertThrows[IllegalStateException] {
      rd.option("startVersion", "1").load().collect()
    }
    assertThrows[IllegalArgumentException] {
      rd.option("versionAsOf", "0").option("startVersion", "0").load()
    }
    // an outer aggregation over the relation still computes correctly
    // (needConversion=false path end-to-end)
    assert(rd.load().groupBy().sum("id").head().getLong(0) === (2 to 6).map(_.toLong).sum + 1L)
  }

  test("mergeSchema sink: a replica follows its upstream's schema evolution across restart") {
    val root = tmpDir("ms_up")
    val rep = tmpDir("ms_rep") + "/t"
    val ckpt = tmpDir("ms_ckpt")
    val up = new KeyedParquetTable(spark, root, keys = Seq("id"), bucketCount = 4)
    up.createIfNotExists(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.StringType))))
    up.merge(Seq((1L, "a", "u"), (2L, "b", "u")).toDF("id", "payload", "operation"))
    def drain(): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("path", root)
        .option("startVersion", "earliest").option("mode", "changelog")
        .load()
        .writeStream.format("graft-table")
        .option("path", rep)
        .option("commitMode", "merge")
        .option("keys", "id").option("buckets", "4")
        .option("mergeSchema", "true")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000L))
    }
    drain()
    // upstream evolves: ADD COLUMN, then rows carrying it
    up.addColumn("note", org.apache.spark.sql.types.StringType)
    up.merge(Seq((2L, "b2", "fresh", "u"), (3L, "c", "new", "u"))
      .toDF("id", "payload", "note", "operation"))
    // the stream restarts from its checkpoint (schema re-pins on restart);
    // the sink evolves the replica instead of refusing the wider batch
    drain()
    val got = KeyedParquetTable.openRoot(spark, rep).read()
      .select("id", "payload", "note").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got === Array((1L, "a", null), (2L, "b2", "fresh"), (3L, "c", "new")))
    // WITHOUT the option, merge's project-to-target contract applies: the
    // pre-existing narrow replica keeps replicating with the new column
    // dropped (the same projection that drops `operation` itself) — the
    // schema does NOT silently evolve
    val rep2 = tmpDir("ms_rep2") + "/t"
    val narrow = new KeyedParquetTable(spark, rep2, keys = Seq("id"), bucketCount = 4)
    narrow.createIfNotExists(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.StringType))))
    val q2 = spark.readStream.format("graft-table")
      .option("path", root)
      .option("startVersion", "earliest").option("mode", "changelog").load()
      .writeStream.format("graft-table")
      .option("path", rep2)
      .option("commitMode", "merge")
      .option("keys", "id").option("buckets", "4")
      .option("checkpointLocation", tmpDir("ms_ckpt2"))
      .trigger(Trigger.AvailableNow()).start()
    assert(q2.awaitTermination(120000L))
    assert(narrow.read().columns.toSeq.filterNot(_ == "__bucket")
      === Seq("id", "payload"))
    assert(narrow.read().count() === 3L)
  }

  test("sink with keys options onto an EXISTING partitioned root restores the pinned layout") {
    val src = tmpDir("sink_part_src")
    val dst = tmpDir("sink_part_dst")
    val up = mkTable(src)
    up.append(Seq((1L, "x", "p0"), (2L, "y", "p1")).toDF("id", "payload", "part"))
    // the destination exists with a partitionBy the sink's options can't
    // express — commitOnce must open it through openRoot (full pinned
    // layout) instead of constructing a partition-less instance that
    // ensureLayout would refuse on every batch
    val pre = new KeyedParquetTable(spark, dst, Seq("id"),
      partitionBy = Seq("part"), bucketCount = 4)
    pre.commit(Seq((9L, "seed", "p0")).toDF("id", "payload", "part"))
    val q = spark.readStream.format("graft-table")
      .option("path", src).option("startVersion", "earliest").load()
      .writeStream.format("graft-table")
      .option("path", dst)
      .option("keys", "id").option("buckets", "4") // agreeing declaration
      .option("checkpointLocation", tmpDir("sink_part_ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000L))
    val got = KeyedParquetTable.openRoot(spark, dst).read()
      .select("id", "part").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got === Array((1L, "p0"), (2L, "p1"), (9L, "p0")))
    // a CONFLICTING declaration refuses loudly instead of committing a
    // mixed layout
    val bad = spark.readStream.format("graft-table")
      .option("path", src).option("startVersion", "earliest").load()
      .writeStream.format("graft-table")
      .option("path", dst)
      .option("keys", "id").option("buckets", "8")
      .option("checkpointLocation", tmpDir("sink_part_ckpt2"))
      .trigger(Trigger.AvailableNow()).start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      bad.awaitTermination()
    }
    assert(err.getMessage.contains("buckets"), err.getMessage)
    // path+table together refuse up front
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft-table")
        .option("path", src).option("table", "graft.spec.whatever").load()
    }
  }

  test("changefeed image reads are bucket-pruned to the changed keys' buckets") {
    val root = tmpDir("cf_prune")
    val t = new KeyedParquetTable(spark, root, keys = Seq("id"), bucketCount = 8)
    append(t, 1 to 400)                                   // v0: all 8 buckets
    val v0 = t.currentVersion
    // touch ONE key → one bucket
    t.merge(Seq((7L, "upd", "u")).toDF("id", "payload", "operation"))
    val cf = t.changefeedBetween(v0, t.currentVersion)
    val touched = t.bucketsFor(Seq(Tuple1(7L)).toDF("id"))
    assert(touched.size === 1)
    // every data file the changefeed plan reads lives in a touched bucket
    // dir of some snapshot — O(changed buckets) I/O, never O(table)
    val dataFiles = cf.inputFiles.filter(_.contains("__bucket="))
    assert(dataFiles.nonEmpty)
    val badBucket = dataFiles.filterNot(f =>
      touched.exists(b => f.contains(s"__bucket=$b/")))
    assert(badBucket.isEmpty,
      s"changefeed read untouched buckets: ${badBucket.take(3).mkString(", ")}")
    assert(cf.select("id", "_change_type").as[(Long, String)].collect().toSeq
      === Seq((7L, "update")))
  }

  test("branch option: reads tail the branch head, not main") {
    val root = tmpDir("ts_branch")
    val t = mkTable(root)
    append(t, 1 to 3)                       // main v0
    val b = t.createBranch("audit")
    append(b, 4 to 6)                       // branch v1 (zero-copy fork)
    append(t, 100 to 120)                   // main diverges
    // batch read of the branch
    val got = spark.read.format("graft-table")
      .option("path", root).option("branch", "audit")
      .load().select("id").as[Long].collect().sorted
    assert(got === (1L to 6L).toArray)
    // streaming read of the branch drains branch snapshots only
    val q = spark.readStream.format("graft-table")
      .option("path", root).option("branch", "audit")
      .option("startVersion", "earliest").load()
      .writeStream.format("memory").queryName("ts_branch")
      .option("checkpointLocation", tmpDir("ts_branch_ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000L))
    assert(spark.table("ts_branch").select("id").as[Long].collect().sorted
      === (1L to 6L).toArray)
    assertThrows[IllegalArgumentException] {
      spark.read.format("graft-table")
        .option("path", root).option("branch", "nope").load()
    }
  }

  test("restart after schema evolution: the re-opened stream carries the new column") {
    val root = tmpDir("ts_evolve")
    val ckpt = tmpDir("ts_evolve_ckpt")
    val t = mkTable(root)
    append(t, 1 to 3) // v0, (id, payload)
    val schemas = new java.util.concurrent.CopyOnWriteArrayList[Seq[String]]()
    val extras = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    def run() = spark.readStream.format("graft-table")
      .option("path", root).option("startVersion", "earliest").load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        schemas.add(b.columns.toSeq)
        if (b.columns.contains("extra"))
          b.select("id", "extra").na.drop().as[(Long, Long)].collect()
            .foreach { case (k, v) => extras.put(k, v) }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    val q = run()
    assert(q.awaitTermination(120000L))
    assert(schemas.get(0) === Seq("id", "payload"))
    // evolve (metadata-only ADD COLUMN), then a post-evolution append
    t.addColumn("extra", org.apache.spark.sql.types.LongType)
    t.append(Seq((10L, "p10", 7L)).toDF("id", "payload", "extra"))
    val q2 = run()
    assert(q2.awaitTermination(120000L))
    assert(schemas.get(schemas.size - 1) === Seq("id", "payload", "extra"))
    assert(extras.get(10L) === 7L)
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
