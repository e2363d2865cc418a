package graft

import org.apache.spark.sql.functions._

import graft.cdc.KeyedParquetTable
import graft.validate.Validation

/** V1–V8: the validation library against two small in-memory "source/sink"
  * tables, mirroring the reference's Postgres-vs-Iceberg comparisons.
  */
class ValidationSpec extends SparkSpec {
  import spark.implicits._

  private def src = (1 to 1000).map(i => (i.toLong, s"name$i", i * 2)).toDF("id", "name", "price")

  test("row_count passes within tolerance and fails beyond it") {
    assert(Validation.rowCount(src, src).valid)
    val sink = src.filter(col("id") <= 999) // 0.1% drift exactly
    assert(Validation.rowCount(src, sink, tolerance = 0.001).valid)
    val sink2 = src.filter(col("id") <= 900)
    assert(!Validation.rowCount(src, sink2, tolerance = 0.001).valid)
  }

  test("checksum is order-independent and detects single-value corruption") {
    val shuffled = src.orderBy(rand(7))
    assert(Validation.checksum(src, shuffled, Seq("id", "name", "price")).valid)
    val corrupted = src.withColumn("price",
      when(col("id") === 500, lit(-1)).otherwise(col("price")))
    assert(!Validation.checksum(src, corrupted, Seq("id", "name", "price")).valid)
  }

  test("sample consistency: exact sink passes; missing and duplicated keys fail") {
    assert(Validation.sampleConsistency(src, src, Seq("id")).valid)
    val missing = src.filter(col("id") % 3 =!= 0)
    assert(!Validation.sampleConsistency(src, missing, Seq("id"), sampleMod = 5).valid)
    val duplicated = src.unionAll(src.limit(800))
    assert(!Validation.sampleConsistency(src, duplicated, Seq("id"), sampleMod = 5).valid)
  }

  test("combined lag: joins on key and bands by average delta") {
    val s = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "ts")
    val fast = (1 to 100).map(i => (i.toLong, i + 10.0)).toDF("id", "ts")
    val slow = (1 to 100).map(i => (i.toLong, i + 500.0)).toDF("id", "ts")
    assert(Validation.combinedLag(s, fast, Seq("id"), "ts", "ts").valid)
    assert(!Validation.combinedLag(s, slow, Seq("id"), "ts", "ts").valid)
  }

  test("table health scores snapshots, fragmentation, and partition skew") {
    val t = new KeyedParquetTable(spark, tmpDir("health"), Seq("id"), Seq("bucket"))
    // skewed partitions: bucket 0 gets 9000 rows, others 10
    val skewed = spark.range(9000).select(col("id"), lit("b0").as("bucket"))
      .unionAll(spark.range(10).select((col("id") + 9000).as("id"), lit("b1").as("bucket")))
    t.commit(skewed)
    val r = Validation.tableHealth(t, Seq("bucket"))
    assert(r.details("partition_skew").toDouble > 1.0)
    assert(r.details("level") == "Good" || r.details("level") == "Warning")
  }

  test("freshness and cdc event-type accounting") {
    val df = Seq((1L, 100.0), (2L, 200.0)).toDF("id", "ts")
    assert(Validation.freshness(df, "ts", nowEpochSec = 250.0, maxAgeSec = 100.0).valid)
    assert(!Validation.freshness(df, "ts", nowEpochSec = 1000.0, maxAgeSec = 100.0).valid)
    val cdc = Seq(("u"), ("u"), ("d")).toDF("operation")
    val counts = Validation.cdcEventTypeCounts(cdc).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("u" -> 2L, "d" -> 1L))
  }

  test("suite bands Good/Warning/Poor by pass rate") {
    def ok = Validation.CheckResult("c", valid = true, Map.empty)
    def bad = Validation.CheckResult("c", valid = false, Map.empty)
    assert(Validation.suite(Seq.fill(20)(ok))._1 === "Good")
    assert(Validation.suite(Seq.fill(17)(ok) :+ bad :+ bad :+ bad)._1 === "Warning")
    assert(Validation.suite(Seq(ok, bad, bad))._1 === "Poor")
  }

  test("observedStats rides the write action: counts, null keys, checksum match the direct pass") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, null.asInstanceOf[String]))
      .toDF("id", "v")
      .unionAll(Seq((null.asInstanceOf[java.lang.Long], "x")).toDF("id", "v")
        .select(col("id").cast("long"), col("v")))
    val (obs, observed) = Validation.observedStats(df, Seq("id"), Seq("id", "v"))
    observed.write.format("noop").mode("overwrite").save() // ONE action
    val m = obs.get
    assert(m("row_count") === 4L)
    assert(m("null_keys") === 1L)
    // checksum equals the standalone two-fold checksum over the same columns
    val (x, x2, n) = Validation.tableChecksum(df, Seq("id", "v"))
    assert(m("checksum") === x && m("checksum2") === x2 && n === 4L)
  }

  test("checksum distinguishes NULL from '' and shifted separators") {
    // corruption that swaps ('a#','b')→('a','#b') or ''→NULL must FAIL
    val a = Seq((1L, Some("a#"), "b"), (2L, Some(""), "x")).toDF("id", "c1", "c2")
    val b = Seq((1L, Some("a"), "#b"), (2L, Option.empty[String], "x")).toDF("id", "c1", "c2")
    assert(!Validation.checksum(a, b, Seq("c1", "c2")).valid)
    assert(Validation.checksum(a, a.orderBy(col("id").desc), Seq("c1", "c2")).valid)
  }

  test("combined lag: uncomputable lags fail the check instead of biasing the average") {
    val source = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "ts")
    // all sink timestamps null: no NPE, and the check cannot pass
    val allNull = Seq((1L, Option.empty[Double]), (2L, Option.empty[Double])).toDF("id", "ts")
    val r1 = Validation.combinedLag(source, allNull, Seq("id"), "ts", "ts")
    assert(!r1.valid)
    // half null: the null row must not shrink the denominator silently
    val half = Seq((1L, Option(20.0)), (2L, Option.empty[Double])).toDF("id", "ts")
    val r2 = Validation.combinedLag(source, half, Seq("id"), "ts", "ts")
    assert(!r2.valid && r2.details("n_null_lag") === "1")
  }

  test("table health handles an empty partitioned table (no NPE)") {
    import org.apache.spark.sql.types._
    val t = new KeyedParquetTable(spark, tmpDir("health_empty"), Seq("id"))
    t.createIfNotExists(StructType(Seq(
      StructField("id", LongType), StructField("day", StringType))))
    assert(Validation.tableHealth(t, Seq("day")).valid)
  }

  test("observedStats with empty keys returns count+checksum (no reduce error)") {
    val df = Seq((1L, "a")).toDF("id", "v")
    val (obs, frame) = Validation.observedStats(df, Nil, Seq("id", "v"))
    frame.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("row_count") === 1L && m("null_keys") === 0L)
  }

  test("orderedMd5Checksum fails fast above its single-task row limit") {
    val df = spark.range(100).select(col("id"))
    // under the limit: computes (and matches a recompute — deterministic)
    val a = Validation.orderedMd5Checksum(df, Seq("id"))
    assert(a === Validation.orderedMd5Checksum(df, Seq("id")))
    // over the limit: loud failure pointing at the scale path, no OOM attempt
    val e = intercept[IllegalArgumentException] {
      Validation.orderedMd5Checksum(df, Seq("id"), maxRows = 99L)
    }
    assert(e.getMessage.contains("tableChecksum"))
  }

  test("histogramDrift: 0 on identical snapshots, large on a shifted batch") {
    import graft.ops.LogHistogram
    import graft.streaming.IncrementalAgg
    val t = new KeyedParquetTable(spark, tmpDir("hist_drift"), Seq("bucket"), Nil, 4)
    def fold(vs: Seq[Long], txn: String): Long = {
      IncrementalAgg.applyBatch(t,
        vs.toDF("v").select(LogHistogram.bucketOf(col("v"), 4).as("bucket"), col("v")),
        "bucket", "v", txnId = Some(txn))
      t.currentVersion
    }
    // short-text-like values, then a heavily shifted batch (1000×)
    val v1 = fold((1L to 2000L).map(i => i % 60 + 5), "0")
    val v2 = fold((1L to 2000L).map(i => (i % 60 + 5) * 1000), "1")
    assert(Validation.histogramDrift(t, v1, v1) === 0.0)
    val d = Validation.histogramDrift(t, v1, v2)
    // v2 = v1's counts PLUS the shifted mass: sizeable but < the disjoint max
    assert(d > 0.5 && d < 2.0, s"drift=$d")
    assert(!Validation.distributionCheck(t, v1, v2, maxDrift = 0.25).valid)
    assert(Validation.distributionCheck(t, v1, v1).valid)
  }

  test("XorChecksum typed Aggregator equals the bit_xor built-in") {
    import graft.functions.XorChecksum
    val df = spark.range(10000).select(xxhash64(col("id")).as("h"))
    val typed = df.agg(XorChecksum.column(col("h"))).head().getLong(0)
    val builtin = df.agg(expr("bit_xor(h)")).head().getLong(0)
    assert(typed === builtin)
    // order independence: shuffled input, same checksum
    val shuffled = df.orderBy(rand(3)).agg(XorChecksum.column(col("h"))).head().getLong(0)
    assert(shuffled === typed)
  }

  test("morDeleteDebt bands on pending delete-set size; compaction clears it") {
    val t = new graft.cdc.KeyedParquetTable(spark, tmpDir("val_mor"), Seq("id"), Nil, 4)
    t.commit((1L to 20L).map(i => (i, s"v$i")).toDF("id", "v"))
    assert(Validation.morDeleteDebt(t).valid) // no set at all
    t.deleteKeys((1L to 6L).toDF("id"))
    val warn = Validation.morDeleteDebt(t, maxKeys = 10L)
    assert(warn.valid && warn.details("level") === "Warning" &&
      warn.details("n_delete_keys") === "6")
    assert(!Validation.morDeleteDebt(t, maxKeys = 5L).valid)
    t.compact(minInputFiles = 1) // materializes: debt back to zero
    val after = Validation.morDeleteDebt(t, maxKeys = 5L)
    assert(after.valid && after.details("n_delete_keys") === "0")
  }

  test("retentionOverhead bands on reclaimable history bytes; expire clears it") {
    val t = new graft.cdc.KeyedParquetTable(spark, tmpDir("val_ret"), Seq("id"), Nil, 4)
    t.commit((1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"))
    // link-shared appends: history holds almost nothing exclusively
    t.append((100L to 120L).map(i => (i, s"a$i")).toDF("id", "v"))
    val cheap = Validation.retentionOverhead(t)
    assert(cheap.valid && cheap.details("level") === "Good")
    // full rewrites: each superseded snapshot's files become exclusive
    // history — overhead climbs past the bound
    (0 until 3).foreach(_ => t.commit(t.read()))
    val heavy = Validation.retentionOverhead(t, maxRatio = 1.0)
    assert(!heavy.valid || heavy.details("level") != "Good")
    t.expireSnapshots(0L, retainLast = 1)
    val after = Validation.retentionOverhead(t, maxRatio = 1.0)
    assert(after.valid && after.details("reclaimable_bytes") === "0")
  }

  test("maintenancePlan orders actions by urgency from the health trio") {
    import graft.cdc.KeyedParquetTable
    // healthy young table: only the routine orphan sweep
    val t = new KeyedParquetTable(spark, tmpDir("plan_ok"), Seq("id"), Nil, 4)
    t.commit((1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"))
    assert(Validation.maintenancePlan(t).map(_._1) === Seq("remove_orphans"))

    // fragmented + delete debt: compaction advised before routine work
    val frag = new KeyedParquetTable(spark, tmpDir("plan_frag"), Seq("id"), Nil, 4)
    frag.commit((1L to 40L).map(i => (i, s"v$i")).toDF("id", "v"))
    (1 to 6).foreach(k => frag.append(Seq((100L + k, "a")).toDF("id", "v")))
    frag.deleteKeys(Seq(Tuple1(1L), Tuple1(2L), Tuple1(3L)).toDF("id"))
    val plan = Validation.maintenancePlan(frag, maxFiles = 5, maxDeleteKeys = 4)
    val actions = plan.map(_._1)
    assert(actions.count(_ == "compact") === 2) // fragmentation AND MoR debt
    assert(actions.last === "remove_orphans")
    // urgencies ordered: every "now" precedes every "soon"/"routine"
    val urg = plan.map(_._2)
    assert(urg.zip(urg.tail).forall { case (a, b) =>
      !(a != "now" && b == "now") }, s"unordered: $plan")
    // acting on the advice clears it
    frag.compact(minInputFiles = 1)
    frag.expireSnapshots(0L, retainLast = 1)
    assert(Validation.maintenancePlan(frag, maxFiles = 5, maxDeleteKeys = 4)
      .map(_._1) === Seq("remove_orphans"))
  }

  test("autoMaintain: one pass converges a fragmented+debt+retention table") {
    import graft.cdc.KeyedParquetTable
    val t = new KeyedParquetTable(spark, tmpDir("auto_maint"), Seq("id"), Nil, 4)
    t.commit((1L to 40L).map(i => (i, s"v$i")).toDF("id", "v"))
    // retention overhead needs HISTORY-ONLY bytes: a full rewrite replaces
    // every file, so v1's files are held only by the old snapshot
    // (appends alone hard-link — shared files reclaim nothing)
    t.commit(t.read().localCheckpoint(true))
    // fragmentation: many tiny appends (files > maxFiles)
    (1 to 8).foreach(k => t.append(Seq((100L + k, "a")).toDF("id", "v")))
    // merge-on-read delete debt above the bound
    t.deleteKeys(Seq(Tuple1(1L), Tuple1(2L), Tuple1(3L), Tuple1(4L), Tuple1(5L)).toDF("id"))
    // retention overhead: the append/delete history above retains every
    // intermediate snapshot — reclaimable bytes dwarf the live state
    val before = Validation.autoMaintain(t,
      maxFiles = 5, maxDeleteKeys = 4, maxRetentionRatio = 0.5)
    // the pass was advised real work, not just the routine sweep
    assert(before.exists(p => p._1 == "compact" && p._2 != "routine"))
    assert(before.exists(p => p._1 == "expire_snapshots" && p._2 != "routine"))
    // and ONE pass cleared it: re-advising yields an all-routine plan
    val after = Validation.maintenancePlan(t,
      maxFiles = 5, maxDeleteKeys = 4, maxRetentionRatio = 0.5)
    assert(after.map(_._1) === Seq("remove_orphans"),
      s"advice did not clear in one auto pass: $after")
    // the data survived maintenance intact (40 base − 5 deleted + 8 appended)
    assert(t.read().count() === 43L)
  }

  test("schemaDriftCheck flags unknown payload fields, ignores internals") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("schema", StringType),
      StructField("payload", StructType(Seq(
        StructField("id", LongType), StructField("v", StringType),
        StructField("__deleted", StringType))))))
    val clean = Seq(
      """{"schema":"s","payload":{"id":1,"v":"a","__deleted":"false"}}""").toDF("value")
    val ok = Validation.schemaDriftCheck(clean, schema)
    assert(ok.valid && ok.details("n_drifted") === "0")
    val drifted = Seq(
      """{"schema":"s","payload":{"id":2,"v":"b","__deleted":"false","channel":"web","score":"9"}}""",
      """{"schema":"s","payload":{"id":3,"v":"c","__deleted":"false","channel":"app"}}""",
      """not json at all""").toDF("value")
    val bad = Validation.schemaDriftCheck(drifted, schema)
    assert(!bad.valid)
    assert(bad.details("drifted_fields") === "channel,score")
  }
}
