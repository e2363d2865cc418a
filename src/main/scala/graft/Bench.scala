package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries with a `noop`-format write so
  * the full physical plan executes (a bare `count()` would let column pruning
  * discard most of the work — VERDICT r1 flagged exactly that).
  * Prints ONE JSON line per the driver contract.
  */
object Bench {
  /** Probe cadence: a calibration probe fires every CalEvery sweep items,
    * and cal_samples groups by the same constant.
    */
  private[graft] val CalEvery = 8

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Session.tuned(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_BENCH_ONLY=a,b,c restricts the run to named headliners —
    // an iteration aid for timing one query without the full sweep; the
    // driver's full-bench contract is the unset default
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = Queries.headlines.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // warmup: one untimed pass over every headline query so the timed pass
    // measures steady state (JIT + Janino codegen compile + reader init are
    // one-time costs that amortize to zero on real data volumes)
    selected.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // n≥3 timed runs per query, report the MINIMUM (machine-load jitter on a
    // shared box only ever inflates a run, so min is the stable estimator;
    // the mean rides along for drift detection)
    val nRuns = sys.env.get("SPARK_GRAFT_BENCH_RUNS").flatMap { s =>
      val n = s.trim.toIntOption
      if (n.isEmpty) System.err.println(
        s"[bench] unparseable SPARK_GRAFT_BENCH_RUNS='$s', using 3")
      n
    }.getOrElse(3).max(1)
    // contention self-defense (VERDICT r14 ask #5): interleave a one-shot
    // calibration probe every K queries; a query whose min lands >3× its
    // prior-round min WHILE its window's calibration ran hot is a SUSPECT
    // (machine contention, not code) — re-time it once at the end of the
    // sweep and report both, so one contended window can't fake a
    // regression wall (BENCH_r14's 4–6.5× phantom window cost a round's
    // signal and was diagnosable only post-hoc).
    val items = selected.map { case (name, fn) =>
      name -> (() => {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); ()
      })
    }
    val sweep = timedSweep(items, nRuns, CalEvery,
      () => calibrationProbe(spark))
    // priors: the last local full run when present; on a fresh checkout
    // (no untracked bench_result.json) fall back to the newest committed
    // round artifact — absent both, the suspect rule simply disables
    val priors = {
      val primary = priorMinima(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_PRIOR", "bench_result.json"))
      if (primary.nonEmpty) primary else latestRoundPriors(".")
    }
    val suspectQs = suspectNames(sweep, priors)
    val retimed: Map[String, Double] = suspectQs.flatMap { n =>
      items.find(_._1 == n).flatMap { case (_, run) =>
        val t0 = System.nanoTime()
        try { run(); Some(n -> (System.nanoTime() - t0) / 1e9) }
        catch { case _: Throwable => None }
      }
    }.toMap
    // reported min folds the retime in (the uncontended sample IS the
    // better estimate); mean/median stay over the swept runs, and the
    // suspect detail keeps both numbers visible
    val results = sweep.map(r => r.name -> (r.times ++ retimed.get(r.name)))
    // -1 marks a query with zero successful runs (visible, never mistaken
    // for a fast time); failed list makes it machine-readable
    def asJson(rs: Seq[(String, Seq[Double])])(f: Seq[Double] => Double) = rs
      .map { case (k, ts) => "\"" + k + "\":" + (if (ts.isEmpty) -1.0 else f(ts)) }
      .mkString("{", ",", "}")
    def median(ts: Seq[Double]): Double = {
      val s = ts.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // mean/median over the SWEPT runs only (a retime would skew them);
    // min folds the retime in
    val swept = sweep.map(r => r.name -> r.times)
    val qs = asJson(results)(_.min)
    val qsMean = asJson(swept)(ts => ts.sum / ts.size)
    val qsMedian = asJson(swept)(median)
    val failed = results.collect { case (k, ts) if ts.isEmpty => "\"" + k + "\"" }
    val total = results.collect { case (_, ts) if ts.nonEmpty => ts.min }.sum
    // the ingest/maintenance lines time fixed pipelines, not headliners —
    // skip them on a filtered iteration run
    val ingest = if (only.isEmpty) streamIngest(spark, sfDir) else "null"
    val maint = if (only.isEmpty) tableMaintenance(spark, sfDir) else "null"
    val suspectJson = suspectQs.map { n =>
      val sw = sweep.find(_.name == n).map(_.times.min).getOrElse(-1.0)
      "\"" + n + "\":{\"swept\":" + sw + ",\"retimed\":" +
        retimed.getOrElse(n, -1.0) + "}"
    }.mkString("{", ",", "}")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","runs":$nRuns,""" +
      s""""queries":$qs,"queries_mean":$qsMean,"queries_median":$qsMedian,""" +
      s""""suspect":$suspectJson,""" +
      // one sample PER PROBE WINDOW in firing order (probes fire at item
      // 0, CalEvery, 2·CalEvery, …) — distinct values alone hid how many
      // windows ran hot; grouping by the SAME constant the sweep uses keeps
      // the emitted samples honest if the cadence ever changes (ADVICE r16)
      s""""cal_samples":${
        sweep.grouped(CalEvery).map(_.head.calAt).mkString("[", ",", "]")},""" +
      s""""calibration_sec":${calibration(spark)},""" +
      s""""testdata_fingerprint":${testdataFingerprint(spark, sfDir)},""" +
      s""""stream_ingest_sf01":$ingest,""" +
      s""""table_maintenance_sf01":$maint,""" +
      s""""failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}"""
    println(json)
    // sbt frames stdout with [info]/[error] prefixes that can defeat the
    // driver's line parser — also persist the result where it's always
    // machine-readable
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_result.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $out failed: $e") }
    // The round driver keeps only the LAST ~2000 chars of stdout; the full
    // line above is longer, so its head (and the JSON opener) gets cut off
    // and the driver records parsed=null (observed r11+r12). Re-emit the
    // contract's minimal shape — minima rounded to 4 decimals, no
    // mean/median/fingerprint — as the FINAL stdout line so one complete
    // parseable JSON line always survives the tail capture.
    def r4(d: Double): String =
      BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).bigDecimal
        .stripTrailingZeros.toPlainString
    val qsCompact = results
      .map { case (k, ts) => "\"" + k + "\":" + (if (ts.isEmpty) -1.0 else r4(ts.min)) }
      .mkString("{", ",", "}")
    // the compact line carries only the suspect COUNT (the full line and
    // bench_result.json hold names + both timings): the clean-run compact
    // line measures ~1.47k of the 1.5k budget, so even a short name list
    // would blow it on a fully-contended run
    val suspectCompact =
      if (suspectQs.isEmpty) "" else s""","n_suspect":${suspectQs.size}"""
    println(s"""{"metric":"total","value":${r4(total)},"unit":"sec",""" +
      s""""queries":$qsCompact,"failed":${failed.mkString("[", ",", "]")}""" +
      suspectCompact + s""","sf":"$sfDir"}""")
    spark.stop()
  }

  /** One timed sweep item after its run: successful run times plus the
    * calibration sample governing its window (the most recent interleaved
    * probe — contention evidence local to WHEN the query actually ran).
    */
  private[graft] final case class SweepResult(name: String, times: Seq[Double],
                                              calAt: Double)

  /** Time every item `nRuns` times, interleaving a one-shot calibration
    * probe every `calEvery` items. A failed run's elapsed time is NOT a
    * measurement — only successful runs are kept, so one fast failure can't
    * become a reported min.
    */
  private[graft] def timedSweep(items: Seq[(String, () => Unit)], nRuns: Int,
                                calEvery: Int,
                                calProbe: () => Double): Seq[SweepResult] = {
    var lastCal = calProbe()
    items.zipWithIndex.map { case ((name, run), i) =>
      if (i > 0 && i % calEvery == 0) lastCal = calProbe()
      val times = (1 to nRuns).flatMap { _ =>
        val t0 = System.nanoTime()
        try { run(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
      }
      SweepResult(name, times, lastCal)
    }
  }

  /** The suspect rule: flagged iff the query's swept min is >3× its
    * prior-round min AND its window's calibration probe ran >1.5× the
    * run's own calibration floor — BOTH conditions, so a genuine
    * regression under a cool calibration is never masked as contention,
    * and a noisy window without a prior to compare against flags nothing.
    */
  private[graft] def suspectNames(results: Seq[SweepResult],
                                  priors: Map[String, Double]): Seq[String] = {
    val cals = results.map(_.calAt).filter(_ > 0)
    if (cals.isEmpty) return Nil
    val calFloor = cals.min
    results.filter { r =>
      r.times.nonEmpty && r.calAt > 1.5 * calFloor &&
        priors.get(r.name).exists(p => p > 0 && r.times.min > 3 * p)
    }.map(_.name)
  }

  /** Prior-round per-query minima from a persisted bench line (the
    * `bench_result.json` the previous full run wrote) — {} when absent or
    * unparseable, which simply disables the suspect rule.
    */
  private[graft] def priorMinima(path: String): Map[String, Double] = try {
    val s = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    val key = "\"queries\":{"
    val i = s.indexOf(key)
    if (i < 0) return Map.empty
    val start = i + key.length
    val end = s.indexOf('}', start)
    if (end < 0) return Map.empty
    s.substring(start, end).split(',').flatMap { kv =>
      val p = kv.split(':')
      if (p.length != 2) None
      else p(1).trim.toDoubleOption.filter(_ > 0)
        .map(v => p(0).trim.stripPrefix("\"").stripSuffix("\"") -> v)
    }.toMap
  } catch { case _: Throwable => Map.empty }

  /** Newest committed round artifact's per-query minima (`BENCH_r<N>.json`
    * with a parsed `queries` object — the driver writes one per round) —
    * the fresh-checkout fallback for [[priorMinima]].
    */
  private[graft] def latestRoundPriors(dir: String): Map[String, Double] = try {
    val d = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(d)) return Map.empty
    val rounds = scala.util.Using.resource(java.nio.file.Files.list(d))(
      _.toArray.map(_.toString))
      .flatMap { p =>
        val name = java.nio.file.Paths.get(p).getFileName.toString
        "BENCH_r(\\d+)\\.json".r.findFirstMatchIn(name)
          .map(m => m.group(1).toInt -> p)
      }
      .sortBy(-_._1)
    rounds.iterator.map(r => priorMinima(r._2)).find(_.nonEmpty)
      .getOrElse(Map.empty)
  } catch { case _: Throwable => Map.empty }

  /** Interleaved calibration probe: one UNTIMED warmup run then the min
    * of 2 timed runs of the same no-I/O range aggregation [[calibration]]
    * uses. r15's one-shot probe spanned 0.15–0.42s on a CLEAN run (codegen
    * warmup + GC noise), so its >1.5×-floor condition fired on most
    * windows and the suspect rule leaned on the 3×-prior condition alone;
    * warmup + min-of-2 keeps clean-run samples within ~1.5× of the floor,
    * making the contention evidence discriminating on its own.
    */
  private[graft] def calibrationProbe(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions.{sum => fsum, col}
    def run(): Unit =
      spark.range(0, 50000000L, 1, 32)
        .select(fsum(col("id") % 7).as("s"), fsum(col("id") * 3 % 11).as("t"))
        .write.format("noop").mode("overwrite").save()
    try {
      run() // warmup — never timed
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }.min
    } catch { case _: Throwable => -1.0 }
  }

  /** Fixed no-I/O calibration (VERDICT r9 ask #5): a pure in-memory
    * `spark.range` aggregation whose data never changes, so its time
    * measures THIS RUN's scheduling + codegen + CPU floor. Comparing
    * `calibration_sec` across rounds separates run-environment drift (the
    * calibration moves with everything else) from code/data regressions
    * (the calibration holds while specific queries move). min of 3 runs
    * after one warmup, same estimator as the headliners.
    */
  private[graft] def calibration(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions.{sum => fsum, col}
    def run(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 50000000L, 1, 32)
        .select(fsum(col("id") % 7).as("s"), fsum(col("id") * 3 % 11).as("t"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    try { run(); (1 to 3).map(_ => run()).min }
    catch { case _: Throwable => -1.0 }
  }

  /** Which data this run actually measured (VERDICT r9 ask #5): per-table
    * file size + mtime, plus the PRE-normalization `events.ts` type (the
    * driver's regeneration has flipped it twice; r9's verdict burned judge
    * time proving a 1.33× mean inflation was data-shift, not code-shift).
    * Returns a JSON object string; {} on any failure.
    */
  private[graft] def testdataFingerprint(spark: SparkSession, sfDir: String): String =
    try {
      val dir = java.nio.file.Paths.get(sfDir)
      val tables = scala.util.Using.resource(java.nio.file.Files.list(dir))(
        _.toArray.map(_.toString))
        .filter(_.endsWith(".parquet")).sorted
      val parts = tables.map { p =>
        val path = java.nio.file.Paths.get(p)
        val name = path.getFileName.toString
        val extra = if (name == "events.parquet") {
          val t = spark.read.parquet(p).schema.fields
            .find(_.name == "ts").map(_.dataType.typeName).getOrElse("absent")
          s""","ts_type":"$t""""
        } else ""
        s""""$name":{"size":${java.nio.file.Files.size(path)},""" +
          s""""mtime":${java.nio.file.Files.getLastModifiedTime(path).toMillis}$extra}"""
      }
      parts.mkString("{", ",", "}")
    } catch { case _: Throwable => "{}" }

  /** Steady-state STORAGE-LAYER cost, the maintenance loop every lakehouse
    * table pays forever (reference M1–M3, `spark_batch.py:408-432`):
    * 8 bucket-scoped merges over the full events fixture (rows/s), then 8
    * snapshot-incremental appends onto a lineage-style table (the append
    * path is what fragments leaf dirs — merges rewrite whole buckets), then
    * the maintenance pass itself — compact (bin-pack fragmented buckets),
    * expire_snapshots, remove_orphan_files — each timed separately so a
    * regression in any phase is visible in BENCH rather than only in
    * correctness specs. Returns a JSON object string; rows:-1 on failure.
    */
  private[graft] def tableMaintenance(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions.{col, max}
    try {
      val parsed = Queries.parsedEvents(Tables.load(spark, sfDir, "events"))
        .select("user_id", "event_id", "event_type", "value", "operation")
        .localCheckpoint(true)
      val nRows = parsed.count()
      val tmp = java.nio.file.Files.createTempDirectory("graft_maint_bench_")
      tmp.toFile.deleteOnExit()
      // prep (untimed): entity table at its folded final state, bucketed
      val entity = new graft.cdc.KeyedParquetTable(
        spark, s"$tmp/entity", Seq("user_id"), Nil, 16)
      entity.commit(graft.cdc.Merge.foldFinalState(parsed, Seq("user_id"),
        Seq(col("event_id").desc)).drop("operation"))
      val nB = 8L
      // phase 1: bucket-scoped merge cadence (every batch touches a wide
      // key spread — the steady-state worst case for scoped rewrites)
      val t0 = System.nanoTime()
      (0L until nB).foreach { b =>
        val latest = graft.ops.Dedup.dedupLatest(
          parsed.filter(col("event_id") % nB === b),
          Seq("user_id"), Seq(col("event_id").desc))
        entity.merge(latest, "operation", None)
      }
      val mergeSec = (System.nanoTime() - t0) / 1e9
      // phase 2: append-only lineage table — each append lands one file
      // set per touched bucket, fragmenting leaf dirs
      val lineage = new graft.cdc.KeyedParquetTable(
        spark, s"$tmp/lineage", Seq("event_id"), Nil, 16)
      lineage.commit(parsed.drop("operation").limit(0))
      val t1 = System.nanoTime()
      (0L until nB).foreach { b =>
        lineage.append(parsed.filter(col("event_id") % nB === b).drop("operation"))
      }
      val appendSec = (System.nanoTime() - t1) / 1e9
      def nFiles(t: graft.cdc.KeyedParquetTable): Long = {
        val dir = java.nio.file.Paths.get(t.root, s"v${t.currentVersion}")
        var n = 0L
        java.nio.file.Files.walk(dir).forEach(p =>
          if (p.toString.endsWith(".parquet")) n += 1)
        n
      }
      val filesBefore = nFiles(lineage)
      // phase 2b: merge-on-read compliance wipe on the merged entity table —
      // commits a delete key set with every data file hard-linked (the
      // O(matched keys) shape), then one read through the anti-join
      val liveBefore = entity.read().count() // untimed baseline
      val t2b = System.nanoTime()
      entity.deleteWhere(col("value") > 95.0)
      val liveAfter = entity.read().count() // timed: read through the anti-join
      val morSec = (System.nanoTime() - t2b) / 1e9
      val morDeleted = liveBefore - liveAfter
      // phase 3: the maintenance pass itself
      val t2 = System.nanoTime()
      lineage.compact(minInputFiles = 5)
      val compactSec = (System.nanoTime() - t2) / 1e9
      val filesAfter = nFiles(lineage)
      val t3 = System.nanoTime()
      val expired = entity.expireSnapshots(0L, retainLast = 2).size +
        lineage.expireSnapshots(0L, retainLast = 2).size
      val expireSec = (System.nanoTime() - t3) / 1e9
      val t4 = System.nanoTime()
      val orphans = entity.removeOrphanFiles().size + lineage.removeOrphanFiles().size
      val orphanSec = (System.nanoTime() - t4) / 1e9
      // phase 4: the AUTO-OPTIMIZE tick (advise → act → re-advise) on the
      // entity table, which still carries the MoR delete debt phase 2b
      // left — one call converges it; auto_cleared records convergence
      val t5 = System.nanoTime()
      val autoPlan = graft.validate.Validation.autoMaintain(entity)
      val autoCleared = graft.validate.Validation.maintenancePlan(entity)
        .forall(_._2 == "routine")
      val autoSec = (System.nanoTime() - t5) / 1e9
      s"""{"rows":$nRows,"merge_sec":$mergeSec,""" +
        s""""merge_rows_per_sec":${nRows / mergeSec},""" +
        s""""append_sec":$appendSec,""" +
        s""""mor_delete_sec":$morSec,"mor_deleted_rows":$morDeleted,""" +
        s""""compact_sec":$compactSec,""" +
        s""""files_before_compact":$filesBefore,"files_after_compact":$filesAfter,""" +
        s""""expired_snapshots":$expired,"expire_sec":$expireSec,""" +
        s""""orphans_removed":$orphans,"orphan_sec":$orphanSec,""" +
        s""""auto_maintain_sec":$autoSec,"auto_actions":${autoPlan.size},""" +
        s""""auto_cleared":$autoCleared}"""
    } catch { case e: Throwable =>
      System.err.println(s"[bench] table_maintenance failed: ${e.getMessage}")
      """{"rows":-1}"""
    }
  }

  /** End-to-end streaming ingest throughput: the events fixture serialized
    * to CDC envelope files (untimed prep), then drained through the full
    * production path — file stream source → from_json parse → operation
    * classify → per-batch dedup → bucket-scoped merge with lineage
    * accounting ([[graft.streaming.Ingest.drainAvailable]], the structured
    * twin of the reference's poll-until-empty loop,
    * `spark_exactly_once.py:399-562`). 8 files × maxFilesPerTrigger=1 →
    * 8 micro-batches, so the measured window covers steady-state batch
    * cadence (merge, replay probe, lineage append), not one mega-batch.
    * Returns a JSON object string; {"rows":-1} on failure (bench must
    * never die on one case).
    */
  private def streamIngest(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    try {
      val events = Tables.load(spark, sfDir, "events")
      val tmp = java.nio.file.Files.createTempDirectory("graft_ingest_bench_")
      tmp.toFile.deleteOnExit()
      val nFiles = 8
      Queries.eventsAsEnvelopes(events).repartition(nFiles)
        .write.mode("overwrite").parquet(s"$tmp/raw")
      val nRows = events.count()
      val raw = spark.readStream
        .schema(StructType(Seq(StructField("__raw", StringType))))
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$tmp/raw")
      val parsed = graft.cdc.CdcParse
        .parseEnvelope(raw, "__raw", Queries.eventsEnvelopeSchema)
        .withColumn("operation",
          graft.cdc.CdcParse.classifyOperation(col("__deleted"), col("user_id")))
        .drop("__deleted")
      val table = new graft.cdc.KeyedParquetTable(
        spark, s"$tmp/state", Seq("user_id"), Nil, 16)
      table.commit(Queries.parsedEvents(events).drop("operation").limit(0))
      val lineage = new graft.cdc.KeyedParquetTable(
        spark, s"$tmp/lineage", Seq("batch_id"), Nil, 8)
      val t0 = System.nanoTime()
      graft.streaming.Ingest.drainAvailable(parsed, table,
        Seq(col("event_id").desc), s"$tmp/ckpt", Some(lineage))
        .awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      s"""{"rows":$nRows,"sec":$sec,"rows_per_sec":${nRows / sec}}"""
    } catch { case e: Throwable =>
      System.err.println(s"[bench] stream_ingest failed: ${e.getMessage}")
      """{"rows":-1,"sec":-1,"rows_per_sec":-1}"""
    }
  }
}
