package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.cdc.KeyedParquetTable

/** Pipeline-consistency validation library — the reference's eight checks
  * (`/root/reference/src/validation/validation.py:209-937`) re-expressed as
  * distributed, scale-safe DataFrame programs, plus the three checks the
  * reference declares but never implements (`validation.py:862,872,873`).
  *
  * Scale-safety deltas vs the reference (SURVEY.md §7.4):
  *  - checksum is order-independent (bit_xor/sum of row hashes), not a
  *    sort + collect_list single-node fingerprint (validation.py:297-302),
  *    which is both a latent ordering bug and a driver OOM at 100 TB;
  *  - sample consistency is ONE anti-join, not N per-key filter().collect()
  *    scans (validation.py:389-410);
  *  - lag comparison is a real equi-join, not a driver-side set intersect
  *    (validation.py:559-575).
  */
object Validation {

  final case class CheckResult(
      check: String,
      valid: Boolean,
      details: Map[String, String])

  /** Unambiguous per-value encoding for row fingerprints: NULL gets its own
    * marker distinct from '', every value is length-prefixed so a separator
    * character inside a value cannot shift field boundaries (('a#','b') vs
    * ('a','#b') must fingerprint differently — corruption that swaps them
    * must NOT pass validation). Same scheme as
    * [[graft.cdc.KeyedParquetTable.changesBetween]].
    */
  private def enc(c: Column): Column = {
    val s = c.cast("string")
    when(c.isNull, lit("N")).otherwise(concat(length(s).cast("string"), lit(":"), s))
  }

  /** SQL-text form of [[enc]] (for Observation metrics, which take exprs). */
  private def encSql(c: String): String = {
    val q = "`" + c.replace("`", "``") + "`"
    s"CASE WHEN $q IS NULL THEN 'N' ELSE CONCAT(CAST(LENGTH(CAST($q AS STRING)) AS STRING), ':', CAST($q AS STRING)) END"
  }

  // --- V0: in-flight observation ---------------------------------------------

  /** Attach zero-extra-pass statistics to a frame via Spark's Observation
    * API: row count, null-key count, and a dual bit_xor content checksum
    * ride the SAME action that materializes the frame (a write, a merge) —
    * no second scan. At 100 TB a separate validation pass re-reads the
    * table; this gets the numbers for free while the data streams through.
    *
    * Usage: `val (obs, frame) = observedStats(df, keys, cols);
    * frame.write...; obs.get` — `get` blocks until the action finishes and
    * returns row_count / null_keys / checksum / checksum2.
    */
  def observedStats(df: DataFrame, keys: Seq[String],
                    columns: Seq[String]): (org.apache.spark.sql.Observation, DataFrame) = {
    val obs = org.apache.spark.sql.Observation()
    val fpSql = "xxhash64(concat_ws('#', " +
      columns.map(encSql).mkString(", ") + "))"
    // empty keys: a plausible count+checksum-only call, not an error
    val nullKey =
      if (keys.isEmpty) lit(false)
      else keys.map(k => col(k).isNull).reduce(_ || _)
    val observed = df.observe(obs,
      count(lit(1)).as("row_count"),
      sum(when(nullKey, 1L).otherwise(0L)).as("null_keys"),
      expr(s"bit_xor($fpSql)").as("checksum"),
      expr(s"bit_xor(xxhash64($fpSql, 1))").as("checksum2"))
    (obs, observed)
  }

  // --- V1: row count ---------------------------------------------------------

  /** Row-count drift between source and sink; valid if |diff| ≤ tolerance
    * fraction (reference default 0.1%, validation.py:236).
    */
  def rowCount(source: DataFrame, sink: DataFrame, tolerance: Double = 0.001): CheckResult = {
    val (s, k) = (source.count(), sink.count())
    val drift = if (s == 0) (if (k == 0) 0.0 else 1.0) else math.abs(s - k).toDouble / s
    CheckResult("row_count", drift <= tolerance,
      Map("source" -> s.toString, "sink" -> k.toString, "drift" -> drift.toString))
  }

  // --- V2: checksum ----------------------------------------------------------

  /** Order-independent fingerprint of (a projection of) a DataFrame: per-row
    * xxhash64 over '#'-joined string-cast columns, combined with two
    * independent bit_xor folds (two hash seeds — xor alone is weak to paired
    * corruption; a sum would overflow under ANSI mode). One pass, no sort,
    * no driver materialization — valid at any scale.
    */
  def tableChecksum(df: DataFrame, columns: Seq[String]): (Long, Long, Long) = {
    val fp = xxhash64(concat_ws("#", columns.map(c => enc(col(c))): _*))
    val row = df.select(fp.as("h"), xxhash64(fp, lit(1)).as("h2"))
      .agg(expr("bit_xor(h)").as("x"), expr("bit_xor(h2)").as("x2"),
        count(lit(1)).as("n"))
      .head()
    (if (row.isNullAt(0)) 0L else row.getLong(0),
      if (row.isNullAt(1)) 0L else row.getLong(1), row.getLong(2))
  }

  /** Exact-MD5 mode (reference parity, validation.py:297-302, minus its
    * ordering bug): md5 over the SORTED concatenation of row fingerprints.
    * `sort_array(collect_list(...))` makes the result order-independent and
    * byte-identical to `MD5(STRING_AGG(fp, ',' ORDER BY fp))` on the SQL
    * side. Small-table mode only — the row list materializes in one task;
    * use [[tableChecksum]] at scale.
    */
  def orderedMd5Checksum(df: DataFrame, columns: Seq[String],
                         maxRows: Long = 10000000L): String =
    orderedMd5ChecksumDf(df, columns, maxRows).head().getString(0)

  /** One-row DataFrame form of [[orderedMd5Checksum]] (column `checksum`).
    * Guarded: `sort_array∘collect_list` materializes every row fingerprint
    * in ONE task, so pointing it at a big table would OOM an executor
    * rather than degrade gracefully. Counting first costs one cheap
    * count-only scan and converts that failure mode into a loud error
    * directing callers to the scale path ([[tableChecksum]]).
    */
  def orderedMd5ChecksumDf(df: DataFrame, columns: Seq[String],
                           maxRows: Long = 10000000L): DataFrame = {
    val n = df.count()
    require(n <= maxRows,
      s"orderedMd5Checksum is single-task small-table mode: $n rows exceeds " +
        s"limit $maxRows; use tableChecksum / q_global_checksum at scale")
    val fp = concat_ws("#", columns.map(c => enc(col(c))): _*)
    df.select(fp.as("fp"))
      .agg(md5(concat_ws(",", sort_array(collect_list(col("fp"))))).as("checksum"))
  }

  /** Checksum equality of the shared columns of two tables. */
  def checksum(source: DataFrame, sink: DataFrame, columns: Seq[String]): CheckResult = {
    val a = tableChecksum(source, columns)
    val b = tableChecksum(sink, columns)
    CheckResult("checksum", a == b, Map("source" -> a.toString, "sink" -> b.toString))
  }

  // --- V3: sample consistency ------------------------------------------------

  /** Deterministic keyed sample of `source` probed against `sink` with one
    * left-anti join; valid if ≥ minMatchRate of sampled keys exist exactly
    * once in the sink (reference: ≥99%, validation.py:419).
    */
  def sampleConsistency(source: DataFrame, sink: DataFrame, keys: Seq[String],
                        sampleMod: Long = 101L,
                        minMatchRate: Double = 0.99): CheckResult = {
    val keyHash = abs(xxhash64(keys.map(col): _*))
    val sample = source.select(keys.map(col): _*).filter(keyHash % sampleMod === 0)
    val n = sample.count()
    val missing = sample.join(sink, keys, "left_anti").count()
    val dupes = sample.join(
      sink.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n")).filter(col("__n") > 1),
      keys, "left_semi").count()
    val matched = n - missing - dupes
    val rate = if (n == 0) 1.0 else matched.toDouble / n
    CheckResult("sample_data", rate >= minMatchRate,
      Map("sampled" -> n.toString, "missing" -> missing.toString,
        "duplicated" -> dupes.toString, "match_rate" -> rate.toString))
  }

  // --- V5: combined lag ------------------------------------------------------

  /** End-to-end lag: equi-join source/sink on key, average sink-minus-source
    * timestamp delta over the most recent window; valid if avg ≤ maxAvgLagSec
    * (reference: 300 s over last 30 min, validation.py:520,582).
    */
  def combinedLag(source: DataFrame, sink: DataFrame, keys: Seq[String],
                  srcTs: String, sinkTs: String,
                  maxAvgLagSec: Double = 300.0): CheckResult = {
    val joined = source.select((keys.map(col) :+ col(srcTs).as("__src_ts")): _*)
      .join(sink.select((keys.map(col) :+ col(sinkTs).as("__sink_ts")): _*), keys)
      .withColumn("__lag",
        col("__sink_ts").cast("double") - col("__src_ts").cast("double"))
    // avg over NON-NULL lags only: SUM/COUNT(*) would divide by rows whose
    // timestamps failed the cast, biasing the average low (a false pass)
    val row = joined.agg(
      avg(col("__lag")).as("avg"),
      min("__lag").as("min"), max("__lag").as("max"),
      count(lit(1)).as("n"), count(col("__lag")).as("n_lag")).head()
    val n = row.getLong(3)
    val nLag = row.getLong(4)
    val avgLag = if (nLag == 0) 0.0 else row.getDouble(0)
    // matched rows whose lag is uncomputable (null/uncastable ts) mean the
    // check cannot actually verify freshness — that is a failure, not a pass
    val valid = if (n == 0) true else nLag == n && avgLag <= maxAvgLagSec
    CheckResult("combined_lag", valid,
      Map("avg_lag_sec" -> avgLag.toString, "n_matched" -> n.toString,
        "n_null_lag" -> (n - nLag).toString))
  }

  // --- V7: table health ------------------------------------------------------

  /** Health of a [[KeyedParquetTable]]: snapshot count, stale snapshots,
    * file-count fragmentation, partition balance. Score 100 minus deductions,
    * Good ≥90 / Warning ≥70 (reference bands, validation.py:800-805).
    */
  def tableHealth(table: KeyedParquetTable, partitionCols: Seq[String] = Nil,
                  staleAfterMs: Long = 7L * 24 * 3600 * 1000): CheckResult = {
    var score = 100
    val hist = table.history().collect()
    val nSnapshots = hist.length
    val now = System.currentTimeMillis()
    val old = hist.count(r => r.getTimestamp(1).getTime < now - staleAfterMs && !r.getBoolean(2))
    if (old > 5) score -= 20
    val nFiles = table.files().count()
    if (nFiles > 100) score -= 15
    var skew = 0.0
    if (partitionCols.nonEmpty) {
      val counts = table.read().groupBy(partitionCols.map(col): _*)
        .agg(count(lit(1)).as("cnt"))
        .agg(min("cnt").as("mn"), max("cnt").as("mx"),
          expr("CAST(SUM(cnt) AS DOUBLE)/COUNT(*)").as("av")).head()
      // an empty table aggregates to one all-null row — healthy, not an NPE
      if (!counts.isNullAt(2) && counts.getDouble(2) > 0) {
        skew = counts.getLong(1).toDouble / math.max(counts.getDouble(2), 1.0)
        if (skew > 10) score -= 15
      }
    }
    val level = if (score >= 90) "Good" else if (score >= 70) "Warning" else "Poor"
    CheckResult("table_health", score >= 70,
      Map("score" -> score.toString, "level" -> level,
        "snapshots" -> nSnapshots.toString, "old_snapshots" -> old.toString,
        "files" -> nFiles.toString, "partition_skew" -> skew.toString))
  }

  /** RETENTION OVERHEAD: bytes held EXCLUSIVELY by non-current retained
    * snapshots — exactly what expiring all history would reclaim, computed
    * hard-link aware via [[KeyedParquetTable.storageFootprint]] (shared
    * inodes cost nothing extra on this layout, so a naive per-dir sum
    * overstates overhead by the retention depth). Pass while reclaimable ≤
    * `maxRatio` × the current snapshot's bytes; Warning above half the
    * bound. Driver-side metadata walk, no Spark job — safe on a schedule.
    */
  def retentionOverhead(table: KeyedParquetTable,
                        maxRatio: Double = 2.0): CheckResult = {
    val fp = table.storageFootprint().collect()
    val cur = fp.find(_.getBoolean(4)).map(_.getLong(2)).getOrElse(0L)
    val reclaimable = fp.filterNot(_.getBoolean(4)).map(_.getLong(3)).sum
    val ratio = if (cur == 0L) 0.0 else reclaimable.toDouble / cur
    val level =
      if (ratio <= maxRatio / 2) "Good"
      else if (ratio <= maxRatio) "Warning" else "Poor"
    CheckResult("retention_overhead", ratio <= maxRatio,
      Map("reclaimable_bytes" -> reclaimable.toString,
        "current_bytes" -> cur.toString,
        "ratio" -> ratio.toString, "max_ratio" -> maxRatio.toString,
        "retained_snapshots" -> fp.length.toString, "level" -> level))
  }

  /** MERGE-ON-READ DELETE DEBT: how many keys the table's pending delete
    * set shadows. Every key taxes reads with the anti-join probe until
    * maintenance materializes it (compaction rewrites delete-carrying
    * buckets), so a maintainer alerts well before the set rivals the data:
    * pass while `n ≤ maxKeys`, Warning above 50% of the bound. Cost is
    * O(set) — one read of the `_deletes` parquet, never a data scan.
    */
  def morDeleteDebt(table: KeyedParquetTable,
                    maxKeys: Long = 100000L): CheckResult = {
    val n = table.pendingDeleteKeys().count()
    val level =
      if (n <= maxKeys / 2) "Good" else if (n <= maxKeys) "Warning" else "Poor"
    CheckResult("mor_delete_debt", n <= maxKeys,
      Map("n_delete_keys" -> n.toString, "max_keys" -> maxKeys.toString,
        "level" -> level))
  }

  /** MAINTENANCE ADVISOR: turn the storage-health trio into an ordered
    * action plan — the policy layer an auto-OPTIMIZE scheduler consumes
    * ("what should maintenance do NEXT on this table, and how urgently").
    * Pure composition of the existing metrics (each already scale-safe:
    * metadata walks and O(set) reads, no data scans), so advising is as
    * cheap as checking. Emitted actions map 1:1 onto the table's own
    * maintenance surface:
    *
    *   compact           ← file-count fragmentation (tableHealth)
    *   compact           ← merge-on-read delete debt (morDeleteDebt —
    *                        compaction materializes delete-carrying buckets)
    *   expire_snapshots  ← reclaimable retention bytes (retentionOverhead)
    *   remove_orphans    ← always-safe sweep, advised last
    *
    * Ordering: Poor before Warning before routine; a healthy table yields
    * only the routine orphan sweep. Returns (action, urgency, reason)
    * rows — urgency ∈ {now, soon, routine}.
    */
  def maintenancePlan(table: KeyedParquetTable,
                      maxFiles: Long = 100L,
                      maxDeleteKeys: Long = 100000L,
                      maxRetentionRatio: Double = 2.0): Seq[(String, String, String)] = {
    def urgency(level: String): Option[String] = level match {
      case "Poor" => Some("now")
      case "Warning" => Some("soon")
      case _ => None
    }
    val plan = scala.collection.mutable.ArrayBuffer[(String, String, String)]()
    val nFiles = table.files().count()
    val fileLevel =
      if (nFiles > maxFiles * 2) "Poor"
      else if (nFiles > maxFiles) "Warning" else "Good"
    urgency(fileLevel).foreach(u => plan += (("compact", u,
      s"$nFiles data files (bound $maxFiles): scan planning and open cost " +
        "grow with file count")))
    val debt = morDeleteDebt(table, maxDeleteKeys)
    urgency(debt.details("level")).foreach(u => plan += (("compact", u,
      s"${debt.details("n_delete_keys")} pending merge-on-read delete keys " +
        "tax every read with the anti-join probe until compaction " +
        "materializes them")))
    val ret = retentionOverhead(table, maxRetentionRatio)
    urgency(ret.details("level")).foreach(u => plan += (("expire_snapshots", u,
      s"${ret.details("reclaimable_bytes")} bytes held only by history " +
        s"(${ret.details("ratio")}× the live snapshot)")))
    val ordered = plan.sortBy { case (_, u, _) => if (u == "now") 0 else 1 }
    (ordered += (("remove_orphans", "routine",
      "always-safe sweep of files no retained snapshot references"))).toSeq
  }

  /** AUTO-OPTIMIZE: consume [[maintenancePlan]] and ACT on it — the
    * execution half the advisor was missing (the reference schedules its
    * `optimize_iceberg_table` instead of leaving it dead,
    * `spark_batch.py:408-432`; this is that scheduler's single tick).
    * Executes the plan's distinct actions in its order (now → soon →
    * routine) through the table's own maintenance surface:
    *
    *   compact           → [[KeyedParquetTable.compact]] (minInputFiles=2:
    *                        auto mode exists to clear the advice, and the
    *                        debt-driven compact must run even on a
    *                        lightly-fragmented table — compaction is where
    *                        merge-on-read deletes become physical)
    *   expire_snapshots  → [[KeyedParquetTable.expireSnapshots]](0,
    *                        retainLast) — tag-pinned snapshots survive, so
    *                        "aggressive" still honors every reproducibility
    *                        promise; default retainLast=1 matches Iceberg's
    *                        expire_snapshots floor
    *   remove_orphans    → [[KeyedParquetTable.removeOrphanFiles]]
    *
    * The plan's urgency order is scheduling PRIORITY (what to do first if
    * you can only afford one action); a single tick executing everything
    * runs the fixed physical order compact → expire → orphans instead —
    * compact COMMITS a new snapshot, so expiring before compacting would
    * leave the pre-compact state retained and the retention advice
    * un-cleared; orphan sweep last collects anything the first two strand.
    *
    * Convergence contract: after one pass on a table whose problems are
    * fixable by these actions, re-advising yields an all-routine plan
    * (ValidationSpec asserts it on a fragmented+debt+retention table).
    * Returns the executed (action, urgency, reason) rows.
    */
  def autoMaintain(table: KeyedParquetTable,
                   maxFiles: Long = 100L,
                   maxDeleteKeys: Long = 100000L,
                   maxRetentionRatio: Double = 2.0,
                   retainLast: Int = 1): Seq[(String, String, String)] = {
    val plan = maintenancePlan(table, maxFiles, maxDeleteKeys, maxRetentionRatio)
    val advised = plan.map(_._1).toSet
    advised.foreach {
      case "compact" | "expire_snapshots" | "remove_orphans" => ()
      case other => throw new IllegalStateException(
        s"maintenancePlan advised unknown action '$other'")
    }
    if (advised("compact")) table.compact(minInputFiles = 2)
    if (advised("expire_snapshots")) table.expireSnapshots(0L, retainLast = retainLast)
    if (advised("remove_orphans")) table.removeOrphanFiles()
    plan
  }

  // --- the three checks the reference declares but never defines -------------

  /** Data freshness: newest event in `tsCol` no older than maxAgeSec
    * (reference's undefined `check_data_freshness`, validation.py:862).
    */
  def freshness(df: DataFrame, tsCol: String, nowEpochSec: Double,
                maxAgeSec: Double = 3600.0): CheckResult = {
    val row = df.agg(max(col(tsCol).cast("double")).as("newest")).head()
    val newest = if (row.isNullAt(0)) Double.NegativeInfinity else row.getDouble(0)
    val age = nowEpochSec - newest
    CheckResult("data_freshness", age <= maxAgeSec,
      Map("age_sec" -> age.toString))
  }

  /** CDC message accounting per operation type (reference's undefined
    * `track_cdc_messages`/`track_cdc_event_types`, validation.py:872-873).
    */
  def cdcEventTypeCounts(cdc: DataFrame, opCol: String = "operation"): DataFrame =
    cdc.groupBy(opCol).agg(count(lit(1)).as("n"))

  /** Upstream schema-drift check over a raw envelope batch: payload field
    * names the declared envelope schema doesn't know (an upstream ALTER
    * TABLE surfacing mid-stream — the condition
    * [[graft.streaming.Ingest.applyRawBatchEvolving]] absorbs and a
    * non-evolving pipeline silently LOSES, because `from_json` drops
    * unknown fields without a trace). Valid ⇔ no drift; details carry the
    * drifted names so an operator can decide evolve-vs-alert. One
    * distinct job over the batch ([[graft.cdc.CdcParse.payloadFieldNames]]),
    * O(field names) driver data.
    */
  def schemaDriftCheck(raw: DataFrame,
                       schema: org.apache.spark.sql.types.StructType,
                       valueCol: String = "value"): CheckResult = {
    val declared = schema("payload").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSet
    val drifted = graft.cdc.CdcParse.payloadFieldNames(raw, valueCol)
      .filterNot(f => declared(f) || f.startsWith("__"))
    CheckResult("schema_drift", drifted.isEmpty,
      Map("drifted_fields" -> drifted.mkString(","),
        "n_drifted" -> drifted.size.toString))
  }

  /** Distribution drift between two retained snapshots of a maintained
    * histogram table ([[graft.ops.LogHistogram]] buckets in the key column,
    * counts in `n_rows` — the shape `IncrementalAgg.applyBatch` keyed on
    * the bucket maintains): total-variation-style L1 distance
    * Σ|p_a − p_b| over the union of buckets, in [0, 2]. 0 = identical
    * shapes, 2 = disjoint supports. The per-version reads are O(buckets)
    * to the driver — histogram size, never data size — so the check costs
    * the same whether the table summarizes 10^4 or 10^12 values; an empty
    * snapshot is treated as a point mass on nothing (drift 2 vs any
    * non-empty one, 0 vs another empty).
    */
  def histogramDrift(table: KeyedParquetTable, vA: Long, vB: Long,
                     bucketCol: String = "bucket",
                     countCol: String = "n_rows"): Double = {
    def histOf(v: Long): Map[Long, Long] =
      table.readVersion(v).select(col(bucketCol).cast("long"), col(countCol).cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (a, b) = (histOf(vA), histOf(vB))
    val (ta, tb) = (a.values.sum.toDouble, b.values.sum.toDouble)
    if (ta == 0 && tb == 0) return 0.0
    if (ta == 0 || tb == 0) return 2.0
    (a.keySet ++ b.keySet).iterator.map { k =>
      math.abs(a.getOrElse(k, 0L) / ta - b.getOrElse(k, 0L) / tb)
    }.sum
  }

  /** [[histogramDrift]] as a banded check: drift above `maxDrift` fails —
    * the "did this batch change the value distribution" guard a pipeline
    * runs after each maintenance fold.
    */
  def distributionCheck(table: KeyedParquetTable, vA: Long, vB: Long,
                        maxDrift: Double = 0.25): CheckResult = {
    val d = histogramDrift(table, vA, vB)
    CheckResult("distribution_drift", d <= maxDrift,
      Map("l1_drift" -> d.toString, "max" -> maxDrift.toString))
  }

  // --- V8: suite composition -------------------------------------------------

  /** Run a set of checks, band the overall result like the reference
    * (Good ≥95% pass, Warning ≥80%, validation.py:913-918).
    */
  def suite(checks: Seq[CheckResult]): (String, Double, Seq[CheckResult]) = {
    val rate = if (checks.isEmpty) 1.0
      else checks.count(_.valid).toDouble / checks.length
    val band = if (rate >= 0.95) "Good" else if (rate >= 0.80) "Warning" else "Poor"
    (band, rate, checks)
  }
}
