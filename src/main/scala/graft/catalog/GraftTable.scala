package graft.catalog

import java.util.{Set => JSet}

import scala.jdk.CollectionConverters._
import scala.util.Try

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TruncatableTable}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.cdc.KeyedParquetTable

/** How a catalog-resolved read is pinned in time: the SQL time-travel
  * clauses (`VERSION AS OF` / `TIMESTAMP AS OF`) map onto the engine's own
  * snapshot/tag/as-of reads.
  */
private[catalog] sealed trait Pin
private[catalog] object Pin {
  case object Current extends Pin
  final case class Version(v: Long) extends Pin
  final case class Tag(name: String) extends Pin
  final case class AsOf(epochMs: Long) extends Pin
}

/** DSv2 face of a [[graft.cdc.KeyedParquetTable]] — what makes the engine
  * SQL-addressable the way the reference is (its whole query interface is
  * `spark.sql(...)` strings resolved through a catalog: MERGE INTO at
  * `/root/reference/src/processor/spark_batch.py:273-280`, DDL at
  * `spark_batch.py:71-96`, metadata at `validation.py:731-740`).
  *
  * Read path: [[V1Scan]] over the table's OWN read plan. This is a
  * deliberate architectural choice, not a shortcut — `KeyedParquetTable`
  * reads are already full DataFrame plans carrying semantics a raw
  * file-scan delegate would silently drop (merge-on-read delete
  * anti-joins, rename-history coalesce resolution, declared-schema
  * evolution, file-less snapshots), so the scan re-USES that plan and the
  * V1 bridge hands Spark its RDD. Pushdown still reaches the engine's
  * physical pruning BEFORE any row materializes: bucket-key equalities
  * select bucket directories ([[KeyedParquetTable.readForKeys]] — the
  * two-level bucket × file-stats prune), stats-column ranges select files
  * ([[KeyedParquetTable.readRangePruned]]), and every pushed predicate is
  * also applied INSIDE the inner plan, where Catalyst forwards it to the
  * vectorized parquet scan. The Row boundary therefore costs one
  * InternalRow→Row→InternalRow hop ONLY for rows that survive pruning and
  * filtering — the same rows a native DSv2 Batch would have emitted.
  *
  * Write path: [[V1Write]] → the table's transactional surface:
  * INSERT INTO appends a snapshot-incremental commit
  * ([[KeyedParquetTable.append]]), INSERT OVERWRITE (truncate) commits a
  * full replacement — both atomic pointer-swing commits with CHECK
  * constraints enforced inside the write plan.
  */
final class GraftTable(val kpt: KeyedParquetTable, ident: String, pin: Pin)
    extends Table with SupportsRead with SupportsWrite with TruncatableTable
    with org.apache.spark.sql.graftbridge.V1FallbackTable {

  override def name(): String = ident

  /** Claims Spark's native `DataStreamWriter.toTable("graft.ns.t")` path:
    * a table exposing this fallback routes the streaming write into its V1
    * provider + location — i.e. the engine's own `graft-table` sink
    * (exactly-once per the `_txns` replay ledger, merge/append/complete
    * modes), with the identifier resolved through this catalog. Spark's
    * guard requires the writer's `format` to match the provider, so the
    * end-to-end call is `writeStream.format("graft-table").toTable(...)`
    * — omitting the format fails with Spark's own error naming
    * `graft-table`. Streaming READS of the identifier never reach this
    * fallback (the injected GraftStreamRelationRule claims them first),
    * and batch resolution ignores it (Spark consults it only under
    * isStreaming).
    */
  override def v1Table: org.apache.spark.sql.catalyst.catalog.CatalogTable = {
    import org.apache.spark.sql.catalyst.catalog.{CatalogStorageFormat, CatalogTable, CatalogTableType}
    val parts = ident.split('.')
    // TableIdentifier holds exactly (catalog, database, table): a deeper
    // namespace (graft.a.b.t) or a branch-suffixed name (graft.ns.t.branch)
    // cannot be represented — refuse loudly rather than silently dropping
    // middle segments and routing the stream to the wrong identifier.
    require(parts.length <= 3,
      s"streaming toTable: identifier '$ident' has ${parts.length} parts; " +
        "the V1 streaming fallback can address at most catalog.namespace." +
        "table — write to the base table or use the graft-table sink's " +
        "option(\"table\", ...) path for branch/deep-namespace targets")
    val tid = parts.length match {
      case 1 => org.apache.spark.sql.catalyst.TableIdentifier(parts(0))
      case 2 => org.apache.spark.sql.catalyst.TableIdentifier(parts(1), Some(parts(0)))
      case 3 => org.apache.spark.sql.catalyst.TableIdentifier(
        parts(2), Some(parts(1)), Some(parts(0)))
    }
    CatalogTable(
      identifier = tid,
      tableType = CatalogTableType.EXTERNAL,
      storage = CatalogStorageFormat.empty.copy(
        locationUri = Some(new org.apache.hadoop.fs.Path(kpt.root).toUri)),
      schema = schema,
      provider = Some("graft-table"))
  }

  /** `TRUNCATE TABLE` SQL: one atomic empty-snapshot commit — the prior
    * state stays time-travelable (truncate is a version, not an erasure).
    */
  override def truncateTable(): Boolean = {
    require(pin == Pin.Current, s"cannot TRUNCATE a time-travel read of $ident")
    CommitRetry.retrying(s"TRUNCATE $ident") {
      kpt.commit(pinnedRead().limit(0))
    }
    true
  }

  /** The pinned read — every scan and the schema derive from this one
    * definition, so SQL time travel cannot diverge from the engine's.
    */
  private[catalog] def pinnedRead(): DataFrame = pin match {
    case Pin.Current    => kpt.read()
    case Pin.Version(v) => kpt.readVersion(v)
    case Pin.Tag(t)     => kpt.readTag(t)
    case Pin.AsOf(ms)   => kpt.readAsOf(ms)
  }

  private[catalog] def isCurrent: Boolean = pin == Pin.Current

  override lazy val schema: StructType = pinnedRead().schema

  /** Deliberately NOT self-reported: the engine's hash buckets (and even
    * its directory-encoded partition columns) are physical LAYOUT, not
    * Hive-style partitions with per-partition overwrite semantics — a
    * "dynamic partition overwrite" that replaced only touched hash buckets
    * would be wrong-by-design (INSERT OVERWRITE must replace table state).
    * An empty partitioning routes INSERT OVERWRITE to the static
    * truncate-then-replace plan, which maps exactly onto the engine's
    * atomic full-snapshot commit. The layout itself is still visible in
    * [[properties]] and enforced by the catalog's CREATE.
    */
  override def partitioning(): Array[Transform] = Array.empty

  override def properties(): java.util.Map[String, String] =
    (kpt.properties ++ Map(
      GraftCatalog.KeysProp -> kpt.keys.mkString(","),
      "graft.partitionBy" -> kpt.partitionBy.mkString(","),
      "graft.bucketCount" -> kpt.bucketCount.toString,
      "graft.bucketBy" -> kpt.bucketKeys.mkString(","),
      "graft.currentVersion" -> kpt.currentVersion.toString)).asJava

  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(this)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pin == Pin.Current, s"cannot write to time-travel read of $ident")
    new GraftWriteBuilder(kpt, schema)
  }
}

/** Pushdown planner for a catalog read. Spark hands the conjunctive
  * top-level predicates here; the builder (a) picks the engine's best
  * physical prune for them — bucket-directory pruning when every bucket
  * key has an equality (or IN, single-key), else file-stats range pruning
  * on a stats column — and (b) re-applies every translatable predicate
  * inside the inner plan so the nested parquet scan gets row-group
  * pushdown too. All filters are returned as residuals (Spark re-evaluates
  * them above the scan): pruning must only ever widen, never decide
  * membership, so a translation gap degrades to a wider scan instead of a
  * wrong answer.
  */
final class GraftScanBuilder(table: GraftTable)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  private val kpt = table.kpt
  private var pushed: Array[Filter] = Array.empty
  private var required: Option[StructType] = None
  private var pushedAgg: Option[org.apache.spark.sql.connector.expressions.aggregate.Aggregation] = None

  /** COMPLETE aggregate pushdown into the engine's O(metadata) stats-index
    * aggregates: `SELECT COUNT(*) / MIN / MAX / SUM FROM graft.ns.t` as
    * literal SQL answers from the transactional `_stats` index
    * ([[KeyedParquetTable.countRows]]/[[KeyedParquetTable.minMaxOf]]/
    * [[KeyedParquetTable.sumOf]] — per-file n_rows/bounds/sums written
    * atomically with every commit; pending MoR deletes go hybrid) — data
    * files never open. Spark only offers aggregates when every filter was
    * consumed, and this builder returns ALL filters as residuals, so the
    * offer arrives exactly for the unfiltered whole-table shape the index
    * answers. Anything the index can't answer exactly (group-by, DISTINCT,
    * Count(col) — null counts aren't indexed — min/max off statsCols, sum
    * off sumCols, a time-travel pin) declines and Spark aggregates the
    * ordinary scan.
    */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    answerable(agg)

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    val ok = answerable(agg)
    if (ok) pushedAgg = Some(agg)
    ok
  }

  private def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case n: org.apache.spark.sql.connector.expressions.NamedReference
        if n.fieldNames.length == 1 => Some(n.fieldNames.head)
      case _ => None
    }

  private def answerable(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate._
    // the index must actually be able to answer WITHOUT a scan: these
    // lookups run at PLAN time, so any minMaxOf/countRows scan fallback
    // (index-less table, flat delete set, stale index missing a column)
    // would execute a full table scan inside query planning — decline
    // and let the ordinary scan+agg run at execution instead
    table.isCurrent && pushed.isEmpty && agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.nonEmpty && kpt.statsAggregatable && {
        lazy val indexed = kpt.statsIndexColumns.toSet
        // statsAggregatable already passed, so an EMPTY index set means a
        // file-less table — the aggregate over zero files is scan-free
        def covered(c: String, prefixes: String*) =
          indexed.isEmpty || prefixes.forall(p => indexed.contains(p + c))
        agg.aggregateExpressions.forall {
          case _: CountStar => true
          case m: Min => fieldOf(m.column).exists(c =>
            kpt.statsCols.contains(c) && covered(c, "mn_", "mx_"))
          case m: Max => fieldOf(m.column).exists(c =>
            kpt.statsCols.contains(c) && covered(c, "mn_", "mx_"))
          // COUNT(col): Σ n_rows − Σ nl_<col> — needs the null counts the
          // index carries since they joined the stats schema; a stale
          // pre-upgrade index (no nl_) declines rather than scans
          case n: Count => !n.isDistinct && fieldOf(n.column).exists(c =>
            kpt.statsCols.contains(c) && covered(c, "nl_"))
          // Sum of a DECIMAL declines: sumOf's result schema is the
          // sum-of-sum-partials type (precision widened TWICE), which
          // disagrees with Spark's expected Sum result type for the column
          // — the complete-pushdown scan schema would mismatch. Integral
          // (long) and floating (double) sums match exactly.
          case s: Sum => !s.isDistinct && fieldOf(s.column).exists(c =>
            kpt.sumCols.contains(c) && covered(c, "sm_") &&
              !table.schema(c).dataType
                .isInstanceOf[org.apache.spark.sql.types.DecimalType])
          case _ => false
        }
      }
  }

  /** Answer the pushed aggregation as a one-row local frame (the complete-
    * pushdown contract: the scan IS the final result). Each value comes
    * from the corresponding O(metadata) table API; column types match
    * Spark's own aggregate result types because min/max carry the column
    * type and sumOf runs Spark's sum over index partials.
    */
  private def answeredFrame(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): DataFrame = {
    import org.apache.spark.sql.connector.expressions.aggregate._
    // one index job per DISTINCT source (count, per-column min/max row,
    // per-column sum): SELECT MIN(c), MAX(c) must not run the stats job
    // twice — and on the index-less fallback each run is a full scan
    lazy val countOnce = kpt.countRows()
    val countColOnce = collection.mutable.Map.empty[String, Long]
    def countCol(c: String) = countColOnce.getOrElseUpdate(c, kpt.countOf(c))
    val minMaxOnce = collection.mutable.Map.empty[String, org.apache.spark.sql.Row]
    def minMaxRow(c: String) = minMaxOnce.getOrElseUpdate(c, kpt.minMaxOf(c).head())
    val sumOnce = collection.mutable.Map.empty[String, (Any, org.apache.spark.sql.types.DataType)]
    def sumVal(c: String) = sumOnce.getOrElseUpdate(c, {
      val df = kpt.sumOf(c)
      (df.head().get(0), df.schema.head.dataType)
    })
    val cols: Seq[(String, Column)] = agg.aggregateExpressions.toSeq.zipWithIndex.map {
      case (_: CountStar, i) => (s"count_star_$i", lit(countOnce))
      case (n: Count, i) =>
        val c = fieldOf(n.column).get
        (s"count_${c}_$i", lit(countCol(c)))
      case (m: Min, i) =>
        val c = fieldOf(m.column).get
        (s"min_${c}_$i", lit(minMaxRow(c).get(0)).cast(table.schema(c).dataType))
      case (m: Max, i) =>
        val c = fieldOf(m.column).get
        (s"max_${c}_$i", lit(minMaxRow(c).get(1)).cast(table.schema(c).dataType))
      case (s: Sum, i) =>
        val c = fieldOf(s.column).get
        val (v, dt) = sumVal(c)
        (s"sum_${c}_$i", lit(v).cast(dt))
      case (other, _) => throw new IllegalStateException(
        s"pushAggregation accepted an unanswerable function $other")
    }
    kpt.spark.range(1).select(cols.map { case (n, c) => c.as(n) }: _*)
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // keep the ones we can act on (prune by or translate); everything is
    // still evaluated by Spark above the scan
    pushed = filters.filter(f => GraftScanBuilder.translate(f).isDefined ||
      bucketEqualities(Array(f)).nonEmpty)
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = Some(requiredSchema)

  /** Bucket-key → literal value(s) from top-level conjuncts. */
  private def bucketEqualities(filters: Array[Filter]): Map[String, Seq[Any]] =
    filters.collect {
      case EqualTo(a, v) if kpt.bucketKeys.contains(a) => a -> Seq(v)
      case In(a, vs) if kpt.bucketKeys.contains(a) && vs.nonEmpty => a -> vs.toSeq
    }.toMap

  /** [lo, hi] bounds for a stats column from top-level conjuncts. Strict
    * bounds are widened to inclusive — the prune returns a superset, the
    * residual filters restore exactness.
    */
  private def rangeBounds(c: String, filters: Array[Filter]): (Option[Any], Option[Any]) =
    filters.foldLeft((Option.empty[Any], Option.empty[Any])) {
      case ((lo, hi), EqualTo(a, v)) if a == c            => (Some(v), Some(v))
      case ((lo, hi), GreaterThan(a, v)) if a == c        => (Some(v), hi)
      case ((lo, hi), GreaterThanOrEqual(a, v)) if a == c => (Some(v), hi)
      case ((lo, hi), LessThan(a, v)) if a == c           => (lo, Some(v))
      case ((lo, hi), LessThanOrEqual(a, v)) if a == c    => (lo, Some(v))
      case (acc, _)                                       => acc
    }

  /** The pruned base frame, the prune decision, and a label for explain. */
  private[catalog] def prunedBase(): (DataFrame, String) = {
    val current = table.pinnedRead()
    def fallback = (current, "full")
    if (!table.isCurrent) fallback
    else {
      val eqs = bucketEqualities(pushed)
      if (kpt.bucketCount > 0 && kpt.bucketKeys.forall(eqs.contains)) {
        // one probe row per combination of IN values across the bucket keys
        val keyFields = StructType(kpt.bucketKeys.map(k => table.schema(k)))
        val combos = kpt.bucketKeys.foldLeft(Seq(Seq.empty[Any])) {
          (acc, k) => acc.flatMap(row => eqs(k).map(v => row :+ v))
        }
        Try {
          val probe = kpt.spark.createDataFrame(
            combos.map(Row.fromSeq).asJava, keyFields)
          (kpt.readForKeys(probe), s"buckets[${kpt.bucketKeys.mkString(",")}]")
        }.getOrElse(fallback)
      } else {
        kpt.statsCols.iterator.map(c => c -> rangeBounds(c, pushed)).collectFirst {
          case (c, (Some(lo), Some(hi))) =>
            Try((kpt.readRangePruned(c, lo, hi), s"stats[$c]")).getOrElse(fallback)
        }.getOrElse(fallback)
      }
    }
  }

  override def build(): Scan = {
    pushedAgg.foreach { agg =>
      return new GraftScan(answeredFrame(agg), "stats-aggregate", pushed)
    }
    val (base, pruneMode) = prunedBase()
    // re-apply translatable predicates inside the inner plan: Catalyst
    // pushes them to the nested vectorized parquet scan, so rows are
    // filtered before the V1 Row boundary
    val filtered = pushed.flatMap(GraftScanBuilder.translate)
      .foldLeft(base)((df, c) => df.filter(c))
    val projected = required match {
      case Some(s) if s.fieldNames.nonEmpty =>
        filtered.select(s.fieldNames.map(col).toIndexedSeq: _*)
      case Some(_) => // empty projection (COUNT(*)) still needs row cardinality
        filtered.select(col(filtered.columns.head))
      case None => filtered
    }
    new GraftScan(projected, pruneMode, pushed)
  }
}

private[catalog] object GraftScanBuilder {
  /** sources.Filter → Column for the common predicate shapes; None = not
    * translatable (residual-only). Used for INNER-plan filtering, so it
    * must be EXACT when defined.
    */
  def translate(f: Filter): Option[Column] = f match {
    case EqualTo(a, v)            => Some(col(a) === v)
    case EqualNullSafe(a, v)      => Some(col(a) <=> v)
    case GreaterThan(a, v)        => Some(col(a) > v)
    case GreaterThanOrEqual(a, v) => Some(col(a) >= v)
    case LessThan(a, v)           => Some(col(a) < v)
    case LessThanOrEqual(a, v)    => Some(col(a) <= v)
    case In(a, vs)                => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a)                => Some(col(a).isNull)
    case IsNotNull(a)             => Some(col(a).isNotNull)
    case StringStartsWith(a, v)   => Some(col(a).startsWith(v))
    case StringEndsWith(a, v)     => Some(col(a).endsWith(v))
    case StringContains(a, v)     => Some(col(a).contains(v))
    case And(l, r) => for { lc <- translate(l); rc <- translate(r) } yield lc && rc
    case Or(l, r)  => for { lc <- translate(l); rc <- translate(r) } yield lc || rc
    case Not(c)    => translate(c).map(!_)
    case _         => None
  }
}

/** The built scan: a V1 bridge handing Spark the inner plan's RDD. The
  * inner DataFrame is the fully pruned + filtered + projected engine read.
  *
  * Reports [[SupportsReportStatistics]] from the PRUNED scan's actual
  * input-file bytes (a driver-side fs stat per surviving file — no job).
  * Without this, a V2 relation plans with `defaultSizeInBytes` (max), so
  * SQL joins against engine tables would NEVER auto-broadcast a small
  * side — at scale that turns every dim join into a shuffle. With it, the
  * size shrinks with bucket/stats pruning too, so a pruned probe join
  * broadcasts even when the full table wouldn't.
  */
final class GraftScan(val inner: DataFrame,
                      val pruneMode: String, pushed: Array[Filter])
    extends V1Scan with SupportsReportStatistics {

  override def readSchema(): StructType = inner.schema

  override def description(): String =
    s"graft prune=$pruneMode pushed=[${pushed.mkString(", ")}]"

  private[catalog] lazy val inputBytesCached: Long = GraftScan.inputBytes(inner)

  override def estimateStatistics(): Statistics = {
    val bytes = inputBytesCached
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty() // exact rows need the _stats job; size drives join planning
    }
  }

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = inner.schema
      override def buildScan(): RDD[Row] = inner.rdd
      override def sizeInBytes: Long = GraftScan.inputBytes(inner)
    }.asInstanceOf[T]
}

private[catalog] object GraftScan {
  /** Total bytes of the plan's surviving input files. `inputFiles` is a
    * driver-side walk of the plan's file indexes (already listed — no
    * job); a frame with no file inputs (metadata tables, empty snapshots)
    * reports its local-relation estimate instead of zero so tiny frames
    * stay broadcastable without lying about true file-backed size.
    */
  def inputBytes(inner: DataFrame): Long = {
    val files = inner.inputFiles
    if (files.isEmpty)
      inner.queryExecution.optimizedPlan.stats.sizeInBytes
        .min(BigInt(Long.MaxValue)).toLong
    else {
      // stat through java.nio for local paths; non-local files go through
      // their Hadoop FileSystem ONE listStatus PER PARENT DIRECTORY (a
      // remote table's files cluster in a few bucket/partition dirs — a
      // per-file getFileStatus would pay O(files) sequential RPCs at PLAN
      // time). An UN-stat-able file must make the whole estimate
      // CONSERVATIVE (the session default, effectively "never
      // auto-broadcast"), never count as 0 — a huge remote table reported
      // as ~0 bytes gets auto-broadcast, the opposite failure of the
      // defaultSizeInBytes problem this estimator exists to fix.
      var total = 0L
      val remote = Seq.newBuilder[String]
      files.foreach { f =>
        try total += java.nio.file.Files.size(java.nio.file.Paths.get(new java.net.URI(f)))
        catch { case _: Exception =>
          try total += java.nio.file.Files.size(java.nio.file.Paths.get(f))
          catch { case _: Exception => remote += f }
        }
      }
      val allStatted = {
        val rem = remote.result()
        rem.isEmpty || {
          try {
            val hconf = inner.sparkSession.sessionState.newHadoopConf()
            rem.groupBy(f => new org.apache.hadoop.fs.Path(f).getParent)
              .forall { case (dir, names) =>
                val fs = dir.getFileSystem(hconf)
                val listed = fs.listStatus(dir)
                  .map(s => s.getPath.toUri.getPath -> s.getLen).toMap
                names.forall { f =>
                  val p = new org.apache.hadoop.fs.Path(f).toUri.getPath
                  listed.get(p).exists { len => total += len; true }
                }
              }
          } catch { case _: Exception => false }
        }
      }
      if (allStatted) total
      else inner.sparkSession.sessionState.conf.defaultSizeInBytes
    }
  }
}

/** Read-only METADATA table (`SELECT * FROM graft.ns.t.history` etc.) —
  * the Iceberg metadata-table surface the reference's validation reads
  * (`validation.py:731-740` loads `<table>.history` / `.manifests` /
  * `.metadata`). Resolved by the catalog when a multipart identifier's
  * last segment names a metadata view of an existing table. The frames
  * are driver-side metadata walks (O(files)/O(snapshots), never data
  * scans), so the scan is a plain V1 bridge with column pruning only.
  */
final class GraftMetaTable(ident: String, frame: () => DataFrame)
    extends Table with SupportsRead {

  override def name(): String = ident
  override lazy val schema: StructType = frame().schema
  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: Option[StructType] = None
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = Some(requiredSchema)
      override def build(): Scan = {
        val df = frame()
        val projected = required match {
          case Some(s) if s.fieldNames.nonEmpty =>
            df.select(s.fieldNames.map(col).toIndexedSeq: _*)
          case Some(_) => df.select(col(df.columns.head))
          case None => df
        }
        new GraftScan(projected, "metadata", Array.empty)
      }
    }
}

/** `graft.ns.t.changes` — the value-carrying changelog as a catalog table
  * (Iceberg's changelog table): `spark.read.option("fromVersion", a)
  * [.option("toVersion", b)].table("graft.ns.t.changes")` plans
  * [[graft.cdc.KeyedParquetTable.changefeedBetween]] over (a, b] —
  * post-images for insert/update, PRE-images for delete, `_change_type`,
  * image reads bucket-pruned to the changed keys. `toVersion` defaults to
  * the current snapshot; a missing `fromVersion` refuses loudly (a change
  * stream without a start is ambiguous — plain SQL text can't carry scan
  * options, use the DataFrameReader form or VERSION AS OF reads).
  */
final class GraftChangesTable(kpt: graft.cdc.KeyedParquetTable, ident: String)
    extends Table with SupportsRead {

  override def name(): String = ident
  override lazy val schema: StructType = StructType(
    kpt.read().schema.fields :+
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = true))
  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: Option[StructType] = None
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = Some(requiredSchema)
      override def build(): Scan = {
        require(options.containsKey("fromVersion"),
          s"$ident requires option fromVersion (changes are a range read: " +
            "spark.read.option(\"fromVersion\", a).table(\"" + ident + "\"))")
        val from = options.get("fromVersion").trim.toLong
        val to = Option(options.get("toVersion")).map(_.trim.toLong)
          .getOrElse(kpt.currentVersion)
        val df = kpt.changefeedBetween(from, to)
        val projected = required match {
          case Some(s) if s.fieldNames.nonEmpty =>
            df.select(s.fieldNames.map(col).toIndexedSeq: _*)
          case Some(_) => df.select(col(df.columns.head))
          case None => df
        }
        new GraftScan(projected, "changes", Array.empty)
      }
    }
}

/** Statement-level commit retry for the SQL surface. Two writers racing
  * one table serialize on the engine's CAS pointer swing; the Scala
  * surface exposes the loser's ConcurrentModificationException (callers
  * coordinate), but a SQL statement is self-contained, so — like Iceberg's
  * commit.retry.num-retries — the lost race RE-EXECUTES the statement
  * against the new base: appends are commutative, and MERGE/UPDATE/DELETE/
  * TRUNCATE re-read current state inside their own evaluation, so a retry
  * is exactly the statement's semantics over the table state that beat it.
  * The backoff must outlast a competing COMMIT (the claim is held for the
  * winner's whole write — seconds, not a pointer flip), so it grows to 1 s
  * per attempt with a generous budget (a loaded machine can hold a claim
  * for several seconds per commit, and the budget must cover several
  * queued writers); a wedged claim (dead writer, unexpired lease) still
  * surfaces as the engine's exception within ~40s.
  */
private[graft] object CommitRetry {
  def retrying[T](what: String, maxRetries: Int = 40)(body: => T): T = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case e: java.util.ConcurrentModificationException =>
          attempt += 1
          if (attempt > maxRetries) throw e
          Thread.sleep(math.min(100L * attempt, 1000L))
      }
    }
    throw new IllegalStateException(s"unreachable: $what")
  }
}

/** INSERT INTO → append commit; INSERT OVERWRITE TABLE → truncate → full
  * replacement commit. Both ride the engine's atomic pointer-swing with
  * CHECK constraints enforced in-plan.
  */
final class GraftWriteBuilder(kpt: KeyedParquetTable, tableSchema: StructType)
    extends WriteBuilder with SupportsTruncate {

  private var replace = false

  override def truncate(): WriteBuilder = { replace = true; this }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation = new InsertableRelation {
      override def insert(data: Dataset[Row], overwrite: Boolean): Unit = {
        // align by NAME in table order (Spark has already resolved and cast
        // the query's columns to the table schema)
        val aligned = data.select(tableSchema.fieldNames.map(col).toIndexedSeq: _*)
        // lost-race retry: see CommitRetry — the statement's data job
        // re-runs per attempt (the claimed version dir changed); commits,
        // not writes, are what the bound protects
        CommitRetry.retrying("INSERT") {
          if (replace || overwrite) kpt.commit(aligned) else kpt.append(aligned)
        }
      }
    }
  }
}
