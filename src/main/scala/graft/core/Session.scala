package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the engine.
  *
  * Mirrors the reference's session factory
  * (`/root/reference/src/processor/spark_session.py:97-199`) re-expressed for
  * plain Spark 4: the reference wires an Iceberg REST catalog + S3FileIO there;
  * this environment ships no iceberg-spark-runtime jar, so table state is
  * handled by [[graft.cdc.KeyedParquetTable]] (snapshot-versioned parquet)
  * and the session only carries tuning config.
  *
  * Scale notes: shuffle partitions default to the local core count (32 on the
  * harness); on a real cluster set `spark.sql.shuffle.partitions` to 2-3x the
  * executor core total, or rely on AQE coalescing (enabled here) to size
  * post-shuffle partitions by bytes rather than count.
  */
object Session {

  /** Build a local session tuned the way the engine expects.
    * AQE handles runtime re-planning (skew joins, partition coalescing) so
    * plans written against sf0.01 survive 100x growth without re-tuning.
    */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    tuned(SparkSession.builder().master(s"local[$cores]"), cores).getOrCreate()

  /** Apply the engine's standard config to any builder (cluster or local). */
  def tuned(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.extensions", "graft.core.GraftExtensions")
      // the SQL-addressable catalog (the reference's entire query interface
      // is spark.sql strings resolved through a catalog, spark_session.py:
      // 97-199): SELECT/INSERT/DDL/time-travel against graft.ns.table run
      // over KeyedParquetTable roots under the warehouse dir (override via
      // -Dgraft.catalog.warehouse or spark.sql.catalog.graft.warehouse)
      .config("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // runtime bloom-filter join pruning: the optimizer's automatic form
      // of ops.Prefilter.semiJoinBloom — selective join sides inject a
      // bloom into the big side's scan (cuts shuffle volume at 100 TB;
      // thresholds keep it off for tiny local inputs)
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "snappy")
      // STATIC partition overwrite: the reference sets dynamic
      // (spark_session.py:168) because its Iceberg writer implements
      // per-partition dynamic replacement; this engine's own writes always
      // land in fresh snapshot directories (the mode is irrelevant to them),
      // and for the SQL catalog INSERT OVERWRITE must mean "replace table
      // state as one atomic commit" — under dynamic mode Spark 4 plans
      // OverwritePartitionsDynamic, a semantics the engine's hash-bucket
      // layout deliberately refuses (see GraftTable.partitioning)
      .config("spark.sql.sources.partitionOverwriteMode", "static")
      // harness testdata stores event timestamps as parquet TIMESTAMP(NANOS),
      // which Spark only reads as raw Long nanos-since-epoch; queries convert
      // explicitly where instant semantics are needed
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
}
