package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Bucketed-table layout — the shuffle-ELIMINATION strategy for repeated
  * large-to-large joins.
  *
  * A shuffled join at 100 TB moves both fact tables across the network every
  * query. Writing each side `bucketBy(n, key)` fixes the hash partitioning
  * ON DISK: scans of two tables bucketed on the join key with the same
  * bucket count come up already co-partitioned, and Catalyst plans the join
  * with NO Exchange on either side (BucketingSpec asserts this). `sortBy`
  * within buckets additionally removes the per-task Sort of a sort-merge
  * join. This is the batch analog of [[graft.cdc.KeyedParquetTable]]'s
  * `bucketCount` (which uses the same hash layout for scoped CDC merges).
  *
  * Cluster notes: bucket count is fixed at write time — choose ~table-size /
  * target-file-size and keep it a multiple of likely parallelism; both join
  * sides must agree on it (or be multiples) for exchange-free planning.
  */
object Bucketing {

  /** Write `df` as a catalog table bucketed (and optionally bucket-sorted)
    * on `bucketCol`.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sorted: Boolean = true): Unit = {
    // validate BEFORE the destructive drop below — a bad argument must not
    // cost the caller their existing table
    require(buckets > 0, s"bucket count must be positive, got $buckets")
    require(df.columns.contains(bucketCol),
      s"bucket column '$bucketCol' not in ${df.columns.mkString("[", ",", "]")}")
    val spark = df.sparkSession
    val catalog = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    // idempotence across sessions: with the in-memory catalog, a previous
    // JVM's managed-table directory survives in the warehouse while the
    // catalog entry doesn't, and saveAsTable then refuses the location even
    // in overwrite mode. Drop any live entry (managed drop removes its own
    // data), then clear a leftover directory ONLY at the catalog-computed
    // managed location for THIS identifier — never a hand-built path that
    // could point at someone else's directory for db-qualified names.
    spark.sql(s"DROP TABLE IF EXISTS ${ident.quotedString}")
    val loc = new Path(catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol)
    (if (sorted) w.sortBy(bucketCol) else w).saveAsTable(table)
  }
}
