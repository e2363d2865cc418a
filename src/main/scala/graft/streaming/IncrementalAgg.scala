package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.cdc.KeyedParquetTable

/** Incrementally-maintained keyed aggregates — the materialized-view half
  * of a CDC pipeline: instead of recomputing `events.groupBy(key).agg(...)`
  * from scratch every batch (O(history) per refresh), fold each batch's
  * PARTIAL aggregate into a keyed aggregate table (O(batch) per refresh).
  *
  * Only algebraic aggregates participate (count, sum — anything with an
  * associative, commutative merge); the stored sum is DECIMAL so folding
  * order can never change the result, matching the engine's exact-sum
  * determinism rule.
  *
  * Scale shape: one partial aggregation over the batch (map-side combined),
  * one join against ONLY the touched keys' current rows, one keyed merge —
  * commit cost scales with the batch's key spread, not table size
  * (bucket-scoped merge in [[KeyedParquetTable]]). The same pattern the
  * lakehouse world calls incremental view maintenance.
  */
object IncrementalAgg {

  /** Fold one raw batch into `table` (schema: key, n_rows long,
    * sum_<valueCol> decimal(38,6)). Creates the table on first use.
    */
  def applyBatch(table: KeyedParquetTable, batch: DataFrame,
                 key: String, valueCol: String): Unit = {
    val sumCol = s"sum_$valueCol"
    // coalesce: a batch where a key's values are ALL null would otherwise
    // produce a null partial, and null + current poisons the fold forever
    val partial = batch.groupBy(col(key))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col(valueCol).cast("decimal(18,6)")), lit(BigDecimal(0)))
          .cast("decimal(38,6)").as(sumCol))
    if (partial.isEmpty) return // empty batch: nothing to fold
    // first use: the just-created empty snapshot has no parquet footers to
    // read a schema from — the first partial IS the aggregate
    val firstUse = !table.exists
    table.createIfNotExists(org.apache.spark.sql.types.StructType(partial.schema.fields))
    val merged =
      if (firstUse) partial
      else {
        // touched-keys-only read: semi-filter the current table with the
        // BROADCAST batch key set (one table scan, no table-wide shuffle —
        // the filter travels to the data), then fold two batch-sized
        // frames. Assumes the batch's key spread is broadcastable, the
        // same bound the bucket-scoped merge already relies on.
        val cur = table.read()
          .select(col(key).as("__k"), col("n_rows").as("__n"), col(sumCol).as("__s"))
        val touched = cur.join(broadcast(partial.select(col(key).as("__pk"))),
          col("__k") === col("__pk"), "left_semi")
        partial.join(touched, col(key) === col("__k"), "left")
          .select(col(key),
            (col("n_rows") + coalesce(col("__n"), lit(0L))).as("n_rows"),
            (col(sumCol) + coalesce(col("__s"), lit(BigDecimal(0)).cast("decimal(38,6)")))
              .cast("decimal(38,6)").as(sumCol))
      }
    table.merge(merged.withColumn("operation", lit("u")))
  }

  /** Read the maintained aggregate with the sum surfaced as double. */
  def snapshot(table: KeyedParquetTable, valueCol: String): DataFrame = {
    val sumCol = s"sum_$valueCol"
    table.read().select(col(table.keys.head),
      col("n_rows"), col(sumCol).cast("double").as(sumCol))
  }
}
