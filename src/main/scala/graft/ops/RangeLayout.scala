package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Range-clustered write layout — the ORDERED-scan counterpart of
  * [[Bucketing]] (which optimizes equi-joins). Writing a fact table
  * `repartitionByRange(orderCol).sortWithinPartitions(orderCol)` gives:
  *  - non-overlapping per-file min/max on the order column, so a time/range
  *    predicate prunes to the few files that can match (parquet row-group
  *    statistics do the rest within a file);
  *  - locally-sorted data, which range scans and merge-style consumers
  *    read without a sort.
  *
  * At 100 TB this is the difference between "scan a day" and "scan the
  * table" for time-windowed queries. The range boundaries come from a
  * reservoir sample (Spark's RangePartitioner) — approximate balance is
  * fine, correctness never depends on boundary placement.
  */
object RangeLayout {

  /** Write `df` range-clustered on `orderCols` as parquet under `path`. */
  def writeRangeClustered(df: DataFrame, path: String, numFiles: Int,
                          orderCols: Column*): Unit =
    df.repartitionByRange(numFiles, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .write.mode("overwrite").parquet(path)
}
