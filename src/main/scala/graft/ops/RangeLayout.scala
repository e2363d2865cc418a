package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Morton (Z-order) interleave of pre-scaled non-negative `bits`-wide
    * values: bit b of input i lands at position b·k + i. Disjoint target
    * bits, so the sum IS the bitwise-or — one codegen'd arithmetic
    * expression, no UDF.
    */
  def zorderValue(bits: Int, scaled: Seq[Column]): Column = {
    val k = scaled.size
    val terms = for {
      (c, i) <- scaled.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * k + i)
    terms.reduce(_ + _)
  }

  /** Z-ORDER clustered write — multi-dimensional file skipping, the layout
    * Delta's `OPTIMIZE ZORDER BY` / Iceberg's sort-order z-curve provide
    * (public technique: Morton space-filling curve). Each cluster column is
    * min-max scaled to a `bits`-wide integer (one tiny stats pass — a
    * single driver row), the scaled values bit-interleave into a z-value,
    * and the write range-partitions + sorts on it. Rows near each other in
    * ALL cluster dimensions land in the same few files, so a conjunctive
    * box predicate (user X AND time range) matches rows concentrated in
    * ~N^(1/k) of the files, where 1-D clustering would only help the
    * leading column. Parquet min/max stats then skip the rest.
    *
    * At 100 TB this is the difference between "scan the user-day
    * intersection" and "scan a full day" for multi-dimension predicates.
    * NULLs scale to 0 (first cell); a constant column contributes nothing
    * (range guard avoids divide-by-zero).
    */
  def writeZorderClustered(df: DataFrame, path: String, numFiles: Int,
                           cols: Seq[String], bits: Int = 12): Unit = {
    require(cols.size >= 2, s"z-order needs >= 2 columns, got $cols")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits*cols must fit a long: $bits * ${cols.size}")
    val scaled = minMaxScaled(df, cols, bits)
    df.withColumn("__z", zorderValue(bits, scaled))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** HILBERT-curve clustered write — same API and scaling as
    * [[writeZorderClustered]], but ordered on the Hilbert curve (native
    * `hilbert_index` kernel, [[graft.functions.HilbertIndex]]; requires
    * [[graft.core.GraftExtensions]] on the session). The Hilbert curve is
    * continuous — consecutive curve positions are always unit-adjacent,
    * where the Morton curve takes diagonal jumps at every power-of-two
    * boundary — so a box predicate intersects fewer, longer curve runs and
    * touches fewer files for the same box (the reason Iceberg offers
    * hilbert alongside zorder). Prefer it for new layouts; zorder remains
    * for parity with Delta OPTIMIZE ZORDER semantics.
    */
  def writeHilbertClustered(df: DataFrame, path: String, numFiles: Int,
                            cols: Seq[String], bits: Int = 12): Unit = {
    require(cols.size >= 2, s"hilbert needs >= 2 columns, got $cols")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits*cols must fit a long: $bits * ${cols.size}")
    val scaled = minMaxScaled(df, cols, bits)
    df.withColumn("__h",
        call_function("hilbert_index", (scaled :+ lit(bits)): _*))
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
      .write.mode("overwrite").parquet(path)
  }

  /** Min-max scale each column to a non-negative `bits`-wide long (one
    * tiny stats pass — a single driver row). NULLs scale to 0 (first
    * cell); a constant column contributes nothing (range guard avoids
    * divide-by-zero).
    */
  private def minMaxScaled(df: DataFrame, cols: Seq[String],
                           bits: Int): Seq[Column] = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val r = df.agg(aggs.head, aggs.tail: _*).head() // one row — driver-safe
    def stat(i: Int): Double = if (r.isNullAt(i)) 0.0 else r.getDouble(i)
    val maxV = (1L << bits) - 1
    cols.zipWithIndex.map { case (c, i) =>
      val mn = stat(2 * i)
      val range = math.max(stat(2 * i + 1) - mn, java.lang.Double.MIN_NORMAL)
      coalesce(
        ((col(c).cast("double") - lit(mn)) / lit(range) * lit(maxV.toDouble))
          .cast("long"),
        lit(0L))
    }
  }
}
