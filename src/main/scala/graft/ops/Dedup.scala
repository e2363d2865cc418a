package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed dedup-to-latest — the reference's W1 window
  * (`/root/reference/src/processor/spark_batch.py:255-260`), generalized.
  *
  * Scale notes: `row_number` over `partitionBy(keys)` is one hash exchange on
  * the keys; the downstream merge join reuses that clustering, so the pattern
  * costs a single shuffle at any scale. For heavily skewed keys AQE skew-join
  * handles the join side; the window itself is bounded by rows-per-key (CDC
  * batches carry few versions per key).
  */
object Dedup {

  /** Keep the first row per key under `ordering` (pass descending columns for
    * latest-wins). Deterministic as long as `ordering` is a total order within
    * a key — CDC callers order by `(kafka_partition, kafka_offset)` rather
    * than the reference's driver wall-clock tiebreak (`spark_batch.py:221`).
    */
  def dedupLatest(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    require(keys.nonEmpty && ordering.nonEmpty, "dedupLatest needs keys and ordering")
    require(!df.columns.contains("__rn"),
      "input must not carry a __rn column (reserved by dedupLatest)")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** max_by-shaped variant (W2, `spark_exactly_once.py:377-389`): latest value
    * of `valueCols` per key by `orderCol`. Same result as dedupLatest for a
    * single ordering column, but expressed as an aggregate so Spark can apply
    * partial (map-side) aggregation — cheaper than a window when only a few
    * columns are needed.
    */
  def latestByKey(df: DataFrame, keys: Seq[String], orderCol: String,
                  valueCols: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(valueCols.map(col): _*), col(orderCol)).as("__latest"))
      .select(keys.map(col) ++ valueCols.map(c => col(s"__latest.$c").as(c)): _*)
}
