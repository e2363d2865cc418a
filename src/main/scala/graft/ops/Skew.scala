package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted two-phase aggregation.
  *
  * AQE's skew-join splitting handles join-side skew at runtime; what it does
  * NOT fix is a hash aggregation where one grouping key holds a large share
  * of all rows — that key's entire partial state still lands on one reducer.
  * Salting splits each key into `saltBuckets` subkeys for the first
  * (map-side-combinable) aggregation, then re-aggregates the per-salt
  * partials — two small shuffles instead of one hot one.
  *
  * Use for known-skewed keys (CDC hot entities, head-heavy event types) when
  * per-key state is algebraic (count/sum/min/max — anything with a partial
  * form).
  */
object Skew {

  /** Salted groupBy-count: exact same result as
    * `df.groupBy(keys).count()`, skew-resistant.
    */
  def saltedCount(df: DataFrame, keys: Seq[String], saltBuckets: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum("__partial").as("count"))

  /** Salted groupBy-sum over `valueCol` (exact, skew-resistant). */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                saltBuckets: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum("__partial").as(s"sum_$valueCol"))

  /** Salt column usable to pre-split a skewed join: replicate the small side
    * `saltBuckets` times (`explode(sequence(0, n-1))` on that side) and join
    * on (key, salt). Provided for layouts where AQE is unavailable.
    */
  def saltColumn(saltBuckets: Int): Column =
    pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets))

  /** Salted equi-join for a skewed BIG side: the big side gets a random
    * salt, the small-but-not-broadcastable side is replicated `saltBuckets`
    * times, and the join runs on (keys..., salt) — the hot key's rows fan
    * out over `saltBuckets` reducers instead of one. Exact same rows as
    * `big.join(small, keys)`; shuffle volume grows by (saltBuckets-1)·|small|,
    * the price of splitting the hot partition. Prefer AQE's skew splitting
    * when it fires; this is the explicit form for static layouts and for
    * engines-as-libraries where AQE thresholds can't be tuned per query.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltBuckets: Int = 16, joinType: String = "inner"): DataFrame = {
    // only join types that never null-pad or emit the REPLICATED side are
    // correct here: an outer/right join would surface each unmatched small
    // -side replica saltBuckets times as spurious rows
    val allowed = Set("inner", "left", "leftouter", "left_outer",
      "leftsemi", "left_semi", "leftanti", "left_anti")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left/left_semi/left_anti, got '$joinType' " +
        "(outer-on-replicated-side types would duplicate unmatched rows)")
    val salted = big.withColumn("__salt", saltColumn(saltBuckets))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
