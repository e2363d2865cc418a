package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{BloomAgg, BloomFilter}

/** Scan-side prefilters that cut shuffle volume without changing results. */
object Prefilter {

  /** `big LEFT SEMI JOIN small` with a broadcast Bloom prefilter on the big
    * side: build a bloom of `small`'s keys (one aggregation over the small
    * side, O(numBits) result), broadcast it, drop big-side rows that cannot
    * match BEFORE the join shuffle, then run the exact semi join to clear
    * false positives. Identical rows to the plain semi join — only the
    * shuffled volume changes (matches + FP mass instead of the whole big
    * side).
    */
  def semiJoinBloom(big: DataFrame, small: DataFrame,
                    bigKey: String, smallKey: String,
                    numBits: Int = 1 << 20, k: Int = 5): DataFrame = {
    val agg = new BloomAgg(numBits)
    val bloom = small
      .select(BloomFilter.positions(col(smallKey), numBits, k).as("__pos"))
      .agg(agg.column(col("__pos")).as("__bloom"))
    val pruned = big.crossJoin(broadcast(bloom))
      .filter(BloomFilter.mightContain(col("__bloom"), col(bigKey), numBits, k))
      .drop("__bloom")
    // no distinct on the small side: semi-join semantics already dedup, and
    // the hash build collapses duplicates — a distinct would only add an
    // extra exchange+aggregate over the small side
    pruned.join(small.select(col(smallKey).as("__sk")),
      col(bigKey) === col("__sk"), "left_semi")
  }
}
