package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — pairs of rows on the same key whose timestamps
  * lie within `delta` of each other.
  *
  * Written naively (`a.join(b, abs(a.ts - b.ts) <= delta)`), Spark has no
  * equi-key to hash on and plans a nested-loop/cartesian — the classic range
  * -join scale killer. The bucketize trick restores an equi-join: bin time
  * into buckets of width `delta`; any pair within `delta` has bucket ids
  * differing by at most 1, so exploding ONE side to its three adjacent
  * buckets and equi-joining on (key, bucket) finds every candidate exactly
  * once (the exploded bucket values are distinct, so no dedup pass is
  * needed). The exact predicate then filters the ≤3× candidate set.
  *
  * Scale shape: shuffle is |L| + 3|R| rows hashed on (key, bucket) into a
  * standard shuffled equi-join; candidate fan-out per row is bounded by
  * bucket occupancy, never the full key group. This is the batch analog of
  * the engine's stream-stream interval join (Ingest.intervalJoin).
  *
  * Requires left/right non-key column names to be disjoint (rename before
  * calling, as with any natural join).
  */
object RangeJoin {

  /** Inner pairs with |left.leftTs - right.rightTs| <= delta on equal keys.
    * Timestamps are numeric (e.g. epoch nanos); `delta` in the same unit.
    */
  def within(left: DataFrame, right: DataFrame, keys: Seq[String],
             leftTs: String, rightTs: String, delta: Long): DataFrame = {
    require(delta > 0, s"delta must be positive, got $delta")
    require(leftTs != rightTs,
      "left and right timestamp columns must have distinct names")
    // the temp bucket column would silently clobber (and then drop) a
    // caller's column of the same name
    require(!left.columns.contains("__bucket") && !right.columns.contains("__bucket"),
      "inputs must not carry a __bucket column (reserved by RangeJoin.within)")
    // exact integer floor-division: epoch-nano values (~1e18) exceed double's
    // 53-bit mantissa, so a double divide could mis-bucket boundary rows.
    // (x - pmod(x, d)) is exactly divisible by d, and `div` on the exact
    // multiple equals floor(x/d) for negatives too. Column names are
    // backtick-escaped — dots/spaces/reserved words must not re-parse.
    def bucketOf(ts: String) = {
      val c = s"`${ts.replace("`", "``")}`"
      expr(s"($c - pmod($c, ${delta}L)) div ${delta}L")
    }
    val lb = left.withColumn("__bucket", bucketOf(leftTs))
    val rBucket = bucketOf(rightTs)
    val rb = right.withColumn("__bucket",
      explode(array(rBucket - 1, rBucket, rBucket + 1)))
    lb.join(rb, keys :+ "__bucket")
      .filter(abs(col(leftTs) - col(rightTs)) <= delta)
      .drop("__bucket")
  }
}
