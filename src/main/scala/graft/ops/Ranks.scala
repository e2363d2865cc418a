package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — the scale-safe replacement for an
  * unpartitioned `Window.orderBy(...)` (which Spark plans as ONE task
  * holding every row: correct at sf0.1, dead at 100 TB).
  *
  * Recipe (the classic three-pass distributed rank):
  *  1. sample approximate value boundaries and EMBED them as literals —
  *     the boundaries only steer parallelism; correctness never depends on
  *     their placement, so approximation/nondeterminism in pass 1 is
  *     harmless once the chosen values are frozen into the plan;
  *  2. count rows per bucket (one parallel agg; ≤ `buckets` rows to the
  *     driver) → cumulative offsets;
  *  3. per-bucket window `row_number` (hash exchange on the bucket id —
  *     every bucket is an independent task) + the bucket's offset.
  *
  * Every pass is fully parallel; the only driver-side data is O(buckets).
  * At cluster scale raise `buckets` to ~2-3× total cores; offsets then ride
  * a broadcast join instead of a literal CASE chain (same plan shape).
  */
object Ranks {

  /** Append a 1-based dense global rank column over the total order
    * `(value, tiebreaks...)` ascending. The order must be unique per row
    * (supply tiebreaks), so rank ≡ row_number ≡ dense rank.
    *
    * Returns the ranked frame and the total row count N (pass-2 byproduct,
    * needed by percent_rank/ntile arithmetic).
    */
  def globalRank(df: DataFrame, value: Column, tiebreaks: Seq[Column],
                 rankName: String, buckets: Int = 32,
                 offsetJoinThreshold: Int = 64): (DataFrame, Long) = {
    val v = value.cast("double")
    // pass 1: boundary sample, frozen into the plan as literals
    val probs = (1 until buckets).map(_.toDouble / buckets)
    val sampledRow = df.select(percentile_approx(v, typedLit(probs), lit(10000))
      .as("__b")).head()
    // empty frame / all-null values → percentile_approx yields NULL: no
    // boundaries, everything lands in bucket 0 (and ranks over zero rows)
    val sampled =
      if (sampledRow.isNullAt(0)) Seq.empty[Double] else sampledRow.getSeq[Double](0)
    val boundaries = sampled.distinct.sorted
    val bucket: Column =
      if (boundaries.isEmpty) lit(0)
      else boundaries.map(b => when(v > lit(b), 1).otherwise(0)).reduce(_ + _)
    // pass 2: per-bucket histogram → cumulative offsets (O(buckets) rows)
    val counts = df.groupBy(bucket.as("__bucket")).agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = counts.map(_._2).sum
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (b, n)) => (b, acc + n) }
      .sliding(2).collect { case Array((_, acc), (b, _)) => (b, acc) }.toMap
    // pass 3: per-bucket local rank + offset — parallel across buckets.
    // Few buckets → inline the offsets as a literal CASE chain (no extra
    // operator); many buckets (cluster settings run 2-3× total cores, i.e.
    // hundreds-plus) → a thousand-branch expression bloats codegen, so the
    // offsets ride a broadcast hash join instead (same plan parallelism —
    // the O(buckets) offset table broadcasts, never shuffles).
    val w = Window.partitionBy("__bucket").orderBy(value.asc +: tiebreaks.map(_.asc): _*)
    val bucketed = df.withColumn("__bucket", bucket)
    val ranked =
      if (counts.length <= offsetJoinThreshold) {
        val offsetExpr = counts.map(_._1).foldRight(lit(0L)) { (b, rest) =>
          when(col("__bucket") === b, lit(offsets(b))).otherwise(rest)
        }
        bucketed.withColumn(rankName, row_number().over(w).cast("long") + offsetExpr)
      } else {
        val spark = df.sparkSession
        import spark.implicits._
        val offsetTable = broadcast(
          counts.map { case (b, _) => (b, offsets(b)) }.toSeq.toDF("__bucket", "__offset"))
        bucketed
          .withColumn("__rn", row_number().over(w).cast("long"))
          .join(offsetTable, Seq("__bucket"))
          .withColumn(rankName, col("__rn") + col("__offset"))
          .drop("__rn", "__offset")
      }
    (ranked.drop("__bucket"), total)
  }

  /** SQL `ntile(n)` bucket number from a unique global rank and total count:
    * the first `N mod n` tiles hold `⌈N/n⌉` rows, the rest `⌊N/n⌋`.
    * Pure row-local arithmetic once the rank exists — no window at all.
    */
  def ntileFromRank(rank: Column, total: Long, n: Int): Column = {
    val base = total / n
    val rem = total % n
    if (base == 0) rank // degenerate: fewer rows than tiles
    else when(rank <= rem * (base + 1), floor((rank - 1) / (base + 1)) + 1L)
      .otherwise(lit(rem) + floor((rank - 1 - rem * (base + 1)) / base) + 1L)
  }

  /** SQL `percent_rank()` from a unique global rank: (rank-1)/(N-1).
    * Exact-double identical to the window form for N < 2^53.
    */
  def percentRankFromRank(rank: Column, total: Long): Column =
    if (total <= 1) lit(0.0)
    else (rank - 1).cast("double") / lit((total - 1).toDouble)

  /** EXACT global quantiles without a global sort: for each probability p,
    * the k-th smallest non-null value with k = max(1, ⌈p·N⌉) — the
    * discrete ("lower" / `percentile_disc`) quantile, so the answer is an
    * actual data value and cross-engine bit-identical (no interpolation
    * arithmetic to disagree about).
    *
    * Same three-pass recipe as [[globalRank]], but pass 3 only touches the
    * handful of buckets that CONTAIN a requested rank: the approximate
    * boundaries steer bucketing (correctness never depends on their
    * placement), the O(buckets) histogram locates each k's bucket and
    * local offset on the driver, and one per-bucket window over just the
    * straddling buckets — typically probes.length buckets ≈ a few percent
    * of the data — yields the values. Everything else is never sorted.
    * Ties are safe: bucketing depends only on the value, so equal values
    * share a bucket and the value at any rank among them is deterministic
    * even though row_number between ties is not.
    *
    * Returns (p double, k long, value double) — empty for an empty/all-null
    * frame.
    */
  def exactQuantiles(df: DataFrame, value: Column, probs: Seq[Double],
                     buckets: Int = 32): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0.0 && p <= 1.0),
      s"probs must be in (0,1]: $probs")
    val spark = df.sparkSession
    import spark.implicits._
    val v = value.cast("double")
    val vals = df.select(v.as("__v")).where(col("__v").isNotNull)
    val sampledRow = vals.select(percentile_approx(col("__v"),
      typedLit((1 until buckets).map(_.toDouble / buckets)), lit(10000)).as("__b")).head()
    val boundaries =
      (if (sampledRow.isNullAt(0)) Seq.empty[Double]
       else sampledRow.getSeq[Double](0)).distinct.sorted
    val bucket: Column =
      if (boundaries.isEmpty) lit(0)
      else boundaries.map(b => when(col("__v") > lit(b), 1).otherwise(0)).reduce(_ + _)
    val counts = vals.groupBy(bucket.as("__bucket")).agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = counts.map(_._2).sum
    if (total == 0L)
      return Seq.empty[(Double, Long, Double)].toDF("p", "k", "value")
    // driver-side O(probs × buckets): locate each k's bucket + local rank
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (b, n)) => (b, acc + n) }
      .sliding(2).collect { case Array((_, acc), (b, _)) => (b, acc) }.toMap
    val targets = probs.map { p =>
      val k = math.max(1L, math.ceil(p * total).toLong)
      val (b, _) = counts.find { case (b, n) => offsets(b) + n >= k }.get
      (p, k, b, k - offsets(b))
    }
    val targetDf = broadcast(
      targets.toDF("p", "k", "__bucket", "__local_rank"))
    val straddling = targets.map(_._3).toSet
    val w = Window.partitionBy("__bucket").orderBy(col("__v").asc)
    vals.withColumn("__bucket", bucket)
      .where(col("__bucket").isInCollection(straddling))
      .withColumn("__rn", row_number().over(w).cast("long"))
      .join(targetDf,
        Seq("__bucket"))
      .where(col("__rn") === col("__local_rank"))
      .select(col("p"), col("k"), col("__v").as("value"))
  }
}
