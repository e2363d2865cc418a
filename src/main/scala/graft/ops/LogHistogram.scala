package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic log-scale histogram — the quantile member of the engine's
  * mergeable-summary family (KMV → distinct counts, Misra–Gries → heavy
  * hitters, this → value distributions): bucket counts are plain integers,
  * so histograms merge by ADDITION — associative, commutative, replay-
  * auditable — and batch boundaries can never change the result. Where a
  * sampling sketch (KLL, t-digest) needs random coin flips, the bucket map
  * here is a pure function of the value: bit-identical across engines,
  * partitionings and replays, at the price of a fixed relative error.
  *
  * Bucketing (the HdrHistogram idea, public domain): values below 2^s map
  * to themselves (exact); above, each power-of-two octave splits into 2^s
  * sub-buckets, so the bucket width is always ≤ value·2^−s — bounded
  * RELATIVE error at every magnitude, with bucket count logarithmic in the
  * value range (64−s octaves cover all of Long). The index arithmetic is
  * integer-only (msb via the binary-string length, then a shift), making
  * the histogram itself oracle-checkable cross-engine.
  *
  * Scale shape: `bucketOf` is a codegen'd column expression; the histogram
  * is one `groupBy(bucket)` hash aggregation (map-side combined, O(buckets)
  * result); quantile lookup walks the O(buckets) driver-side array.
  * Incremental maintenance needs nothing new — feed
  * `groupBy(bucket).count()` partials through
  * [[graft.streaming.IncrementalAgg.applyBatch]] keyed on the bucket.
  */
object LogHistogram {

  /** Bucket index for a non-negative Long value; integer-exact.
    *
    * v < 2^s → v (exact small values, one bucket per integer);
    * otherwise with m = msb(v): ((m−s+1)·2^s) + (v >> (m−s)) − 2^s,
    * which continues the exact region seamlessly (for m = s it reduces to
    * v) and increases monotonically with v. Negative values raise — a
    * histogram of counts/lengths/latencies has none, and clamping would
    * silently fold them into bucket 0.
    */
  def bucketOf(v: Column, subBits: Int): Column = {
    require(subBits >= 1 && subBits <= 30, s"subBits in [1,30], got $subBits")
    val sub = 1L << subBits
    val lv = v.cast("long")
    val msb = (length(bin(lv)) - 1).cast("int")
    // the Scala shiftright() helper only takes a literal Int shift; the
    // underlying SQL ShiftRight is a full binary expression — call it
    val shifted = call_function("shiftright", lv, msb - lit(subBits))
    val small = lv < sub
    when(lv < 0L, raise_error(lit(
        s"LogHistogram: negative value — buckets are defined for v >= 0")))
      .when(small, lv)
      .otherwise((msb - subBits + 1).cast("long") * sub + shifted - sub)
  }

  /** Inclusive [low, high] value range a bucket covers (driver-side mirror
    * of [[bucketOf]]'s inverse). */
  def bucketRange(bucket: Long, subBits: Int): (Long, Long) = {
    val sub = 1L << subBits
    if (bucket < sub) (bucket, bucket)
    else {
      val o = bucket / sub - 1 // octave shift = msb − subBits
      val top = bucket - o * sub // leading bits incl. the octave's 1-bit
      ((top << o), ((top + 1) << o) - 1)
    }
  }

  /** Quantile estimates from a histogram's (bucket, count) rows: for each
    * q the bucket holding the ⌈q·N⌉-th smallest value, reported as the
    * bucket's midpoint — within relative error 2^−subBits of the true
    * quantile by the bucket-width bound. Input order is irrelevant;
    * O(buckets) driver work. Empty histogram → empty result.
    */
  def quantiles(hist: Seq[(Long, Long)], subBits: Int,
                qs: Seq[Double]): Seq[Long] = {
    require(qs.forall(q => q > 0.0 && q <= 1.0), s"quantiles in (0,1]: $qs")
    if (hist.isEmpty) return Seq.empty
    val sorted = hist.sortBy(_._1)
    val total = sorted.map(_._2).sum
    qs.map { q =>
      val rank = math.max(1L, math.ceil(q * total).toLong)
      var acc = 0L
      val b = sorted.find { case (_, n) => acc += n; acc >= rank }.get._1
      val (lo, hi) = bucketRange(b, subBits)
      lo + (hi - lo) / 2
    }
  }
}
