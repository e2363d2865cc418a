package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values / bottom-k theta) sketch — a MERGEABLE distinct
  * sketch over 64-bit hashes.
  *
  * Why it exists next to `approx_count_distinct` (HLL++): HLL sketches
  * support union only. KMV sketches additionally estimate INTERSECTION (and
  * difference) cardinalities between independently-built sketches — the
  * "how much does corpus A overlap corpus B" question a dedup pipeline asks
  * before committing to a full pairwise pass. At 100 TB each side's sketch
  * is one k-long array; the overlap estimate is a driver-side merge of two
  * k-arrays instead of a distributed join.
  *
  * Representation: the k smallest DISTINCT hash values in unsigned order
  * (stored sign-flipped so signed sort == unsigned sort). Estimator:
  * with R = normalized k-th minimum, distinct ≈ (k-1)/R; exact when fewer
  * than k values were seen. reduce/merge are commutative, associative and
  * idempotent-on-duplicates → map-side partial aggregation is safe, like
  * every aggregate in this engine.
  */
class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k >= 2, s"k must be >= 2, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  /** Insert one hash (sign-flipped to unsigned order), keeping the sorted
    * bottom-k distinct. O(log k) search + O(k) shift only when it lands.
    */
  override def reduce(acc: Array[Long], h: Long): Array[Long] = {
    val v = h ^ Long.MinValue
    val pos = java.util.Arrays.binarySearch(acc, v)
    if (pos >= 0) acc // duplicate
    else {
      val ins = -pos - 1
      if (acc.length >= k && ins >= k) acc // larger than everything kept
      else {
        val n = math.min(acc.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(acc, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(acc, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  /** Sorted-merge keep bottom-k distinct. */
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (o == 0 || out(o - 1) != v) { // cross-side duplicate → emit once
        out(o) = v; o += 1
      }
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  override def finish(acc: Array[Long]): Array[Long] = acc
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  /** Untyped-column form usable in `agg(...)` over a 64-bit hash column. */
  def column(hashCol: Column): Column = udaf(this, Encoders.scalaLong).apply(hashCol)
}

object KmvSketch {

  private val Two64 = math.pow(2.0, 64)

  /** Normalized position of a stored (sign-flipped) value in [0, 1). */
  private def norm(v: Long): Double = (v.toDouble - Long.MinValue.toDouble) / Two64

  /** Distinct-count estimate: exact below k, (k-1)/R at capacity. */
  def estimate(sketch: Array[Long], k: Int): Double =
    if (sketch.length < k) sketch.length.toDouble
    else (k - 1).toDouble / norm(sketch(k - 1))

  /** Union-cardinality estimate: merge (any [[KmvSketch]] instance of the
    * same k) then estimate — exactly what HLL union gives, for symmetry.
    */
  def unionEstimate(a: Array[Long], b: Array[Long], k: Int): Double =
    estimate(new KmvSketch(k).merge(a, b), k)

  /** Difference-cardinality estimate |A \ B| = |A| - |A ∩ B| (clamped). */
  def differenceEstimate(a: Array[Long], b: Array[Long], k: Int): Double =
    math.max(0.0, estimate(a, k) - intersectionEstimate(a, b, k))

  /** Intersection-cardinality estimate between two same-k sketches
    * (theta-sketch style): count common values below the joint threshold
    * theta = min of the two k-th minima, scale by 1/theta.
    */
  def intersectionEstimate(a: Array[Long], b: Array[Long], k: Int): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    val exact = a.length < k && b.length < k
    val theta =
      if (exact) 1.0
      else math.min(
        if (a.length < k) 1.0 else norm(a(k - 1)),
        if (b.length < k) 1.0 else norm(b(k - 1)))
    var i = 0; var j = 0; var common = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) {
        if (exact || norm(a(i)) < theta) common += 1
        i += 1; j += 1
      } else if (a(i) < b(j)) i += 1 else j += 1
    }
    if (exact) common.toDouble else common.toDouble / theta
  }
}
