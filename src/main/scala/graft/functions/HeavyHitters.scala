package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitters sketch — mergeable approximate top frequencies
  * over a key column, the hot-key DETECTOR that decides when to reach for
  * [[graft.ops.Skew]]'s salted forms.
  *
  * Guarantee: with capacity k, any key with true frequency > N/(k+1) is
  * retained, and every reported count underestimates the true count by at
  * most N/(k+1) (N = rows seen). The buffer is a bounded k-entry map —
  * O(k) memory regardless of row count, map-side combinable, and the merge
  * (pairwise sum, then decrement by the (k+1)-largest and drop ≤0) keeps
  * the same error bound, so partial aggregation is safe.
  *
  * One bounded map per partition, merged on the driver side of the agg —
  * at 100 TB this is the cheap first pass you run BEFORE choosing salting
  * factors; exact counts for the surviving candidates are one filtered
  * groupBy away.
  */
class HeavyHitters(k: Int) extends Aggregator[Long, Map[Long, Long], Map[Long, Long]] {
  require(k >= 1, s"capacity must be >= 1, got $k")

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(acc: Map[Long, Long], key: Long): Map[Long, Long] = {
    acc.get(key) match {
      case Some(c) => acc.updated(key, c + 1)
      case None if acc.size < k => acc.updated(key, 1L)
      case None =>
        // decrement everything (Misra–Gries step); drop exhausted counters
        acc.flatMap { case (kk, c) => if (c > 1) Some(kk -> (c - 1)) else None }
    }
  }

  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val combined = mutable.Map.empty[Long, Long]
    a.foreach { case (kk, c) => combined(kk) = combined.getOrElse(kk, 0L) + c }
    b.foreach { case (kk, c) => combined(kk) = combined.getOrElse(kk, 0L) + c }
    if (combined.size <= k) combined.toMap
    else {
      // keep the k largest, decrement by the (k+1)-th largest count
      val sorted = combined.toSeq.sortBy { case (kk, c) => (-c, kk) }
      val cut = sorted(k)._2
      sorted.take(k).flatMap { case (kk, c) =>
        if (c - cut > 0) Some(kk -> (c - cut)) else None
      }.toMap
    }
  }

  override def finish(acc: Map[Long, Long]): Map[Long, Long] = acc
  override def bufferEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
  override def outputEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()

  /** Untyped-column form over a long key column. */
  def column(keyCol: Column): Column = udaf(this, Encoders.scalaLong).apply(keyCol)
}
