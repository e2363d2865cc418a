package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable Bloom filter aggregate — the broadcastable semi-join prefilter.
  *
  * At 100 TB the expensive part of `big LEFT SEMI JOIN small` is shuffling
  * the big side. When `small`'s key set is selective, a Bloom filter of it
  * (here: `numBits` bits ≈ 128 KiB at the default) broadcasts to every big-
  * side task and prunes non-matching rows AT THE SCAN, so only candidate
  * rows (matches + the bounded false-positive mass) reach the shuffle. The
  * exact join afterwards removes false positives — the filter changes cost,
  * never results. This is the manual form of Spark's runtime-bloom-filter
  * rewrite, usable when the optimizer's thresholds don't fire or the filter
  * should be built once and reused across queries.
  *
  * Hashing stays entirely in Spark expressions (`xxhash64(key, seed)`), so
  * the build side and the probe side can never disagree: the aggregator
  * only sets pre-computed bit POSITIONS ([[BloomFilter.positions]]) and the
  * probe recomputes the same positions column-side.
  *
  * reduce/merge are commutative, associative, idempotent → map-side partial
  * aggregation safe; the buffer is a fixed Array[Long], O(numBits) memory
  * independent of row count.
  */
class BloomAgg(numBits: Int) extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
  require(numBits >= BloomFilter.BitsPerWord, s"numBits too small: $numBits")
  private val words = (numBits + BloomFilter.BitsPerWord - 1) / BloomFilter.BitsPerWord

  override def zero: Array[Long] = new Array[Long](words)

  override def reduce(acc: Array[Long], positions: Seq[Long]): Array[Long] = {
    val it = positions.iterator
    while (it.hasNext) {
      val p = it.next()
      acc((p / BloomFilter.BitsPerWord).toInt) |=
        1L << (p % BloomFilter.BitsPerWord).toInt
    }
    acc
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(acc: Array[Long]): Array[Long] = acc
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  /** Untyped-column form over a bit-position array column. */
  def column(posCol: Column): Column =
    udaf(this, org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
      .apply(posCol)
}

object BloomFilter {

  /** 63 usable bits per word: the probe mask is built as an exact power of
    * two via `pow(2, bit)` (exact in double for bit ≤ 62) and must stay
    * positive in a signed long.
    */
  val BitsPerWord = 63

  /** The k bit positions of `key` — shared by build and probe sides. */
  def positions(key: Column, numBits: Int, k: Int): Column =
    array((0 until k).map(i =>
      pmod(xxhash64(key, lit(i)), lit(numBits.toLong))): _*)

  /** Membership probe against a built filter (array<long> column). */
  def mightContain(bloom: Column, key: Column, numBits: Int, k: Int): Column =
    (0 until k).map { i =>
      val pos = pmod(xxhash64(key, lit(i)), lit(numBits.toLong))
      val word = element_at(bloom, (floor(pos / BitsPerWord) + 1).cast("int"))
      val mask = pow(lit(2.0), (pos % BitsPerWord).cast("double")).cast("long")
      word.bitwiseAND(mask) =!= 0
    }.reduce(_ && _)
}
