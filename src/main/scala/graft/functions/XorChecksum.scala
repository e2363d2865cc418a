package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator[IN, BUF, OUT]` for the order-independent row-hash
  * checksum — the custom-aggregate tier of SURVEY §7.3. Functionally
  * equivalent to `bit_xor(hash)` built-ins; provided as the typed-API form
  * so Dataset pipelines can fold checksums without dropping to SQL, and as
  * the template for richer mergeable state (sketch unions etc.).
  *
  * XOR is commutative/associative → partial aggregation (map-side combine)
  * is exact and shuffle-order-independent.
  */
object XorChecksum extends Aggregator[Long, Long, Long] {
  override def zero: Long = 0L
  override def reduce(acc: Long, h: Long): Long = acc ^ h
  override def merge(a: Long, b: Long): Long = a ^ b
  override def finish(acc: Long): Long = acc
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong

  /** Untyped-column form usable in `agg(...)`. */
  def column(hashCol: Column): Column = udaf(XorChecksum).apply(hashCol)
}
