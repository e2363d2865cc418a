package graft

import org.apache.spark.sql.functions._

import graft.functions.{BloomAgg, BloomFilter}
import graft.ops.Prefilter

/** Bloom semi-join prefilter: exact result parity with the plain semi join,
  * real pruning before the shuffle, bounded false-positive rate.
  */
class PrefilterSpec extends SparkSpec {
  import spark.implicits._

  test("semiJoinBloom returns exactly the plain left-semi rows") {
    val big = spark.range(0, 20000).select(col("id"), (col("id") % 97).as("v"))
    val small = spark.range(0, 20000, 37).select(col("id").as("k"))
    val expected = big.join(small, col("id") === col("k"), "left_semi")
      .select("id").as[Long].collect().sorted.toSeq
    val got = Prefilter.semiJoinBloom(big, small, "id", "k",
        numBits = 1 << 14, k = 5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got === expected)
  }

  test("bloom probe prunes most non-members at a sane FP rate") {
    val members = spark.range(0, 1000).select(col("id"))
    val numBits = 1 << 14 // 16384 bits for 1000 keys * 5 probes → low FP
    val agg = new BloomAgg(numBits)
    val bloom = members
      .select(BloomFilter.positions(col("id"), numBits, 5).as("__pos"))
      .agg(agg.column(col("__pos")).as("__bloom"))
    val probes = spark.range(1000, 101000).select(col("id")) // all non-members
    val fp = probes.crossJoin(broadcast(bloom))
      .filter(BloomFilter.mightContain(col("__bloom"), col("id"), numBits, 5))
      .count()
    val rate = fp.toDouble / 100000
    assert(rate < 0.05, s"false-positive rate $rate too high ($fp of 100000)")
    // and every member answers true (no false negatives, ever)
    val hits = members.crossJoin(broadcast(bloom))
      .filter(BloomFilter.mightContain(col("__bloom"), col("id"), numBits, 5))
      .count()
    assert(hits === 1000L)
  }

  test("empty small side yields an empty result (zero-buffer bloom rejects everything)") {
    val big = spark.range(0, 100).select(col("id"))
    val small = spark.range(0, 0).select(col("id").as("k"))
    assert(Prefilter.semiJoinBloom(big, small, "id", "k", numBits = 1 << 10, k = 3)
      .count() === 0L)
  }

  test("merge is an OR: split-built filter equals whole-built filter") {
    val numBits = 1 << 12
    val agg = new BloomAgg(numBits)
    def build(lo: Long, hi: Long) =
      spark.range(lo, hi)
        .select(BloomFilter.positions(col("id"), numBits, 3).as("__pos"))
        .agg(agg.column(col("__pos")))
        .head().getSeq[Long](0).toArray
    val whole = build(0, 500)
    val merged = agg.merge(build(0, 250), build(250, 500))
    assert(whole.toSeq === merged.toSeq)
  }
}
