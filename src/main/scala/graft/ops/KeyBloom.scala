package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.Encoders

/** Per-file Bloom membership index over a key column's `xxhash64` — the
  * missing half of file-level pruning for HASH-DISTRIBUTED keys.
  *
  * The min/max stats index ([[FileStats]]) prunes files whose key RANGE
  * cannot match; that works when a layout clusters keys (range/z-order
  * writes, monotone append families). But the engine's hot probe path —
  * [[graft.cdc.KeyedParquetTable.readForKeys]] over a bucketed table —
  * carries keys that hash uniformly into each bucket, so every file in a
  * multi-commit bucket spans nearly the full key range and min/max prunes
  * nothing. A Bloom filter prunes by MEMBERSHIP instead: a file whose
  * filter misses every probe key provably holds none of them (no false
  * negatives; false positives only cost an extra file read). Iceberg plays
  * the same card via parquet bloom filters / puffin blobs when column
  * ranges are unselective.
  *
  * Sizing: `bits` is per FILE. At the default 2^17 bits (16 KiB) a 13 k-key
  * file sits near 1% false positives (k=6 probes); a file holding far more
  * keys saturates toward all-ones and simply stops pruning — never wrong,
  * just useless, so oversized files degrade gracefully. At 100 TB scale
  * pick bits ≈ 10× the expected keys-per-file (the classic 1%-fpp rule)
  * and the index stays O(files) metadata: 10 M-key files want 2^27 bits
  * (16 MB) — at that point prefer fewer, larger buckets or parquet's own
  * footer blooms; this index targets the metadata-scale sweet spot.
  *
  * Determinism: build and probe both hash with Spark's `xxhash64` (seed 42)
  * over the SAME column values, so membership is bit-exact across engines
  * and sessions. Bit positions derive from one 64-bit hash by double
  * hashing (Kirsch–Mitzenmacher: pos_i = h1 + i·h2), the standard trick
  * that preserves the k-independent analysis without k hash passes.
  */
object KeyBloom {

  /** Probe count. Fixed so persisted filters and probes always agree;
    * 6 probes is the optimum for the 1%-fpp design point (k = m/n·ln2).
    */
  val K = 6

  private def pos(hash: Long, i: Int, mBits: Int): Int = {
    val h1 = hash & 0xffffffffL
    val h2 = (hash >>> 32) | 1L // odd increment: full cycle on pow-2 sizes
    (((h1 + i * h2) & Long.MaxValue) % mBits).toInt
  }

  /** Set the K bits for `hash` in `bs` (mutates). */
  def add(bs: Array[Byte], hash: Long): Unit = {
    val m = bs.length * 8
    var i = 0
    while (i < K) {
      val p = pos(hash, i, m)
      bs(p >>> 3) = (bs(p >>> 3) | (1 << (p & 7))).toByte
      i += 1
    }
  }

  /** Driver-side membership probe — false positives possible, false
    * negatives impossible (same hash, same positions as [[add]]).
    */
  def mightContain(bs: Array[Byte], hash: Long): Boolean = {
    val m = bs.length * 8
    var i = 0
    while (i < K) {
      val p = pos(hash, i, m)
      if ((bs(p >>> 3) & (1 << (p & 7))) == 0) return false
      i += 1
    }
    true
  }

  private class BloomAgg(bits: Int)
      extends Aggregator[Long, Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = new Array[Byte](bits / 8)
    def reduce(b: Array[Byte], hash: Long): Array[Byte] = { add(b, hash); b }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
      a
    }
    def finish(b: Array[Byte]): Array[Byte] = b
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Aggregate column building one `bits`-wide filter per group from a
    * LongType hash column (pass `xxhash64(key)`). Runs as a typed
    * Aggregator (no codegen) — acceptable because it sits on the
    * metadata-build path (once per commit, over only the rewritten files),
    * never in a query plan.
    */
  def agg(bits: Int)(hashCol: Column): Column = {
    require(bits >= 64 && bits % 8 == 0,
      s"bloom bits must be a positive multiple of 8 (>= 64), got $bits")
    udaf(new BloomAgg(bits)).apply(hashCol)
  }
}
