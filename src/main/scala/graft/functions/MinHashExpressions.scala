package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash kernels.
  *
  * The composable formulation (`aggregate` + `zip_with` + `transform` over
  * shingle arrays) is semantically right but runs on Spark's interpreted
  * higher-order-function path: one boxed lambda call per (shingle ×
  * perm-hash), ~2.2k per document — measured as the dominant cost of
  * near-dedup at sf0.1. These expressions do the identical computation in
  * one JVM method with primitive loops over xxHash64 (Spark's own XXH64),
  * no boxing, no intermediate arrays beyond the k-long signature.
  *
  * On 100 TB the MinHash map stage is the bulk of a near-dedup pass, so this
  * kernel is the difference between a scan-bound and a CPU-bound pipeline.
  */
private[functions] object MinHashKernel {

  private val Seed = 42L

  /** Whitespace-token 64-bit hashes (each token hashed once). */
  def tokenHashes(text: UTF8String): Array[Long] = {
    val toks = text.split(UTF8String.fromString(" "), -1)
    val out = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      out(i) = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, Seed)
      i += 1
    }
    out
  }

  /** Rolling shingle hashes: combine n consecutive token hashes. */
  def shingleHashes(th: Array[Long], n: Int): Array[Long] = {
    val m = math.max(th.length - (n - 1), 0)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = Seed
      var j = 0
      while (j < n) { h = XXH64.hashLong(th(i + j), h); j += 1 }
      out(i) = h
      i += 1
    }
    out
  }

  /** k-perm MinHash signature over the shingle hashes. Perm-hash p of
    * shingle h is EXACTLY Spark's `xxhash64(h, p)` — hashInt(p, hashLong(h,
    * 42)) — so the HOF reference formulation is bit-identical and an index
    * built with one can be probed with the other. (Also cheaper: the
    * expensive hashLong happens once per shingle, not once per perm.)
    */
  def signature(sh: Array[Long], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val base = XXH64.hashLong(sh(i), Seed)
      var p = 0
      while (p < k) {
        val v = XXH64.hashInt(p, base)
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    sig
  }

  /** 64-bit SimHash over token hashes, one pass: bit b of the fingerprint
    * is the sign of Σ_tokens (+1 if bit b of the token hash else -1).
    * Identical result to the HOF form `aggregate(sequence(0,63), ...)` —
    * but that form re-tokenizes and re-hashes the document once PER BIT
    * (64×) on the interpreted path; here the token hashes exist once.
    */
  def simhash64(th: Array[Long]): Long = {
    val counts = new Array[Int](64)
    var i = 0
    while (i < th.length) {
      val h = th(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  /** Banded LSH hashes of a signature. Band b's hash is EXACTLY Spark's
    * `xxhash64(slice(sig, …), b)` — fold the band's longs from seed 42,
    * then hashInt(b) — keeping the HOF reference formulation bit-identical.
    */
  def bandHashes(sig: Array[Long], bands: Int): Array[Long] = {
    val rpb = sig.length / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = Seed
      var j = 0
      while (j < rpb) { h = XXH64.hashLong(sig(b * rpb + j), h); j += 1 }
      out(b) = XXH64.hashInt(b, h)
      b += 1
    }
    out
  }
}

private[functions] trait TextArrayExpression extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")
}

/** `shingle_hashes(text, n)`: 64-bit hash per n-token shingle. */
case class ShingleHashes(child: Expression, n: Int) extends TextArrayExpression {
  override def nullSafeEval(t: Any): Any =
    new GenericArrayData(MinHashKernel.shingleHashes(
      MinHashKernel.tokenHashes(t.asInstanceOf[UTF8String]), n))
  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
  override def prettyName: String = "shingle_hashes"
}

/** `minhash_signature(text, k, n)`: k-perm MinHash signature. */
case class MinHashSignature(child: Expression, numHashes: Int, shingleN: Int)
    extends TextArrayExpression {
  override def nullSafeEval(t: Any): Any =
    new GenericArrayData(MinHashKernel.signature(
      MinHashKernel.shingleHashes(
        MinHashKernel.tokenHashes(t.asInstanceOf[UTF8String]), shingleN), numHashes))
  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
  override def prettyName: String = "minhash_signature"
}

/** `simhash64(text)`: 64-bit SimHash fingerprint over whitespace tokens. */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")
  override def nullSafeEval(t: Any): Any =
    MinHashKernel.simhash64(MinHashKernel.tokenHashes(t.asInstanceOf[UTF8String]))
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** `minhash_bands(text, k, bands, n)`: banded LSH hashes in one pass. */
case class MinHashBandHashes(child: Expression, numHashes: Int, bands: Int,
                             shingleN: Int) extends TextArrayExpression {
  override def nullSafeEval(t: Any): Any =
    new GenericArrayData(MinHashKernel.bandHashes(
      MinHashKernel.signature(
        MinHashKernel.shingleHashes(
          MinHashKernel.tokenHashes(t.asInstanceOf[UTF8String]), shingleN), numHashes),
      bands))
  override protected def withNewChildInternal(c: Expression): MinHashBandHashes = copy(child = c)
  override def prettyName: String = "minhash_bands"
}
