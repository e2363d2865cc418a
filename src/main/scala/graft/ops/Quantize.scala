package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding quantization — the storage/bandwidth half of similarity search
  * at 100 TB: float32 → int8 symmetric quantization is a 4× reduction on the
  * corpus' dominant column, and distance computations over int8 codes are
  * the standard serving trade (recall loss bounded by the per-vector scale).
  *
  * Symmetric per-vector scheme: `scale = max|x| / 127`; codes
  * `q_i = round(x_i / scale)` ∈ [−127, 127]; reconstruction `x̂_i = q_i ·
  * scale` with |x̂_i − x_i| ≤ scale/2. Pure column expressions (codegen'd,
  * no UDF, no shuffle); the arithmetic is plain IEEE double ops, so the
  * DuckDB oracle reproduces the codes bit-for-bit.
  */
object Quantize {

  /** Per-vector symmetric scale: max|x| / 127 (0.0 for an all-zero vector). */
  def int8Scale(vec: Column): Column = {
    val mx = array_max(transform(vec, x => abs(x.cast("double"))))
    mx / 127.0
  }

  /** int8 codes for an `array<float>` column (all-zero vector → all-zero
    * codes). Written as `round(x * 127 / max|x|)` with left-to-right
    * association — the oracle mirrors the exact same op order.
    */
  def quantizeInt8(vec: Column): Column = {
    val mx = array_max(transform(vec, x => abs(x.cast("double"))))
    transform(vec, x =>
      when(mx === 0.0, lit(0))
        .otherwise(round(x.cast("double") * 127.0 / mx).cast("int")))
  }

  /** Reconstruct doubles from codes + scale: `q_i · scale`. */
  def dequantizeInt8(codes: Column, scale: Column): Column =
    transform(codes, q => q.cast("double") * scale)
}
