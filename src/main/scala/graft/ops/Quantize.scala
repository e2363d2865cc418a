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

  /** Integer dot product over two code arrays (long accumulation — products
    * are ≤127², so no overflow below ~10^14 dimensions).
    */
  def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (s, v) => s + v)

  /** Exact top-k by QUANTIZED cosine: in symmetric quantization the
    * per-vector scales cancel out of cosine (cos ≈ A·B / (|A|·|B|) over the
    * int8 codes), so ranking runs entirely on integer MACs over the 4×-
    * smaller codes — the compute half of the quantization trade. Zero
    * vectors (unrankable) are filtered; ties broken by id. Integer dots are
    * EXACT, so the result is oracle-checkable cross-engine, unlike
    * float-sum approximations.
    */
  def int8CosineTopK(embeddings: org.apache.spark.sql.DataFrame,
                     query: org.apache.spark.sql.DataFrame,
                     idCol: String, vecCol: String,
                     k: Int): org.apache.spark.sql.DataFrame = {
    val c = embeddings.select(col(idCol), quantizeInt8(col(vecCol)).as("__codes"))
    val q = query.select(quantizeInt8(col(vecCol)).as("__qcodes"))
    c.crossJoin(broadcast(q))
      .withColumn("__dot", intDot(col("__codes"), col("__qcodes")))
      .withColumn("__na", intDot(col("__codes"), col("__codes")))
      .withColumn("__nb", intDot(col("__qcodes"), col("__qcodes")))
      .filter(col("__na") > 0 && col("__nb") > 0)
      .withColumn("sim", col("__dot").cast("double") /
        (sqrt(col("__na").cast("double")) * sqrt(col("__nb").cast("double"))))
      .select(col(idCol), col("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Seeded ±1 sign matrix for [[randomProject]]: outDim rows of inDim
    * signs from a fixed-seed PRNG — the projection is a pure function of
    * (inDim, outDim, seed), so any engine holding the same three constants
    * rebuilds the identical matrix (the query layer embeds it as literals
    * on both sides of an oracle pair).
    */
  def projectionSigns(inDim: Int, outDim: Int, seed: Long): Array[Array[Int]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(outDim, inDim)(if (rnd.nextBoolean()) 1 else -1)
  }

  /** ±1 random-projection (Achlioptas / JL-transform) dimensionality
    * reduction, integer-exact: components quantize once to micro-unit Longs
    * (round(x·1e6)), each output dim is a signed SUM of those Longs — no
    * double accumulation anywhere, so the projection is bit-reproducible
    * across engines and partitionings. Distances shrink by the usual JL
    * factor; use it as the cheap prefilter in front of exact cosine (scan
    * 8 longs instead of 64 floats — 16× less vector I/O at the screening
    * stage), not as the final ranking.
    *
    * Pure codegen'd column ops (transform + zip_with + aggregate), one
    * value per output dim; no shuffle, no UDF. Long headroom: |component|
    * micro-units × inDim ≤ ~1e13 for unit-norm-ish embeddings — ample.
    */
  def randomProject(vec: Column, signs: Array[Array[Int]]): Column = {
    val q = transform(vec, x => round(x.cast("double") * 1e6).cast("long"))
    array(signs.map { row =>
      aggregate(
        zip_with(q, typedlit(row.toSeq), (a, s) => a * s.cast("long")),
        lit(0L), (acc, x) => acc + x)
    }.toIndexedSeq: _*)
  }
}
