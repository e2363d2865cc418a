package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A TRAINED document-quality filter — the model-based stage after
  * [[TextOps.qualityScore]]'s heuristics: binary logistic regression over
  * hashed bag-of-token features (the fastText-style linear classifier
  * every production corpus filter starts from), trained ENTIRELY in
  * DataFrame operations. No ML library: the model is `dim` doubles + a
  * bias, the gradient is one aggregation per iteration, and scoring is a
  * codegen'd projection.
  *
  * Scale shape: features are (doc, feat, x) rows — Σ distinct
  * (doc, token-hash) pairs, bounded by corpus token count — computed ONCE
  * and checkpointed; every iteration is two shuffles (margin per doc,
  * gradient per feature) plus one ≤`dim`-row collect. Driver state is the
  * dense weight vector: `dim` ≤ 2^18 enforced, the same
  * declared-driver-bound contract as BPE's `maxWords`.
  *
  * Determinism: gradients and margins accumulate as DECIMAL(28,12) sums
  * (each double term quantized at 1e-12, then summed EXACTLY — Spark's
  * decimal sum is order-independent), and the driver re-quantizes weights
  * at 1e-12 every step, so training produces bit-identical weights under
  * any partitioning — the engine's exact-sum discipline applied to SGD.
  * (A plain double sum would drift with shuffle order and make the
  * trained model irreproducible.)
  */
object QualityFilter {

  private val MaxDim = 1 << 18

  /** Hashed, length-normalized token features: (\_\_id, \_\_feat, \_\_x) with
    * x = token-count / doc-token-total (length normalization keeps long
    * documents from dominating purely by repetition). One wordcount
    * shuffle + one per-doc total join; the caller checkpoints.
    */
  private def features(docs: DataFrame, idCol: String, textCol: String,
                       dim: Int): DataFrame = {
    val toks = docs
      .select(col(idCol).as("__id"), explode(split(col(textCol), " ")).as("__tok"))
      .filter(length(col("__tok")) > 0)
      .select(col("__id"), pmod(xxhash64(col("__tok")), lit(dim.toLong))
        .cast("int").as("__feat"))
      .groupBy("__id", "__feat").agg(count(lit(1)).as("__cnt"))
    val totals = toks.groupBy("__id").agg(sum("__cnt").as("__tot"))
    toks.join(totals, "__id")
      .select(col("__id"), col("__feat"),
        (col("__cnt").cast("double") / col("__tot").cast("double")).as("__x"))
  }

  private def dec(c: Column): Column = c.cast("decimal(28,12)")

  /** Train `iters` full-batch gradient-descent steps of logistic
    * regression on `labelCol` ∈ {0, 1}. Returns `dim + 1` weights — index
    * `dim` is the bias. Deterministic under any partitioning (see object
    * doc). Documents whose text hashes to no feature (empty text)
    * contribute through the bias only.
    */
  def train(docs: DataFrame, idCol: String, textCol: String, labelCol: String,
            dim: Int = 1 << 15, iters: Int = 15, lr: Double = 4.0): Array[Double] = {
    require(dim > 0 && dim <= MaxDim,
      s"dim=$dim out of (0, $MaxDim] — the weight vector is driver state")
    require(iters >= 1 && lr > 0, s"need iters >= 1 (got $iters), lr > 0 (got $lr)")
    val feats = features(docs, idCol, textCol, dim).localCheckpoint(true)
    val labels = docs
      .select(col(idCol).as("__id"), col(labelCol).cast("double").as("__y"))
      .localCheckpoint(true)
    val nDocs = labels.count().toDouble
    require(nDocs > 0, "train: empty corpus")
    val w = new Array[Double](dim + 1)
    def q(d: Double): Double = math.rint(d * 1e12) / 1e12
    var it = 0
    while (it < iters) {
      val wLit = lit(w.take(dim))
      val margins = feats
        .withColumn("__wx", element_at(wLit, col("__feat") + 1) * col("__x"))
        .groupBy("__id").agg(sum(dec(col("__wx"))).as("__m"))
      val resid = labels.join(margins, Seq("__id"), "left")
        .withColumn("__p", lit(1.0) /
          (lit(1.0) + exp(-(coalesce(col("__m").cast("double"), lit(0.0)) + w(dim)))))
        .withColumn("__r", col("__p") - col("__y"))
      // gradient: Σ_docs r·x per feature + Σ r for the bias, both exact
      // decimal sums; collect is ≤ dim + 1 rows — driver-bounded by the
      // declared cap, independent of corpus size
      val g = resid.join(feats, "__id")
        .groupBy("__feat").agg(sum(dec(col("__r") * col("__x"))).as("__g"))
        .collect()
      val gb = resid.agg(sum(dec(col("__r")))).head().getDecimal(0)
      g.foreach { r =>
        val f = r.getInt(0)
        w(f) = q(w(f) - lr * r.getDecimal(1).doubleValue() / nDocs)
      }
      w(dim) = q(w(dim) - lr * gb.doubleValue() / nDocs)
      it += 1
    }
    w
  }

  /** Score every document with a trained model: (idCol, score) with
    * score = σ(w·x + b) ∈ (0, 1). One pass — the margin aggregation is the
    * only shuffle; the σ is a codegen'd projection.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            weights: Array[Double]): DataFrame = {
    val dim = weights.length - 1
    require(dim > 0 && dim <= MaxDim, s"weights must be dim+1 doubles")
    val wLit = lit(weights.take(dim))
    val margins = features(docs, idCol, textCol, dim)
      .withColumn("__wx", element_at(wLit, col("__feat") + 1) * col("__x"))
      .groupBy("__id").agg(sum(dec(col("__wx"))).as("__m"))
    docs.select(col(idCol)).join(margins, col(idCol) === col("__id"), "left")
      .select(col(idCol),
        (lit(1.0) / (lit(1.0) + exp(-(coalesce(col("__m").cast("double"),
          lit(0.0)) + weights(dim))))).as("score"))
  }
}
