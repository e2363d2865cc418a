package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for dataset construction.
  *
  * `df.sample()` is nondeterministic across runs/partitionings and only
  * approximates the fraction; a training pipeline needs (a) the SAME
  * sample on every run, (b) exact per-stratum quotas for balanced sets.
  * Both come from ordering rows by a content hash (stable, uniform) and
  * cutting at a computed rank — no RNG, no seed bookkeeping.
  */
object Sampling {

  /** Exact stratified sample: per stratum, exactly ceil(fraction · N_h)
    * rows (every non-empty stratum keeps ≥1 — the "no empty class" rule),
    * chosen deterministically by hash order of `idCol` with the id as
    * tiebreak. One window per stratum (hash exchange on the stratum
    * column); a skewed stratum parallelizes no worse than any per-group
    * window — pre-salt upstream if one class dominates at extreme scale.
    */
  def stratifiedExact(df: DataFrame, strataCol: String, idCol: String,
                      fraction: Double): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0, s"fraction in (0,1], got $fraction")
    val part = Window.partitionBy(strataCol)
    val w = part.orderBy(xxhash64(col(idCol)).asc, col(idCol).asc)
    // round before ceil: the double product N·f can land one ulp ABOVE an
    // integral value (100·0.07 = 7.000000000000001), and a bare ceil would
    // then overshoot the documented exact quota by one
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__quota", ceil(round(count(lit(1)).over(part) * lit(fraction), 9)))
      .filter(col("__rn") <= col("__quota"))
      .drop("__rn", "__quota")
  }

  /** Deterministic Bernoulli-style sample by key hash: keeps a row iff its
    * id hashes into the keep range. Unlike `df.sample`, membership is a
    * pure function of the id — stable across runs, re-partitioning, and
    * engines that share the hash. Fraction is approximate (hash-uniform).
    */
  def deterministicByKey(df: DataFrame, idCol: String, mod: Long,
                         keepBelow: Long): Column =
    pmod(xxhash64(col(idCol)), lit(mod)) < keepBelow

  /** Deterministic weighted interleave — the data-MIXING stage: order rows
    * so sources appear in proportion to their weights (weight 3 : 1 ⇒ three
    * rows of the first per one of the second, evenly spread, not blocked).
    *
    * Standard stride scheduling: the k-th row of source s (under the
    * deterministic per-source `ordering`) gets key (k − 0.5) / weight(s);
    * ascending key IS the mixture order. Returns the input plus
    * `mix_key` (double) — a SORT KEY, deliberately not a global
    * row_number (which would need a single-partition window); downstream
    * writes `sortBy(mix_key)` / range-partition on it, and
    * [[graft.ops.Ranks.globalRank]] composes when a dense global position
    * is genuinely needed. One hash exchange on the source column.
    *
    * Rows whose source has no weight are DROPPED (the quota-sampling
    * convention: an unlisted source has weight 0); pure arithmetic, no
    * RNG — the same mixture every run, reproducible across engines.
    */
  def interleaveByWeight(df: DataFrame, sourceCol: String,
                         weights: Map[String, Double],
                         ordering: Seq[Column]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0.0),
      s"weights must be positive, got $weights")
    val wExpr = weights.foldLeft(lit(null).cast("double")) { case (acc, (s, w)) =>
      when(col(sourceCol) === s, lit(w)).otherwise(acc)
    }
    val pos = row_number()
      .over(Window.partitionBy(sourceCol).orderBy(ordering: _*)).cast("long")
    df.filter(col(sourceCol).isInCollection(weights.keys.toSeq))
      .withColumn("mix_key", (pos.cast("double") - 0.5) / wExpr)
  }
}
