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

  /** Deterministic epoch shuffle + sharding — the training-EXPORT stage: a
    * reproducible global permutation of the corpus, materialized as shard
    * files a data loader streams in order. Changing `seed` (e.g. the epoch
    * number) yields an independent permutation of the SAME rows — the
    * standard per-epoch reshuffle without any RNG state to persist.
    *
    * Each row gets a shuffle key `md5(seed ':' id)`; the shard is the key's
    * leading 16 bits mod `numShards` (uniform to ±1 row in 65536), and
    * `shard_pos` is the row's rank within its shard under (key, id) order.
    * Reading shards 0..numShards−1 each sorted by `shard_pos` replays the
    * permutation. md5-of-string is engine-portable (unlike xxhash64's
    * seed/typing subtleties across engines), so a loader in ANY system can
    * recompute the assignment; uniformity of the low digits is what the
    * fraction-cut samplers above rely on too.
    *
    * One hash exchange on the shard id + an in-partition sort; no global
    * sort, no single-partition window. Each shard's rank runs on one task,
    * so pick numShards ≫ executor count at scale (thousands of shards for
    * a 100 TB corpus — which is also what the loader wants).
    */
  def shuffleShard(df: DataFrame, idCol: String, seed: String,
                   numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    // loud failure on NULL ids (leakageSafeSplit's convention): concat_ws
    // would silently skip them, giving every null-id row the SAME key and
    // an undefined tie order — a nondeterministic permutation
    val id = when(col(idCol).isNull, raise_error(lit(
        s"shuffleShard: NULL $idCol — the permutation key needs a non-null id")))
      .otherwise(col(idCol).cast("string"))
    val key = md5(concat_ws(":", lit(seed), id))
    val shard = pmod(conv(substring(col("__shuffle_key"), 1, 4), 16, 10)
      .cast("long"), lit(numShards.toLong)).cast("int")
    df.withColumn("__shuffle_key", key)
      .withColumn("shard", shard)
      .withColumn("shard_pos", row_number().over(
        Window.partitionBy("shard")
          .orderBy(col("__shuffle_key").asc, col(idCol).asc)).cast("long"))
      .drop("__shuffle_key")
  }

  /** Materialize [[shuffleShard]]'s permutation as a training-export
    * directory: `path/shard=K/` per shard, with the PHYSICAL row order
    * inside each shard's file equal to the shard's read order — a data
    * loader streams the file sequentially, no sort at load time.
    *
    * `repartition(numShards, shard)` hash-routes each whole shard to one
    * task (possibly several shards per task), and `sortWithinPartitions
    * (shard, shard_pos)` lays every shard's rows out contiguously in
    * order — so each `shard=K/` dir holds exactly one file written in
    * read order. One exchange + one in-partition sort beyond
    * [[shuffleShard]]'s own window.
    */
  def writeShards(df: DataFrame, idCol: String, seed: String,
                  numShards: Int, path: String): Unit =
    shuffleShard(df, idCol, seed, numShards)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions("shard", "shard_pos")
      .write.partitionBy("shard").mode("overwrite").parquet(path)

  /** Budget-capped greedy selection — "take the best documents until the
    * token budget is spent": keeps exactly the rows whose running total of
    * `weightCol` (summed in ascending (`key`, tiebreaks) order — pass e.g.
    * `-quality` for best-first) stays ≤ `budget`. Equivalent to the SQL
    * {{{ SUM(w) OVER (ORDER BY key, tiebreaks ROWS UNBOUNDED PRECEDING)
    *     <= budget }}}
    * but never plans the single-task global window that form implies.
    *
    * Same three-pass shape as [[graft.ops.Ranks.globalRank]]: sampled key
    * boundaries freeze into literals (placement only steers parallelism),
    * a per-bucket weight histogram (O(buckets) rows to the driver) turns
    * into cumulative offsets, and then — because weights are non-negative,
    * so the running total is monotone across buckets — every bucket is
    * classified whole: total within budget → kept outright (no window),
    * past it → dropped outright; only the ONE straddling bucket computes a
    * per-row running total (a single ~N/buckets task — raise `buckets` at
    * scale). Rows after the first overflow are excluded even if their own
    * weight is 0, exactly matching the window form. NULL weights count 0;
    * NULL keys sort first (Spark's asc default). Ties beyond `tiebreaks`
    * make the cut nondeterministic — supply a unique total order.
    */
  /** The boundary-sampling aggregate [[selectByBudget]] runs as its first
    * pass — exposed so a caller that already materializes the input (e.g.
    * an eager localCheckpoint of a scored corpus) can ride it on that job
    * as an observed metric and pass the result through `sampledBoundaries`,
    * deleting one full scan from the three-pass plan. Boundaries steer
    * PARALLELISM only — the histogram and the cut are always computed from
    * the real data, so a skewed (or garbage) sample can degrade bucketing
    * but never the result; [[selectByBudget]] additionally drops non-finite
    * values from caller-supplied boundaries (percentile_approx can never
    * emit them, but a pass-through of some other metric could).
    */
  def budgetBoundariesMetric(key: Column, buckets: Int = 32): Column =
    percentile_approx(key.cast("double"),
      typedLit((1 until buckets).map(_.toDouble / buckets)), lit(10000))

  def selectByBudget(df: DataFrame, weightCol: String, budget: Long,
                     key: Column, tiebreaks: Seq[Column],
                     buckets: Int = 32,
                     sampledBoundaries: Option[Seq[Double]] = None): DataFrame = {
    require(budget >= 0L, s"budget must be non-negative, got $budget")
    val v = key.cast("double")
    val w = coalesce(col(weightCol).cast("long"), lit(0L))
    val guardedW = when(w < 0L,
      raise_error(lit(s"selectByBudget: negative $weightCol — monotone " +
        "running totals need non-negative weights"))).otherwise(w)
    val sampled = sampledBoundaries.getOrElse {
      val probs = (1 until buckets).map(_.toDouble / buckets)
      val sampledRow = df.select(percentile_approx(v, typedLit(probs), lit(10000))
        .as("__b")).head()
      if (sampledRow.isNullAt(0)) Seq.empty[Double] else sampledRow.getSeq[Double](0)
    }
    // non-finite guard (ADVICE r17): `v > NaN` is false for every row, so a
    // NaN boundary silently collapses all rows into bucket 0 and the
    // straddler window becomes one global-sort task — correctness would
    // survive (the histogram/cut use real data) but the documented
    // no-single-task contract would not
    val boundaries =
      sampled.filter(java.lang.Double.isFinite(_)).distinct.sorted
    val bucket: Column =
      if (boundaries.isEmpty) lit(0)
      else boundaries.map(b => when(v > lit(b), 1).otherwise(0)).reduce(_ + _)
    val hist = df.groupBy(bucket.as("__bucket")).agg(sum(guardedW).as("__w"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val starts = hist.scanLeft((0, 0L)) { case ((_, acc), (b, n)) => (b, acc + n) }
      .sliding(2).collect { case Array((_, acc), (b, _)) => (b, acc) }.toMap
    val keepWhole = hist.collect {
      case (b, bw) if starts(b) + bw <= budget => b
    }.toSet
    // monotone totals ⇒ at most one straddler: starts within budget, end past
    val straddler = hist.find { case (b, bw) =>
      starts(b) <= budget && starts(b) + bw > budget
    }
    val bucketed = df.withColumn("__bucket", bucket)
    val whole =
      if (keepWhole.isEmpty) bucketed.filter(lit(false))
      else bucketed.filter(col("__bucket").isInCollection(keepWhole))
    straddler match {
      case None => whole.drop("__bucket")
      case Some((b, _)) =>
        val win = Window.partitionBy("__bucket")
          .orderBy(key.asc +: tiebreaks.map(_.asc): _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cut = bucketed.filter(col("__bucket") === b)
          .withColumn("__cum", sum(guardedW).over(win) + lit(starts(b)))
          .filter(col("__cum") <= budget)
          .drop("__cum")
        whole.unionByName(cut).drop("__bucket")
    }
  }

  /** Per-group budget cap — the token-quota form of source balancing: within
    * each group (source/domain/language), keep rows in ascending (`key`,
    * tiebreaks) order while the group's running `weightCol` total stays
    * ≤ `budget` ("every source contributes at most B tokens, best first").
    * One partitioned window — a hash exchange on the group column, each
    * group an independent task; contrast [[selectByBudget]], whose budget
    * is GLOBAL and therefore needs the three-pass plan. If one group
    * dominates the corpus at extreme scale, run [[selectByBudget]] on that
    * group alone and this cap on the rest. NULL weights count 0; negative
    * weights raise (monotonicity of the running total is what makes the
    * cut well-defined).
    */
  def capWeightPerGroup(df: DataFrame, groupCol: String, weightCol: String,
                        budget: Long, key: Column,
                        tiebreaks: Seq[Column]): DataFrame = {
    require(budget >= 0L, s"budget must be non-negative, got $budget")
    val w = coalesce(col(weightCol).cast("long"), lit(0L))
    val guardedW = when(w < 0L,
      raise_error(lit(s"capWeightPerGroup: negative $weightCol — monotone " +
        "running totals need non-negative weights"))).otherwise(w)
    val win = Window.partitionBy(groupCol)
      .orderBy(key.asc +: tiebreaks.map(_.asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(guardedW).over(win))
      .filter(col("__cum") <= budget)
      .drop("__cum")
  }

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

  /** Temperature-weighted source mixture — the multilingual/multi-source
    * up/down-sampling recipe (sample source s proportionally to n_s^α, so
    * big sources stop drowning small ones): derive the weights FROM the
    * per-source counts, then the deterministic stride interleave
    * ([[interleaveByWeight]]). α is fixed at 1/2: sqrt is the one power
    * IEEE-754 guarantees correctly rounded, so the derived weights — and
    * therefore every mix_key — are bit-identical across engines, where a
    * pow(n, 0.3) would differ by libm ulps (the documented reason the
    * A-ES sampler below is spec-gated rather than oracle-gated).
    *
    * Sources are bounded by contract (`maxSources` refuses a runaway
    * grouping — a mixture over unbounded sources is a modeling error),
    * so the count table collects driver-side: one small agg job, then
    * the interleave's single hash exchange.
    */
  def temperatureMixture(df: DataFrame, sourceCol: String,
                         ordering: Seq[Column],
                         maxSources: Int = 1000): DataFrame = {
    require(df.schema(sourceCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"temperatureMixture: '$sourceCol' must be STRING (weights key on " +
        s"source names), got ${df.schema(sourceCol).dataType.sql}")
    val counts = df.groupBy(sourceCol).agg(count(lit(1)).as("__n"))
      .orderBy(col(sourceCol)).limit(maxSources + 1).collect()
    // a NULL source would derive a weight and then silently vanish in the
    // interleave's equality match — refuse instead of losing rows
    require(counts.forall(!_.isNullAt(0)),
      s"temperatureMixture: NULL values in '$sourceCol' — a null source " +
        "is unmixable (coalesce it to a named bucket first)")
    require(counts.length <= maxSources,
      s"temperatureMixture: more than $maxSources distinct '$sourceCol' " +
        "values — a mixture needs a bounded source set (raise maxSources " +
        "if this is intentional)")
    val weights = counts.map(r =>
      r.getAs[String](sourceCol) -> math.sqrt(r.getAs[Long]("__n").toDouble)).toMap
    interleaveByWeight(df, sourceCol, weights, ordering)
  }

  /** WEIGHTED sample WITHOUT replacement (Efraimidis–Spirakis A-ES):
    * draw `k` rows where each row's inclusion odds scale with its weight
    * (quality-weighted corpus draws, importance-sampled eval sets),
    * deterministically — the "randomness" is a content hash, so the same
    * (seed, data) always draws the same sample and a different seed is a
    * fresh draw. No RNG state, no driver data beyond the top-k machinery.
    *
    * Per row: u = hash(seed, id) mapped to (0, 1); key = u^(1/w); keep
    * the k largest keys. That is exactly A-ES, whose keys realize a
    * weighted permutation — P(row i drawn first) = w_i / Σw. One scan +
    * a bounded-heap top-k (TakeOrderedAndProject — never a global sort).
    *
    * Cross-engine caveat (why this is spec-gated, not oracle-gated): the
    * key needs `pow`, and libm ulp differences can flip the order of
    * near-tied keys between engines — fine within one engine (bitwise
    * reproducible), not a cross-engine hash contract like the integer
    * samplers above. Weights must be > 0; NULL ids raise (a NULL would
    * silently hash to a constant and always win or always lose).
    */
  def weightedSampleWithoutReplacement(df: DataFrame, idCol: String,
                                       weightCol: String, k: Int,
                                       seed: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val guardedId = when(col(idCol).isNull,
      raise_error(lit(s"weightedSample: NULL $idCol"))).otherwise(col(idCol))
    val w = col(weightCol).cast("double")
    val guardedW = when(w.isNull || w <= 0.0,
      raise_error(lit(s"weightedSample: non-positive weight"))).otherwise(w)
    // 53 mantissa-safe bits of the hash → uniform in (0, 1); the +0.5
    // offset keeps u strictly inside the open interval (u = 0 would make
    // every key 0; u = 1 would erase the weight)
    val u = (pmod(xxhash64(lit(seed), guardedId), lit(1L << 53)).cast("double") + 0.5) /
      lit((1L << 53).toDouble)
    df.withColumn("__aes_key", pow(u, lit(1.0) / guardedW))
      .orderBy(col("__aes_key").desc, col(idCol).asc)
      .limit(k)
      .drop("__aes_key")
  }

  /** In-query invariant gate for a deterministic draw (the sampler analog
    * of [[graft.ops.Similarity.withRecallGate]]): RAISE unless the sample
    * (a) has exactly `k` rows, (b) only contains ids that exist in
    * `source`, and (c) is identical to `redraw` — a SECOND evaluation of
    * the same draw, so a lost determinism property (an RNG sneaking in, a
    * partition-order dependence) fails the correctness row loudly instead
    * of passing rows-only. All three audits are O(k) semi-joins/counts
    * broadcast onto the k output rows; `assert_true` rides in a filter
    * column every output row evaluates, so Catalyst cannot prune it.
    */
  def withDrawGate(sample: DataFrame, redraw: DataFrame, source: DataFrame,
                   idCol: String, k: Int): DataFrame = {
    val audit = sample
      .join(broadcast(source.select(idCol).distinct()
        .withColumn("__in_src", lit(1))), Seq(idCol), "left")
      .join(broadcast(redraw.select(col(idCol), lit(1).as("__in_redraw"))),
        Seq(idCol), "left")
      .agg(count(lit(1)).as("__n"), count(col("__in_src")).as("__known"),
        count(col("__in_redraw")).as("__stable"))
    sample.crossJoin(broadcast(audit))
      .withColumn("__draw_ok", assert_true(
        col("__n") === k && col("__known") === k && col("__stable") === k,
        concat(lit(s"draw gate (k=$k): n="), col("__n").cast("string"),
          lit(" in-source="), col("__known").cast("string"),
          lit(" redraw-stable="), col("__stable").cast("string"))))
      .filter(col("__draw_ok").isNull)
      .drop("__draw_ok", "__n", "__known", "__stable")
  }
}
