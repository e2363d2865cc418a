package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Deterministic sampling: exact quotas, stability across runs/shuffles. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    val rows = for (s <- 0 until 5; i <- 0 until (10 + s * 37))
      yield (s.toLong, s.toLong * 1000 + i)
    rows.toDF("stratum", "id")
  }

  test("stratifiedExact keeps exactly ceil(f*N_h) rows per stratum") {
    val df = fixture
    val out = Sampling.stratifiedExact(df, "stratum", "id", 0.2)
    val got = out.groupBy("stratum").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.groupBy("stratum").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> math.ceil(r.getLong(1) * 0.2).toLong).toMap
    assert(got === want)
  }

  test("sample is deterministic across runs and repartitionings") {
    val df = fixture
    val a = Sampling.stratifiedExact(df, "stratum", "id", 0.3)
      .select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.stratifiedExact(df.repartition(13, col("id")), "stratum", "id", 0.3)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("tiny strata keep at least one row; fraction 1.0 keeps everything") {
    val df = Seq((0L, 1L), (1L, 2L), (1L, 3L)).toDF("stratum", "id")
    val one = Sampling.stratifiedExact(df, "stratum", "id", 0.01)
    assert(one.groupBy("stratum").count().collect().map(_.getLong(1)).toSeq.sorted === Seq(1L, 1L))
    assert(Sampling.stratifiedExact(df, "stratum", "id", 1.0).count() === 3L)
  }

  test("quota stays exact when N·fraction lands one ulp above an integer") {
    // 100 * 0.07 = 7.000000000000001 in IEEE double: quota must be 7, not 8
    val df = (1L to 100L).map(i => (0L, i)).toDF("stratum", "id")
    assert(Sampling.stratifiedExact(df, "stratum", "id", 0.07).count() === 7L)
  }

  test("interleaveByWeight: 2:1 weights spread evenly, unlisted sources dropped") {
    val docs = ((1L to 6L).map(i => (i, "a")) ++ (11L to 13L).map(i => (i, "b"))
      ++ Seq((99L, "junk"))).toDF("id", "src")
    val mixed = Sampling.interleaveByWeight(docs, "src",
        Map("a" -> 2.0, "b" -> 1.0), Seq(col("id")))
      .orderBy("mix_key").collect().map(r => (r.getString(1), r.getLong(0)))
    // stride schedule: a .25, b .5, a .75, a 1.25, b 1.5, a 1.75, ...
    assert(mixed.map(_._1).toSeq ===
      Seq("a", "b", "a", "a", "b", "a", "a", "b", "a"))
    // within each source the deterministic ordering is preserved
    assert(mixed.collect { case ("a", id) => id }.toSeq === (1L to 6L))
    assert(mixed.collect { case ("b", id) => id }.toSeq === (11L to 13L))
    assert(!mixed.exists(_._1 == "junk")) // weight-0 source excluded
  }

  test("shuffleShard: every row exactly once, positions contiguous per shard") {
    val df = (1L to 500L).toDF("id")
    val out = Sampling.shuffleShard(df, "id", "ep0", 8).cache()
    try {
      assert(out.select("id").as[Long].collect().sorted.toSeq === (1L to 500L))
      assert(out.select("shard").as[Int].collect().forall(s => s >= 0 && s < 8))
      // shard_pos is 1..N_s within every shard (a rank, no gaps/dupes)
      val byShard = out.groupBy("shard")
        .agg(count(lit(1)).as("n"), max("shard_pos").as("mx"), min("shard_pos").as("mn"),
          countDistinct("shard_pos").as("nd"))
        .collect()
      assert(byShard.forall(r => r.getLong(2) === r.getLong(1)
        && r.getLong(3) === 1L && r.getLong(4) === r.getLong(1)))
      // leading-16-bit assignment is near-uniform: no empty shard at n=500
      assert(byShard.length === 8 && byShard.forall(_.getLong(1) > 20L))
    } finally out.unpersist()
  }

  test("shuffleShard raises on NULL ids instead of collapsing their keys") {
    val df = Seq(Some(1L), None, Some(3L)).toDF("id")
    val e = intercept[Exception] {
      Sampling.shuffleShard(df, "id", "ep0", 4).collect()
    }
    assert(e.getMessage.contains("NULL id"))
  }

  test("shuffleShard is deterministic; a different seed permutes differently") {
    val df = (1L to 300L).toDF("id")
    def run(seed: String, d: org.apache.spark.sql.DataFrame) =
      Sampling.shuffleShard(d, "id", seed, 4)
        .select("id", "shard", "shard_pos")
        .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2)))).toMap
    val a = run("ep0", df)
    val b = run("ep0", df.repartition(17, col("id")))
    assert(a === b) // stable across partitionings and runs
    val c = run("ep1", df)
    assert(a !== c) // a new epoch seed is a different permutation
    assert(c.keySet === a.keySet) // ... of the same rows
  }

  test("writeShards: one file per shard, physical row order = read order") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_shards_").toString
    val df = (1L to 400L).toDF("id")
    Sampling.writeShards(df, "id", "ep2", 4, dir)
    val expected = Sampling.shuffleShard(df, "id", "ep2", 4)
    for (s <- 0 until 4) {
      val files = Files.list(Paths.get(dir, s"shard=$s")).toArray
        .map(_.toString).filter(_.endsWith(".parquet"))
      assert(files.length === 1, s"shard $s should hold exactly one file")
      // single file, read whole (far below maxPartitionBytes → one split):
      // collect order IS file order
      val physical = spark.read.parquet(files.head).select("id")
        .as[Long].collect().toSeq
      val want = expected.filter(col("shard") === s).orderBy("shard_pos")
        .select("id").as[Long].collect().toSeq
      assert(physical === want, s"shard $s physical order")
    }
  }

  test("selectByBudget equals the single-window cumulative-sum reference") {
    import org.apache.spark.sql.expressions.Window
    // adversarial weights: zeros, ties in the key, a spike bigger than most
    val rows = (1L to 400L).map(i =>
      (i, (i * 37 % 11).toDouble, if (i % 7 == 0) 0L else i % 23 + 1L))
    val df = rows.toDF("id", "quality", "w")
    for (budget <- Seq(0L, 1L, 500L, 2000L, 100000L)) {
      val got = Sampling.selectByBudget(df, "w", budget, -col("quality"),
          Seq(col("id")), buckets = 8)
        .select("id").as[Long].collect().sorted.toSeq
      val ref = df.withColumn("__cum", sum(col("w")).over(
          Window.orderBy(col("quality").desc, col("id").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("__cum") <= budget)
        .select("id").as[Long].collect().sorted.toSeq
      assert(got === ref, s"budget=$budget")
    }
  }

  test("selectByBudget: observed-boundaries path equals the self-sampled path") {
    // the fused form rides budgetBoundariesMetric on a caller-side job and
    // passes the result in — must select exactly the same rows
    val df = (1L to 400L)
      .map(i => (i, (i * 37 % 11).toDouble, i % 23 + 1L))
      .toDF("id", "quality", "w")
    val obs = org.apache.spark.sql.Observation()
    val observed = df
      .observe(obs, Sampling.budgetBoundariesMetric(-col("quality"), 8).as("__b"))
      .localCheckpoint(true)
    val boundaries = Option(obs.get("__b"))
      .map(_.asInstanceOf[Seq[Double]]).getOrElse(Seq.empty)
    assert(boundaries.nonEmpty)
    val fused = Sampling.selectByBudget(observed, "w", 500L, -col("quality"),
        Seq(col("id")), buckets = 8, sampledBoundaries = Some(boundaries))
      .select("id").as[Long].collect().sorted.toSeq
    val self = Sampling.selectByBudget(df, "w", 500L, -col("quality"),
        Seq(col("id")), buckets = 8)
      .select("id").as[Long].collect().sorted.toSeq
    assert(fused === self && fused.nonEmpty)
  }

  test("selectByBudget: non-finite caller boundaries are ignored, result unchanged") {
    // ADVICE r17: a NaN/Inf boundary must not degenerate bucketing (v > NaN
    // is false row-wise) — it is dropped, and the selection still equals the
    // clean-boundaries run
    val df = (1L to 400L)
      .map(i => (i, (i * 37 % 11).toDouble, i % 23 + 1L))
      .toDF("id", "quality", "w")
    val clean = Sampling.selectByBudget(df, "w", 500L, -col("quality"),
        Seq(col("id")), buckets = 8)
      .select("id").as[Long].collect().sorted.toSeq
    val dirty = Sampling.selectByBudget(df, "w", 500L, -col("quality"),
        Seq(col("id")), buckets = 8,
        sampledBoundaries = Some(Seq(Double.NaN, Double.PositiveInfinity,
          Double.NegativeInfinity, -8.0, -4.0)))
      .select("id").as[Long].collect().sorted.toSeq
    assert(dirty === clean && clean.nonEmpty)
  }

  test("selectByBudget: stable across partitionings; negative weights raise") {
    val df = (1L to 200L).map(i => (i, i % 13 + 1L)).toDF("id", "w")
    val a = Sampling.selectByBudget(df, "w", 300L, col("id"), Nil)
      .select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.selectByBudget(df.repartition(17, col("id")), "w", 300L,
        col("id"), Nil)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a === b && a.nonEmpty)
    val bad = Seq((1L, -5L)).toDF("id", "w")
    val e = intercept[Exception] {
      Sampling.selectByBudget(bad, "w", 10L, col("id"), Nil).collect()
    }
    assert(e.getMessage.contains("non-negative"))
  }

  test("capWeightPerGroup equals the per-group window reference") {
    import org.apache.spark.sql.expressions.Window
    val rows = for (g <- 0 until 4; i <- 0 until 120)
      yield (s"src$g", g * 1000L + i, (i * 13 % 9).toDouble, i % 17 + 1L)
    val df = rows.toDF("source", "id", "quality", "w")
    val got = Sampling.capWeightPerGroup(df, "source", "w", 250L,
        -col("quality"), Seq(col("id")))
      .select("id").as[Long].collect().sorted.toSeq
    val ref = df.withColumn("__cum", sum(col("w")).over(
        Window.partitionBy("source").orderBy(col("quality").desc, col("id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("__cum") <= 250L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got === ref && got.nonEmpty)
    // every group stays within budget
    val perGroup = Sampling.capWeightPerGroup(df, "source", "w", 250L,
        -col("quality"), Seq(col("id")))
      .groupBy("source").agg(sum("w").as("t"))
      .as[(String, Long)].collect()
    assert(perGroup.length === 4 && perGroup.forall(_._2 <= 250L))
  }

  test("deterministicByKey membership is a pure function of the id") {
    val df = fixture
    val kept = df.filter(Sampling.deterministicByKey(df, "id", 100L, 25L))
      .select("id").as[Long].collect().toSet
    val keptAgain = df.orderBy(rand(7))
      .filter(Sampling.deterministicByKey(df, "id", 100L, 25L))
      .select("id").as[Long].collect().toSet
    assert(kept === keptAgain)
    // roughly a quarter (hash-uniform; loose bound)
    assert(kept.size > df.count() * 0.15 && kept.size < df.count() * 0.35)
  }

  test("weightedSampleWithoutReplacement: deterministic, exact-k, weight-sensitive") {
    import graft.ops.Sampling
    // 10 heavy items (weight 50) among 190 light (weight 1)
    val df = ((1L to 10L).map(i => (i, 50.0)) ++ (11L to 200L).map(i => (i, 1.0)))
      .toDF("id", "w")
    def draw(seed: String): Set[Long] =
      Sampling.weightedSampleWithoutReplacement(df, "id", "w", k = 20, seed = seed)
        .select("id").as[Long].collect().toSet
    // exact k, deterministic per seed, different across seeds
    val a = draw("s1")
    assert(a.size === 20 && a === draw("s1"))
    assert(a !== draw("s2"))
    // weight sensitivity: heavy ids (5% of rows, ~72% of mass) dominate
    // across seeds — count heavy inclusions over 10 fixed seeds
    val heavyRate = (1 to 10).map(i => draw(s"seed$i").count(_ <= 10L)).sum / 10.0
    assert(heavyRate >= 6.0, s"heavy items under-drawn: $heavyRate of 10 per draw")
    // a uniform draw would take 20/200 = 10% heavy ≈ 1 of 10; weighted must beat it clearly
    // guards: non-positive weight and NULL id raise
    intercept[Exception] {
      Sampling.weightedSampleWithoutReplacement(
        Seq((1L, 0.0)).toDF("id", "w"), "id", "w", 1, "s").collect()
    }
    intercept[Exception] {
      Sampling.weightedSampleWithoutReplacement(
        Seq((Option.empty[Long], 1.0)).toDF("id", "w"), "id", "w", 1, "s").collect()
    }
    // plan: bounded-heap top-k, never a global sort
    val plan = Sampling.weightedSampleWithoutReplacement(df, "id", "w", 5, "s")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no bounded top-k in:\n$plan")
  }

  test("withDrawGate passes a clean draw and raises on each violated invariant") {
    val df = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "w")
    def draw() = Sampling.weightedSampleWithoutReplacement(df, "id", "w", 10, "g")
    // clean draw: gate is transparent (same rows through)
    val gated = Sampling.withDrawGate(draw(), draw(), df, "id", 10)
      .select("id").as[Long].collect().toSet
    assert(gated === draw().select("id").as[Long].collect().toSet)
    assert(gated.size === 10)
    // size violation: claim k=11 for a 10-row draw
    intercept[Exception] {
      Sampling.withDrawGate(draw(), draw(), df, "id", 11).collect()
    }
    // membership violation: source contains none of the drawn ids
    intercept[Exception] {
      Sampling.withDrawGate(draw(), draw(), df.filter($"id" > 1000), "id", 10).collect()
    }
    // determinism violation: "redraw" under a different seed diverges
    val other = Sampling.weightedSampleWithoutReplacement(df, "id", "w", 10, "other")
    intercept[Exception] {
      Sampling.withDrawGate(draw(), other, df, "id", 10).collect()
    }
  }

  test("temperatureMixture: sqrt-rate interleave rebalances toward small sources") {
    // 900 'big' rows vs 100 'small' rows: raw ratio 9:1, sqrt weights
    // 30:10 → the mixture's prefix should carry ~3:1, not 9:1
    val df = ((1L to 900L).map(i => (i, "big")) ++
      (1001L to 1100L).map(i => (i, "small"))).toDF("id", "source")
    val mixed = Sampling.temperatureMixture(df, "source", Seq(col("id")))
    // a source's k-th row has key (k-0.5)/sqrt(n): in any prefix of the
    // ordered mixture the per-source counts track sqrt proportions
    val prefix = mixed.orderBy("mix_key").limit(200)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ratio = prefix("big").toDouble / prefix("small").toDouble
    assert(ratio > 2.5 && ratio < 3.5, s"prefix ratio $ratio, expected ~3")
    // deterministic across partitionings (no RNG anywhere)
    val again = Sampling.temperatureMixture(df.repartition(7), "source", Seq(col("id")))
      .orderBy("mix_key").limit(50).collect().map(_.getLong(0)).toSeq
    assert(again === mixed.orderBy("mix_key").limit(50).collect().map(_.getLong(0)).toSeq)
    // unbounded source sets refuse
    val wide = (1L to 50L).map(i => (i, s"s$i")).toDF("id", "source")
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixture(wide, "source", Seq(col("id")), maxSources = 10)
    }
  }
}
