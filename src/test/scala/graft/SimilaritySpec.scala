package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** ANN: brute force is the ground truth; LSH must achieve high recall on
  * clustered data while scanning only candidate buckets.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16

  /** Deterministic clustered vectors: 10 clusters, 30 points each. */
  private def clustered = {
    val rnd = new scala.util.Random(5)
    val centers = Seq.fill(10)(Array.fill(dim)(rnd.nextGaussian()))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 30
    } yield {
      val noisy = c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat)
      (ci.toLong * 30 + j, noisy.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("cosineTopK returns the query's own cluster first") {
    val emb = clustered
    val query = emb.filter(col("vec_id") === 0).select("embedding")
    val top = Similarity.cosineTopK(emb.filter(col("vec_id") =!= 0), query,
      "vec_id", "embedding", 10).collect()
    assert(top.forall(_.getLong(0) < 30), "top-10 should all come from cluster 0")
    assert(top.map(_.getDouble(1)).toSeq === top.map(_.getDouble(1)).sorted.reverse)
  }

  test("lshTopK recall ≥ 0.8 vs brute force on clustered data") {
    val emb = clustered
    val query = emb.filter(col("vec_id") === 0).select("embedding")
    val rest = emb.filter(col("vec_id") =!= 0)
    val exact = Similarity.cosineTopK(rest, query, "vec_id", "embedding", 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.lshTopK(rest, query, "vec_id", "embedding", 10,
      nPlanes = 8, dim = dim).collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall exact=$exact approx=$approx")
  }

  test("lshTopK scans a strict subset (bucket pruning actually prunes)") {
    val emb = clustered
    val query = emb.filter(col("vec_id") === 0).select("embedding")
    val rest = emb.filter(col("vec_id") =!= 0)
    val planes = Similarity.hyperplanes(8, dim)
    val candidates = rest.withColumn("b", Similarity.lshBucket(col("embedding"), planes))
    val qBucket = query.select(Similarity.lshBucket(col("embedding"), planes)).head().getLong(0)
    val probes = (0L +: (0 until 8).map(i => 1L << i)).map(qBucket ^ _).toSet
    val scanned = candidates.filter(col("b").isInCollection(probes)).count()
    assert(scanned < rest.count(), "LSH should prune most buckets")
    assert(scanned > 0)
  }

  test("centroid assignment maps every vector to its generating cluster") {
    val emb = clustered
    // centroids = the first member of each cluster (close enough at 0.05 noise)
    val cents = emb.filter(col("vec_id") % 30 === 0)
      .select((col("vec_id") / 30).cast("long").as("cid"), col("embedding").as("cvec"))
    val assigned = Similarity.assignNearestCentroid(emb, cents,
      "vec_id", "embedding", "cid", "cvec")
    val wrong = assigned.filter((col("vec_id") / 30).cast("long") =!= col("centroid_id")).count()
    assert(wrong.toDouble / 300 < 0.05, s"$wrong of 300 misassigned")
  }

  test("dot/norm double arithmetic is exact and deterministic") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val row = df.select(
      Similarity.dot(col("a"), col("b")).as("d"),
      Similarity.norm(col("a")).as("n")).head()
    assert(row.getDouble(0) === 32.0)
    assert(math.abs(row.getDouble(1) - math.sqrt(14.0)) < 1e-15)
  }

  test("native vec_dot expression is bit-identical to the HOF formulation") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)((Seq.fill(64)(rnd.nextFloat() - 0.5f),
      Seq.fill(64)(rnd.nextFloat() - 0.5f)))
    val df = rows.toDF("a", "b")
    val diff = df.select(
        (Similarity.dot(col("a"), col("b")) -
          Similarity.dotHof(col("a"), col("b"))).as("d"))
      .filter(col("d") =!= 0.0).count()
    assert(diff === 0L)
  }

  test("vec_dot matches HOF null semantics: mismatched lengths and null elements → NULL") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val r = df.select(Similarity.dot(col("a"), col("b")).as("k"),
      Similarity.dotHof(col("a"), col("b")).as("h")).head()
    assert(r.isNullAt(0) && r.isNullAt(1)) // both formulations agree
    val withNull = spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS d")
    assert(withNull.head().isNullAt(0))
  }

  test("vec_dot is callable from SQL via GraftExtensions") {
    val row = spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))").head()
    assert(row.getDouble(0) === 11.0)
  }

  test("wrong-arity SQL calls to registered kernels fail with an arity message") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(CAST(1.0 AS FLOAT)))").collect()
    }
    assert(msgs(e).exists(_.contains("expects 2 arguments")), msgs(e).mkString(" | "))
  }

  test("cosineNearDupPairs finds planted near-identical vectors, bounded buckets") {
    val rnd = new scala.util.Random(9)
    val base = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val nearDup = base.map(x => x + rnd.nextGaussian().toFloat * 0.01f)
    val others = Seq.tabulate(50)(i => (100L + i, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq))
    val df = (Seq((0L, base.toSeq), (1L, nearDup.toSeq)) ++ others).toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairs(df, "vec_id", "embedding",
        threshold = 0.95, nPlanes = 8, dim = dim)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"planted near-dup missed: $pairs")
    // random gaussian pairs at dim 16 essentially never reach cos >= 0.95
    assert(pairs.size <= 3, s"too many spurious pairs: $pairs")
  }

  test("semanticDedup keeps one doc per planted dup group; clean docs untouched") {
    val rnd = new scala.util.Random(11)
    // three dup groups (near-identical copies) + 50 clean docs
    def grp(baseId: Long, n: Int) = {
      val base = Array.fill(dim)(rnd.nextGaussian().toFloat)
      Seq.tabulate(n)(j => (baseId + j,
        base.map(x => x + rnd.nextGaussian().toFloat * 0.005f).toSeq))
    }
    val dups = grp(0L, 3) ++ grp(100L, 2) ++ grp(200L, 4)
    val clean = Seq.tabulate(50)(i =>
      (1000L + i, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq))
    val df = (dups ++ clean).toDF("vec_id", "embedding")
    val groups = Similarity.semanticDedup(df, "vec_id", "embedding",
        threshold = 0.97, nPlanes = 6, dim = dim)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every planted copy resolves to its group's min id
    Seq(0L -> Seq(0L, 1L, 2L), 100L -> Seq(100L, 101L),
        200L -> Seq(200L, 201L, 202L, 203L)).foreach { case (rep, members) =>
      members.foreach(m => assert(groups.get(m).contains(rep),
        s"doc $m: expected keeper $rep, got ${groups.get(m)} in $groups"))
    }
    // clean docs appear in no pair (gaussian dim-16 cos ≥ 0.97 ~ never)
    assert(groups.keys.forall(_ < 1000L), s"clean docs paired: $groups")
    // the scale guard refuses a degenerate clustering loudly
    val e = intercept[IllegalArgumentException] {
      Similarity.semanticDedup(df, "vec_id", "embedding",
        threshold = 0.97, nPlanes = 6, dim = dim, maxCellSize = 1L)
    }
    assert(e.getMessage.contains("maxCellSize"), e.getMessage)
  }

  test("ivfBuild + ivfQuery: recall ≥ 0.8 vs brute force from the persisted index") {
    val emb = clustered
    val query = emb.filter(col("vec_id") === 0).select("embedding")
    val rest = emb.filter(col("vec_id") =!= 0)
    val exact = Similarity.cosineTopK(rest, query, "vec_id", "embedding", 10)
      .collect().map(_.getLong(0)).toSet
    val dir = tmpDir("ivfidx")
    Similarity.ivfBuild(rest, "vec_id", "embedding", dir, nPlanes = 4, dim = dim)
    val ivf = Similarity.ivfQuery(spark, dir, query, "vec_id", "embedding", 10,
      nProbe = 4).collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall exact=$exact ivf=$ivf")
  }

  test("ivfQueryAll: batched per-query top-k keeps recall ≥ 0.8 vs brute force") {
    val emb = clustered
    val qids = Seq(0L, 30L, 60L) // one query from each of three clusters
    val queries = emb.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), col("embedding"))
    val corpus = emb.filter(!col("vec_id").isin(qids: _*))
    val dir = tmpDir("ivfbatch")
    Similarity.ivfBuild(corpus, "vec_id", "embedding", dir, nPlanes = 4, dim = dim)
    val got = Similarity.ivfQueryAll(spark, dir, queries, "qid", "vec_id",
        "embedding", 10, nProbe = 4)
      .collect().groupBy(_.getLong(0)).map { case (q, rows) =>
        q -> rows.map(_.getLong(1)).toSet }
    qids.foreach { q =>
      val exact = Similarity.cosineTopK(corpus,
        emb.filter(col("vec_id") === q).select("embedding"),
        "vec_id", "embedding", 10).collect().map(_.getLong(0)).toSet
      val recall = exact.intersect(got(q)).size.toDouble / exact.size
      assert(recall >= 0.8, s"query $q recall=$recall exact=$exact got=${got(q)}")
      assert(got(q).size === 10)
    }
  }

  test("ivfQuery probe scan reads a strict subset of the index files") {
    val emb = clustered
    val rest = emb.filter(col("vec_id") =!= 0)
    val dir = tmpDir("ivfprune")
    Similarity.ivfBuild(rest, "vec_id", "embedding", dir, nPlanes = 4, dim = dim)
    val all = spark.read.parquet(s"$dir/vectors")
    val cells = all.select(col("centroid_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    assert(cells.length >= 2, s"need ≥2 cells to show pruning, got ${cells.length}")
    val probe = Similarity.ivfProbeScan(spark, dir, cells.take(1).toSeq)
    val totalFiles = all.select(input_file_name()).distinct().count()
    val probedFiles = probe.select(input_file_name()).distinct().count()
    assert(probedFiles > 0 && probedFiles < totalFiles,
      s"probe read $probedFiles of $totalFiles files — not pruned")
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroid_id"), plan)
  }

  test("ivfAppend: appended vectors queryable immediately, centroids fixed, pruning intact") {
    val emb = clustered
    val first = emb.filter(col("vec_id") < 240L) // clusters 0-7 at build time
    val rest = emb.filter(col("vec_id") >= 240L) // clusters 8-9 appended later
    val dir = tmpDir("ivfappend")
    Similarity.ivfBuild(first, "vec_id", "embedding", dir, nPlanes = 4, dim = dim)
    val centsBefore = spark.read.parquet(s"$dir/centroids")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    Similarity.ivfAppend(spark, dir, rest, "vec_id", "embedding")
    // no retrain: the centroid table is byte-for-byte untouched
    val centsAfter = spark.read.parquet(s"$dir/centroids")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(centsAfter === centsBefore)
    // an appended vector is immediately the top hit for its own query
    // (assignment and query rank centroids with the same metric+tiebreak,
    // so the probe list always includes its cell)
    val query = emb.filter(col("vec_id") === 270L).select("embedding")
    val got = Similarity.ivfQuery(spark, dir, query, "vec_id", "embedding", 10,
      nProbe = 4).collect().map(_.getLong(0))
    assert(got.head === 270L, s"expected appended id 270 first, got ${got.toSeq}")
    val exact = Similarity.cosineTopK(emb, query, "vec_id", "embedding", 10)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(got.toSet).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall exact=$exact got=${got.toSeq}")
    // partition pruning still holds over the appended layout
    val all = spark.read.parquet(s"$dir/vectors")
    val cells = all.select(col("centroid_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    val probe = Similarity.ivfProbeScan(spark, dir, cells.take(1).toSeq)
    val totalFiles = all.select(input_file_name()).distinct().count()
    val probedFiles = probe.select(input_file_name()).distinct().count()
    assert(probedFiles > 0 && probedFiles < totalFiles,
      s"probe read $probedFiles of $totalFiles files after append — not pruned")
    // a schema-mismatched batch is refused loudly
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfAppend(spark, dir,
        rest.withColumnRenamed("embedding", "emb2"), "vec_id", "emb2")
    }
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("ivfRemove: removed ids gone, survivors intact, untouched cells' files unrewritten") {
    val emb = clustered
    val dir = tmpDir("ivfremove")
    Similarity.ivfBuild(emb, "vec_id", "embedding", dir, nPlanes = 4, dim = dim)
    // snapshot (id → file, id → cell) BEFORE removal — the physical files
    // are replaced in place, so these must not re-scan afterwards
    val beforeRows = spark.read.parquet(s"$dir/vectors")
      .select(col("vec_id"), col("centroid_id").cast("long").as("c"),
        input_file_name().as("f"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val fileOf = beforeRows.map(t => t._1 -> t._3).toMap
    val cellOf = beforeRows.map(t => t._1 -> t._2).toMap
    // remove cluster 0 wholesale (ids 0-29: may empty its cell) plus one
    // vector from cluster 5; id 9999 is absent and must no-op
    val removed = ((0L until 30L) ++ Seq(155L, 9999L)).toDF("vec_id")
    val nCells = Similarity.ivfRemove(spark, dir, removed, "vec_id")
    assert(nCells > 0)
    val after = spark.read.parquet(s"$dir/vectors")
    val ids = after.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids === emb.collect().map(_.getLong(0)).toSet -- (0L until 30L) - 155L)
    // untouched cells' files were not rewritten (same physical files)
    val afterFiles = after.select(col("vec_id"), input_file_name().as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val touchedCells = (((0L until 30L) :+ 155L)).flatMap(cellOf.get).toSet
    val untouchedIds = beforeRows.collect {
      case (i, c, _) if !touchedCells(c) => i }
    assert(untouchedIds.nonEmpty)
    untouchedIds.foreach(i => assert(afterFiles(i) === fileOf(i),
      s"untouched vec $i was rewritten"))
    // queries keep working and never surface a removed id
    val query = emb.filter(col("vec_id") === 10L).select("embedding")
    val got = Similarity.ivfQuery(spark, dir, query, "vec_id", "embedding", 5,
      nProbe = 4).collect().map(_.getLong(0))
    assert(got.nonEmpty && got.forall(ids.contains))
    // absent-id-only removal is a full no-op
    assert(Similarity.ivfRemove(spark, dir, Seq(77777L).toDF("vec_id"),
      "vec_id") === 0)
  }

  test("ivfMaybeRetrain: balanced index untouched; drift-overfilled cell triggers rebuild") {
    val emb = clustered
    val dir = tmpDir("ivfretrain")
    Similarity.ivfBuild(emb, "vec_id", "embedding", dir, nPlanes = 4, dim = dim)
    // the fresh build is tolerably balanced (LSH-seeded cells can merge a
    // couple of clusters, so "balanced" here means no majority cell) —
    // no rebuild, outDir untouched
    val out1 = tmpDir("ivfretrain_out1")
    assert(!Similarity.ivfMaybeRetrain(spark, dir, out1, "vec_id", "embedding",
      maxCellFraction = 0.5))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(out1, "centroids")))
    // drift: append 3× the corpus as near-copies of ONE cluster's center —
    // append-only assignment piles them into that cluster's cell
    val rnd = new scala.util.Random(11)
    val c0 = emb.filter(col("vec_id") === 0L)
      .head().getSeq[Float](1).toArray
    val drifted = (0 until 900).map { j =>
      (10000L + j, c0.map(x => x + rnd.nextGaussian().toFloat * 0.01f).toSeq)
    }.toDF("vec_id", "embedding")
    Similarity.ivfAppend(spark, dir, drifted, "vec_id", "embedding")
    val stats = Similarity.ivfCellStats(spark, dir).collect()
      .map(r => r.getLong(1))
    assert(stats.max.toDouble / stats.sum > 0.5, "drift fixture too weak")
    val out2 = tmpDir("ivfretrain_out2")
    assert(Similarity.ivfMaybeRetrain(spark, dir, out2, "vec_id", "embedding",
      maxCellFraction = 0.5))
    // the rebuilt index carries the full corpus and is queryable
    assert(spark.read.parquet(s"$out2/vectors").count() === 1200L)
    val got = Similarity.ivfQuery(spark, out2,
      emb.filter(col("vec_id") === 35L).select("embedding"),
      "vec_id", "embedding", 5, nProbe = 4).collect().map(_.getLong(0))
    assert(got.head === 35L)
  }

  test("checkEmbeddingNearDups flags batch vectors duplicating the indexed corpus") {
    val emb = clustered
    val dir = tmpDir("ivfscreen")
    Similarity.ivfBuild(emb, "vec_id", "embedding", dir, nPlanes = 4, dim = dim)
    // batch: two exact copies of corpus vectors under new ids + one far
    // outlier that duplicates nothing
    val dup0 = emb.filter(col("vec_id") === 0L).head().getSeq[Float](1)
    val dup60 = emb.filter(col("vec_id") === 60L).head().getSeq[Float](1)
    val outlier = (0 until dim).map(i => if (i % 2 == 0) 1000f else -1000f)
    val batch = Seq((1000L, dup0), (1001L, dup60), (1002L, outlier))
      .toDF("vec_id", "embedding")
    val got = Similarity.checkEmbeddingNearDups(spark, dir, batch,
        "vec_id", "embedding", threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byBatch = got.groupBy(_._1)
    // the exact copies pair with their sources at cos ≈ 1
    assert(byBatch(1000L).exists(p => p._2 === 0L && p._3 > 0.999))
    assert(byBatch(1001L).exists(p => p._2 === 60L && p._3 > 0.999))
    // outlier pairs with nothing; no self-pairs; threshold respected
    assert(!byBatch.contains(1002L))
    assert(got.forall(p => p._1 !== p._2) && got.forall(_._3 >= 0.999))
  }

  test("ε-scaled probes match exactly their sources (the gate queries' " +
    "planting invariant)") {
    // q_embedding_neardup / q_embedding_neardup_incremental plant clones by
    // SCALING corpus vectors ×1.001: scaling preserves every hyperplane
    // sign (same LSH bucket — no probe luck) and the IVF cell argmax, and
    // cosine(v, 1.001·v) = 1 up to float rounding. So the planted pairs are
    // found DETERMINISTICALLY: expected count == planted count, pairing
    // exactly source↔clone.
    val rnd = new scala.util.Random(41)
    val corpus = Seq.tabulate(80)(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq))
    val emb = corpus.toDF("vec_id", "embedding")
    val planted = emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
    val nPlanted = 8L
    assert(planted.count() === nPlanted)
    // LSH pair path: every planted clone pairs with its source, id_a < id_b
    val pairs = Similarity.cosineNearDupPairs(emb.unionByName(planted),
        "vec_id", "embedding", threshold = 0.95, nPlanes = 8, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 80L by 10L).map(i => (i, i + 1000L)).toSet
    assert(expected.subsetOf(pairs),
      s"planted pairs missed: ${expected.diff(pairs)}")
    // gaussian dim-16 corpus: essentially no spurious ≥0.95 pairs
    assert(pairs.size <= expected.size + 2, s"spurious pairs: $pairs")
    // IVF screen path: each probe's match set contains its source
    val dir = tmpDir("ivfeps")
    Similarity.ivfBuild(emb, "vec_id", "embedding", dir, nPlanes = 3, dim = dim)
    val got = Similarity.checkEmbeddingNearDups(spark, dir, planted,
        "vec_id", "embedding", threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bySrc = got.groupBy(_._1)
    (0L until 80L by 10L).foreach { i =>
      assert(bySrc.get(i + 1000L).exists(_.exists(_._2 == i)),
        s"probe ${i + 1000L} did not match source $i: ${bySrc.get(i + 1000L)}")
    }
  }

  test("ivfTrain centroids are cluster-coherent and few") {
    val emb = clustered
    val cents = Similarity.ivfTrain(emb, "vec_id", "embedding",
      nPlanes = 4, dim = dim).collect()
    assert(cents.length <= 16, s"more cells than 2^nPlanes: ${cents.length}")
    assert(cents.forall(_.getSeq[Double](1).length == dim))
    // assignment under the trained centroids keeps generating clusters
    // together: most vectors of a cluster land in one cell
    val assigned = Similarity.assignNearestCentroid(emb,
      spark.createDataFrame(spark.sparkContext.parallelize(cents.toSeq),
        cents.head.schema),
      "vec_id", "embedding", "centroid_id", "centroid", byCosine = true)
      .withColumn("cluster", (col("vec_id") / 30).cast("long"))
    val coherence = assigned.groupBy("cluster")
      .agg(count_distinct(col("centroid_id")).as("cells"))
      .agg(max("cells")).head().getLong(0)
    assert(coherence <= 3, s"clusters scattered over $coherence cells")
  }

  test("IVF layout: centroid-partitioned table scan prunes to the probe partition") {
    val emb = clustered
    val cents = emb.filter(col("vec_id") % 30 === 0)
      .select((col("vec_id") / 30).cast("long").as("cid"), col("embedding").as("cvec"))
    val assigned = Similarity.assignNearestCentroid(emb, cents,
        "vec_id", "embedding", "cid", "cvec")
      .join(emb, "vec_id")
    val dir = tmpDir("ivf")
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(dir)
    // probe: nearest centroid of the query, scan only that partition
    val probe = spark.read.parquet(dir).filter(col("centroid_id") === 0)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    val top = Similarity.cosineTopK(probe.filter(col("vec_id") =!= 0),
      emb.filter(col("vec_id") === 0).select("embedding"), "vec_id", "embedding", 10)
    // partition-pruned candidates still contain the true neighbors
    val exact = Similarity.cosineTopK(emb.filter(col("vec_id") =!= 0),
      emb.filter(col("vec_id") === 0).select("embedding"), "vec_id", "embedding", 10)
      .collect().map(_.getLong(0)).toSet
    val got = top.collect().map(_.getLong(0)).toSet
    assert(exact.intersect(got).size >= 9, s"exact=$exact ivf=$got")
  }

  test("PQ: codebook shape, code bounds, repartition-deterministic encoding") {
    val m = 4; val nPlanes = 3; val w = dim / m
    val emb = clustered
    val book = Similarity.pqTrain(emb, "embedding", m, nPlanes, dim)
    val rows = book.collect()
    // one codebook entry per non-empty (subspace, cell); centroids are
    // subvector-width; half_norm2 matches its centroid
    assert(rows.nonEmpty && rows.length <= m * (1 << nPlanes))
    assert(rows.map(_.getInt(0)).toSet === (0 until m).toSet)
    rows.foreach { r =>
      val cent = r.getSeq[Double](2)
      assert(cent.length === w)
      assert(math.abs(r.getDouble(3) - cent.map(x => x * x).sum / 2.0) < 1e-12)
      assert(r.getLong(1) >= 0 && r.getLong(1) < (1 << nPlanes))
    }
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", book, m, dim)
    val byId = codes.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(byId.size === 300 && byId.values.forall(_.length == m))
    assert(byId.values.forall(_.forall(c => c >= 0 && c < (1 << nPlanes))))
    // determinism: the same corpus under a different partitioning encodes
    // to the same codes (no partition-order dependence anywhere)
    val byId2 = Similarity.pqEncode(emb.repartition(7), "vec_id", "embedding",
        book, m, dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(byId2 === byId)
    // same-cluster vectors mostly share codes (the codebook actually
    // captures the cluster structure, not noise)
    val cluster0 = (0L until 30L).map(byId)
    assert(cluster0.distinct.length <= 5, s"cluster codes scattered: $cluster0")
  }

  test("PQ: ADC shortlist + exact rerank recovers the exact top-k on clustered data") {
    val m = 4; val nPlanes = 3
    val emb = clustered
    val corpus = emb.filter(col("vec_id") =!= 0)
    val query = emb.filter(col("vec_id") === 0).select("embedding")
    val book = Similarity.pqTrain(corpus, "embedding", m, nPlanes, dim)
    val codes = Similarity.pqEncode(corpus, "vec_id", "embedding", book, m, dim)
    val approx = Similarity.pqTopK(book, codes, corpus, query,
        "vec_id", "embedding", k = 10, m = m, nPlanes = nPlanes, rerank = 60)
      .collect().map(_.getLong(0)).toSet
    val exact = Similarity.cosineTopK(corpus, query, "vec_id", "embedding", 10)
      .collect().map(_.getLong(0)).toSet
    assert(exact.intersect(approx).size >= 9, s"exact=$exact pq=$approx")
    // rerank must cover k
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(book, codes, corpus, query, "vec_id", "embedding",
        k = 10, m = m, nPlanes = nPlanes, rerank = 5)
    }
    // a query whose width doesn't match the codebook refuses loudly
    // instead of scoring garbage
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(book, codes, corpus,
        Seq(Tuple1(Seq.fill(dim / 2)(0.1f))).toDF("embedding"),
        "embedding", "embedding", k = 2, m = m, nPlanes = nPlanes, rerank = 5)
    }
  }

  test("persisted PQ index: build, append without retraining, query sees both") {
    val m = 4; val nPlanes = 3
    val emb = clustered
    val old = emb.filter(col("vec_id") < 250)          // build corpus
    val fresh = emb.filter(col("vec_id") >= 250)       // appended later
    val dir = java.nio.file.Files.createTempDirectory("pq_idx").toString
    Similarity.pqBuild(old, "vec_id", "embedding", dir, m, nPlanes, dim)
    val bookBefore = spark.read.parquet(s"$dir/codebook").collect().map(_.toSeq).toSet
    Similarity.pqAppend(spark, dir, fresh, "vec_id", "embedding", m, dim)
    // codebook untouched; codes cover the whole corpus exactly once
    assert(spark.read.parquet(s"$dir/codebook").collect().map(_.toSeq).toSet
      === bookBefore)
    assert(spark.read.parquet(s"$dir/codes").count() === 300L)
    // query vector 0 (cluster 0, built half) and vector 299's cluster
    // (appended half): both sides retrievable from the one index
    val corpus = emb.filter(col("vec_id") =!= 0)
    val got = Similarity.pqQuery(spark, dir, corpus,
        emb.filter(col("vec_id") === 0).select("embedding"),
        "vec_id", "embedding", k = 10, m = m, nPlanes = nPlanes, rerank = 60)
      .collect().map(_.getLong(0)).toSet
    val exact = Similarity.cosineTopK(corpus,
        emb.filter(col("vec_id") === 0).select("embedding"),
        "vec_id", "embedding", 10)
      .collect().map(_.getLong(0)).toSet
    assert(exact.intersect(got).size >= 9, s"exact=$exact pq=$got")
    val gotLate = Similarity.pqQuery(spark, dir, corpus,
        emb.filter(col("vec_id") === 299).select("embedding"),
        "vec_id", "embedding", k = 10, m = m, nPlanes = nPlanes, rerank = 60)
      .collect().map(_.getLong(0)).toSet
    // vector 299 lives in cluster 9 (ids 270..299) — appended AFTER build,
    // still found via the stored-codebook encoding
    assert(gotLate.count(id => id >= 270 && id <= 299) >= 8, s"late=$gotLate")
  }

  test("pqTopK refuses a multi-row query frame (single-query LUT contract)") {
    val m = 4; val nPlanes = 3
    val emb = clustered
    val book = Similarity.pqTrain(emb, "embedding", m, nPlanes, dim)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", book, m, dim)
    val e = intercept[IllegalArgumentException] {
      Similarity.pqTopK(book, codes, emb,
        emb.filter(col("vec_id") < 2).select("embedding"),
        "vec_id", "embedding", k = 5, m = m, nPlanes = nPlanes, rerank = 20)
    }
    assert(e.getMessage.contains("pqQueryAll"))
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(book, codes, emb, emb.limit(0).select("embedding"),
        "vec_id", "embedding", k = 5, m = m, nPlanes = nPlanes, rerank = 20)
    }
  }

  test("pqRemove: removed ids unscorable, untouched files unrewritten, ≡ never-indexed") {
    val m = 4; val nPlanes = 3
    val emb = clustered
    val dir = tmpDir("pqremove")
    // build + append → at least two physical code files (AQE coalesces a
    // tiny build into one file; the append lands in its own), so the
    // untouched-file assertion below has something to bite on
    Similarity.pqBuild(emb.filter(col("vec_id") < 200), "vec_id", "embedding",
      dir, m, nPlanes, dim)
    Similarity.pqAppend(spark, dir, emb.filter(col("vec_id") >= 200),
      "vec_id", "embedding", m, dim)
    val before = spark.read.parquet(s"$dir/codes")
      .select(col("vec_id"), input_file_name().as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // remove a handful of ids (codes are hash-spread across part files, so
    // a small set leaves most files untouched — the pruning under test);
    // 9999 is absent and must no-op
    val removedIds = Set(0L, 1L, 155L)
    val n = Similarity.pqRemove(spark, dir,
      (removedIds + 9999L).toSeq.toDF("vec_id"), "vec_id")
    assert(n > 0)
    val after = spark.read.parquet(s"$dir/codes")
    val ids = after.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids === before.keySet -- removedIds)
    // untouched files (those holding no removed id) were not rewritten
    val afterFiles = after.select(col("vec_id"), input_file_name().as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val touchedFiles = removedIds.flatMap(before.get)
    val untouched = before.collect {
      case (i, f) if !touchedFiles(f) && !removedIds(i) => i }
    assert(untouched.nonEmpty)
    untouched.foreach(i => assert(afterFiles(i) === before(i),
      s"untouched code row $i was rewritten"))
    // removal-equivalence: the surviving codes are EXACTLY what indexing
    // only the survivors would have produced (same stored codebook)
    val book = spark.read.parquet(s"$dir/codebook")
    val fresh = Similarity.pqEncode(
        emb.filter(!col("vec_id").isInCollection(removedIds)),
        "vec_id", "embedding", book, m, dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val kept = after.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(kept === fresh)
    // queries never surface a removed id — query INSIDE cluster 0, whose
    // removed members (0, 1) would otherwise be top neighbors
    val got = Similarity.pqQuery(spark, dir,
        emb.filter(!col("vec_id").isInCollection(removedIds)),
        emb.filter(col("vec_id") === 5L).select("embedding"),
        "vec_id", "embedding", k = 10, m = m, nPlanes = nPlanes, rerank = 60)
      .collect().map(_.getLong(0)).toSet
    assert(got.nonEmpty && got.intersect(removedIds).isEmpty)
    // absent-id-only removal is a full no-op
    assert(Similarity.pqRemove(spark, dir, Seq(77777L).toDF("vec_id"),
      "vec_id") === 0)
  }

  test("pqRemove crash window: duplicated survivors still answer exact top-k; re-run converges") {
    val m = 4; val nPlanes = 3
    val emb = clustered
    val dir = tmpDir("pqcrash")
    val codesDir = s"$dir/codes"
    Similarity.pqBuild(emb.filter(col("vec_id") < 200), "vec_id", "embedding",
      dir, m, nPlanes, dim)
    Similarity.pqAppend(spark, dir, emb.filter(col("vec_id") >= 200),
      "vec_id", "embedding", m, dim)
    val removedIds = Set(0L, 1L, 155L)
    val removedDf = removedIds.toSeq.toDF("vec_id")
    // simulate pqRemove crashing BETWEEN its two steps: run the append
    // half exactly as pqRemove would (survivors of the touched files land
    // as new part files), then "crash" — the deletes never run
    val codes0 = spark.read.parquet(codesDir)
    val touched = codes0.select(col("vec_id"), input_file_name().as("__f"))
      .join(removedDf, Seq("vec_id"), "left_semi")
      .select("__f").distinct().collect().map(_.getString(0))
    assert(touched.nonEmpty)
    val crashedAppend = codes0.filter(input_file_name().isInCollection(touched))
      .join(removedDf, Seq("vec_id"), "left_anti")
      .select(codes0.columns.map(col): _*).localCheckpoint(true)
    crashedAppend.write.mode("append").parquet(codesDir)
    spark.catalog.refreshByPath(codesDir)
    // the documented crash state: survivor rows DUPLICATED, nothing lost,
    // removed ids still present (their delete never ran)
    val crashed = spark.read.parquet(codesDir)
    assert(crashed.count() > crashed.select("vec_id").distinct().count())
    assert(crashed.select("vec_id").distinct().count() === emb.count())
    // (b) batch queries over the duplicated-survivor state are still the
    // EXACT top-k of the full (not-yet-removed) corpus: with rerank >=
    // corpus the ADC prefilter cannot lose a candidate, and the shortlist
    // distinct keeps duplicates from eating slots or repeating in output
    val book = spark.read.parquet(s"$dir/codebook")
    val queries = emb.filter(col("vec_id") % 30 === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    val batch = Similarity.pqQueryAll(book, crashed, emb, queries,
        "qid", "vec_id", "embedding", k = 7, m = m, nPlanes = nPlanes,
        rerank = 700) // corpus is 300 rows + duplicated survivors
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    queries.collect().map(_.getLong(0)).foreach { qid =>
      val exact = Similarity.cosineTopK(emb,
          queries.filter(col("qid") === qid).select("embedding"),
          "vec_id", "embedding", 7)
        .collect().map(_.getLong(0)).toSeq
      assert(batch(qid).distinct.size === batch(qid).size,
        s"qid=$qid repeated an id under the duplicated-survivor state")
      assert(batch(qid) === exact, s"qid=$qid under duplicated-survivor state")
    }
    // (a) re-running the SAME removal converges to removal-equivalence:
    // the new run's survivors are all already present in untouched files
    // (the crashed append's), so nothing re-appends and the stale old
    // files just get deleted — removed ids gone, zero duplicates
    assert(Similarity.pqRemove(spark, dir, removedDf, "vec_id") > 0)
    val after = spark.read.parquet(codesDir)
    val idsAfter = after.select("vec_id").collect().map(_.getLong(0))
    assert(idsAfter.length === idsAfter.distinct.length,
      "re-run left duplicated survivor rows")
    assert(idsAfter.toSet ===
      emb.select("vec_id").collect().map(_.getLong(0)).toSet -- removedIds)
    // and the surviving codes are exactly a never-indexed-the-removed build
    val fresh = Similarity.pqEncode(
        emb.filter(!col("vec_id").isInCollection(removedIds)),
        "vec_id", "embedding", book, m, dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(after.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      === fresh)
  }

  test("pqMaybeRetrain: balanced index untouched; drift-funneled codes trigger rebuild") {
    val m = 4; val nPlanes = 3
    val emb = clustered
    val dir = tmpDir("pqretrain")
    Similarity.pqBuild(emb, "vec_id", "embedding", dir, m, nPlanes, dim)
    // the fresh build spreads codes across cells — no subspace should be
    // majority-one-code at a generous threshold; outDir untouched
    val out1 = tmpDir("pqretrain_out1")
    assert(!Similarity.pqMaybeRetrain(spark, dir, out1, emb, "vec_id",
      "embedding", m, nPlanes, dim, maxCodeFraction = 0.9))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(out1, "codebook")))
    // drift: append 5× the corpus of near-identical vectors — they all
    // encode to ONE code per subspace, overflowing every subspace's top
    // code past the threshold
    val rnd = new scala.util.Random(11)
    val drift = (1000L until 2500L).map { id =>
      (id, Seq.fill(dim)(5.0f + rnd.nextFloat() * 0.001f))
    }.toDF("vec_id", "embedding")
    Similarity.pqAppend(spark, dir, drift, "vec_id", "embedding", m, dim)
    val all = emb.unionByName(drift)
    val out2 = tmpDir("pqretrain_out2")
    assert(Similarity.pqMaybeRetrain(spark, dir, out2, all, "vec_id",
      "embedding", m, nPlanes, dim, maxCodeFraction = 0.5))
    // the rebuilt index is complete and queryable
    assert(spark.read.parquet(s"$out2/codes").count() === all.count())
    val got = Similarity.pqQuery(spark, out2, all,
        emb.filter(col("vec_id") === 0).select("embedding"),
        "vec_id", "embedding", k = 10, m = m, nPlanes = nPlanes, rerank = 60)
      .collect().map(_.getLong(0))
    assert(got.nonEmpty)
  }

  test("pqQueryAll exactness: rerank >= corpus makes the batch EXACTLY brute-force top-k") {
    // with the whole corpus shortlisted, the ADC prefilter cannot lose a
    // candidate and the exact rerank decides everything — quantization
    // error is fully bought back, per the prefilter+rerank contract
    val m = 4; val nPlanes = 3
    val emb = clustered
    val corpus = emb.filter(col("vec_id") % 30 =!= 0)
    val queries = emb.filter(col("vec_id") % 30 === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    val book = Similarity.pqTrain(corpus, "embedding", m, nPlanes, dim)
    val codes = Similarity.pqEncode(corpus, "vec_id", "embedding", book, m, dim)
    val batch = Similarity.pqQueryAll(book, codes, corpus, queries,
        "qid", "vec_id", "embedding", k = 7, m = m, nPlanes = nPlanes,
        rerank = 400) // corpus is 290 rows — full shortlist
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    queries.collect().map(_.getLong(0)).foreach { qid =>
      val exact = Similarity.cosineTopK(corpus,
          queries.filter(col("qid") === qid).select("embedding"),
          "vec_id", "embedding", 7)
        .collect().map(_.getLong(0)).toSeq
      assert(batch(qid) === exact, s"qid=$qid")
    }
  }

  test("pqQueryAll: batch result matches per-query pqTopK for every query") {
    val m = 4; val nPlanes = 3
    val emb = clustered
    val corpus = emb.filter(col("vec_id") % 30 =!= 0)
    val queries = emb.filter(col("vec_id") % 30 === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    val book = Similarity.pqTrain(corpus, "embedding", m, nPlanes, dim)
    val codes = Similarity.pqEncode(corpus, "vec_id", "embedding", book, m, dim)
    val batch = Similarity.pqQueryAll(book, codes, corpus, queries,
        "qid", "vec_id", "embedding", k = 5, m = m, nPlanes = nPlanes,
        rerank = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    assert(batch.keySet === (0 until 10).map(_ * 30L).toSet)
    queries.collect().foreach { qr =>
      val qid = qr.getLong(0)
      val one = Similarity.pqTopK(book, codes, corpus,
          queries.filter(col("qid") === qid).select("embedding"),
          "vec_id", "embedding", k = 5, m = m, nPlanes = nPlanes, rerank = 60)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val got = batch(qid).sortBy(t => (-t._3, t._2)).map(t => (t._2, t._3)).toSeq
      assert(got === one, s"qid=$qid batch=$got single=$one")
    }
    // each query's batch top-5 comes from its own cluster
    batch.foreach { case (qid, rows) =>
      assert(rows.forall { case (_, id, _) => id / 30 == qid / 30 },
        s"qid=$qid leaked across clusters: ${rows.toSeq}")
    }
  }
}
