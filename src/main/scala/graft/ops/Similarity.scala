package graft.ops

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - [[cosineTopK]]: brute-force scan — the exact baseline. One pass, no
  *    shuffle except the final top-k (TakeOrderedAndProject); correct at any
  *    scale but O(N·d) per query.
  *  - [[lshTopK]]: random-hyperplane LSH — sign-bit bucket prunes the scan to
  *    candidate buckets (multi-probe over Hamming-1 neighbors for recall).
  *    This is the 100 TB path: the bucket column is precomputable and
  *    partition-prunable, so a query touches a small fraction of the data.
  *
  * All arithmetic is double-precision, sequential over the array — expressed
  * with codegen'd higher-order functions, bit-reproducible across runs (and
  * mirrored exactly by the DuckDB oracle).
  */
object Similarity {

  /** Σ a_i·b_i with double accumulation in list order — the native codegen
    * kernel ([[graft.functions.FloatDotProduct]], registered as `vec_dot`
    * by GraftExtensions). Bit-identical to [[dotHof]].
    */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** Composable higher-order-function formulation of [[dot]] — reference
    * semantics for tests, and the fallback for sessions without
    * GraftExtensions. Allocates an intermediate array per row.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine similarity against one query vector.
    * The query side is a one-row broadcast (no collect of the big side);
    * ties broken by id for a total order.
    */
  def cosineTopK(embeddings: DataFrame, query: DataFrame, idCol: String,
                 vecCol: String, k: Int): DataFrame = {
    val q = query.select(col(vecCol).as("__qvec"))
    embeddings.crossJoin(broadcast(q))
      .withColumn("sim", cosine(col(vecCol), col("__qvec")))
      .select(col(idCol), col("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Append `recall_at_k` (vs an EXACT result's ids) to an approximate
    * top-k and RAISE when it falls below `minRecall` — an in-query recall
    * gate, so a rows-only correctness row for an index-backed ANN query
    * fails LOUDLY on a recall regression instead of only on crashes
    * (VERDICT r9 ask #7). The exact side is the oracle-able brute-force
    * answer; both sides are k rows, so the audit costs one broadcast
    * semi-join over k rows on top of the exact scan. `assert_true` rides
    * in a filter column that every output row evaluates — Catalyst cannot
    * prune it away.
    */
  def withRecallGate(approx: DataFrame, exactIds: DataFrame, idCol: String,
                     k: Int, minRecall: Double): DataFrame = {
    val hits = approx.join(broadcast(exactIds.select(idCol)), Seq(idCol), "left_semi")
      .agg(count(lit(1)).cast("double").as("__hits"))
    approx.crossJoin(broadcast(hits))
      .withColumn("recall_at_k", col("__hits") / lit(k.toDouble))
      .withColumn("__recall_ok", assert_true(col("recall_at_k") >= minRecall,
        concat(lit(s"ANN recall@$k regression: "), col("recall_at_k").cast("string"),
          lit(s" < $minRecall"))))
      .filter(col("__recall_ok").isNull)
      .drop("__recall_ok", "__hits")
  }

  /** Deterministic random hyperplanes (seeded), as literal arrays — shipped
    * with the plan, no side channel.
    */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH bucket id for a vector column. */
  def lshBucket(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.toIndexedSeq.map(lit): _*)
      when(dot(vec, planeCol) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** ANN top-k: restrict the scan to the query's bucket plus all Hamming-1
    * neighbor buckets (multi-probe), then exact cosine within candidates.
    * With b planes, expected candidate fraction ≈ (b+1)/2^b of the data.
    */
  def lshTopK(embeddings: DataFrame, query: DataFrame, idCol: String,
              vecCol: String, k: Int, nPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val withBucket = embeddings.withColumn("__bucket", lshBucket(col(vecCol), planes))
    val qb = query.select(col(vecCol).as("__qvec"),
      lshBucket(col(vecCol), planes).as("__qbucket"))
    // probe set: exact bucket + flip each single bit
    val probes = array((lit(0L) +: (0 until nPlanes).map(i => lit(1L << i))): _*)
    val qProbed = qb.select(col("__qvec"),
      explode(transform(probes, m => col("__qbucket").bitwiseXOR(m))).as("__bucket"))
    withBucket.join(broadcast(qProbed), "__bucket")
      .withColumn("sim", cosine(col(vecCol), col("__qvec")))
      .select(col(idCol), col("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs: bucket vectors by sign-bit LSH,
    * compare only within buckets (plus Hamming-1 neighbor buckets via the
    * probe expansion on side B), verify with exact cosine. The
    * embedding-space analog of MinHash near-dup — bucket-bounded, never
    * all-pairs.
    *
    * Plan note (scale): side A is exploded ×(nPlanes+1) — the multi-probe
    * replication — so shuffle volume is (nPlanes+1)·N rows, a CONSTANT
    * factor chosen at call time, before the (bucket-bounded) join. Raise
    * nPlanes to shrink buckets (less join fan-out) at the cost of more
    * replication; both knobs are data-independent.
    */
  def cosineNearDupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, nPlanes: Int = 12,
                         dim: Int = 64): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val withBucket = embeddings.select(col(idCol), col(vecCol),
      lshBucket(col(vecCol), planes).as("__bucket"))
    val probes = array((lit(0L) +: (0 until nPlanes).map(i => lit(1L << i))): _*)
    val a = withBucket.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"),
      explode(transform(probes, m => col("__bucket").bitwiseXOR(m))).as("__bucket"))
    val b = withBucket.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"), col("__bucket"))
    a.join(b, "__bucket")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("vec_a"), col("vec_b")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .distinct()
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public): semantic
    * deduplication at corpus scale. Cluster the embeddings (the IVF
    * k-means, [[ivfTrain]]), pairwise-compare ONLY within cells, connect
    * pairs above `threshold` and keep one document per semantic group
    * ([[graft.ops.Components.dedupKeepers]] — representative = component
    * min id, deterministic).
    *
    * Scale shape: never all-pairs. The quadratic term is Σ|cell|² — the
    * paper's point is that clustering makes that sum tractable — and a
    * DEGENERATE clustering (one giant cell) must refuse loudly rather
    * than silently run the N² this exists to avoid: `maxCellSize` bounds
    * the largest cell, checked with one ≤nCells-row aggregate before any
    * pairing happens. Cross-cell near-dups are missed by construction
    * (the paper's recall trade-off); raise nPlanes for smaller cells,
    * lower it for higher recall.
    *
    * Returns (doc_id, keep_id) for every document that appeared in a
    * ≥threshold pair; docs in no pair are implicitly their own keeper and
    * absent (same contract as dedupKeepers). A doc is DROPPED iff
    * `doc_id != keep_id`.
    */
  def semanticDedup(embeddings: DataFrame, idCol: String, vecCol: String,
                    threshold: Double, nPlanes: Int = 4, dim: Int = 64,
                    maxCellSize: Long = 1000000L): DataFrame = {
    val cents = ivfTrain(embeddings, idCol, vecCol, nPlanes, dim)
    val assigned = assignNearestCentroid(embeddings, cents, idCol, vecCol,
      "centroid_id", "centroid", byCosine = true)
    val cells = embeddings.select(col(idCol), col(vecCol))
      .join(assigned, Seq(idCol))
    val worst = cells.groupBy("centroid_id").agg(count(lit(1)).as("__n"))
      .agg(coalesce(max("__n"), lit(0L))).head.getLong(0)
    require(worst <= maxCellSize,
      s"semanticDedup: largest cell holds $worst vectors (> maxCellSize " +
        s"$maxCellSize) — within-cell pairing would be quadratic in that; " +
        "raise nPlanes (more, smaller cells) or maxCellSize if intended")
    val a = cells.select(col("centroid_id"), col(idCol).as("id_a"),
      col(vecCol).as("vec_a"))
    val b = cells.select(col("centroid_id"), col(idCol).as("id_b"),
      col(vecCol).as("vec_b"))
    val pairs = a.join(b, "centroid_id")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("vec_a"), col("vec_b")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
    graft.ops.Components.dedupKeepers(pairs)
  }

  // ---- Product quantization (PQ) ------------------------------------------
  //
  // The memory-bound ANN path: each D-dim float vector compresses to m
  // small integer codes (one per D/m-wide subspace, each code naming that
  // subspace's nearest codebook centroid), so a 100 TB embedding corpus
  // scans as a few bytes per row. A query builds an m × nCells lookup
  // table ONCE (dot(q_sub, centroid) for every codebook entry — driver
  // side, the codebook is tiny) and scores every row by m array lookups
  // (ADC — asymmetric distance computation): dot(q, x) ≈ Σ_sub
  // LUT[sub][code]. The scored shortlist is then exactly re-ranked over
  // the shortlist's REAL vectors — the standard prefilter+rerank shape
  // that buys back the quantization error for a point-lookup cost.
  //
  // Training reuses the IVF recipe per subspace: sign-bit-LSH seeded
  // cells refined by one Lloyd step — deterministic (seeded planes), two
  // (row, sub)-exploded shuffles, no iteration count to tune. Codes are
  // assigned by L2 (reconstruction error): argmin ||x_sub − c||² =
  // argmax (dot(x_sub, c) − ||c||²/2), one broadcast pass.

  /** Train the PQ codebook: `(sub, code, centroid, half_norm2)` —
    * m × ≤2^nPlanes rows, tiny. `dim` must divide evenly by `m`.
    */
  def pqTrain(embeddings: DataFrame, vecCol: String, m: Int,
              nPlanes: Int = 4, dim: Int = 64): DataFrame = {
    require(dim % m == 0, s"dim=$dim must be a multiple of m=$m subspaces")
    val w = dim / m
    val subs = subVectors(embeddings.select(col(vecCol)), vecCol, m, w)
    // per-subspace planes (distinct seeds): one chained expression keeps
    // the explode+bucket in a single codegen'd projection
    val cell = (0 until m).map { s =>
      (s, lshBucket(col("__svec"), hyperplanes(nPlanes, w, seed = 100L + s)))
    }.foldLeft(lit(-1L)) { case (acc, (s, b)) => when(col("__sub") === s, b).otherwise(acc) }
    val seeded = subs.withColumn("__cell", cell)
    val seeds = subMeans(seeded)
    val assigned = seeded.drop("__cell")
      .join(broadcast(seeds.withColumn("__hn", halfNorm2(col("__centroid")))),
        Seq("__sub"))
      .withColumn("__score", dotHof(col("__svec"), col("__centroid")) - col("__hn"))
      .groupBy(col("__rid"), col("__sub"))
      .agg(max_by(col("__cell"), struct(col("__score"), -col("__cell"))).as("__cell"),
        first(col("__svec")).as("__svec"))
    subMeans(assigned)
      .select(col("__sub").as("sub"), col("__cell").as("code"),
        col("__centroid").as("centroid"),
        halfNorm2(col("__centroid")).as("half_norm2"))
  }

  /** Encode vectors to `codes: array<bigint>` (length m, ordered by
    * subspace) against a trained codebook — one broadcast pass, two
    * shuffles on (row, sub) → row.
    */
  def pqEncode(embeddings: DataFrame, idCol: String, vecCol: String,
               codebook: DataFrame, m: Int, dim: Int = 64): DataFrame = {
    require(dim % m == 0, s"dim=$dim must be a multiple of m=$m subspaces")
    val w = dim / m
    val subs = subVectors(embeddings.select(col(idCol), col(vecCol)), vecCol, m, w)
    subs.join(broadcast(codebook.select(col("sub").as("__sub"),
        col("code").as("__code"), col("centroid").as("__c"), col("half_norm2").as("__hn"))),
        Seq("__sub"))
      .withColumn("__score", dotHof(col("__svec"), col("__c")) - col("__hn"))
      .groupBy(col(idCol), col("__sub"))
      .agg(max_by(col("__code"), struct(col("__score"), -col("__code"))).as("__code"))
      .groupBy(col(idCol))
      .agg(transform(array_sort(collect_list(struct(col("__sub"), col("__code")))),
        s => s.getField("__code")).as("codes"))
  }

  /** ADC top-k with exact re-rank: score every row by m LUT lookups over
    * its codes (never touching vectors), shortlist `rerank` candidates,
    * then rank the shortlist by EXACT dot over the real vectors. The scan
    * half reads O(m bytes)/row; the exact half reads `rerank` vectors.
    * Ties broken by id for a total order.
    */
  def pqTopK(codebook: DataFrame, codes: DataFrame, embeddings: DataFrame,
             query: DataFrame, idCol: String, vecCol: String, k: Int,
             m: Int, nPlanes: Int = 4, rerank: Int = 200): DataFrame = {
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    val cells = 1 << nPlanes
    // EXACTLY one query row: the LUT is built from a single vector, and the
    // exact rerank cross-joins the query frame — a multi-row frame would
    // silently rank the shortlist by row 1's LUT while scoring sims against
    // every row (a meaningless mixture). Batch callers use [[pqQueryAll]].
    val qRows = query.select(col(vecCol)).limit(2).collect()
    require(qRows.length == 1,
      s"pqTopK expects exactly one query row (got ${
        if (qRows.isEmpty) "0" else "2 or more"}) — use pqQueryAll to " +
        "score a whole query table in one job")
    val q = qRows.head.getSeq[Any](0).map {
      case f: Float => f.toDouble; case d: Double => d
    }.toArray
    val d = q.length
    require(d % m == 0,
      s"pqTopK: query dim $d must be a multiple of m=$m subspaces " +
        "(and match the codebook's training dim)")
    val w = d / m
    // LUT: dot(q_sub, centroid) for every codebook entry — the codebook is
    // m × ≤2^nPlanes rows, so this is a bounded driver-side build
    val lut = Array.fill(m * cells)(0.0)
    codebook.select("sub", "code", "centroid").collect().foreach { r =>
      val s = r.getInt(0); val c = r.getLong(1).toInt
      val cent = r.getSeq[Double](2)
      require(cent.length == w,
        s"pqTopK: codebook subspace width ${cent.length} != query width $w " +
          "— the query's dim/m does not match the codebook's training dim/m")
      var acc = 0.0
      var i = 0
      while (i < cent.length) { acc += q(s * w + i) * cent(i); i += 1 }
      lut(s * cells + c) = acc
    }
    val lutLit = lit(lut)
    val adc = codes.withColumn("__adc",
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, s) =>
          acc + element_at(lutLit,
            (s * lit(cells) + element_at(col("codes"), s + 1)).cast("int") + 1)))
      .orderBy(col("__adc").desc, col(idCol).asc)
      .limit(rerank)
      .select(idCol)
    embeddings.join(broadcast(adc), Seq(idCol), "left_semi")
      .crossJoin(broadcast(query.select(col(vecCol).as("__qvec"))))
      .withColumn("sim", cosine(col(vecCol), col("__qvec")))
      .select(col(idCol), col("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Build and PERSIST the PQ index under `indexDir` — the memory-bound
    * companion to [[ivfBuild]]:
    *  - `<indexDir>/codebook` — the tiny (m × ≤2^nPlanes row) codebook;
    *  - `<indexDir>/codes`    — one `(id, codes: array<bigint>)` row per
    *    vector, ~m small integers where the corpus holds dim floats.
    * The expensive ONCE half (train + encode); every [[pqQuery]] then
    * scans codes only and point-reads the shortlist.
    */
  def pqBuild(embeddings: DataFrame, idCol: String, vecCol: String,
              indexDir: String, m: Int, nPlanes: Int = 4,
              dim: Int = 64): Unit = {
    val book = pqTrain(embeddings, vecCol, m, nPlanes, dim).localCheckpoint(true)
    book.coalesce(1).write.mode("overwrite").parquet(s"$indexDir/codebook")
    pqEncode(embeddings, idCol, vecCol, book, m, dim)
      .write.mode("overwrite").parquet(s"$indexDir/codes")
  }

  /** INCREMENTAL PQ maintenance: encode a new batch against the STORED
    * codebook (no retraining — [[ivfAppend]]'s contract) and append its
    * codes. O(batch); append-only (dedupe upstream when re-ingesting).
    * A drifting distribution degrades quantization error over time;
    * re-run [[pqBuild]] periodically like any codebook-based index.
    */
  def pqAppend(spark: SparkSession, indexDir: String, newEmbeddings: DataFrame,
               idCol: String, vecCol: String, m: Int, dim: Int = 64): Unit = {
    val book = spark.read.parquet(s"$indexDir/codebook")
    pqEncode(newEmbeddings, idCol, vecCol, book, m, dim)
      .write.mode("append").parquet(s"$indexDir/codes")
  }

  /** ADC top-k from a PERSISTED index: scan stored codes (m small ints
    * per row — the memory-bound win), shortlist, exact-rerank against the
    * caller's vector table. See [[pqTopK]].
    */
  def pqQuery(spark: SparkSession, indexDir: String, embeddings: DataFrame,
              query: DataFrame, idCol: String, vecCol: String, k: Int,
              m: Int, nPlanes: Int = 4, rerank: Int = 200): DataFrame =
    pqTopK(spark.read.parquet(s"$indexDir/codebook"),
      spark.read.parquet(s"$indexDir/codes"),
      embeddings, query, idCol, vecCol, k, m, nPlanes, rerank)

  /** Remove vectors from a persisted PQ index — takedown parity with
    * [[ivfRemove]] for the codes layout. The codes dir is flat (not
    * partitioned by cell — ADC scans everything by design), so removal is
    * file-scoped instead of cell-scoped:
    *   1. locate the files holding removed ids with a COLUMN-PRUNED
    *      (id, input_file_name) scan semi-joined with the removal set —
    *      reads the id column only, never the codes;
    *   2. rewrite ONLY the touched files: their survivors append as new
    *      part files, then the old files are deleted. O(touched files)
    *      heavy I/O; untouched files contribute only a column-pruned id
    *      read (no codes), never a rewrite.
    * Absent ids no-op. Returns the number of files rewritten.
    *
    * Not transactional (same contract as [[ivfRemove]]): a reader racing
    * the append-then-delete can briefly see survivors doubled — run
    * removals from the index's single maintenance owner. Crash between the
    * two steps leaves duplicated survivors, never lost rows, and RE-RUNNING
    * THE SAME REMOVAL CONVERGES: the rewrite is idempotent because a
    * survivor whose id already exists in an untouched file (i.e. one the
    * crashed run's append landed) is NOT appended again — only the stale
    * old files are deleted. SimilaritySpec proves the crash window
    * round-trip (duplicate state still answers top-k correctly; re-run
    * restores removal-equivalence).
    */
  def pqRemove(spark: SparkSession, indexDir: String, removedIds: DataFrame,
               idCol: String): Int = {
    val codesDir = s"$indexDir/codes"
    val ids = removedIds.select(col(idCol)).distinct().localCheckpoint(true)
    val touched = spark.read.parquet(codesDir)
      .select(col(idCol), input_file_name().as("__f"))
      .join(ids, Seq(idCol), "left_semi")
      .select("__f").distinct()
      .collect().map(_.getString(0)).sorted // O(removed-touched files)
    if (touched.isEmpty) return 0
    // survivors of the touched files only; checkpoint so the append job
    // cannot re-read the very files the delete below removes.
    // The anti-join against ids already living in UNTOUCHED files makes
    // the rewrite idempotent: after a crash between append and delete,
    // the re-run's survivors are exactly the rows the crashed append
    // already landed elsewhere, so nothing re-appends and the stale old
    // files just get deleted. In a healthy index (unique ids) the extra
    // anti-join matches nothing; its probe side is the same column-pruned
    // id scan step 1 already paid — no codes bytes are read for it.
    val stored = spark.read.parquet(codesDir)
    val untouchedIds = spark.read.parquet(codesDir)
      .select(col(idCol), input_file_name().as("__f"))
      .filter(!col("__f").isInCollection(touched))
      .select(idCol)
    val survivors = stored
      .filter(input_file_name().isInCollection(touched))
      .join(ids, Seq(idCol), "left_anti")
      .join(untouchedIds, Seq(idCol), "left_anti")
      .select(stored.columns.map(col): _*)
      .localCheckpoint(true)
    if (!survivors.isEmpty)
      survivors.write.mode("append").parquet(codesDir)
    val fs = new org.apache.hadoop.fs.Path(codesDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    touched.foreach { f =>
      // input_file_name() is URI-encoded; decode before handing to the FS
      fs.delete(new org.apache.hadoop.fs.Path(new java.net.URI(f)), false)
    }
    // the FileStatusCache still lists the deleted part files
    spark.catalog.refreshByPath(codesDir)
    touched.length
  }

  /** Batched PQ ANN: ADC top-k for EVERY query row in ONE job against the
    * codes table — [[ivfQueryAll]]'s shape for the memory-bound index.
    *
    * Plan: each query builds its LUT DISTRIBUTED — queries × broadcast
    * codebook → per-(query, sub, code) dot products, folded into ONE
    * map<slot, double> row per query (≤ m·2^nPlanes entries — index-
    * bounded, not data-bounded). The per-query LUT maps broadcast onto the
    * codes scan (|queries| rows of ~m·cells doubles — a few MB for
    * thousands of queries; chunk a larger query table upstream), every
    * (code row, query) pair scores by m map lookups in one codegen'd
    * projection, and a per-query window keeps the `rerank` shortlist. The
    * exact rerank then joins the (|queries|·rerank)-row shortlist back to
    * the real vectors — broadcast, bounded by construction — and keeps the
    * top k by true cosine. Vectors are read ONLY for shortlisted rows.
    * Returns (query_id, idCol, sim) like [[ivfQueryAll]].
    */
  def pqQueryAll(codebook: DataFrame, codes: DataFrame, embeddings: DataFrame,
                 queries: DataFrame, qidCol: String, idCol: String,
                 vecCol: String, k: Int, m: Int, nPlanes: Int,
                 rerank: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    val cells = 1 << nPlanes
    // subspace width from the codebook (m × ≤2^nPlanes rows: bounded read)
    val wRows = codebook.select(size(col("centroid"))).limit(1).collect()
    require(wRows.nonEmpty, "pqQueryAll: the codebook is empty")
    val w = wRows.head.getInt(0)
    val book = broadcast(codebook.select(col("sub").as("__sub"),
      col("code").as("__code"), col("centroid").as("__c")))
    // per-query LUT as ONE map row: slot = sub·cells + code → dot(q_sub, c).
    // Every query row's dim is validated in-plan (pqTopK's d % m == 0 check
    // for the batch path): a vector whose length != m·w would null-pad
    // inside dotHof and silently score garbage — refuse loudly instead.
    val qluts = queries
      .select(col(qidCol).as("query_id"),
        when(size(col(vecCol)) === lit(m * w), col(vecCol)).otherwise(
          raise_error(concat(
            lit("pqQueryAll: query vector dim "),
            size(col(vecCol)).cast("string"),
            lit(s" != m*w = ${m * w} — the query dim must match the " +
              "codebook's training dim and split into m subspaces"))))
          .as("__qvec"))
      .crossJoin(book)
      .withColumn("__lut", dotHof(
        transform(slice(col("__qvec"), col("__sub") * lit(w) + lit(1), lit(w)),
          x => x.cast("double")),
        col("__c")))
      .groupBy("query_id")
      .agg(first(col("__qvec")).as("__qvec"),
        map_from_entries(collect_list(struct(
          (col("__sub") * lit(cells) + col("__code")).cast("int").as("__slot"),
          col("__lut")))).as("__lutmap"))
      // two consumers (ADC scan + exact rerank) — materialize once
      .localCheckpoint(true)
    // ADC: every (codes row × query) scores by m map lookups; codes always
    // reference codebook entries (they were assigned from it), so every
    // looked-up slot is present in the map
    val shortlist = codes
      .crossJoin(broadcast(qluts.select(col("query_id"), col("__lutmap"))))
      .withColumn("__adc",
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, s) =>
          acc + element_at(col("__lutmap"),
            (s * lit(cells) + element_at(col("codes"), s + 1)).cast("int"))))
      .withColumn("__rk", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("__adc").desc, col(idCol).asc)))
      .filter(col("__rk") <= rerank)
      .select(col("query_id"), col(idCol))
      // duplicated code rows (the documented pqRemove crash window) rank
      // adjacently under the (adc, id) tiebreak; distinct on the bounded
      // |queries|·rerank shortlist keeps them out of the top-k output
      .distinct()
    embeddings.join(broadcast(shortlist), Seq(idCol))
      .join(broadcast(qluts.select(col("query_id"), col("__qvec"))),
        Seq("query_id"))
      .withColumn("sim", cosine(col(vecCol), col("__qvec")))
      .withColumn("__rk", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col(idCol).asc)))
      .filter(col("__rk") <= k)
      .select(col("query_id"), col(idCol), col("sim"))
  }

  /** [[pqQueryAll]] from a PERSISTED index (see [[pqQuery]]). */
  def pqQueryAll(spark: SparkSession, indexDir: String, embeddings: DataFrame,
                 queries: DataFrame, qidCol: String, idCol: String,
                 vecCol: String, k: Int, m: Int, nPlanes: Int = 4,
                 rerank: Int = 200): DataFrame =
    pqQueryAll(spark.read.parquet(s"$indexDir/codebook"),
      spark.read.parquet(s"$indexDir/codes"),
      embeddings, queries, qidCol, idCol, vecCol, k, m, nPlanes, rerank)

  /** Per-(subspace, code) occupancy of a persisted PQ index — the balance
    * dial [[pqMaybeRetrain]] reads. One scan of the codes table folded
    * map-side; the result is ≤ m × 2^nPlanes rows.
    */
  def pqCodeStats(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/codes")
      .select(posexplode(col("codes")).as(Seq("sub", "code")))
      .groupBy("sub", "code").agg(count(lit(1)).as("n"))

  /** The retrain trigger [[pqAppend]]'s Scaladoc prescribes, as code —
    * [[ivfMaybeRetrain]]'s PQ sibling: append-only maintenance under a
    * drifting embedding distribution funnels new vectors into few codes
    * per subspace (the stored centroids no longer tile the data, so
    * quantization error — and with it ADC ranking quality — degrades).
    * When any subspace's most frequent code exceeds `maxCodeFraction` of
    * the corpus, rebuild codebook+codes FROM the caller's embedding
    * corpus into `outDir` (the codes table stores no vectors, so unlike
    * the IVF layout the rebuild needs the corpus handed back in); the
    * caller swaps directories when ready — the same single-writer publish
    * pattern. Returns true iff a rebuild happened; `outDir` is untouched
    * otherwise. Code stats are ≤ m × 2^nPlanes rows — driver-safe.
    */
  def pqMaybeRetrain(spark: SparkSession, indexDir: String, outDir: String,
                     embeddings: DataFrame, idCol: String, vecCol: String,
                     m: Int, nPlanes: Int = 4, dim: Int = 64,
                     maxCodeFraction: Double = 0.5): Boolean = {
    require(maxCodeFraction > 0 && maxCodeFraction <= 1,
      s"maxCodeFraction must be in (0, 1], got $maxCodeFraction")
    val bySub = pqCodeStats(spark, indexDir)
      .groupBy("sub").agg(max(col("n")).as("top"), sum(col("n")).as("total"))
      .collect()
    val drifted = bySub.exists(r =>
      r.getLong(2) > 0 && r.getLong(1).toDouble / r.getLong(2) > maxCodeFraction)
    if (!drifted) false
    else {
      pqBuild(embeddings, idCol, vecCol, outDir, m, nPlanes, dim)
      true
    }
  }

  /** Explode vectors into `(row-id, sub, subvector)` — the shared PQ
    * preparation. `__rid` is a per-row synthetic id (the caller's id when
    * present is carried alongside).
    */
  private def subVectors(df: DataFrame, vecCol: String, m: Int, w: Int): DataFrame =
    df.withColumn("__rid", monotonically_increasing_id())
      .select(col("*"), explode(array((0 until m).map(s =>
        struct(lit(s).as("__sub"),
          transform(slice(col(vecCol), s * w + 1, w), x => x.cast("double"))
            .as("__svec"))): _*)).as("__sv"))
      .select(col("*"), col("__sv.__sub").as("__sub"), col("__sv.__svec").as("__svec"))
      .drop("__sv", vecCol)

  /** Component-wise mean per (sub, cell) — [[meanVectors]] with the
    * subspace key carried through. O(m · cells · w) output rows.
    */
  private def subMeans(subs: DataFrame): DataFrame =
    subs.select(col("__sub"), col("__cell"), posexplode(col("__svec")).as(Seq("__pos", "__v")))
      .groupBy("__sub", "__cell", "__pos")
      .agg(avg(col("__v")).as("__m"))
      .groupBy("__sub", "__cell")
      .agg(transform(array_sort(collect_list(struct(col("__pos"), col("__m")))),
        s => s.getField("__m")).as("__centroid"))

  private def halfNorm2(c: Column): Column =
    aggregate(c, lit(0.0), (acc, v) => acc + v * v) / 2.0

  /** Brute-force all-pairs top-k per vector against a SMALL probe set
    * (e.g. centroids) — the IVF assignment step: each vector gets its
    * nearest centroid id via a broadcast nested loop, no N² shuffle.
    * `byCosine = true` assigns by cosine (the metric the IVF search path
    * ranks with) instead of raw dot product.
    */
  def assignNearestCentroid(embeddings: DataFrame, centroids: DataFrame,
                            idCol: String, vecCol: String,
                            centIdCol: String, centVecCol: String,
                            byCosine: Boolean = false): DataFrame = {
    val c = broadcast(centroids.select(col(centIdCol).as("__cid"),
      col(centVecCol).as("__cvec")))
    val sim = if (byCosine) cosine(col(vecCol), col("__cvec"))
              else dot(col(vecCol), col("__cvec"))
    embeddings.crossJoin(c)
      .withColumn("__sim", sim)
      .groupBy(col(idCol))
      .agg(max_by(col("__cid"), struct(col("__sim"), -col("__cid"))).as("centroid_id"))
  }

  /** Component-wise mean vector per cell. Constant-buffer at data scale:
    * the shuffle aggregates (cell, pos) → mean (a plain hash agg), and the
    * only collect_list is the ≤dim-element reassembly per CELL — O(cells·dim)
    * rows total, never O(data rows).
    */
  private def meanVectors(cells: DataFrame, vecCol: String): DataFrame =
    cells
      .select(col("__cell"), posexplode(col(vecCol)).as(Seq("__pos", "__v")))
      .groupBy("__cell", "__pos")
      .agg(avg(col("__v").cast("double")).as("__m"))
      .groupBy("__cell")
      .agg(transform(
        array_sort(collect_list(struct(col("__pos"), col("__m")))),
        s => s.getField("__m")).as("centroid"))

  /** IVF index build (train): cells seeded deterministically by sign-bit
    * LSH (2^nPlanes cells), refined with one Lloyd step — assign every
    * vector to its nearest seed centroid by cosine, then re-average.
    * Returns the small (≤2^nPlanes row) centroid table
    * `(centroid_id: long, centroid: array<double>)`.
    *
    * At 100 TB this runs as two shuffles over (cell, pos) pairs plus one
    * broadcast assignment pass; the centroid table itself stays tiny and
    * is meant to be persisted alongside the corpus (the assignment column
    * is then partition-prunable by `centroid_id`).
    */
  def ivfTrain(embeddings: DataFrame, idCol: String, vecCol: String,
               nPlanes: Int = 4, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(nPlanes, dim, seed = 7L)
    val seeds = meanVectors(
      embeddings.withColumn("__cell", lshBucket(col(vecCol), planes)), vecCol)
      .select(col("__cell").as("centroid_id"), col("centroid"))
    val assigned = assignNearestCentroid(embeddings, seeds, idCol, vecCol,
      "centroid_id", "centroid", byCosine = true)
    meanVectors(
      embeddings.join(assigned, idCol)
        .withColumn("__cell", col("centroid_id")), vecCol)
      .select(col("__cell").as("centroid_id"), col("centroid"))
  }

  /** Build and PERSIST the IVF index under `indexDir`:
    *  - `<indexDir>/centroids` — the tiny (≤2^nPlanes row) centroid table;
    *  - `<indexDir>/vectors`   — the full corpus `(id, vec, …)` written
    *    `partitionBy(centroid_id)` (repartitioned on the cell first, so each
    *    cell is a handful of files, not one file per upstream task).
    *
    * This is the expensive, ONCE-per-corpus half: two (cell, pos) shuffles
    * for training, one broadcast assignment pass, one clustering shuffle for
    * the layout. Every subsequent [[ivfQuery]] touches only its probed
    * cells' files — the scan cost is ~nProbe/nCells of the corpus, paid per
    * query, with NO retraining.
    */
  def ivfBuild(embeddings: DataFrame, idCol: String, vecCol: String,
               indexDir: String, nPlanes: Int = 4, dim: Int = 64): Unit = {
    val cents = ivfTrain(embeddings, idCol, vecCol, nPlanes, dim)
    cents.coalesce(1).write.mode("overwrite").parquet(s"$indexDir/centroids")
    val assigned = assignNearestCentroid(embeddings, cents, idCol, vecCol,
      "centroid_id", "centroid", byCosine = true)
    embeddings.join(assigned, idCol)
      .repartition(col("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$indexDir/vectors")
  }

  /** INCREMENTAL index maintenance: append a new vector batch into an
    * existing [[ivfBuild]] index WITHOUT retraining — assign each new
    * vector to its nearest STORED centroid (one broadcast pass over the
    * batch) and append into the `centroid_id`-partitioned layout. Cost is
    * O(batch); queries see the new vectors immediately with file pruning
    * intact (new files land inside their cell's partition directory).
    *
    * Append-only: an id already in the index is NOT upserted (the index is
    * a layout, not a keyed table) — dedupe upstream if re-ingesting.
    * Centroids are fixed at build time, so a drifting embedding
    * distribution slowly degrades cell balance/recall; periodically re-run
    * [[ivfBuild]] (the offline re-center every real IVF deployment does).
    */
  def ivfAppend(spark: SparkSession, indexDir: String, newEmbeddings: DataFrame,
                idCol: String, vecCol: String): Unit = {
    val cents = spark.read.parquet(s"$indexDir/centroids")
    // schema guard: a batch with different columns/types would produce a
    // mixed-schema partition dir that later scans resolve arbitrarily
    val stored = spark.read.parquet(s"$indexDir/vectors").schema
      .filterNot(_.name == "centroid_id").map(f => f.name -> f.dataType.sql).sortBy(_._1)
    val incoming = newEmbeddings.schema.map(f => f.name -> f.dataType.sql).sortBy(_._1)
    require(stored == incoming,
      s"ivfAppend schema mismatch: index has $stored, batch has $incoming")
    val assigned = assignNearestCentroid(newEmbeddings, cents, idCol, vecCol,
      "centroid_id", "centroid", byCosine = true)
    newEmbeddings.join(assigned, idCol)
      .repartition(col("centroid_id"))
      .write.mode("append").partitionBy("centroid_id")
      .parquet(s"$indexDir/vectors")
  }

  /** Cell-occupancy diagnostics of a persisted index: (centroid_id, n) —
    * the balance dial [[ivfMaybeRetrain]] reads. One column-pruned scan of
    * the partition column; result is ≤ nCells rows.
    */
  def ivfCellStats(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/vectors")
      .groupBy("centroid_id").agg(count(lit(1)).as("n"))

  /** The retrain trigger [[ivfAppend]]'s Scaladoc prescribes, as code:
    * append-only maintenance under a drifting embedding distribution
    * slowly overfills some cells (degraded pruning — a hot cell's files
    * all scan on every probe of it). When the largest cell exceeds
    * `maxCellFraction` of the corpus, rebuild the index FROM the stored
    * vectors into `outDir` (offline re-center; the caller swaps directories
    * when ready — same single-writer publish pattern as the keyed table's
    * pointer swing). Returns true iff a rebuild happened; `outDir` is
    * untouched otherwise. Cell counts are ≤ nCells rows — driver-safe.
    */
  def ivfMaybeRetrain(spark: SparkSession, indexDir: String, outDir: String,
                      idCol: String, vecCol: String,
                      maxCellFraction: Double = 0.25,
                      nPlanes: Int = 4, dim: Int = 64): Boolean = {
    require(maxCellFraction > 0 && maxCellFraction <= 1,
      s"maxCellFraction must be in (0, 1], got $maxCellFraction")
    val sizes = ivfCellStats(spark, indexDir).collect().map(_.getLong(1))
    val total = sizes.sum
    if (total == 0L || sizes.max.toDouble / total <= maxCellFraction) false
    else {
      ivfBuild(spark.read.parquet(s"$indexDir/vectors").drop("centroid_id"),
        idCol, vecCol, outDir, nPlanes, dim)
      true
    }
  }

  /** Remove vectors from a persisted IVF index — the embedding-modality
    * takedown path ([[graft.ops.FuzzyDedup.unindexNearDups]] for this
    * layout). The index is partitioned by cell, not keyed by id, so
    * removal is two bounded passes:
    *   1. locate the removed ids' cells with a COLUMN-PRUNED scan of
    *      (id, centroid_id) semi-joined with the removal set — the scan
    *      reads two thin columns of the corpus, never the vectors;
    *   2. rewrite ONLY the touched cells (dynamic partition overwrite of
    *      their directories with the surviving rows) — O(touched cells)
    *      data I/O, untouched cells' files are never opened.
    * Absent ids no-op. Returns the number of cells rewritten.
    *
    * Not transactional: the layout is a plain partitioned dir (rebuildable
    * from the corpus — same contract as [[ivfBuild]]'s swap pattern), so a
    * reader racing the per-cell overwrite can glimpse a cell mid-replace;
    * run removals from the index's single maintenance owner, like retrain.
    */
  def ivfRemove(spark: SparkSession, indexDir: String, removedIds: DataFrame,
                idCol: String): Int = {
    val vectors = s"$indexDir/vectors"
    val ids = removedIds.select(col(idCol)).distinct().localCheckpoint(true)
    val touched = spark.read.parquet(vectors)
      .select(col(idCol), col("centroid_id"))
      .join(ids, Seq(idCol), "left_semi")
      .select("centroid_id").distinct()
      .collect().map(_.get(0).toString.toLong).sorted
    if (touched.isEmpty) return 0
    // survivors of the touched cells only; explicit column order keeps the
    // rewritten files byte-compatible with the stored schema. Checkpoint:
    // the overwrite job must not re-read the very directories it replaces.
    val stored = spark.read.parquet(vectors)
    val survivors = stored
      .filter(col("centroid_id").cast("long").isInCollection(touched))
      .join(ids, Seq(idCol), "left_anti")
      .select(stored.columns.map(col): _*)
      .localCheckpoint(true)
    // a cell whose every row was removed appears in no output partition —
    // dynamic overwrite would LEAVE its stale directory — so track which
    // touched cells still have survivors and delete the emptied dirs
    val living = survivors.select("centroid_id").distinct()
      .collect().map(_.get(0).toString.toLong).toSet
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try survivors.repartition(col("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id").parquet(vectors)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    if (touched.exists(c => !living(c))) {
      val fs = new org.apache.hadoop.fs.Path(vectors)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      touched.filterNot(living).foreach { c =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$vectors/centroid_id=$c"), true)
      }
    }
    // the session's FileStatusCache still lists the replaced files —
    // without the refresh the next read of the path fails FILE_NOT_EXIST
    spark.catalog.refreshByPath(vectors)
    touched.length
  }

  /** INCREMENTAL embedding near-dup screening — "is anything in this new
    * batch a near-dup (cosine ≥ threshold) of the indexed corpus?" — the
    * embedding-modality sibling of [[graft.ops.FuzzyDedup.checkNearDups]].
    * One [[ivfQueryAll]] pass against the persisted index (probed-cells
    * file pruning, no corpus rescan), thresholded; a batch vector indexed
    * under the same id never pairs with itself. Compose with [[ivfAppend]]
    * to then fold the screened batch in. Returns (id_a = batch id,
    * id_b = indexed id, cos_sim).
    *
    * nProbe bounds recall exactly as in querying: a near-dup whose cell is
    * outside the batch vector's nProbe nearest cells is missed — the same
    * recall/cost dial every IVF deployment exposes.
    *
    * `k` caps the PAIRS returned per batch vector: a vector with more than
    * k indexed near-dups above the threshold reports only its k most
    * similar (ample for a yes/no dup screen; raise k when enumerating all
    * pairs over a heavily-duplicated corpus). The top-(k+1) is fetched
    * internally so a self-match under the same id never consumes one of
    * the k slots.
    */
  def checkEmbeddingNearDups(spark: SparkSession, indexDir: String,
                             batch: DataFrame, idCol: String, vecCol: String,
                             threshold: Double = 0.95, k: Int = 10,
                             nProbe: Int = 4): DataFrame =
    ivfQueryAll(spark, indexDir, batch, idCol, idCol, vecCol, k + 1, nProbe)
      .filter(col("sim") >= threshold && col("query_id") =!= col(idCol))
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col(idCol))))
      .filter(col("__rk") <= k).drop("__rk")
      .select(col("query_id").as("id_a"), col(idCol).as("id_b"),
        col("sim").as("cos_sim"))

  /** The probe-limited corpus scan of a persisted index: only the listed
    * cells' partition directories are read (static partition pruning on the
    * literal ids — `.explain` shows the `centroid_id IN (…)` partition
    * filter and a pruned file count). Exposed separately so callers/tests
    * can assert the pruning.
    */
  def ivfProbeScan(spark: SparkSession, indexDir: String,
                   probedCells: Seq[Long]): DataFrame =
    // cast: partition-column type inference may narrow centroid_id to int;
    // the predicate still references only the partition column, so the
    // partition pruner evaluates it per directory — files outside the probed
    // cells are never listed into the scan.
    spark.read.parquet(s"$indexDir/vectors")
      .filter(col("centroid_id").cast("long").isInCollection(probedCells))

  /** IVF ANN top-k against a PERSISTED index ([[ivfBuild]]): rank the query
    * against the centroid table (tiny), keep the nProbe nearest cells, and
    * run exact cosine ONLY over those cells' files. The probed cell ids are
    * collected to the driver — O(nProbe) longs, bounded by construction —
    * so they push down as literal partition filters; nothing else leaves
    * the executors. No full-corpus pass, no retraining.
    */
  def ivfQuery(spark: SparkSession, indexDir: String, query: DataFrame,
               idCol: String, vecCol: String, k: Int,
               nProbe: Int = 4): DataFrame =
    ivfQuery(spark.read.parquet(s"$indexDir/centroids"),
      spark.read.parquet(s"$indexDir/vectors"),
      query, idCol, vecCol, k, nProbe)

  /** [[ivfQuery]] over pre-loaded index frames. A caller querying the same
    * immutable index repeatedly should load `centroids`/`vectors` once and
    * reuse them: a fresh `spark.read.parquet` per query re-lists the
    * centroid-partitioned vectors tree (one directory per cell) inside the
    * query's timed path, and that listing — not the pruned scan — was the
    * residual cost of the hot ANN path. The cell filter still partition-
    * prunes per plan; only the file INDEX is reused, never stale data (the
    * frames see exactly the files listed at load — callers that append to
    * the index must reload, as [[ivfAppend]] documents).
    */
  def ivfQuery(centroids: DataFrame, vectors: DataFrame, query: DataFrame,
               idCol: String, vecCol: String, k: Int,
               nProbe: Int): DataFrame = {
    val cents = centroids
    val probed = query.select(col(vecCol).as("__qvec"))
      .crossJoin(broadcast(cents))
      .withColumn("__qsim", cosine(col("__qvec"), col("centroid")))
      .orderBy(col("__qsim").desc, col("centroid_id").asc)
      .limit(nProbe)
      .select("centroid_id")
      .collect().map(_.getLong(0)).toIndexedSeq // O(nProbe): driver-safe
    val q = query.select(col(vecCol).as("__qvec"))
    vectors.filter(col("centroid_id").cast("long").isInCollection(probed))
      .crossJoin(broadcast(q))
      .withColumn("sim", cosine(col(vecCol), col("__qvec")))
      .select(col(idCol), col("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Batched IVF ANN: top-k for EVERY query row in ONE job against a
    * persisted index — the bulk-inference shape (score a whole query table,
    * not one vector at a time).
    *
    * Plan: each query ranks the broadcast centroid table and keeps its
    * nProbe cells (a window over query id — the cross join is
    * |queries|·|cells| rows, both factors index-bounded); the corpus scan is
    * restricted to the UNION of all probed cells, which is collected as
    * literal cell ids — O(nCells) driver data, bounded by the INDEX size,
    * not the data — so the read file-prunes exactly like the single-query
    * path. Candidates then join (query, cell) pairs on centroid_id (an
    * equi-join AQE can skew-split if some cell is hot) and a per-query
    * window keeps the top k.
    */
  def ivfQueryAll(spark: SparkSession, indexDir: String, queries: DataFrame,
                  qidCol: String, idCol: String, vecCol: String, k: Int,
                  nProbe: Int = 4): DataFrame =
    ivfQueryAll(spark.read.parquet(s"$indexDir/centroids"),
      spark.read.parquet(s"$indexDir/vectors"),
      queries, qidCol, idCol, vecCol, k, nProbe)

  /** [[ivfQueryAll]] over pre-loaded index frames (see the [[ivfQuery]]
    * frame overload for why reuse matters on a hot immutable index).
    */
  def ivfQueryAll(centroids: DataFrame, vectors: DataFrame, queries: DataFrame,
                  qidCol: String, idCol: String, vecCol: String, k: Int,
                  nProbe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = centroids
    val probes = queries
      .select(col(qidCol).as("query_id"), col(vecCol).as("__qvec"))
      .crossJoin(broadcast(cents))
      .withColumn("__qsim", cosine(col("__qvec"), col("centroid")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("__qsim").desc, col("centroid_id").asc)))
      .filter(col("__rn") <= nProbe)
      .select(col("query_id"), col("__qvec"), col("centroid_id"))
      // two consumers (cell collect + candidate join): materialize the
      // |queries|·nProbe-row ranking once instead of re-running it
      .localCheckpoint(true)
    val probedCells = probes.select("centroid_id").distinct()
      .collect().map(_.getLong(0)).toIndexedSeq // ≤ nCells: driver-safe
    vectors.filter(col("centroid_id").cast("long").isInCollection(probedCells))
      .withColumn("centroid_id", col("centroid_id").cast("long"))
      .join(probes, "centroid_id")
      .withColumn("sim", cosine(col(vecCol), col("__qvec")))
      .withColumn("__rk", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col(idCol).asc)))
      .filter(col("__rk") <= k)
      .select(col("query_id"), col(idCol), col("sim"))
  }
}
