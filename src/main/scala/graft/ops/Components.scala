package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the cluster-
  * resolution step a dedup pipeline needs between "near-dup PAIRS" (MinHash/
  * SimHash/embedding candidates) and "keep ONE doc per duplicate cluster".
  *
  * Algorithm: alternating large-star / small-star contraction (Kiveris et
  * al., "Connected Components in MapReduce and Beyond", SoCC'14 — public
  * algorithm, re-expressed on DataFrames):
  *
  *  - large-star: every node connects its strictly-LARGER neighbors to the
  *    minimum of its closed neighborhood;
  *  - small-star: every node (edges oriented larger→smaller) connects itself
  *    and its smaller neighbors to that minimum.
  *
  * Each round halves component heights, so a component of n nodes converges
  * in O(log n) rounds REGARDLESS of diameter — a 1M-node chain needs ~20
  * rounds where label propagation would need 1M. Fixpoint = every component
  * is a star whose center is its minimum id.
  *
  * Scale shape: each round is two groupBy-min shuffles + two equi-joins on
  * vertex id — no cartesian, state is one row per EDGE (monotonically
  * non-increasing after round 1). `localCheckpoint` truncates iterative
  * lineage so the plan does not grow with rounds (the classic Spark
  * iterative-algorithm trap); convergence is an exact set-equality check
  * (distinct counts — observed on the checkpoint jobs, never separate
  * count() actions — plus a left-anti join over the two already-distinct
  * edge sets), never a hash heuristic.
  */
object Components {

  /** @param edges two-column frame of undirected edges (idA, idB)
    * @return (id, component) — component = min vertex id reachable
    */
  def connectedComponents(edges: DataFrame, idA: String = "id_a",
                          idB: String = "id_b", maxIter: Int = 25): DataFrame =
    connectedComponentsCounted(edges, idA, idB, maxIter)._1

  /** [[connectedComponents]] plus the number of contraction rounds it took —
    * exposed so tests can assert the O(log n) round bound is real, not
    * asymptotic folklore.
    */
  private[graft] def connectedComponentsCounted(
      edges: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIter: Int = 25): (DataFrame, Int) = {
    // ONE evaluation of the caller's edge subtree (often a whole near-dup
    // pipeline): the raw pair projection materializes once and both the
    // node set and the canonical edge set derive from it — before r17 the
    // `nodes` and `e` checkpoints each re-ran the full upstream plan
    val base = edges.select(col(idA).as("a"), col(idB).as("b"))
      .localCheckpoint(true)
    // no checkpoint: read once by the final join, straight off `base`
    val nodes = base.select(col("a").as("id"))
      .union(base.select(col("b").as("id")))
      .distinct()
    // canonical orientation (larger → smaller), self-loops dropped; the
    // initial edge count rides the checkpoint job as an observed metric
    // (the separate count() job it replaces was pure scheduling overhead)
    val obs0 = org.apache.spark.sql.Observation()
    var e = base
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .distinct()
      .observe(obs0, count(lit(1)).as("__n"))
      .localCheckpoint(true)
    var eCount = obs0.get("__n").asInstanceOf[Long]
    var converged = eCount == 0L
    var i = 0
    while (!converged && i < maxIter) {
      // LARGE-STAR: for each u, m = min(N(u) ∪ {u}); connect every neighbor
      // v > u to m. Output edges all satisfy bigger > smaller already.
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val lmins = sym.groupBy("u").agg(min("v").as("__nmin"))
        .select(col("u"), least(col("u"), col("__nmin")).as("m"))
      // localCheckpoint: the round's heaviest subtree feeds BOTH small-star
      // branches — materialize once rather than trusting exchange reuse.
      // Deliberately NOT distinct()ed: groupBy-min is multiset-insensitive
      // and the round-final distinct below restores set semantics, so the
      // intermediate dedup was one whole exchange per round spent bounding
      // a multiplicity that is already ≤ degree (sym holds each neighbor
      // once; duplicates arise only when two centers agree on (v, m))
      val large = sym.join(lmins, "u")
        .filter(col("v") > col("u") && col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .localCheckpoint(true)
      // SMALL-STAR: edges already oriented (u > v); m = min neighbor of u;
      // connect u and each of its smaller neighbors to m.
      val smins = large.groupBy("u").agg(min("v").as("m"))
      val joined = large.join(smins, "u")
      val small = joined.select(col("v").as("u"), col("m").as("v"))
        .union(joined.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
      // the convergence count rides the checkpoint materialization as an
      // observed metric — the separate per-round count() job it replaces
      // was pure scheduling overhead on an already-materialized frame
      val obs = org.apache.spark.sql.Observation()
      val next = small.observe(obs, count(lit(1)).as("__n")).localCheckpoint(true)
      val nextCount = obs.get("__n").asInstanceOf[Long]
      // exact fixpoint: both sides distinct, so equal counts + empty
      // left-anti means equal sets (left_anti over two already-distinct
      // checkpoints skips EXCEPT's extra dedup-aggregate of the left side)
      converged = nextCount == eCount &&
        next.join(e, Seq("u", "v"), "left_anti").isEmpty
      e = next
      eCount = nextCount
      i += 1
    }
    // an un-converged edge set is a silently WRONG clustering, not an
    // approximation: fail loudly
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          s"star contraction needs O(log n) rounds, so this graph is larger " +
          s"than maxIter=$maxIter supports; raise maxIter")
    // fixpoint = stars: every non-center node has its component min as its
    // (unique) smaller neighbor; centers label themselves
    (nodes.join(e.groupBy("u").agg(min("v").as("__m")),
        col("id") === col("u"), "left")
      .select(col("id"), coalesce(col("__m"), col("id")).as("component")), i)
  }

  /** Resolve duplicate clusters to a keeper: every doc that appears in a
    * candidate pair is assigned its component's minimum doc id as `keep_id`
    * (docs in no pair are implicitly their own keeper and absent here).
    */
  def dedupKeepers(pairs: DataFrame, idA: String = "id_a",
                   idB: String = "id_b"): DataFrame =
    connectedComponents(pairs, idA, idB)
      .select(col("id").as("doc_id"), col("component").as("keep_id"))

  /** LEAKAGE-SAFE train/val/test assignment: split by near-dup CLUSTER,
    * not by doc — a naive per-doc split puts near-identical documents on
    * both sides of a train/test boundary, silently inflating every
    * evaluation run on the corpus. Each doc in a candidate pair inherits
    * its cluster representative's id (the component minimum); unpaired
    * docs represent themselves (left join + coalesce); the split is then
    * pure key arithmetic on the representative — deterministic,
    * recomputable from the pairs, no RNG. Returns (idCol, rep_id, split)
    * with splits `s0..s{n-1}`: numeric ids split by `pmod(rep_id,
    * nSplits)` (bit-identical to rounds ≤8), any other id type (string /
    * uuid / binary) by `pmod(abs(xxhash64(rep_id)), nSplits)` — the same
    * stable-hash family the bucket layout uses, so no caller-side
    * numeric-id dance is needed. A NULL id raises: under the old pmod
    * arithmetic it yielded split=NULL, silently assigning the doc to no
    * split at all.
    *
    * Shape: one connected-components resolution over the PAIRS (tiny
    * relative to the corpus) + one broadcast-size join back — the corpus
    * side is touched once.
    */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame, idCol: String,
                       nSplits: Int = 10, idA: String = "id_a",
                       idB: String = "id_b"): DataFrame = {
    require(nSplits >= 2, s"need >= 2 splits, got $nSplits")
    val reps = dedupKeepers(pairs, idA, idB)
      .select(col("doc_id").as("__id"), col("keep_id"))
    val numericId = docs.schema(docs.schema.fieldIndex(idCol)).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    // every doc in a cluster shares rep_id, so any deterministic function
    // of rep_id keeps the cluster on one side of the boundary
    val repKey =
      if (numericId) col("rep_id")
      else abs(xxhash64(col("rep_id")))
    val guardedId = when(col(idCol).isNotNull, col(idCol))
      .otherwise(raise_error(lit(
        s"leakageSafeSplit: NULL $idCol — a null id cannot be assigned a split")))
    docs.select(guardedId.as(idCol))
      .join(reps, col(idCol) <=> col("__id"), "left")
      .select(col(idCol),
        coalesce(col("keep_id"), col(idCol)).as("rep_id"))
      .withColumn("split",
        concat(lit("s"), pmod(repKey, lit(nSplits.toLong)).cast("string")))
  }

  /** Keeper policy by QUALITY instead of id: each doc in a candidate pair
    * maps to its component's argmax by `scoreCol` (ties → smaller id) — the
    * "keep the best copy" a curation pipeline wants when near-dups differ
    * in quality. One join to attach scores + one max_by aggregate + one
    * join back, all equi-joins on component/id.
    *
    * LEFT join on scores: a paired doc missing from `docs` (or with a NULL
    * score) stays in the mapping — it can never WIN, but it must never
    * silently escape dedup resolution either.
    */
  def dedupKeepersBy(pairs: DataFrame, docs: DataFrame, idCol: String,
                     scoreCol: String, idA: String = "id_a",
                     idB: String = "id_b"): DataFrame = {
    val comp = connectedComponents(pairs, idA, idB)
    val withScore = comp.join(
        docs.select(col(idCol).as("id"), col(scoreCol).as("__s0")), Seq("id"), "left")
      .withColumn("__s", coalesce(col("__s0").cast("double"),
        lit(Double.NegativeInfinity)))
    // min_by over (-score, id): maximizes score, ties → smaller id — WITHOUT
    // negating the id, so string/uuid doc ids work (negating a string id
    // casts to double → NULL under non-ANSI, silently breaking the
    // documented tiebreak). __s is already a double, so -__s is exact.
    val best = withScore.groupBy("component")
      .agg(min_by(col("id"), struct(-col("__s"), col("id"))).as("keep_id"))
    withScore.join(best, "component")
      .select(col("id").as("doc_id"), col("keep_id"))
  }
}
