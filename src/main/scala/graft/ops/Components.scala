package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the cluster-
  * resolution step a dedup pipeline needs between "near-dup PAIRS" (MinHash/
  * SimHash/embedding candidates) and "keep ONE doc per duplicate cluster".
  *
  * Algorithm: min-label propagation. Every vertex starts labeled with its
  * own id; each round every vertex takes the min of its own and its
  * neighbors' labels; fixpoint = components labeled by their minimum vertex
  * id. Rounds needed ≤ the largest component's diameter — near-dup clusters
  * are shallow (dups of dups of one original), so this converges in a few
  * rounds; `maxIter` bounds pathological chains.
  *
  * Scale shape: each round is ONE equi-join (edges ⋈ labels on dst) + one
  * groupBy(src) min + one left join back — all hash exchanges on vertex id,
  * no cartesian anywhere, state is one (id, label) row per vertex.
  * `localCheckpoint` truncates the iterative lineage so the plan does not
  * grow with rounds (the classic Spark iterative-algorithm trap), and the
  * convergence check piggybacks on a count aggregate, one action per round.
  */
object Components {

  /** @param edges two-column frame of undirected edges (idA, idB)
    * @return (id, component) — component = min vertex id reachable
    */
  def connectedComponents(edges: DataFrame, idA: String = "id_a",
                          idB: String = "id_b", maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col(idA).as("src"), col(idB).as("dst"))
      .union(edges.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      // loop body below; convergence REQUIRED — see the guard after the loop
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "dst2"), col("dst") === col("dst2"))
        .groupBy("src").agg(min("component").as("nmin"))
      val next = labels
        .join(neighborMin, col("id") === col("src"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nmin"), col("component"))).as("component"),
          (col("nmin") < col("component")).as("__chg"))
      val materialized = next.localCheckpoint(true)
      changed = materialized.filter(col("__chg")).count()
      labels = materialized.drop("__chg")
      i += 1
    }
    // un-propagated labels are silently WRONG answers, not approximations:
    // fail loudly rather than return a half-merged clustering
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          s"($changed labels still changing) — the graph has a component with " +
          s"diameter > $maxIter; raise maxIter")
    labels
  }

  /** Resolve duplicate clusters to a keeper: every doc that appears in a
    * candidate pair is assigned its component's minimum doc id as `keep_id`
    * (docs in no pair are implicitly their own keeper and absent here).
    */
  def dedupKeepers(pairs: DataFrame, idA: String = "id_a",
                   idB: String = "id_b"): DataFrame =
    connectedComponents(pairs, idA, idB)
      .select(col("id").as("doc_id"), col("component").as("keep_id"))
}
