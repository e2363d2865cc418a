package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph signals for web-corpus curation: a crawl-scale training
  * pipeline ranks pages by graph importance (the PageRank-as-quality-prior
  * filter) before admission, alongside the text-quality scores in
  * [[TextOps]]. (Extension surface — the reference has no graph ops.)
  */
object Graph {

  /** Deterministic integer-quantized PageRank.
    *
    * Scores live in integer NANO-units (1.0 ≡ 1e9) and every update step is
    * pure Long arithmetic:
    *
    *   contribution(edge) = score(src) DIV outDegree(src)
    *   next(node)         = 0.15e9  +  (85 × Σ contributions) DIV 100
    *
    * so the result is bit-reproducible across engines, partitionings and
    * re-runs — double summation order can't move it, which is what makes a
    * graph-quality gate hash-checkable. The quantization bias per node per
    * iteration is < outDegree + 100 nano-units (two floor divisions):
    * irrelevant for ranking. Long headroom: total graph mass is
    * nodes × 1e9, and the damping multiply ×85 needs it under ~1e17 — fine
    * to ~10^8 nodes; beyond that, drop to micro-units.
    *
    * Pregel shape: per iteration, join scores⨝degree on src → per-edge
    * contribution → one hash-shuffle groupBy on dst → left join back to the
    * node set (dangling and source-only nodes keep the base term — their
    * mass leaks, the standard simplification). No driver-side data at any
    * point; at cluster scale pre-partition `edges` by src so the
    * score/degree joins co-locate, and let AQE handle hub-node skew on the
    * dst aggregation. Lineage hygiene is the loop's own job: `scores` is
    * localCheckpointed every `checkpointEvery` iterations, so plan depth
    * (and task-serialization cost) stays bounded no matter how deep the
    * run — a 50-iteration power run carries at most `checkpointEvery`
    * iterations of plan, not 50.
    *
    * `edges` rows are (src, dst) pairs; multi-edges count multiply (dedup
    * first if unwanted). Returns (node, score) with score in nano-units.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, checkpointEvery: Int = 10): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    // materialize the loop invariants once: every iteration references all
    // three, and without the checkpoint each reference re-runs the source
    // scan + distinct/agg (the plan tree repeats the subtree per iteration).
    // nodes and out-degrees are ONE endpoint aggregation, not two passes
    // over e (union-distinct + groupBy used to cost a checkpoint job and a
    // shuffle each, r17): explode each edge to (src, 1) and (dst, 0), sum
    // the flags per node — every endpoint appears, out-degree rides along.
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).localCheckpoint(true)
    val endpoints = e.select(explode(array(
        struct(col("src").as("node"), lit(1L).as("isSrc")),
        struct(col("dst").as("node"), lit(0L).as("isSrc")))).as("ep"))
      .select(col("ep.node").as("node"), col("ep.isSrc").as("isSrc"))
      .groupBy("node").agg(sum("isSrc").as("outdeg"))
      .localCheckpoint(true)
    // plain projection: collapses into each iteration's join, no extra leaf
    val nodes = endpoints.select("node")
    // checkpointed (an O(nodes)-row filter off the endpoint checkpoint, not
    // a pass over e): the per-iteration deg reference stays a 1-node leaf,
    // keeping plan depth identical per iteration (GraphSpec's depth bound)
    val deg = endpoints.filter(col("outdeg") > 0L)
      .select(col("node").as("src"), col("outdeg").as("deg"))
      .localCheckpoint(true)
    var scores = nodes.withColumn("score", lit(1000000000L))
    (1 to iterations).foreach { i =>
      val inflow = e
        .join(scores.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .select(col("dst"), expr("score DIV deg").as("c"))
        .groupBy("dst").agg(sum("c").as("inflow"))
      scores = nodes
        .join(inflow.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(150000000L) +
            expr("(85 * coalesce(inflow, CAST(0 AS BIGINT))) DIV 100"))
            .as("score"))
      // truncate lineage in-loop (eager, replicated) so plan depth stays
      // O(checkpointEvery) — not on the last iteration, where the caller's
      // downstream action materializes the result anyway
      if (i % checkpointEvery == 0 && i < iterations)
        scores = scores.localCheckpoint(true)
    }
    scores
  }
}
