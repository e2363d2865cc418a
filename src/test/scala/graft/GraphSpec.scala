package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

/** Integer-quantized PageRank: equality with a driver-side reference fold of
  * the same Long recurrence, determinism, and graph-shape sanity.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** The identical integer recurrence, folded naively on the driver. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var score = nodes.map(_ -> 1000000000L).toMap
    (1 to iters).foreach { _ =>
      val inflow = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => score(s) / deg(s) }.sum).toMap
      score = nodes.map(n =>
        n -> (150000000L + 85L * inflow.getOrElse(n, 0L) / 100L)).toMap
    }
    score
  }

  test("pageRank equals the driver-side integer reference exactly") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(2000)((rnd.nextInt(100).toLong, rnd.nextInt(100).toLong)).distinct
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === refPageRank(edges, 4))
  }

  test("hub node outranks leaves; dangling nodes keep the base term") {
    // star: every leaf points at the hub; hub points nowhere (dangling)
    val edges = (1L to 20L).map(i => (i, 0L))
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) > got(1L))
    // leaves have no in-edges: exactly the base term after any iteration
    (1L to 20L).foreach(i => assert(got(i) === 150000000L + 85L * 0L / 100L))
    assert(got === refPageRank(edges, 2))
  }

  test("result is partitioning-independent (integer math cannot drift)") {
    val rnd = new scala.util.Random(3)
    val edges = Seq.fill(500)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)).distinct
    val df = edges.toDF("src", "dst")
    val a = Graph.pageRank(df.repartition(17), "src", "dst", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Graph.pageRank(df.coalesce(1), "src", "dst", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("multi-edges contribute multiply; self-loops count") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 2L))
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === refPageRank(edges, 1))
  }

  test("deep runs self-checkpoint: 50 iterations keep plan depth bounded") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(800)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)).distinct
    val df = edges.toDF("src", "dst")

    def planNodes(iters: Int, every: Int): Int = {
      val scores = Graph.pageRank(df, "src", "dst", iters, checkpointEvery = every)
      scores.queryExecution.optimizedPlan.collect { case p => p }.size
    }

    // with in-loop checkpoints, a 50-iteration run's plan is no deeper than
    // the tail since the last checkpoint (50 % 10 = 0 -> <= 10 iterations of
    // plan + the checkpoint scan), i.e. the same size class as a 10-iter run
    val deep = planNodes(50, 10)
    val shallow = planNodes(10, 10)
    assert(deep <= shallow,
      s"50-iter plan has $deep nodes vs 10-iter $shallow — lineage not truncated")
    // and WITHOUT checkpointing the plan really does grow (guards the assert
    // above against ever becoming vacuous)
    val unchecked = planNodes(12, 100)
    assert(unchecked > shallow)

    // checkpoint cadence must not change the answer
    val a = Graph.pageRank(df, "src", "dst", 13, checkpointEvery = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === refPageRank(edges, 13))
  }
}
