package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Planner-extension coverage: the ScoreTopK strategy must replace the
  * sort-based plan for vec_dot-scored ORDER BY/LIMIT, produce identical
  * results, and leave every other ORDER BY/LIMIT alone.
  */
class ScoreTopKSpec extends SparkSpec {
  import spark.implicits._

  private def embeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def scoredTopK(k: Int) = {
    val q = embeddings.limit(1).select(col("embedding"))
    Similarity.cosineTopK(embeddings, q, "vec_id", "embedding", k)
  }

  test("strategy fires: plan shows ScoreTopK phases and no Sort") {
    val plan = scoredTopK(10).queryExecution.executedPlan.toString
    assert(plan.contains("ScoreTopKGlobal"), s"strategy did not fire:\n$plan")
    assert(plan.contains("ScoreTopKLocal"), s"no partial phase:\n$plan")
    assert(!plan.contains("TakeOrderedAndProject"), s"built-in still planned:\n$plan")
    assert(!plan.contains("Sort "), s"sort survived:\n$plan")
  }

  test("results identical to the sort semantics (order, ties, values)") {
    val got = scoredTopK(20).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // expected: full scored scan, sorted driver-side
    val all = scoredTopK(Int.MaxValue - 1).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val expected = all.sortBy { case (id, sim) => (-sim, id) }.take(20)
    assert(got === expected)
  }

  test("k larger than the data returns everything, ordered") {
    val n = embeddings.count()
    val got = scoredTopK(100000).collect()
    assert(got.length === n)
    val sims = got.map(_.getDouble(1)).toSeq
    assert(sims === sims.sorted(Ordering[Double].reverse))
  }

  test("non-vec_dot ORDER BY/LIMIT keeps Spark's own planning") {
    val df = Seq((1L, 3.0), (2L, 1.0), (3L, 2.0)).toDF("id", "v")
      .orderBy(col("v").desc).limit(2)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScoreTopK"), s"strategy overmatched:\n$plan")
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
  }
}
