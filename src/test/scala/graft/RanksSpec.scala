package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Ranks

/** Distributed global rank: identical results to the single-task
  * `Window.orderBy` formulation, without ever planning one.
  */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    val rnd = new scala.util.Random(7)
    Seq.fill(997)((rnd.nextLong(100000).abs, rnd.nextDouble() * 1000))
      .zipWithIndex.map { case ((k, v), i) => (i.toLong, v) } // unique keys
      .toDF("id", "price")
  }

  test("globalRank equals the global-window row_number exactly") {
    val df = fixture
    val (ranked, n) = Ranks.globalRank(df, col("price"), Seq(col("id")), "rn", buckets = 8)
    assert(n === 997L)
    val w = Window.orderBy(col("price").asc, col("id").asc)
    val expected = df.select(col("id"), row_number().over(w).cast("long").as("rn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = ranked.select("id", "rn")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("ntileFromRank / percentRankFromRank equal the window functions") {
    val df = fixture
    val (ranked, n) = Ranks.globalRank(df, col("price"), Seq(col("id")), "rn", buckets = 8)
    val got = ranked.select(col("id"),
        Ranks.ntileFromRank(col("rn"), n, 4).cast("long").as("q"),
        Ranks.percentRankFromRank(col("rn"), n).as("pr"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val w = Window.orderBy(col("price").asc, col("id").asc)
    val expected = df.select(col("id"),
        ntile(4).over(w).cast("long").as("q"),
        percent_rank().over(w).as("pr"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === expected) // exact, doubles included
  }

  test("broadcast-offset branch (buckets > offsetJoinThreshold) ranks identically") {
    val df = fixture
    // force the join path: any realized bucket count above 2 takes it
    val (ranked, n) = Ranks.globalRank(df, col("price"), Seq(col("id")), "rn",
      buckets = 8, offsetJoinThreshold = 2)
    assert(n === 997L)
    val w = Window.orderBy(col("price").asc, col("id").asc)
    val expected = df.select(col("id"), row_number().over(w).cast("long").as("rn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = ranked.select("id", "rn")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    // the offset table must ride a broadcast, not a shuffle
    val plan = ranked.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"offset join not broadcast:\n$plan")
  }

  test("ranked plan contains no single-partition exchange") {
    val df = fixture
    val (ranked, _) = Ranks.globalRank(df, col("price"), Seq(col("id")), "rn", buckets = 8)
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"single-task stage in:\n$plan")
  }

  test("empty input ranks to an empty frame with total 0 (no NPE)") {
    val empty = Seq.empty[(Long, Long)].toDF("v", "id")
    val (ranked, n) = Ranks.globalRank(empty, col("v"), Seq(col("id")), "rn")
    assert(n === 0L && ranked.count() === 0L)
  }

  test("degenerate inputs: constant values and tiny N") {
    val tiny = Seq((1L, 5.0), (2L, 5.0), (3L, 5.0)).toDF("id", "price")
    val (ranked, n) = Ranks.globalRank(tiny, col("price"), Seq(col("id")), "rn", buckets = 8)
    assert(n === 3L)
    val rs = ranked.orderBy("id").select("rn").as[Long].collect().toSeq
    assert(rs === Seq(1L, 2L, 3L))
    // ntile over N < buckets
    val q = ranked.select(Ranks.ntileFromRank(col("rn"), n, 4).cast("long"))
      .as[Long].collect().sorted.toSeq
    assert(q === Seq(1L, 2L, 3L))
  }

  // ---- exactQuantiles -------------------------------------------------------

  private def sortedRef(vals: Seq[Double], p: Double): (Long, Double) = {
    val s = vals.sorted
    val k = math.max(1L, math.ceil(p * s.size).toLong)
    (k, s((k - 1).toInt))
  }

  test("exactQuantiles equals the sorted order statistic for every p") {
    val df = fixture
    val vals = df.select(col("price")).as[Double].collect().toSeq
    val probs = Seq(0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val got = Ranks.exactQuantiles(df, col("price"), probs, buckets = 8)
      .collect().map(r => r.getDouble(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === probs.toSet)
    probs.foreach { p => assert(got(p) === sortedRef(vals, p), s"p=$p") }
  }

  test("exactQuantiles is exact under heavy ties") {
    // many duplicates: only 5 distinct values over 1000 rows, so every
    // bucket boundary lands inside a tie run
    val df = (0 until 1000).map(i => (i.toLong, (i % 5).toDouble)).toDF("id", "price")
    val vals = df.select(col("price")).as[Double].collect().toSeq
    val probs = Seq(0.2, 0.5, 0.61, 0.8, 1.0)
    val got = Ranks.exactQuantiles(df, col("price"), probs, buckets = 8)
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    probs.foreach { p => assert(got(p) === sortedRef(vals, p)._2, s"p=$p") }
  }

  test("exactQuantiles skips nulls and handles empty/all-null frames") {
    val withNulls = Seq[(Long, Option[Double])](
      (1L, Some(3.0)), (2L, None), (3L, Some(1.0)), (4L, Some(2.0)), (5L, None))
      .toDF("id", "price")
    val m = Ranks.exactQuantiles(withNulls, col("price"), Seq(0.5, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    assert(m === Map(0.5 -> 2.0, 1.0 -> 3.0))
    val allNull = Seq[(Long, Option[Double])]((1L, None)).toDF("id", "price")
    assert(Ranks.exactQuantiles(allNull, col("price"), Seq(0.5)).count() === 0L)
    val empty = Seq.empty[(Long, Double)].toDF("id", "price")
    assert(Ranks.exactQuantiles(empty, col("price"), Seq(0.5)).count() === 0L)
  }

  test("exactQuantiles degenerates correctly on constant values") {
    // all ties: the boundary sample collapses to one bucket — the result
    // must still be exact (the one bucket IS the straddler)
    val df = (1 to 300).map(i => (i.toLong, 7.5)).toDF("id", "price")
    val got = Ranks.exactQuantiles(df, col("price"), Seq(0.5, 1.0), buckets = 8)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set((0.5, 150L, 7.5), (1.0, 300L, 7.5)))
  }

  test("exactQuantiles survives extreme skew (one value dominates)") {
    val vals = Seq.fill(990)(1.0) ++ (1 to 10).map(_.toDouble * 100)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "price")
    val probs = Seq(0.5, 0.99, 0.995, 1.0)
    val got = Ranks.exactQuantiles(df, col("price"), probs, buckets = 8)
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    probs.foreach { p => assert(got(p) === sortedRef(vals, p)._2, s"p=$p") }
  }

  test("exactQuantiles never plans a single-partition global sort") {
    val df = fixture
    val q = Ranks.exactQuantiles(df, col("price"), Seq(0.5, 0.9), buckets = 8)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"single-task stage in:\n$plan")
  }
}
