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
}
