package graft

import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

/** Bucketized range join: exhaustive agreement with the naive quadratic
  * formulation (including bucket-boundary and exactly-delta pairs), and the
  * equi-join plan shape.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("finds exactly the pairs within delta, boundaries inclusive") {
    val l = Seq(("A", 0L, 1L), ("A", 100L, 2L), ("B", 50L, 3L))
      .toDF("k", "lts", "lid")
    // rts values probe: equal, ±delta edges (in), delta+1 (out), cross-key
    val r = Seq(("A", 0L, 10L), ("A", 10L, 11L), ("A", 11L, 12L),
      ("A", 90L, 13L), ("A", 111L, 14L), ("B", 40L, 15L), ("B", 61L, 16L))
      .toDF("k", "rts", "rid")
    val got = RangeJoin.within(l, r, Seq("k"), "lts", "rts", 10L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (1L, 11L), (2L, 13L), (3L, 15L)))
  }

  test("agrees with the naive quadratic join on random data, no duplicates") {
    val rnd = new scala.util.Random(11)
    val l = Seq.tabulate(300)(i => (s"k${rnd.nextInt(5)}", rnd.nextLong(1000L), i.toLong))
      .toDF("k", "lts", "lid")
    val r = Seq.tabulate(300)(i => (s"k${rnd.nextInt(5)}", rnd.nextLong(1000L), i.toLong))
      .toDF("k", "rts", "rid")
    val delta = 37L
    val got = RangeJoin.within(l, r, Seq("k"), "lts", "rts", delta)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(got.distinct.size === got.size, "bucketized join produced duplicates")
    val naive = l.crossJoin(r.withColumnRenamed("k", "k2"))
      .filter(col("k") === col("k2") && abs(col("lts") - col("rts")) <= delta)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got.toSet === naive)
  }

  test("epoch-nano timestamps bucket exactly (no double precision loss)") {
    val base = 1700000000000000000L // ~1.7e18 ns
    val delta = 3600L * 1000 * 1000 * 1000
    val l = Seq(("u", base, 1L)).toDF("k", "lts", "lid")
    val r = Seq(("u", base + delta, 2L), // exactly at the bound: in
      ("u", base + delta + 1, 3L), // just outside: out
      ("u", base - delta, 4L)) // exactly at the lower bound: in
      .toDF("k", "rts", "rid")
    val got = RangeJoin.within(l, r, Seq("k"), "lts", "rts", delta)
      .select("rid").as[Long].collect().toSet
    assert(got === Set(2L, 4L))
  }

  test("plan is an equi-join — no cartesian or nested loop") {
    val l = Seq(("A", 0L, 1L)).toDF("k", "lts", "lid")
    val r = Seq(("A", 5L, 2L)).toDF("k", "rts", "rid")
    val plan = RangeJoin.within(l, r, Seq("k"), "lts", "rts", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
