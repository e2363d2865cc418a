package graft

import org.apache.spark.sql.functions._

import graft.ops.AsofJoin

/** As-of join: semantics against a hand-computed oracle, inclusive bound,
  * left-outer nulls, tie handling, and the single-exchange plan shape.
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  // quotes(key, qts, px): the as-of source; trades(key, tts, qty): the probe
  private def quotes = Seq(
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 9.0)).toDF("sym", "qts", "px")
  private def trades = Seq(
    ("A", 5L, 100L), // before any quote -> null
    ("A", 10L, 101L), // equal ts -> inclusive match at 10
    ("A", 25L, 102L), // between 20 and 30 -> 2.0
    ("A", 99L, 103L), // after all -> 3.0
    ("B", 15L, 104L), // exact
    ("C", 50L, 105L)) // key with no quotes -> null
    .toDF("sym", "tts", "tid")

  test("backward as-of join matches the latest quote at or before each trade") {
    val got = AsofJoin.asofBackward(trades, quotes, Seq("sym"), "tts", "qts")
      .select(col("tid"), col("r_px"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert(got === Map(
      100L -> None, 101L -> Some(1.0), 102L -> Some(2.0),
      103L -> Some(3.0), 104L -> Some(9.0), 105L -> None))
  }

  test("equal-timestamp right rows: greatest tiebreak wins deterministically") {
    val q2 = Seq(("A", 10L, 1.0, 1L), ("A", 10L, 7.0, 2L))
      .toDF("sym", "qts", "px", "qid")
    val got = AsofJoin.asofBackward(trades.filter(col("tid") === 101L), q2,
        Seq("sym"), "tts", "qts", rightTiebreak = Some("qid"))
      .select("r_px").as[Double].collect().toSeq
    assert(got === Seq(7.0))
  }

  test("left columns and row count are preserved exactly (left-outer)") {
    val out = AsofJoin.asofBackward(trades, quotes, Seq("sym"), "tts", "qts")
    assert(out.count() === 6)
    assert(out.columns.toSeq === Seq("sym", "tts", "tid", "r_px"))
  }

  test("plan: one hash exchange on the key, no cartesian, no range explosion") {
    val plan = AsofJoin.asofBackward(trades, quotes, Seq("sym"), "tts", "qts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Window"), plan)
    // union of two local scans + one window exchange — nothing else shuffles
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
  }

  test("null right timestamps never match; string tiebreaks keep native order") {
    // the null-ts right row would sort nulls-first and leak its payload
    // into every window without the filter
    val left = Seq((1L, 100L)).toDF("k", "ts")
    val right = Seq((1L, Option.empty[Long], 9), (1L, Option(50L), 1)).toDF("k", "ts", "v")
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "ts", "ts").head()
    assert(out.getInt(2) === 1)
    // string tiebreak: greatest STRING wins at equal ts (a cast-to-long
    // would null it out and leave the winner arbitrary)
    val r2 = Seq((1L, 50L, "a"), (1L, 50L, "b")).toDF("k", "ts", "tag")
    val got = AsofJoin.asofBackward(left, r2, Seq("k"), "ts", "ts",
      rightTiebreak = Some("tag"))
    assert(got.head().getString(2) === "b")
  }

  test("agrees with the naive join+argmax formulation on real events data") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts").agg(max("event_id").as("v_event_id"))
    val got = AsofJoin.asofBackward(p, v, Seq("user_id"), "ts", "ts",
        rightTiebreak = Some("v_event_id"), rightPrefix = "")
      .select("p_event_id", "v_event_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // naive oracle: equi-join + filter + argmax (fine at sf0.001)
    val naive = p.join(v.withColumnRenamed("user_id", "vu").withColumnRenamed("ts", "vts"),
        col("user_id") === col("vu") && col("vts") <= col("ts"), "left")
      .groupBy("p_event_id").agg(max("v_event_id").as("v_event_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got.size === naive.size)
    // max(v_event_id) == argmax-by-ts here because event_id is monotone in ts
    assert(got === naive)
  }
}
