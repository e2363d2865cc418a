package graft

import org.apache.spark.sql.functions._

import graft.cdc.Merge
import graft.ops.Dedup

/** MERGE semantics (K4) and the property-based CRUD-fold oracle from
  * SURVEY §5: any random create/update/delete sequence folded through the
  * engine equals a naive in-memory map fold (10 seeded random histories).
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
    .toDF("id", "name", "price")

  test("mergeUpsert: update, insert, delete, untouched") {
    val source = Seq(
      (2L, "b2", 21, "u"),  // update existing
      (4L, "d", 40, "u"),   // insert new
      (3L, null, 0, "d"),   // delete existing
      (9L, null, 0, "d")    // delete non-existent → no-op
    ).toDF("id", "name", "price", "operation")
    val out = Merge.mergeUpsert(target, source, Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out === Array((1L, "a", 10), (2L, "b2", 21), (4L, "d", 40)))
  }

  test("mergeUpsert drops extra source columns on insert") {
    val source = Seq((5L, "e", 50, "u", "extra")).toDF("id", "name", "price", "operation", "junk")
    val out = Merge.mergeUpsert(target, source, Seq("id"))
    assert(out.columns.toSeq === Seq("id", "name", "price"))
    assert(out.count() === 4)
  }

  test("mergeUpsert with an empty batch returns the target unchanged") {
    val empty = Seq.empty[(Long, String, Int, String)]
      .toDF("id", "name", "price", "operation")
    val out = Merge.mergeUpsert(target, empty, Seq("id"), "operation")
    assert(out.orderBy("id").collect().toSeq ===
      target.orderBy("id").collect().toSeq)
  }

  test("mergeUpsert with a delete-only batch removes exactly those keys") {
    val dels = Seq((1L, null.asInstanceOf[String], 0, "d"),
      (3L, null.asInstanceOf[String], 0, "d"))
      .toDF("id", "name", "price", "operation")
    val out = Merge.mergeUpsert(target, dels, Seq("id"), "operation")
    assert(out.select("id").as[Long].collect().toSeq === Seq(2L))
  }

  test("CRUD-fold oracle: engine final state == in-memory map fold (10 random histories)") {
    for (seed <- 0 until 10) {
      val rnd = new scala.util.Random(seed)
      val ops = List.fill(60)((rnd.nextLong(16).abs,
        if (rnd.nextInt(4) == 0) "d" else "u", rnd.nextInt(1000)))
      // oracle: naive fold
      val expected = ops.zipWithIndex.foldLeft(Map.empty[Long, (Int, Long)]) {
        case (m, ((k, "d", _), _)) => m - k
        case (m, ((k, _, v), i))   => m + (k -> ((v, i.toLong)))
      }
      // engine: single-pass fold of the history
      val df = ops.zipWithIndex
        .map { case ((k, op, v), i) => (k, op, v, i.toLong) }
        .toDF("id", "operation", "value", "seq")
      val got = Merge.foldFinalState(df, Seq("id"), Seq(col("seq").desc))
        .select("id", "value", "seq").collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
      assert(got === expected, s"seed=$seed")
    }
  }

  test("batch-by-batch merge replay equals single-pass fold") {
    val history = (0 until 200).map { i =>
      (i % 17L, if (i % 11 == 0) "d" else "u", i, i.toLong)
    }.toDF("id", "operation", "value", "seq")
    val folded = Merge.foldFinalState(history, Seq("id"), Seq(col("seq").desc))
      .select("id", "value").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // replay in 4 sequential batches through mergeUpsert
    var state = history.filter(lit(false)).select("id", "value")
    (0 until 4).foreach { b =>
      val batch = history.filter(col("seq") >= b * 50 && col("seq") < (b + 1) * 50)
      val deduped = Dedup.dedupLatest(batch, Seq("id"), Seq(col("seq").desc))
      state = Merge.mergeUpsert(state, deduped.select("id", "value", "operation"), Seq("id"))
    }
    val replayed = state.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(replayed === folded)
  }
}
