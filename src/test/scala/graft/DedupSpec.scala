package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** W1/W2: dedup-to-latest determinism, including the offset tiebreak the
  * reference lacks (SURVEY §7.4.5).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("dedupLatest keeps exactly the first row per key under the ordering") {
    val df = Seq(
      (1L, 0, 0L, "v0"), (1L, 0, 1L, "v1"), (1L, 1, 0L, "v2"),
      (2L, 0, 5L, "w0")
    ).toDF("id", "part", "offset", "payload")
    val out = Dedup.dedupLatest(df, Seq("id"),
        Seq(col("part").desc, col("offset").desc))
      .select("id", "payload").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out === Map(1L -> "v2", 2L -> "w0"))
  }

  test("same-timestamp ties break deterministically by offset") {
    // the reference orders by driver wall-clock processing_time, which ties
    // within a batch; (partition, offset) is a total order
    val df = Seq(
      (7L, "2024-01-01 00:00:00", 0L, "first"),
      (7L, "2024-01-01 00:00:00", 1L, "second")
    ).toDF("id", "ts", "offset", "payload")
    val out = Dedup.dedupLatest(df, Seq("id"),
      Seq(col("ts").desc, col("offset").desc))
    assert(out.select("payload").head().getString(0) === "second")
  }

  test("null ordering values lose to any real value under desc (nulls last)") {
    // a CDC row with a missing timestamp must never win dedup-to-latest:
    // Spark's desc default is NULLS LAST, so the null-ts row ranks below
    // every real timestamp; the offset tiebreak keeps it deterministic
    val df = Seq(
      (1L, Some(10L), 0L, "real"), (1L, None, 1L, "missing_ts"),
      (2L, None, 0L, "only_null_a"), (2L, None, 1L, "only_null_b")
    ).toDF("id", "ts", "offset", "payload")
    val out = Dedup.dedupLatest(df, Seq("id"),
        Seq(col("ts").desc, col("offset").desc))
      .select("id", "payload").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out === Map(1L -> "real", 2L -> "only_null_b"))
  }

  test("latestByKey (max_by aggregate) agrees with the window formulation") {
    val rnd = new scala.util.Random(1)
    val rows = Seq.fill(500)((rnd.nextLong(20).abs, rnd.nextLong(10000).abs, rnd.nextInt(100)))
    // make the ordering unique via the row index so both formulations see a total order
    val withSeq = rows.zipWithIndex
      .map { case ((k, ord, v), i) => (k, ord * 1000 + i, v) }
      .toDF("k", "ord2", "v")
    val a = Dedup.dedupLatest(withSeq, Seq("k"), Seq(col("ord2").desc))
      .select("k", "v").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val b = Dedup.latestByKey(withSeq, Seq("k"), "ord2", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(a === b)
  }
}
