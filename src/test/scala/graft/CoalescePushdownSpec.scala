package graft

import org.apache.spark.sql.functions._

import graft.cdc.KeyedParquetTable

/** The rename-history pushdown rule ([[graft.plans.CoalescePushdown]]):
  * filters on a metadata-renamed column must reach the parquet scan as
  * pushed OR-twins over both physical generations, prune correctly on
  * files holding either generation, and never change results.
  */
class CoalescePushdownSpec extends SparkSpec {
  import spark.implicits._

  test("filter on a renamed column is pushed to the scan and stays exact") {
    val dir = tmpDir("cps_rename")
    val t = new KeyedParquetTable(spark, dir, Seq("id"), Nil, 4)
    t.commit((1L to 50L).map(i => (i, i * 10L)).toDF("id", "n"))
    t.renameColumn("n", "score")
    // mixed generations: old files physically hold `n`, this merge's
    // rewritten buckets hold `score`
    t.merge((51L to 80L).map(i => (i, i * 10L, "u")).toDF("id", "score", "operation"))
    val q = t.read().filter(col("score") > 600L)
    // exactness first: both generations' qualifying rows survive
    val got = q.select("id").collect().map(_.getLong(0)).toSet
    assert(got === (61L to 80L).toSet)
    // the scan carries a pushed OR-twin naming BOTH physical columns
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters"), scan)
    val pushed = scan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("score") && pushed.contains("n"),
      s"expected an Or-twin over both generations in: $pushed")
    // a filter mixing the renamed column with a passthrough column also
    // twins soundly
    val q2 = t.read().filter(col("score") > col("id") * 10L - 1L)
    assert(q2.count() === 80L)
    // no rename history -> rule leaves plans alone (plain pushdown only)
    val t2 = new KeyedParquetTable(spark, tmpDir("cps_plain"), Seq("id"), Nil, 4)
    t2.commit((1L to 10L).map(i => (i, i)).toDF("id", "n"))
    val plain = t2.read().filter(col("n") > 5L)
    assert(plain.count() === 5L)
  }

  test("general coalesce filter gains a pushed twin without changing results") {
    val dir = tmpDir("cps_general")
    (1L to 100L).map(i => (i, if (i % 3 == 0) None else Some(i), Some(i * 2)))
      .toDF("id", "a", "b").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).filter(coalesce(col("a"), col("b")) > 50L)
    val expect = (1L to 100L).count(i =>
      (if (i % 3 == 0) i * 2 else i) > 50L)
    assert(df.count() === expect)
    val pushed = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("a") && pushed.contains("b"),
      s"expected twin over a and b in: $pushed")
  }
}
