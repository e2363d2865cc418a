package graft

import org.apache.spark.sql.functions._

import graft.ops.RangeLayout

/** Range-clustered layout: non-overlapping files, range predicates skip
  * non-matching files at the scan.
  */
class RangeLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("files are non-overlapping on the order column; range scan reads a subset") {
    val df = spark.range(0, 100000).select(col("id"),
      (col("id") * 7 % 1000).as("payload"))
    val dir = tmpDir("range_layout")
    RangeLayout.writeRangeClustered(df, dir, numFiles = 8, col("id"))
    // per-file min/max must not overlap
    val back = spark.read.parquet(dir)
    val spans = back.withColumn("__f", input_file_name())
      .groupBy("__f").agg(min("id").as("lo"), max("id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(spans.length === 8)
    spans.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, s"overlap: ${spans.toSeq}")
      case _ =>
    }
    // a narrow range predicate scans fewer rows than the table: with
    // non-overlapping files, the untouched files' row groups are skipped
    // entirely by parquet min/max stats
    val narrow = back.filter(col("id").between(10, 20))
    assert(narrow.count() === 11L)
    // correctness: the clustered copy is the same data
    assert(back.count() === 100000L)
    assert(back.agg(sum("payload")).head.getLong(0) ===
      df.agg(sum("payload")).head.getLong(0))
  }
}
