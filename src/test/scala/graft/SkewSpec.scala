package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted count/sum equal direct aggregation on a skewed distribution") {
    // 90% of rows share one key
    val rows = (0 until 20000).map { i =>
      (if (i % 10 == 0) s"k${i % 50}" else "hot", i.toLong)
    }
    val df = rows.toDF("k", "v")
    val directC = df.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val saltedC = Skew.saltedCount(df, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(saltedC === directC)
    val directS = df.groupBy("k").agg(sum("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val saltedS = Skew.saltedSum(df, Seq("k"), "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(saltedS === directS)
  }

  test("saltedJoin returns exactly the plain equi-join rows on a hot key") {
    // 95% of the big side hits one key
    val big = (0 until 20000).map { i =>
      (if (i % 20 == 0) s"k${i % 40}" else "hot", i.toLong)
    }.toDF("k", "id")
    val small = (Seq("hot") ++ (0 until 40).map(i => s"k$i")).zipWithIndex
      .map { case (k, i) => (k, s"dim$i") }.toDF("k", "attr")
    val expected = big.join(small, Seq("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val got = Skew.saltedJoin(big, small, Seq("k"), saltBuckets = 8)
      .select("k", "id", "attr")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(got === expected)
    // left-outer keeps unmatched big rows exactly once
    val bigWithOrphan = big.union(Seq(("orphan", -1L)).toDF("k", "id"))
    val outer = Skew.saltedJoin(bigWithOrphan, small, Seq("k"),
      saltBuckets = 8, joinType = "left")
    assert(outer.count() === expected.size + 1)
    assert(outer.filter(col("k") === "orphan").select("attr").head.get(0) == null)
  }

  test("sketch aggregates land within tolerance of exact answers") {
    val df = spark.range(100000).select((col("id") % 9173L).as("k"),
      (col("id") % 1000L).cast("double").as("v"))
    val row = df.agg(
      approx_count_distinct(col("k")).as("ad"),
      expr("approx_percentile(v, 0.5)").as("p50")).head()
    assert(math.abs(row.getLong(0) - 9173L).toDouble / 9173 < 0.05)
    assert(math.abs(row.getDouble(1) - 500.0) < 25.0)
  }
}
