package graft

import org.apache.spark.sql.functions._

import graft.functions.HeavyHitters

/** Misra–Gries heavy hitters: retention + error-bound guarantees. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("hot keys survive with counts within the N/(k+1) underestimate bound") {
    // 10_000 rows: key 7 → 4000, key 13 → 2500, rest uniform over 100 cold keys
    val hot = Seq.fill(4000)(7L) ++ Seq.fill(2500)(13L)
    val rnd = new scala.util.Random(3)
    val cold = Seq.fill(3500)(100L + rnd.nextInt(100))
    val df = rnd.shuffle(hot ++ cold).toDF("k").repartition(16)
    val k = 20
    val sketch = df.agg(new HeavyHitters(k).column(col("k")))
      .head().getMap[Long, Long](0)
    val n = 10000L
    val bound = n / (k + 1)
    assert(sketch.contains(7L) && sketch.contains(13L), s"hot keys missing: $sketch")
    assert(sketch(7L) <= 4000L && sketch(7L) >= 4000L - bound, s"k7=${sketch(7L)}")
    assert(sketch(13L) <= 2500L && sketch(13L) >= 2500L - bound, s"k13=${sketch(13L)}")
  }

  test("sketch size never exceeds capacity; merge keeps the bound") {
    val agg = new HeavyHitters(5)
    val a = (0L until 1000L).foldLeft(agg.zero)((m, i) => agg.reduce(m, i % 7))
    val b = (0L until 1000L).foldLeft(agg.zero)((m, i) => agg.reduce(m, i % 11))
    assert(a.size <= 5 && b.size <= 5)
    val m = agg.merge(a, b)
    assert(m.size <= 5)
  }

  test("uniform data yields no spurious mega-counts") {
    val df = spark.range(0, 5000).select((col("id") % 500).as("k"))
    val sketch = df.agg(new HeavyHitters(10).column(col("k")))
      .head().getMap[Long, Long](0)
    // every key has true count 10; estimates can never exceed true counts
    assert(sketch.values.forall(_ <= 10L), s"overestimate: $sketch")
  }
}
