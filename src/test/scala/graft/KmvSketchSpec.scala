package graft

import org.apache.spark.sql.functions._

import graft.functions.KmvSketch

/** KMV sketch: exactness below capacity, estimate tolerance at capacity,
  * merge associativity (= partial-aggregation safety), and intersection
  * estimation between independent sketches.
  */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private val k = 256

  test("below capacity the sketch is exact") {
    val agg = new KmvSketch(k)
    val df = spark.range(100).select(xxhash64(col("id")).as("h"))
    val sketch = df.agg(agg.column(col("h"))).head().getSeq[Long](0).toArray
    assert(sketch.length === 100)
    assert(KmvSketch.estimate(sketch, k) === 100.0)
  }

  test("duplicates never inflate the sketch") {
    val agg = new KmvSketch(k)
    val df = spark.range(1000).select(xxhash64(col("id") % 50).as("h"))
    val sketch = df.agg(agg.column(col("h"))).head().getSeq[Long](0).toArray
    assert(sketch.length === 50)
    assert(KmvSketch.estimate(sketch, k) === 50.0)
  }

  test("estimate within 10% at 100x capacity; sorted and distinct invariants hold") {
    val agg = new KmvSketch(k)
    val n = 25600
    val df = spark.range(n).select(xxhash64(col("id")).as("h")).repartition(16)
    val sketch = df.agg(agg.column(col("h"))).head().getSeq[Long](0).toArray
    assert(sketch.length === k)
    assert(sketch.toSeq === sketch.sorted.toSeq)
    assert(sketch.distinct.length === sketch.length)
    val est = KmvSketch.estimate(sketch, k)
    assert(math.abs(est - n) / n < 0.10, s"estimate $est vs exact $n")
  }

  test("merge is order-insensitive: sketch(A ++ B) == merge(sketch(A), sketch(B))") {
    val agg = new KmvSketch(k)
    val a = spark.range(0, 5000).select(xxhash64(col("id")).as("h"))
    val b = spark.range(3000, 9000).select(xxhash64(col("id")).as("h"))
    val sa = a.agg(agg.column(col("h"))).head().getSeq[Long](0).toArray
    val sb = b.agg(agg.column(col("h"))).head().getSeq[Long](0).toArray
    val merged = agg.merge(sa, sb)
    val direct = a.union(b).agg(agg.column(col("h"))).head().getSeq[Long](0).toArray
    assert(merged.toSeq === direct.toSeq)
  }

  test("intersection estimate recovers the true overlap within 20%") {
    val agg = new KmvSketch(k)
    // |A|=8000, |B|=8000, overlap=2000 (ids 6000..7999)
    val a = spark.range(0, 8000).select(xxhash64(col("id")).as("h"))
    val b = spark.range(6000, 14000).select(xxhash64(col("id")).as("h"))
    val sa = a.agg(agg.column(col("h"))).head().getSeq[Long](0).toArray
    val sb = b.agg(agg.column(col("h"))).head().getSeq[Long](0).toArray
    val est = KmvSketch.intersectionEstimate(sa, sb, k)
    assert(math.abs(est - 2000.0) / 2000.0 < 0.20, s"intersection estimate $est vs 2000")
    // disjoint sets estimate ~0
    val c = spark.range(100000, 108000).select(xxhash64(col("id")).as("h"))
    val sc = c.agg(agg.column(col("h"))).head().getSeq[Long](0).toArray
    val estDisjoint = KmvSketch.intersectionEstimate(sa, sc, k)
    assert(estDisjoint < 0.02 * 8000, s"disjoint estimate $estDisjoint not near 0")
  }

  test("union and difference estimates complete the set algebra within tolerance") {
    val agg = new KmvSketch(k)
    val a = spark.range(0, 8000).select(xxhash64(col("id")).as("h"))
    val b = spark.range(6000, 14000).select(xxhash64(col("id")).as("h"))
    val sa = a.agg(agg.column(col("h"))).head().getSeq[Long](0).toArray
    val sb = b.agg(agg.column(col("h"))).head().getSeq[Long](0).toArray
    // KMV stderr ≈ 1/√(k-2) ≈ 6.3% at k=256; allow ~2.4σ
    val u = KmvSketch.unionEstimate(sa, sb, k) // true 14000
    assert(math.abs(u - 14000.0) / 14000.0 < 0.15, s"union $u vs 14000")
    val d = KmvSketch.differenceEstimate(sa, sb, k) // true |A\B| = 6000
    assert(math.abs(d - 6000.0) / 6000.0 < 0.20, s"difference $d vs 6000")
  }

  test("small exact sketches intersect exactly") {
    val agg = new KmvSketch(k)
    val a = spark.range(0, 60).select(xxhash64(col("id")).as("h"))
    val b = spark.range(40, 100).select(xxhash64(col("id")).as("h"))
    val sa = a.agg(agg.column(col("h"))).head().getSeq[Long](0).toArray
    val sb = b.agg(agg.column(col("h"))).head().getSeq[Long](0).toArray
    assert(KmvSketch.intersectionEstimate(sa, sb, k) === 20.0)
  }
}
