package graft

import org.apache.spark.sql.functions._

import graft.ops.LogHistogram

/** Log-scale histogram: exact small region, monotone buckets, bounded
  * relative error, addition-mergeability, quantile accuracy. */
class LogHistogramSpec extends SparkSpec {
  import spark.implicits._

  private val s = 4 // 2^4 = 16 sub-buckets per octave

  test("bucketOf: exact below 2^s, continuous at the seam, monotone after") {
    val vs = (0L to 4096L) ++ Seq(1L << 40, (1L << 40) + 12345L, Long.MaxValue)
    val got = vs.toDF("v")
      .select(col("v"), LogHistogram.bucketOf(col("v"), s).as("b"))
      .orderBy("v").as[(Long, Long)].collect()
    got.takeWhile(_._1 < 16).foreach { case (v, b) => assert(b === v) }
    // monotone non-decreasing over the whole range
    got.sliding(2).foreach { case Array((_, b1), (_, b2)) => assert(b1 <= b2) }
    // every value lands inside its bucket's declared [low, high] range
    got.foreach { case (v, b) =>
      val (lo, hi) = LogHistogram.bucketRange(b, s)
      assert(lo <= v && v <= hi, s"v=$v bucket=$b range=[$lo,$hi]")
    }
  }

  test("bucket width respects the 2^-s relative-error bound; negatives raise") {
    (16L to 4096L by 7).foreach { v =>
      val b = LogHistogram.bucketRange(
        // driver-side recompute via the same integer formula
        {
          val m = 63 - java.lang.Long.numberOfLeadingZeros(v)
          if (v < 16) v else (m - s + 1).toLong * 16 + (v >> (m - s)) - 16
        }, s)
      assert((b._2 - b._1 + 1).toDouble / v <= math.pow(2, -s) + 1e-12)
    }
    val e = intercept[Exception] {
      Seq(-1L).toDF("v").select(LogHistogram.bucketOf(col("v"), s)).collect()
    }
    assert(e.getMessage.contains("negative"))
  }

  test("histograms merge by addition: split-and-sum equals one-shot") {
    val vs = (1L to 5000L).map(i => (i * i * 31 + 7) % 100000L)
    def hist(xs: Seq[Long]) = xs.toDF("v")
      .groupBy(LogHistogram.bucketOf(col("v"), s).as("b"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val (a, b) = vs.splitAt(1700)
    val merged = (hist(a).keySet ++ hist(b).keySet).map(k =>
      k -> (hist(a).getOrElse(k, 0L) + hist(b).getOrElse(k, 0L))).toMap
    assert(merged === hist(vs))
  }

  test("incrementally maintained histogram (IncrementalAgg keyed on the " +
    "bucket) is bit-identical to one-shot; quantiles read off the table") {
    import graft.cdc.KeyedParquetTable
    import graft.streaming.IncrementalAgg
    val vs = (1L to 3000L).map(i => (i * 17 + 3) % 20000L)
    def bucketed(xs: Seq[Long]) = xs.toDF("v")
      .select(LogHistogram.bucketOf(col("v"), s).as("bucket"), col("v"))
    val dir = java.nio.file.Files.createTempDirectory("graft_hist_").toString
    val table = new KeyedParquetTable(spark, dir, Seq("bucket"), Nil, 4)
    // three micro-batches, txn-marked like a foreachBatch maintainer
    vs.grouped(1100).zipWithIndex.foreach { case (chunk, i) =>
      IncrementalAgg.applyBatch(table, bucketed(chunk), "bucket", "v",
        txnId = Some(i.toString))
    }
    val maintained = table.read()
      .select(col("bucket"), col("n_rows"))
      .as[(Long, Long)].collect().toMap
    val oneShot = bucketed(vs).groupBy("bucket").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(maintained === oneShot)
    // quantile read straight off the maintained table
    val est = LogHistogram.quantiles(maintained.toSeq, s, Seq(0.5)).head
    val exact = vs.sorted.apply(math.ceil(0.5 * vs.size).toInt - 1)
    assert(math.abs(est - exact).toDouble / exact <= math.pow(2, -s) + 1e-9)
  }

  test("SketchMaintenance.applyHistogramBatch + readQuantiles round-trip") {
    import graft.cdc.KeyedParquetTable
    import graft.streaming.SketchMaintenance
    val vs = (1L to 4000L).map(i => (i * 7 + 1) % 5000L)
    val dir = java.nio.file.Files.createTempDirectory("graft_histm_").toString
    val table = new KeyedParquetTable(spark, dir, Seq("bucket"), Nil, 4)
    vs.grouped(1500).zipWithIndex.foreach { case (chunk, i) =>
      SketchMaintenance.applyHistogramBatch(table, chunk.toDF("v"), col("v"), s,
        txnId = Some(i.toString))
    }
    val oneShot = vs.toDF("v")
      .groupBy(LogHistogram.bucketOf(col("v"), s).as("b"))
      .agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toSeq
    assert(SketchMaintenance.readQuantiles(table, s, Seq(0.5, 0.9, 0.99))
      === LogHistogram.quantiles(oneShot, s, Seq(0.5, 0.9, 0.99)))
    // absent table → empty
    val none = new KeyedParquetTable(spark,
      java.nio.file.Files.createTempDirectory("graft_histx_").toString, Seq("bucket"))
    assert(SketchMaintenance.readQuantiles(none, s, Seq(0.5)) === Seq.empty)
  }

  test("quantiles from the histogram are within 2^-s of the exact values") {
    // skewed fixture: token-length-like (many short, a long tail)
    val vs = (1L to 20000L).map(i => (math.pow(i.toDouble / 200.0, 2.5) + 1).toLong)
    val hist = vs.toDF("v")
      .groupBy(LogHistogram.bucketOf(col("v"), s).as("b"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toSeq
    val qs = Seq(0.5, 0.9, 0.95, 0.99)
    val est = LogHistogram.quantiles(hist, s, qs)
    val sortedVs = vs.sorted
    qs.zip(est).foreach { case (q, e) =>
      val exact = sortedVs(math.max(0, math.ceil(q * vs.size).toInt - 1))
      assert(math.abs(e - exact).toDouble / exact <= math.pow(2, -s) + 1e-9,
        s"q=$q est=$e exact=$exact")
    }
    // empty histogram → empty estimates
    assert(LogHistogram.quantiles(Nil, s, Seq(0.5)) === Seq.empty)
  }
}
