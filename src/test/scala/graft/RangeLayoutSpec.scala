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

  test("z-order clustering concentrates a 2-D box predicate into few files") {
    import graft.ops.RangeLayout
    // 100×100 grid: every (user, t) cell exactly once
    val grid = (for (u <- 0L until 100L; t <- 0L until 100L) yield (u, t, u * 100 + t))
      .toDF("user_id", "t", "payload")
    val zDir = tmpDir("zorder")
    val hashDir = tmpDir("zorder_hash")
    RangeLayout.writeZorderClustered(grid, zDir, numFiles = 25,
      cols = Seq("user_id", "t"))
    grid.repartition(25).write.mode("overwrite").parquet(hashDir) // baseline
    def filesHit(dir: String): Long =
      spark.read.parquet(dir)
        .filter(col("user_id").between(10, 20) && col("t").between(10, 20))
        .select(input_file_name()).distinct().count()
    val zHit = filesHit(zDir)
    val hashHit = filesHit(hashDir)
    // the 1.2%-area box lives in a handful of z-files; the hash layout
    // smears it across essentially every file
    assert(zHit < hashHit, s"z=$zHit hash=$hashHit")
    assert(zHit <= 6, s"z-order box hit $zHit of 25 files")
    // and the clustered copy is byte-complete
    assert(spark.read.parquet(zDir).count() === 10000L)
    assert(spark.read.parquet(zDir).agg(sum("payload")).head.getLong(0) ===
      grid.agg(sum("payload")).head.getLong(0))
  }

  test("hilbert_index is a continuous bijection onto the grid (exhaustive)") {
    // 2-D, 3 bits: all 64 cells. The Hilbert curve's defining property:
    // sorted by index, EVERY consecutive pair of cells is unit-adjacent
    // (Manhattan distance 1) — Morton order fails this at every
    // power-of-two boundary. Bijectivity: indices are exactly 0..63.
    val cells2 = (for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        call_function("hilbert_index", col("x"), col("y"), lit(3)).as("h"))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .sortBy(_._1)
    assert(cells2.map(_._1).toSeq === (0L until 64L))
    cells2.sliding(2).foreach {
      case Array((_, (x1, y1)), (_, (x2, y2))) =>
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L,
          s"jump between ($x1,$y1) and ($x2,$y2)")
      case _ =>
    }
    // 3-D, 2 bits: same properties in higher dimension
    val cells3 = (for (x <- 0L until 4L; y <- 0L until 4L; z <- 0L until 4L)
        yield (x, y, z))
      .toDF("x", "y", "z")
      .select(call_function("hilbert_index",
          col("x"), col("y"), col("z"), lit(2)).as("h"),
        col("x"), col("y"), col("z"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .sortBy(_._1)
    assert(cells3.map(_._1).toSeq === (0L until 64L))
    cells3.sliding(2).foreach {
      case Array((_, (a1, b1, c1)), (_, (a2, b2, c2))) =>
        assert(math.abs(a1 - a2) + math.abs(b1 - b2) + math.abs(c1 - c2) === 1L)
      case _ =>
    }
  }

  test("hilbert clustering concentrates a 2-D box at least as well as z-order") {
    val grid = (for (u <- 0L until 100L; t <- 0L until 100L) yield (u, t, u * 100 + t))
      .toDF("user_id", "t", "payload")
    val hDir = tmpDir("hilbert")
    val zDir = tmpDir("hilbert_vs_z")
    RangeLayout.writeHilbertClustered(grid, hDir, numFiles = 25,
      cols = Seq("user_id", "t"))
    RangeLayout.writeZorderClustered(grid, zDir, numFiles = 25,
      cols = Seq("user_id", "t"))
    def filesHit(dir: String): Long =
      spark.read.parquet(dir)
        .filter(col("user_id").between(10, 20) && col("t").between(10, 20))
        .select(input_file_name()).distinct().count()
    val hHit = filesHit(hDir)
    assert(hHit <= filesHit(zDir), s"hilbert=$hHit z=${filesHit(zDir)}")
    assert(hHit <= 6, s"hilbert box hit $hHit of 25 files")
    // clustered copy is byte-complete
    assert(spark.read.parquet(hDir).count() === 10000L)
    assert(spark.read.parquet(hDir).agg(sum("payload")).head.getLong(0) ===
      grid.agg(sum("payload")).head.getLong(0))
  }

  test("file-stats index prunes a range-clustered scan before any file opens") {
    import graft.ops.{FileStats, RangeLayout}
    val df = (0L until 50000L).map(i => (i, i % 997)).toDF("id", "payload")
    val dir = tmpDir("stats_pruned")
    RangeLayout.writeRangeClustered(df, dir, numFiles = 20, col("id"))
    val stats = FileStats.collect(spark, dir, Seq("id"))
    assert(stats.count() === 20L)
    assert(stats.agg(sum("n_rows")).head.getLong(0) === 50000L)
    val pruned = FileStats.readRangePruned(spark, dir, stats, "id", 1000L, 3000L)
    // exact rows, strict file subset (non-overlapping ranges → ~2 of 20)
    assert(pruned.count() === 2001L)
    assert(pruned.inputFiles.length < 20 && pruned.inputFiles.nonEmpty,
      s"scanned ${pruned.inputFiles.length} of 20 files")
    val exact = df.filter(col("id").between(1000L, 3000L))
      .agg(sum("payload")).head.getLong(0)
    assert(pruned.agg(sum("payload")).head.getLong(0) === exact)
    // empty intersection → empty result, schema preserved, zero data files
    val none = FileStats.readRangePruned(spark, dir, stats, "id", -500L, -1L)
    assert(none.count() === 0L && none.columns.toSeq === Seq("id", "payload"))
  }
}
