package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max statistics index — the manifest-stats half of an
  * Iceberg table (its manifests record per-file column bounds; scan
  * planning prunes files whose bounds cannot match). Composes with the
  * write layouts: after [[RangeLayout.writeRangeClustered]] /
  * [[RangeLayout.writeZorderClustered]] the per-file bounds are TIGHT, so
  * a range predicate prunes to the few files that can hold matches — and
  * unlike parquet footer skipping, pruning happens BEFORE any file is
  * opened (no per-file footer round-trip across 100 TB of files).
  *
  * The stats table is O(files) rows — metadata scale, not data scale.
  * Build it once per layout write ([[collect]] is one scan with a
  * map-side-combined aggregate), persist it like any small table, and
  * plan reads through [[readRangePruned]].
  */
object FileStats {

  /** One pass over `path` → one row per file: (file_path, n_rows,
    * mn_<c>/mx_<c> per stats column). Map-side combined on
    * input_file_name, so the shuffle is O(files), not O(rows).
    */
  def collect(spark: SparkSession, path: String, cols: Seq[String]): DataFrame =
    collect(spark, Seq(path), cols)

  /** Multi-path variant — used by incremental maintainers that re-collect
    * stats for only the files/buckets a commit rewrote. Pass `basePath`
    * when the paths are partition directories of one table (multiple
    * `__bucket=k/` dirs holding `p=…/` subdirs would otherwise trip
    * partition inference with CONFLICTING_DIRECTORY_STRUCTURES).
    *
    * `bloom = Some((ks, bits))` adds a `bloom_<ks joined by _>` binary
    * column: one [[KeyBloom]] membership filter per file over
    * `xxhash64(ks…)` — the pruning complement for hash-distributed keys
    * whose min/max ranges never narrow (see [[KeyBloom]] for sizing).
    * Any key arity: the hash folds the tuple exactly like a bucket
    * layout's own hash does, nulls included.
    */
  def collect(spark: SparkSession, paths: Seq[String], cols: Seq[String],
              basePath: Option[String] = None,
              bloom: Option[(Seq[String], Int)] = None,
              sums: Seq[String] = Nil,
              nulls: Seq[String] = Nil): DataFrame = {
    require(cols.nonEmpty || bloom.isDefined || sums.nonEmpty || nulls.nonEmpty,
      "need at least one stats/sum/null column or a bloom spec")
    require(paths.nonEmpty, "need at least one path")
    require(bloom.forall(_._1.nonEmpty), "bloom needs at least one key column")
    // sm_<c>: per-file SUM for numeric columns — the manifest stat Iceberg
    // does not carry (counts and bounds only); lets a table answer SUM from
    // metadata. Non-numeric sum columns fail loudly at analysis here.
    // nl_<c>: per-file NULL count (Iceberg's null_value_counts) — lets a
    // table answer COUNT(col) = Σ n_rows − Σ nl_<c> from metadata.
    val aggs = count(lit(1)).as("n_rows") +:
      (cols.flatMap(c => Seq(min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c"))) ++
        nulls.map(c => count(when(col(c).isNull, true)).as(s"nl_$c")) ++
        sums.map(c => sum(col(c)).as(s"sm_$c")) ++
        bloom.map { case (ks, bits) =>
          KeyBloom.agg(bits)(xxhash64(ks.map(col): _*))
            .as(s"bloom_${ks.mkString("_")}") })
    basePath.fold(spark.read)(b => spark.read.option("basePath", b))
      .parquet(paths: _*)
      .groupBy(input_file_name().as("file_path"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Scan ONLY the files whose [mn, mx] interval on `statsCol` intersects
    * [lo, hi], then apply the exact predicate (stats overlap is a
    * superset). The matching file list is collected to the driver — the
    * same O(matching files) coordinator cost Iceberg's manifest
    * evaluation pays; on a range/z-clustered layout that's the handful of
    * files the predicate actually touches.
    *
    * For FLAT layouts (RangeLayout writes, unpartitioned dirs): the scan
    * is reconstructed from leaf file paths, so directory-encoded partition
    * columns of a partitioned layout would not survive — use the partition
    * column itself (partition pruning) for those, and this index for the
    * in-file columns partitioning can't cover.
    *
    * Collected paths are URI-decoded before the re-read, so spaces and %
    * in table paths are safe; paths containing GLOB metacharacters
    * (`[]{}*?`) remain unsupported (Hadoop path globbing applies to every
    * multi-path read).
    */
  def readRangePruned(spark: SparkSession, path: String, stats: DataFrame,
                      statsCol: String, lo: Any, hi: Any): DataFrame = {
    // input_file_name() yields URI-encoded paths (space → %20, %ature →
    // %25…); decode through Path(URI) before handing them back to the
    // reader, where Hadoop glob expansion would otherwise misresolve
    // paths containing %, spaces, or glob metacharacters
    val files = stats
      .filter(col(s"mx_$statsCol") >= lit(lo) && col(s"mn_$statsCol") <= lit(hi))
      .select("file_path").collect().map(r =>
        new org.apache.hadoop.fs.Path(new java.net.URI(r.getString(0))).toString)
    val scan =
      if (files.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(files.toIndexedSeq: _*)
    scan.filter(col(statsCol) >= lit(lo) && col(statsCol) <= lit(hi))
  }
}
