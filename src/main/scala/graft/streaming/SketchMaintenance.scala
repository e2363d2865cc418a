package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cdc.KeyedParquetTable
import graft.functions.{HeavyHitters, KmvSketch}

/** Streaming sketch maintenance — the sketch analog of [[IncrementalAgg]]:
  * fold each micro-batch's PARTIAL KMV sketch into a stored sketch row, so
  * "how many distinct X so far" / corpus-overlap questions are answerable at
  * any moment without rescanning history.
  *
  * KMV merge is associative, commutative and duplicate-idempotent, so batch
  * boundaries can NEVER change the maintained sketch — it is bit-identical
  * to the from-scratch sketch over the concatenated stream (asserted in
  * IngestSpec). That also makes replayed batches harmless (at-least-once
  * foreachBatch delivery degrades to exactly-once results).
  *
  * Scale shape, per batch: one distributed partial aggregation over the
  * batch (map-side combined), then an O(k) driver merge of two k-long
  * arrays and a one-row keyed merge — driver data is bounded by k, never by
  * batch or history size.
  */
object SketchMaintenance {

  private val schema = StructType(Seq(
    StructField("sketch_id", StringType),
    StructField("sketch", ArrayType(LongType))))

  /** Merge one batch's 64-bit hash values into the sketch stored under
    * `sketchId` in `table` (a keyed table on sketch_id; created on first
    * use — one row per maintained sketch).
    */
  def applyBatch(table: KeyedParquetTable, batch: DataFrame, hashCol: Column,
                 k: Int, sketchId: String = "default"): Unit = {
    require(table.keys == Seq("sketch_id"),
      s"sketch table must be keyed by sketch_id (got ${table.keys})")
    val kmv = new KmvSketch(k)
    val partial = batch.select(hashCol.as("__h"))
      .agg(kmv.column(col("__h")).as("sketch"))
      .head().getSeq[Long](0)
    if (partial == null || partial.isEmpty) return // empty batch
    val merged = kmv.merge(read(table, sketchId), partial.toArray)
    val spark = table.spark
    import spark.implicits._
    table.createIfNotExists(schema)
    table.merge(Seq((sketchId, merged.toSeq)).toDF("sketch_id", "sketch")
      .withColumn("operation", lit("u")))
  }

  /** The stored sketch (empty array if absent) — feed to
    * [[KmvSketch.estimate]] / [[KmvSketch.intersectionEstimate]].
    */
  def read(table: KeyedParquetTable, sketchId: String = "default"): Array[Long] =
    if (!table.exists) Array.emptyLongArray
    else {
      val rows = table.read().filter(col("sketch_id") === sketchId)
        .select("sketch").collect() // ≤1 row by key uniqueness
      if (rows.isEmpty) Array.emptyLongArray
      else rows.head.getSeq[Long](0).toArray
    }

  private val hhSchema = StructType(Seq(
    StructField("sketch_id", StringType),
    StructField("keys", ArrayType(LongType)),
    StructField("counts", ArrayType(LongType))))

  /** Misra–Gries heavy-hitters maintenance: merge each batch's bounded
    * k-counter sketch into the stored one. MG merges COMPOSE — the error
    * bounds add to N_total/(k+1), so the "every key with true frequency
    * > N/(k+1) is retained" guarantee holds over the whole stream.
    *
    * Unlike KMV, MG counts are NOT replay-idempotent (re-applying a batch
    * inflates counts) — drive this from an exactly-once `foreachBatch`
    * ([[Ingest.start]]'s lineage guard), not an at-least-once sink.
    */
  def applyHeavyHittersBatch(table: KeyedParquetTable, batch: DataFrame,
                             keyCol: Column, k: Int,
                             sketchId: String = "default"): Unit = {
    require(table.keys == Seq("sketch_id"),
      s"sketch table must be keyed by sketch_id (got ${table.keys})")
    val hh = new HeavyHitters(k)
    // NULL keys carry no key and are skipped (documented); a NON-null key
    // that casts to NULL (non-numeric) would silently vanish — raise.
    val asLong = keyCol.cast("long")
    val guarded = when(keyCol.isNotNull && asLong.isNull,
      raise_error(lit("SketchMaintenance: heavy-hitters key does not cast to long")))
      .otherwise(asLong)
    val partial = batch.select(guarded.as("__k"))
      .filter(col("__k").isNotNull)
      .agg(hh.column(col("__k")).as("sketch"))
      .head().getAs[scala.collection.Map[Long, Long]](0)
    if (partial == null || partial.isEmpty) return // empty batch
    val merged = hh.merge(readHeavyHitters(table, sketchId), partial.toMap)
    val sorted = merged.toSeq.sortBy(_._1) // deterministic storage order
    val spark = table.spark
    import spark.implicits._
    table.createIfNotExists(hhSchema)
    table.merge(
      Seq((sketchId, sorted.map(_._1), sorted.map(_._2)))
        .toDF("sketch_id", "keys", "counts")
        .withColumn("operation", lit("u")))
  }

  /** The stored heavy-hitters counters (empty if absent). */
  def readHeavyHitters(table: KeyedParquetTable,
                       sketchId: String = "default"): Map[Long, Long] =
    if (!table.exists) Map.empty
    else {
      val rows = table.read().filter(col("sketch_id") === sketchId)
        .select("keys", "counts").collect() // ≤1 row by key uniqueness
      if (rows.isEmpty) Map.empty
      else rows.head.getSeq[Long](0).zip(rows.head.getSeq[Long](1)).toMap
    }

  /** Log-scale histogram maintenance — the quantile member of the family:
    * fold each batch's [[graft.ops.LogHistogram]] bucket counts (plus the
    * exact value sum per bucket, a free by-product that sharpens in-bucket
    * interpolation) into a bucket-keyed table via
    * [[IncrementalAgg.applyBatch]]. Bucket counts merge by ADDITION, so
    * the maintained histogram is bit-identical to the one-shot histogram
    * over the concatenated stream (LogHistogramSpec); pass `txnId` from
    * foreachBatch for replay safety, same as the aggregate maintainers.
    */
  def applyHistogramBatch(table: KeyedParquetTable, batch: DataFrame,
                          valueCol: Column, subBits: Int,
                          txnId: Option[String] = None): Unit =
    IncrementalAgg.applyBatch(table,
      batch.select(graft.ops.LogHistogram.bucketOf(valueCol, subBits)
        .as("bucket"), valueCol.cast("long").as("__v")),
      "bucket", "__v", txnId)

  /** Quantile estimates straight off a maintained histogram table —
    * O(buckets) driver data, answerable at any moment without rescanning
    * history. Empty/absent table → empty result.
    */
  def readQuantiles(table: KeyedParquetTable, subBits: Int,
                    qs: Seq[Double]): Seq[Long] =
    if (!table.exists) Seq.empty
    else graft.ops.LogHistogram.quantiles(
      table.read().select(col("bucket").cast("long"), col("n_rows"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq, // O(buckets)
      subBits, qs)
}
