package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO semantics as a join-based rewrite — the reference's core
  * operator K4 (`/root/reference/src/processor/spark_batch.py:273-280`):
  *
  * {{{
  * MERGE INTO target t USING source s ON t.id = s.id
  * WHEN MATCHED AND s.operation = 'd' THEN DELETE
  * WHEN MATCHED THEN UPDATE SET *
  * WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * No iceberg-spark-runtime jar ships in this environment, so instead of
  * Iceberg's `RewriteMergeIntoTable` we implement the identical algebra
  * directly: the merged state is
  *
  *   (target ANTI JOIN source ON keys)  UNION ALL  (source WHERE op <> 'd')
  *
  * which is exactly what Iceberg's copy-on-write MERGE materializes per
  * touched file. This plan is ONE shuffle on the key (the anti join);
  * the union side reuses the source as-is. At cluster scale the anti join
  * benefits from AQE (broadcast when the batch is small — the common CDC
  * case — else shuffled hash join), and storage-side bucketing on the key
  * would remove the shuffle entirely.
  *
  * Cardinality rule: like Iceberg's merge-cardinality check
  * (`spark_session.py:169`), a source must have one row per key — callers
  * dedup first ([[graft.ops.Dedup.dedupLatest]]).
  */
object Merge {

  /** Apply one CDC batch to a target snapshot, returning the merged snapshot.
    *
    * @param target snapshot rows, schema = final table schema
    * @param source deduped CDC rows; must contain `target`'s columns plus
    *               `opCol`; extra columns are dropped on insert
    * @param keys   merge key columns (the reference uses `id`)
    * @param opCol  operation column; value `"d"` means delete
    */
  def mergeUpsert(target: DataFrame, source: DataFrame, keys: Seq[String],
                  opCol: String = "operation"): DataFrame = {
    require(keys.nonEmpty, "merge requires at least one key column")
    val targetCols = target.columns.toSeq
    val cond = keys.map(k => target(k) <=> source(k)).reduce(_ && _)
    val untouched = target.join(source, cond, "left_anti")
    val upserts = source
      .filter(col(opCol) =!= "d" || col(opCol).isNull)
      .select(targetCols.map(col): _*)
    untouched.unionByName(upserts)
  }

  /** Fold a full CDC history into final table state in one pass: dedup to the
    * latest record per key, drop deletes. Equivalent to replaying
    * `mergeUpsert` batch-by-batch from an empty table, but runs as a single
    * window + filter — the right formulation for bulk backfill/replay.
    */
  def foldFinalState(cdc: DataFrame, keys: Seq[String],
                     ordering: Seq[org.apache.spark.sql.Column],
                     opCol: String = "operation"): DataFrame =
    graft.ops.Dedup.dedupLatest(cdc, keys, ordering)
      // isNull branch: a NULL operation is an upsert (mergeUpsert keeps it),
      // and a bare =!= would three-value it away — breaking the documented
      // equivalence with batch-by-batch replay
      .filter(col(opCol) =!= "d" || col(opCol).isNull)
}
