package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001: the end-to-end CDC slice
    * (serialize → from_json parse → classify → dedup-to-latest → drop
    * deletes), i.e. the reference's core pipeline
    * (/root/reference/src/processor/spark_batch.py:101-280) as one plan.
    */
  def entry(spark: SparkSession): DataFrame = {
    // the harness events table stores TIMESTAMP(NANOS); if the caller's
    // session wasn't built by Session.tuned, set the legacy conf here so the
    // scan resolves (runtime-settable SQLConf)
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    Queries.all("cdc_fold_final_state").fn(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map { case (n, q) => n -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.all.collect { case (n, q) if q.oracle.isDefined => n -> q.oracle.get }
}
