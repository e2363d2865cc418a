package graft

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cdc.{CdcParse, KeyedParquetTable, Merge}
import graft.ops.Dedup

/** The engine's registered query workload.
  *
  * Each entry maps a SURVEY.md §2 operator (or LLM-pipeline extension) to a
  * DataFrame program over the harness testdata, with — where the semantics are
  * ANSI-SQL-expressible — an equivalent DuckDB oracle for the driver's
  * correctness gate.
  *
  * Cross-engine determinism rules used throughout (the driver hash-compares
  * values):
  *  - raw doubles pass through untouched (bit-identical in both engines);
  *  - computed money/quantity aggregates go through `CAST(SUM(CAST(x AS
  *    DECIMAL(18,2))) AS DOUBLE)` so summation is exact and order-independent
  *    in both engines (a straight SUM(double) is order-dependent and would
  *    flake under shuffle);
  *  - averages are written SUM/COUNT on the decimal-cast value, never
  *    engine-native AVG (whose intermediate types differ across engines);
  *  - every top-k has a total-order tiebreak column.
  */
object Queries {

  final case class Q(
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String],
      /** headline queries are the ones Bench times */
      headline: Boolean = false)

  private def t(name: String)(implicit spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, name)

  // ---------------------------------------------------------------------------
  // CDC slice over `events` — the reference's core pipeline re-expressed.
  // Mapping: entity key = user_id, total order = event_id (monotone with ts),
  // delete marker = event_type 'error' (plays the role of Debezium's
  // `__deleted='true'`, `create_sink_connector.py:76`).
  // ---------------------------------------------------------------------------

  /** Payload schema for the events-as-CDC fixture (cf. CdcModel.payloadSchema). */
  private val eventsPayloadSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("__deleted", StringType)))

  private val eventsEnvelopeSchema = StructType(Seq(
    StructField("schema", StringType),
    StructField("payload", eventsPayloadSchema)))

  /** events → Debezium-style JSON envelope strings (one per row), the shape the
    * Kafka `value` column would carry (`spark_batch.py:118-190`).
    */
  private def eventsAsEnvelopes(events: DataFrame): DataFrame =
    events.select(to_json(struct(
      struct(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        when(col("event_type") === "error", lit("true")).otherwise(lit("false"))
          .as("__deleted")
      ).as("payload"))).as("__raw"))

  /** Envelope JSON → parsed payload + operation column (P1 + P2). */
  private def parsedEvents(events: DataFrame): DataFrame =
    CdcParse.parseEnvelope(eventsAsEnvelopes(events), "__raw", eventsEnvelopeSchema)
      .withColumn("operation",
        CdcParse.classifyOperation(col("__deleted"), col("user_id")))
      .drop("__deleted")

  private val finalStateOracle =
    """SELECT user_id, event_id, event_type, value
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      |      FROM events) t
      |WHERE rn = 1 AND event_type <> 'error'""".stripMargin

  // ---------------------------------------------------------------------------

  val all: Map[String, Q] = Map(

    // ---- CDC pipeline -------------------------------------------------------

    // P1+P2: serialize → from_json parse + validity filter → classifier.
    "cdc_parse_classify" -> Q(
      (s, dir) => {
        implicit val sp: SparkSession = s; implicit val d: String = dir
        parsedEvents(t("events"))
          .select("event_id", "user_id", "event_type", "value", "operation")
      },
      Some("""SELECT event_id, user_id, event_type, value,
             |CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS operation
             |FROM events""".stripMargin),
      headline = true),

    // W1/P4/P5: dedup-to-latest per key with a deterministic total order.
    "cdc_dedup_latest" -> Q(
      (s, dir) => {
        implicit val sp: SparkSession = s; implicit val d: String = dir
        Dedup.dedupLatest(parsedEvents(t("events")), Seq("user_id"), Seq(col("event_id").desc))
          .select("user_id", "event_id", "event_type", "value", "operation")
      },
      Some("""SELECT user_id, event_id, event_type, value,
             |CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS operation
             |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
             |      FROM events) t
             |WHERE rn = 1""".stripMargin),
      headline = true),

    // K4 single-pass form: fold the whole CDC history to final table state.
    "cdc_fold_final_state" -> Q(
      (s, dir) => {
        implicit val sp: SparkSession = s; implicit val d: String = dir
        Merge.foldFinalState(parsedEvents(t("events")), Seq("user_id"),
            Seq(col("event_id").desc))
          .select("user_id", "event_id", "event_type", "value")
      },
      Some(finalStateOracle),
      headline = true),

    // K4 replay form: batch-by-batch MERGE INTO a snapshot-versioned table,
    // exercising create/merge/commit/read (K1, K4, K7, S4). Equivalent to the
    // fold — which is exactly the invariant the oracle checks.
    "cdc_merge_final_state" -> Q(
      (s, dir) => {
        implicit val sp: SparkSession = s; implicit val d: String = dir
        val parsed = parsedEvents(t("events"))
          .select("user_id", "event_id", "event_type", "value", "operation")
        val maxId = parsed.agg(max("event_id")).head.getLong(0)
        val nBatches = 4L
        val tmp = Files.createTempDirectory("graft_merge_").toString
        val table = new KeyedParquetTable(s, tmp, Seq("user_id"))
        table.createIfNotExists(StructType(parsed.schema.filterNot(_.name == "operation")))
        (0L until nBatches).foreach { b =>
          val lo = b * (maxId + 1) / nBatches
          val hi = (b + 1) * (maxId + 1) / nBatches
          val batch = parsed.filter(col("event_id") >= lo && col("event_id") < hi)
          val deduped = Dedup.dedupLatest(batch, Seq("user_id"), Seq(col("event_id").desc))
          table.merge(deduped.select(
            (parsed.columns.filterNot(_ == "operation").map(col) :+ col("operation")): _*))
        }
        table.read().select("user_id", "event_id", "event_type", "value")
      },
      Some(finalStateOracle)),

    // ---- Analytics over the TPC-H-ish tables (A*, W*, O*, J*, P*) ----------

    // A5-style wide aggregate (TPC-H Q1 shape): group-by + exact sums + avg.
    "q1_agg" -> Q(
      (s, dir) => {
        implicit val sp: SparkSession = s; implicit val d: String = dir
        t("lineitem").groupBy("l_returnflag", "l_linestatus").agg(
          expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").as("sum_qty"),
          expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)").as("sum_base_price"),
          expr("CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE)").as("sum_disc_price"),
          expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)").as("avg_qty"),
          count(lit(1)).as("count_order"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
             |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
             |COUNT(*) AS count_order
             |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin),
      headline = true),

    // A2/P7: filtered count + sum over a shipdate range (pushdown-able scan).
    "q_filtered_count" -> Q(
      (s, dir) => {
        implicit val sp: SparkSession = s; implicit val d: String = dir
        t("lineitem")
          .filter(col("l_shipdate") >= lit("2024-03-01") && col("l_shipdate") < lit("2024-07-01"))
          .agg(count(lit(1)).as("n"),
            expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)").as("sum_price"))
      },
      Some("""SELECT COUNT(*) AS n,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '2024-03-01' AND l_shipdate < TIMESTAMP '2024-07-01'""".stripMargin)),

    // A3: distinct count.
    "q_distinct_count" -> Q(
      (s, dir) => {
        implicit val sp: SparkSession = s; implicit val d: String = dir
        t("orders").agg(countDistinct(col("o_custkey")).as("n_custs"))
      },
      Some("SELECT COUNT(DISTINCT o_custkey) AS n_custs FROM orders")),

    // A4: group-by count.
    "q_group_count" -> Q(
      (s, dir) => {
        implicit val sp: SparkSession = s; implicit val d: String = dir
        t("orders").groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      },
      Some("SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY o_orderpriority")),

    // A5: multi-agg min/max/avg per group.
    "q_multi_agg" -> Q(
      (s, dir) => {
        implicit val sp: SparkSession = s; implicit val d: String = dir
        t("customer").groupBy("c_mktsegment").agg(
          min("c_acctbal").as("min_bal"),
          max("c_acctbal").as("max_bal"),
          expr("CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)").as("avg_bal"),
          count(lit(1)).as("n"))
      },
      Some("""SELECT c_mktsegment, MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal,
             |CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal,
             |COUNT(*) AS n
             |FROM customer GROUP BY c_mktsegment""".stripMargin)),

    // O2: top-k with total-order tiebreak → TakeOrderedAndProject.
    "q_topk" -> Q(
      (s, dir) => {
        implicit val sp: SparkSession = s; implicit val d: String = dir
        t("orders").select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(100)
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin),
      headline = true),

    // J-chain: region ⋈ nation ⋈ customer ⋈ orders with broadcast small dims.
    "q_join_agg" -> Q(
      (s, dir) => {
        implicit val sp: SparkSession = s; implicit val d: String = dir
        broadcast(t("region"))
          .join(broadcast(t("nation")), col("r_regionkey") === col("n_regionkey"))
          .join(t("customer"), col("n_nationkey") === col("c_nationkey"))
          .join(t("orders"), col("c_custkey") === col("o_custkey"))
          .groupBy("r_name", "n_name")
          .agg(count(lit(1)).as("n_orders"),
            expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)").as("revenue"))
      },
      Some("""SELECT r_name, n_name, COUNT(*) AS n_orders,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM region
             |JOIN nation ON r_regionkey = n_regionkey
             |JOIN customer ON n_nationkey = c_nationkey
             |JOIN orders ON c_custkey = o_custkey
             |GROUP BY r_name, n_name""".stripMargin),
      headline = true),

    // J3 semi: customers that have at least one order.
    "q_semi_join" -> Q(
      (s, dir) => {
        implicit val sp: SparkSession = s; implicit val d: String = dir
        t("customer").join(t("orders"), col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE c_custkey IN (SELECT o_custkey FROM orders)""".stripMargin)),

    // J3 anti: customers with no orders (sample-consistency building block).
    "q_anti_join" -> Q(
      (s, dir) => {
        implicit val sp: SparkSession = s; implicit val d: String = dir
        t("customer").join(t("orders"), col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""".stripMargin)),

    // V3 shape: deterministic key sample probed via anti join (one join, not
    // N per-key scans like the reference's validation.py:389-410).
    "q_sample_consistency" -> Q(
      (s, dir) => {
        implicit val sp: SparkSession = s; implicit val d: String = dir
        val sample = t("orders").filter(col("o_orderkey") % 101 === 0).select("o_orderkey")
        sample.join(t("lineitem"), col("o_orderkey") === col("l_orderkey"), "left_anti")
      },
      Some("""SELECT o_orderkey FROM orders
             |WHERE o_orderkey % 101 = 0
             |AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)""".stripMargin)),

    // W2: latest value per key as an aggregate (max_by / arg_max).
    "q_latest_by_key" -> Q(
      (s, dir) => {
        implicit val sp: SparkSession = s; implicit val d: String = dir
        Dedup.latestByKey(t("events"), Seq("user_id"), "event_id",
          Seq("event_type", "value"))
      },
      Some("""SELECT user_id, arg_max(event_type, event_id) AS event_type,
             |arg_max(value, event_id) AS value
             |FROM events GROUP BY user_id""".stripMargin)),

    // P9: per-row md5 fingerprint from string/int columns.
    "q_row_fingerprint" -> Q(
      (s, dir) => {
        implicit val sp: SparkSession = s; implicit val d: String = dir
        t("customer").select(col("c_custkey"),
          md5(concat_ws("#", col("c_name"), col("c_nationkey").cast("string"),
            col("c_mktsegment"))).as("fp"))
      },
      Some("""SELECT c_custkey,
             |MD5(CONCAT_WS('#', c_name, CAST(c_nationkey AS VARCHAR), c_mktsegment)) AS fp
             |FROM customer""".stripMargin)),

    // J2 + timestamp arithmetic: order→ship lag per priority (the reference's
    // combined_lag check re-expressed as a real equi-join, validation.py:559-575).
    "q_combined_lag" -> Q(
      (s, dir) => {
        implicit val sp: SparkSession = s; implicit val d: String = dir
        t("orders").join(t("lineitem"), col("o_orderkey") === col("l_orderkey"))
          .withColumn("lag_days",
            datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))
              .cast("long"))
          .groupBy("o_orderpriority")
          .agg(min("lag_days").as("min_lag"), max("lag_days").as("max_lag"),
            expr("CAST(SUM(lag_days) AS DOUBLE) / COUNT(*)").as("avg_lag"),
            count(lit(1)).as("n"))
      },
      Some("""SELECT o_orderpriority, MIN(lag_days) AS min_lag, MAX(lag_days) AS max_lag,
             |CAST(SUM(lag_days) AS DOUBLE) / COUNT(*) AS avg_lag, COUNT(*) AS n
             |FROM (SELECT o_orderpriority,
             |      date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS lag_days
             |      FROM orders JOIN lineitem ON o_orderkey = l_orderkey) t
             |GROUP BY o_orderpriority""".stripMargin),
      headline = true),

    // V7 shape: partition balance — two-level aggregate over a derived
    // partition column (validation.py:780-796).
    "q_partition_balance" -> Q(
      (s, dir) => {
        implicit val sp: SparkSession = s; implicit val d: String = dir
        t("lineitem")
          .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("part"))
          .agg(count(lit(1)).as("cnt"))
          .agg(count(lit(1)).as("n_partitions"),
            min("cnt").as("min_rows"), max("cnt").as("max_rows"),
            expr("CAST(SUM(cnt) AS DOUBLE) / COUNT(*)").as("avg_rows"))
      },
      Some("""SELECT COUNT(*) AS n_partitions, MIN(cnt) AS min_rows, MAX(cnt) AS max_rows,
             |CAST(SUM(cnt) AS DOUBLE) / COUNT(*) AS avg_rows
             |FROM (SELECT strftime(l_shipdate, '%Y-%m') AS part, COUNT(*) AS cnt
             |      FROM lineitem GROUP BY 1) t""".stripMargin)),

    // V1 shape: row counts across tables (union fan-in).
    "q_row_counts" -> Q(
      (s, dir) => {
        implicit val sp: SparkSession = s; implicit val d: String = dir
        Seq("lineitem", "orders", "customer", "events")
          .map(n => t(n).agg(lit(n).as("tbl"), count(lit(1)).as("n")))
          .reduce(_ unionByName _)
      },
      Some("""SELECT 'lineitem' AS tbl, COUNT(*) AS n FROM lineitem
             |UNION ALL SELECT 'orders', COUNT(*) FROM orders
             |UNION ALL SELECT 'customer', COUNT(*) FROM customer
             |UNION ALL SELECT 'events', COUNT(*) FROM events""".stripMargin)),

    // S3/P1 shape: executor-side JSON extraction from the events props column.
    "q_json_extract_agg" -> Q(
      (s, dir) => {
        implicit val sp: SparkSession = s; implicit val d: String = dir
        t("events")
          .withColumn("k",
            from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
              .getField("k"))
          .groupBy("event_type")
          .agg(sum(col("k").cast("long")).as("sum_k"), count(lit(1)).as("n"))
      },
      Some("""SELECT event_type, CAST(SUM(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) AS BIGINT) AS sum_k,
             |COUNT(*) AS n
             |FROM events GROUP BY event_type""".stripMargin)),

    // O2/P7: recent-window top-k (scalar max via broadcast, not collect).
    "q_top_recent" -> Q(
      (s, dir) => {
        implicit val sp: SparkSession = s; implicit val d: String = dir
        // `ts` reads as Long nanos (see Session.tuned); 7 days in nanos below.
        val ev = t("events")
        val maxTs = ev.agg(max("ts").as("max_ts"))
        ev.crossJoin(broadcast(maxTs))
          .filter(col("ts") > col("max_ts") - lit(7L * 86400L * 1000000000L))
          .select("event_id", "user_id", "event_type", "value")
          .orderBy(col("value").desc, col("event_id").asc)
          .limit(100)
      },
      Some("""SELECT event_id, user_id, event_type, value FROM events
             |WHERE ts > (SELECT MAX(ts) - INTERVAL 7 DAY FROM events)
             |ORDER BY value DESC, event_id ASC LIMIT 100""".stripMargin))
  )

  /** Headline queries for Bench. */
  def headlines: Map[String, (SparkSession, String) => DataFrame] =
    all.collect { case (n, q) if q.headline => n -> q.fn }
}
