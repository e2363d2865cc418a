package graft

/** Regression guard: every registered query must execute and return a
  * well-formed (possibly empty) result at sf0.001. Catches breakage of the
  * driver-facing registry at test time instead of round-verify time.
  */
class QueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  Queries.all.toSeq.sortBy(_._1).foreach { case (name, q) =>
    test(s"registered query $name executes at sf0.001") {
      val df = q.fn(spark, sfDir)
      val n = df.count()
      assert(n >= 0)
      assert(df.columns.nonEmpty)
    }
  }

  test("every oracle entry corresponds to a registered query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("TPC-H join plans: dims broadcast, never a cartesian/nested-loop join") {
    for (name <- Seq("q5_local_supplier_volume", "q7_volume_shipping",
        "q21_waiting_supplier", "q_join_agg", "q17_small_quantity_revenue",
        "q19_disjunctive_revenue", "q10_returned_items", "q14_promo_revenue",
        "q16_supplier_diversity", "q8_market_share")) {
      val plan = Queries.all(name).fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name has a cartesian:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name nested-loops:\n$plan")
      assert(plan.contains("BroadcastHashJoin"), s"$name broadcasts no dim:\n$plan")
    }
  }

  test("q_token_rarity plans a shuffled/broadcast token join, never a cartesian") {
    val plan = Queries.all("q_token_rarity").fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"token rarity cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"token rarity NLJ:\n$plan")
  }

  test("q_source_cap's rank filter pushes into the shuffle as WindowGroupLimit") {
    val plan = Queries.all("q_source_cap").fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"cap rank not pushed:\n$plan")
  }

  test("boilerplate and contamination-report shingle joins are never cartesian") {
    for (name <- Seq("q_boilerplate", "q_contamination_report")) {
      val plan = Queries.all(name).fn(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name cartesian:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name NLJ:\n$plan")
    }
  }

  test("q11's scalar-threshold join broadcasts ONE row, never a cartesian over data") {
    // the global-total threshold rides a one-row BroadcastNestedLoopJoin —
    // that IS the scalar-subquery decorrelation plan (broadcast cost: one
    // row); what must never appear is a cartesian or a non-broadcast NLJ
    val plan = Queries.all("q11_value_concentration").fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"q11 cartesian:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"q11 supplier dim not broadcast:\n$plan")
  }

  test("q6 pushes its whole predicate into the parquet scan") {
    val plan = Queries.all("q6_forecast_revenue").fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(plan.contains(s"IsNotNull($c)") || plan.contains(s"($c"),
        s"$c missing from pushed filters:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull"), s"no pushed filters:\n$plan")
    // projection pruned to exactly the needed columns
    assert(plan.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_shipdate:timestamp"), s"scan reads extra columns:\n$plan")
  }

  test("q13 plans a hash outer join — exclusion predicate never degrades to nested-loop") {
    val plan = Queries.all("q13_customer_distribution").fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"q13 cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"q13 nested-loops:\n$plan")
  }

  test("q_embedding_centroids aggregates with a constant-size buffer (no collect_list)") {
    val plan = Queries.all("q_embedding_centroids").fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"), s"per-group materialization:\n$plan")
    assert(!plan.contains("ObjectHashAggregate"), s"non-codegen agg path:\n$plan")
  }

  test("q_rank_distribution plans no single-partition exchange") {
    val plan = Queries.all("q_rank_distribution").fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"single-task stage:\n$plan")
  }

  test("shuffle/budget/histogram queries plan no single-partition exchange") {
    // shuffleShard's per-shard window, selectByBudget's straddling-bucket
    // window and the histogram groupBy must all partition — the global
    // window forms they replace would plan Exchange SinglePartition
    for (name <- Seq("q_train_shuffle", "q_token_budget", "q_token_length_hist")) {
      val plan = Queries.all(name).fn(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("SinglePartition"), s"$name single-task stage:\n$plan")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("merge-on-read read plan: delete anti-join broadcasts, no cartesian") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_morplan_").toString
    val t = new graft.cdc.KeyedParquetTable(spark, dir, Seq("id"), Nil, 4)
    t.commit(spark.range(1000).select(col("id"), (col("id") % 7).as("v")))
    t.deleteWhere(col("v") === 3)
    val plan = t.read().queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"MoR read cartesian:\n$plan")
    // a batch-bounded delete set must reach the scan as a broadcast hash
    // anti-join (LeftAnti, BuildRight) — a shuffled plan here would tax
    // every read with a full exchange of the DATA side
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"MoR read does not broadcast the delete set:\n$plan")
  }
}
