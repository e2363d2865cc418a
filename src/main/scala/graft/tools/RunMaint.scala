package graft.tools
import org.apache.spark.sql.SparkSession

/** Maintenance runner.
  *
  *   RunMaint                        — the table-maintenance benchline
  *   RunMaint <sfDir>                — same, against another fixture dir
  *   RunMaint --auto <warehouse> <ns> <table>
  *                                   — AUTO-OPTIMIZE one catalog table:
  *     advise ([[graft.validate.Validation.maintenancePlan]]), ACT on the
  *     plan ([[Validation.autoMaintain]]: compact → expire → orphans), then
  *     re-advise and print both plans — the operator sees the advice clear.
  *     The reference schedules exactly this tick (`optimize_iceberg_table`,
  *     spark_batch.py:408-432); here it is a CLI a cron owns.
  */
object RunMaint {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--auto")) {
      require(args.length == 4,
        "usage: RunMaint --auto <warehouse> <namespace> <table>")
      val Array(_, warehouse, ns, table) = args
      val spark = graft.core.Session.tuned(
        SparkSession.builder().master("local[*]")
          .config("spark.sql.catalog.graft.warehouse", warehouse),
        Runtime.getRuntime.availableProcessors()).getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val cat = spark.sessionState.catalogManager.catalog("graft")
        .asInstanceOf[graft.catalog.GraftCatalog]
      val kpt = cat.tableFor(
        org.apache.spark.sql.connector.catalog.Identifier.of(Array(ns), table))
      def render(plan: Seq[(String, String, String)]): String =
        plan.map { case (a, u, r) => s"  [$u] $a — $r" }.mkString("\n")
      val executed = graft.validate.Validation.autoMaintain(kpt)
      println(s"[maint] executed plan:\n${render(executed)}")
      val after = graft.validate.Validation.maintenancePlan(kpt)
      println(s"[maint] plan after acting:\n${render(after)}")
      val unresolved = after.filter(_._2 != "routine")
      if (unresolved.nonEmpty)
        println(s"[maint] WARNING: ${unresolved.size} advice row(s) did not clear")
      spark.stop()
    } else {
      val sfDir = if (args.nonEmpty) args.head else "/root/testdata/sf0.1"
      val spark = graft.core.Session.tuned(
        SparkSession.builder().master("local[32]"), 32).getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      println("[maint] " + graft.Bench.tableMaintenance(spark, sfDir))
      spark.stop()
    }
  }
}
