package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Queries
import graft.core.Session

/** Dev utility: print the executed plan of one registered query —
  * `runMain graft.tools.PlanDump <query> [sfDir]`. Used to audit pushdown /
  * exchange / codegen shape per the 100 TB design bar.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Session.tuned(
      SparkSession.builder().master("local[8]").appName("plan-dump"), 8)
      .getOrCreate()
    try {
      val df = Queries.all(name).fn(spark, dir)
      println(s"[plan] === $name ===")
      println(df.queryExecution.executedPlan.toString)
    } finally spark.stop()
  }
}
