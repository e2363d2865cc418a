package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: dump physical plans of selected queries for scale auditing. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q_filtered_count", "q_join_agg", "q1_agg", "cdc_fold_final_state",
      "q_ann_bruteforce", "q_semi_join", "q_topk")
    val spark = graft.core.Session.tuned(
      SparkSession.builder().master("local[4]"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      Queries.all(n).fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
