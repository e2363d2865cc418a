package graft.tools
import org.apache.spark.sql.SparkSession

/** Disposable: run the table-maintenance benchline alone. */
object RunMaint {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args.head else "/root/testdata/sf0.1"
    val spark = graft.core.Session.tuned(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("[maint] " + graft.Bench.tableMaintenance(spark, sfDir))
    spark.stop()
  }
}
