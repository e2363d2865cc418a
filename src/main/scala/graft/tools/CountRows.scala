package graft.tools
import org.apache.spark.sql.SparkSession

/** Disposable: print row counts of named registered queries at a given SF. */
object CountRows {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = graft.core.Session.tuned(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { name =>
      println(s"[count] $name = ${graft.Queries.all(name).fn(spark, sfDir).count()}")
    }
    spark.stop()
  }
}
