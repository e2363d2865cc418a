package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Queries
import graft.core.Session

/** Dev utility: time one registered query N times (noop-write action) —
  * `runMain graft.tools.TimeQuery <query> [sfDir] [iters]`.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 3
    val spark = Session.tuned(
      SparkSession.builder().master("local[32]").appName("time-query"), 32)
      .getOrCreate()
    try {
      for (i <- 0 until iters) {
        val t0 = System.nanoTime()
        Queries.all(name).fn(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"[time] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    } finally spark.stop()
  }
}
