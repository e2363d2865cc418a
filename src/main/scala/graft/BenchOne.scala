package graft
import org.apache.spark.sql.SparkSession

/** Developer harness: time a named subset of the headline queries without
  * paying the full [[Bench]] sweep — `runMain graft.BenchOne q_a q_b`.
  * Same protocol as Bench (noop-format write, warmup pass, min of 3).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchOne <queryName>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Session.tuned(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nRuns = sys.env.get("SPARK_GRAFT_BENCH_RUNS")
      .flatMap(_.trim.toIntOption).getOrElse(3).max(1)
    // job/stage accounting per timed run — the per-batch job COUNT is the
    // constant an incremental maintainer pays, so surface it next to the time
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val t0 = System.nanoTime()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (sys.env.contains("SPARK_GRAFT_BENCH_TRACE")) {
          // job description (set by instrumented phases) beats the stage
          // callsite, which futures obscure behind thread-pool frames
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
          jobStart.put(j.jobId, (System.nanoTime(), desc.getOrElse(
            j.stageInfos.map(_.name.takeWhile(_ != '\n').take(50)).mkString(" | "))))
        }
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        Option(jobStart.remove(j.jobId)).foreach { case (start, name) =>
          System.err.println(f"TRACEJOB id=${j.jobId} at=${(start - t0) / 1e9}%.2f " +
            f"dur=${(System.nanoTime() - start) / 1e9}%.3f $name")
        }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    })
    args.foreach { name =>
      val fn = Queries.all(name).fn
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[warmup] $name: $e") }
      val times = (1 to nRuns).flatMap { _ =>
        val t0 = System.nanoTime()
        jobs.set(0); stages.set(0)
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); None
        }
      }
      println(f"BENCHONE $name min=${times.min}%.3f jobs=${jobs.get} " +
        f"stages=${stages.get} runs=${times.mkString(",")}")
    }
    spark.stop()
  }
}
