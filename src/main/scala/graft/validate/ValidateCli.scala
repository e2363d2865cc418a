package graft.validate

import org.apache.spark.sql.SparkSession

/** Validation CLI — parity with the reference's
  * `python validation.py --check ...` entry point (validation.py:976-1107),
  * over two parquet tables (source of truth vs sink).
  *
  * Usage:
  *   runMain graft.validate.ValidateCli <srcParquet> <sinkParquet> \
  *     <keyCols,comma-sep> [checkCols,comma-sep] [check]
  * where check ∈ row_count | checksum | sample_data | validation_suite
  * (default: validation_suite). Prints one JSON line per check.
  *
  * check = table_health instead treats <srcParquet> as a
  * [[graft.cdc.KeyedParquetTable]] ROOT (keyed by <keyCols>; <sinkParquet>
  * ignored, pass "-") and runs the storage-health trio: tableHealth,
  * morDeleteDebt, retentionOverhead — the scheduled-ops surface (V7).
  */
object ValidateCli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ValidateCli <src> <sink> <keys> [cols] [check]")
    val Array(srcPath, sinkPath, keyArg) = args.take(3)
    val keys = keyArg.split(",").toSeq
    val spark = graft.core.Session.tuned(
      SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // lazy: table_health takes a TABLE ROOT as src (no flat parquet there)
    lazy val src = spark.read.parquet(srcPath)
    lazy val sink = spark.read.parquet(sinkPath)
    lazy val cols = if (args.length >= 4 && args(3).nonEmpty) args(3).split(",").toSeq
      else src.columns.toSeq.intersect(sink.columns.toSeq)
    val which = if (args.length >= 5) args(4) else "validation_suite"

    def run(name: String): Seq[Validation.CheckResult] = name match {
      case "row_count" => Seq(Validation.rowCount(src, sink))
      case "checksum" => Seq(Validation.checksum(src, sink, cols))
      case "sample_data" => Seq(Validation.sampleConsistency(src, sink, keys))
      case "validation_suite" =>
        run("row_count") ++ run("checksum") ++ run("sample_data")
      case "table_health" =>
        val t = new graft.cdc.KeyedParquetTable(spark, srcPath, keys)
        Seq(Validation.tableHealth(t), Validation.morDeleteDebt(t),
          Validation.retentionOverhead(t))
      case "maintenance_plan" =>
        // advisor mode: print the ordered action plan (one JSON line per
        // action, like the checks) and exit 0 — advice is not a failure
        val t = new graft.cdc.KeyedParquetTable(spark, srcPath, keys)
        Validation.maintenancePlan(t).map { case (action, urg, reason) =>
          Validation.CheckResult(s"maintenance:$action", valid = true,
            Map("urgency" -> urg, "reason" -> reason))
        }
      case other => sys.error(s"unknown check: $other")
    }

    val results = run(which)
    // full JSON string escape (control chars included) — the contract is
    // one PARSEABLE line per check
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    results.foreach { r =>
      val fields = Seq(s""""check":${q(r.check)}""", s""""valid":${r.valid}""") ++
        r.details.map { case (k, v) => s"${q(k)}:${q(v)}" }
      println(fields.mkString("{", ",", "}")) // no trailing comma on empty details
    }
    if (which == "validation_suite") {
      val (band, rate, _) = Validation.suite(results)
      println(s"""{"check":"validation_suite","band":${q(band)},"pass_rate":$rate}""")
    }
    spark.stop()
    if (!results.forall(_.valid)) sys.exit(1)
  }
}
