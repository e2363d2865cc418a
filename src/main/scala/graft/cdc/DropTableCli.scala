package graft.cdc

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** DROP-TABLE CLI — parity with the reference's standalone delete entry
  * point (`delete_table.py:121-130`: show namespaces, `DROP TABLE ...
  * PURGE`, show namespaces again). Here the namespace is a warehouse
  * directory of [[KeyedParquetTable]] roots and PURGE is [[KeyedParquetTable
  * .drop]] (data + snapshots + pointer removed).
  *
  * Usage: `runMain graft.cdc.DropTableCli <warehouseDir> <tableName>`
  * Prints the table listing before and after, one JSON status line last.
  */
object DropTableCli {

  /** List the warehouse's tables (dirs with a committed `_latest` pointer). */
  def listTables(warehouse: String): Seq[String] = {
    val root = Paths.get(warehouse)
    if (!Files.isDirectory(root)) Nil
    else {
      val s = Files.list(root) // close: Files.list holds an open dir handle
      try s.iterator().asScala
        .filter(p => Files.exists(p.resolve("_latest")))
        .map(_.getFileName.toString).toSeq.sorted
      finally s.close()
    }
  }

  /** Drop-with-purge; returns whether the table existed. */
  def run(spark: SparkSession, warehouse: String, name: String): Boolean = {
    println(s"[drop] tables before: ${listTables(warehouse).mkString(", ")}")
    val table = new KeyedParquetTable(spark, Paths.get(warehouse, name).toString, Nil)
    val existed = table.exists
    if (existed) table.drop()
    println(s"[drop] tables after: ${listTables(warehouse).mkString(", ")}")
    println(s"""{"table":"$name","dropped":$existed,"purged":$existed}""")
    existed
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: DropTableCli <warehouseDir> <tableName>")
    val spark = graft.core.Session.tuned(
      SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val existed = run(spark, args(0), args(1))
    spark.stop()
    if (!existed) sys.exit(1)
  }
}
