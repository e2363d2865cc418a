package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
import org.apache.spark.sql.types.StructType

object ScratchView {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Session.tuned(
      SparkSession.builder().master("local[4]"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.scratch")
    spark.sql("DROP TABLE IF EXISTS graft.scratch.vb")
    spark.sql("""CREATE TABLE graft.scratch.vb (id BIGINT, v BIGINT)
                 PARTITIONED BY (bucket(4, id)) TBLPROPERTIES ('graft.keys'='id')""")
    spark.sql("INSERT INTO graft.scratch.vb VALUES (1, 10), (2, 20)")
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.catalog.GraftCatalog]
    val ident = Identifier.of(Array("scratch"), "v_sum")
    if (cat.viewExists(ident)) cat.dropView(ident)
    val df = spark.sql("SELECT SUM(v) AS total FROM graft.scratch.vb")
    cat.createView(new ViewInfo(ident,
      "SELECT SUM(v) AS total FROM graft.scratch.vb",
      "graft", Array("scratch"), df.schema,
      df.schema.fieldNames, Array.empty[String], Array.empty[String],
      java.util.Map.of()))
    try spark.sql("SELECT total FROM graft.scratch.v_sum").show()
    catch { case e: Throwable => println(s"VIEW READ FAILED: ${e.getMessage.take(300)}") }
    spark.stop()
  }
}
