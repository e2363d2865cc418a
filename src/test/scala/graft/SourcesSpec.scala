package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Sources

/** File-source quarantine splits: single-pass text + from_json/from_csv,
  * the pattern that avoids Spark's _corrupt_record cache-before-filter trap.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  test("jsonlWithDeadLetter splits parsed rows from garbage lines") {
    val dir = tmpDir("src_jsonl")
    Seq(
      """{"id":1,"name":"a","score":1.5}""",
      """{"id":2,"name":"b","score":2.5}""",
      """not json at all""",
      """{"wrong":"fields"}""", // parses to all-null record → reject
      """   """,
      """{"id":3,"name":null,"score":null}""" // id present → valid
    ).toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val (good, bad) = Sources.jsonlWithDeadLetter(spark, dir, schema)
    val ids = good.select("id").as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 2L, 3L))
    val rejects = bad.select("raw_value").as[String].collect().map(_.trim).toSet
    assert(rejects === Set("not json at all", """{"wrong":"fields"}""", ""))
  }

  test("csvWithDeadLetter rejects by required-field nullness") {
    val dir = tmpDir("src_csv")
    Seq(
      "1,a,1.5",
      "2,b,2.5",
      "garbage-no-commas",
      "x,y,z",       // id untypeable → reject
      "3,c,"         // empty score is a NULL, id fine → valid
    ).toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val (good, bad) = Sources.csvWithDeadLetter(spark, dir, schema, Seq("id"))
    val rows = good.collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).toSet
    assert(rows === Set((1L, "a", Some(1.5)), (2L, "b", Some(2.5)), (3L, "c", None)))
    assert(bad.count() === 2L)
    // misdeclared required column refuses loudly
    intercept[IllegalArgumentException] {
      Sources.csvWithDeadLetter(spark, dir, schema, Seq("nope"))
    }
  }

  test("textFileStream: checkpoint resumes with only NEW files") {
    import graft.cdc.KeyedParquetTable
    import graft.streaming.Ingest
    val base = tmpDir("src_fstream")
    val dataDir = s"$base/in"; val ckpt = s"$base/ckpt"
    def env(id: Int, name: String, price: Int) =
      s"""{"schema":"s","payload":{"id":$id,"name":"$name","description":"d","price":$price,"on_offer":true,"__deleted":"false"}}"""
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dataDir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dataDir/a.jsonl"), env(1, "a", 5) + "\n" + env(2, "b", 5))
    val table = new KeyedParquetTable(spark, s"$base/tbl", Seq("id"))
    table.createIfNotExists(StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("description", StringType), StructField("price", IntegerType),
      StructField("on_offer", BooleanType))))
    val q1 = Ingest.drainAvailableRaw(Sources.textFileStream(spark, dataDir),
      table, Seq(col("price").desc), ckpt)
    q1.awaitTermination()
    assert(table.read().select("id").as[Int].collect().sorted.toSeq === Seq(1, 2))
    // a new file arrives; the resumed stream must consume ONLY it — the
    // old file replaying would overwrite id 2's update below
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dataDir/b.jsonl"), env(2, "b2", 9) + "\n" + env(3, "c", 5))
    val q2 = Ingest.drainAvailableRaw(Sources.textFileStream(spark, dataDir),
      table, Seq(col("price").desc), ckpt)
    q2.awaitTermination()
    val got = table.read().collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got === Map(1 -> "a", 2 -> "b2", 3 -> "c"))
  }

  test("jdbc: partitioned read against EMBEDDED DERBY (the JDBC engine Spark itself ships)") {
    // /opt/spark/jars carries derby + derbytools (Spark's own metastore
    // engine) — S7's JDBC comparison scan is testable against a real
    // database without any external driver jar
    val home = tmpDir("derby_home")
    System.setProperty("derby.system.home", home)
    val url = s"jdbc:derby:$home/testdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        "CREATE TABLE items (id BIGINT NOT NULL, name VARCHAR(32), price DOUBLE)")
      val ins = conn.prepareStatement("INSERT INTO items VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ins.setLong(1, i.toLong); ins.setString(2, s"n$i")
        ins.setDouble(3, i * 1.5); ins.addBatch()
      }
      ins.executeBatch()
    } finally conn.close()
    // partitioned read: 8 ranges over id — the parallel-scan path the
    // helper exists for
    val got = Sources.jdbc(spark, url, "items",
      partitionColumn = Some("id"), numPartitions = 8, bounds = Some((1L, 101L)))
    assert(got.rdd.getNumPartitions === 8)
    assert(got.count() === 100L)
    assert(got.agg(sum(col("price"))).head().getDouble(0) === 1.5 * 5050)
    assert(got.filter(col("id") === 42L).head().getString(1) === "n42")
    // unpartitioned read still works (single task by design)
    assert(Sources.jdbc(spark, url, "items").count() === 100L)
    // half-specified partitioning refuses loudly
    intercept[IllegalArgumentException] {
      Sources.jdbc(spark, url, "items", partitionColumn = Some("id"))
    }
  }

  test("binaryFileStream: glob scoping, checkpoint resume, per-trigger file cap") {
    import org.apache.spark.sql.streaming.Trigger
    val base = tmpDir("src_bstream")
    val dataDir = s"$base/in"; val ckpt = s"$base/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dataDir))
    def land(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dataDir/$name"), bytes)
    land("a.png", graft.ops.Multimodal.makeDecodable(4, 4, "png"))
    land("b.png", graft.ops.Multimodal.makeDecodable(5, 3, "png"))
    land("skip.txt", "not media".getBytes)
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[String])]
    def drain(): Unit = {
      val q = Sources.binaryFileStream(spark, dataDir,
          glob = Some("*.png"), maxFilesPerTrigger = Some(1))
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          seen.synchronized {
            seen += ((id, b.select("path").collect()
              .map(_.getString(0).split('/').last).toSeq.sorted))
          }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000L))
    }
    drain()
    val first = seen.toList
    // glob keeps the .txt out; maxFilesPerTrigger=1 → one file per batch
    assert(first.flatMap(_._2).sorted === List("a.png", "b.png"))
    assert(first.forall(_._2.size == 1), s"file cap violated: $first")
    // resume consumes ONLY the new arrival
    seen.clear()
    land("c.png", graft.ops.Multimodal.makeDecodable(6, 6, "png"))
    drain()
    assert(seen.toList.flatMap(_._2) === List("c.png"))
  }
}
