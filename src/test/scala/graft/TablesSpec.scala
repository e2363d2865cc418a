package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** The events-normalization cache (VERDICT r9 ask #1): a non-Long `ts`
  * fixture is materialized ONCE as Long nanos under the content-keyed cache
  * dir, subsequent loads scan the cached Long column directly, and a
  * regenerated fixture (new mtime/size → new fingerprint) invalidates the
  * old entry. The driver regenerates /root/testdata between rounds and has
  * flipped the physical type twice already — this is the contract that
  * keeps every events query green AND untaxed when it happens again.
  */
class TablesSpec extends SparkSpec {

  private var cacheDir: String = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    cacheDir = tmpDir("graft_events_cache_spec_")
    sys.props("graft.events.cache") = cacheDir
  }

  override def afterAll(): Unit = {
    sys.props.remove("graft.events.cache")
    Tables.clearMemo()
    super.afterAll()
  }

  private def writeNtzFixture(dir: String, micros: Seq[Long]): Unit = {
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampNTZType)))
    val rows = micros.zipWithIndex.map { case (us, i) =>
      Row(i.toLong, java.time.LocalDateTime.ofEpochSecond(
        us / 1000000, ((us % 1000000) * 1000).toInt, java.time.ZoneOffset.UTC))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("NTZ fixture is normalized to Long nanos via a one-time cache entry") {
    Tables.clearMemo()
    val dir = tmpDir("graft_tables_ntz_")
    val micros = Seq(0L, 1500000L, 86400000000L)
    writeNtzFixture(dir, micros)
    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType == LongType)
    val got = df.orderBy("event_id").select("ts").collect().map(_.getLong(0)).toSeq
    assert(got == micros.map(_ * 1000L))
    // exactly one cache entry for this sf dir, and it carries Long physically
    val sfName = Paths.get(dir).getFileName.toString
    val entries = Files.list(Paths.get(cacheDir)).toArray.map(_.toString)
      .filter(_.contains(sfName))
    assert(entries.length == 1)
    val cached = spark.read.parquet(entries.head)
    assert(cached.schema("ts").dataType == LongType)
    // second load resolves without a new entry and reads the cached path
    val again = Tables.load(spark, dir, "events")
    assert(again.queryExecution.executedPlan.toString.contains(cacheDir))
    assert(!again.queryExecution.executedPlan.toString.contains("timestampdiff"))
  }

  test("Long fixture is served from the source with no cache entry") {
    Tables.clearMemo()
    val dir = tmpDir("graft_tables_long_")
    spark.range(5).select(col("id").as("event_id"), (col("id") * 1000).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType == LongType)
    val sfName = Paths.get(dir).getFileName.toString
    val entries = Files.list(Paths.get(cacheDir)).toArray.map(_.toString)
      .filter(_.contains(sfName))
    assert(entries.isEmpty)
  }

  test("regenerated fixture invalidates: new key, stale entry swept") {
    Tables.clearMemo()
    val dir = tmpDir("graft_tables_regen_")
    writeNtzFixture(dir, Seq(1000000L))
    Tables.load(spark, dir, "events").collect()
    val sfName = Paths.get(dir).getFileName.toString
    def entries() = Files.list(Paths.get(cacheDir)).toArray.map(_.toString)
      .filter(_.contains(sfName)).sorted.toSeq
    val first = entries()
    assert(first.length == 1)
    // driver regenerates: same path, different content + mtime
    Thread.sleep(1100) // coarse-mtime filesystems resolve to 1s
    writeNtzFixture(dir, Seq(2000000L, 3000000L))
    Tables.clearMemo() // fresh JVM in real life
    val df = Tables.load(spark, dir, "events")
    assert(df.count() == 2)
    val got = df.orderBy("event_id").select("ts").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2000000000L, 3000000000L))
    val second = entries()
    assert(second.length == 1 && second != first)
  }

  test("normalization is spec-driven: a synthetic second table normalizes too") {
    // the contract generalizes beyond the hardcoded events/ts pair
    // (VERDICT r10 ask #8): declare a rule for another table and the same
    // cache/normalize machinery applies — no code change on the next
    // driver regeneration that flips a different table's physical type
    Tables.clearMemo()
    val dir = tmpDir("graft_tables_spec2_")
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("seen_at", TimestampNTZType)))
    val rows = Seq(0L, 2500000L).zipWithIndex.map { case (us, i) =>
      Row(i.toLong, java.time.LocalDateTime.ofEpochSecond(
        us / 1000000, ((us % 1000000) * 1000).toInt, java.time.ZoneOffset.UTC))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/sightings.parquet")
    val spec = Map("sightings" -> Seq(Tables.longNanos("seen_at")))
    val df = Tables.loadWithSpec(spark, dir, "sightings", spec)
    assert(df.schema("seen_at").dataType == LongType)
    assert(df.orderBy("id").select("seen_at").collect().map(_.getLong(0)).toSeq
      == Seq(0L, 2500000000L))
    // cached once, keyed with the table name
    val sfName = Paths.get(dir).getFileName.toString
    val entries = Files.list(Paths.get(cacheDir)).toArray.map(_.toString)
      .filter(_.contains(sfName))
    assert(entries.length == 1 && entries.head.contains("sightings"))
    // a table with no spec entry is a plain scan
    val plain = Tables.loadWithSpec(spark, dir, "sightings", Map.empty)
    assert(plain.schema("seen_at").dataType == TimestampNTZType)
  }
}
