package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq((0L, "hello world"), (1L, "spark engine")).toDF("doc_id", "text")

  test("attachBinary wraps content with typed metadata") {
    val out = Multimodal.attachBinary(docs, "text", "text/plain")
    val row = out.filter(col("doc_id") === 0)
      .select("media_meta.mime", "media_meta.n_bytes").head()
    assert(row.getString(0) === "text/plain")
    assert(row.getLong(1) === "hello world".getBytes("UTF-8").length.toLong)
  }

  test("metadata projection prunes the binary column at the scan") {
    val out = Multimodal.attachBinary(docs, "text", "text/plain")
      .select("doc_id", "media_meta.n_bytes")
    // binary payload must not appear in the output schema
    assert(!out.schema.fieldNames.contains("media"))
  }

  test("decodeStub emits deterministic fixed-width features per row") {
    val withBin = Multimodal.attachBinary(docs, "text", "text/plain")
    val feats = Multimodal.decodeStub(withBin, "doc_id", "media")
    val rows = feats.orderBy("id").collect()
    assert(rows.length === 2)
    rows.foreach(r => assert(r.getSeq[Float](1).length === 8))
    // determinism: same input → same features
    val again = Multimodal.decodeStub(withBin, "doc_id", "media").orderBy("id").collect()
    assert(rows.map(_.getSeq[Float](1)).toSeq === again.map(_.getSeq[Float](1)).toSeq)
  }

  test("decodeStub drops null blobs and null ids instead of failing the job") {
    val df = Seq((Option(1L), Option("x")), (Option(2L), Option.empty[String]),
      (Option.empty[Long], Option("y"))).toDF("doc_id", "text")
    val withBin = Multimodal.attachBinary(df, "text", "text/plain")
    val feats = Multimodal.decodeStub(withBin, "doc_id", "media").collect()
    assert(feats.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("decodeStub stays inside the Dataset plan (no severed RDD scan)") {
    val withBin = Multimodal.attachBinary(docs, "text", "text/plain")
    val feats = Multimodal.decodeStub(withBin, "doc_id", "media")
    // a .rdd → createDataFrame round trip would plan as Scan ExistingRDD,
    // cutting column pruning and AQE off from the source
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), plan)
    assert(plan.contains("MapPartitions"), plan)
  }

  test("resizeStub truncates/zero-pads every blob to the target budget") {
    val withBin = Multimodal.attachBinary(docs, "text", "text/plain")
    val resized = Multimodal.resizeStub(withBin, "media", "image/thumb", 8)
    val rows = resized.select(col("doc_id"), col("media"),
      col("media_meta.n_bytes"), col("media_meta.mime")).orderBy("doc_id").collect()
    rows.foreach { r =>
      assert(r.getAs[Array[Byte]](1).length === 8)
      assert(r.getLong(2) === 8L)
      assert(r.getString(3) === "image/thumb")
    }
    // truncation preserves the prefix; padding is zero bytes
    val first = rows.head.getAs[Array[Byte]](1)
    assert(new String(first.take(8), "UTF-8") === "hello wo")
  }

  test("frameSample splits a blob into n indexed frames that reassemble") {
    val withBin = Multimodal.attachBinary(docs, "text", "text/plain")
    val frames = Multimodal.frameSample(withBin, "doc_id", "media", 3)
      .filter(col("doc_id") === 0).orderBy("frame_idx").collect()
    assert(frames.length === 3)
    assert(frames.map(_.getInt(1)).toSeq === Seq(0, 1, 2))
    val joined = frames.flatMap(_.getAs[Array[Byte]](2))
    assert(new String(joined, "UTF-8") === "hello world")
  }

  test("chunkFingerprints: window boundaries, short tail, empty blob") {
    def fps(s: String, w: Int): Seq[String] =
      Seq(Tuple1(s)).toDF("t")
        .select(Multimodal.chunkFingerprints(encode(col("t"), "UTF-8"), w))
        .head().getSeq[String](0)
    // 10 bytes / window 4 -> 3 chunks (4+4+2); chunk identity is positional
    assert(fps("abcdefghij", 4).length === 3)
    assert(fps("abcdefghij", 4)(0) === fps("abcdXXXXXX", 4)(0))
    assert(fps("abcdefghij", 4)(0) !== fps("Xbcdefghij", 4)(0))
    // exact multiple: no phantom empty chunk
    assert(fps("abcdefgh", 4).length === 2)
    // the short tail fingerprints the remaining bytes only
    assert(fps("abcdefghij", 4)(2) === fps("abcdefghij", 4).last)
    // empty blob -> empty array, not a descending-sequence crash
    assert(fps("", 4).isEmpty)
  }

  test("binaryDupDegree counts items sharing any aligned chunk") {
    // ids 1,2 share an identical first window; 3 shares nothing; 4 is an
    // exact copy of 1 (shares every chunk — still degree per ITEM, not
    // per chunk)
    val rows = Seq(
      (1L, "HEADERAA" + "body-one"),
      (2L, "HEADERAA" + "body-two"),
      (3L, "DIFFERNT" + "body-thr"),
      (4L, "HEADERAA" + "body-one")).toDF("doc_id", "t")
      .select(col("doc_id"), encode(col("t"), "UTF-8").as("media"))
    val got = Multimodal.binaryDupDegree(rows, "doc_id", "media", window = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) === ((2L, 2L))) // shares with 2 (header) and 4 (all)
    assert(got(2L) === ((2L, 2L)))
    assert(got(3L) === ((2L, 0L)))
    assert(got(4L) === ((2L, 2L)))
  }
}
