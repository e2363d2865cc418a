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

  test("parseMediaHeader: PNG/JPEG/GIF roundtrip recovers planted dimensions") {
    for ((w, h) <- Seq((1, 1), (640, 480), (512, 7), (65535, 1))) {
      assert(Multimodal.parseMediaHeader(Multimodal.makePng(w, h))
        === Some(("image/png", w, h)), s"png $w x $h")
      assert(Multimodal.parseMediaHeader(Multimodal.makeGif(w min 65535, h))
        === Some(("image/gif", w min 65535, h)), s"gif $w x $h")
    }
    // JPEG dims are 16-bit
    for ((w, h) <- Seq((1, 1), (640, 480), (65535, 65535)))
      assert(Multimodal.parseMediaHeader(Multimodal.makeJpeg(w, h))
        === Some(("image/jpeg", w, h)), s"jpeg $w x $h")
    // PNG above 16 bits exercises the 32-bit IHDR fields
    assert(Multimodal.parseMediaHeader(Multimodal.makePng(1 << 20, 3))
      === Some(("image/png", 1 << 20, 3)))
  }

  test("parseMediaHeader: truncated/corrupt/unknown bytes parse as None, never throw") {
    val png = Multimodal.makePng(100, 50)
    val jpg = Multimodal.makeJpeg(100, 50)
    val gif = Multimodal.makeGif(100, 50)
    // truncations at EVERY prefix length: no prefix may throw; prefixes
    // cut before the dimension fields must refuse
    for (b <- Seq(png, jpg, gif); n <- 0 to b.length) {
      val p = Multimodal.parseMediaHeader(b.take(n))
      if (n < 10) assert(p.isEmpty, s"prefix $n parsed as $p")
    }
    // corrupt structure: PNG whose first chunk is not IHDR; JPEG whose
    // marker stream breaks; JPEG reaching EOI without a SOF; junk text
    val notIhdr = png.clone(); notIhdr(12) = 'X'.toByte
    assert(Multimodal.parseMediaHeader(notIhdr).isEmpty)
    val brokenMarker = jpg.clone(); brokenMarker(2) = 0x00.toByte
    assert(Multimodal.parseMediaHeader(brokenMarker).isEmpty)
    assert(Multimodal.parseMediaHeader(
      Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte)).isEmpty)
    assert(Multimodal.parseMediaHeader("just some text".getBytes).isEmpty)
    assert(Multimodal.parseMediaHeader(Array.empty[Byte]).isEmpty)
    assert(Multimodal.parseMediaHeader(null).isEmpty)
    // zero dimensions are out of spec
    assert(Multimodal.parseMediaHeader(Multimodal.makePng(0, 5)).isEmpty)
    assert(Multimodal.parseMediaHeader(Multimodal.makeGif(0, 5)).isEmpty)
  }

  test("decodeHeaders parses good blobs and QUARANTINES bad ones (no throw)") {
    val df = Seq(
      (1L, Multimodal.makePng(320, 200)),
      (2L, Multimodal.makeJpeg(64, 48)),
      (3L, Multimodal.makeGif(12, 34)),
      (4L, Multimodal.makePng(320, 200).take(8)),     // truncated
      (5L, "plain text, no container".getBytes)        // unknown
    ).toDF("doc_id", "media")
    val out = Multimodal.decodeHeaders(df, "doc_id", "media")
      .orderBy("id").collect()
    assert(out.length === 5)
    assert((out(0).getString(1), out(0).getInt(2), out(0).getInt(3))
      === ("image/png", 320, 200))
    assert((out(1).getString(1), out(1).getInt(2), out(1).getInt(3))
      === ("image/jpeg", 64, 48))
    assert((out(2).getString(1), out(2).getInt(2), out(2).getInt(3))
      === ("image/gif", 12, 34))
    Seq(3, 4).foreach { i =>
      assert(out(i).isNullAt(1) && out(i).isNullAt(2) && out(i).isNullAt(3))
      assert(out(i).getString(4).nonEmpty, "quarantine rows carry the error")
    }
    assert(out.take(3).forall(_.isNullAt(4)))
  }

  test("decodeHeaders drops null blobs and null ids instead of failing the job") {
    val df = Seq((Option(1L), Option("x")), (Option(2L), Option.empty[String]),
      (Option.empty[Long], Option("y"))).toDF("doc_id", "text")
    val withBin = Multimodal.attachBinary(df, "text", "text/plain")
    val out = Multimodal.decodeHeaders(withBin, "doc_id", "media").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("decodeHeaders stays inside the Dataset plan (no severed RDD scan)") {
    val withBin = Multimodal.attachBinary(docs, "text", "text/plain")
    val out = Multimodal.decodeHeaders(withBin, "doc_id", "media")
    // a .rdd → createDataFrame round trip would plan as Scan ExistingRDD,
    // cutting column pruning and AQE off from the source
    val plan = out.queryExecution.executedPlan.toString
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

  test("resize: real decode → bilinear rescale → PNG whose re-parsed dims ARE the box") {
    // decodable fixtures in all three containers, different source dims
    val rows = Seq(
      (1L, Multimodal.makeDecodable(40, 30, "png")),
      (2L, Multimodal.makeDecodable(7, 13, "jpg")),
      (3L, Multimodal.makeDecodable(64, 8, "gif"))).toDF("doc_id", "media")
    val got = Multimodal.resize(rows, "doc_id", "media", 16, 12)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Array[Byte]]("media"), r.getString(2), r.get(3), r.get(4),
          r.getString(5)))).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    got.foreach { case (id, (png, mime, w, h, err)) =>
      assert(err == null, s"id=$id unexpectedly quarantined: $err")
      assert(mime === "image/png")
      assert(w === 16 && h === 12, s"id=$id dims ($w,$h)")
      // the emitted dims came from parseMediaHeader over the emitted
      // bytes — re-parse here independently to close the loop
      assert(Multimodal.parseMediaHeader(png) === Some(("image/png", 16, 12)))
      // and the produced PNG is itself ImageIO-decodable at the box size
      val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(back.getWidth === 16 && back.getHeight === 12)
    }
    // determinism: the same raster re-encodes to the same bytes
    val again = Multimodal.resize(rows, "doc_id", "media", 16, 12)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("media")).toMap
    got.foreach { case (id, (png, _, _, _, _)) =>
      assert(java.util.Arrays.equals(png, again(id)), s"id=$id bytes drifted")
    }
  }

  test("resize QUARANTINES undecodable blobs (corrupt, header-only) and keeps good ones") {
    val rows = Seq(
      (1L, Multimodal.makeDecodable(10, 10, "png")),          // good
      (2L, Array[Byte](1, 2, 3, 4)),                          // garbage
      (3L, Multimodal.makeDecodable(10, 10, "jpg").take(8)),  // truncated
      // spec-valid header but NO pixel data — parseMediaHeader reads it,
      // ImageIO cannot decode it: must quarantine, not throw
      (4L, Multimodal.makePng(9, 9))).toDF("doc_id", "media")
    val got = Multimodal.resize(rows, "doc_id", "media", 4, 4)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getAs[Array[Byte]]("media")), Option(r.getString(5))))).toMap
    assert(got(1L)._1.isDefined && got(1L)._2.isEmpty)
    Seq(2L, 3L, 4L).foreach { id =>
      assert(got(id)._1.isEmpty, s"id=$id should carry no payload")
      assert(got(id)._2 === Some("ImageIO could not decode pixel data"),
        s"id=$id wrong quarantine label: ${got(id)._2}")
    }
    // null blobs/ids drop up front (decodeHeaders' discipline)
    val withNulls = rows.withColumn("media",
      when(col("doc_id") === 1L, lit(null).cast("binary")).otherwise(col("media")))
    assert(Multimodal.resize(withNulls, "doc_id", "media", 4, 4).count() === 3)
  }

  test("imageHash64: container re-encode and uniform brightness shift preserve the hash") {
    def hashOf(bytes: Array[Byte]): Long = {
      val r = Multimodal.imageHash64(
        Seq((1L, bytes)).toDF("doc_id", "media"), "doc_id", "media").head()
      assert(r.getString(2) == null, s"unexpected quarantine: ${r.getString(2)}")
      r.getLong(1)
    }
    val g7png = hashOf(Multimodal.makeBlockImage(7L, "png"))
    // lossless re-encode in a different container: SAME raster, same hash
    assert(hashOf(Multimodal.makeBlockImage(7L, "gif")) === g7png)
    // uniform brightness shift: every adjacent-cell ORDER preserved
    assert(hashOf(Multimodal.makeBlockImage(7L, "png", lumaShift = 16)) === g7png)
    // a different group's pattern is FAR away (pseudo-random block ranks)
    val g9png = hashOf(Multimodal.makeBlockImage(9L, "png"))
    assert(java.lang.Long.bitCount(g7png ^ g9png) > 8,
      s"groups 7 and 9 unexpectedly close: ${java.lang.Long.bitCount(g7png ^ g9png)}")
    // EXHAUSTIVE separation over the first 1700 groups (covers every group
    // q_image_neardup plants up to a 5100-doc fixture — sf0.01 is 500):
    // the smallest pairwise Hamming distance must clear the query's radius
    // of 4 with margin — this is what makes the combinatorial oracle sound
    val many = Multimodal.imageHash64(
      spark.range(0, 1700).select(col("id").as("doc_id"))
        .as[Long].mapPartitions(_.map(g =>
          (g, Multimodal.makeBlockImage(g, "png")))).toDF("doc_id", "media"),
      "doc_id", "media")
      .collect().map(r => r.getLong(1))
    val minD = (for {
      i <- many.indices.iterator; j <- (i + 1 until many.length).iterator
    } yield java.lang.Long.bitCount(many(i) ^ many(j))).min
    assert(minD > 6, s"min cross-group Hamming $minD too small for radius 4")
    // undecodable bytes quarantine with a null hash
    val bad = Multimodal.imageHash64(
      Seq((2L, Array[Byte](9, 9, 9))).toDF("doc_id", "media"),
      "doc_id", "media").head()
    assert(bad.isNullAt(1) && bad.getString(2) != null)
  }

  test("imageNearDupPairs ≡ brute-force Hamming pairs (pigeonhole band join is exact)") {
    // hand-built hash set: a tight cluster (distances 0..3), a far point,
    // and a pair exactly AT the radius
    val hs = Seq(
      (1L, 0x0123456789ABCDEFL),
      (2L, 0x0123456789ABCDEFL),              // dist 0 to 1
      (3L, 0x0123456789ABCDECL),              // dist 2 to 1/2
      (4L, 0x0123456789ABCDEFL ^ 0x8421L),    // dist 4 to 1/2 (at radius)
      (5L, 0x7777777777777777L),              // far from everything
      (6L, -1L)).toDF("id", "phash")          // far, sign-bit handling
    val maxH = 4
    val got = Multimodal.imageNearDupPairs(hs, "id", "phash", maxH, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val raw = hs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (ia, ha) <- raw; (ib, hb) <- raw if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= maxH
    } yield (ia, ib, d)).toSet
    assert(got === want)
    assert(want.contains((1L, 4L, 4)), "radius-edge pair must be present")
    // quarantined rows (null hash) never pair
    val withNull = hs.withColumn("phash",
      when(col("id") === 2L, lit(null).cast("long")).otherwise(col("phash")))
    val got2 = Multimodal.imageNearDupPairs(withNull, "id", "phash", maxH)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!got2.exists(p => p._1 == 2L || p._2 == 2L))
    // the pigeonhole contract refuses a radius it cannot guarantee
    intercept[IllegalArgumentException] {
      Multimodal.imageNearDupPairs(hs, "id", "phash", maxHamming = 8, bands = 8)
    }
  }

  test("incremental image phash index ≡ one-shot pairs; unindex ≡ never-indexed; quarantine skips") {
    import graft.cdc.KeyedParquetTable
    // 6 groups × 2 lossless encodings each; candidates: a brightness-
    // shifted member of group 0 (Hamming 0 to both) + a fresh group
    val corpus = (0L until 12L).map(i =>
        (i, Multimodal.makeBlockImage(i / 2, if (i % 2 == 0) "png" else "gif")))
      .toDF("doc_id", "media")
    val bandT = new KeyedParquetTable(spark, tmpDir("phx"),
      Seq("b", "bv", "id"), Nil, 8, Seq("b", "bv"))
    // two batches — the incremental path, not a one-shot rebuild
    Multimodal.indexImageHashes(bandT, corpus.filter(col("doc_id") < 6L),
      "doc_id", "media")
    Multimodal.indexImageHashes(bandT, corpus.filter(col("doc_id") >= 6L),
      "doc_id", "media")
    val candidates = Seq(
      (100L, Multimodal.makeBlockImage(0L, "png", lumaShift = 8)),
      (101L, Multimodal.makeBlockImage(9999L, "png"))).toDF("doc_id", "media")
    val got = Multimodal.checkImageNearDups(bandT, candidates, "doc_id", "media")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // equivalence with the one-shot batch operator restricted to pairs
    // crossing the (corpus, candidate) split
    val oneShot = Multimodal.imageNearDupPairs(
        Multimodal.imageHash64(corpus.unionByName(candidates), "doc_id", "media"),
        "id", "phash", maxHamming = 4, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
      .collect { case ((a, b), h) if a < 100L && b >= 100L => (b, a) -> h
                 case ((a, b), h) if a >= 100L && b < 100L => (a, b) -> h }
      .toMap
    assert(got === oneShot)
    assert(got((100L, 0L)) === 0 && got((100L, 1L)) === 0)
    assert(!got.keys.exists(_._1 == 101L))
    // takedown: removal ≡ never-indexed for the removed id only
    Multimodal.unindexImageHashes(bandT, corpus.filter(col("doc_id") === 0L),
      "doc_id", "media")
    val after = Multimodal.checkImageNearDups(bandT, candidates, "doc_id", "media")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!after.contains((100L, 0L)) && after.contains((100L, 1L)))
    // a quarantined candidate probes nothing (no hash, no bands)
    assert(Multimodal.checkImageNearDups(bandT,
      Seq((200L, Array[Byte](1, 2, 3))).toDF("doc_id", "media"),
      "doc_id", "media").count() === 0)
    // a quarantined corpus blob never lands in the index
    Multimodal.indexImageHashes(bandT,
      Seq((300L, Array[Byte](4, 5, 6))).toDF("doc_id", "media"),
      "doc_id", "media")
    assert(bandT.read().filter(col("id") === 300L).count() === 0)
    // REPLAY idempotency (the crash-between-index-and-checkpoint window of
    // the streaming maintainer): re-indexing a batch merges the same
    // (b, bv, id) keys — state identical, no duplicate band rows
    val stateBefore = bandT.read().collect().toSet
    Multimodal.indexImageHashes(bandT, corpus.filter(col("doc_id") >= 6L),
      "doc_id", "media")
    assert(bandT.read().collect().toSet === stateBefore)
  }
}
