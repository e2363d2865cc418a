package graft

import org.apache.spark.sql.functions._

import graft.ops.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace, regex, empty text") {
    val df = Seq(
      ("", 0L, 0L),
      ("one", 1L, 1L),
      ("two words", 2L, 2L),
      ("CAPS and lower x9", 4L, 3L) // regex [a-z]+ misses CAPS, hits 'and','lower','x'...
    ).toDF("text", "ws", "alpha")
    val got = df.select(col("ws"), col("alpha"),
      TextOps.tokenCountWs(col("text")).as("g_ws"),
      TextOps.tokenCountRegex(col("text")).as("g_alpha")).collect()
    got.foreach { r => assert(r.getLong(2) === r.getLong(0)) }
    // regex on "CAPS and lower x9": matches and, lower, x → 3
    assert(got.map(_.getLong(3)).toSeq === Seq(0L, 1L, 2L, 3L))
  }

  test("normalizeText lowercases, collapses non-alnum runs, trims") {
    val df = Seq(
      "  Hello,   WORLD!! 42 ",
      "a--b__c",
      "",
      "ALL CAPS").toDF("t")
    val out = df.select(TextOps.normalizeText(col("t"))).as[String].collect().toSeq
    assert(out === Seq("hello world 42", "a b c", "", "all caps"))
  }

  test("chunkByTokens: windows, stride overlap, short-doc and reassembly invariants") {
    val text = (1 to 10).map(i => s"w$i").mkString(" ")
    val df = Seq(text, "single", "").toDF("t")
    val chunks = df.select(col("t"),
        explode(TextOps.chunkByTokens(col("t"), window = 4, stride = 2)).as("c"))
      .select(col("t"), col("c.chunk_idx"), col("c.chunk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val ten = chunks.filter(_._1 == text).sortBy(_._2).map(_._3).toSeq
    // starts 0,2,4,6,8 → 5 chunks; first is w1..w4, last truncates to w9 w10
    assert(ten === Seq("w1 w2 w3 w4", "w3 w4 w5 w6", "w5 w6 w7 w8",
      "w7 w8 w9 w10", "w9 w10"))
    // stride-2 windows cover every token at least once
    assert((1 to 10).forall(i => ten.exists(_.split(" ").contains(s"w$i"))))
    assert(chunks.filter(_._1 == "single").map(_._3).toSeq === Seq("single"))
    assert(chunks.filter(_._1 == "").map(_._3).toSeq === Seq(""))
  }

  test("langId picks the stopword-dominant language with deterministic ties") {
    val df = Seq(
      ("the cat is of the house and a dog", "en"),
      ("el perro de la casa y los gatos que", "es"),
      ("der hund und die katze ist nicht das", "de"),
      ("le chat et les chiens des maisons une", "fr"),
      ("xyzzy qwerty plugh", "und")
    ).toDF("text", "expected")
    val got = df.select(col("expected"), TextOps.langId(col("text")).as("got")).collect()
    got.foreach(r => assert(r.getString(1) === r.getString(0), r.getString(0)))
  }

  test("qualityScore rewards stopword-rich mid-length clean text") {
    val good = ("the quick brown fox is in the yard and " * 5).trim // stopwords, ~45 tokens
    val junk = "@@@@ #### !!!! %%%% ^^^^ &&&&"
    val df = Seq(good, junk).toDF("text")
    val scores = df.select(TextOps.qualityScore(col("text"))).collect().map(_.getDouble(0))
    assert(scores(0) > 0.7)
    assert(scores(1) < 0.3)
  }

  test("fingerprints: md5 matches reference value, xxhash64 stable across calls") {
    val df = Seq("hello world").toDF("text")
    val r1 = df.select(TextOps.fingerprintMd5(col("text")),
      TextOps.fingerprint64(col("text"))).head()
    assert(r1.getString(0) === "5eb63bbbe01eeed093cb22bb8f5acdc3")
    val r2 = df.select(TextOps.fingerprint64(col("text"))).head()
    assert(r1.getLong(1) === r2.getLong(0))
  }

  test("shingleHashes emits one hash per n-gram") {
    val df = Seq("a b c d e").toDF("text")
    assert(df.select(size(TextOps.shingleHashes(col("text"), 3))).head().getInt(0) === 3)
  }

  test("shingles: string n-grams, empty below n tokens") {
    val df = Seq("a b c d").toDF("text")
    assert(df.select(TextOps.shingles(col("text"), 3)).head().getSeq[String](0)
      === Seq("a b c", "b c d"))
    assert(Seq("a b").toDF("text").select(TextOps.shingles(col("text"), 3))
      .head().getSeq[String](0).isEmpty)
  }

  test("redactPii scrubs emails, IPv4s and phone runs; clean text untouched") {
    val df = Seq(
      "mail bob.smith+x@sub.example.org now",
      "server at 192.168.001.7 port open",
      "call +1 (415) 555-0142 today",
      "version 1.2 of chapter 3 unchanged"
    ).toDF("text")
    val out = df.select(TextOps.redactPii(col("text"))).collect().map(_.getString(0))
    assert(out(0) === "mail <EMAIL> now")
    assert(out(1) === "server at <IP> port open")
    assert(out(2) === "call <PHONE> today")
    assert(out(3) === "version 1.2 of chapter 3 unchanged")
  }

  test("repetition ratios separate template spam from natural text") {
    val spam = ("buy now " * 20).trim            // 40 tokens, 2 distinct
    val natural = "the quick brown fox jumps over one lazy dog near the old barn"
    val df = Seq(spam, natural).toDF("text")
    val rows = df.select(TextOps.dupTokenRatio(col("text")),
      TextOps.dupNgramRatio(col("text"), 3)).collect()
    assert(rows(0).getDouble(0) > 0.9 && rows(0).getDouble(1) > 0.9)
    assert(rows(1).getDouble(0) < 0.1 && rows(1).getDouble(1) === 0.0)
    // degenerate inputs: empty text and sub-n token counts → 0.0
    val edge = Seq("", "a b").toDF("text")
      .select(TextOps.dupTokenRatio(col("text")), TextOps.dupNgramRatio(col("text"), 3))
      .collect()
    edge.foreach { r =>
      assert(r.getDouble(0) === 0.0)
      assert(r.getDouble(1) === 0.0)
    }
  }

  test("extractDomains finds hosts under schemes, www, and bare mentions") {
    val df = Seq(
      "read https://News.Example.org/a?b=1 then www.blog.co.uk and bare cdn-7.site.net here",
      "no domains at all, just words. e.g. v1.2 isn't one"
    ).toDF("text")
    val got = df.select(TextOps.extractDomains(col("text"))).collect()
      .map(_.getSeq[String](0))
    assert(got(0) === Seq("news.example.org", "blog.co.uk", "cdn-7.site.net"))
    assert(got(1).isEmpty)
  }

  test("contaminatedDocs flags exactly the test docs sharing an n-gram with train") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    val test = Seq(
      (10L, "prefix alpha beta gamma delta epsilon suffix"), // shares a 5-gram
      (11L, "totally different content with no overlap at all"),
      (12L, "one two three four five and more")               // shares a 5-gram
    ).toDF("doc_id", "text")
    val got = TextOps.contaminatedDocs(train, test, "doc_id", "text", n = 5)
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(10L, 12L))
  }

  test("contamination screening inside a checkpointed stream of arriving train docs") {
    import graft.cdc.KeyedParquetTable
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val idx = new KeyedParquetTable(spark, tmpDir("shingle_idx_stream"), Seq("g"),
      Nil, bucketCount = 4)
    val cands = Seq(
      (10L, "prefix alpha beta gamma delta epsilon suffix"),
      (12L, "one two three four five and more")).toDF("doc_id", "text")
    val stream = MemoryStream[(Long, String)]
    val checkpoint = tmpDir("shingle_idx_ckpt")
    def drain(): Unit = {
      val q = stream.toDF().toDF("doc_id", "text").writeStream
        .option("checkpointLocation", checkpoint)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          TextOps.indexTrainShingles(idx, b, "doc_id", "text")
          ()
        }.start()
      q.awaitTermination(30000)
    }
    stream.addData((1L, "alpha beta gamma delta epsilon zeta"))
    drain()
    assert(TextOps.checkContamination(idx, cands, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet === Set(10L))
    stream.addData((2L, "one two three four five six"))
    drain()
    assert(TextOps.checkContamination(idx, cands, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet === Set(10L, 12L))
  }

  test("shingle index format marker: unmarked/stale indexes are refused loudly") {
    import graft.cdc.KeyedParquetTable
    // an index persisted under a different hash formulation (here: simply
    // never stamped) would silently return zero overlap — readers must
    // refuse it instead of reporting "no contamination"
    val stale = new KeyedParquetTable(spark, tmpDir("shingle_idx_stale"), Seq("g"),
      Nil, bucketCount = 4)
    stale.createIfNotExists(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("g",
        org.apache.spark.sql.types.LongType))))
    stale.merge(Seq(Tuple1(42L)).toDF("g").withColumn("operation", lit("u")))
    val cands = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException] {
      TextOps.checkContamination(stale, cands, "doc_id", "text")
    }
    assert(e1.getMessage.contains("format"))
    // extending a stale-format index is refused too (a mixed-formulation
    // index would be permanently wrong)
    val e2 = intercept[IllegalArgumentException] {
      TextOps.indexTrainShingles(stale, cands, "doc_id", "text")
    }
    assert(e2.getMessage.contains("format"))
    // a properly built index carries the marker and round-trips
    val fresh = new KeyedParquetTable(spark, tmpDir("shingle_idx_fresh"), Seq("g"),
      Nil, bucketCount = 4)
    TextOps.indexTrainShingles(fresh, cands, "doc_id", "text")
    assert(fresh.properties.contains("graft.shingle_index.format"))
    assert(TextOps.checkContamination(fresh, cands, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet === Set(1L))
  }

  test("packSequences: every doc exactly once, budget respected, deterministic") {
    val rnd = new scala.util.Random(9)
    val docs = (0L until 500L).map(i => (i, (rnd.nextInt(120) + 1).toLong))
      .toDF("doc_id", "n_tok")
    val packed = TextOps.packSequences(docs, "doc_id", "n_tok", budget = 128,
      partitions = 4)
    val rows = packed.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 500 && rows.map(_._1).toSet === (0L until 500L).toSet)
    val byBin = rows.groupBy(_._3)
    assert(byBin.values.forall(_.map(_._2).sum <= 128L))
    // FFD efficiency sanity: well under 2× the ideal bin count
    val ideal = math.ceil(rows.map(_._2).sum / 128.0)
    assert(byBin.size <= 2 * ideal + 4, s"bins=${byBin.size} ideal=$ideal")
    // deterministic across runs
    val again = TextOps.packSequences(docs, "doc_id", "n_tok", 128, partitions = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows.map(r => r._1 -> r._3).toMap === again)
    // an oversized doc gets its own singleton sequence, never dropped
    val over = TextOps.packSequences(
        Seq((1L, 500L), (2L, 10L), (3L, 10L)).toDF("doc_id", "n_tok"),
        "doc_id", "n_tok", budget = 128)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(over.size === 3 && (over(2L) !== over(1L)) && (over(3L) !== over(1L)))
    // NULL token counts fail loudly, not with an opaque encoder NPE
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception] {
      TextOps.packSequences(
        Seq((1L, Some(10L)), (2L, None)).toDF("doc_id", "n_tok"),
        "doc_id", "n_tok", budget = 128).collect()
    }
    assert(msgs(e).exists(_.contains("NULL or non-numeric n_tok")),
      msgs(e).mkString(" | "))
    // a non-numeric STRING id casts to NULL — must hit the same loud guard,
    // not the opaque tuple-encoder NPE (ADVICE r7)
    val e2 = intercept[Exception] {
      TextOps.packSequences(
        Seq(("not-a-number", 10L)).toDF("doc_id", "n_tok"),
        "doc_id", "n_tok", budget = 128).collect()
    }
    assert(msgs(e2).exists(_.contains("NULL or non-numeric doc_id")),
      msgs(e2).mkString(" | "))
  }

  test("token rarity: exact corpus frequencies; unknown tokens maximally rare") {
    val corpus = Seq((1L, "the cat sat"), (2L, "the dog sat")).toDF("doc_id", "text")
    val freq = TextOps.tokenFrequencies(corpus, "text")
    assert(freq.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("the" -> 2L, "cat" -> 1L, "sat" -> 2L, "dog" -> 1L))
    val scores = TextOps.tokenRarityScores(corpus, "doc_id", "text", freq, rareMax = 1L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    // doc 1 = the(2) cat(1) sat(2): mean 5/3, rare(≤1) 1/3
    assert(scores(1L) === ((3L, 5.0 / 3, 1.0 / 3)))
    // scoring a candidate against the TRAINED freq table: an
    // out-of-vocabulary token counts as frequency 0 (maximally rare)
    val cand = Seq((9L, "the zorblatt sat")).toDF("doc_id", "text")
    val s9 = TextOps.tokenRarityScores(cand, "doc_id", "text", freq, rareMax = 1L)
      .collect()(0)
    assert(s9.getLong(1) === 3L)
    assert(s9.getDouble(2) === 4.0 / 3)
    assert(s9.getDouble(3) === 1.0 / 3)
  }

  test("weighted rarity algebra ≡ naive per-occurrence formulation") {
    // the shipped tokenRarityScores pre-aggregates per (doc, token) and
    // folds with multiplicity weights; this pins it bit-identical to the
    // straightforward one-row-per-occurrence formulation on a corpus with
    // repeats, heavy tokens, and empty-ish docs
    val rnd = new scala.util.Random(17)
    val vocab = Vector("the", "cat", "sat", "on", "mat", "zap", "qox")
    val docs = (1L to 50L).map { i =>
      val k = 1 + rnd.nextInt(12)
      (i, Seq.fill(k)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val freq = TextOps.tokenFrequencies(docs, "text")
    val got = TextOps.tokenRarityScores(docs, "doc_id", "text", freq, rareMax = 3L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val naive = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .join(freq, Seq("token"), "left")
      .select(col("doc_id"), coalesce(col("n"), lit(0L)).as("__n"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (sum("__n").cast("double") / count(lit(1))).as("mean_token_freq"),
        (sum(when(col("__n") <= 3L, 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("rare_frac"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got === naive)
  }

  test("boilerplate fraction flags cross-doc template n-grams only") {
    val docs = ((1L to 5L).map(i =>
      (i, s"copyright footer text unique$i alpha$i beta$i")) :+
      ((9L, "totally unrelated words here today now"))).toDF("doc_id", "text")
    val res = TextOps.boilerplateFractions(docs, "doc_id", "text", n = 3, minDf = 4L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // each templated doc: 4 distinct trigrams, exactly one ("copyright
    // footer text") appears in >= 4 docs → 1/4
    (1L to 5L).foreach(i => assert(res(i) === ((4L, 0.25)), s"doc $i: ${res(i)}"))
    // the unrelated doc shares nothing
    assert(res(9L)._2 === 0.0)
  }

  test("incremental shingle index matches the one-shot check as train grows") {
    import graft.cdc.KeyedParquetTable
    val trainA = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val trainB = Seq((2L, "one two three four five six")).toDF("doc_id", "text")
    val cands = Seq(
      (10L, "prefix alpha beta gamma delta epsilon suffix"),
      (11L, "totally different content with no overlap at all"),
      (12L, "one two three four five and more")
    ).toDF("doc_id", "text")
    val idx = new KeyedParquetTable(spark, tmpDir("shingle_idx"), Seq("g"),
      Nil, bucketCount = 4)
    TextOps.indexTrainShingles(idx, trainA, "doc_id", "text")
    // after batch A only doc 10 is contaminated
    assert(TextOps.checkContamination(idx, cands, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet === Set(10L))
    TextOps.indexTrainShingles(idx, trainB, "doc_id", "text")
    // after batch B the incremental result equals the one-shot union check
    val oneShot = TextOps.contaminatedDocs(trainA.union(trainB), cands,
      "doc_id", "text").collect().map(_.getLong(0)).toSet
    assert(TextOps.checkContamination(idx, cands, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet === oneShot)
    assert(oneShot === Set(10L, 12L))
  }

  // ---- stripMarkup ----------------------------------------------------------

  private def strip1(html: String): String =
    Seq(html).toDF("h").select(TextOps.stripMarkup(col("h"))).head().getString(0)

  test("stripMarkup drops script/style/comments wholesale, tags to spaces") {
    assert(strip1("<html><head><title>T</title><style>p { color: red; }</style>" +
      "<script>if (1 < 2) { go(); }</script></head>" +
      "<body><!-- note --><h1>Hello</h1><p>world</p></body></html>")
      === "T Hello world")
    // multi-line block with attributes; (?s) must span the newline
    assert(strip1("before<script type=\"text/javascript\">\nvar a = 1;\n" +
      "var b = 2;\n</script>after") === "before after")
    // adjacent block tags must not fuse words
    assert(strip1("<p>one</p><p>two</p>") === "one two")
  }

  test("stripMarkup decodes entities with &amp; last") {
    assert(strip1("a &lt;tag&gt; &quot;q&quot; &#39;s&#39; b&nbsp;c &amp; d")
      === "a <tag> \"q\" 's' b c & d")
    // double-encoded stays single-decoded: &amp;lt; is the LITERAL "&lt;"
    assert(strip1("x &amp;lt; y") === "x &lt; y")
  }

  test("stripMarkup leaves plain text alone and collapses whitespace") {
    assert(strip1("plain text stays") === "plain text stays")
    assert(strip1("  a\t b\n\nc ") === "a b c")
  }

  // ---- paragraphDedup -------------------------------------------------------

  test("paragraphDedup keeps each paragraph only at its first (doc,pos)") {
    val docs = Seq(
      (1L, "alpha one\nSHARED FOOTER\nbody of one"),
      (2L, "alpha two\nSHARED FOOTER\nbody of two"),
      (3L, "SHARED FOOTER\nbody of three")).toDF("doc_id", "text")
    val res = TextOps.paragraphDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(res(1L) === (("alpha one\nSHARED FOOTER\nbody of one", 3L, 0L)))
    assert(res(2L) === (("alpha two\nbody of two", 2L, 1L)))
    assert(res(3L) === (("body of three", 1L, 1L)))
  }

  test("paragraphDedup dedups within a doc and drops all-duplicate docs") {
    val docs = Seq(
      (1L, "same para\nsame para\nunique tail"),
      (2L, "same para")).toDF("doc_id", "text")
    val res = TextOps.paragraphDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // second occurrence inside doc 1 dropped; doc 2 was pure duplicate
    assert(res === Map(1L -> "same para\nunique tail"))
  }

  test("paragraphDedup treats empty paragraphs as one more distinct paragraph") {
    // trailing separator and blank lines: the empty paragraph is owned by
    // its first occurrence like any other; no crash, exact reassembly
    val docs = Seq(
      (1L, "lead\n\ntail\n"),   // contains two empty paragraphs (middle + trailing)
      (2L, "\nonly body")).toDF("doc_id", "text")
    val res = TextOps.paragraphDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1 keeps lead, first empty, tail; its SECOND empty (trailing) drops
    assert(res(1L) === (("lead\n\ntail", 3L, 1L)))
    // doc 2's leading empty was already owned by doc 1
    assert(res(2L) === (("only body", 1L, 1L)))
  }

  test("paragraphDedup property: equals the naive sequential fold (3 seeds)") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("alpha", "beta", "gamma", "delta", "footer", "nav")
      val docs = (1L to 40L).map { i =>
        val paras = Seq.fill(1 + rnd.nextInt(4))(
          Seq.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
        (i, paras.mkString("\n"))
      }
      // naive reference: walk docs in id order, keep first occurrences
      val seen = scala.collection.mutable.Set[String]()
      val expected = docs.flatMap { case (id, text) =>
        val kept = text.split("\n", -1).filter(p => seen.add(p))
        if (kept.isEmpty) None else Some(id -> kept.mkString("\n"))
      }.toMap
      val got = graft.ops.TextOps.paragraphDedup(
          docs.toDF("doc_id", "text").repartition(7), "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === expected, s"seed=$seed")
    }
  }

  test("paragraphDedup is partitioning-independent (deterministic)") {
    val docs = (1L to 50L).map(i =>
      (i, s"unique lead $i\ncommon boilerplate paragraph\nunique tail ${i % 7}"))
      .toDF("doc_id", "text")
    val a = TextOps.paragraphDedup(docs.repartition(13), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = TextOps.paragraphDedup(docs.coalesce(1), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a === b)
    // boilerplate survives only in doc 1; "unique tail k" only at first doc with that k
    assert(a.contains((1L, "unique lead 1\ncommon boilerplate paragraph\nunique tail 1")))
    assert(a.contains((2L, "unique lead 2\nunique tail 2")))
    assert(a.contains((8L, "unique lead 8")))  // tail 1 already owned by doc 1
  }

  test("unigramSurprisal: exact msb bit costs, unseen-token cap, multiplicity weighting") {
    // reference corpus: "the" x8, "cat" x4, "sat" x2, "rug" x1 → T=15,
    // msb(T)=4; bit costs: the=4-4=0, cat=4-3=1, sat=4-2=2, rug=4-1=3;
    // any token NOT in the reference costs msb(T)=4 (the cap)
    val freq = Seq(("the", 8L), ("cat", 4L), ("sat", 2L), ("rug", 1L))
      .toDF("token", "n")
    val docs = Seq(
      (1L, "the cat sat"),            // 0 + 1 + 2 = 3 bits / 3 tokens
      (2L, "the the zebra"),          // 0 + 0 + 4 = 4 bits / 3 tokens
      (3L, "rug rug rug rug")         // 4 × 3 = 12 bits / 4 tokens (weighted fold)
    ).toDF("doc_id", "text")
    val got = TextOps.unigramSurprisal(docs, "doc_id", "text", freq)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("total_bits"),
          r.getAs[Double]("avg_bits")))).toMap
    assert(got(1L) === ((3L, 3L, 1.0)))
    assert(got(2L) === ((3L, 4L, 4.0 / 3.0)))
    assert(got(3L) === ((4L, 12L, 3.0)))
    // the cap really is one more than the rarest seen token's cost, so the
    // ordering "unseen > seen-once" holds with no smoothing parameter
    assert(got(2L)._2 > 3L)
  }

  test("bpeTrain learns the classic low/lower/newest/widest merges; segment reconciles") {
    // the canonical BPE teaching corpus: low×5 lower×2 newest×6 widest×3.
    // pair counts round 1: (e,s)=9 (s,t)=9 (l,o)=7 (o,w)=7 ... — ties break
    // to the lexicographically smallest pair, so the merge sequence is
    // hand-computable: es, est, lo, low, ew
    val docs = Seq(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
       Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
      .toDF("text")
    val merges = TextOps.bpeTrain(docs, "text", numMerges = 5)
    val got = merges.orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getString(3), r.getLong(4)))
    assert(got === Array((0, "es", 9L), (1, "est", 9L), (2, "lo", 7L),
      (3, "low", 7L), (4, "ew", 6L)))
    // segmentation applies the same fold: the classic result
    val seg = TextOps.bpeSegment(Seq("lowest", "low", "newest", "widest", "lower")
        .toDF("w"), "w", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(seg("lowest") === Seq("low", "est"))
    assert(seg("low") === Seq("low"))
    assert(seg("newest") === Seq("n", "ew", "est"))
    assert(seg("widest") === Seq("w", "i", "d", "est"))
    assert(seg("lower") === Seq("low", "e", "r"))
    // early stop: no pair occurs twice → fewer merges than asked, loudly
    // bounded rather than padding with gain-1 merges
    val tiny = TextOps.bpeTrain(Seq("ab cd").toDF("text"), "text", numMerges = 10)
    assert(tiny.count() === 0L)
    // determinism under partitioning: same corpus, different layout
    val merges2 = TextOps.bpeTrain(docs.repartition(5), "text", numMerges = 5)
    assert(merges2.orderBy("rank").collect().map(_.toSeq).toSeq
      === merges.orderBy("rank").collect().map(_.toSeq).toSeq)
  }

  test("bpeTrain gains are NON-overlapping counts, so runs reconcile exactly") {
    // "aaaa aaaa": overlapping (a,a) adjacencies = 3 per word, but a
    // left-to-right merge applies only twice — the gain must record 2.
    // merge 0: (a,a) gain 4 (2 per word × 2 words) → [aa,aa];
    // merge 1: (aa,aa) gain 2 → [aaaa]; then no pair repeats → stop.
    val docs = Seq("aaaa aaaa").toDF("text")
    val merges = TextOps.bpeTrain(docs, "text", numMerges = 10)
    val got = merges.orderBy("rank")
      .collect().map(r => (r.getString(3), r.getLong(4)))
    assert(got === Array(("aa", 4L), ("aaaa", 2L)))
    // the q_bpe_train invariant on this degenerate corpus:
    // Σ tokens (2) == Σ chars (8) − Σ gains (6)
    val seg = TextOps.bpeSegment(Seq("aaaa").toDF("w"), "w", merges)
      .head().getSeq[String](1)
    assert(seg === Seq("aaaa"))
    // odd run: 'aaa' merges once (non-overlapping), leaving [aa, a]
    val seg3 = TextOps.bpeSegment(Seq("aaa").toDF("w"), "w", merges)
      .head().getSeq[String](1)
    assert(seg3 === Seq("aa", "a"))
  }

  test("bigramSurprisal: hand-computed costs, seen/backoff/cap branches") {
    import graft.ops.TextOps
    // train corpus "a b a b c": uni a:2 b:2 c:1 (T=5, msb=3);
    // bigrams (a,b):2 (b,a):1 (b,c):1; contexts a:2 b:2
    val train = Seq(Tuple1("a b a b c")).toDF("text")
    val uni = TextOps.tokenFrequencies(train, "text")
    val big = TextOps.bigramFrequencies(train, "text")
    assert(big.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet === Set(("a", "b", 2L), ("b", "a", 1L), ("b", "c", 1L)))
    val docs = Seq(
      (1L, "a b c d"), // first 'a'=1; (a,b) seen=0; (b,c) seen=1; (c,d) backoff unseen-uni=3+1-0=4 → 6
      (2L, "z"),       // single unseen token: unigram cap 3, no pairs
      (3L, "b a")      // first 'b'=1; (b,a) seen: msb(2)-msb(1)=1 → 2
    ).toDF("doc_id", "text")
    val got = TextOps.bigramSurprisal(docs, "doc_id", "text", uni, big)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) === ((4L, 6L)))
    assert(got(2L) === ((1L, 3L)))
    assert(got(3L) === ((2L, 2L)))
    // backoff to a SEEN unigram: (c,a) unseen bigram, 'a' seen (n=2):
    // tb+1-msb(2) = 3+1-2 = 2; first 'c' = 3-msb(1) = 2 → total 4
    val got2 = TextOps.bigramSurprisal(Seq((9L, "c a")).toDF("doc_id", "text"),
        "doc_id", "text", uni, big)
      .head()
    assert((got2.getLong(1), got2.getLong(2)) === ((2L, 4L)))
    // empty frequency table refuses
    intercept[IllegalArgumentException] {
      TextOps.bigramSurprisal(docs, "doc_id", "text", uni.limit(0), big)
    }
  }

  test("spanDedup: later copies of duplicated n-token spans excised, first kept") {
    import graft.ops.TextOps
    // doc 1 holds the original passage; doc 2 repeats it mid-text; doc 3
    // repeats it twice (cross-doc AND intra-doc); doc 4 shares nothing;
    // doc 5 is shorter than the window and must pass through unchanged
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "intro words then the quick brown fox jumps over the lazy dog tonight and more"),
      (3L, "x the quick brown fox jumps over the lazy dog y the quick brown fox jumps over the lazy dog z"),
      (4L, "completely different content with no repeated spans at all here"),
      (5L, "too short")).toDF("doc_id", "text")
    val out = TextOps.spanDedup(docs, "doc_id", "text", n = 6)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // doc 1 is the global first occurrence of every window it holds
    assert(out(1L) === (("the quick brown fox jumps over the lazy dog tonight", 0L)))
    // doc 2: the duplicated windows cover "the ... tonight" (10 tokens);
    // its unique prefix/suffix survive
    assert(out(2L) === (("intro words then and more", 10L)))
    // doc 3: both copies of the 9-token passage are later occurrences of
    // doc 1's windows ("...dog" windows; "dog y/z the..." windows are
    // unique) — only the separators survive
    assert(out(3L) === (("x y z", 18L)))
    assert(out(4L) ===
      (("completely different content with no repeated spans at all here", 0L)))
    assert(out(5L) === (("too short", 0L)))
    // determinism under partitioning (the first-occurrence rule is a
    // total order, not an arrival order)
    val out2 = TextOps.spanDedup(docs.repartition(7), "doc_id", "text", n = 6)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out2 === out)
    intercept[IllegalArgumentException] {
      TextOps.spanDedup(docs, "doc_id", "text", n = 1)
    }
  }

  test("spanDedup property: matches an independent brute-force reference on random corpora") {
    import graft.ops.TextOps
    import scala.collection.mutable
    // straight-line reference: enumerate every occurrence, sort, first
    // keeps, later ones mark their interval, coverage by linear scan
    def reference(docs: Seq[(Long, String)], n: Int): Map[Long, (String, Long)] = {
      val toks = docs.map { case (id, t) => id -> t.split(" ", -1) }.toMap
      val occ = mutable.HashMap.empty[String, mutable.ArrayBuffer[(Long, Int)]]
      for ((id, t) <- docs.map(d => d._1 -> toks(d._1));
           p <- 1 to t.length - n + 1) {
        val g = t.slice(p - 1, p - 1 + n).mkString(" ")
        occ.getOrElseUpdate(g, mutable.ArrayBuffer.empty) += ((id, p))
      }
      val removals = mutable.HashMap.empty[Long, mutable.ArrayBuffer[(Int, Int)]]
      occ.values.foreach { os =>
        os.sortBy(identity).drop(1).foreach { case (id, p) =>
          removals.getOrElseUpdate(id, mutable.ArrayBuffer.empty) += ((p, p + n - 1))
        }
      }
      docs.map { case (id, _) =>
        val tk = toks(id)
        val rem = removals.getOrElse(id, mutable.ArrayBuffer.empty)
        val kept = tk.zipWithIndex.collect {
          case (tok, i) if !rem.exists(r => i + 1 >= r._1 && i + 1 <= r._2) => tok
        }
        id -> ((kept.mkString(" "), (tk.length - kept.length).toLong))
      }.toMap
    }
    // tiny alphabet → dense window collisions, runs, whole-doc wipes
    val rnd = new scala.util.Random(9)
    val alphabet = IndexedSeq("a", "b", "c", "d")
    // thresholds route the SAME corpus three ways: default (pure window
    // path), 2 (every token hot → pure two-level path), 5 (mixed: hot
    // tokens split out, the rest stay on the window) — all must match the
    // one reference
    for (trial <- 0 until 4; nWin <- Seq(2, 3);
         thr <- Seq(1000000L, 2L, 5L)) {
      val docs = (0L until 30L).map { id =>
        id -> Seq.fill(3 + rnd.nextInt(15))(alphabet(rnd.nextInt(4))).mkString(" ")
      }
      val got = TextOps.spanDedup(docs.toDF("doc_id", "text"), "doc_id", "text",
          nWin, hotTokenThreshold = thr)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      assert(got === reference(docs, nWin),
        s"trial=$trial n=$nWin thr=$thr docs=${docs.take(5)}...")
    }
  }

  test("spanDedup hot-gram skew: one 6-gram duplicated ~1e5× takes the two-level path") {
    // one boilerplate 6-gram planted 50× in each of 2000 docs (~1e5
    // occurrences of the SAME gram — the single-task-window-sort
    // pathology), surrounded by per-doc-unique noise tokens
    val boiler = "zz0 zz1 zz2 zz3 zz4 zz5"
    val docs = spark.range(0, 2000).select(col("id").as("doc_id"),
      concat_ws(" ",
        concat(lit("u"), col("id"), lit("head")),
        concat_ws(" ", (0 until 50).map(_ => lit(boiler)): _*),
        concat(lit("u"), col("id"), lit("tail"))).as("text"))
    val out = TextOps.spanDedup(docs, "doc_id", "text", n = 6,
      hotTokenThreshold = 1000L)
    // the hardened path is IN the executed plan: the hot/cool split unions
    // two removal branches — the default pure-window plan has no Union
    assert(out.queryExecution.executedPlan.toString.contains("Union"),
      "expected the hot/cool split (Union of removal branches) to be planned")
    val rows = out.collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(rows.size === 2000)
    // doc 0 holds the globally-first occurrence: its first boilerplate
    // copy survives; copies 2..50 are excised. The copies tile back-to-
    // back, so every window inside the repeated run duplicates the run's
    // own first window — removal intervals cover tokens 8..301 of doc 0
    // (the run spans positions 2..301; 2..7 survive).
    assert(rows(0L) === ((s"u0head $boiler u0tail", 294L)))
    // every other doc loses the whole run (300 tokens)
    assert(rows(1L) === (("u1head u1tail", 300L)))
    assert(rows(1999L) === (("u1999head u1999tail", 300L)))
  }

  test("incremental BPE merge loop ≡ the recount loop (the executable spec)") {
    // classic fixture
    val classic = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    assert(TextOps.bpeMergeLoop(classic, 5)
      === TextOps.bpeMergeLoopRecount(classic, 5))
    // deep run on the classic fixture: exhausts every mergeable pair, so
    // the early-stop paths of both loops must also agree
    assert(TextOps.bpeMergeLoop(classic, 100)
      === TextOps.bpeMergeLoopRecount(classic, 100))
    // randomized histogram (seeded): runs, ties, shared prefixes/suffixes
    val rnd = new scala.util.Random(42)
    val alphabet = "abcde"
    val randHist = (0 until 300).map { _ =>
      val len = 1 + rnd.nextInt(10)
      val w = Array.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
      w
    }.groupBy(identity).map { case (w, ws) => (w, ws.size.toLong * (1 + rnd.nextInt(5))) }
      .toArray.sortBy(_._1)
    for (m <- Seq(1, 7, 40, 500))
      assert(TextOps.bpeMergeLoop(randHist, m)
        === TextOps.bpeMergeLoopRecount(randHist, m), s"numMerges=$m")
    // empty histogram: both refuse to invent merges
    assert(TextOps.bpeMergeLoop(Array.empty, 5).isEmpty)
    assert(TextOps.bpeMergeLoopRecount(Array.empty, 5).isEmpty)
  }
}
