package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, fingerprinting.
  *
  * All of these are pure column expressions (whole-stage-codegen'd, no UDFs),
  * so they run at scan speed and distribute trivially — the design bar is
  * "works unchanged over 100 TB of documents", which means no driver-side
  * loops and no per-row JVM object churn beyond what codegen emits.
  *
  * (Extension surface relative to the reference, which has no text ops; the
  * harness `documents` table is the fixture.)
  */
object TextOps {

  /** Whitespace token count: single-space-delimited text → #tokens.
    * Written as length arithmetic (not `split`) so no array materializes.
    */
  def tokenCountWs(text: Column): Column =
    when(length(text) === 0, lit(0L))
      .otherwise(length(text) - length(regexp_replace(text, " ", "")) + 1L)
      .cast("long")

  /** Regex token count — a BPE-ish lowercase-run tokenizer by default. */
  def tokenCountRegex(text: Column, pattern: String = "[a-z]+"): Column =
    regexp_count(text, lit(pattern)).cast("long")

  /** Distinct whitespace tokens as an array (for set-similarity ops). */
  def tokenSet(text: Column): Column = array_distinct(split(text, " "))

  /** Canonical cleaning normalization (the standard pre-dedup /
    * pre-tokenization stage): lowercase, collapse every non-alphanumeric
    * run to one space, trim. Pure codegen'd column expressions; the regex
    * semantics are identical in DuckDB (with its 'g' flag), so the result
    * is oracle-checkable byte-for-byte.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Sliding token-window chunks — the training-data segmentation stage:
    * whitespace tokens sliced into `window`-token chunks every `stride`
    * tokens (stride < window ⇒ overlap). Returns an array of
    * (chunk_idx, chunk_text) structs to posexplode; all pure column
    * expressions — one pass, no UDF, no shuffle before any downstream agg.
    */
  def chunkByTokens(text: Column, window: Int, stride: Int): Column = {
    require(window >= 1 && stride >= 1, s"window/stride must be >= 1")
    val toks = split(text, " ")
    val starts = sequence(lit(0), size(toks) - 1, lit(stride))
    transform(starts, s =>
      struct((s / stride).cast("long").as("chunk_idx"),
        array_join(slice(toks, s + 1, lit(window)), " ").as("chunk")))
  }

  /** Average token length in characters. */
  def avgTokenLen(text: Column): Column = {
    val nTok = tokenCountWs(text)
    when(nTok === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, " ", "")).cast("double") / nTok)
  }

  /** Stopword hits: occurrences of any of `words` as whole words. */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    regexp_count(text, lit(words.mkString("\\b(", "|", ")\\b"))).cast("long")

  private val EnStop = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Heuristic quality score in [0,1]: stopword ratio + length band +
    * punctuation sanity, the standard cheap pre-filters a training-data
    * pipeline applies before expensive model-based scoring.
    * Deterministic double arithmetic (same expression is mirrored in the
    * DuckDB oracle).
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCountWs(text)
    val stopRatio = when(nTok === 0, lit(0.0))
      .otherwise(stopwordHits(text, EnStop).cast("double") / nTok)
    val lenScore = when(nTok >= 20 && nTok <= 1000, lit(1.0))
      .when(nTok >= 5, lit(0.5)).otherwise(lit(0.0))
    val punctRatio = when(length(text) === 0, lit(0.0))
      .otherwise(regexp_count(text, lit("[^a-zA-Z0-9 ]")).cast("double") / length(text))
    // weights: favor stopword-bearing, mid-length, low-symbol text
    least(lit(1.0), stopRatio * 2.0) * 0.4 + lenScore * 0.4 +
      (lit(1.0) - least(lit(1.0), punctRatio * 5.0)) * 0.2
  }

  /** Stopword tables for the n-gram/stopword language-ID heuristic. */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "en" -> EnStop,
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une"),
    "zh" -> Seq("的", "了", "是", "我", "不"))

  /** Language ID: argmax of per-language stopword hit counts, ties broken by
    * language code ascending, zero hits everywhere → "und" (undetermined).
    * One pass over the text per language (k small, fixed).
    */
  def langId(text: Column): Column = {
    val scores = LangStopwords.map { case (lang, words) =>
      lang -> stopwordHits(text, words)
    }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, s), rest) =>
      when(s === best && best > 0, lit(lang)).otherwise(rest)
    }
  }

  /** Stable 128-bit content fingerprint (hex) — exact-dedup key. */
  def fingerprintMd5(text: Column): Column = md5(text)

  /** 64-bit fingerprint as a signed long (cheap join/sort key at scale). */
  def fingerprint64(text: Column): Column = xxhash64(text)

  /** Rolling n-gram fingerprints: hash of every n-token shingle. The
    * classic "rolling hash document fingerprint" — downstream ops take
    * `array_min` (winnowing-lite) or feed MinHash.
    *
    * HOF reference formulation (hashes shingle STRINGS — oracle-legible).
    * Hot paths (decontamination, MinHash, fingerprint joins) use the native
    * one-pass `shingle_hashes` kernel
    * ([[graft.functions.MinHashExpressions]]) instead; this stays for
    * winnowing-style uses where the string-hash formulation is the spec.
    */
  def shingleHashes(text: Column, n: Int = 3): Column =
    transform(shingles(text, n), g => xxhash64(g))

  /** Winnowed fingerprint: min shingle hash (deterministic, order-free). */
  def winnowFingerprint(text: Column, n: Int = 3): Column =
    array_min(shingleHashes(text, n))

  /** n-token shingles as STRINGS (empty array when the text is shorter than
    * n tokens — no descending-sequence artifacts). String form exists so
    * semantics are oracle-checkable; production joins use the hashed form.
    */
  def shingles(text: Column, n: Int): Column = {
    require(n >= 1, s"shingle width must be >= 1, got $n")
    val toks = split(text, " ")
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
  }

  // ---- PII redaction ------------------------------------------------------

  /** Redact emails, IPv4 addresses and phone-number-shaped digit runs with
    * typed placeholder tokens — the standard scrubbing pass before text
    * enters a training corpus. Patterns avoid lookarounds so the same regex
    * semantics hold in Java regex and RE2-style engines (oracle-checkable).
    * Order matters: emails first (contain digits), then IPs (contain dots),
    * then the greedy phone pattern.
    */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\+?[0-9][0-9() \\-]{6,}[0-9]", "<PHONE>")
  }

  /** Strip HTML/XML markup down to running text — the extraction stage a
    * web-crawl corpus runs before any quality/dedup work. Non-content
    * blocks (script/style/comments) are dropped wholesale, remaining tags
    * become spaces (so `a</p><p>b` doesn't fuse into `ab`), the common
    * entities decode, and whitespace collapses to single spaces.
    *
    * Pure codegen'd column ops. Patterns use inline `(?s)`/`(?i)` and
    * non-greedy `.*?` only — semantics identical under Java regex and
    * RE2-style engines, so the result is oracle-checkable byte-for-byte.
    * `&amp;` decodes LAST: `&amp;lt;` must end as the literal `&lt;`, not
    * re-decode to `<`.
    */
  def stripMarkup(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, v)) => replace(c, lit(e), lit(v)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Corpus-wide exact paragraph dedup (the Dolma/CCNet paragraph stage):
    * split every doc on `sep`, keep each distinct paragraph ONLY at its
    * first occurrence in the corpus order `(doc, position)` — repeated
    * boilerplate (footers, nav text, license blurbs) vanishes from every
    * doc but the first — then reassemble docs from their surviving
    * paragraphs in original order. Docs whose every paragraph was seen
    * earlier drop out entirely (they were pure boilerplate).
    *
    * Shape: posexplode → one hash-shuffle groupBy on paragraph text (the
    * exact-dedup shape; at 100 TB group on a hash of the paragraph to keep
    * shuffle rows narrow) → struct-equality keeper filter → one groupBy on
    * doc id to reassemble (array_sort on (pos, para) makes the
    * collect_list order-independent). No windows over the whole corpus, no
    * driver data, two shuffles total.
    *
    * Returns (idCol, textCol, n_paras_kept, n_paras_dropped).
    */
  def paragraphDedup(docs: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String, sep: String = "\n"): org.apache.spark.sql.DataFrame = {
    val paras = docs.select(col(idCol).as("__id"),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("__pos", "__para")))
    // first occurrence per distinct paragraph = lexicographic min of
    // (doc id, position) — one agg, no window
    val keepers = paras.groupBy("__para")
      .agg(min(struct(col("__id"), col("__pos"))).as("__keep"))
    paras.join(keepers, Seq("__para"))
      .withColumn("__kept", struct(col("__id"), col("__pos")) === col("__keep"))
      .groupBy(col("__id").as(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(when(col("__kept"),
              struct(col("__pos"), col("__para"))))),
            s => s("__para")),
          sep).as(textCol),
        sum(when(col("__kept"), 1L).otherwise(0L)).as("n_paras_kept"),
        sum(when(col("__kept"), 0L).otherwise(1L)).as("n_paras_dropped"))
      .where(col("n_paras_kept") > 0)
  }

  /** EXACT duplicated-SPAN removal across the corpus — the substring-level
    * dedup of Lee et al., "Deduplicating Training Data Makes Language
    * Models Better" (suffix-array dedup), at n-token-window granularity:
    * every n-token window that occurs more than once ANYWHERE in the
    * corpus (across documents or repeated inside one) keeps only its
    * globally-first occurrence (lexicographic min of (doc id, position) —
    * total order, deterministic); every later occurrence's token range is
    * removed. A duplicated run of length L ≥ n yields L−n+1 duplicated
    * windows whose union covers the whole run, so later copies of long
    * shared passages are excised wholesale while the first copy survives
    * intact — the span-level behavior paragraph-aligned dedup
    * ([[paragraphDedup]]) cannot reach (it needs the duplication to land
    * on separator boundaries).
    *
    * Scale shape: one posexplode to (doc, pos, window) — Σ tokens rows,
    * the standard shingle shuffle; one map-side-combined groupBy(window)
    * keeping min(first) and count (windows occurring once drop out
    * BEFORE the join back); one equi-join on the window (never
    * all-pairs); removal-interval coverage evaluates per-document in pure
    * HOF column expressions (no extra shuffle past the per-doc span
    * collect). Windows are 64-bit shingle HASHES from the native
    * `shingle_hashes` kernel (r17 — the swap the r15 version left marked
    * as the hot path), exactly as [[contaminatedDocs]] documents; the
    * oracle ranks the gram STRINGS, so the green hash row is the proof
    * the hashed ranking computes the same removal set.
    *
    * Returns (idCol, text_dedup, n_tokens_removed); documents shorter
    * than n tokens pass through unchanged.
    *
    * GUARANTEE (r17 contract change, ADVICE r17): removal is
    * probabilistically exact, not bit-exact — windows are identified by
    * 64-bit hash, so a corpus-wide hash collision (probability
    * ~Σgrams²/2⁶⁵; for 10¹² grams, ~3×10⁻⁸ per corpus) would remove one
    * extra window occurrence. Callers needing certified-exact span dedup
    * should verify survivors against the gram strings; every other
    * shingle consumer in this engine accepts the same bound.
    *
    * Hot-gram skew guard: the fast ranking plan — ONE `row_number` window
    * over the gram — routes every occurrence of one gram to one task and
    * sorts it there, which a mass-boilerplate gram (one n-gram occurring
    * 10⁸ times at 100× scale) turns into a single-task straggler. The
    * guard is an EXACT upper bound that costs one cheap token-count pass:
    * a gram occurring c times forces its FIRST TOKEN to occur ≥ c times,
    * and token counts are map-side-combinable (hot tokens flatten before
    * their tiny shuffle). When no token reaches `hotTokenThreshold`, no
    * gram can either, and the measured-fast window plan is provably safe
    * and runs unchanged. Otherwise grams split by first token: cool grams
    * (occurrence count < threshold, by the bound) keep the window; hot
    * grams take the skew-safe two-level plan — map-side-combined
    * `groupBy(gram).agg(min(first), count)` (hot keys flatten BEFORE the
    * shuffle), singletons drop, and a join back marks non-first
    * occurrences by PROBE (hash lookup, no per-gram sort; the
    * duplicated-hot-gram side is tiny — broadcast — and a shuffled probe
    * is AQE-skew-splittable, which a window sort never is). The two-level
    * plan is not the default because it was A/B-measured slower on clean
    * corpora (r15: 1.38 vs 0.80 joining all grams; r16 re-measure with the
    * count>1 filter: 1.67 vs 0.80 BenchOne — the distinct-gram shuffle +
    * second explode dominate), so clean data pays only the token count.
    * The hot-token set is broadcast (≤ Σ tokens / threshold rows — a few
    * thousand under any Zipfian corpus); size the threshold so that bound
    * stays broadcastable at the target corpus.
    */
  def spanDedup(docs: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String, n: Int,
                hotTokenThreshold: Long = 1000000L): org.apache.spark.sql.DataFrame = {
    require(n >= 2, s"span window must be >= 2 tokens, got $n")
    require(hotTokenThreshold >= 2,
      s"hotTokenThreshold must be >= 2, got $hotTokenThreshold")
    // __th: one 64-bit hash PER TOKEN in positional order; __gh: one 64-bit
    // hash PER n-GRAM in positional order — both from the native one-pass
    // kernel (tokenHashes splits on " " with limit -1 — exactly
    // split(text, " "), so hash positions align with __toks positions).
    // Grams rank by their 64-BIT HASH, not the joined string (r17): no
    // per-gram array_join/slice string construction, and the ranking
    // shuffle carries 8-byte keys instead of n-token strings — the same
    // hashed-shingle-equals-string-semantics discipline every other
    // shingle consumer uses ([[contaminatedDocs]], jaccardVerify), with
    // the same negligible-collision bound (a corpus-wide 64-bit collision
    // would remove one extra occurrence; ~Σgrams²/2⁶⁵).
    // Requires GraftExtensions on the session, like every shingle consumer.
    val toks = docs.select(col(idCol), split(col(textCol), " ").as("__toks"),
      call_function("shingle_hashes", col(textCol), lit(1)).as("__th"),
      call_function("shingle_hashes", col(textCol), lit(n)).as("__gh"))
    val grams = toks.select(col(idCol).as("__id"),
        posexplode(col("__gh")).as(Seq("__i", "__g")),
        col("__th"))
      .select(col("__id"), (col("__i") + 1).as("__pos"), col("__g"),
        // the gram's first-token HASH — the skew-routing key (the gram at
        // 1-based position __i+1 starts at token __i+1)
        element_at(col("__th"), col("__i") + 1).as("__t1"))
    // the exact skew bound: count(gram) <= count(first token of gram)
    // <= count(first token's HASH BUCKET) — counting hashed tokens keeps
    // the no-false-negative guarantee (a collision only ADDS to a bucket,
    // strengthening the upper bound; the rare false positive just routes
    // extra grams through the skew-safe plan, which is always correct),
    // the detection shuffle carries 8-byte keys, and the hashing itself is
    // the codegen'd kernel's single pass — no string token explode at all
    val hotTokens = toks
      .select(explode(col("__th")).as("__t"))
      .groupBy("__t").agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= hotTokenThreshold)
      .select("__t")
    // driver-side switch on ONE number; the hot-token set itself is never
    // collected (Σ tokens / threshold rows — broadcast-joined, not isin'd)
    val anyHot = !hotTokens.isEmpty
    def windowRemovals(g: org.apache.spark.sql.DataFrame) = g
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("__g")
          .orderBy(col("__id"), col("__pos"))))
      .filter(col("__rn") > 1)
      .select("__id", "__pos")
    val removalRows =
      if (!anyHot) windowRemovals(grams)
      else {
        val hot = broadcast(hotTokens)
        val coolGrams = grams.join(hot, grams("__t1") === hot("__t"), "left_anti")
        val hotGrams = grams.join(hot, grams("__t1") === hot("__t"), "left_semi")
        val dupFirstHot = hotGrams.groupBy("__g")
          .agg(min(struct(col("__id"), col("__pos"))).as("__first"),
            count(lit(1)).as("__c"))
          .filter(col("__c") > 1)
          .select("__g", "__first")
        // dupFirstHot is left to AQE: broadcast when small (the common
        // case), a skew-splittable shuffled probe when a 100× corpus
        // makes the duplicated-hot-gram set itself large
        val hotRemovals = hotGrams.join(dupFirstHot, Seq("__g"))
          .filter(struct(col("__id"), col("__pos")) =!= col("__first"))
          .select("__id", "__pos")
        windowRemovals(coolGrams).unionByName(hotRemovals)
      }
    val removals = removalRows
      .groupBy("__id")
      .agg(collect_list(struct(col("__pos").as("__s"),
        (col("__pos") + (n - 1)).as("__e"))).as("__spans"))
    toks.join(removals, col(idCol) === col("__id"), "left")
      .withColumn("__kept",
        when(col("__spans").isNull, col("__toks"))
          .otherwise(filter(col("__toks"), (_, i) =>
            !exists(col("__spans"), s =>
              i + 1 >= s.getField("__s") && i + 1 <= s.getField("__e")))))
      .select(col(idCol),
        array_join(col("__kept"), " ").as("text_dedup"),
        (size(col("__toks")) - size(col("__kept"))).cast("long")
          .as("n_tokens_removed"))
  }

  // ---- Repetition / boilerplate detection ---------------------------------

  /** Fraction of repeated whitespace tokens: 1 − distinct/total (0 for empty
    * text). High values flag boilerplate and degenerate generations.
    */
  def dupTokenRatio(text: Column): Column = {
    val toks = split(text, " ")
    when(length(text) === 0, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(toks)).cast("double") / size(toks).cast("double"))
  }

  /** Fraction of repeated n-token shingles: 1 − distinct/total (0 when the
    * text has fewer than n tokens). The standard template-spam signal —
    * natural text repeats words but rarely whole n-grams.
    */
  def dupNgramRatio(text: Column, n: Int = 3): Column = {
    val sh = shingles(text, n)
    when(size(sh) === 0, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(sh)).cast("double") / size(sh).cast("double"))
  }

  // ---- URL / domain extraction --------------------------------------------

  /** All registrable domains mentioned in the text (lowercased), extracted
    * from URL-ish and bare-host mentions — the input to source-mix reports
    * and domain blocklists. Lookaround-free pattern (Java ≡ RE2); the
    * scheme/www prefix is stripped by capture-group CHOICE (group 5 is the
    * host), not lookbehind.
    */
  def extractDomains(text: Column): Column = {
    // host = dotted labels ending in an alpha TLD of length ≥2; groups:
    // 1 boundary, 2 full url, 3 scheme, 4 www., 5 host
    val host = "([a-z0-9-]+\\.)+[a-z]{2,}"
    regexp_extract_all(lower(text),
      lit(s"(^|[^a-z0-9.-])((https?://)?(www\\.)?($host))"), lit(5))
  }

  /** SEQUENCE PACKING — assign documents to fixed-token-budget training
    * sequences (the batch-construction stage of an LLM training pipeline:
    * pack short docs together so sequences waste few pad tokens).
    * Returns (idCol, n_tokens, seq_id). Ids must be integral (or strings
    * of digits): they are carried as LONG — the returned idCol is long
    * regardless of input type, and non-numeric ids raise.
    *
    * Distributed shape: documents hash-partition on id (deterministic),
    * sort within each partition by (tokens DESC, id) and stream through a
    * bounded first-fit-decreasing packer — FFD is within 11/9 of optimal
    * per partition, and `lookback` caps the open-bin list so executor
    * memory is O(lookback), independent of partition size. One shuffle
    * total; bins never span partitions (at 100 TB each partition holds
    * millions of docs, so the per-partition partial-bin overhead is noise).
    *
    * Oversized docs (tokens > budget) get a singleton sequence — never
    * silently dropped; truncation/chunking belongs upstream
    * ([[chunkByTokens]]). Deterministic: same input → same seq_ids.
    */
  def packSequences(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    tokenCol: String, budget: Long, partitions: Int = 0,
                    lookback: Int = 64): org.apache.spark.sql.DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(lookback >= 1, s"lookback must be >= 1, got $lookback")
    val spark = docs.sparkSession
    import spark.implicits._
    val nParts =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    docs
      .select(
        // loud failure beats the opaque "Null value appeared in non-nullable
        // field" the tuple encoder would throw mid-stage; guard the
        // POST-cast value so non-numeric ids (which cast to NULL) fail the
        // same way as genuine NULLs
        when(col(idCol).try_cast("long").isNull,
          raise_error(lit(s"packSequences: NULL or non-numeric $idCol")))
          .otherwise(col(idCol).try_cast("long")).as("__id"),
        when(col(tokenCol).try_cast("long").isNull,
          raise_error(lit(s"packSequences: NULL or non-numeric $tokenCol")))
          .otherwise(col(tokenCol).try_cast("long")).as("__tok"))
      .repartition(nParts, col("__id"))
      .sortWithinPartitions(col("__tok").desc, col("__id"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId().toLong
        // open bins as (localBinId, remaining); length capped at `lookback`
        val open = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var nextBin = 0L
        it.map { case (id, tok) =>
          val need = math.max(tok, 1L) // a zero-token doc still occupies a slot
          val slot = open.indexWhere(_._2 >= need)
          val local =
            if (slot >= 0) {
              val (b, rem) = open(slot)
              if (rem - need > 0) open(slot) = (b, rem - need) else open.remove(slot)
              b
            } else {
              val b = nextBin; nextBin += 1
              val rem = budget - need
              if (rem > 0) {
                open += ((b, rem))
                if (open.length > lookback) open.remove(0) // retire the oldest
              }
              b
            }
          (id, tok, (pid << 40) | local) // 2^40 bins per partition
        }
      }
      .toDF(idCol, "n_tokens", "seq_id")
  }

  // ---- Corpus-statistics quality scoring ----------------------------------

  /** Whitespace-token corpus frequencies: (token, n) — the vocabulary
    * table a corpus-level quality filter trains on. One explode + one
    * map-side-combined count; the token shuffle is stopword-skewed, which
    * is exactly what AQE's skew handling (on in [[graft.core.Session]])
    * absorbs at scale.
    */
  def tokenFrequencies(docs: org.apache.spark.sql.DataFrame,
                       textCol: String): org.apache.spark.sql.DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))

  /** Corpus-statistics quality signals per doc — the CCNet-style
    * "score text by a LM trained on the corpus" filter, formulated on
    * EXACT integer counts so the score is bit-reproducible across engines
    * (a log-prob formulation differs by ulps between libm
    * implementations; mean-frequency ranks documents the same way):
    *
    *  - `mean_token_freq`: mean corpus frequency of the doc's tokens —
    *    LOW means the doc is full of tokens the corpus rarely sees
    *    (noise, mojibake, code in a prose corpus);
    *  - `rare_frac`: fraction of tokens with corpus frequency ≤
    *    `rareMax` — the "how much of this doc is out-of-vocabulary"
    *    dial a curation pipeline thresholds on.
    *
    * Scale shape: the doc side pre-aggregates to per-(doc, token) counts
    * BEFORE the frequency join — the join then carries one row per
    * distinct token per doc instead of one per token occurrence, which
    * both shrinks the shuffle and flattens the stopword skew ("the"
    * contributes one weighted row per doc, not thousands of hot-key
    * rows); scores fold back with multiplicity weights, so the result is
    * identical to the per-occurrence formulation. The weighted sum is
    * decimal-exact (corpus-frequency × count products can pass 2^63 on a
    * 100 TB corpus). Composes with [[tokenFrequencies]] built on any
    * corpus (train on clean, score candidates). Tokens absent from `freq`
    * count as frequency 0 (maximally rare).
    */
  def tokenRarityScores(docs: org.apache.spark.sql.DataFrame, idCol: String,
                        textCol: String,
                        freq: org.apache.spark.sql.DataFrame,
                        rareMax: Long = 1L): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("__c"))
      .join(freq, Seq("token"), "left")
      .select(col(idCol), col("__c"), coalesce(col("n"), lit(0L)).as("__n"))
      .groupBy(idCol)
      .agg(sum("__c").as("n_tokens"),
        (sum((col("__c") * col("__n")).cast("decimal(38,0)")).cast("double") /
          sum("__c").cast("double")).as("mean_token_freq"),
        (sum(when(col("__n") <= rareMax, col("__c")).otherwise(0L))
          .cast("double") / sum("__c").cast("double")).as("rare_frac"))

  /** Unigram-LM surprisal scoring — the perplexity-proxy quality filter
    * (CCNet scores candidate docs by a LM trained on a reference corpus)
    * formulated in INTEGER BITS so it is bit-reproducible across engines:
    * a token with corpus frequency `n` out of `T` total tokens costs
    * `msb(T) - msb(n)` bits, where `msb(x) = length(bin(x))` is the
    * 1-based position of the most-significant bit — floor(log2)+1 computed
    * by binary-string length, NEVER libm (Spark's log2 is
    * `Math.log(x)/Math.log(2)`, which is not exact even at powers of two,
    * so a floor() on it can disagree with another engine by one whole
    * bit). The integer score approximates -log2 p(token) within one bit —
    * the same ORDERING signal a float LM score gives, with none of the
    * ulp nondeterminism ([[tokenRarityScores]] documents why this corpus
    * avoids float log-probs).
    *
    * A token absent from `freq` (scoring candidates against a CLEAN
    * reference corpus) costs `msb(T)` bits — one more than the rarest
    * seen token, the "rarer than anything observed" cap that keeps the
    * score total-ordered without a smoothing hyperparameter.
    *
    * Scale shape: identical to [[tokenRarityScores]] — per-(doc, token)
    * counts BEFORE the frequency join (one row per distinct token per
    * doc; stopword skew flattened), weighted fold after. `totalTokens`
    * (the corpus size the bit budget derives from) is O(vocab) to
    * compute; pass it when the caller already knows it.
    */
  def unigramSurprisal(docs: org.apache.spark.sql.DataFrame, idCol: String,
                       textCol: String,
                       freq: org.apache.spark.sql.DataFrame,
                       totalTokens: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    val total = totalTokens.getOrElse(
      // O(vocab) scalar; sum() of an empty frame is NULL, not 0
      Option(freq.agg(sum("n")).head().get(0)).fold(0L)(_.asInstanceOf[Long]))
    require(total > 0, "unigramSurprisal: frequency table is empty")
    val totalBits = 64 - java.lang.Long.numberOfLeadingZeros(total) // length(bin(total))
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("__c"))
      .join(freq, Seq("token"), "left")
      .withColumn("__bits",
        when(col("n").isNull || col("n") <= 0L, lit(totalBits.toLong))
          .otherwise(lit(totalBits.toLong) - length(bin(col("n"))).cast("long")))
      .groupBy(idCol)
      .agg(sum("__c").as("n_tokens"),
        sum(col("__c") * col("__bits")).as("total_bits"))
      .withColumn("avg_bits",
        col("total_bits").cast("double") / col("n_tokens").cast("double"))
  }

  /** Whitespace-token bigram frequencies: (w1, w2, n) — the context table
    * [[bigramSurprisal]] scores against. One pair explode + one
    * map-side-combined count; pair keys flatten the unigram stopword skew
    * ("the" splits across every successor).
    */
  def bigramFrequencies(docs: org.apache.spark.sql.DataFrame,
                        textCol: String): org.apache.spark.sql.DataFrame =
    consecutivePairs(docs.select(col(textCol)), textCol, Nil)
      .groupBy("w1", "w2").agg(count(lit(1)).as("n"))

  private def consecutivePairs(df: org.apache.spark.sql.DataFrame,
                               textCol: String,
                               carry: Seq[String]): org.apache.spark.sql.DataFrame = {
    val toks = split(col(textCol), " ")
    df.select(carry.map(col) :+
        posexplode(when(size(toks) < 2,
          array().cast("array<struct<w1:string,w2:string>>"))
          .otherwise(transform(sequence(lit(1), size(toks) - 1), i =>
            struct(element_at(toks, i).as("w1"),
              element_at(toks, i + 1).as("w2"))))).as(Seq("__i", "__p")): _*)
      .select(carry.map(col) :+ col("__p.w1").as("w1") :+ col("__p.w2").as("w2"): _*)
  }

  /** Bigram-LM surprisal with unigram BACKOFF — [[unigramSurprisal]]'s
    * next step up (a real CCNet-style filter scores with context), in the
    * same INTEGER-BIT formulation so the score is bit-reproducible across
    * engines (never libm — see unigramSurprisal on why `length(bin(n))`,
    * not log2):
    *
    *  - a bigram (w1, w2) SEEN in `bigramFreq` costs
    *    `msb(cn(w1)) − msb(bn(w1,w2))` bits — the integer −log2 of the
    *    conditional P(w2|w1) = bn/cn within one bit;
    *  - an UNSEEN bigram backs off to w2's unigram cost plus ONE backoff
    *    bit: `msb(T) − msb(n(w2)) + 1` (unseen unigram caps at
    *    `msb(T) + 1`) — the fixed-penalty stupid-backoff shape, no
    *    smoothing hyperparameter;
    *  - a document's FIRST token has no context and scores by the plain
    *    unigram rule (exactly [[unigramSurprisal]]'s cost).
    *
    * Train the tables on a REFERENCE corpus and score candidates — on a
    * self-trained corpus the backoff branch never fires. Returns
    * (idCol, n_tokens, total_bits, avg_bits).
    *
    * Scale shape: per-(doc, w1, w2) counts BEFORE the frequency joins —
    * one row per distinct pair per doc, skew flattened — then a weighted
    * fold; the context table derives from `bigramFreq` by one O(distinct
    * bigrams) aggregation.
    */
  def bigramSurprisal(docs: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String,
                      uniFreq: org.apache.spark.sql.DataFrame,
                      bigramFreq: org.apache.spark.sql.DataFrame,
                      totalTokens: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    val total = totalTokens.getOrElse(
      Option(uniFreq.agg(sum("n")).head().get(0)).fold(0L)(_.asInstanceOf[Long]))
    require(total > 0, "bigramSurprisal: unigram frequency table is empty")
    val totalBits = (64 - java.lang.Long.numberOfLeadingZeros(total)).toLong
    val ctx = bigramFreq.groupBy("w1").agg(sum("n").as("__cn"))
    val pairBits = consecutivePairs(docs.select(col(idCol), col(textCol)),
        textCol, Seq(idCol))
      .groupBy(col(idCol), col("w1"), col("w2")).agg(count(lit(1)).as("__c"))
      .join(bigramFreq.select(col("w1"), col("w2"), col("n").as("__bn")),
        Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(uniFreq.select(col("token").as("w2"), col("n").as("__un")),
        Seq("w2"), "left")
      .withColumn("__bits",
        when(col("__bn").isNotNull && col("__bn") > 0,
          length(bin(col("__cn"))).cast("long") - length(bin(col("__bn"))).cast("long"))
          .otherwise(lit(totalBits + 1L) -
            when(col("__un").isNull || col("__un") <= 0L, lit(0L))
              .otherwise(length(bin(col("__un"))).cast("long"))))
      .groupBy(idCol)
      .agg(sum(col("__c") * col("__bits")).as("__pair_bits"))
    val toks = split(col(textCol), " ")
    docs.select(col(idCol), element_at(toks, 1).as("token"),
        size(toks).cast("long").as("n_tokens"))
      .join(uniFreq, Seq("token"), "left")
      .withColumn("__fbits",
        when(col("n").isNull || col("n") <= 0L, lit(totalBits))
          .otherwise(lit(totalBits) - length(bin(col("n"))).cast("long")))
      .join(pairBits, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        (coalesce(col("__pair_bits"), lit(0L)) + col("__fbits")).as("total_bits"))
      .withColumn("avg_bits",
        col("total_bits").cast("double") / col("n_tokens").cast("double"))
  }

  // ---- BPE tokenizer training ----------------------------------------------
  //
  // Full byte-pair-encoding training in the WORD-HISTOGRAM formulation —
  // the shape that scales: the corpus contributes exactly ONE wordcount
  // shuffle, capped to the `maxWords` most frequent words (count desc,
  // word asc — deterministic; capping is what every real tokenizer
  // trainer does, and it bounds driver state independent of corpus
  // size), and the merge loop then runs driver-side over that bounded
  // histogram — O(maxWords · wordLen · numMerges), zero further jobs. A
  // naive distributed loop would pay one pair-count shuffle PER merge
  // (q_bpe_pairs is that loop's single iteration); the histogram
  // formulation pays it once.

  /** Train `numMerges` BPE merges. Each round counts weighted adjacent
    * token pairs across the histogram and merges the most frequent (ties
    * by lexicographically smallest (left, right) — total order, so
    * training is deterministic). Stops early when no pair occurs twice.
    * Returns `(rank, left, right, merged, gain)`, gain = the merged
    * pair's weighted frequency at selection time.
    *
    * Tokens start as characters (`split("")` — char-level BPE; surrogate
    * pairs split per UTF-16 unit, fine for the BMP text this corpus
    * holds).
    */
  def bpeTrain(docs: org.apache.spark.sql.DataFrame, textCol: String,
               numMerges: Int, maxWords: Int = 65536): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hist: Array[(String, Long)] =
      docs.select(explode(split(col(textCol), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w").asc)
        .limit(maxWords)
        .as[(String, Long)].collect()
    bpeMergeLoop(hist, numMerges).toDF("rank", "left", "right", "merged", "gain")
  }

  /** NON-overlapping pair counts of one token array — the number of
    * applications [[mergePair]]'s left-to-right scan would actually make,
    * so a selected merge's `gain` is exact (a run of L equal tokens yields
    * L/2 self-pair merges, not L−1; distinct pairs cannot overlap).
    * Counting overlapping adjacencies would overstate gains on runs and
    * break the Σtokens = Σchars − Σgains reconciliation q_bpe_train
    * asserts. Shared by both merge loops below.
    */
  private def scanPairs(toks: Array[String])(f: ((String, String), Long) => Unit): Unit = {
    var i = 0
    while (i < toks.length - 1) {
      if (toks(i) == toks(i + 1)) {
        var j = i
        while (j < toks.length && toks(j) == toks(i)) j += 1
        val run = j - i
        f((toks(i), toks(i)), run / 2L)
        i = j - 1 // the loop still counts (run-last, next-distinct)
      } else {
        f((toks(i), toks(i + 1)), 1L)
        i += 1
      }
    }
  }

  /** The INCREMENTAL merge loop (the one every real trainer runs): a merge
    * only changes pair counts inside words that CONTAIN the merged pair,
    * so global counts are maintained by per-word deltas over a pair→words
    * index instead of recounting the whole histogram every round —
    * O(affected-words · len) per merge where the recount loop pays
    * O(maxWords · len). Selection runs off a lazy-deletion priority queue
    * (popped entries are validated against the live count; total order =
    * count desc, then (left, right) asc — deterministic, identical to the
    * recount loop's argmax, which [[bpeMergeLoopRecount]] + TextOpsSpec
    * keep as the executable specification).
    */
  private[graft] def bpeMergeLoop(hist: Array[(String, Long)], numMerges: Int)
      : Seq[(Int, String, String, String, Long)] = {
    type Pair = (String, String)
    val words: Array[(Array[String], Long)] =
      hist.map { case (w, n) => (w.split("").filter(_.nonEmpty), n) }
    val counts = scala.collection.mutable.HashMap.empty[Pair, Long]
    val pairWords = scala.collection.mutable.HashMap
      .empty[Pair, scala.collection.mutable.HashSet[Int]]
    var wi = 0
    while (wi < words.length) {
      val (toks, n) = words(wi)
      val w = wi // stable capture for the closure
      scanPairs(toks) { (p, c) =>
        counts.update(p, counts.getOrElse(p, 0L) + c * n)
        pairWords.getOrElseUpdate(p,
          scala.collection.mutable.HashSet.empty[Int]) += w
      }
      wi += 1
    }
    // max-heap on (count, pair): bigger count wins; ties pop the SMALLER
    // (left, right) — the recount loop's exact tiebreak
    val ord: Ordering[(Long, Pair)] = (a, b) => {
      val byCount = java.lang.Long.compare(a._1, b._1)
      if (byCount != 0) byCount
      else implicitly[Ordering[Pair]].compare(b._2, a._2)
    }
    val pq = scala.collection.mutable.PriorityQueue.empty[(Long, Pair)](ord)
    counts.foreach { case (p, c) => pq.enqueue((c, p)) }
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      // pop to the first LIVE entry (stale entries carry a superseded count)
      var best = Option.empty[(Long, Pair)]
      while (best.isEmpty && pq.nonEmpty) {
        val e = pq.dequeue()
        if (counts.get(e._2).contains(e._1)) best = Some(e)
      }
      best match {
        case Some((gain, (l, r))) if gain >= 2 =>
          merges += ((rank, l, r, l + r, gain))
          val touched = pairWords.getOrElse((l, r), Nil).toArray.sorted
          touched.foreach { w =>
            val (toks, n) = words(w)
            val delta = scala.collection.mutable.HashMap.empty[Pair, Long]
            scanPairs(toks)((p, c) => delta.update(p, delta.getOrElse(p, 0L) - c))
            // a stale index entry (the pair was merged away inside this
            // word by an earlier round) applies a no-op delta — correct,
            // just wasted scan; the index entry dies with the pair below
            val merged = mergePair(toks, l, r)
            words(w) = (merged, n)
            scanPairs(merged) { (p, c) =>
              delta.update(p, delta.getOrElse(p, 0L) + c)
              pairWords.getOrElseUpdate(p,
                scala.collection.mutable.HashSet.empty[Int]) += w
            }
            delta.foreach { case (p, d) =>
              if (d != 0L) {
                val next = counts.getOrElse(p, 0L) + d * n
                if (next <= 0L) counts.remove(p)
                else { counts.update(p, next); pq.enqueue((next, p)) }
              }
            }
          }
          // every (l, r) adjacency was just merged away
          counts.remove((l, r))
          pairWords.remove((l, r))
          rank += 1
        case _ => exhausted = true
      }
    }
    merges.result()
  }

  /** The straightforward recount loop — every round recounts ALL pairs and
    * takes the argmax (count desc, pair asc). O(maxWords · len) PER MERGE:
    * fine at tens of merges, minutes at a real 32k-vocab run — kept as the
    * executable SPECIFICATION the incremental loop must match
    * (TextOpsSpec asserts identical merge tables).
    */
  private[graft] def bpeMergeLoopRecount(hist: Array[(String, Long)], numMerges: Int)
      : Seq[(Int, String, String, String, Long)] = {
    var words: Array[(Array[String], Long)] =
      hist.map { case (w, n) => (w.split("").filter(_.nonEmpty), n) }
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (toks, n) =>
        scanPairs(toks)((p, c) =>
          counts.update(p, counts.getOrElse(p, 0L) + c * n))
      }
      // argmax by count, ties by smallest (left, right): a merge of a
      // once-seen pair gains nothing — stop
      val best = counts.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, (p, n)) => acc match {
          case Some((bp, bn)) if bn > n || (bn == n &&
            implicitly[Ordering[(String, String)]].lteq(bp, p)) => acc
          case _ => Some((p, n))
        }
      }
      best match {
        case Some(((l, r), gain)) if gain >= 2 =>
          merges += ((rank, l, r, l + r, gain))
          words = words.map { case (toks, n) => (TextOps.mergePair(toks, l, r), n) }
          rank += 1
        case _ => exhausted = true
      }
    }
    merges.result()
  }

  /** One merge application: every non-overlapping left-to-right (l, r)
    * adjacency becomes the merged token. Shared by training's fold and
    * [[bpeSegment]]'s apply, so a trained table segments EXACTLY the way
    * training folded it.
    */
  private[ops] def mergePair(toks: Array[String], l: String, r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i < toks.length - 1 && toks(i) == l && toks(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.result()
  }

  /** Segment distinct words with a trained merge table: merges apply
    * sequentially in rank order — the same fold training ran, so
    * token counts reconcile exactly with training's gain bookkeeping
    * (`tokens(w) = chars(w) − Σ merges applied in w`). Distributed
    * mapPartitions over the DISTINCT words with the merge table broadcast
    * (genuinely per-row imperative work — the sanctioned last-resort
    * tier); callers join the (word → tokens) result back to the corpus,
    * so the expensive half runs once per distinct word, not per
    * occurrence.
    */
  def bpeSegment(words: org.apache.spark.sql.DataFrame, wordCol: String,
                 merges: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val ms: Array[(String, String)] =
      merges.orderBy("rank").select("left", "right").as[(String, String)].collect()
    val bc = spark.sparkContext.broadcast(ms)
    words.select(col(wordCol).cast("string")).distinct().as[String]
      .mapPartitions { it =>
        val m = bc.value
        it.map { w =>
          var toks = w.split("").filter(_.nonEmpty)
          var i = 0
          while (i < m.length) { toks = TextOps.mergePair(toks, m(i)._1, m(i)._2); i += 1 }
          (w, toks.toSeq)
        }
      }.toDF(wordCol, "tokens")
  }

  // ---- Train/test decontamination -----------------------------------------

  /** Test-set docs sharing at least one n-token shingle with the training
    * corpus — the decontamination check run before any benchmark claim.
    *
    * Scale shape: each side explodes to its DISTINCT per-doc shingle hashes
    * (8-byte keys, O(tokens) rows), the train side collapses to a distinct
    * hash set, and one LEFT SEMI join marks contaminated test docs — no
    * all-pairs comparison anywhere; at 100 TB this is the same
    * shuffle-on-hash shape as exact dedup, and
    * [[graft.ops.Prefilter.semiJoinBloom]] composes in front of it when the
    * train side is huge.
    */
  def contaminatedDocs(train: org.apache.spark.sql.DataFrame,
                       test: org.apache.spark.sql.DataFrame,
                       idCol: String, textCol: String,
                       n: Int = 5): org.apache.spark.sql.DataFrame = {
    val trainSet = shingleHashSet(train, idCol, textCol, n).select("__g").distinct()
    shingleHashSet(test, idCol, textCol, n)
      .join(trainSet, Seq("__g"), "left_semi")
      .select(idCol).distinct()
  }

  /** (id, __g) rows: each doc's DISTINCT n-gram shingle hashes, via the
    * native one-pass `shingle_hashes` kernel (each token string hashed
    * once; no shingle-string materialization). Requires
    * [[graft.core.GraftExtensions]] on the session — same contract as
    * [[graft.ops.FuzzyDedup]]. NOTE: the hash formulation is
    * hash-of-token-hash-slices; persisted indexes are stamped with
    * [[ShingleFormatKey]] and readers refuse a mismatch loudly
    * ([[requireShingleFormat]]), so a pre-r8 string-hash index cannot
    * silently return zero overlap.
    */
  private def shingleHashSet(df: org.apache.spark.sql.DataFrame,
                             idCol: String, textCol: String,
                             n: Int): org.apache.spark.sql.DataFrame =
    df.select(col(idCol), explode(array_distinct(
      call_function("shingle_hashes", col(textCol), lit(n)))).as("__g"))

  /** Cross-document BOILERPLATE detection — the complement of
    * [[dupNgramRatio]] (which sees repetition WITHIN a doc): an n-gram
    * appearing in `minDf`+ distinct documents is template text (headers,
    * navigation, license blocks), and a doc largely made of such n-grams
    * is boilerplate even if it never repeats itself.
    *
    * Returns (id, n_shingles, boiler_frac): the fraction of the doc's
    * DISTINCT n-gram shingles that are corpus-frequent. Shape: one
    * distinct-shingle explode, one groupBy-count document-frequency pass,
    * one hash join back, one doc-keyed fold — the exact-dedup shuffle
    * family, no all-pairs; integer counts + one IEEE division, so the
    * score is bit-reproducible cross-engine.
    */
  def boilerplateFractions(docs: org.apache.spark.sql.DataFrame,
                           idCol: String, textCol: String,
                           n: Int = 3, minDf: Long = 3L): org.apache.spark.sql.DataFrame = {
    val sh = shingleHashSet(docs, idCol, textCol, n)
    // rows are distinct per (doc, shingle), so count(*) IS document freq
    val boiler = sh.groupBy("__g").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf)
      .select("__g")
    sh.join(boiler.withColumn("__b", lit(1L)), Seq("__g"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"),
        (sum(coalesce(col("__b"), lit(0L))).cast("double") /
          count(lit(1))).as("boiler_frac"))
  }

  /** Contamination REPORT: per contaminated candidate doc, HOW MANY
    * distinct n-gram shingles it shares with the corpus — the evidence a
    * decontamination decision thresholds on (1 shared 5-gram is a common
    * phrase; 50 is a copied passage). Same distinct-shingle semi-join
    * shape as [[contaminatedDocs]] with the semi-join widened to an inner
    * join + count — still no all-pairs anywhere.
    */
  def contaminationReport(corpus: org.apache.spark.sql.DataFrame,
                          candidates: org.apache.spark.sql.DataFrame,
                          idCol: String, textCol: String,
                          n: Int = 5): org.apache.spark.sql.DataFrame = {
    val corpusSet = shingleHashSet(corpus, idCol, textCol, n)
      .select("__g").distinct()
    shingleHashSet(candidates, idCol, textCol, n)
      .join(corpusSet, Seq("__g"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared"))
  }

  /** INCREMENTAL decontamination, for a train corpus that grows over time:
    * fold each train batch's distinct shingle hashes into a keyed table
    * (one 8-byte-keyed row per distinct shingle — give the table a
    * `bucketCount` so each merge rewrites only touched buckets), then check
    * any candidate batch with [[checkContamination]] at O(batch shingles)
    * instead of rescanning the train corpus.
    */
  /** Hash-formulation version stamped on every persisted shingle index.
    * The r8 kernel switch (string-hash → hash-of-token-hashes) changed
    * every shingle value: an index built under the old formulation yields
    * ZERO overlap against new probes — silent decontamination false
    * negatives. The marker makes the mismatch LOUD instead: readers refuse
    * an unmarked or differently-marked index and demand a rebuild.
    */
  private val ShingleFormatKey = "graft.shingle_index.format"
  private val ShingleFormat = "hash_of_token_hashes_v2"

  private def requireShingleFormat(table: graft.cdc.KeyedParquetTable): Unit = {
    val got = table.properties.get(ShingleFormatKey)
    require(got.contains(ShingleFormat),
      s"shingle index at ${table.root} carries format ${got.getOrElse("<none>")} " +
        s"but this engine probes with $ShingleFormat — the stored hashes are " +
        "incomparable (zero overlap, silent decontamination false negatives). " +
        "Rebuild the index with indexTrainShingles from the train corpus.")
  }

  def indexTrainShingles(table: graft.cdc.KeyedParquetTable,
                         trainBatch: org.apache.spark.sql.DataFrame,
                         idCol: String, textCol: String, n: Int = 5): Unit = {
    require(table.keys == Seq("g"),
      s"shingle index table must be keyed by 'g' (got ${table.keys})")
    if (table.exists) requireShingleFormat(table) // refuse to extend a stale-format index
    else table.setProperties(Map(ShingleFormatKey -> ShingleFormat))
    table.createIfNotExists(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("g",
        org.apache.spark.sql.types.LongType))))
    table.merge(shingleHashSet(trainBatch, idCol, textCol, n)
      .select(col("__g").as("g")).distinct()
      .withColumn("operation", lit("u")))
  }

  /** Candidate docs sharing any n-gram with the indexed train corpus.
    *
    * Bucket-pruned probe: on a bucketed index table,
    * [[graft.cdc.KeyedParquetTable.readForKeys]] scans ONLY the shingle-hash
    * buckets the candidate batch touches — O(touched buckets) I/O per check
    * even as the train index grows forever, which is the point of
    * maintaining it incrementally. The candidate shingle set is
    * checkpointed once; it drives both the bucket computation and the
    * semi-join.
    *
    * Hash buckets fill uniformly, so the pruning is strongest for small
    * probe batches (few distinct shingles relative to the index's
    * bucketCount — the steady-state incremental case); a huge batch
    * touches every bucket and degrades gracefully to the full scan, which
    * is then the correct I/O anyway.
    */
  def checkContamination(table: graft.cdc.KeyedParquetTable,
                         candidates: org.apache.spark.sql.DataFrame,
                         idCol: String, textCol: String,
                         n: Int = 5): org.apache.spark.sql.DataFrame = {
    require(table.keys == Seq("g"),
      s"shingle index table must be keyed by 'g' (got ${table.keys})")
    requireShingleFormat(table)
    val cand = shingleHashSet(candidates, idCol, textCol, n).localCheckpoint(true)
    val indexed = table.readForKeys(cand.select(col("__g").as("g")))
    cand.join(indexed.select(col("g").as("__g")), Seq("__g"), "left_semi")
      .select(idCol).distinct()
  }
}
