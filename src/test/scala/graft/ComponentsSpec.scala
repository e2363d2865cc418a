package graft

import org.apache.spark.sql.functions._

import graft.ops.{Components, FuzzyDedup}

/** Connected components: cluster resolution from near-dup pairs. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("chains, cliques, and singletons resolve to min-id components") {
    // chain 1-2-3-4-5, clique {10,11,12}, isolated edge 20-21
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)
    ).toDF("id_a", "id_b")
    val comp = Components.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(comp(_) === 1L))
    assert(Seq(10L, 11L, 12L).forall(comp(_) === 10L))
    assert(comp(20L) === 20L && comp(21L) === 20L)
  }

  test("deep chain (diameter ≫ maxIter) converges in O(log n) star rounds") {
    // label propagation would need 59 rounds here; star contraction must
    // finish well inside the default maxIter=25
    val n = 60
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = Components.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until n).forall(comp(_) === 0L))
  }

  test("shuffled-id deep chain converges (worst-case orientation for star steps)") {
    // permute ids so the chain's min sits mid-chain and neighbors alternate
    // direction — exercises both star steps' orientation handling
    val n = 64
    val perm = new scala.util.Random(3).shuffle((0L until n).toVector)
    val edges = (0 until n.toInt - 1).map(i => (perm(i), perm(i + 1))).toDF("id_a", "id_b")
    val comp = Components.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.values.toSet === Set(0L) && comp.size === n)
  }

  test("random graph matches driver-side union-find ground truth") {
    val rnd = new scala.util.Random(17)
    val n = 500
    val edges = Seq.fill(550)((rnd.nextLong(n), rnd.nextLong(n)))
      .filter { case (a, b) => a != b }
    // ground truth: classic union-find over the same edges (test-only)
    val parent = Array.tabulate(n.toInt)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    def root(x: Int): Long = find(x).toLong
    // min-id per union-find component
    val minOf = (0 until n.toInt).groupBy(root).map { case (r, xs) => r -> xs.min.toLong }
    val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(v => v -> minOf(root(v.toInt))).toMap
    val got = Components.connectedComponents(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("non-convergence within maxIter fails loudly instead of returning half-merged labels") {
    val edges = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Components.connectedComponents(edges, maxIter = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("dedupKeepersBy keeps the highest-scored doc per cluster, ties to smaller id") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val docs = Seq(
      (1L, 0.1), (2L, 0.9), (3L, 0.5), // cluster {1,2,3}: best is 2
      (10L, 0.4), (11L, 0.4)           // cluster {10,11}: tie → keep 10
    ).toDF("doc_id", "score")
    val keepers = Components.dedupKeepersBy(pairs, docs, "doc_id", "score")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keepers === Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 10L -> 10L, 11L -> 10L))
    // a paired doc MISSING from the score frame must stay mapped (it can
    // never win, but it must never silently escape dedup resolution)
    val keepers2 = Components.dedupKeepersBy(pairs,
        docs.filter(col("doc_id") =!= 3L), "doc_id", "score")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keepers2(3L) === 2L && keepers2.keySet === keepers.keySet)
  }

  test("dedupKeepersBy works on STRING doc ids (tiebreak needs no numeric negation)") {
    val pairs = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("id_a", "id_b")
    val docs = Seq(
      ("a", 0.1), ("b", 0.9), ("c", 0.5), // cluster {a,b,c}: best is b
      ("x", 0.4), ("y", 0.4)              // tie → lexicographically smaller x
    ).toDF("doc_id", "score")
    val keepers = Components.dedupKeepersBy(pairs, docs, "doc_id", "score")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(keepers === Map("a" -> "b", "b" -> "b", "c" -> "b",
      "x" -> "x", "y" -> "x"))
  }

  test("dedupKeepers over planted minhash near-dups keeps one id per cluster") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (4L, "completely unrelated content about distributed query engines and parquet"),
      (5L, "another standalone document mentioning bloom filters and bucketed joins")
    ).toDF("doc_id", "text")
    val pairs = FuzzyDedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b")
    val keepers = Components.dedupKeepers(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1,2,3 form one cluster kept by doc 1; 4 and 5 appear in no pair
    assert(keepers(1L) === 1L && keepers(2L) === 1L && keepers(3L) === 1L)
    assert(!keepers.contains(4L) && !keepers.contains(5L))
  }

  test("leakageSafeSplit keeps near-dup clusters on one side of every split") {
    // docs 1,2,3 are a near-dup cluster; 4,5 unpaired. A per-doc modulo
    // split would scatter 1,2,3 across splits — the cluster split must not.
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Components.leakageSafeSplit(docs, pairs, "doc_id", nSplits = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // whole cluster inherits rep 1 → one split for all three
    assert(Seq(1L, 2L, 3L).map(out(_)).distinct.size === 1)
    assert(out(1L)._1 === 1L)
    // unpaired docs represent themselves and split by own id
    assert(out(4L) === ((4L, "s0")) && out(5L) === ((5L, "s1")))
    // deterministic: recomputing yields the identical assignment
    val again = Components.leakageSafeSplit(docs, pairs, "doc_id", nSplits = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(again === out)
  }

  test("leakageSafeSplit on STRING ids: full deterministic split, clusters " +
    "intact, NULL id raises") {
    // r8 nit: pmod over a string rep_id cast to NULL under non-ANSI
    // semantics, silently assigning split=NULL — string ids now hash
    // through xxhash64 inside the API itself.
    val docs = Seq("doc-a", "doc-b", "doc-c", "doc-x", "doc-y").toDF("doc_id")
    val pairs = Seq(("doc-a", "doc-b"), ("doc-b", "doc-c")).toDF("id_a", "id_b")
    val out = Components.leakageSafeSplit(docs, pairs, "doc_id", nSplits = 3)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    // every doc assigned, no NULL splits, labels within s0..s2
    assert(out.size === 5)
    assert(out.values.forall(v => Set("s0", "s1", "s2")(v._2)), out.toString)
    // the near-dup cluster lands on ONE side
    assert(Seq("doc-a", "doc-b", "doc-c").map(out(_)._2).distinct.size === 1)
    assert(Seq("doc-a", "doc-b", "doc-c").map(out(_)._1).distinct === Seq("doc-a"))
    // deterministic across recomputation
    val again = Components.leakageSafeSplit(docs, pairs, "doc_id", nSplits = 3)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(again === out)
    // NULL id: loud failure, not a silent NULL split
    val withNull = Seq(Some("doc-a"), None).toDF("doc_id")
    val e = intercept[Exception] {
      Components.leakageSafeSplit(withNull, pairs, "doc_id", nSplits = 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("NULL doc_id")), msgs(e).mkString(" | "))
  }

  test("10^5-edge graph: correct labels within the O(log n) round bound") {
    // bench-scale synthetic: 1000 planted clusters of 100 nodes (chained
    // internally, 99 edges each) + one 1000-node chain on top ids — ~10^5
    // edges, ~10^5 nodes. Label propagation would need 999 rounds for the
    // chain; star contraction must land within ~log2(n) rounds of the
    // LARGEST component (1000 nodes → 10), plus slack for the alternating
    // scheme's constant factor.
    val clusterEdges = (0L until 1000L).flatMap { c =>
      val base = c * 100L
      (0L until 99L).map(i => (base + i, base + i + 1))
    }
    val chainBase = 1000000L
    val chainEdges = (0L until 999L).map(i => (chainBase + i, chainBase + i + 1))
    val edges = (clusterEdges ++ chainEdges).toDF("id_a", "id_b")
      .repartition(32)
    val (comp, rounds) = Components.connectedComponentsCounted(edges)
    assert(rounds <= 15, s"star contraction took $rounds rounds for a " +
      "1000-node-diameter graph — the O(log n) bound is broken")
    val compC = comp.localCheckpoint(true)
    // exactly 1001 components, each labeled by its min id
    assert(compC.select("component").distinct().count() === 1001L)
    val byComp = compC.groupBy("component")
      .agg(count(lit(1)).as("n"), min("id").as("mn"), max("id").as("mx"))
      .collect()
    assert(byComp.forall(r => r.getLong(0) === r.getLong(2))) // label = min id
    val chain = byComp.find(_.getLong(0) === chainBase).get
    assert(chain.getLong(1) === 1000L && chain.getLong(3) === chainBase + 999L)
    assert(byComp.filter(_.getLong(0) < 1000000L)
      .forall(r => r.getLong(1) === 100L && r.getLong(0) % 100L === 0L))
  }
}
