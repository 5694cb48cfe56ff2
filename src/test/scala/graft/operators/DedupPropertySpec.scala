package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property test for the prefix-filter candidate stage: the LOSSLESS
  * claim (no pair above threshold is ever dropped) must hold on
  * arbitrary corpora, not just the planted fixtures — tiny docs,
  * verbatim duplicates, near-threshold pairs, single-gram docs.
  * Brute-force reference is computed driver-side over the same
  * normalization (lowercase, distinct char trigrams). Seeded samples
  * (the repo's scalacheck idiom, see ChangesetRoundTripSpec) keep
  * failures replayable.
  */
class DedupPropertySpec extends SparkSpec {

  /** Char trigrams — ngramJaccardPairs' metric (NOT the minhash
    * verify metric; that is [[wordShingles]] below).
    */
  private def trigrams(text: String): Set[String] = {
    val lc = text.toLowerCase
    if (lc.length >= 3) (0 to lc.length - 3).map(i => lc.substring(i, i + 3)).toSet
    else Set(lc)
  }

  /** EXACTLY Dedup.shingled's metric: lowercase [^a-z0-9]+ tokens,
    * distinct word 3-shingles, whole-doc fallback under 3 tokens —
    * the premise pins below must use the operator's own verify
    * metric, not a correlated one (char trigrams), or the fixture
    * can silently degenerate relative to the operator's threshold.
    */
  private def wordShingles(text: String): Set[String] = {
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
    else Set(toks.mkString(" "))
  }

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 1.0
    else (a intersect b).size.toDouble / (a union b).size.toDouble

  // words drawn from a small vocabulary => realistic shared-gram rates,
  // plus occasional verbatim repeats of an earlier doc
  private val word = Gen.oneOf("spark", "duck", "graft", "join", "scan",
    "shuffle", "codegen", "vector", "near", "dup")
  private val doc = for {
    n <- Gen.choose(1, 12)
    ws <- Gen.listOfN(n, word)
  } yield ws.mkString(" ")
  private val corpus = for {
    base <- Gen.listOfN(12, doc)
    dupIdx <- Gen.choose(0, 11)
  } yield base :+ base(dupIdx) // always at least one exact dup pair

  test("connectedComponents: driver union-find == distributed min-label on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 10).foreach { trial =>
      val n = 30
      val edges = (1 to 25).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val df = edges.toDF("doc_a", "doc_b")
      val fast = Dedup.connectedComponents(df, "doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val dist = Dedup.connectedComponents(df, "doc_a", "doc_b", driverEdgeThreshold = -1L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(fast === dist, s"trial=$trial edges=$edges")
    }
  }

  test("connectedComponents: driver and distributed paths agree on supplementary-plane ids") {
    import spark.implicits._
    // U+FFFF sorts BELOW U+10000 in UTF-8 binary order (Spark/UTF8String)
    // but ABOVE it in Java's UTF-16 String.compareTo (surrogate 0xD800 <
    // 0xFFFF) — the exact divergence between the two component labelers
    // min candidate by UTF-8:  uFFFF  (EF BF BF .. < F0 90 80 80 ..)
    // min candidate by UTF-16: u10000 (surrogate 0xD800 < 0xFFFF)
    // third node sits above BOTH candidates in both orders
    val uFFFF = "\uFFFF-doc"
    val u10000 = "\uD800\uDC00-doc" // U+10000
    val third = "\uD800\uDC00\uFFFF-doc"
    val edges = Seq((uFFFF, u10000), (u10000, third))
    val df = edges.toDF("doc_a", "doc_b")
    val fast = Dedup.connectedComponents(df, "doc_a", "doc_b")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    val dist = Dedup.connectedComponents(df, "doc_a", "doc_b", driverEdgeThreshold = -1L)
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(fast === dist)
    // and the shared label is Spark's binary-order minimum, not Java's
    assert(fast.map(_._2).distinct === Seq(uFFFF))
  }

  test("dedupIncrement: corpus matches and smaller-id batch matches drop; chain a-b-c drops BOTH b and c") {
    import spark.implicits._
    // corpus doc 1 == batch doc 10 (drop 10); batch 11 == batch 12
    // (drop 12, keep 11); REAL chain: batch 20 near-dups corpus 2,
    // batch 21 near-dups batch 20 but NOT corpus 2 — the pair-list
    // greedy rule drops 21 because it matched smaller-id 20, even
    // though 20 itself was dropped (a survivor-index streaming dedup
    // would keep 21; q49/q58 do transitive clustering)
    val chainA = "one two three four five six seven eight nine ten eleven twelve"
    val chainB = "four five six seven eight nine ten eleven twelve alpha beta gamma"
    val chainC = "seven eight nine ten eleven twelve alpha beta gamma delta epsilon zeta"
    // pin the chain premises with the SAME shingle normalization the
    // operator uses, so the fixture can't silently degenerate again
    assert(jaccard(wordShingles(chainA), wordShingles(chainB)) >= 0.5, "premise: 20 matches corpus 2")
    assert(jaccard(wordShingles(chainB), wordShingles(chainC)) >= 0.5, "premise: 21 matches 20")
    assert(jaccard(wordShingles(chainA), wordShingles(chainC)) < 0.5, "premise: 21 does NOT match corpus 2")
    val corpusDocs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, chainA),
      (3L, "totally unrelated corpus content sits here quietly")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"), // == corpus 1
      (11L, "red orange yellow green blue indigo violet ultraviolet"),
      (12L, "red orange yellow green blue indigo violet ultraviolet"), // == 11
      (20L, chainB), // near-dup of corpus 2
      (21L, chainC), // near-dup of 20 only
      (30L, "fresh novel text that matches nothing at all anywhere")).toDF("doc_id", "text")
    // 16 bands of 2 rows: candidate-collision prob at J=0.6 is
    // 1-(1-0.36)^16 ≈ 0.999 (the default 8x4 misses ~1/3 of the
    // time at this J — LSH recall, not a drop-rule property)
    val index = Dedup.minhashBandIndex(corpusDocs, "doc_id", "text", 32, 16)
    val survivors = Dedup.dedupIncrement(corpusDocs, index, batch, "doc_id", "text", 32, 16)
      .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(survivors === Seq(11L, 30L))
  }

  test("dedupIncrement differential: greedy survivors match the full-batch pair list (20 seeded corpora)") {
    import spark.implicits._
    // The q95 oracle pins this on the real testdata; here the same
    // equivalence must hold on arbitrary corpora: survivors computed
    // incrementally (prebuilt corpus index + batch) == survivors
    // derived from minhashLshPairs over the UNION with the greedy rule
    // (drop b of any pair a<b where b is a batch id).
    (1 to 20).foreach { i =>
      val docs = corpus(Gen.Parameters.default, Seed(1000L + i)).get
      val n = docs.length
      val split = n / 2
      val df = docs.zipWithIndex.map { case (text, idx) => (idx.toLong, text) }
        .toDF("doc_id", "text")
      val existing = df.filter($"doc_id" < split)
      val batch = df.filter($"doc_id" >= split)
      val index = Dedup.minhashBandIndex(existing, "doc_id", "text")
      val got = Dedup.dedupIncrement(existing, index, batch, "doc_id", "text")
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      val pairs = Dedup.minhashLshPairs(df, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val dropped = pairs.collect { case (a, b) if math.max(a, b) >= split => math.max(a, b) }.toSet
      val want = (split.toLong until n.toLong).toSet -- dropped
      assert(got === want, s"seed=${1000 + i} docs=$docs")
    }
  }

  test("N-batch incremental fold with index maintenance == per-arrival greedy on the full ordered corpus (15 seeded corpora)") {
    import spark.implicits._
    // day-1 and day-2 of the production loop: each batch dedups
    // against the accumulated index, surviving bands are appended
    // (index += indexDelta), dropped docs never enter the index.
    // Reference rule, simulated from the full-corpus pair list:
    // batch doc b drops iff some pair (x, b) has x an accumulated
    // SURVIVOR (existing or kept in an earlier batch) or a smaller-id
    // mate of b's own batch (regardless of x's fate).
    (1 to 15).foreach { i =>
      val docs = corpus(Gen.Parameters.default, Seed(7000L + i)).get
      val n = docs.length
      val df = docs.zipWithIndex.map { case (text, idx) => (idx.toLong, text) }
        .toDF("doc_id", "text")
      val c1 = n / 3
      val c2 = c1 + (n - c1) / 2
      val batches = Seq((c1.toLong, c2.toLong), (c2.toLong, n.toLong))

      var index = Dedup.minhashBandIndex(df.filter($"doc_id" < c1), "doc_id", "text")
      var corpusDocs = df.filter($"doc_id" < c1)
      val got = scala.collection.mutable.ArrayBuffer.empty[Long]
      batches.foreach { case (lo, hi) =>
        val batch = df.filter($"doc_id" >= lo && $"doc_id" < hi)
        val r = Dedup.dedupIncrementWithIndex(corpusDocs, index, batch, "doc_id", "text")
        got ++= r.survivors.select($"doc_id").collect().map(_.getLong(0))
        // materialize the day-boundary state FIRST, then release the
        // increment's internal checkpoints and the superseded state
        val newIndex = index.union(r.indexDelta).localCheckpoint(true)
        val newCorpus = corpusDocs.union(r.survivors.select($"doc_id", $"text"))
          .localCheckpoint(true)
        graft.Checkpoints.release(r.indexDelta)
        graft.Checkpoints.release(index)
        graft.Checkpoints.release(corpusDocs)
        index = newIndex
        corpusDocs = newCorpus
      }
      graft.Checkpoints.release(index)
      graft.Checkpoints.release(corpusDocs)

      val pairs = Dedup.minhashLshPairs(df, "doc_id", "text")
        .collect().map(r => (math.min(r.getLong(0), r.getLong(1)),
          math.max(r.getLong(0), r.getLong(1)))).toSet
      val surv = scala.collection.mutable.Set((0L until c1): _*)
      val want = scala.collection.mutable.ArrayBuffer.empty[Long]
      batches.foreach { case (lo, hi) =>
        val kept = (lo until hi).filterNot { b =>
          pairs.exists { case (x, y) =>
            y == b && (surv.contains(x) || (x >= lo && x < b))
          }
        }
        want ++= kept
        surv ++= kept
      }
      assert(got.sorted.toSeq === want.sorted.toSeq, s"seed=${7000 + i} docs=$docs")
    }
  }

  test("ngramJaccardPairs finds EXACTLY the brute-force pairs at t=0.75 (40 seeded corpora)") {
    import spark.implicits._
    (1 to 40).foreach { i =>
      val docs = corpus(Gen.Parameters.default, Seed(i.toLong)).get
      val df = docs.zipWithIndex
        .map { case (text, idx) => (idx.toLong, text, "xx") }
        .toDF("doc_id", "text", "lang")
      val got = Dedup.ngramJaccardPairs(df, "doc_id", "text", "lang", threshold = 0.75)
        .collect()
        .map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1))))
        .toSet
      val sets = docs.map(trigrams)
      val want = (for {
        a <- docs.indices; b <- docs.indices if a < b
        if jaccard(sets(a), sets(b)) >= 0.75
      } yield (a.toLong, b.toLong)).toSet
      assert(got === want, s"seed=$i docs=$docs")
    }
  }

  test("minhashLshEval: perfect recall on identical docs; a weak banding measurably misses") {
    import spark.implicits._
    // 8 identical docs: every pair is true AND every band collides —
    // both ratios pin at exactly 10^6 ppm
    val same = (0L until 8L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val perfect = Dedup.minhashLshEval(same, "doc_id", "text",
        numHashes = 32, bands = 8, threshold = 0.5)
      .collect().head
    assert(perfect.getAs[Long]("n_true") === 28L)
    assert(perfect.getAs[Long]("recall_ppm") === 1000000L)
    assert(perfect.getAs[Long]("cand_precision_ppm") === 1000000L)
    // a true pair at jaccard 0.6 under ONE band of 32 rows: collision
    // needs all 32 minhashes equal — the eval must SEE the miss (this
    // is the S-curve fact the report exists to measure)
    val border = Seq(
      (1L, "w1 w2 w3 w4 w5 w6"),
      (2L, "w1 w2 w3 w4 w5 x9"), // 3-gram jaccard 3/5 = 0.6
      (3L, "totally different content here now")
    ).toDF("doc_id", "text")
    val weak = Dedup.minhashLshEval(border, "doc_id", "text",
        numHashes = 32, bands = 1, threshold = 0.5)
      .collect().head
    assert(weak.getAs[Long]("n_true") === 1L)
    assert(weak.getAs[Long]("n_hit") === 0L, "a 32-row single band collides only on (near-)identical docs")
    assert(weak.getAs[Long]("recall_ppm") === 0L)
    // empty-truth corpus: ratios define to 10^6 (nothing to find)
    val none = Seq((1L, "aa bb cc dd"), (2L, "ee ff gg hh")).toDF("doc_id", "text")
    val empty = Dedup.minhashLshEval(none, "doc_id", "text").collect().head
    assert(empty.getAs[Long]("n_true") === 0L)
    assert(empty.getAs[Long]("recall_ppm") === 1000000L)
  }

  test("dedupAudit: size histogram plus the singleton complement row") {
    import spark.implicits._
    val corpus = (0L until 10L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // components: {1,2,3} labeled 1, {5,6} labeled 5 -> 5 singletons
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
      .toDF("doc", "cluster")
    val got = Dedup.dedupAudit(corpus, "doc_id", clusters)
      .orderBy("n_members").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 5L, 5L), (2L, 1L, 2L), (3L, 1L, 3L)))
  }

  test("dedupAudit: a fully-clustered corpus emits no singleton row") {
    import spark.implicits._
    val corpus = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L)).toDF("doc", "cluster")
    val got = Dedup.dedupAudit(corpus, "doc_id", clusters).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((2L, 1L, 2L)))
  }

  test("leakageSafeSplit: clusters never straddle the boundary, under any seed") {
    import spark.implicits._
    val corpus = (0L until 12L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // components {1,2,3} and {5,6}; the rest singletons
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
      .toDF("doc", "cluster")
    for (seed <- Seq(1L, 2L, 3L, 99L)) {
      val got = Dedup.leakageSafeSplit(corpus, "doc_id", clusters, seed, 500000L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      assert(got.length === 12)
      // THE invariant: one flag value per rep — a member diverging
      // from its cluster-mates is exactly the train/eval leak
      got.groupBy(_._2).foreach { case (_, members) =>
        assert(members.map(_._3).toSet.size === 1)
      }
      // singletons rep themselves
      assert(got.filter(x => !Set(1L, 2L, 3L, 5L, 6L).contains(x._1))
        .forall(x => x._2 === x._1))
    }
    // ppm bounds behave: 0 holds nothing out, 10^6 everything
    assert(!Dedup.leakageSafeSplit(corpus, "doc_id", clusters, 1L, 0L)
      .collect().exists(_.getBoolean(2)))
    assert(Dedup.leakageSafeSplit(corpus, "doc_id", clusters, 1L, 1000000L)
      .collect().forall(_.getBoolean(2)))
  }
}
