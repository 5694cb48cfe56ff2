package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pathological-corpus audit for the dedup/fingerprint family — the
  * degenerate shapes a 100 TB crawl actually contains, which uniform
  * random testdata never exercises:
  *
  *   - an ALL-IDENTICAL corpus (every LSH band collides: maximal
  *     blocks, the df-cap must engage rather than explode),
  *   - single-token and empty-text documents (sub-k shingle fallback
  *     paths, zero-token folds),
  *   - one hot duplicate cluster inside distinct background noise
  *     (the skew shape salting/df-caps exist for).
  *
  * These are correctness bounds, not oracles: results must be sane,
  * complete, and never throw.
  */
class AdversarialCorpusSpec extends SparkSpec {
  import spark.implicits._

  test("all-identical corpus: exact dedup keeps one, pairs are complete, df cap bounds winnow") {
    val n = 40
    val docs = (0L until n).map(i => (i, "the same exact document text repeated many times over"))
      .toDF("doc_id", "text")
    // exact dedup: one canonical survivor
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
    assert(groups.count() === 1L)
    assert(groups.select(size(col("member_ids"))).head().getInt(0) === n.toInt)
    // minhash pairs at threshold 1.0: all (n choose 2) pairs — identical
    // docs share every band, and the verify must NOT drop any
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      numHashes = 16, bands = 4, threshold = 1.0)
    assert(pairs.count() === n.toLong * (n - 1) / 2)
    // winnow pairs with maxDf < n: every fingerprint has df = n, so the
    // cap drops them ALL — the hot-block guard engages, no blow-up
    val capped = Dedup.winnowPairs(docs, "doc_id", "text", maxDf = n - 1)
    assert(capped.count() === 0L)
    graft.Checkpoints.release(capped)
    // with the cap open the block is allowed: all pairs, containment 1
    val open = Dedup.winnowPairs(docs, "doc_id", "text", maxDf = n)
    val rows = open.collect()
    assert(rows.length === n * (n - 1) / 2)
    assert(rows.forall(_.getDouble(5) === 1.0))
    graft.Checkpoints.release(open)
  }

  test("single-token and empty documents flow through fingerprints and dedup without error") {
    val docs = Seq[(Long, String)](
      1L -> "", 2L -> "  ", 3L -> "word", 4L -> "word",
      5L -> "!!!", // tokenizes to empty
      6L -> "two words").toDF("doc_id", "text")
    // winnowing: every doc degrades to exactly one fingerprint
    val fps = Dedup.winnowFingerprintsFlat(docs, "doc_id", "text")
    val byDoc = fps.groupBy(col("doc")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 6L).forall(byDoc(_) === 1L))
    // empty/whitespace/punctuation docs all hash to the empty fold (0)
    // and the two "word" docs share their fingerprint
    val fpOf = fps.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fpOf(1L) === 0L && fpOf(2L) === 0L && fpOf(5L) === 0L)
    assert(fpOf(3L) === fpOf(4L))
    // exact dedup groups the two identical one-worders
    val groups = Dedup.exactGroups(docs, "doc_id", "text").collect()
    assert(groups.exists(r => r.getAs[Seq[Long]]("member_ids").toSet == Set(3L, 4L)))
  }

  test("all-identical corpus: suffix-array repeats stay exact under maximal duplication") {
    // the candidate-position prefilter's WORST case: every h-rank is a
    // duplicate, so the dup tables are as large as the rank tables —
    // the operator must degrade to the unpruned aggregate, never to
    // wrong extents/counts. 12 identical docs of 20 distinct tokens:
    // per doc, left-maximal spans are exactly p=1..5 at len 16 (later
    // spans reach the doc end already covered), each occurring once
    // per doc => n_occurrences = 12.
    val n = 12
    val text = (1 to 20).map(i => s"tok$i").mkString(" ")
    val docs = (0L until n).map(i => (i, text)).toDF("doc_id", "text")
    val spans = Dedup.saMaximalRepeats(docs, "doc_id", "text", minLen = 8, maxLen = 16)
    val rows = spans.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    graft.Checkpoints.release(spans)
    val want = (for (d <- 0L until n; p <- 1L to 5L)
      yield (d, p, p + 15L, 16L, n.toLong)).toSet
    assert(rows.toSet === want)
    // cross-corpus form against a single-copy benchmark: identical
    // geometry, benchmark multiplicity exactly 1
    val shared = Dedup.saSharedSpans(docs, Seq((999L, text)).toDF("doc_id", "text"),
      "doc_id", "text", minLen = 8, maxLen = 16)
    val srows = shared.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    graft.Checkpoints.release(shared)
    assert(srows.toSet ===
      (for (d <- 0L until n; p <- 1L to 5L) yield (d, p, 16L, 1L)).toSet)
  }

  test("short, empty, and punctuation docs produce no suffix-array spans and no errors") {
    val docs = Seq[(Long, String)](
      1L -> "", 2L -> "word", 3L -> "!!!",
      4L -> "seven tokens only here not eight yet",
      5L -> "seven tokens only here not eight yet").toDF("doc_id", "text")
    // every doc is under minLen=8 tokens: nothing can span
    val spans = Dedup.saMaximalRepeats(docs, "doc_id", "text", minLen = 8, maxLen = 16)
    assert(spans.count() === 0L)
    graft.Checkpoints.release(spans)
    val shared = Dedup.saSharedSpans(docs, docs, "doc_id", "text", minLen = 8, maxLen = 16)
    assert(shared.count() === 0L)
    graft.Checkpoints.release(shared)
  }

  test("hot duplicate cluster in distinct noise: pairs are exactly the cluster") {
    val hot = (0L until 12L).map(i => (i, "repeated boilerplate legal disclaimer text common to many pages"))
    val noise = (100L until 160L).map(i =>
      (i, s"unique document number $i with its own words like token${i}a token${i}b token${i}c token${i}d"))
    val docs = (hot ++ noise).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        numHashes = 16, bands = 4, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === (for (a <- 0L until 12L; b <- (a + 1) until 12L) yield (a, b)).toSet)
  }

  test("all-identical image corpus: every band is one maximal bucket, pairs stay complete") {
    // 30 byte-identical PPMs: all 8 bands collide for every pair (the
    // image analogue of the all-identical LSH block) — candidates are
    // maximal but the verify keeps all (n choose 2) at hamming 0
    val n = 30
    val rgb = Array.tabulate(3 * 8 * 6)(i => ((i * 37 + 11) % 251).toByte)
    val ppm = s"P6\n8 6\n255\n".getBytes("US-ASCII") ++ rgb
    val media = (0L until n).map(i => Media.MediaRecord(i, "image", "ppm", ppm)).toDS()
    val pairs = Media.imageNearDupPairs(media, maxHamming = 0).collect()
    assert(pairs.length === n.toInt * (n - 1) / 2)
    assert(pairs.forall(_.getInt(2) == 0))
  }

  test("single-cluster embedding corpus: the quota bounds a maximally hot semantic cluster") {
    // every vector nearest centroid 0 — the whole corpus is ONE group;
    // the TopK aggregator must cap state at quota, not sort the corpus
    val coarse = Array(Array(0.0, 0.0), Array(1000.0, 1000.0))
    val emb = (0L until 500L).map(i => (i, Seq((i % 7).toFloat, (i % 5).toFloat)))
      .toDF("vec_id", "embedding")
    val kept = Similarity.clusterBalancedSample(emb, "vec_id", "embedding", coarse, quota = 5)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(kept.length === 5)
    assert(kept.forall(_._1 == 0))
    assert(kept.map(_._2).sorted.toList === List(1, 2, 3, 4, 5))
  }

  test("heavy hitters on an all-identical corpus: the single term is the whole distribution") {
    val docs = (0L until 50L).map(i => (i, "word")).toDF("doc_id", "text")
    val got = Quality.heavyHittersExact(docs, "text", support = 2, capacity = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(got === List(("word", 50L)))
  }

  test("bloom decontamination when every corpus doc is contaminated and when the bench is the corpus") {
    val docs = (0L until 20L).map(i =>
      (i, "alpha beta gamma delta epsilon shared tail")).toDF("doc_id", "text")
    // bench = one copy of the same text: every doc shares every gram
    val bench = docs.filter(col("doc_id") === 0)
    assert(Quality.decontaminateBloomKeep(docs, bench, "doc_id", "text", n = 5).count() === 0L)
  }

  test("all-aliased URL corpus: canonicalization collapses to ONE survivor, never zero") {
    import graft.sources.Warc
    // every row is a different alias spelling of the SAME page
    val urls = Seq(
      "https://www.site.org/p/1?a=1&b=2",
      "HTTPS://WWW.SITE.ORG/p/1?a=1&b=2",
      "https://www.site.org:443/p/1?b=2&a=1",
      "https://www.site.org/p/1?a=1&utm_source=x&b=2#frag",
      "HTTPS://www.Site.org:443/p/1?utm_campaign=y&b=2&a=1#z")
    val docs = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("doc_id", "url")
    val canon = docs.select(Warc.urlCanonical(col("url")).as("c")).distinct().collect()
    assert(canon.length === 1)
    assert(canon(0).getString(0) === "https://www.site.org/p/1?a=1&b=2")
  }

  test("link rank on degenerate graphs: complete self-loop graph and a star hub stay exact") {
    // every node links only to itself: rank is a fixpoint at 10^6
    val n = 20L
    val selfNodes = (0L until n).toDF("id")
    val selfEdges = (0L until n).map(i => (i, i)).toDF("src", "dst")
    val self = LinkGraph.pageRankInt(selfNodes, "id", selfEdges, "src", "dst", iters = 3)
      .collect().map(_.getLong(1)).toSet
    assert(self === Set(1000000L))
    // star: everyone links to node 0 — the hub absorbs all mass,
    // spokes hold the teleport floor; exact values after 1 iter
    val starEdges = (1L until n).map(i => (i, 0L)).toDF("src", "dst")
    val star = LinkGraph.pageRankInt(selfNodes, "id", starEdges, "src", "dst", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star(0L) === 150000L + 850000L * (n - 1)) // (n-1)·10⁶ contribs, DIV exact
    assert((1L until n).forall(star(_) === 150000L))
  }

  test("link rank: edgeless and all-dangling graphs hold the teleport floor; phantom dsts never appear") {
    val nodes = (0L until 10L).toDF("id")
    // no edges at all: every node sits at the teleport floor, for
    // every iteration count (the fixpoint of an empty contribution)
    val none = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(LinkGraph.pageRankInt(nodes, "id", none, "src", "dst", iters = 3)
      .collect().map(_.getLong(1)).toSet === Set(150000L))
    // all-dangling: every edge points OUT of the node set (a crawl
    // frontier always references pages not yet fetched). Truncation
    // PageRank drops that mass; ranks stay at the floor and no
    // phantom node materializes in the output
    val dangling = (0L until 10L).map(i => (i, 1000L + i)).toDF("src", "dst")
    val got = LinkGraph.pageRankInt(nodes, "id", dangling, "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length === 10)
    assert(got.forall(_._2 === 150000L))
    assert(got.forall(_._1 < 1000L), "phantom dst ids must not appear")
  }

  test("link rank: duplicate-only edge lists collapse (unweighted) or sum (weighted) — documented split") {
    val nodes = (0L until 5L).toDF("id")
    val once = (1L until 5L).map(i => (i, 0L)).toDF("src", "dst")
    val tripled = (1 to 3).flatMap(_ => (1L until 5L).map(i => (i, 0L))).toDF("src", "dst")
    def ranks(e: org.apache.spark.sql.DataFrame) =
      LinkGraph.pageRankInt(nodes, "id", e, "src", "dst", iters = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks(tripled) === ranks(once)) // a page linking twice votes once
    // weighted variant: duplicates SUM into the edge weight, but the
    // rank is scale-invariant in a uniform duplication factor —
    // (rank·3w) DIV 3W == (rank·w) DIV W only when division is exact;
    // here each node has ONE outlink so w = W and both are exact
    val w1 = once.withColumn("w", lit(1L))
    val w3 = tripled.withColumn("w", lit(1L))
    def wranks(e: org.apache.spark.sql.DataFrame) =
      LinkGraph.pageRankWeightedInt(nodes, "id", e, "src", "dst", "w", iters = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wranks(w3) === wranks(w1))
  }

  test("complete graph is a rank fixpoint: uniform structure holds every node at 10^6") {
    val n = 20L
    val nodes = (0L until n).toDF("id")
    val complete = (for { i <- 0L until n; j <- 0L until n } yield (i, j))
      .toDF("src", "dst")
    // deg = n, each contribution = 10⁶ DIV 20 = 50000 exactly, sum
    // back to 10⁶: 150000 + 850000·10⁶ DIV 10⁶ = 10⁶ — a fixpoint
    val got = LinkGraph.pageRankInt(nodes, "id", complete, "src", "dst", iters = 3)
      .collect().map(_.getLong(1)).toSet
    assert(got === Set(1000000L))
  }

  test("pathological URLs flow through canonicalize/host/extract without error") {
    import graft.sources.Warc
    val urls = Seq(
      "https:///path-no-host",          // empty authority
      "no-scheme-at-all",               // not a URL
      "https://",                       // nothing after the scheme
      "ftp://odd.scheme.org:21/x",      // non-http scheme: port survives
      "https://h.org/p?&&&",            // empty params only
      "https://h.org#only-fragment")    // fragment-only tail
      .toDF("url")
    val byUrl = urls.select(col("url"), Warc.urlCanonical(col("url")).as("c"),
        Warc.urlHost(col("url")).as("h"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(byUrl("https:///path-no-host")._1 === "https:///path-no-host")
    assert(byUrl("https:///path-no-host")._2 === "")
    assert(byUrl("no-scheme-at-all")._2 === "") // no authority to extract
    assert(byUrl("ftp://odd.scheme.org:21/x")._1 === "ftp://odd.scheme.org:21/x")
    assert(byUrl("https://h.org/p?&&&")._1 === "https://h.org/p") // all-empty params drop
    assert(byUrl("https://h.org#only-fragment")._1 === "https://h.org/")
  }

  test("extractLinks on hostile markup: quotes inside attributes, empty hrefs, single-quoted hrefs") {
    import graft.sources.Warc
    val html = Seq(
      // title attr containing a quoted fake href; real href after it
      """<a title="see href="trap"" href="https://real.org/a">x</a>""" +
        """<a href="">empty</a>""" +          // empty href: no capture (+ regex needs 1+ chars)
        """<a href='https://single.org/q'>y</a>""" + // single quotes: documented non-match
        """<a class="c" href="https://second.org/b">z</a>""")
      .toDF("h")
    val links = html.select(explode(Warc.extractLinks(col("h"))).as("u"))
      .collect().map(_.getString(0)).toSeq
    // the trap title produces "trap" (regex is lexical, documented);
    // the load-bearing guarantees: real hrefs extracted, empty and
    // single-quoted forms never crash the extractor
    assert(links.contains("https://real.org/a"))
    assert(links.contains("https://second.org/b"))
    assert(!links.contains(""))
  }

  test("registeredDomainPsl on degenerate hosts: empty, single-label, all-dots") {
    import graft.sources.Warc
    val psl = Seq("com", "co.uk").toDF("suffix")
    val hosts = Seq("", "localhost", "...", "com", "co.uk").toDF("host")
    val got = Warc.registeredDomainPsl(hosts, "host", "rd", psl)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.size === 5) // nothing dropped, nothing duplicated
    assert(got("localhost") === "") // heuristic: single label -> no regdomain
    assert(got("") === "")
  }

  test("phrase search on an all-identical corpus: counts scale with positions, not pairs") {
    // every doc is the phrase repeated: occurrence count per doc is
    // positions-1 (overlapping matches), never a cross-doc blow-up
    val docs = (0L until 30L).map(i => (i, "table table table table")).toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(docs, "doc_id", "text", Seq("table table"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.length === 30)
    assert(got.forall(_._2 === 3L))
  }

  test("KMV on a single-value corpus and an empty group column stays exact and bounded") {
    val one = (0L until 100L).map(i => ("g", "same")).toDF("grp", "v")
    val got = Quality.kmvDistinct(one, "grp", "v", k = 16)
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(got === ((1L, 1L))) // 100 duplicate rows -> 1 distinct, exact below k
    val none = one.filter(col("grp") =!= "g")
    assert(Quality.kmvDistinct(none, "grp", "v", k = 16).count() === 0L)
  }

  test("stripBoilerplate on an all-identical corpus strips EVERYTHING; unique corpus strips nothing") {
    val same = (0L until 20L).map(i => (i, "nav bar deep footer text")).toDF("doc_id", "text")
    val s1 = Quality.stripBoilerplate(same, "doc_id", "text", segWidth = 2, minDocs = 3)
      .collect()
    assert(s1.length === 20)
    assert(s1.forall(_.getString(3) === ""), "identical docs: every segment is boilerplate")
    assert(s1.forall(r => r.getLong(1) === r.getLong(2)), "removed must equal total")
    val uniq = (0L until 20L).map(i => (i, s"only doc$i words here$i")).toDF("doc_id", "text")
    val s2 = Quality.stripBoilerplate(uniq, "doc_id", "text", segWidth = 2, minDocs = 3)
      .collect()
    assert(s2.forall(_.getLong(2) === 0L), "unique corpus: nothing may be stripped")
  }

  test("n-gram novelty extremes: contained batch scores 0, disjoint batch scores 10^6") {
    import graft.functions.VectorExpressions
    VectorExpressions.register(spark)
    val ref = (0L until 10L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    def grams(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      org.apache.spark.sql.functions.call_function(
        VectorExpressions.ngramsFnName,
        graft.functions.TextFunctions.tokens(col("text")), lit(5)).as("g"))
    val contained = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val disjoint = Seq((200L, "one two three four five six")).toDF("doc_id", "text")
    def novelty(batch: org.apache.spark.sql.DataFrame): Long = {
      val bg = grams(batch).distinct()
      val rg = grams(ref).select(col("g")).distinct()
      val nNovel = bg.join(rg, Seq("g"), "left_anti").count()
      val nTot = bg.count()
      nNovel * 1000000L / nTot
    }
    assert(novelty(contained) === 0L)
    assert(novelty(disjoint) === 1000000L)
  }

  test("fuzzyLookup single-char vocabulary: empty-string deletion variant is the substitution bridge") {
    // "a" and "b" are substitution distance 1 via the shared ""
    // variant — the degenerate end of the SymSpell neighborhood, which
    // must neither error nor over-match longer terms
    val docs = Seq((1L, "a a b xyz")).toDF("doc_id", "text")
    val got = Retrieval.fuzzyLookup(docs, "doc_id", "text", Seq("a", "q"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3))).toSeq
    // probe "a": exact a + substitution b (via ""); xyz unreachable
    // probe "q": reaches BOTH single-char terms via "" only
    assert(got === Seq(("a", "a", 2L), ("q", "a", 2L)))
  }

  test("booleanSearch degenerate queries: single-token, all-stop corpus, empty corpus") {
    // all-identical corpus: a 1-distinct-term query requires just it,
    // excludes nothing, matches EVERY doc
    val same = (0L until 5L).map(i => (i, "same text here")).toDF("doc_id", "text")
    val one = Retrieval.booleanSearch(
        Seq((99L, "same")).toDF("doc_id", "text"), same, "doc_id", "text")
      .collect()
    assert(one.length === 1 && one(0).getAs[Long]("n_matches") === 5L &&
      one(0).getAs[Long]("n_excluded") === 0L)
    // the NOT term present everywhere: zero matches -> no row at all
    assert(Retrieval.booleanSearch(
      Seq((99L, "same text here")).toDF("doc_id", "text"), same,
      "doc_id", "text").count() === 0L)
    // empty corpus: no crash, no rows
    assert(Retrieval.booleanSearch(
      Seq((99L, "x y")).toDF("doc_id", "text"),
      same.filter(col("doc_id") < 0), "doc_id", "text").count() === 0L)
  }

  test("keywords on an all-identical corpus: every term carries the floor weight, term-order ties") {
    val same = (0L until 3L).map(i => (i, "zeta alpha")).toDF("doc_id", "text")
    // df = N for both terms -> weight = 10^6; tie breaks on term ASC
    val got = Retrieval.keywords(same, "doc_id", "text", k = 2)
      .filter(col("doc_id") === 0L).orderBy("rank").collect()
      .map(r => (r.getString(2), r.getLong(3))).toSeq
    assert(got === Seq(("alpha", 1000000L), ("zeta", 1000000L)))
  }

  test("apportionBudget degenerate budgets: fewer slots than keys, one key takes all") {
    // budget < n keys: only remainders allocate — exactly `budget`
    // keys get one slot each, the largest weights first
    val ws = Seq(("a", 5L), ("b", 3L), ("c", 2L), ("d", 1L)).toDF("k", "w")
    val small = LinkGraph.apportionBudget(ws, "k", "w", budget = 2L)
      .collect().map(r => (r.getString(0), r.getAs[Long]("slots"))).toMap
    assert(small.values.sum === 2L)
    assert(small("a") === 1L && small("b") === 1L)
    // a single key absorbs the whole budget
    val solo = LinkGraph.apportionBudget(
        Seq(("only", 7L)).toDF("k", "w"), "k", "w", budget = 1000L)
      .collect().map(_.getAs[Long]("slots")).toSeq
    assert(solo === Seq(1000L))
  }

  test("HITS degenerate graphs: edgeless corpus zeros out; self-loop-only node is its own hub+authority") {
    import spark.implicits._
    val nodes = Seq(0L, 1L, 2L).toDF("id")
    // no edges at all: every sum is empty, max-norm divides by the
    // coalesce(1) floor -> all scores 0, never a divide-by-zero
    val bare = LinkGraph.hitsInt(nodes, "id",
        Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst", iters = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(bare === Set((0L, 0L)))
    // a pure self-loop feeds itself: it is the max on both axes -> 10^6
    val loop = LinkGraph.hitsInt(Seq(7L).toDF("id"), "id",
        Seq((7L, 7L)).toDF("src", "dst"), "src", "dst", iters = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(loop === Seq((1000000L, 1000000L)))
  }

  test("redirect pathologies: self-redirect reports unresolved at the cap; empty map yields no rows") {
    import spark.implicits._
    // u -> u is a 1-cycle: the doubled walk accumulates exactly
    // maxHops steps and lands where it started
    val self = LinkGraph.resolveRedirects(
        Seq(("u", "u")).toDF("s", "d"), "s", "d", maxHops = 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(self === Array(("u", "u", 4L, false)))
    val none = LinkGraph.resolveRedirects(
      Seq.empty[(String, String)].toDF("s", "d"), "s", "d", maxHops = 4)
    assert(none.count() === 0L)
  }

  test("crawlDepth edge shapes: seeds outside the node list are ignored; empty seeds leave all unreached") {
    import spark.implicits._
    val nodes = Seq(0L, 1L).toDF("id")
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    // seed 99 is not a node: it may expand but never appears in output
    val ghost = LinkGraph.crawlDepth(nodes, "id", edges, "src", "dst",
        Seq(99L).toDF("id"), "id", maxDepth = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ghost === Map(0L -> -1L, 1L -> -1L))
    val noSeed = LinkGraph.crawlDepth(nodes, "id", edges, "src", "dst",
        Seq.empty[Long].toDF("id"), "id", maxDepth = 2)
      .collect().map(r => r.getLong(1)).toSet
    assert(noSeed === Set(-1L))
  }

  test("stratifiedHoldout with budget exceeding the corpus holds out every doc it can") {
    import spark.implicits._
    val d = (1 to 10).map(i => (i.toLong, (i % 2).toLong)).toDF("doc_id", "stratum")
    val got = graft.sources.Export
      .stratifiedHoldout(d, "doc_id", "stratum", budget = 50L, seed = 1L)
      .collect().map(_.getBoolean(2))
    // quotas exceed stratum sizes; every rank clears the bar
    assert(got.forall(identity))
  }

  test("versionHistory on a single-snapshot corpus is one [v,v] run per doc") {
    import spark.implicits._
    val one = Seq((1L, 5L, "a"), (2L, 5L, "b")).toDF("doc_id", "v", "t")
    val got = Quality.versionHistory(one, "doc_id", "v", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 5L, 5L), (2L, 5L, 5L)))
  }

  test("urlPathTemplate on pathological URLs: schemeless, query-only, repeated slashes") {
    import spark.implicits._
    import graft.sources.Warc
    val cases = Seq(
      "no-scheme-at-all",                        // no ://: path extract misses
      "https://h.org/?",                         // empty query after ?
      "https://h.org//a//1//",                   // repeated slashes survive as-is
      "https://h.org/a?&&x=1&",                  // empty params drop, x survives
      "https://h.org/?only=query")               // query-only URL roots the path
    val got = cases.toDF("u")
      .select(Warc.urlPathTemplate(col("u"))).as[String].collect().toSeq
    assert(got === Seq("/", "/", "//a//{n}//", "/a?x", "/?only"))
  }

  test("encodingAudit on all-damage and empty text") {
    import spark.implicits._
    // a doc that is ONLY mojibake pairs; and the empty doc
    val df = Seq((1L, "\u00c3\u00a9\u00c3\u00a9\u00c3\u00a9"), (2L, ""))
      .toDF("id", "t")
    val got = Quality.encodingAudit(df, "id", "t")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(4), r.getString(5))).toMap
    assert(got(1L) === ((3L, 6L, "mojibake")))
    assert(got(2L) === ((0L, 0L, "clean"))) // empty is clean, not a crash
  }

  test("labelPropagation on a star graph: spokes adopt the hub, hub adopts min spoke") {
    import spark.implicits._
    // hub 0 with spokes 1..5; round 1: every spoke sees only {0} -> 0,
    // the hub sees {1..5} all count 1 -> min 1. Round 2: spokes see the
    // hub's PREVIOUS label 0... synchronous semantics keep oscillation
    // deterministic, pinned here.
    val e = (1L to 5L).map(i => (0L, i)).toDF("src", "dst")
    val nodes = (0L to 5L).toDF("id")
    val r1 = LinkGraph.labelPropagationInt(nodes, "id", e, "src", "dst", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 === Map(0L -> 1L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 5L -> 0L))
    val r2 = LinkGraph.labelPropagationInt(nodes, "id", e, "src", "dst", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // spokes now vote the hub's r1 label (1); hub sees spokes' 0s
    assert(r2 === Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("degreeStats on a fully reciprocal clique reads 100% reciprocity") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L)
    val e = (for { a <- ids; b <- ids if a != b } yield (a, b)).toDF("src", "dst")
    val got = LinkGraph.degreeStats(ids.toDF("id"), "id", e, "src", "dst")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(4))).toMap
    assert(got.values.toSet === Set((2L, 1000000L)))
  }

  test("cdcChunks: single-token and empty docs chunk sanely") {
    import spark.implicits._
    val df = Seq((1L, "lonely"), (2L, "")).toDF("doc_id", "text")
    val got = Dedup.cdcChunks(df, "doc_id", "text", avgSize = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // one single-token chunk for doc 1; the empty doc emits nothing
    assert(got.toSeq === Seq((1L, 0L, 1L)))
  }
}
