package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Integer tf-idf lexical search (Retrieval — oracle-gated end-to-end
  * by q126): hand-checked scoring on a tiny corpus, rare-term
  * dominance, tie-break order, the k cap, and partitioning invariance.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (10L, "apple banana cherry"),
    (11L, "apple apple banana"),
    (12L, "durian elderberry fig"),
    (13L, "apple durian")
  ).toDF("doc_id", "text")

  private def query = Seq((1L, "apple durian")).toDF("doc_id", "text")

  test("scores match the hand-computed integer tf-idf") {
    // N = 4; df(apple) = 3 -> w = 1333333; df(durian) = 2 -> w = 2000000
    // doc 13: 1*1333333 + 1*2000000 = 3333333 (both terms)
    // doc 11: 2*1333333 = 2666666; doc 10: 1333333; doc 12: 2000000
    val got = Retrieval.searchTopK(query, corpus, "doc_id", "text", k = 4)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toList
    assert(got === List(
      (1, 13L, 3333333L), (2, 11L, 2666666L), (3, 12L, 2000000L), (4, 10L, 1333333L)))
  }

  test("k caps the tail; ties break on doc_id ascending") {
    val twins = Seq(
      (20L, "zebra yak"), (21L, "zebra yak"), (22L, "zebra yak")
    ).toDF("doc_id", "text")
    val got = Retrieval.searchTopK(
        Seq((1L, "zebra")).toDF("doc_id", "text"), twins, "doc_id", "text", k = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toList
    assert(got === List((1, 20L), (2, 21L)))
  }

  test("queries sharing no term with the corpus return no rows; empty corpus is safe") {
    val none = Retrieval.searchTopK(
      Seq((1L, "quux")).toDF("doc_id", "text"), corpus, "doc_id", "text", k = 3)
    assert(none.count() === 0L)
    graft.Checkpoints.release(none)
    val empty = Retrieval.searchTopK(query, corpus.filter(col("doc_id") < 0),
      "doc_id", "text", k = 3)
    assert(empty.count() === 0L)
    graft.Checkpoints.release(empty)
  }

  test("result is invariant under corpus repartitioning") {
    def run(c: org.apache.spark.sql.DataFrame) =
      Retrieval.searchTopK(query, c, "doc_id", "text", k = 4)
        .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toList
    assert(run(corpus.repartition(1)) === run(corpus.repartition(7)))
  }

  test("PRF expansion: feedback vocabulary retrieves docs the raw query cannot see") {
    // query says "car"; the gold doc d2 only says "automobile".
    // Pass 1 sees d1 alone; d1's vocabulary bridges the paraphrase.
    val q = Seq((100L, "car")).toDF("doc_id", "text")
    val c = Seq(
      (1L, "car automobile"),
      (2L, "automobile automobile"),
      (3L, "boat")).toDF("doc_id", "text")
    val got = Retrieval.searchTopKExpanded(q, c, "doc_id", "text",
        k = 5, fbDocs = 3, expTerms = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toList
    // N = 3; w(car) = 3·10⁶, w(automobile) = 1.5·10⁶.
    // expanded query = {car, automobile} (boat never mined):
    //   d1 = 3·10⁶ + 1.5·10⁶ = 4.5·10⁶; d2 = 2·1.5·10⁶ = 3·10⁶
    assert(got === List((1, 1L, 4500000L), (2, 2L, 3000000L)))
    // the base searcher on the same input proves the lift is real
    val base = Retrieval.searchTopK(q, c, "doc_id", "text", k = 5)
      .collect().map(_.getLong(2)).toList
    assert(base === List(1L))
  }

  test("PRF expansion: expTerms caps mining, score ties break on term ascending") {
    // feedback doc 1 carries three equal-weight candidates (df 1 each,
    // tf 1 each): only the two lexicographically smallest may join.
    val q = Seq((100L, "pivot")).toDF("doc_id", "text")
    val c = Seq(
      (1L, "pivot aaa bbb ccc"),
      (2L, "aaa x"), (3L, "bbb y"), (4L, "ccc z")).toDF("doc_id", "text")
    val got = Retrieval.searchTopKExpanded(q, c, "doc_id", "text",
        k = 5, fbDocs = 1, expTerms = 2)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toList
    // w(pivot) = 4·10⁶ (df 1... pivot appears only in d1); candidates
    // aaa/bbb/ccc all w = 2·10⁶ (df 2) -> ties -> {aaa, bbb} mined.
    // d2 scores w(aaa) = 2·10⁶; d3 scores w(bbb); d4 (ccc) does NOT.
    assert(got.map(_._1).toSet === Set(1L, 2L, 3L))
    assert(!got.map(_._1).contains(4L))
  }

  test("bm25: at dl = avgdl and tf = 1 the saturation curve is exactly 10⁶ ppm — score ≡ idf") {
    // every doc dl=3 -> avgdl_ppm = 3·10⁶, norm_ppm = 10⁶ exactly,
    // len_ppm = 250000 + 750000 = 10⁶, sat(1) = 2.2·10¹² div 2.2·10⁶
    // = 10⁶ exactly: BM25 score collapses to the integer idf, a
    // closed-form anchor for the whole floor-div chain
    val even = Seq(
      (10L, "apple banana cherry"),
      (11L, "apple durian fig"),
      (12L, "kiwi lemon mango")
    ).toDF("doc_id", "text")
    val got = Retrieval.searchTopKBm25(
        Seq((1L, "apple")).toDF("doc_id", "text"), even, "doc_id", "text", k = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toList
    // N = 3, df(apple) = 2 -> idf = 1500000; ties break on doc_id
    assert(got === List((1, 10L, 1500000L), (2, 11L, 1500000L)))
  }

  test("bm25: tf saturates sub-linearly where tf-idf grows linearly") {
    // same dl (padded with unique fillers), tf 1 vs 8
    val docs = Seq(
      (20L, "zebra f1 f2 f3 f4 f5 f6 f7"),
      (21L, "zebra zebra zebra zebra zebra zebra zebra zebra")
    ).toDF("doc_id", "text")
    val q = Seq((1L, "zebra")).toDF("doc_id", "text")
    def scores(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    val tfidf = scores(Retrieval.searchTopK(q, docs, "doc_id", "text", k = 2))
    val bm25 = scores(Retrieval.searchTopKBm25(q, docs, "doc_id", "text", k = 2))
    assert(tfidf(21L) === 8 * tfidf(20L)) // linear in tf
    assert(bm25(21L) > bm25(20L))
    assert(bm25(21L) < 3 * bm25(20L), // k1 = 1.2 caps the curve at ~2.2x
      s"saturation missing: ${bm25(21L)} vs ${bm25(20L)}")
  }

  test("bm25: length normalization — equal tf, shorter doc wins; tf-idf ties") {
    val docs = Seq(
      (30L, "needle x1"),
      (31L, "needle " + (1 to 30).map(i => s"pad$i").mkString(" "))
    ).toDF("doc_id", "text")
    val q = Seq((1L, "needle")).toDF("doc_id", "text")
    val tfidf = Retrieval.searchTopK(q, docs, "doc_id", "text", k = 2)
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    val bm25 = Retrieval.searchTopKBm25(q, docs, "doc_id", "text", k = 2)
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(tfidf(30L) === tfidf(31L)) // tf-idf is length-blind
    assert(bm25(30L) > bm25(31L), s"length norm missing: $bm25")
  }

  test("bm25: plan keeps the TopK aggregator tail — no window over scored docs, broadcast query side") {
    val plan = Retrieval.searchTopKBm25(query, corpus, "doc_id", "text", k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("bm25: result is invariant under corpus repartitioning") {
    def run(c: org.apache.spark.sql.DataFrame) =
      Retrieval.searchTopKBm25(query, c, "doc_id", "text", k = 4)
        .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toList
    assert(run(corpus.repartition(1)) === run(corpus.repartition(7)))
  }

  test("phraseSearch: adjacency by POSITION — bag-of-words co-occurrence is not a match") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps"),        // "quick brown" once
      (2L, "brown then later quick appears"),   // both words, never adjacent
      (3L, "quick brown quick brown end"),      // twice
      (4L, "table table table stop"),           // repeated token: 2 adjacent pairs
      (5L, "table stop table stop table")       // 3 tables, none adjacent
    ).toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(docs, "doc_id", "text",
        Seq("quick brown", "table table"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      ("quick brown", 1L, 1L),
      ("quick brown", 3L, 2L),
      ("table table", 4L, 2L)))
    // tokenizer parity: punctuation/case fold exactly like the index
    val cased = Retrieval.phraseSearch(docs, "doc_id", "text", Seq("Quick, BROWN!"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(cased === Set((1L, 1L), (3L, 2L)))
  }

  test("fuzzyLookup: edit-distance-1 classes match, distance-2 does not, df breaks ties") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark merge"),
      (2L, "spark stark table"),
      (3L, "table spark")).toDF("doc_id", "text")
    // dict dfs (doc counts): spark 3, table 2, stark 1, merge 1
    val got = Retrieval.fuzzyLookup(docs, "doc_id", "text",
        Seq("sark",     // substitution-reachable from BOTH spark and stark:
                        //   df 3 beats 1 -> corrects to spark, 2 candidates
          "sparkk",     // single insertion -> spark
          "spork",      // single substitution -> spark
          "merg",       // single deletion -> merge
          "sprak",      // adjacent transposition -> spark (shares "sprk"/"spak")
          "spxxk"))     // distance 2 from spark: must emit nothing
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq(
      ("merg", "merge", 1L, 1L),
      ("sark", "spark", 3L, 2L),
      ("sparkk", "spark", 3L, 1L),
      ("spork", "spark", 3L, 1L),
      ("sprak", "spark", 3L, 1L)))
  }

  test("snippets: rarest-present-term selection, start clamp, tie to min term") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta common common common"),
      (3L, "zeta appears here zeta again")).toDF("doc_id", "text")
    val qs = Seq(
      (100L, "gamma"),            // unique to d1, mid-doc hit
      (101L, "zeta"),             // d3 wins on tf/dl; hit at pos 0 clamps left
      (102L, "delta epsilon"),    // equal df=1 -> lexicographic min "delta"
      (103L, "nonexistent"))      // no corpus term -> no row
      .toDF("doc_id", "text")
    val got = Retrieval.snippets(qs, docs, "doc_id", "text", window = 3)
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getString(4)))
      .toSeq
    assert(got === Seq(
      (100L, 1L, "gamma", 2L, "alpha beta [gamma] delta epsilon zeta"),
      (101L, 3L, "zeta", 0L, "[zeta] appears here zeta"),
      (102L, 1L, "delta", 3L, "alpha beta gamma [delta] epsilon zeta eta")))
  }

  test("snippets: end clamp and first-occurrence (not any-occurrence) hit") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d needle e needle")).toDF("doc_id", "text")
    val qs = Seq((9L, "needle")).toDF("doc_id", "text")
    val got = Retrieval.snippets(qs, docs, "doc_id", "text", window = 3)
      .collect().map(r => (r.getLong(3), r.getString(4))).toSeq
    // first occurrence at pos 4 (0-based); right edge clamps at doc end
    assert(got === Seq((4L, "b c d [needle] e needle")))
  }

  test("keywords: hand-computed integer tf-idf, score ties break on term ascending") {
    import spark.implicits._
    // N = 4; weights: apple (4e6)//3 = 1333333, banana 2000000,
    // cherry/elderberry/fig 4000000, durian 2000000
    val got = Retrieval.keywords(corpus, "doc_id", "text", k = 3)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === Seq(
      (10L, 1, "cherry", 4000000L), (10L, 2, "banana", 2000000L),
      (10L, 3, "apple", 1333333L),
      (11L, 1, "apple", 2666666L), (11L, 2, "banana", 2000000L),
      (12L, 1, "elderberry", 4000000L), (12L, 2, "fig", 4000000L),
      (12L, 3, "durian", 2000000L),
      (13L, 1, "durian", 2000000L), (13L, 2, "apple", 1333333L)))
  }

  test("keywords: no window over the postings — the per-doc tail is the TopK aggregator") {
    val plan = Retrieval.keywords(corpus, "doc_id", "text", k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("booleanSearch: AND requires every term, NOT excludes, ranking by first occurrence") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana cherry"),   // both required, no excluded
      (2L, "banana apple"),          // both required (order irrelevant)
      (3L, "apple cherry"),          // missing banana -> out
      (4L, "banana apple cherry bad") // both required but excluded term
    ).toDF("doc_id", "text")
    // required = first two distinct terms IN ORDER (apple, banana) —
    // apple repeats before banana, distinctness must rank by FIRST
    // occurrence; excluded = third distinct term (bad)
    val q = Seq((9L, "apple apple banana bad tail")).toDF("doc_id", "text")
    val got = Retrieval.booleanSearch(q, docs, "doc_id", "text", nAnd = 2, nNot = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // matches = {1, 2}; fingerprint covered by the q160 oracle gate
    assert(got === Seq((9L, 2L, 1L, 2L)))
  }

  test("booleanSearch: a query with fewer distinct terms requires all it has, excludes nothing") {
    import spark.implicits._
    val docs = Seq((1L, "only only"), (2L, "other")).toDF("doc_id", "text")
    val q = Seq((5L, "only only only")).toDF("doc_id", "text")
    val got = Retrieval.booleanSearch(q, docs, "doc_id", "text", nAnd = 2, nNot = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === Seq((5L, 1L, 0L, 1L)))
  }

  test("booleanSearch: queries whose required set matches nothing emit no row") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val q = Seq((5L, "alpha missing")).toDF("doc_id", "text")
    // required = {alpha, missing}: no doc holds both
    assert(Retrieval.booleanSearch(q, docs, "doc_id", "text").count() === 0L)
  }

  test("booleanSearch: result is invariant under corpus repartitioning") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana cherry"), (2L, "banana apple"), (3L, "apple cherry"),
      (4L, "banana apple bad"), (5L, "apple banana extra words here")
    ).toDF("doc_id", "text")
    val q = Seq((9L, "apple banana bad")).toDF("doc_id", "text")
    val a = Retrieval.booleanSearch(q, docs, "doc_id", "text").collect().toSeq
    val b = Retrieval.booleanSearch(q, docs.repartition(7), "doc_id", "text")
      .collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  test("proximitySearch: ordered window pairs, self-proximity, window bounds") {
    val docs = Seq(
      (1L, "a x b a b"),     // a@0,3 b@2,4: pairs (0,2),(3,4) in w2; (0,4) only at w4
      (2L, "b a"),           // b BEFORE a: ordered -> no match
      (3L, "c c x c"))       // self pairs within 2: (0,1),(1,3) -> 2
      .toDF("doc_id", "text")
    def run(pairs: Seq[(String, String)], w: Int) =
      Retrieval.proximitySearch(docs, "doc_id", "text", pairs, w)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r.getLong(3))
        .toMap
    val w2 = run(Seq(("a", "b"), ("c", "c")), 2)
    assert(w2 === Map(("a", "b", 1L) -> 2L, ("c", "c", 3L) -> 2L))
    // widening the window admits the long-range (0,4) pair
    assert(run(Seq(("a", "b")), 4) === Map(("a", "b", 1L) -> 3L))
    // exact-adjacency window degenerates to bigram counting
    assert(run(Seq(("a", "b")), 1) === Map(("a", "b", 1L) -> 1L))
    intercept[IllegalArgumentException] {
      Retrieval.proximitySearch(docs, "doc_id", "text", Seq(("a", "b")), 0)
    }
  }

  test("moreLikeThis: exact tf-idf dot, self excluded, fraction cap drops common terms") {
    // N = 4; df: x=2, y=2, z=1, w=1, q=1. Query doc 1 = "x x y".
    // cap 50% -> df <= 2, every term survives:
    //   doc2 "x z": 1·2·(4e6 DIV 2) = 4 000 000
    //   doc3 "y w": 1·1·(4e6 DIV 2) = 2 000 000
    val docs = Seq((1L, "x x y"), (2L, "x z"), (3L, "y w"), (4L, "qq qq"))
      .toDF("doc_id", "text")
    val got = Retrieval.moreLikeThis(docs, "doc_id", "text",
        Seq(1L).toDF("doc_id"), "doc_id", k = 5, maxDfPpm = 500000L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, 1, 2L, 4000000L), (1L, 2, 3L, 2000000L)))
    // cap 25% -> df <= 1: the shared terms (df 2) drop, no candidates
    val none = Retrieval.moreLikeThis(docs, "doc_id", "text",
        Seq(1L).toDF("doc_id"), "doc_id", k = 5, maxDfPpm = 250000L)
      .collect()
    assert(none.isEmpty)
    intercept[IllegalArgumentException] {
      Retrieval.moreLikeThis(docs, "doc_id", "text",
        Seq(1L).toDF("doc_id"), "doc_id", k = 5, maxDfPpm = 0L)
    }
  }

  test("chunkSliding: overlap, partial tail, exact-multiple, and degenerate shapes") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b c"), // shorter than one window
      (3L, (1 to 8).map(i => s"u$i").mkString(" ")), // exact window size... 8 = win
      (4L, "!!! ...")) // tokenizes to nothing -> dropped
      .toDF("doc_id", "text")
    val got = Retrieval.chunkSliding(docs, "doc_id", "text", winTokens = 8, stride = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(x => (x._1, x._2))
    // doc 1: 10 tokens, win 8 stride 4 -> 1 + ceil(2/4) = 2 windows;
    // window 1 starts at token 5, shares tokens 5..8 with window 0
    assert(got.filter(_._1 == 1L).toSeq === Seq(
      (1L, 0, 8, (1 to 8).map(i => s"t$i").mkString(" ")),
      (1L, 1, 6, (5 to 10).map(i => s"t$i").mkString(" "))))
    // doc 2: one partial window
    assert(got.filter(_._1 == 2L).toSeq === Seq((2L, 0, 3, "a b c")))
    // doc 3: exactly one full window, no empty tail window
    assert(got.filter(_._1 == 3L).toSeq === Seq(
      (3L, 0, 8, (1 to 8).map(i => s"u$i").mkString(" "))))
    // doc 4: no tokens, no rows
    assert(!got.exists(_._1 == 4L))
    // stride == winTokens degenerates to non-overlapping fixed windows
    val fixed = Retrieval.chunkSliding(docs, "doc_id", "text", winTokens = 4, stride = 4)
      .filter($"doc_id" === 1L).collect().map(_.getString(3)).sorted
    assert(fixed.toSeq === Seq("t1 t2 t3 t4", "t5 t6 t7 t8", "t9 t10").sorted)
    intercept[IllegalArgumentException] {
      Retrieval.chunkSliding(docs, "doc_id", "text", winTokens = 4, stride = 5)
    }
  }

}
