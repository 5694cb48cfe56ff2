package graft.operators

import graft.SparkSpec

/** Edge semantics of the q245-q248 operators that the aggregate
  * oracle gates exercise only in bulk: frozen-SQ8 clip counting,
  * Gopher rule boundaries, span-corruption sentinel numbering on
  * short docs, FIM split-point degeneracy.
  */
class ExampleConstructorsSpec extends SparkSpec {

  test("scalarQuantizeFrozen: clips clamp to edge buckets and are counted") {
    import spark.implicits._
    // frozen calibration: dim0 [0, 10], dim1 [5, 5] (constant)
    val batch = Seq(
      (0L, Seq(-2.0, 5.0)), // lo clip, in-range constant
      (1L, Seq(10.0, 7.0)), // v = max: 255, NOT clipped; constant off: clipped
      (2L, Seq(12.0, 4.0)), // hi clip, lo clip
      (3L, Seq(5.0, 5.0))).toDF("vec_id", "embedding")
    val got = Similarity.scalarQuantizeFrozen(batch, "vec_id", "embedding",
        Seq(0.0, 5.0), Seq(10.0, 5.0))
      .select("vec_id", "codes", "n_clipped")
      .as[(Long, Seq[Int], Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(0L) === ((Seq(0, 0), 1L)))
    assert(got(1L) === ((Seq(255, 0), 1L)))
    assert(got(2L) === ((Seq(255, 0), 2L)))
    assert(got(3L) === ((Seq(127, 0), 0L)))
  }

  test("gopherRules: each rule trips on its own planted violation") {
    import spark.implicits._
    val docs = Seq(
      (0L, ("the a of " + Seq.tabulate(40)(i => f"t$i%03d").mkString(" "))), // all pass
      (1L, "the a short doc"), // r1 word count
      (2L, ("the a " + Seq.fill(40)("extraordinarily").mkString(" "))), // r2 mwl + r4/r5
      (3L, Seq.tabulate(40)(i => s"tok$i").mkString(" "))) // r3 no stopwords
      .toDF("doc_id", "text")
    val got = Quality.gopherRules(docs, "doc_id", "text")
      .select("doc_id", "r1_wc", "r2_mwl", "r3_stop", "r4_top", "r5_distinct", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(0L)._7, "doc 0 must keep")
    assert(!got(1L)._2 && !got(1L)._7, "doc 1 fails word count")
    assert(!got(2L)._3 && !got(2L)._7, "doc 2 fails mean word length")
    assert(!got(3L)._4 && !got(3L)._7, "doc 3 fails the stopword rule")
  }

  test("gopherRules: a 12k-token all-distinct doc completes in bounded time") {
    import spark.implicits._
    // the r18-verdict pathological row: with the old O(distinct x n)
    // top-word pass this is ~1.4e8 expression evals on ONE row; the
    // run-length fold over array_sort makes it O(n log n)
    val text = ("the a of " + Seq.tabulate(12000)(i => f"w$i%05d").mkString(" "))
    val t0 = System.nanoTime()
    val row = Quality.gopherRules(Seq((7L, text)).toDF("doc_id", "text"),
        "doc_id", "text")
      .select("wc", "top_frac_milli", "distinct_frac_milli")
      .as[(Long, Long, Long)].collect().head
    val sec = (System.nanoTime() - t0) / 1e9
    assert(row._1 === 12003L)
    assert(row._2 === 0L, "every word appears once: top mass 1/12003 -> 0 milli")
    assert(row._3 === 1000L)
    assert(sec < 60.0, s"pathological doc took $sec s — top-word pass regressed")
  }

  test("spanCorrupt: hand-checked sentinels, short docs, no-span docs") {
    import spark.implicits._
    // doc_id 0: starts at p=0, 7, 14, ... masks p in {0,1,2, 7,8,9, ...}
    val docs = Seq(
      (0L, "a b c d e f g h i j"), // n=10: starts {0, 7}; masks 0-2, 7-9
      (1L, "a b c d e f g h"), // head lands mid-run at mod 1: clipped 2-token head span
      (2L, "a b c"), // head at mod 2: clipped 1-token head span
      (3L, "x y z"), // (3+p)%7<3 for p=4..6 (absent): no low mods? p=0:3,1:4,2:5 -> no spans
      (5L, "s t u")) // (5+p)%7: p=2 -> 0: start at 2, span clipped at n
      .toDF("doc_id", "text")
    val got = graft.operators.Packing.spanCorrupt(docs, "doc_id", "text")
      .select("doc_id", "n_spans", "input_text", "target_text")
      .as[(Long, Long, String, String)].collect().map(r => r._1 -> r).toMap
    assert(got(0L)._2 === 2L)
    assert(got(0L)._3 === "<extra_id_0> d e f g <extra_id_1>")
    assert(got(0L)._4 === "<extra_id_0> a b c <extra_id_1> h i j")
    // r18-ADVICE clipped-head rule: doc 1 masks p0,p1 (mods 1,2) with no
    // preceding mod-0 start — they must surface as sentinel_0, not vanish
    assert(got(1L)._2 === 2L)
    assert(got(1L)._3 === "<extra_id_0> c d e f <extra_id_1>")
    assert(got(1L)._4 === "<extra_id_0> a b <extra_id_1> g h")
    assert(got(2L)._2 === 1L)
    assert(got(2L)._3 === "<extra_id_0> b c")
    assert(got(2L)._4 === "<extra_id_0> a")
    assert(got(3L)._2 === 0L)
    assert(got(3L)._3 === "x y z")
    assert(got(3L)._4 === "")
    assert(got(5L)._2 === 1L)
    assert(got(5L)._3 === "s t <extra_id_0>") // span start at p=2, clipped to n
    assert(got(5L)._4 === "<extra_id_0> u")
  }

  test("fimTransform: degenerate splits keep every token exactly once") {
    import spark.implicits._
    val docs = Seq((0L, "only"), (1L, "two words"), (2L, "a b c d e f"))
      .toDF("doc_id", "text")
    val got = graft.operators.Packing.fimTransform(docs, "doc_id", "text")
      .select("doc_id", "psm").as[(Long, String)].collect().toMap
    assert(got(0L) === "<PRE>  <SUF> only <MID> ") // n=1: c1=c2=0 -> all suffix
    assert(got(1L) === "<PRE>  <SUF> words <MID> two") // n=2: c1=0, c2=1
    assert(got(2L) === "<PRE> a b <SUF> e f <MID> c d")
  }
}
