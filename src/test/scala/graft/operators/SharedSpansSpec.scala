package graft.operators

import graft.SparkSpec

/** Cross-corpus exact contamination spans (Dedup.saSharedSpans). q110
  * oracle-gates the full construction against DuckDB on the real
  * testdata; these pin the semantics on hand-built corpora against a
  * brute-force reference, plus the two differentials that justify the
  * operator next to q67's fixed-n-gram decontaminate: true maximal
  * EXTENT (the contamination decision variable) and benchmark
  * multiplicity.
  */
class SharedSpansSpec extends SparkSpec {
  import spark.implicits._

  private def tok(s: String): Vector[String] =
    s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toVector

  /** Brute-force reference: per corpus position the longest substring
    * in [minLen, maxLen] occurring in bench (+ its bench count), then
    * left-maximality by running max of span ends.
    */
  private def ref(corpus: Seq[(Long, String)], bench: Seq[(Long, String)],
      minLen: Int, maxLen: Int): Seq[(Long, Long, Long, Long, Long)] = {
    val benchSubs: Map[Vector[String], Long] = bench
      .flatMap { case (_, t) =>
        val ts = tok(t)
        for (l <- minLen to maxLen; i <- 0 to ts.size - l) yield ts.slice(i, i + l)
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    corpus.flatMap { case (id, t) =>
      val ts = tok(t)
      val best = (1 to ts.size).flatMap { pos =>
        val cands = (maxLen to minLen by -1).iterator
          .filter(l => pos - 1 + l <= ts.size)
          .map(l => (l, ts.slice(pos - 1, pos - 1 + l)))
          .find { case (_, sub) => benchSubs.contains(sub) }
        cands.map { case (l, sub) => (pos.toLong, l.toLong, benchSubs(sub)) }
      }
      var maxEnd = Long.MinValue
      best.flatMap { case (pos, len, occ) =>
        val keep = pos + len > maxEnd
        maxEnd = math.max(maxEnd, pos + len)
        if (keep) Some((id, pos, pos + len - 1, len, occ)) else None
      }
    }.sortBy(r => (r._1, r._2))
  }

  private def run(corpus: Seq[(Long, String)], bench: Seq[(Long, String)],
      minLen: Int = 8, maxLen: Int = 32) =
    Dedup.saSharedSpans(corpus.toDF("doc_id", "text"), bench.toDF("doc_id", "text"),
        "doc_id", "text", minLen, maxLen)
      .orderBy($"doc_id", $"span_start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq

  private val shared12 =
    "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"

  test("matches the brute-force reference, reporting true extent") {
    // 12 shared tokens: a fixed-8 window scheme sees five hits; the
    // exact form must report ONE span of length 12
    val corpus = Seq(
      1L -> s"pre1 pre2 $shared12 post1 post2",
      2L -> "nothing from the benchmark appears in this one at all")
    val bench = Seq(
      100L -> s"bhead $shared12 btail")
    val got = run(corpus, bench)
    assert(got === ref(corpus, bench, 8, 32))
    assert(got === Seq((1L, 3L, 14L, 12L, 1L)))
  }

  test("corpus-internal repeats do NOT surface — only benchmark matches") {
    val rep = "r1 r2 r3 r4 r5 r6 r7 r8"
    val corpus = Seq(
      1L -> s"$rep mid1 mid2 $rep", // repeats within/across corpus only
      2L -> s"$rep other tokens here padding words")
    val bench = Seq(100L -> "benchmark content sharing nothing with the corpus docs")
    assert(run(corpus, bench).isEmpty)
  }

  test("adjacent spans matching DIFFERENT bench docs stay separate with true counts") {
    val a = "a1 a2 a3 a4 a5 a6 a7 a8"
    val b = "b1 b2 b3 b4 b5 b6 b7 b8"
    // corpus doc has a||b back to back; bench has `a` twice (two docs)
    // and `b` once — nowhere a||b as a whole
    val corpus = Seq(1L -> s"$a $b")
    val bench = Seq(100L -> s"x $a y", 101L -> s"$a z", 102L -> s"w $b")
    val got = run(corpus, bench)
    assert(got === ref(corpus, bench, 8, 32))
    // two spans (the 16-token concatenation occurs in no bench doc),
    // with exact per-span bench multiplicity 2 and 1
    assert(got === Seq((1L, 1L, 8L, 8L, 2L), (1L, 9L, 16L, 8L, 1L)))
  }

  test("sub-minLen overlap is ignored; maxLen caps reported extent") {
    val seven = "s1 s2 s3 s4 s5 s6 s7"
    val corpus = Seq(1L -> s"$seven tail tokens differ")
    val bench = Seq(100L -> s"$seven bench side differs")
    assert(run(corpus, bench, minLen = 8).isEmpty)
    // a 12-token share probed with maxLen=8 caps spans at 8 but still
    // covers the full extent as a run (span + shifted remainder)
    val corpus2 = Seq(1L -> shared12)
    val bench2 = Seq(100L -> shared12)
    val got = run(corpus2, bench2, minLen = 8, maxLen = 8)
    assert(got === ref(corpus2, bench2, 8, 8))
    assert(got.head === (1L, 1L, 8L, 8L, 1L))
    assert(got.map(_._3).max === 12L) // coverage reaches token 12
  }
}
