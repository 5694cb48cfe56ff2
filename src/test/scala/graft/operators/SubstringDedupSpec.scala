package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Substring-level exact dedup (Dedup.repeatedSpans /
  * removeRepeatedSpans): span detection, interval merging, within-doc
  * repeats, full-document removal, and the no-op case. The q78/q79
  * oracle rows gate the same operators against DuckDB on the real
  * testdata; these pin the edge semantics on hand-built corpora.
  */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], k: Int) =
    Dedup.repeatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .orderBy($"doc_id", $"span_start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("cross-document repeated span is found in both documents, maximally merged") {
    // docs share the 6-token run "one two three four five six"; k=4
    // windows at starts 2..4 of doc 1 must merge into ONE span 2..7
    val docs = Seq(
      1L -> "intro one two three four five six taila uniquea",
      2L -> "one two three four five six closingb")
    assert(spans(docs, k = 4) === Seq(
      (1L, 2L, 7L, 6L),
      (2L, 1L, 6L, 6L)))
  }

  test("within-document repeat is flagged without any cross-doc copy") {
    // "alpha beta gamma delta" appears twice inside the same doc
    val docs = Seq(
      1L -> "alpha beta gamma delta fillerx fillery alpha beta gamma delta",
      2L -> "completely different words here nothing shared")
    assert(spans(docs, k = 4) === Seq(
      (1L, 1L, 4L, 4L),
      (1L, 7L, 10L, 4L)))
  }

  test("docs shorter than k and corpora with no repeats produce no spans") {
    assert(spans(Seq(1L -> "too short", 2L -> "too short"), k = 4).isEmpty)
    assert(spans(Seq(
      1L -> "every token here is different from those",
      2L -> "and these words never collide with anything"), k = 4).isEmpty)
  }

  test("adjacent (non-overlapping) duplicated windows merge into one span") {
    // doc 1 tokens 1-8 all duplicated via doc 2: k=4 window starts
    // 1..5 are each flagged and their contiguous coverage must union
    // into ONE maximal span 1..8, not five 4-token fragments
    val docs = Seq(
      1L -> "a1 a2 a3 a4 b1 b2 b3 b4",
      2L -> "a1 a2 a3 a4 b1 b2 b3 b4")
    assert(spans(docs, k = 4) === Seq(
      (1L, 1L, 8L, 8L),
      (2L, 1L, 8L, 8L)))
  }

  test("removeRepeatedSpans: exact-dup docs empty out; partial dups keep the remainder") {
    val docs = Seq(
      1L -> "one two three four five six seven eight", // exact dup of 2
      2L -> "one two three four five six seven eight",
      3L -> "prefixx one two three four five six seven eight suffixx",
      4L -> "nothing in common with anybody at all here")
    val got = Dedup.removeRepeatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k = 4)
      .orderBy($"doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val emptyFp = java.security.MessageDigest.getInstance("MD5")
      .digest("".getBytes("UTF-8")).map("%02x".format(_)).mkString
    def fp(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got === Seq(
      (1L, 8L, 8L, emptyFp),
      (2L, 8L, 8L, emptyFp),
      (3L, 10L, 8L, fp("prefixx suffixx")),
      // doc 4 untouched -> absent from the affected-docs report
    ))
    assert(!got.exists(_._1 == 4L))
  }

  test("keep-first: canonical (min doc,pos) occurrence survives, every other copy flagged") {
    // cross-doc dup: doc 1 holds the canonical copy, doc 2 loses it;
    // within-doc repeat in doc 3: first occurrence kept, second flagged
    val docs = Seq(
      1L -> "one two three four five six seven eight",
      2L -> "one two three four five six seven eight",
      3L -> "alpha beta gamma delta fillerx fillery alpha beta gamma delta")
    val got = Dedup.repeatedSpansKeepFirst(docs.toDF("doc_id", "text"), "doc_id", "text", k = 4)
      .orderBy($"doc_id", $"span_start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got === Seq((2L, 1L, 8L), (3L, 7L, 10L)),
      s"expected only the non-canonical copies flagged, got ${got.mkString(",")}")
    // and the removal keeps doc 1 whole, empties doc 2, trims doc 3
    val removed = Dedup.removeRepeatedSpansKeepFirst(
        docs.toDF("doc_id", "text"), "doc_id", "text", k = 4)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(removed === Seq((2L, 8L, 8L), (3L, 10L, 4L)))
    assert(!removed.exists(_._1 == 1L), "canonical doc must be untouched")
  }

  test("tokenization is the shared normalization: case and punctuation do not defeat the match") {
    val docs = Seq(
      1L -> "Alpha, Beta; GAMMA delta! epsilon zeta",
      2L -> "alpha beta gamma delta epsilon zeta")
    val got = spans(docs, k = 6)
    assert(got === Seq((1L, 1L, 6L, 6L), (2L, 1L, 6L, 6L)))
  }

  // ------------------------------------------------- saMaximalRepeats

  private def saSpans(docs: Seq[(Long, String)], minLen: Int, maxLen: Int = 32) =
    Dedup.saMaximalRepeats(docs.toDF("doc_id", "text"), "doc_id", "text", minLen, maxLen)
      .orderBy($"doc_id", $"span_start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  /** Brute-force reference: for every position the longest substring
    * (token-wise, capped at maxLen) occurring at another (doc, pos),
    * its exact occurrence count, then left-maximal filtering — plain
    * Scala sequences, no hashing anywhere.
    */
  private def refSaSpans(docs: Seq[(Long, String)], minLen: Int, maxLen: Int)
      : Seq[(Long, Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    }
    val positions = for {(id, ts) <- toks; p <- 1 to ts.size} yield (id, p)
    def window(id: Long, p: Int, l: Int): Option[Seq[String]] = {
      val ts = toks.find(_._1 == id).get._2
      if (p + l - 1 <= ts.size) Some(ts.slice(p - 1, p + l - 1)) else None
    }
    def occurrences(w: Seq[String]): Int =
      positions.count { case (id, p) => window(id, p, w.size).contains(w) }
    val best = positions.flatMap { case (id, p) =>
      val ls = (minLen to maxLen).filter(l =>
        window(id, p, l).exists(w => occurrences(w) >= 2))
      ls.lastOption.map { l =>
        (id, p, l, occurrences(window(id, p, l).get))
      }
    }
    best.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(_._2)
      ordered.zipWithIndex.collect {
        case ((id, p, l, occ), i)
            if !ordered.take(i).exists { case (_, q, lq, _) => q + lq >= p + l } =>
          (id, p.toLong, (p + l - 1).toLong, l.toLong, occ.toLong)
      }
    }.sortBy(r => (r._1, r._2))
  }

  test("saMaximalRepeats matches a brute-force reference on varied corpora") {
    val corpora = Seq(
      // exact dup docs + a partial overlap + noise
      Seq(1L -> "one two three four five six seven eight nine ten",
        2L -> "one two three four five six seven eight different tail here",
        3L -> "no shared content in this document at all whatsoever"),
      // within-doc repeat + cross-doc repeat of a different region
      Seq(1L -> "a b c d e f g h x1 x2 a b c d e f g h",
        2L -> "pre1 pre2 e f g h i j k l post1",
        3L -> "e f g h i j k l"),
      // triple occurrence (multiplicity > 2)
      Seq(1L -> "r1 r2 r3 r4 r5 r6 r7 r8 pad1",
        2L -> "r1 r2 r3 r4 r5 r6 r7 r8 pad2",
        3L -> "lead r1 r2 r3 r4 r5 r6 r7 r8"))
    corpora.foreach { docs =>
      val minLen = 4
      assert(saSpans(docs, minLen, 16) === refSaSpans(docs, minLen, 16),
        s"corpus ${docs.map(_._1).mkString(",")}")
    }
  }

  test("differential vs repeatedSpans: window merge overstates extent; SA form is exact") {
    // doc 1 = [A-run][B-run]: A matches doc 2 only, B matches doc 3
    // only. No 16-token copy of doc 1's full content exists anywhere.
    val docs = Seq(
      1L -> "a1 a2 a3 a4 a5 a6 a7 a8 b1 b2 b3 b4 b5 b6 b7 b8",
      2L -> "xx a1 a2 a3 a4 a5 a6 a7 a8 yy",
      3L -> "b1 b2 b3 b4 b5 b6 b7 b8 zz")
    // window approximation: adjacent flagged 8-windows MERGE into one
    // 16-token span for doc 1 — a span that is not itself repeated
    val merged = spans(docs, k = 8)
    assert(merged.contains((1L, 1L, 16L, 16L)),
      s"window form should merge to 1..16, got ${merged.mkString(",")}")
    // exact form: two separate 8-token spans, each with its true count
    val exact = saSpans(docs, minLen = 8)
    assert(exact.filter(_._1 == 1L) === Seq(
      (1L, 1L, 8L, 8L, 2L), (1L, 9L, 16L, 8L, 2L)))
    // and the exact multiplicities survive: a 3x repeat counts 3
    val tri = Seq(
      1L -> "t1 t2 t3 t4 t5 t6 t7 t8",
      2L -> "t1 t2 t3 t4 t5 t6 t7 t8",
      3L -> "t1 t2 t3 t4 t5 t6 t7 t8")
    assert(saSpans(tri, minLen = 8).forall(_._5 == 3L))
  }

  test("saMaximalRepeats: maxLen cap reports runs of cap-length spans; minLen floors detection") {
    // an 10-token repeat measured with maxLen=8: positions 1..3 all
    // reach the cap; left-maximality keeps each cap-length frontier
    val docs = Seq(
      1L -> "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10",
      2L -> "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")
    val capped = saSpans(docs, minLen = 4, maxLen = 8)
    assert(capped.filter(_._1 == 1L).map(r => (r._2, r._3)) ===
      Seq((1L, 8L), (2L, 9L), (3L, 10L)))
    // below minLen nothing surfaces
    assert(saSpans(Seq(1L -> "s1 s2 s3", 2L -> "s1 s2 s3"), minLen = 4).isEmpty)
  }
}
