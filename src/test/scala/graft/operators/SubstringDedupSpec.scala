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
}
