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
}
