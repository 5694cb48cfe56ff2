package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Two-stage cross-scoring re-rank (operators.Rerank). The lexical
  * column path is oracle-gated end-to-end by q105; these tests pin the
  * operator semantics on adversarial small data and, critically, the
  * MODEL-BOUNDARY contract of rerankWithModel: partition-local bounded
  * batches, every pair scored exactly once, and results independent of
  * batch size and partitioning.
  */
class RerankSpec extends SparkSpec {
  import spark.implicits._

  private val run = "alpha bravo charlie delta echo foxtrot golf hotel"
  private def docs = Seq[(Long, String)](
    0L -> s"query context $run and some trailing words here",
    // shares the long run (guaranteed shared fingerprint) + extra overlap
    10L -> s"first candidate $run with charlie delta repeated context words",
    // shares the run only
    11L -> s"second candidate $run nothing else in common at all",
    // no overlap at all — must never become a candidate
    12L -> "completely disjoint vocabulary sentence with zero shared content"
  ).toDF("doc_id", "text")

  private def queries = docs.filter(col("doc_id") < 5)
  private def corpus = docs.filter(col("doc_id") >= 5)

  test("candidatePairs blocks on shared fingerprints; disjoint docs never pair") {
    val cand = Rerank.candidatePairs(queries, corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((0L, 10L)) && cand.contains((0L, 11L)),
      "docs sharing a >= w+k-1 token run must be candidates (winnowing guarantee)")
    assert(!cand.exists(_._2 == 12L), "disjoint doc leaked into candidates")
  }

  test("lexical rerank orders by exact Jaccard with doc_id tiebreak") {
    val cand = Rerank.candidatePairs(queries, corpus, "doc_id", "text")
    val got = Rerank.rerank(cand, queries, corpus, "doc_id", "text", k = 3)
      .orderBy(col("query_id"), col("rank")).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq ===
      Seq((0L, 10L, 1), (0L, 11L, 2)))
    // reference Jaccard, recomputed with plain Scala sets
    def toks(s: String) = s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet
    val all = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { r =>
      val (q, d) = (toks(all(r.getLong(0))), toks(all(r.getLong(1))))
      val exp = q.intersect(d).size.toDouble / math.max(q.union(d).size, 1)
      assert(r.getDouble(3) === exp, s"pair ${r.getLong(0)}-${r.getLong(1)}")
    }
  }

  test("rerankWithModel batches within the bound and scores every pair exactly once") {
    import scala.jdk.CollectionConverters._
    import RerankSpec.CountingState
    val cand = Rerank.candidatePairs(queries, corpus, "doc_id", "text")
    val nCand = cand.count()
    CountingState.batchSizes.clear()
    CountingState.scored.set(0)
    val got = Rerank.rerankWithModel(cand, queries, corpus, "doc_id", "text",
      k = 3, new RerankSpec.CountingScorer, batchSize = 1)
    got.count()
    assert(CountingState.scored.get() === nCand, "each candidate scored exactly once")
    assert(CountingState.batchSizes.asScala.forall(_ == 1), "batchSize bound violated")
  }

  test("rerankWithModel is invariant to batch size and partitioning") {
    val cand = Rerank.candidatePairs(queries, corpus, "doc_id", "text")
    val scorer = new Rerank.HashingKernelScorer(16)
    def rows(c: org.apache.spark.sql.DataFrame, bs: Int) =
      Rerank.rerankWithModel(c, queries, corpus, "doc_id", "text", 3, scorer, bs)
        .orderBy(col("query_id"), col("rank"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    val base = rows(cand, 1)
    assert(base.nonEmpty)
    assert(rows(cand, 7) === base)
    assert(rows(cand.repartition(5), 2) === base)
  }

  test("rerankWithModel preserves non-numeric id types (string UUIDs don't collapse to null)") {
    // same docs, string ids — a silent long cast would null ALL ids
    // and return one merged bogus group instead of per-query top-k
    val sdocs = docs.select(concat(lit("id-"), col("doc_id")).as("doc_id"), col("text"))
    val sq = sdocs.filter(col("doc_id") === "id-0")
    val sc = sdocs.filter(col("doc_id") =!= "id-0")
    val cand = Rerank.candidatePairs(sq, sc, "doc_id", "text")
    val got = Rerank.rerankWithModel(cand, sq, sc, "doc_id", "text",
        k = 3, new Rerank.HashingKernelScorer(16), batchSize = 2)
      .orderBy(col("query_id"), col("rank")).collect()
    assert(got.nonEmpty)
    assert(got.forall(r => r.getString(0) == "id-0" && r.getString(1).startsWith("id-")),
      "original string ids must pass through unchanged")
    // and the ranking agrees with the long-id run on the same data
    val longGot = Rerank.rerankWithModel(
        Rerank.candidatePairs(queries, corpus, "doc_id", "text"),
        queries, corpus, "doc_id", "text", 3, new Rerank.HashingKernelScorer(16), 2)
      .orderBy(col("query_id"), col("rank")).collect()
      .map(r => (s"id-${r.getLong(0)}", s"id-${r.getLong(1)}", r.getInt(2))).toSeq
    assert(got.map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq === longGot)
  }

  test("hashing-kernel scorer: identical texts score 1, disjoint score <= 0 bound") {
    val s = new Rerank.HashingKernelScorer(64)
    val Seq(same, disj) = s.scoreBatch(Seq(
      ("the quick brown fox", "the quick brown fox"),
      ("alpha bravo charlie", "xray yankee zulu")))
    assert(math.abs(same - 1.0) < 1e-12)
    assert(same > disj)
  }
}

/** Static (JVM-singleton) instrumentation state: a serialized scorer
  * instance deserializes to a COPY on the task side, but references to
  * this top-level object resolve to the shared module in local mode —
  * so counts written by tasks are visible to the test.
  */
object RerankSpec {
  object CountingState {
    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val scored = new java.util.concurrent.atomic.AtomicInteger
  }
  class CountingScorer extends Rerank.PairScorer {
    override def scoreBatch(pairs: Seq[(String, String)]): Seq[Double] = {
      CountingState.batchSizes.add(pairs.length)
      CountingState.scored.addAndGet(pairs.length)
      new Rerank.HashingKernelScorer(16).scoreBatch(pairs)
    }
  }
}
