package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stupid-backoff n-gram LM scoring (operators.NgramLm), leave-one-
  * document-out form. The ppm surface is oracle-gated end-to-end by
  * q108; these tests pin the backoff cascade and integer arithmetic
  * against a plain-Scala reference, partitioning invariance of the
  * integer form, the quality-signal direction (familiar > gibberish —
  * the property the held-out subtraction exists to preserve), and the
  * float log₂ surface within tolerance of the same reference.
  */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private def tok(s: String) =
    s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  private final case class Counts(
      c1: Map[String, Long], c2: Map[String, Long], c3: Map[String, Long],
      ctotal: Long)

  private def count(docs: Seq[(Long, String)]): Map[Long, Counts] = {
    val toks = docs.map { case (id, t) => id -> tok(t) }
    def grams(ts: Seq[String], n: Int): Seq[String] =
      if (ts.size >= n) ts.sliding(n).map(_.mkString(" ")).toSeq else Nil
    def tally(xs: Seq[String]) =
      xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val all1 = tally(toks.flatMap(_._2))
    val all2 = tally(toks.flatMap(d => grams(d._2, 2)))
    val all3 = tally(toks.flatMap(d => grams(d._2, 3)))
    val total = toks.map(_._2.size.toLong).sum
    // leave-one-out: per doc, subtract its own contribution
    toks.map { case (id, ts) =>
      val d1 = tally(ts); val d2 = tally(grams(ts, 2)); val d3 = tally(grams(ts, 3))
      def minus(all: Map[String, Long], mine: Map[String, Long]) =
        all.map { case (g, c) => g -> (c - mine.getOrElse(g, 0L)) }
      id -> Counts(minus(all1, d1), minus(all2, d2), minus(all3, d3),
        total - ts.size)
    }.toMap
  }

  /** Reference ppm scorer: integer cascade per token, leave-one-out. */
  private def ref(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long, Long, Long, Long)] = {
    val loo = count(docs)
    docs.map { case (id, t) => id -> tok(t) }
      .filter(_._2.size >= 3).map { case (id, ts) =>
        val c = loo(id)
        val scores = (2 until ts.size).map { i =>
          val (w1, w2, w) = (ts(i - 2), ts(i - 1), ts(i))
          if (c.c3.getOrElse(s"$w1 $w2 $w", 0L) >= 1)
            (1000000L * c.c3(s"$w1 $w2 $w") / c.c2(s"$w1 $w2"), 0)
          else if (c.c2.getOrElse(s"$w2 $w", 0L) >= 1)
            (1000000L * 2 * c.c2(s"$w2 $w") / (5 * c.c1(w2)), 1)
          else if (c.c1.getOrElse(w, 0L) >= 1)
            (1000000L * 4 * c.c1(w) / (25 * c.ctotal), 2)
          else (0L, 3)
        }
        val n = scores.size.toLong
        id -> (n,
          scores.count(_._2 == 0).toLong, scores.count(_._2 == 1).toLong,
          scores.count(_._2 == 2).toLong, scores.count(_._2 == 3).toLong,
          scores.map(_._1).sum / n)
      }.toMap
  }

  private val docs = Seq[(Long, String)](
    // repeated phrasing across docs 1/2 -> trigram hits
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "the quick brown fox runs under the lazy dog",
    // shares bigrams with 1/2 but its trigrams are unique -> bigram backoff
    3L -> "quick brown dog jumps over fox",
    // mostly tokens no other doc has -> unigram backoff + OOV zeros
    4L -> "zebra quark nebula fox brown xylophone",
    // too short to score
    5L -> "hi there")

  private def got(d: Seq[(Long, String)]) =
    NgramLm.scoreDocsPpm(d.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap

  test("ppm scores match the leave-one-out BigInt reference, including the backoff census") {
    assert(got(docs) === ref(docs))
    // every level of the cascade is actually exercised by the fixture
    val r = ref(docs)
    assert(r.values.map(_._2).sum > 0, "no trigram hits in fixture")
    assert(r.values.map(_._3).sum > 0, "no bigram backoffs in fixture")
    assert(r.values.map(_._4).sum > 0, "no unigram backoffs in fixture")
    assert(r.values.map(_._5).sum > 0, "no OOV tokens in fixture")
    // sub-trigram docs never appear
    assert(!got(docs).contains(5L))
  }

  test("integer form is invariant to input partitioning (no float folds anywhere)") {
    val base = got(docs)
    val repart = NgramLm.scoreDocsPpm(
        docs.toDF("doc_id", "text").repartition(7), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(repart === base)
  }

  test("held-out semantics: familiar text outscores gibberish (self-hit bias removed)") {
    val r = got(docs)
    assert(r(1L)._6 > r(4L)._6,
      s"predictable doc must outscore the novel one: ${r(1L)} vs ${r(4L)}")
    // and the gibberish doc's unique trigrams did NOT count as hits
    assert(r(4L)._2 == 0L, s"doc 4 must have zero trigram hits, got ${r(4L)}")
  }

  test("log2 surface tracks the reference within float tolerance") {
    val loo = count(docs)
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    val expect = docs.map { case (id, t) => id -> tok(t) }
      .filter(_._2.size >= 3).map { case (id, ts) =>
        val c = loo(id)
        val lps = (2 until ts.size).map { i =>
          val (w1, w2, w) = (ts(i - 2), ts(i - 1), ts(i))
          if (c.c3.getOrElse(s"$w1 $w2 $w", 0L) >= 1)
            lg2(c.c3(s"$w1 $w2 $w").toDouble) - lg2(c.c2(s"$w1 $w2").toDouble)
          else if (c.c2.getOrElse(s"$w2 $w", 0L) >= 1)
            lg2(2.0 * c.c2(s"$w2 $w")) - lg2(5.0 * c.c1(w2))
          else if (c.c1.getOrElse(w, 0L) >= 1)
            lg2(4.0 * c.c1(w)) - lg2(25.0 * c.ctotal)
          else lg2(4.0) - lg2(25.0 * (c.ctotal + 1))
        }
        id -> lps.sum / lps.size
      }.toMap
    val gotLp = NgramLm.logProbPerToken(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(gotLp.keySet === expect.keySet)
    gotLp.foreach { case (id, v) =>
      assert(math.abs(v - expect(id)) < 1e-9, s"doc $id: $v vs ${expect(id)}")
    }
    // all log-probs are <= 0 (scores are probabilities or discounted)
    assert(gotLp.values.forall(_ <= 0.0))
  }
}
