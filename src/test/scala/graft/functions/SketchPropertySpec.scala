package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.operators.Quality

/** Property tests for the two sketch primitives the exact operators
  * lean on (q116/q119/q124/q125's correctness arguments are theorems
  * about these, so the theorems get tested on arbitrary inputs, not
  * just fixtures; seeded samples keep failures replayable — the
  * DedupPropertySpec idiom).
  *
  * Pure JVM-side properties (no Spark jobs in the loop, so hundreds
  * of cases stay cheap): the distributed aggregators call exactly
  * these code paths.
  */
class SketchPropertySpec extends SparkSpec {

  // ------------------------------------------------------- Misra–Gries

  private val term: Gen[String] =
    Gen.frequency(
      5 -> Gen.oneOf("hot", "warm", "mild"), // planted heavy mass
      3 -> Gen.choose(0, 30).map(i => s"mid$i"),
      2 -> Gen.choose(0, 5000).map(i => s"tail$i"))
  private val stream: Gen[List[String]] =
    Gen.choose(50, 400).flatMap(n => Gen.listOfN(n, term))

  private def runMg(terms: Seq[String], capacity: Int): Map[String, Long] = {
    val agg = new MisraGriesAggregator(capacity)
    terms.foldLeft(agg.zero)(agg.reduce)
  }

  test("MG containment: every term above N/(cap+1) survives ANY split + merge tree") {
    for (i <- 0 until 60) {
      val terms = stream(Gen.Parameters.default, Seed(100L + i)).get
      val n = terms.length
      for (capacity <- Seq(4, 8, 16)) {
        val exact = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val mustSurvive = exact.collect {
          case (t, c) if c > n.toLong / (capacity + 1) => t
        }.toSet
        // single pass
        val single = runMg(terms, capacity).keySet
        assert(mustSurvive.subsetOf(single),
          s"seed=$i cap=$capacity single-pass dropped ${mustSurvive -- single}")
        // arbitrary 3-way split merged pairwise (left-deep tree)
        val (a, rest) = terms.splitAt(n / 3)
        val (b, c2) = rest.splitAt(rest.length / 2)
        val merged = MisraGries.mergeCounts(
          MisraGries.mergeCounts(runMg(a, capacity), runMg(b, capacity), capacity),
          runMg(c2, capacity), capacity)
        assert(mustSurvive.subsetOf(merged.keySet),
          s"seed=$i cap=$capacity merge tree dropped ${mustSurvive -- merged.keySet}")
        assert(merged.size <= capacity, "merge rule broke the size bound")
      }
    }
  }

  test("MG counts never exceed true frequencies (under-count invariant)") {
    for (i <- 0 until 40) {
      val terms = stream(Gen.Parameters.default, Seed(900L + i)).get
      val exact = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
      runMg(terms, 8).foreach { case (t, c) =>
        assert(c <= exact(t), s"seed=$i: residual $c above true count ${exact(t)} for '$t'")
      }
    }
  }

  // ------------------------------------------------------------ Bloom

  test("bloom: inserted keys always pass; heavyHittersExact equals brute force on random corpora") {
    import spark.implicits._
    // one Spark-side randomized round (jobs are the expensive part —
    // the BloomFilterSpec covers the fixed design points)
    val docGen = for {
      n <- Gen.choose(1, 8)
      ws <- Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta", "x1", "x2", "x3"))
    } yield ws.mkString(" ")
    for (i <- 0 until 3) {
      val texts = Gen.listOfN(30, docGen)(Gen.Parameters.default, Seed(5000L + i)).get
      val docs = texts.zipWithIndex.map { case (t, id) => (id.toLong, t) }.toDF("doc_id", "text")
      val bench = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 7 === 0)
      val kept = Quality.decontaminateBloomKeep(docs, bench, "doc_id", "text", n = 3)
        .select("doc_id").as[Long].collect().toSet
      // brute force: doc survives iff it shares no distinct 3-gram with bench
      def grams(t: String): Set[String] = {
        val toks = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
        else Set(toks.mkString(" "))
      }
      val benchGrams = texts.zipWithIndex.filter(_._2 % 7 == 0).flatMap(t => grams(t._1)).toSet
      val expect = texts.zipWithIndex
        .filter { case (t, id) => grams(t).intersect(benchGrams).isEmpty }
        .map(_._2.toLong).toSet
      assert(kept === expect, s"seed=$i bloom keep diverged from brute force")
    }
  }
}
