package graft.operators

import graft.SparkSpec

/** BPE trainer: differential against a single-machine reference
  * implementation of Sennrich's algorithm (same tie-break, same greedy
  * non-overlapping merge application), segmentation of unseen words,
  * determinism, and empty/min-freq edges.
  */
class BpeSpec extends SparkSpec {

  // ---- single-machine reference (the textbook algorithm) ----
  private def refInit(w: String): List[String] = w.split("").toList :+ Bpe.EndOfWord

  private def refApply(sym: List[String], a: String, b: String): List[String] = {
    val out = List.newBuilder[String]
    var rest = sym
    while (rest.nonEmpty) {
      rest match {
        case x :: y :: tl if x == a && y == b => out += (a + b); rest = tl
        case x :: tl => out += x; rest = tl
        case Nil => ()
      }
    }
    out.result()
  }

  private def refTrain(
      wordFreq: Map[String, Long], n: Int, minFreq: Long): Seq[(String, String, Long)] = {
    var words: Map[List[String], Long] =
      wordFreq.groupMapReduce { case (w, _) => refInit(w) } { case (_, f) => f }(_ + _)
    val out = Seq.newBuilder[(String, String, Long)]
    var done = false
    var i = 0
    while (i < n && !done) {
      val counts = words.toSeq
        .flatMap { case (sym, f) => sym.zip(sym.tail).map(p => (p, f)) }
        .groupMapReduce(_._1)(_._2)(_ + _)
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (c < minFreq) done = true
        else {
          out += ((a, b, c))
          words = words.groupMapReduce { case (sym, _) => refApply(sym, a, b) } {
            case (_, f) => f }(_ + _)
          i += 1
        }
      }
    }
    out.result()
  }

  // the classic corpus (Sennrich et al. fig. 1 shape)
  private val classicFreq = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
  private def classicDf = {
    import spark.implicits._
    classicFreq.toSeq
      .flatMap { case (w, f) => Seq.fill(f.toInt)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
  }

  test("differential vs the single-machine reference on the classic corpus") {
    val got = Bpe.trainMerges(classicDf, "text", numMerges = 8, minFreq = 2)
      .map(m => (m.left, m.right, m.freq))
    val want = refTrain(classicFreq, 8, 2)
    assert(got === want)
    // sanity on the first merges: 'es' then 'est' then 'est</w>'
    assert(got.take(3).map(t => t._1 + t._2) ===
      Seq("es", "est", "est" + Bpe.EndOfWord))
  }

  test("training is deterministic") {
    val a = Bpe.trainMerges(classicDf, "text", numMerges = 5)
    val b = Bpe.trainMerges(classicDf, "text", numMerges = 5)
    assert(a === b)
  }

  test("segment encodes UNSEEN words with the trained merges (reference-identical)") {
    import spark.implicits._
    val merges = Bpe.trainMerges(classicDf, "text", numMerges = 8, minFreq = 2)
    val unseen = Seq("lowest", "newer", "wide").toDF("word")
    val got = Bpe.segment(unseen, "word", merges, "sym")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    val want = Seq("lowest", "newer", "wide").map { w =>
      w -> merges.foldLeft(refInit(w))((s, m) => refApply(s, m.left, m.right))
    }.toMap
    assert(got === want)
  }

  test("greedy non-overlap: 'aaa' under merge (a,a) becomes [aa, a]") {
    import spark.implicits._
    val df = Seq("aaa").toDF("word")
    val got = Bpe.segment(df, "word", Seq(Bpe.Merge(0, "a", "a", "aa", 99L)), "sym")
      .collect()(0).getSeq[String](1).toList
    assert(got === List("aa", "a", Bpe.EndOfWord))
  }

  test("empty corpus and unreachable minFreq train nothing") {
    import spark.implicits._
    assert(Bpe.trainMerges(Seq.empty[(Long, String)].toDF("doc_id", "text"), "text", 5)
      === Seq.empty)
    assert(Bpe.trainMerges(classicDf, "text", 5, minFreq = 1000L) === Seq.empty)
  }
}
