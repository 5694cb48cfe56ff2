package graft.operators

import graft.SparkSpec

/** [[Dedup.lineDedup]] — the C4/RefinedWeb exact line-dedup stage —
  * pinned against a driver-side reference of the keep-first
  * recurrence, plus the edge semantics the oracle can't isolate:
  * within-doc repeats, fully-claimed docs (empty output text), and
  * partition-independence (the winner is (doc, line_no)-minimal, not
  * scheduler-ordered).
  */
class LineDedupSpec extends SparkSpec {

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    Dedup.lineDedup(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, String)]
      .collect()
      .map { case (id, n, k, t) => id -> (n, k, t) }
      .toMap
  }

  /** Reference: first-occurrence set in the GIVEN doc order (callers
    * pass docs pre-sorted by their processing order). */
  private def reference(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    val seen = scala.collection.mutable.HashSet.empty[String]
    docs.map { case (id, text) =>
      val lines = text.split("\n", -1)
      val kept = lines.filter(l => seen.add(l))
      id -> (lines.length.toLong, kept.length.toLong, kept.mkString("\n"))
    }.toMap
  }

  test("cross-doc and within-doc repeats resolve to the first (doc, line_no) occurrence") {
    val docs = Seq(
      0L -> "alpha\nbeta\nalpha", // within-doc repeat: second alpha drops
      1L -> "beta\ngamma", // beta claimed by doc 0
      2L -> "gamma\ndelta\nbeta", // all but delta claimed
      3L -> "alpha\nbeta\ngamma") // fully claimed -> empty text
    val got = run(docs)
    assert(got === reference(docs))
    assert(got(0L) === ((3L, 2L, "alpha\nbeta")))
    assert(got(3L) === ((3L, 0L, "")))
  }

  test("kept lines keep their ORIGINAL order, not sorted-content order") {
    val docs = Seq(0L -> "zebra\napple\nmango")
    assert(run(docs)(0L)._3 === "zebra\napple\nmango")
  }

  test("incremental: a two-batch split equals the one-shot run on the later batch") {
    import spark.implicits._
    val docs = Seq(
      0L -> "alpha\nbeta", 2L -> "gamma\ngamma\ndelta", // day 1 (even)
      1L -> "beta\nepsilon\nepsilon", 3L -> "delta\nzeta\nepsilon") // day 2 (odd)
    val df = docs.toDF("doc_id", "text")
    val day1 = df.filter($"doc_id" % 2 === 0)
    val day2 = df.filter($"doc_id" % 2 === 1)
    val got = Dedup.lineDedupAgainst(day2, "doc_id", "text", Dedup.lineState(day1, "text"))
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // one-shot over all docs in (day, doc_id) order = even docs first
    val want = reference(docs.sortBy(d => (d._1 % 2, d._1))).filter(_._1 % 2 == 1)
    assert(got === want)
    assert(got(1L) === ((3L, 1L, "epsilon"))) // beta claimed day 1; epsilon repeat drops
    assert(got(3L) === ((3L, 1L, "zeta"))) // delta day-1, epsilon claimed by doc 1
    // state advance is O(delta): new state = old ∪ kept lines
    val kept = Dedup.lineDedupAgainst(day2, "doc_id", "text", Dedup.lineState(day1, "text"))
    val newState = Dedup.lineState(day1, "text")
      .union(Dedup.lineState(kept.filter($"text" =!= ""), "text")).distinct()
    assert(newState.as[String].collect().toSet ===
      Set("alpha", "beta", "gamma", "delta", "epsilon", "zeta"))
  }

  test("matches the reference on a seeded corpus, independent of input partitioning") {
    val r = new scala.util.Random(42)
    val vocab = Vector("sort", "scan", "join", "agg", "row", "key", "col")
    val docs = (0L until 60L).map { id =>
      id -> Seq.fill(1 + r.nextInt(6))(
        Seq.fill(3)(vocab(r.nextInt(vocab.size))).mkString(" ")).mkString("\n")
    }
    val want = reference(docs)
    import spark.implicits._
    for (parts <- Seq(1, 7)) {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(docs.map(d => (d._1, d._2)), parts).toDF("doc_id", "text").rdd,
        docs.toDF("doc_id", "text").schema)
      val got = Dedup.lineDedup(df, "doc_id", "text")
        .as[(Long, Long, Long, String)].collect()
        .map { case (id, n, k, t) => id -> (n, k, t) }.toMap
      assert(got === want, s"parts=$parts")
    }
  }
}
