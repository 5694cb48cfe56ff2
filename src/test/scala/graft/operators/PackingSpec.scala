package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Greedy no-split packing: the close/overflow/zero-token recurrence
  * pinned against a hand-walked expectation, determinism under
  * repartitioning (blocks are data values, not partitions), and the
  * never-split / never-truncate invariants the q234 oracle re-derives.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(ns: Seq[Int]) =
    ns.zipWithIndex.map { case (n, i) => (i.toLong, Seq.fill(n)("w").mkString(" ")) }
      .toDF("doc_id", "text")

  test("recurrence: closes on overflow, isolates over-window docs, rides zero-token docs") {
    // window 10: [4, 5] pack; 3 closes; 12 overflows alone; 0-token
    // docs join the open bin without closing it; 10 fits exactly
    val out = Packing.packGreedy(docs(Seq(4, 5, 3, 12, 0, 10, 1)),
        "doc_id", "text", windowTokens = 10L, blockDocs = 128L)
      .orderBy($"doc_id")
      .collect()
      .map(r => (r.getAs[Long]("bin_id"), r.getAs[Int]("bin_pos"),
        r.getAs[Long]("bin_fill"), r.getAs[Boolean]("overflow")))
    assert(out.toSeq === Seq(
      (0L, 0, 4L, false), // 4
      (0L, 1, 9L, false), // +5 = 9
      (1L, 0, 3L, false), // 3 would overflow -> new bin
      (2L, 0, 12L, true), // 12 > 10: alone, flagged
      (3L, 0, 0L, false), // post-overflow bin; zero tokens ride
      (3L, 1, 10L, false), // 10 fits exactly (fill 0 + 10 <= 10)
      (4L, 0, 1L, false))) // 10 + 1 would overflow -> new bin
  }

  test("bins never cross 128-doc blocks; bin ids are globally unique") {
    val out = Packing.packGreedy(docs(Seq.fill(200)(200)),
        "doc_id", "text", windowTokens = 256L, blockDocs = 128L)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bin_id")))
    // 200-token docs: one per bin; block 0 = docs 0..127, block 1 rest
    assert(out.forall { case (id, bin) => bin / 128 === id / 128 })
    assert(out.map(_._2).distinct.length === out.length)
  }

  test("deterministic under repartitioning (blocks are data values)") {
    val d = docs(Seq.tabulate(300)(i => i * 7 % 90))
    val a = Packing.packGreedy(d, "doc_id", "text", 256L)
      .orderBy($"doc_id").collect().toSeq
    val b = Packing.packGreedy(d.repartition(13, $"text"), "doc_id", "text", 256L)
      .orderBy($"doc_id").collect().toSeq
    assert(a === b)
  }
}
