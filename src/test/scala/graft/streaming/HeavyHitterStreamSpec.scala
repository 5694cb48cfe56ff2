package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Quality

/** Streaming twin of the incremental heavy-hitter fold: the
  * foreachBatch loop over micro-batches must agree EXACTLY with both
  * the batch-at-a-time fold (q124's hash-gated shape) and the one-shot
  * Quality.heavyHittersExact answer — the mergeable-summaries bound is
  * what makes all three the same set.
  */
class HeavyHitterStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stream fold == batch fold == one-shot exact answer") {
    implicit val sqlCtx = spark.sqlContext
    val base = tmpDir("hhs")
    val stateDir = s"$base/state"
    val corpusDir = s"$base/corpus"
    // skew lives entirely in batch 1; batch 2 is tail + a second hot
    // term that only crosses the threshold once both batches merge
    val b1 = (Seq.fill(25)("hot") ++ Seq.fill(9)("late"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val b2 = (Seq.fill(9)("late") ++ (0 until 20).map(i => s"tail$i"))
      .zipWithIndex.map { case (w, i) => (100L + i, w) }

    val input = MemoryStream[(Long, String)]
    val q = EventStreams.heavyHittersStream(
      input.toDF().toDF("doc_id", "text"), "text", stateDir, corpusDir,
      tmpDir("hhs-chk"), capacity = 16)
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = Quality.heavyHittersFromState(
        spark.read.parquet(corpusDir), "text", stateDir, support = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    val whole = (b1 ++ b2).toDF("doc_id", "text")
    val oneShot = Quality.heavyHittersExact(whole, "text", support = 5, capacity = 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    // 63 tokens total; threshold cnt*5 > 63 => cnt >= 13: hot (25) and
    // late (18, split 9+9 across the boundary) qualify
    assert(oneShot === Set(("hot", 25L), ("late", 18L)))
    assert(streamed === oneShot)
  }

  test("restarted stream refuses state from a different scheme") {
    implicit val sqlCtx = spark.sqlContext
    val base = tmpDir("hhs2")
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.heavyHittersStream(
      input.toDF().toDF("doc_id", "text"), "text", s"$base/state", s"$base/corpus",
      tmpDir("hhs2-chk"), capacity = 16)
    try { input.addData((0L, "a b c")); q.processAllAvailable() } finally q.stop()
    val input2 = MemoryStream[(Long, String)]
    val q2 = EventStreams.heavyHittersStream(
      input2.toDF().toDF("doc_id", "text"), "text", s"$base/state", s"$base/corpus",
      tmpDir("hhs2-chk2"), capacity = 32)
    try {
      input2.addData((1L, "d e f"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      assert(e.getMessage.contains("scheme") ||
        Option(e.getCause).exists(_.getMessage.contains("scheme")))
    } finally q2.stop()
  }
}
