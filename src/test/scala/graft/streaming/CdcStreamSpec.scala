package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Quality

/** Streaming CDC over full-snapshot drops (EventStreams.cdcStream —
  * oracle-gated end-to-end by q185 through the batch absorb): the
  * stream's accumulated log must equal the one-shot absorb sequence,
  * the head must track the latest snapshot, a re-delivered committed
  * batch must be a no-op, and a half-committed replay must converge
  * (overwrite, not append).
  */
class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  private val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c"))
  private val v2 = Seq((1L, "a"), (2L, "B"), (4L, "d")) // 3 removed, 2 changed, 4 added

  private def logOf(dir: String): Set[(Long, Long, String)] =
    Quality.readCdcLog(spark, dir)
      .select(col("batch_id").cast("long"), col("id"), col("change"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  private val expected = Set(
    (0L, 1L, "added"), (0L, 2L, "added"), (0L, 3L, "added"),
    (1L, 2L, "changed"), (1L, 3L, "removed"), (1L, 4L, "added"))

  test("stream log == one-shot absorb sequence; re-delivered batches are no-ops") {
    implicit val sqlCtx = spark.sqlContext
    val (state, logd) = (tmpDir("cdc-state"), tmpDir("cdc-log"))
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.cdcStream(input.toDF().toDF("doc_id", "t"),
      "doc_id", "t", state, logd, tmpDir("cdc-chk"))
    try {
      input.addData(v1: _*); q.processAllAvailable()
      input.addData(v2: _*); q.processAllAvailable()
    } finally q.stop()
    assert(logOf(logd) === expected)
    // one-shot twin on fresh dirs agrees batch for batch
    val (s2, l2) = (tmpDir("cdc-state2"), tmpDir("cdc-log2"))
    Quality.cdcAbsorb(spark, s2, l2, v1.toDF("doc_id", "t"), "doc_id", "t", 0L)
    Quality.cdcAbsorb(spark, s2, l2, v2.toDF("doc_id", "t"), "doc_id", "t", 1L)
    assert(logOf(l2) === expected)
    // committed replay at the API boundary: absorb batch 1 again with
    // DIFFERENT data — the skip must fire on the id, data untouched
    Quality.cdcAbsorb(spark, s2, l2,
      Seq((9L, "x")).toDF("doc_id", "t"), "doc_id", "t", 1L)
    assert(logOf(l2) === expected)
  }

  test("a half-committed batch replay overwrites its own log dir, never appends") {
    // simulate the crash window: the log dir for batch 1 exists but
    // the head still points at gen 0 (the pre-flip state). A replay
    // recomputes the same diff and must OVERWRITE.
    val (state, logd) = (tmpDir("cdc-state3"), tmpDir("cdc-log3"))
    Quality.cdcAbsorb(spark, state, logd, v1.toDF("doc_id", "t"), "doc_id", "t", 0L)
    // write a bogus half-committed batch-1 log the replay must replace
    Seq((99L, "bogus")).toDF("id", "change")
      .write.mode("overwrite").parquet(s"$logd/batch_id=1")
    Quality.cdcAbsorb(spark, state, logd, v2.toDF("doc_id", "t"), "doc_id", "t", 1L)
    assert(logOf(logd) === expected)
    // the head now reflects v2: absorbing v2 again under a NEW id
    // yields an empty delta (nothing changed)
    Quality.cdcAbsorb(spark, state, logd, v2.toDF("doc_id", "t"), "doc_id", "t", 2L)
    assert(logOf(logd) === expected) // batch 2's dir exists but holds zero rows
  }
}
