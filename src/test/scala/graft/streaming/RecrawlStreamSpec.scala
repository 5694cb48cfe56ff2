package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Robots

/** Streaming recrawl estimation (EventStreams.recrawlStream —
  * oracle-gated end-to-end by q195 through the batch fold): the
  * stream's committed per-page state must equal the one-shot fold
  * sequence, a re-delivered cycle must be a no-op, and observation
  * gaps (a page absent from one cycle) must skip, not reset.
  */
class RecrawlStreamSpec extends SparkSpec {
  import spark.implicits._

  // A changes at v2 and v3; B present at v1/v3 only, unchanged (the
  // gap-skip case); C first seen at v2, unchanged after
  private val v1 = Seq((1L, "a0"), (2L, "b"))
  private val v2 = Seq((1L, "a1"), (3L, "c"))
  private val v3 = Seq((1L, "a2"), (2L, "b"), (3L, "c"))

  private def stateOf(dir: String): Map[Long, (Long, Long)] =
    Robots.readRecrawlState(spark, dir)
      .select(col("id"), col("n_obs"), col("n_changes"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  private val expected = Map(
    1L -> (3L, 2L), // observed thrice, changed twice
    2L -> (2L, 0L), // gap at v2 skips — two observations, no change
    3L -> (2L, 0L))

  test("stream state == one-shot fold; re-delivered cycles are no-ops") {
    implicit val sqlCtx = spark.sqlContext
    val state = tmpDir("rc-state")
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.recrawlStream(input.toDF().toDF("doc_id", "t"),
      "doc_id", "t", state, tmpDir("rc-chk"))
    try {
      input.addData(v1: _*); q.processAllAvailable()
      input.addData(v2: _*); q.processAllAvailable()
      input.addData(v3: _*); q.processAllAvailable()
    } finally q.stop()
    assert(stateOf(state) === expected)
    // one-shot twin agrees fold for fold
    val s2 = tmpDir("rc-state2")
    Robots.recrawlIncrement(spark, s2, v1.toDF("doc_id", "t"), "doc_id", "t", 0L)
    Robots.recrawlIncrement(spark, s2, v2.toDF("doc_id", "t"), "doc_id", "t", 1L)
    Robots.recrawlIncrement(spark, s2, v3.toDF("doc_id", "t"), "doc_id", "t", 2L)
    assert(stateOf(s2) === expected)
    // committed replay with DIFFERENT data: the id-skip must fire
    Robots.recrawlIncrement(spark, s2,
      Seq((9L, "x")).toDF("doc_id", "t"), "doc_id", "t", 2L)
    assert(stateOf(s2) === expected)
  }

  test("ad-hoc folds without batch ids still accumulate; duplicate rows collapse") {
    val s = tmpDir("rc-state3")
    // duplicate in-batch rows for one id collapse to one observation
    Robots.recrawlIncrement(spark, s,
      Seq((1L, "a"), (1L, "a")).toDF("doc_id", "t"), "doc_id", "t")
    Robots.recrawlIncrement(spark, s,
      Seq((1L, "b")).toDF("doc_id", "t"), "doc_id", "t")
    assert(stateOf(s) === Map(1L -> (2L, 1L)))
  }
}
