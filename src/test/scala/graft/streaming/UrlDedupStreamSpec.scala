package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Warc

/** The streaming twin of q134's URL dedup: canonicalize + keep-min
  * over micro-batches must agree with the one-shot batch rule on
  * id-ordered drops, cross-batch recrawl aliases must drop against
  * the published store, and re-delivering already-published URLs must
  * be a no-op (the output IS the seen-set — the crash-replay
  * mechanism, exercised at the API boundary).
  */
class UrlDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  // the q134 alias pattern: page p served clean and served messy
  private def clean(p: Int) = s"https://www.site${p % 7}.org/p/$p?a=1&b=2"
  private def messy(p: Int) =
    s"HTTPS://WWW.SITE${p % 7}.ORG:443/p/$p?b=2&utm_source=x&a=1#frag"

  test("stream == batch keep-min on ordered drops; aliases drop across batches; replays are no-ops") {
    implicit val sqlCtx = spark.sqlContext
    val outDir = tmpDir("uds-out")
    // batch 1: pages 1-3, clean forms (+ an in-batch alias of page 1:
    // the min id must win WITHIN the batch)
    val b1 = Seq((10L, clean(1)), (11L, messy(1)), (12L, clean(2)), (13L, clean(3)))
    // batch 2: recrawl — messy aliases of pages 1-3 (all drop against
    // the store) plus one novel page
    val b2 = Seq((20L, messy(1)), (21L, messy(2)), (22L, messy(3)), (23L, clean(4)))

    val input = MemoryStream[(Long, String)]
    val q = EventStreams.urlDedupStream(
      input.toDF().toDF("id", "url"), "id", "url", outDir, tmpDir("uds-chk"))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      // re-deliver batch 2's content verbatim (the at-least-once
      // case): every canonical is already published -> zero new rows
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(outDir)
      .select("id", "canonical_url", "batch_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    val batchRule = (b1 ++ b2).toDF("id", "url")
      .select(col("id"), Warc.urlCanonical(col("url")).as("canonical_url"))
      .groupBy("canonical_url").agg(min("id").as("id"))
      .select("id", "canonical_url").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    // stream survivors equal the one-shot batch keep-min (ordered drops)
    assert(got.map(t => (t._1, t._2)) === batchRule)
    // and the expected shape: 10 beats alias 11 in-batch; 20-22 drop;
    // 23 is batch 2's only survivor; the replayed batch added nothing
    assert(got.map(_._1) === Seq(10L, 12L, 13L, 23L))
    assert(got.collect { case (id, _, b) if b >= 1L => id } === Seq(23L))
  }
}
