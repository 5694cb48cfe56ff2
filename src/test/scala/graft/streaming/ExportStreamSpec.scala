package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Export

/** Streaming export absorb (EventStreams.exportAppendStream — the
  * batch append is oracle-gated end-to-end by q222): the stream's
  * artifact must equal the one-shot append sequence bit-for-bit
  * (stream ≡ batch), survive the read-back gate at every point, and
  * stay idempotent under re-delivery.
  */
class ExportStreamSpec extends SparkSpec {
  import spark.implicits._

  private def base = (1 to 100).map(i => (i.toLong, s"doc number $i"))
  private val b0 = (101 to 140).map(i => (i.toLong, s"doc number $i"))
  private val b1 = (141 to 150).map(i => (i.toLong, s"doc number $i"))

  private def replayOf(dir: String): Seq[(Long, Long)] =
    Export.readShardsInOrder(spark, dir)
      .select(col("doc_id"), col("position"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2).toSeq

  test("stream artifact == one-shot append sequence; verify gates green throughout") {
    implicit val sqlCtx = spark.sqlContext
    val streamed = tmpDir("export-stream") + "/data"
    Export.writeShardsWithManifest(
      base.toDF("doc_id", "text"), "doc_id", streamed, seed = 7L, rowsPerShard = 32L)
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.exportAppendStream(
      input.toDF().toDF("doc_id", "text"), "doc_id", streamed,
      baseSeed = 7L, checkpoint = tmpDir("export-stream-chk"))
    try {
      input.addData(b0: _*); q.processAllAvailable()
      input.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    assert(Export.verifyShards(spark, streamed).collect()
      .forall(_.getString(3) === "ok"))
    val m = Export.readManifest(streamed)
    assert((m.totalRows, m.lastBatch) === ((150L, 1L)))

    // batch twin: the same appends through the batch API on a fresh dir
    val batched = tmpDir("export-batch") + "/data"
    Export.writeShardsWithManifest(
      base.toDF("doc_id", "text"), "doc_id", batched, seed = 7L, rowsPerShard = 32L)
    Export.appendShardsWithManifest(
      b0.toDF("doc_id", "text"), "doc_id", batched, deltaSeed = 8L, batchId = 0L)
    Export.appendShardsWithManifest(
      b1.toDF("doc_id", "text"), "doc_id", batched, deltaSeed = 9L, batchId = 1L)
    assert(replayOf(streamed) === replayOf(batched))
  }
}
