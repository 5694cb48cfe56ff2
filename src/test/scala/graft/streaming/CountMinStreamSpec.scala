package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Quality

/** Streaming twin of the persisted count-min fold: because CMS is a
  * linear sketch, the foreachBatch loop over micro-batches must leave
  * state BIT-IDENTICAL to a one-shot sketch over everything streamed —
  * stronger than the MG twin's set equality, and exactly what q155
  * hash-gates at the batch boundary.
  */
class CountMinStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed micro-batches leave the identical cell array as a one-shot build") {
    implicit val sqlCtx = spark.sqlContext
    val stateDir = tmpDir("cms-stream") + "/state"
    val b1 = (0 until 30).map(i => (i.toLong, s"w${i % 7} common mid${i % 3}"))
    val b2 = (0 until 25).map(i => (100L + i, s"w${i % 5} common tail$i"))

    val input = MemoryStream[(Long, String)]
    val q = EventStreams.countMinStream(
      input.toDF().toDF("doc_id", "text"), "text", stateDir,
      tmpDir("cms-chk"), d = 3, w = 32)
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = Quality.readCmsSketch(spark, stateDir)
      .collect()(0).getSeq[Long](0)
    val oneShot = (b1 ++ b2).toDF("doc_id", "text")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      .agg(graft.functions.CountMin.sketch(3, 32)(col("term")))
      .collect()(0).getSeq[Long](0)
    assert(streamed === oneShot)
    // every row of the matrix accounts for every token exactly once
    val nTokens = (b1 ++ b2).map(_._2.split(" ").length.toLong).sum
    (0 until 3).foreach { j =>
      assert(streamed.slice(j * 32, (j + 1) * 32).sum === nTokens)
    }
  }
}
