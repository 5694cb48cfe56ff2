package graft.operators

import graft.SparkSpec

/** [[QualityModel.scoreWithModel]] — the batched quality-classifier
  * boundary: scores pinned against an independent driver-side
  * recompute of the hashing-trick linear model, plus the boundary
  * invariants the LangIdSpec precedent demands (batch-size and
  * partitioning independence, column passthrough, loud misalignment).
  */
class QualityModelSpec extends SparkSpec {

  /** Independent reference: same model, separately written fold. */
  private def refScore(text: String, buckets: Int): Long = {
    def ph(s: String): Long = {
      var h = 0L
      s.codePoints().toArray.foreach(cp => h = (h * 1000003L + cp) % 2147483647L)
      h
    }
    def w(f: String): Long = (((ph(f) % buckets) * 2654435761L + 97L) % 2001L) - 1000L
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val feats = toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    if (feats.isEmpty) 0L
    else feats.map(w).sum * 1000L / feats.length // truncating, like DuckDB //
  }

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "Sort Merge JOIN beats shuffle  hash join!"),
    (2L, ""),
    (3L, "a"),
    (4L, "scan scan scan scan scan"),
    (5L, "ROW row RoW: row; row"))

  test("scores match the independent reference, across batch sizes and partitionings") {
    import spark.implicits._
    val want = docs.map { case (id, t) => id -> refScore(t, 1024) }.toMap
    for (batch <- Seq(1, 4, 64); parts <- Seq(1, 3)) {
      val df = docs.toDF("doc_id", "text").repartition(parts)
      val got = QualityModel.scoreWithModel(df, "text",
          new QualityModel.HashedLinearScorer(1024), batchSize = batch)
        .select("doc_id", "quality_model_score")
        .as[(Long, Long)].collect().toMap
      assert(got === want, s"batch=$batch parts=$parts")
    }
  }

  test("featureless text scores 0 and every input column passes through untouched") {
    import spark.implicits._
    val df = Seq((2L, "??!", "meta")).toDF("doc_id", "text", "extra")
    val out = QualityModel.scoreWithModel(df, "text",
      new QualityModel.HashedLinearScorer(1024))
    assert(out.columns.toSeq === Seq("doc_id", "text", "extra", "quality_model_score"))
    val row = out.as[(Long, String, String, Long)].collect().head
    assert(row === ((2L, "??!", "meta", 0L)))
  }

  test("a misaligned scorer fails loudly") {
    import spark.implicits._
    val broken = new QualityModel.BatchQualityScorer {
      override def scoreBatch(texts: Seq[String]): Seq[Long] = texts.map(_ => 1L).drop(1)
    }
    val ex = intercept[org.apache.spark.SparkException] {
      QualityModel.scoreWithModel(docs.toDF("doc_id", "text"), "text", broken).collect()
    }
    assert(ex.getMessage.contains("scores") || ex.getCause.getMessage.contains("scores"))
  }
}
