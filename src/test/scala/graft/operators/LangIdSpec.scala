package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

/** The language-ID model boundary (LangId.langIdWithModel; q217 gates
  * the pipeline shape end-to-end): the stand-in classifier must equal
  * the Column heuristic bit-for-bit, and results must be invariant to
  * partitioning and batch boundaries — the contract a real inference
  * client has to keep when it replaces the stand-in.
  */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat and it is warm"),
    (2L, "el perro corre en la casa de los vecinos"),
    (3L, "der hund und die katze auf das sofa"),
    (4L, "le chat est dans un jardin pour ce soir"),
    (5L, "zzz qqq xxx"), // no stopword hits -> und
    (6L, ""), // empty -> und
    (7L, "the el THE EL the el"), // en/es tie on 3 hits each -> earlier lang (en)
    (8L, null.asInstanceOf[String])) // null classifies as empty -> und
    .toDF("doc_id", "text")

  test("stand-in classifier equals TextFunctions.langId bit-for-bit (incl. ties, und, null)") {
    val viaBoundary = LangId.langIdWithModel(
        docs, "text", new LangId.StopwordLangClassifier)
      .select($"doc_id", $"lang_detected").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaColumn = docs
      .select($"doc_id", TextFunctions.langId(coalesce($"text", lit(""))).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaBoundary === viaColumn)
    assert(viaBoundary(1L) === "en")
    assert(viaBoundary(2L) === "es")
    assert(viaBoundary(3L) === "de")
    assert(viaBoundary(4L) === "fr")
    assert(viaBoundary(5L) === "und")
    assert(viaBoundary(6L) === "und")
    assert(viaBoundary(7L) === "en") // tie: earlier langOrder entry wins
    assert(viaBoundary(8L) === "und")
  }

  test("results invariant to partitioning and batch size; input columns pass through") {
    val base = LangId.langIdWithModel(
        docs.repartition(1), "text", new LangId.StopwordLangClassifier,
        batchSize = 1000)
      .collect().map(r => (r.getLong(0), r.getString(2))).sortBy(_._1).toSeq
    for (parts <- Seq(2, 7); bs <- Seq(1, 3)) {
      val got = LangId.langIdWithModel(
          docs.repartition(parts), "text", new LangId.StopwordLangClassifier,
          batchSize = bs)
        .collect().map(r => (r.getLong(0), r.getString(2))).sortBy(_._1).toSeq
      assert(got === base, s"parts=$parts batchSize=$bs")
    }
    // every input column survives untouched, the tag is appended LAST
    val out = LangId.langIdWithModel(
      docs.withColumn("extra", $"doc_id" * 2), "text",
      new LangId.StopwordLangClassifier)
    assert(out.columns.toSeq === Seq("doc_id", "text", "extra", "lang_detected"))
    assert(out.filter($"extra" =!= $"doc_id" * 2).count() === 0)
  }

  test("misaligned classifier output, column collisions, non-string text fail loudly") {
    val broken = new LangId.BatchLangClassifier {
      override def classifyBatch(texts: Seq[String]): Seq[String] =
        texts.map(_ => "en").drop(1) // one tag short
    }
    val e = intercept[org.apache.spark.SparkException] {
      LangId.langIdWithModel(docs, "text", broken).collect()
    }
    assert(e.getMessage.contains("tags for") ||
      Option(e.getCause).exists(_.getMessage.contains("tags for")))
    intercept[IllegalArgumentException] {
      LangId.langIdWithModel(docs.withColumn("lang_detected", lit("x")),
        "text", new LangId.StopwordLangClassifier)
    }
    intercept[IllegalArgumentException] {
      LangId.langIdWithModel(docs, "doc_id", new LangId.StopwordLangClassifier)
    }
    intercept[IllegalArgumentException] {
      LangId.langIdWithModel(docs, "text", new LangId.StopwordLangClassifier,
        batchSize = 0)
    }
  }
}
