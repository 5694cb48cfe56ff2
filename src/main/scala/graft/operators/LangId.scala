package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Row

/** Language identification through a batched model boundary — the
  * fourth instance of the [[Encode.encodeWithModel]] plumbing (with
  * [[Rerank.rerankWithModel]] and the frozen-DSIR scorer): a
  * production pipeline ships a classifier (fastText/CLD3-class model
  * behind an inference service), not a stopword table, and the
  * boundary is where it plugs in. Each PARTITION's rows are
  * classified in bounded `batchSize` groups via mapPartitions —
  * bounded request payloads, no driver collect, no per-row calls —
  * and the bundled [[LangId.StopwordLangClassifier]] is the
  * deterministic stand-in model, bit-identical to
  * [[graft.functions.TextFunctions.langId]] so the q23 oracle can
  * gate a pipeline routed through the boundary (q217).
  *
  * At 100 TB: map-only, no shuffle; the operator appends exactly one
  * column and preserves the input's partitioning AND its remaining
  * columns, so a curation chain (language gate -> quality -> dedup)
  * keeps flowing without a join back. Classifier contract: a
  * deterministic pure function of the input batch, order-preserving,
  * one tag per text — results therefore independent of partitioning
  * and batch boundaries (the spec pins both invariances).
  */
object LangId {

  /** A batch language classifier — the model boundary. Must be a
    * deterministic pure function of the batch (order-preserving, one
    * language tag per text).
    */
  trait BatchLangClassifier extends Serializable {
    def classifyBatch(texts: Seq[String]): Seq[String]
  }

  /** Dependency-free stand-in: the stopword-count heuristic,
    * bit-identical to [[graft.functions.TextFunctions.langId]] —
    * same tokenization (lowercase, split on non-alphanumerics), same
    * per-occurrence stopword counting, same strictly-greater argmax
    * with earlier [[graft.functions.TextFunctions.langOrder]] entries
    * winning ties, "und" when nothing hits. The differential spec
    * holds the two implementations together; swap this class for an
    * inference client without touching the plumbing.
    */
  final class StopwordLangClassifier extends BatchLangClassifier {
    import graft.functions.TextFunctions.{langOrder, stopwords}
    private val sets: Seq[(String, Set[String])] =
      langOrder.map(l => l -> stopwords(l).toSet)
    override def classifyBatch(texts: Seq[String]): Seq[String] =
      texts.map { t =>
        val toks = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        val scores = sets.map { case (l, sw) => l -> toks.count(sw) }
        val best = scores.iterator.map(_._2).max
        if (best <= 0) "und" else scores.find(_._2 == best).get._1
      }
  }

  /** Append a detected-language column computed through the batched
    * classifier. Every input column passes through UNTOUCHED (no
    * casts — the [[Rerank.rerankWithModel]] rule), so the result
    * flows straight into the next curation stage with no join back.
    * The classifier's output is validated per batch: exactly one tag
    * per text — a model returning a misaligned batch fails loudly,
    * never silently shifts tags onto wrong documents. Null text
    * classifies as empty ("und" under the stand-in).
    */
  def langIdWithModel(
      docs: DataFrame,
      textCol: String,
      classifier: BatchLangClassifier,
      batchSize: Int = 32,
      outCol: String = "lang_detected"): DataFrame = {
    require(batchSize >= 1, "batchSize must be >= 1")
    require(!docs.columns.contains(outCol),
      s"output column $outCol already exists on the input")
    val ti = docs.schema.fieldIndex(textCol)
    require(docs.schema(ti).dataType ==
      org.apache.spark.sql.types.StringType,
      s"$textCol must be a string column, got " +
        docs.schema(ti).dataType.simpleString)
    val outSchema = docs.schema.add(outCol,
      org.apache.spark.sql.types.StringType, nullable = false)
    docs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val langs = classifier.classifyBatch(
          batch.map(r => Option(r.getString(ti)).getOrElse("")))
        require(langs.length == batch.length,
          s"classifier returned ${langs.length} tags for ${batch.length} texts")
        batch.lazyZip(langs).map { case (r, l) => Row.fromSeq(r.toSeq :+ l) }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
