package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Row

/** Model-based quality scoring through a batched boundary — the
  * fastText/CCNet-style learned quality filter every production
  * training-data pipeline runs after the heuristic gates (q24's
  * length/punct ratios are the cheap first pass; a TRAINED classifier
  * decides keep/drop at scale). Fifth instance of the
  * [[Encode.encodeWithModel]] plumbing: rows are scored per partition
  * in bounded `batchSize` groups via mapPartitions — bounded request
  * payloads, no driver collect, no per-row calls — and the bundled
  * [[QualityModel.HashedLinearScorer]] is the deterministic stand-in
  * model: a REAL hashing-trick linear classifier (word unigram +
  * bigram features, polyHash-bucketed into a fixed-width weight
  * table, integer dot product), exactly the fastText input layer,
  * with a FROZEN affine weight table standing in for trained
  * parameters (the frozen-DSIR precedent — the shape and arithmetic
  * are production-real; only the weights are synthetic, and they are
  * a pure function of the bucket so the q238 oracle recomputes every
  * score in DuckDB).
  *
  * At 100 TB: map-only, no shuffle; appends exactly one column and
  * preserves the input's partitioning and remaining columns, so the
  * curation chain keeps flowing without a join back. Scorer contract:
  * deterministic pure function of the batch, order-preserving, one
  * score per text — results independent of partitioning and batch
  * boundaries (spec-pinned, the [[LangId.langIdWithModel]] rule).
  */
object QualityModel {

  /** A batch quality scorer — the model boundary. Scores are integer
    * (mille-scaled) so downstream thresholds and oracles are exact.
    */
  trait BatchQualityScorer extends Serializable {
    def scoreBatch(texts: Seq[String]): Seq[Long]
  }

  /** Hashing-trick linear model: features are word unigrams and
    * bigrams over [[graft.functions.TextFunctions.tokens]]'
    * tokenization (lowercase, split on non-alphanumerics — the
    * fastText input layer), each bucketed by
    * [[graft.functions.PolyHash]] mod `buckets`; the score is the
    * mean bucket weight in mille: trunc(1000 * Σ w(bucket(f)) /
    * nFeatures) — truncation toward zero, DuckDB's `//` — 0 for
    * featureless text. The weight table is FROZEN
    * and synthetic — w(b) = ((b*2654435761 + 97) mod 2001) - 1000,
    * a pure function of the bucket id in [-1000, 1000] — swap it for
    * trained weights without touching the plumbing or the feature
    * hashing.
    */
  final class HashedLinearScorer(buckets: Int = 1024) extends BatchQualityScorer {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")

    private def weight(bucket: Long): Long =
      ((bucket * 2654435761L + 97L) % 2001L) - 1000L

    private def bucket(feature: String): Long =
      graft.functions.PolyHash.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(feature)) % buckets

    override def scoreBatch(texts: Seq[String]): Seq[Long] =
      texts.map { t =>
        val toks = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        var sum = 0L
        var n = 0L
        var i = 0
        while (i < toks.length) {
          sum += weight(bucket(toks(i)))
          n += 1
          if (i + 1 < toks.length) {
            sum += weight(bucket(toks(i) + " " + toks(i + 1)))
            n += 1
          }
          i += 1
        }
        // truncating division (toward zero) — DuckDB's `//` on a
        // possibly-negative dot product, unlike floorDiv
        if (n == 0) 0L else sum * 1000L / n
      }
  }

  /** Append a model quality-score column (long, mille-scaled) through
    * the batched scorer. Every input column passes through UNTOUCHED
    * (the [[Rerank.rerankWithModel]] rule); per-batch output arity is
    * validated so a misaligned model fails loudly, never silently
    * shifts scores onto wrong documents. Null text scores as empty.
    */
  def scoreWithModel(
      docs: DataFrame,
      textCol: String,
      scorer: BatchQualityScorer,
      batchSize: Int = 32,
      outCol: String = "quality_model_score"): DataFrame = {
    require(batchSize >= 1, "batchSize must be >= 1")
    require(!docs.columns.contains(outCol),
      s"output column $outCol already exists on the input")
    val ti = docs.schema.fieldIndex(textCol)
    require(docs.schema(ti).dataType ==
      org.apache.spark.sql.types.StringType,
      s"$textCol must be a string column, got " +
        docs.schema(ti).dataType.simpleString)
    val outSchema = docs.schema.add(outCol,
      org.apache.spark.sql.types.LongType, nullable = false)
    docs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val scores = scorer.scoreBatch(
          batch.map(r => Option(r.getString(ti)).getOrElse("")))
        require(scores.length == batch.length,
          s"scorer returned ${scores.length} scores for ${batch.length} texts")
        batch.lazyZip(scores).map { case (r, s) => Row.fromSeq(r.toSeq :+ s) }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
