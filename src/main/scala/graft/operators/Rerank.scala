package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Two-stage TEXT retrieval with cross-scoring re-rank — the lexical
  * sibling of [[Similarity.exactRerank]] (which re-scores vector
  * candidates). Stage 1 generates (query, doc) candidates from shared
  * winnowing fingerprints ([[Dedup.winnowFingerprintsFlat]] — the
  * df-capped equi-join blocking discipline, never all-pairs); stage 2
  * scores each candidate PAIR OF TEXTS and keeps the top-k per query.
  *
  * Two scoring paths, one per production regime:
  *   - [[lexicalJaccard]]: exact distinct-token Jaccard as a pure
  *     codegen'd column expression — engine-portable integer counts,
  *     so the full pipeline carries a DuckDB hash oracle (q105).
  *   - [[rerankWithModel]]: the CROSS-ENCODER boundary. A neural
  *     cross-encoder consumes (query, doc) text pairs in bounded
  *     batches and returns one score per pair; that exact call shape —
  *     schema, partition-local batching, batch-size knob — is real
  *     Spark plumbing here, while the bundled [[HashingKernelScorer]]
  *     is the dependency-free stand-in model (deterministic
  *     feature-hashing dot product — the classic hashing-trick kernel,
  *     a real lexical model, not a `???`). Swap the scorer for an
  *     inference client without touching the plumbing.
  *
  * At 100 TB: stage 1 cost is the winnow fingerprint join (linear,
  * df-capped); stage 2 touches only |candidates| rows, the query side
  * broadcasts (a query batch is KBs), and the top-k window partitions
  * by query — parallel across queries, never a global sort.
  */
object Rerank {

  /** Exact Jaccard over DISTINCT token sets, as a column expression:
    * |q ∩ d| / |q ∪ d| with the union counted as |q| + |d| - |q ∩ d|
    * (both sides pre-distinct'd), 0 when both sides are empty. Integer
    * counts + one correctly-rounded double division — bit-portable to
    * the DuckDB oracle.
    */
  def lexicalJaccard(qText: Column, dText: Column): Column = {
    val qs = array_distinct(TextFunctions.tokens(qText))
    val ds = array_distinct(TextFunctions.tokens(dText))
    val inter = size(array_intersect(qs, ds))
    val union = size(qs) + size(ds) - inter
    inter.cast("double") / greatest(union, lit(1)).cast("double")
  }

  /** Stage-1 candidate generation: (query_id, doc_id) pairs sharing at
    * least one winnowing fingerprint. Fingerprints are computed per
    * side (the query side is expected tiny and its fingerprint table
    * broadcasts under AQE); the join is the equi-join-on-fp blocking
    * discipline — never all-pairs.
    */
  def candidatePairs(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      w: Int = 4): DataFrame = {
    val qf = Dedup.winnowFingerprintsFlat(queries, idCol, textCol, k, w)
      .select(col("fp"), col("doc").as("query_id"))
    val cf = Dedup.winnowFingerprintsFlat(corpus, idCol, textCol, k, w)
      .select(col("fp"), col("doc").as("doc_id"))
    qf.join(cf, Seq("fp"))
      .filter(col("query_id") =!= col("doc_id"))
      .select(col("query_id"), col("doc_id"))
      .distinct()
  }

  /** Stage-2 re-rank with a COLUMN scorer: join candidate ids back to
    * both texts (query side broadcast — a query batch is small by
    * contract), score, keep top-k per query by (score DESC, doc_id).
    * Returns (query_id, doc_id, rank, score).
    */
  def rerank(
      candidates: DataFrame,
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      score: (Column, Column) => Column = lexicalJaccard): DataFrame =
    topK(
      candidates
        .join(broadcast(queries.select(col(idCol).as("query_id"),
          col(textCol).as("q_text"))), Seq("query_id"))
        .join(corpus.select(col(idCol).as("doc_id"), col(textCol).as("d_text")),
          Seq("doc_id"))
        .select(col("query_id"), col("doc_id"),
          score(col("q_text"), col("d_text")).as("score")),
      k)

  /** A batch text-pair scorer — the cross-encoder model boundary.
    * Implementations MUST be deterministic pure functions of the input
    * batch (order-preserving, one score per pair) so results are
    * independent of partitioning and batch boundaries.
    */
  trait PairScorer extends Serializable {
    def scoreBatch(pairs: Seq[(String, String)]): Seq[Double]
  }

  /** Dependency-free stand-in for a neural cross-encoder: the hashing
    * trick (Weinberger et al., ICML'09). Each text hashes its tokens
    * into a `dim`-bucket signed feature vector; the score is the
    * cosine of the two hashed vectors. Deterministic, order-robust, a
    * real lexical kernel — and exactly the call shape an inference
    * client would have.
    */
  final class HashingKernelScorer(dim: Int = 64) extends PairScorer {
    private def featurize(text: String): Array[Double] = {
      val v = new Array[Double](dim)
      text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).foreach { t =>
        val h = t.hashCode
        val b = ((h % dim) + dim) % dim
        v(b) += (if (((h >> 16) & 1) == 0) 1.0 else -1.0)
      }
      v
    }
    override def scoreBatch(pairs: Seq[(String, String)]): Seq[Double] =
      pairs.map { case (q, d) =>
        val (x, y) = (featurize(q), featurize(d))
        var xy = 0.0; var xx = 0.0; var yy = 0.0
        var i = 0
        while (i < dim) { xy += x(i) * y(i); xx += x(i) * x(i); yy += y(i) * y(i); i += 1 }
        if (xx == 0.0 || yy == 0.0) 0.0 else xy / math.sqrt(xx * yy)
      }
  }

  /** Stage-2 re-rank through a batched [[PairScorer]] — the model-call
    * plumbing: candidates join their texts, then each PARTITION's rows
    * are scored in bounded `batchSize` groups via mapPartitions (the
    * shape a GPU/inference-service client needs: bounded request
    * payloads, no driver collect, no per-row calls). Output identical
    * in shape to [[rerank]].
    */
  def rerankWithModel(
      candidates: DataFrame,
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      scorer: PairScorer,
      batchSize: Int = 32): DataFrame = {
    require(batchSize >= 1, "batchSize must be >= 1")
    val paired = candidates
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(textCol).as("q_text"))), Seq("query_id"))
      .join(corpus.select(col(idCol).as("doc_id"), col(textCol).as("d_text")),
        Seq("doc_id"))
      .select(col("query_id"), col("doc_id"), col("q_text"), col("d_text"))
    // ids pass through UNCAST (Row-encoded, original types preserved):
    // a long cast in non-ANSI mode turns non-numeric ids (string UUIDs)
    // into nulls, collapsing all pairs onto one key and returning a
    // wrong top-k instead of failing — and would make this path reject
    // schemas the column-scorer rerank() accepts.
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      paired.schema("query_id"), paired.schema("doc_id"),
      org.apache.spark.sql.types.StructField(
        "score", org.apache.spark.sql.types.DoubleType, nullable = false)))
    val scored = paired.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val scores = scorer.scoreBatch(batch.map(r => (r.getString(2), r.getString(3))))
        require(scores.length == batch.length,
          s"scorer returned ${scores.length} scores for ${batch.length} pairs")
        batch.lazyZip(scores).map { case (r, s) =>
          org.apache.spark.sql.Row(r.get(0), r.get(1), s) }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    topK(scored, k)
  }

  private def topK(scored: DataFrame, k: Int): DataFrame =
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"), col("score"))
}
