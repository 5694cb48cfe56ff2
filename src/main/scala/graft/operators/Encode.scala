package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document -> embedding encoding through a batched model boundary —
  * the production front door of the whole ANN family (q31-q106 assume
  * embeddings arrive precomputed; this operator is where they come
  * from). Same plumbing contract as [[Rerank.rerankWithModel]]'s
  * cross-encoder boundary, generalized from pair scoring to text
  * encoding: each PARTITION's rows are encoded in bounded `batchSize`
  * groups via mapPartitions — bounded request payloads, no driver
  * collect, no per-row calls — and the bundled
  * [[Encode.HashingTrickEncoder]] is the dependency-free stand-in
  * model (the hashing-trick featurizer, Weinberger et al. ICML'09 — a
  * real lexical embedding, not a `???`). Swap it for an inference
  * client (GPU service, ONNX session per executor) without touching
  * the plumbing.
  *
  * At 100 TB: encoding is embarrassingly parallel (map-only, no
  * shuffle); the operator adds exactly one column and preserves
  * partitioning, so the result can flow straight into the gated ANN
  * build (`Similarity.ivfPqIndex` / `Pipeline.publishAnn`) with no
  * extra exchange. q131 hash-gates the full text -> vectors ->
  * neighbors composition end-to-end.
  */
object Encode {

  /** A batch text encoder — the embedding-model boundary.
    * Implementations MUST be deterministic pure functions of the input
    * batch (order-preserving, one `dims`-length vector per text) so
    * results are independent of partitioning and batch boundaries.
    */
  trait BatchEncoder extends Serializable {
    def dims: Int
    def encodeBatch(texts: Seq[String]): Seq[Array[Double]]
  }

  /** Dependency-free stand-in for a neural document encoder: the
    * hashing trick over tokens. Each token hashes (md5, 60-bit — the
    * [[graft.functions.TextFunctions.hash60]] contract, so the q131
    * DuckDB oracle rebuilds identical vectors) to a bucket
    * `h % dims` and a sign `(h div dims) % 2`; the vector is the
    * signed occurrence count per bucket — integer-valued, so every
    * downstream IEEE cosine is bit-reproducible across engines.
    * Tokenization mirrors `TextFunctions.tokens` (lowercase, split on
    * non-alphanumerics).
    */
  final class HashingTrickEncoder(val dims: Int = 16) extends BatchEncoder {
    // r21 hot-path rewrite, value-identical: the first 15 hex chars of
    // an md5 are exactly the top 60 bits of its first 8 bytes, so the
    // hex render + parseLong round-trip is pure constant cost; and
    // MessageDigest.getInstance per TOKEN (provider lookup each call)
    // amortizes to one instance per batch (digest() resets it). The
    // chunk-ANN lifecycle queries hash every token of every
    // overlapping chunk through here.
    private def hash60(md: java.security.MessageDigest, s: String): Long = {
      val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
        ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
    }
    override def encodeBatch(texts: Seq[String]): Seq[Array[Double]] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      texts.map { t =>
        val v = new Array[Double](dims)
        HashingTrickEncoder.Sep.split(t.toLowerCase).foreach { tok =>
          if (tok.nonEmpty) {
            val h = hash60(md, "enc|" + tok)
            val b = (h % dims).toInt
            v(b) += (if ((h / dims) % 2 == 0) 1.0 else -1.0)
          }
        }
        v
      }
    }
  }

  private object HashingTrickEncoder {
    // precompiled: String.split(regex) re-compiles the pattern per call
    private val Sep = java.util.regex.Pattern.compile("[^a-z0-9]+")
  }

  /** Attach an `embedding` column computed through the batched
    * encoder. Ids pass through UNCAST (Row-encoded, original types
    * preserved — the [[Rerank.rerankWithModel]] rule: a silent long
    * cast would null string ids instead of failing). The encoder's
    * output is validated per batch: one vector per text, each exactly
    * `dims` long — a model returning misaligned batches fails loudly,
    * never silently shifts vectors onto wrong documents.
    */
  def encodeWithModel(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      encoder: BatchEncoder,
      batchSize: Int = 32): DataFrame = {
    require(batchSize >= 1, "batchSize must be >= 1")
    val in = docs.select(col(idCol), col(textCol).cast("string").as("__text"))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      in.schema(idCol),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false),
        nullable = false)))
    val dims = encoder.dims
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val vecs = encoder.encodeBatch(batch.map(r => Option(r.getString(1)).getOrElse("")))
        require(vecs.length == batch.length,
          s"encoder returned ${vecs.length} vectors for ${batch.length} texts")
        vecs.foreach(v => require(v.length == dims,
          s"encoder returned a ${v.length}-dim vector, expected $dims"))
        batch.lazyZip(vecs).map { case (r, v) =>
          org.apache.spark.sql.Row(r.get(0), v.toSeq)
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
