package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

object EncodeSpec {
  /** Cross-executor-visible counters (the RerankSpec discipline) —
    * object state is per-JVM, which local[*] shares.
    */
  object CountingState {
    val encoded = new java.util.concurrent.atomic.AtomicInteger(0)
    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
  }

  final class CountingEncoder(dim: Int) extends Encode.BatchEncoder {
    private val inner = new Encode.HashingTrickEncoder(dim)
    override def dims: Int = dim
    override def encodeBatch(texts: Seq[String]): Seq[Array[Double]] = {
      CountingState.batchSizes.add(texts.length)
      CountingState.encoded.addAndGet(texts.length)
      inner.encodeBatch(texts)
    }
  }

  final class MisalignedEncoder extends Encode.BatchEncoder {
    override def dims: Int = 4
    override def encodeBatch(texts: Seq[String]): Seq[Array[Double]] =
      texts.drop(1).map(_ => Array.fill(4)(0.0)) // one vector short
  }
}

/** The embedding-model boundary (Encode.encodeWithModel — oracle-gated
  * end-to-end by q131's text -> vectors -> neighbors composition).
  * Pins: the stand-in model matches an independently-computed
  * reference, the plumbing encodes every doc exactly once within the
  * batch bound, results are invariant to batching and partitioning,
  * ids pass through untyped, and a misaligned model fails loudly.
  */
class EncodeSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta alpha"),
    (2L, "Beta GAMMA, beta!"),
    (3L, ""),
    (4L, "delta"),
    (5L, "alpha beta gamma delta epsilon zeta eta theta")
  ).toDF("doc_id", "text")

  private def collectVecs(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Double]] =
    df.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap

  test("hashing-trick encoder equals the hand-computed reference vector") {
    val dim = 8
    def ref(text: String): Seq[Double] = {
      val v = new Array[Double](dim)
      text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).foreach { tok =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"enc|$tok".getBytes("UTF-8"))
          .map(b => f"${b & 0xff}%02x").mkString
        val h = java.lang.Long.parseLong(hex.take(15), 16)
        v((h % dim).toInt) += (if ((h / dim) % 2 == 0) 1.0 else -1.0)
      }
      v.toSeq
    }
    val got = collectVecs(Encode.encodeWithModel(
      docs, "doc_id", "text", new Encode.HashingTrickEncoder(dim)))
    docs.collect().foreach { r =>
      assert(got(r.getLong(0)) === ref(r.getString(1)), s"doc ${r.getLong(0)}")
    }
    // repeated tokens accumulate (occurrence counts, not a set)
    assert(got(1L).map(math.abs).sum === 3.0)
    // the empty doc encodes to the zero vector, not a dropped row
    assert(got(3L) === Seq.fill(dim)(0.0))
  }

  test("every doc is encoded exactly once and batches respect the bound") {
    import scala.jdk.CollectionConverters._
    import EncodeSpec.CountingState
    CountingState.batchSizes.clear()
    CountingState.encoded.set(0)
    val n = Encode.encodeWithModel(docs.repartition(3), "doc_id", "text",
      new EncodeSpec.CountingEncoder(8), batchSize = 2).count()
    assert(n === 5)
    assert(CountingState.encoded.get() === 5, "each doc encoded exactly once")
    assert(CountingState.batchSizes.asScala.forall(_ <= 2), "batchSize bound violated")
  }

  test("vectors are invariant to batch size and partitioning") {
    val enc = new Encode.HashingTrickEncoder(16)
    val base = collectVecs(Encode.encodeWithModel(docs.repartition(1), "doc_id", "text", enc, 1))
    assert(base.size === 5)
    assert(collectVecs(Encode.encodeWithModel(docs.repartition(4), "doc_id", "text", enc, 3))
      === base)
    assert(collectVecs(Encode.encodeWithModel(docs, "doc_id", "text", enc, 1000)) === base)
  }

  test("non-numeric ids pass through unchanged (no silent cast)") {
    val sdocs = docs.select(concat(lit("id-"), col("doc_id")).as("doc_id"), col("text"))
    val got = Encode.encodeWithModel(sdocs, "doc_id", "text",
      new Encode.HashingTrickEncoder(8)).collect()
    assert(got.length === 5)
    assert(got.forall(_.getString(0).startsWith("id-")))
  }

  test("a model returning a misaligned batch fails loudly") {
    val e = intercept[org.apache.spark.SparkException] {
      Encode.encodeWithModel(docs, "doc_id", "text",
        new EncodeSpec.MisalignedEncoder).count()
    }
    assert(e.getMessage.contains("vectors") ||
      Option(e.getCause).exists(_.getMessage.contains("vectors")))
  }

  test("encoded vectors feed the gated ANN path end-to-end (q131 shape)") {
    // the empty doc encodes to the zero vector, whose cosine is
    // undefined — a real pipeline length-filters before encoding,
    // exactly as q131's corpus (min doc length 48) does implicitly
    val vecs = Encode.encodeWithModel(docs.filter(length(col("text")) > 0),
      "doc_id", "text", new Encode.HashingTrickEncoder(16))
    val got = Similarity.cosineTopK(vecs.filter(col("doc_id") === 1L), vecs,
        "doc_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got.length === 2)
    assert(got.forall(_._1 == 1L))
  }
}
