package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-min sketch (Cormode & Muthukrishnan, "An improved data
  * stream summary: the count-min sketch and its applications", 2005):
  * a d x w matrix of counters; each term increments one cell per row
  * (bucket = pairwise hash of the term's Karp-Rabin [[PolyHash]]), and
  * a point estimate is the MIN over the d cells — always >= the true
  * count, with overestimate <= 2N/w at probability 1 - (1/2)^d.
  *
  * Unlike the Misra-Gries summary (whose residual counters depend on
  * arrival order), every CMS cell is a pure SUM over the stream, so
  * the sketch — and every estimate read from it — is partition- and
  * merge-order-INVARIANT: the same property that makes Bloom/KMV
  * hash-gateable exactly makes the CMS oracle-checkable bit-for-bit
  * (the DuckDB mirror reconstructs cells as grouped sums over the
  * same bucket arithmetic, q153).
  *
  * Where it sits in the sketch family: MG answers "which terms are
  * frequent" (candidates, order-dependent), KMV answers "how many
  * distinct", Bloom answers "was this seen"; CMS answers "about how
  * often was THIS term seen" for any term, after one pass, in d*w
  * longs — the per-executor state is a few KB regardless of corpus
  * size, and merges are elementwise adds (Agarwal et al., "Mergeable
  * Summaries": linear sketches compose under any merge tree).
  */
class CountMinAggregator(d: Int, w: Int)
    extends Aggregator[String, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.ofDim[Long](d * w)

  override def reduce(buf: Array[Long], term: String): Array[Long] = {
    if (term != null) {
      var j = 0
      while (j < d) {
        buf(j * w + CountMin.bucket(term, j, w)) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object CountMin {

  /** Mersenne prime 2^31 - 1: the [[PolyHash]] modulus, reused as the
    * pairwise-hash field so intermediates stay far under 2^63 in both
    * engines ((2j+1) * (P-1) < 2^34 for any small d).
    */
  val P: Long = 2147483647L

  /** Row-j bucket of a term: ((2j+1) * polyHash(term) + 97j + 1) mod P
    * mod w — a fixed pairwise family over the shared Karp-Rabin base
    * hash, mirrored verbatim in SQL by [[bucketSql]].
    */
  def bucket(term: String, j: Int, w: Int): Int = {
    val h = PolyHash.hash(org.apache.spark.unsafe.types.UTF8String.fromString(term))
    (((2L * j + 1L) * h + 97L * j + 1L) % P % w).toInt
  }

  /** The identical bucket arithmetic as a SQL fragment over a
    * BIGINT hash expression — valid in BOTH dialects (Spark reads the
    * hash from the registered `poly_hash`, DuckDB from
    * [[TextFunctions.polyHashSql]]).
    */
  def bucketSql(hashExpr: String, j: Int, w: Int): String =
    s"((${2L * j + 1L} * ($hashExpr) + ${97L * j + 1L}) % $P) % $w"

  /** DataFrame-callable one-pass sketch over a string column; returns
    * the d*w cell array (row-major: cell(j, b) at index j*w + b).
    */
  def sketch(d: Int, w: Int): Column => Column = {
    require(d >= 1 && d <= 16, s"d must be in [1, 16]: $d")
    require(w >= 2, s"w must be >= 2: $w")
    val fn = udaf(new CountMinAggregator(d, w), Encoders.STRING)
    term => fn(term)
  }
}
