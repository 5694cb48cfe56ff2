package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed Bloom filter over pre-hashed keys — the map-side
  * prefilter that makes benchmark decontamination affordable when the
  * contamination set is too large for a plain broadcast gram join to
  * be the FIRST thing every corpus gram meets.
  *
  * Build: an [[Aggregator]] whose buffer is the packed bit array
  * (`Array[Long]`, numBits/64 words). Partial buffers are OR-merged,
  * so the build is one pass over the key side with map-side combine —
  * the classic "build per partition, union the bits" shape
  * (Bloom 1970; Broder & Mitzenmacher's survey for the k/m math).
  *
  * Probe: [[BloomFilter.mightContain]] is composed ENTIRELY of builtin
  * codegen'd expressions (element_at / shiftright / bitwiseAND) over
  * the one-row bits array attached via a broadcast cross join — no
  * UDF, no per-row serialization. The k probe indexes use
  * Kirsch–Mitzenmacher double hashing `(g1 + i*g2) mod numBits`, so
  * both sides derive identical indexes from the same two 60-bit base
  * hashes and the filter has NO false negatives by construction
  * (BloomSpec pins this; callers must still confirm hits exactly —
  * false POSITIVES are expected and eliminated downstream).
  *
  * Overflow contract: g1, g2 ∈ [0, 2^60) (TextFunctions.hash60) and
  * k ≤ 8, so g1 + i*g2 < 2^63 — no Long overflow, and the arithmetic
  * is identical in the aggregator's JVM loop and the probe's Catalyst
  * expressions (ANSI-safe: nothing here can throw).
  */
class BloomAggregator(numBits: Int, k: Int)
    extends Aggregator[BloomAggregator.In, Array[Long], Array[Long]] {
  private val words = numBits / 64

  override def zero: Array[Long] = new Array[Long](words)

  override def reduce(buf: Array[Long], in: BloomAggregator.In): Array[Long] = {
    var i = 0
    while (i < k) {
      val idx = java.lang.Math.floorMod(in.g1 + i.toLong * in.g2, numBits.toLong)
      buf((idx >> 6).toInt) |= 1L << (idx & 63L).toInt
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object BloomAggregator {
  final case class In(g1: Long, g2: Long)
}

object BloomFilter {

  /** Salted base-hash pair for a key column. `g2` is forced odd so the
    * double-hash stride is never 0 (a zero stride would probe one bit
    * k times and inflate the false-positive rate).
    */
  def baseHashes(key: Column): (Column, Column) = (
    TextFunctions.hash60(concat(lit("bf1|"), key)),
    TextFunctions.hash60(concat(lit("bf2|"), key)).bitwiseOR(lit(1L)))

  /** Aggregate the packed bit array from (g1, g2) pairs. One output
    * row; attach it to the probe side with `crossJoin(broadcast(_))`.
    */
  def bloomAgg(numBits: Int, k: Int): (Column, Column) => Column = {
    require(numBits > 0 && numBits % 64 == 0, s"numBits must be a positive multiple of 64: $numBits")
    require(k >= 1 && k <= 8, s"k must be in [1, 8]: $k")
    val fn = udaf(new BloomAggregator(numBits, k), Encoders.product[BloomAggregator.In])
    (g1, g2) => fn(g1, g2)
  }

  /** Membership test against the packed bits — true if every one of
    * the k probed bits is set. Builtins only: the dynamic in-word
    * shift goes through `call_function("shiftright", …)` because the
    * Scala DSL only exposes literal shift amounts; the expression is
    * the same codegen'd ShiftRight the literal form lowers to.
    */
  def mightContain(bits: Column, g1: Column, g2: Column, numBits: Int, k: Int): Column =
    (0 until k).map { i =>
      val idx = pmod(g1 + lit(i.toLong) * g2, lit(numBits.toLong))
      val word = element_at(bits, shiftright(idx, 6).cast("int") + lit(1))
      call_function("shiftright", word, pmod(idx, lit(64L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
}
