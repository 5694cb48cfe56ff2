package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp-Rabin polynomial string hash, the winnowing paper's own hash
  * family (Schleimer et al. 2003 §2 uses rolling polynomial k-gram
  * hashes): left fold `h = (h * 1000003 + codePoint) % (2^31 - 1)`
  * over the string's Unicode CODE POINTS, empty string -> 0. Result in
  * [0, 2^31 - 1).
  *
  * Why it exists (measured, BENCH_r11): q104's fingerprint stage was
  * md5-bound — Spark's `md5` allocates a MessageDigest and hex string
  * per call, then `conv` re-parses the hex; at one hash per gram that
  * was 26% of the whole bench sweep. This fold is an allocation-free
  * primitive-long loop (a single static call from generated code, no
  * string round-trips).
  *
  * Oracle portability: DuckDB evaluates the identical fold as
  * `list_reduce(list_prepend(0, list_transform(string_split(s, ''),
  * c -> unicode(c))), (acc, c) -> (acc * 1000003 + c) % 2147483647)`
  * (TextFunctions.polyHashSql). Folding CODE POINTS — decoded from
  * UTF-8 here, via `unicode(c)` there — makes the mirror exact for ALL
  * inputs, not just ASCII (the byte-fold variant this replaced would
  * have silently diverged from the SQL mirror on the first non-ASCII
  * document the driver ever generates). ASCII bytes take the one-branch
  * fast path.
  *
  * Base 1000003 (prime, ~2^20): max intermediate (2^31)*(2^20) +
  * 0x10FFFF < 2^52 — no 64-bit overflow in either engine (DuckDB
  * BIGINT is ANSI-checked). A 3+ code-point input exceeds the modulus,
  * so all real grams are well wrapped; 1-2 char strings hash small,
  * which only matters under MIN-selection over same-length strings —
  * the winnowing caller only min-selects k-gram Horner combinations,
  * never raw short-string hashes (and minhash keeps md5 for exactly
  * this reason, see TextFunctions.polyHash).
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyHash.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash {
  val fnName = "poly_hash"

  /** The fold itself — shared by interpreted eval and generated code
    * (a static call the JIT inlines). Manual UTF-8 decode keeps the
    * loop allocation-free; ASCII bytes never enter the slow branch.
    *
    * UTF8String does NOT guarantee valid UTF-8 (binary-to-string casts,
    * unvalidated parquet binary), and getByte is unchecked Unsafe — a
    * multi-byte sequence truncated at the buffer end must not read
    * adjacent memory. Any sequence that would run past numBytes is
    * folded as its raw lead byte instead: deterministic, bounded, and
    * the same for interpreted and generated code. (Valid UTF-8 never
    * takes that branch, so the DuckDB code-point mirror is unaffected.)
    */
  def hash(s: UTF8String): Long = hashRange(s, 0, s.numBytes())

  /** [[hash]] over the byte range [from, until) of `s` — bit-identical
    * to hashing the copied `s.substring` slice (the decode loop sees
    * the same bytes and the same truncation boundary), without the
    * per-window UTF8String allocation. Serves [[GramHashes]]' window
    * scan (r21).
    */
  def hashRange(s: UTF8String, from: Int, until: Int): Long = {
    val n = until
    var h = 0L
    var i = from
    while (i < n) {
      val b0 = s.getByte(i) & 0xff
      var cp = 0
      if (b0 < 0x80) { cp = b0; i += 1 }
      else if (b0 < 0xe0) { // 2-byte sequence (b0 >= 0xc0 in valid UTF-8)
        if (i + 2 > n) { cp = b0; i += 1 }
        else {
          cp = ((b0 & 0x1f) << 6) | (s.getByte(i + 1) & 0x3f)
          i += 2
        }
      } else if (b0 < 0xf0) { // 3-byte sequence
        if (i + 3 > n) { cp = b0; i += 1 }
        else {
          cp = ((b0 & 0x0f) << 12) | ((s.getByte(i + 1) & 0x3f) << 6) |
            (s.getByte(i + 2) & 0x3f)
          i += 3
        }
      } else { // 4-byte sequence
        if (i + 4 > n) { cp = b0; i += 1 }
        else {
          cp = ((b0 & 0x07) << 18) | ((s.getByte(i + 1) & 0x3f) << 12) |
            ((s.getByte(i + 2) & 0x3f) << 6) | (s.getByte(i + 3) & 0x3f)
          i += 4
        }
      }
      h = (h * 1000003L + cp) % 2147483647L
    }
    h
  }
}
