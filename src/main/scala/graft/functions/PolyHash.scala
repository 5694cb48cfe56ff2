package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp-Rabin polynomial string hash, the winnowing paper's own hash
  * family (Schleimer et al. 2003 §2 uses rolling polynomial k-gram
  * hashes): left fold `h = (h * 1000003 + byte) % (2^31 - 1)` over the
  * UTF-8 bytes, empty string -> 0. Result in [0, 2^31 - 1).
  *
  * Why it exists (measured, BENCH_r11): q104's fingerprint stage was
  * md5-bound — Spark's `md5` allocates a MessageDigest and hex string
  * per call, then `conv` re-parses the hex; at one hash per gram that
  * was 26% of the whole bench sweep. This expression is a tight
  * primitive-long loop inside whole-stage codegen — no allocation, no
  * string round-trip.
  *
  * Oracle portability: DuckDB evaluates the identical fold as
  * `list_reduce(list_prepend(0, list_transform(string_split(s, ''),
  * c -> unicode(c))), (acc, c) -> (acc * 1000003 + c) % 2147483647)`
  * (TextFunctions.polyHashSql). The mirror folds CODE POINTS while
  * this folds BYTES — identical for ASCII inputs, which the callers
  * guarantee: every gram comes from `TextFunctions.tokens` (alphabet
  * [a-z0-9], space-joined). Non-ASCII inputs hash deterministically
  * here but diverge from the SQL mirror — don't pair them with a
  * DuckDB oracle.
  *
  * Base 1000003 (prime, ~2^20): max intermediate (2^31)*(2^20) + 255
  * < 2^52 — no 64-bit overflow in either engine (DuckDB BIGINT is
  * ANSI-checked). A 3+ byte input exceeds the modulus, so all real
  * grams (>= 5 chars: "a b c") are well wrapped; 1-2 char strings
  * hash small, which only occurs for sub-k whole-doc fallback grams
  * where the doc yields a single fingerprint regardless of value.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * 1000003L + (s.getByte(i) & 0xffL)) % 2147483647L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      s"""
         |int $n = $c.numBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $h = ($h * 1000003L + ($c.getByte($i) & 0xffL)) % 2147483647L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash {
  val fnName = "poly_hash"
}
