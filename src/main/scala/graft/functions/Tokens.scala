package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass tokenizer: lowercased alphanumeric word tokens, empties
  * removed — the native form of
  * `filter(split(lower(text), "[^a-z0-9]+"), t -> t <> '')`, which is
  * the corpus pipeline's single hottest expression (61 call sites:
  * every dedup signature, retrieval postings build, SA rank table,
  * chunker and quality score starts by tokenizing `text`).
  *
  * Why it exists (r21 optimization round, guide §4 "eliminate
  * non-codegen expressions in the hot path"): the composed form pays
  * three times per row — `lower` allocates a full lowered copy, `split`
  * runs a java.util.regex scan allocating one UTF8String per separator
  * run INCLUDING the empties, and `filter` is a HigherOrderFunction,
  * which Spark does not codegen (CodegenFallback) — so every tokenizing
  * operator carried an interpreted lambda in its innermost loop. This
  * expression is one allocation-light byte scan: lowercase and token
  * slicing happen in a single pass over the UTF-8 bytes, tokens are
  * zero-copy slices of one lowered buffer, and generated code calls a
  * static method the JIT inlines.
  *
  * EXACT-EQUIVALENCE contract (the results of every registered query
  * must stay byte-identical): for pure-ASCII input the fast path is
  * equivalent by construction (lower maps only A-Z; every non-[a-z0-9]
  * byte is a separator). Any row containing a non-ASCII byte takes the
  * fallback, which calls the SAME UTF8String methods the composed form
  * bottoms out in — `UTF8String.toLowerCase` (what `Lower` executes
  * under the default UTF8_BINARY collation) then
  * `UTF8String.split(pattern, -1)` (what `StringSplit` executes) — so
  * Unicode lowering that expands length ('İ' → "i̇"), locale handling,
  * and regex semantics are inherited, not re-implemented.
  * TokensSpec pins composed ≡ native on ASCII, Unicode, empty, and
  * separator-edge inputs.
  */
case class Tokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }
  // containsNull = false: matches the composed form's type exactly
  // (StringSplit declares containsNull = false and ArrayFilter
  // preserves it — TokensSpec pins the equality), so downstream
  // schemas are unchanged
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokens"

  override protected def nullSafeEval(input: Any): Any =
    Tokens.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Tokens.tokenize($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Tokens {
  val fnName = "tokens"

  private val SplitPattern = UTF8String.fromString("[^a-z0-9]+")

  /** Shared by interpreted eval and generated code. */
  def tokenize(s: UTF8String): ArrayData = {
    val n = s.numBytes()
    var ascii = true
    var i = 0
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (!ascii) return slowPath(s)
    // one lowered copy; tokens are zero-copy slices into it
    val bytes = new Array[Byte](n)
    i = 0
    while (i < n) {
      val b = s.getByte(i)
      bytes(i) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
      i += 1
    }
    val out = new java.util.ArrayList[AnyRef](8)
    i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        var j = i + 1
        while (j < n && {
          val c = bytes(j)
          (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
        }) j += 1
        out.add(UTF8String.fromBytes(bytes, i, j - i))
        i = j
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Non-ASCII rows: the composed form's own building blocks, verbatim
    * (UTF8String.toLowerCase is Lower's UTF8_BINARY path,
    * UTF8String.split(p, -1) is StringSplit's), then the empty filter.
    */
  private def slowPath(s: UTF8String): ArrayData = {
    val parts = s.toLowerCase.split(SplitPattern, -1)
    val out = new java.util.ArrayList[AnyRef](parts.length)
    var i = 0
    while (i < parts.length) {
      if (parts(i).numBytes() > 0) out.add(parts(i))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
