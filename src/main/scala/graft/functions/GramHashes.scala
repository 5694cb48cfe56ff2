package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `gram_hashes(s)` — the sorted distinct [[PolyHash]] values of every
  * 3-CHARACTER substring of `s` (the whole string when it has fewer
  * than 3 characters), natively in one pass (r21, guide §4).
  *
  * Exact-equivalence contract — replaces, value for value AND type for
  * type (`array<bigint>` with nullable elements; null input yields the
  * one-element `[NULL]` array, never a null array), the composed chain
  *
  * {{{
  *   array_sort(array_distinct(transform(
  *     case when length(s) >= 3 then
  *       array_distinct(transform(sequence(1, length(s) - 2),
  *         i -> substring(s, i, 3)))
  *     else array(s) end,
  *     x -> poly_hash(x))))
  * }}}
  *
  * which carried TWO interpreted HigherOrderFunction lambdas, one
  * UTF8String allocation per gram, and a string hash-set build per
  * document in the hottest loop of the char-n-gram similarity ops
  * (~10M gram evaluations at sf0.1). Distinct-then-hash equals
  * hash-then-distinct (equal strings hash equal), so one primitive
  * sort + adjacent-dedup replaces both set builds. Character windows
  * use `UTF8String.numBytesForFirstByte` jumps — the SAME boundary
  * rule `length`/`substring` apply — so even invalid UTF-8 windows
  * byte-identically to the composed form. The DuckDB oracle mirror is
  * untouched (oracles compare final outputs; the hash VALUES are
  * unchanged).
  */
case class GramHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }
  // null input folds to array(NULL) -> [poly_hash(NULL)] = [NULL] in
  // the composed form: the expression itself is never null, but its
  // elements may be
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = GramHashes.fnName

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) GramHashes.nullSingleton()
    else GramHashes.hashes(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${c.isNull} ? graft.functions.GramHashes.nullSingleton()
                      : graft.functions.GramHashes.hashes(${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramHashes {
  val fnName = "gram_hashes"

  private val K = 3

  def nullSingleton(): ArrayData = new GenericArrayData(Array[Any](null))

  def hashes(s: UTF8String): ArrayData = {
    val n = s.numBytes()
    // character start offsets by declared lead-byte length — exactly
    // numChars()/substring()'s boundary rule (clamped to the buffer
    // for truncated tails)
    val offs = new Array[Int](n + 1)
    var nc = 0
    var i = 0
    while (i < n) {
      offs(nc) = i
      nc += 1
      i += UTF8String.numBytesForFirstByte(s.getByte(i))
    }
    offs(nc) = n
    if (nc < K)
      return UnsafeArrayData.fromPrimitiveArray(Array(PolyHash.hash(s)))
    val m = nc - (K - 1)
    val hs = new Array[Long](m)
    var w = 0
    while (w < m) {
      hs(w) = PolyHash.hashRange(s, offs(w), math.min(offs(w + K), n))
      w += 1
    }
    java.util.Arrays.sort(hs)
    // adjacent dedup in place
    var out = 1
    var r = 1
    while (r < m) {
      if (hs(r) != hs(out - 1)) { hs(out) = hs(r); out += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (out == m) hs else java.util.Arrays.copyOf(hs, out))
  }
}
