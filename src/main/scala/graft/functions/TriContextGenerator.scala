package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

/** `explode_tri_contexts(tokens)` — the positions sibling of
  * [[ExplodeNGrams]]: streams each trigram window of a token array as
  * a (w1, w2, w) ROW instead of a space-joined string, for scorers
  * that need the context words as separate join keys
  * ([[graft.operators.NgramLm]]'s per-position backoff scoring).
  *
  * Replaces the composed
  * `explode(transform(sequence(3, size(toks)), i -> struct(
  *    element_at(toks, i-2), element_at(toks, i-1), element_at(toks, i))))`
  * which MATERIALIZED a full per-document struct array under an
  * interpreted higher-order lambda (three boxed element_at calls per
  * position) before the explode copied it back out. Same rows, same
  * ascending-position order, same null passthrough as element_at
  * (token arrays never carry nulls in practice), O(1) state per row.
  * Emits NOTHING for arrays shorter than 3 — identical to the
  * composed form, whose sequence(3, len) is empty there.
  */
case class ExplodeTriContexts(tokens: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(tokens)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExplodeTriContexts =
    copy(tokens = newChildren(0))

  override def checkInputDataTypes(): TypeCheckResult = tokens.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${tokens.dataType.catalogString}")
  }

  override def elementSchema: StructType = StructType(
    StructField("w1", StringType) ::
      StructField("w2", StringType) ::
      StructField("w", StringType) :: Nil)

  override def prettyName: String = "explode_tri_contexts"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = tokens.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val len = arr.numElements()
    if (len < 3) return Iterator.empty
    new Iterator[InternalRow] {
      private var k = 0
      override def hasNext: Boolean = k <= len - 3
      override def next(): InternalRow = {
        def at(i: Int) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
        val row = InternalRow(at(k), at(k + 1), at(k + 2))
        k += 1
        row
      }
    }
  }
}
