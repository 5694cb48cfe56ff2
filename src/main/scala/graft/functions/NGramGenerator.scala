package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `explode_ngrams(tokens, n)` — a native Catalyst Generator that
  * streams the space-joined word n-grams of a token array as rows.
  *
  * Why a Generator and not `explode(transform(sequence(...)))`: the
  * built-in pattern MATERIALIZES the full n-gram array per row (one
  * allocation per gram plus the array) before the explode copies it
  * back out row by row. For corpus-scale token streams that
  * intermediate array is pure garbage-collector load — this generator
  * emits each gram as it is produced and holds O(1) state. Same rows,
  * same order (ascending start position), nulls skipped inside a gram
  * exactly like `concat_ws` (the expression it replaces).
  *
  * Emits NOTHING for arrays shorter than n (callers owning a
  * whole-doc fallback — shingle semantics — add it explicitly, as the
  * dedup operators do).
  */
case class ExplodeNGrams(tokens: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(tokens, n)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExplodeNGrams =
    copy(tokens = newChildren(0), n = newChildren(1))

  override def checkInputDataTypes(): TypeCheckResult = tokens.dataType match {
    case ArrayType(StringType, _) if n.foldable && n.dataType == IntegerType =>
      val nv = n.eval().asInstanceOf[Int]
      if (nv >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName: n must be >= 1, got $nv")
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, foldable int), got " +
        s"(${tokens.dataType.catalogString}, ${n.dataType.catalogString})")
  }

  override def elementSchema: StructType =
    StructType(StructField("gram", StringType) :: Nil)

  override def prettyName: String = "explode_ngrams"

  @transient private lazy val nv: Int = n.eval().asInstanceOf[Int]
  @transient private lazy val sep: UTF8String = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = tokens.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val len = arr.numElements()
    if (len < nv) return Iterator.empty
    val parts = new Array[UTF8String](nv)
    new Iterator[InternalRow] {
      private var i = 0
      override def hasNext: Boolean = i <= len - nv
      override def next(): InternalRow = {
        var j = 0
        while (j < nv) {
          parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
          j += 1
        }
        i += 1
        InternalRow(UTF8String.concatWs(sep, parts: _*))
      }
    }
  }
}
