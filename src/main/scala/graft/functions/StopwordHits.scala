package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `stopword_hits(toks, 'en')` — the number of array elements that are
  * stopwords of the named language, natively in one pass (r21, guide
  * §4). Value-identical to the composed
  * `size(filter(toks, t -> array_contains(lit(stopwords(lang)), t)))`
  * (and to the `isInCollection` variant), which carried an interpreted
  * HigherOrderFunction lambda per token — langId evaluates that chain
  * once per LANGUAGE per document, in the hot loop of every
  * curation/quality query. Null elements count as misses (both
  * composed forms exclude them); a null array is null (`size`'s
  * non-legacy null rule). The language must be a foldable string
  * literal naming a [[TextFunctions.stopwords]] entry.
  */
case class StopwordHits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right) match {
    case (ArrayType(StringType, _), Literal(l: UTF8String, StringType))
        if l != null && TextFunctions.stopwords.contains(l.toString) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, literal language in " +
        s"${TextFunctions.stopwords.keys.mkString("/")}), got " +
        s"(${left.dataType.catalogString}, ${right.sql})")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = StopwordHits.fnName

  private lazy val lang: String =
    right.asInstanceOf[Literal].value.asInstanceOf[UTF8String].toString

  override protected def nullSafeEval(toks: Any, langV: Any): Any =
    StopwordHits.count(toks.asInstanceOf[ArrayData], lang)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"""${ev.value} = graft.functions.StopwordHits.count($a, "$lang");""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StopwordHits {
  val fnName = "stopword_hits"

  // per-language UTF8String sets, built once per JVM (10 words each:
  // a linear scan beats hash overhead at this size)
  private val sets: Map[String, Array[UTF8String]] =
    TextFunctions.stopwords.map { case (l, ws) =>
      l -> ws.map(UTF8String.fromString).toArray
    }

  def count(toks: ArrayData, lang: String): Int = {
    val set = sets(lang)
    val n = toks.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        var j = 0
        while (j < set.length) {
          if (set(j).equals(t)) { c += 1; j = set.length }
          else j += 1
        }
      }
      i += 1
    }
    c
  }
}
