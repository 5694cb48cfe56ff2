package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) as a
  * native codegen expression — the first pass of text normalization in
  * a training-data pipeline: the same visible text can arrive as
  * precomposed code points (U+00E9 é) or base + combining mark
  * (U+0065 U+0301), and every downstream exact operator — hash dedup,
  * n-gram decontamination, postings terms, fingerprints — treats the
  * two encodings as different documents unless the corpus is
  * canonicalized first. Spark has no builtin for this (`lower`/`trim`
  * don't touch composition), so this wraps `java.text.Normalizer` the
  * way [[PolyHash]] wraps its fold: a single static call from
  * generated code, no UDF serialization.
  *
  * Fast path: pure-ASCII input (the overwhelming case in web corpora)
  * is returned UNCHANGED with no String round-trip — ASCII is closed
  * under NFC, so the byte scan is the whole check.
  *
  * Oracle portability: DuckDB's `nfc_normalize(s)` implements the same
  * UAX #15 transform, so results compare hash-exact for any input both
  * engines parse as valid UTF-8.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = NfcNormalize.fnName

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  val fnName = "nfc_normalize"

  /** Shared by interpreted eval and generated code. ASCII inputs (all
    * bytes < 0x80) return the SAME UTF8String — no allocation; only
    * strings that can actually change composition pay the
    * String-decode + Normalizer + re-encode cost.
    */
  def normalize(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val str = s.toString
      if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
      else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
    }
  }
}
