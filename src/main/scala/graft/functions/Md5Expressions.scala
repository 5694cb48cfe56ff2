package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared md5 plumbing for the two native digest expressions below:
  * one thread-local MessageDigest per executor thread. Spark's own
  * `md5` bottoms out in commons-codec `DigestUtils`, which calls
  * `MessageDigest.getInstance` (a provider lookup) PER ROW and renders
  * a 32-char hex string the callers here immediately re-parse (`conv`
  * base-16) or un-render (`unhex`) — pure constant cost at one digest
  * per token/position (r21 optimization round, guide §4).
  */
private[functions] object Md5Pool {
  private val pool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def digest(bytes: Array[Byte]): Array[Byte] = pool.get().digest(bytes)
}

/** `hash60_md5(s)` — the 60-bit md5 prefix hash, natively:
  * value-identical to `CAST(conv(substring(md5(s), 1, 15), 16, 10) AS
  * BIGINT)` (TextFunctions.hash60's composed form; the first 15 hex
  * chars of an md5 ARE the top 60 bits of its first 8 bytes), without
  * the hex render, substring, and base-16 re-parse. The DuckDB mirror
  * (`CAST(concat('0x', substring(md5(s),1,15)) AS BIGINT)`) is
  * untouched — oracles compare final outputs, and the VALUE here is
  * the same md5-derived integer.
  */
case class Hash60Md5(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = Hash60Md5.fnName

  override protected def nullSafeEval(input: Any): Any =
    Hash60Md5.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hash60Md5.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Hash60Md5 {
  val fnName = "hash60_md5"

  def hash(s: UTF8String): Long = {
    val d = Md5Pool.digest(s.getBytes)
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }
}

/** `md5_bin(x)` — the raw 16-byte md5 digest of a string or binary
  * column: value-identical to `unhex(md5(x))` without the intermediate
  * 32-char hex string (one render + one parse per row saved). Serves
  * the suffix-array rank identities (Dedup.saRankRows composes 16-byte
  * digests per position per doubling level) where only within-engine
  * EQUALITY of the digests is consumed.
  */
case class Md5Bin(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string or binary argument, got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = Md5Bin.fnName

  private def isString: Boolean = child.dataType == StringType

  override protected def nullSafeEval(input: Any): Any =
    if (isString) Md5Bin.hashString(input.asInstanceOf[UTF8String])
    else Md5Pool.digest(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (isString)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.Md5Bin.hashString($c);")
    else
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.Md5Bin.hashBytes($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Bin {
  val fnName = "md5_bin"

  def hashString(s: UTF8String): Array[Byte] = Md5Pool.digest(s.getBytes)
  def hashBytes(b: Array[Byte]): Array[Byte] = Md5Pool.digest(b)
}
