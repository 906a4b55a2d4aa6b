package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine-portable hash64 contract — numerically identical to
  * `conv(substring(md5(s), 1, 15), 16, 10)` (first 15 md5 hex chars as a
  * 60-bit BIGINT, what external oracles compute) — but evaluated
  * directly from the digest bytes: `(first 8 bytes as u64 big-endian)
  * >>> 4`, with no hex string, no substring, no base-conversion parse.
  * On signature-heavy paths (millions of shingles) the allocation-free
  * form measured ~10x faster than the composed built-ins. */
case class Md5Hash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_hash64 expects a string argument, got ${child.dataType}")

  def hashOf(s: UTF8String): Long = Md5Hash64.hash(s)

  override def nullSafeEval(input: Any): Any =
    Md5Hash64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      s"${ev.value} = graft.functions.Md5Hash64.hash($in);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Full-width sibling of [[Md5Hash64]]: the first 8 md5 digest bytes as
  * a big-endian SIGNED 64-bit value (no `>>> 4`). Used where all 64 bits
  * carry signal (64-bit SimHash); external oracles recover bit j as
  * `(parse(hex[2..16]) >> j) & 1` for j < 60 and
  * `(parse(hex[1]) >> (j-60)) & 1` above — no 64-bit hex parse needed. */
case class Md5Hash64Full(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash64_full"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_hash64_full expects a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    Md5Hash64.hashFull(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      s"${ev.value} = graft.functions.Md5Hash64.hashFull($in);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Hash64 {
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private def first8BE(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  /** Static entry point (also called from generated code). */
  def hash(s: UTF8String): Long =
    first8BE(s) >>> 4 // == parse of the first 15 hex chars

  /** All 64 bits, signed (also called from generated code). */
  def hashFull(s: UTF8String): Long = first8BE(s)
}
