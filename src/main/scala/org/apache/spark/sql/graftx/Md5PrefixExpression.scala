package org.apache.spark.sql.graftx

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine-portable 60-bit hash (`graft.functions.PortableHash`)
  * as ONE fused expression: MD5 digest bytes straight to the long
  * value of the first 15 hex digits.
  *
  * The composed form — `conv(substring(md5(x), 1, 15), 16, 10)` —
  * materializes a 32-char hex string, substrings it, and re-parses
  * base-16 per row: three allocations and a digit parse for 60 bits
  * the digest already contains. This expression reads the bits off
  * the raw digest (bytes 0–6, plus the high nibble of byte 7 — hex
  * digit 15) with a thread-local reused MessageDigest. It is
  * bit-identical to the composed form BY CONSTRUCTION (the hex
  * string is just a base-16 rendering of these bytes;
  * Md5PrefixSpec asserts equality on real and adversarial inputs),
  * so the DuckDB oracle twin (`PortableHash.hash60DuckSql`) remains
  * valid unchanged — same number, ~2× less per-row work in the
  * dedup tier's hottest loop.
  */
case class Md5Prefix60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftx.Md5Prefix60.hash($c)")

  override protected def withNewChildInternal(c: Expression): Md5Prefix60 =
    copy(child = c)
}

object Md5Prefix60 {

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 15 hex digits of md5(s) as an unsigned long: bytes 0..6
    * are hex digits 1..14, the high nibble of byte 7 is digit 15. */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val b = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    (v << 4) | ((b(7) & 0xf0L) >>> 4)
  }

  def col(c: Column): Column =
    ExpressionUtils.column(Md5Prefix60(ExpressionUtils.expression(c)))
}
