package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused word n-gram generator: text → ["w1 w2 w3", ...] in ONE
  * per-row pass (tokenize on single spaces dropping empties, then a
  * sliding join) — the innermost loop of the whole dedup/text tier
  * (shingling feeds MinHash, Jaccard, PPJoin, SimHash, span dedup,
  * heavy hitters, decontamination).
  *
  * The composed form (`graft.functions.Text.shinglesComposed`:
  * split → filter → a (n−1)-deep zip_with/slice/concat_ws chain) is
  * built from higher-order functions, which Spark evaluates with
  * interpreted lambdas OUTSIDE whole-stage codegen and which
  * materialize n−1 intermediate arrays per row. This expression does
  * the same work in one compiled loop with one output allocation,
  * and IS codegen-friendly (a single static call). Bit-identical by
  * construction — same tokenizer contract (single-space delimiters,
  * empties dropped, fewer-than-n tokens → empty array), locked by
  * TextFunctionsSpec on real and adversarial inputs — so every
  * DuckDB oracle twin remains valid unchanged.
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, s"n=$n must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    WordNgrams.ngrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftx.WordNgrams.ngrams($c, $n)")

  override protected def withNewChildInternal(c: Expression): WordNgrams =
    copy(child = c)
}

object WordNgrams {

  /** Tokenize on single spaces (empties dropped) and emit the
    * n-token sliding windows joined with one space. */
  def ngrams(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val len = str.length
    val toks = new java.util.ArrayList[String]()
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || str.charAt(i) == ' ') {
        if (i > start) toks.add(str.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    val m = toks.size - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j < m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks.get(j + k))
        k += 1
      }
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }

  def col(c: Column, n: Int): Column =
    ExpressionUtils.column(WordNgrams(ExpressionUtils.expression(c), n))
}
