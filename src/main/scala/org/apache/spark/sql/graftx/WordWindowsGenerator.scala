package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst `Generator` (UDTF): text → one row per overlapping
  * token window, in a single per-row pass — the chunking step that
  * turns documents into training windows (`Curate.chunkWindows`).
  *
  * This is the fourth Catalyst extension CLASS in the engine
  * (expressions with codegen, a typed UDAF, an optimizer rule, a
  * whole-operator plan — and now a generator): the composed form
  * (`sequence` → `posexplode` → `slice` → `array_join`) first
  * materializes the full token array as a column, then allocates a
  * slice array AND a joined string per chunk through four generic
  * expression layers. The generator tokenizes once and writes each
  * output row directly — no intermediate arrays, one StringBuilder —
  * while keeping the exact contract of the composed form (same
  * single-space tokenizer as [[WordNgrams]], empties dropped, starts
  * at 0, stride steps, last window truncated; zero-token documents
  * emit nothing), locked by CurationSpec's parity case.
  *
  * Generators run interpreted inside `GenerateExec` (Spark codegens
  * only its built-ins), but the inner loop is one tight JVM method —
  * the expensive part was never the dispatch, it was the per-chunk
  * array churn.
  */
case class WordWindows(child: Expression, win: Int, stride: Int)
    extends UnaryExpression with Generator with ExpectsInputTypes
    with CodegenFallback {

  require(win > 0 && stride > 0, s"win=$win stride=$stride must be > 0")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", LongType, nullable = false),
    StructField("chunk_start", LongType, nullable = false),
    StructField("n_chunk_tokens", LongType, nullable = false),
    StructField("chunk_text", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) return Nil
    val str = raw.asInstanceOf[UTF8String].toString
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
    val n = toks.size
    if (n == 0) return Nil
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](
      (n + stride - 1) / stride)
    val sb = new java.lang.StringBuilder()
    var idx = 0L
    var cs = 0
    while (cs < n) {
      val end = math.min(cs + win, n)
      sb.setLength(0)
      var k = cs
      while (k < end) {
        if (k > cs) sb.append(' ')
        sb.append(toks.get(k))
        k += 1
      }
      out += new GenericInternalRow(Array[Any](
        idx, cs.toLong, (end - cs).toLong,
        UTF8String.fromString(sb.toString)))
      idx += 1L
      cs += stride
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): WordWindows =
    copy(child = c)
}

object WordWindows {
  def col(c: Column, win: Int, stride: Int): Column =
    ExpressionUtils.column(WordWindows(ExpressionUtils.expression(c),
      win, stride))
}
