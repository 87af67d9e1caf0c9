package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

/** Upper-triangle gram-matrix cell expansion for q204 — the
  * [[PostingPairs]] discipline applied to the embedding second-moment
  * table: an embedding row of dimension d emits its d(d+1)/2
  * upper-triangle cells (i, j, p) with 1-based i ≤ j and
  * p = round(x_i·10⁴) · round(x_j·10⁴) as exact longs.
  *
  * The composed form — `explode(flatten(transform(sequence(1, d), i ->
  * transform(sequence(i, d), j -> struct(...)))))` — evaluates as
  * interpreted higher-order functions (Spark does not codegen
  * `LambdaFunction`s), allocating a sequence array, a struct array and
  * a flatten copy per row before the explode starts; a chained
  * double-`posexplode` rewrite is codegen but copies an array slice
  * into every intermediate row and measured SLOWER (r13 A/B: +0.7 s
  * at sf0.1). This generator writes each cell straight out of one
  * tight loop over a single per-row rounded copy of the vector — no
  * intermediate arrays, no lambda dispatch.
  *
  * Rounding replicates Spark's `CAST(round(CAST(v AS DOUBLE) * 10000)
  * AS BIGINT)` exactly: shortest-decimal BigDecimal of the IEEE
  * double product, HALF_UP at scale 0 (the TwsDrift.sparkRound
  * semantics) — so the cells are bit-identical to the composed form
  * (locked by CurationSpec; the gate faces the same DuckDB oracle).
  * Null elements propagate: a cell touching a null component emits
  * with p = null, exactly as the HOF chain's `element_at` arithmetic
  * did. A null or empty array emits nothing.
  */
case class GramCells(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"GramCells expects array<float>, got $other")
    }

  override def elementSchema: StructType = StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("p", LongType, nullable = true)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) return Nil
    val arr = raw.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    if (n == 0) return Nil
    // one rounded copy per row, then the cell loop reads longs only
    val e4 = new Array[Long](n)
    val isNull = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) isNull(i) = true
      else e4(i) = java.math.BigDecimal
        .valueOf(arr.getFloat(i).toDouble * 10000.0)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](
      n * (n + 1) / 2)
    i = 0
    while (i < n) {
      var j = i
      while (j < n) {
        val p: Any =
          if (isNull(i) || isNull(j)) null else e4(i) * e4(j)
        out += new GenericInternalRow(
          Array[Any]((i + 1).toLong, (j + 1).toLong, p))
        j += 1
      }
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): GramCells =
    copy(child = c)
}

object GramCells {
  def col(c: Column): Column =
    ExpressionUtils.column(GramCells(ExpressionUtils.expression(c)))
}
