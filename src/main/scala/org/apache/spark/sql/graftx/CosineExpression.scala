package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, TypeCollection}

/** Fused native cosine similarity over two embedding arrays — the
  * hot scalar of the ANN/near-dup tier (SURVEY.md §2.12) as a single
  * whole-stage-codegen expression.
  *
  * The composed form (`graft.functions.Vectors.cosine`) builds three
  * higher-order-function folds (dot, norm², norm²) — correct, but
  * Catalyst evaluates lambda functions interpreted, allocating a
  * zipped intermediate array per fold per row. This expression runs
  * ONE generated loop with three accumulators and no allocation.
  *
  * Bit-compatibility contract (CosineExprSpec asserts it): each
  * accumulator performs the identical left-to-right double-accumulated
  * IEEE sequence as its fold twin — float elements widen to double
  * before multiplying (exact), mismatched lengths / null elements /
  * zero vectors yield null exactly like the zip_with-padded folds.
  * So the native form can replace the composed form ANYWHERE without
  * moving a bit, and the DuckDB oracle twin
  * (`Vectors.cosineSql`) stays valid.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // def, not val: TypeCollection is not serializable and must not
  // become a field of the (serialized) expression tree
  private def acceptedTypes =
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType))

  override def inputTypes: Seq[AbstractDataType] =
    Seq(acceptedTypes, acceptedTypes)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def fn(e: Expression): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => "Float"
      case _ => "Double"
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val ad = a.asInstanceOf[ArrayData]
    val bd = b.asInstanceOf[ArrayData]
    val r = (fn(left), fn(right)) match {
      case ("Float", "Float") => CosineSimilarity.computeFF(ad, bd)
      case ("Float", "Double") => CosineSimilarity.computeFD(ad, bd)
      case ("Double", "Float") => CosineSimilarity.computeDF(ad, bd)
      case _ => CosineSimilarity.computeDD(ad, bd)
    }
    r // null propagates as a null boxed Double
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cls = "org.apache.spark.sql.graftx.CosineSimilarity"
    val method = s"compute${fn(left).charAt(0)}${fn(right).charAt(0)}"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("cosTmp")
      s"""
         |java.lang.Double $tmp = $cls.$method($a, $b);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(newLeft, newRight)
}

object CosineSimilarity {

  // One variant per element-type pair: the generated code calls these
  // as plain Java statics, and keeping the element accessors
  // monomorphic keeps the loop JIT-friendly.

  def computeFF(a: ArrayData, b: ArrayData): java.lang.Double =
    loop(a, b, float = true, floatB = true)
  def computeFD(a: ArrayData, b: ArrayData): java.lang.Double =
    loop(a, b, float = true, floatB = false)
  def computeDF(a: ArrayData, b: ArrayData): java.lang.Double =
    loop(a, b, float = false, floatB = true)
  def computeDD(a: ArrayData, b: ArrayData): java.lang.Double =
    loop(a, b, float = false, floatB = false)

  private def loop(a: ArrayData, b: ArrayData, float: Boolean,
                   floatB: Boolean): java.lang.Double = {
    val n = a.numElements()
    // zip_with pads the shorter side with nulls -> the fold goes null
    if (n != b.numElements()) return null
    var ab = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (float) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (floatB) b.getFloat(i).toDouble else b.getDouble(i)
      ab += x * y
      aa += x * x
      bb += y * y
      i += 1
    }
    val d = math.sqrt(aa * bb)
    if (d == 0.0) null else java.lang.Double.valueOf(ab / d)
  }

  /** Column-API entry point. */
  def col(a: Column, b: Column): Column =
    ExpressionUtils.column(new CosineSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
