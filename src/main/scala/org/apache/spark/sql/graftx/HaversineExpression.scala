package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType}

/** Native Catalyst implementation of the reference's haversine formula
  * (`lambda/trips_lambda.py:119-125`) — the custom-`Expression`
  * showcase from SURVEY.md §7 step 9.
  *
  * Versus the composed-builtins `graft.functions.Geo.haversineKm`
  * (already codegen'd), a single fused expression evaluates the trig
  * chain in one generated Java call with no intermediate Catalyst
  * nodes; the interesting property is `doGenCode`: the operator
  * participates in whole-stage codegen instead of per-row interpreted
  * eval (what a Scala UDF costs).
  *
  * Lives under org.apache.spark.sql because Catalyst's extension
  * points (AbstractDataType, ExpressionUtils) are private[sql]; the
  * public entry point is `graft.functions.Geo.haversineNative`.
  * Both implementations produce identical doubles (same IEEE op
  * order); HaversineExprSpec asserts that.
  */
case class Haversine(first: Expression, second: Expression,
                     third: Expression, fourth: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(DoubleType, DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(lat1: Any, lon1: Any,
                                      lat2: Any, lon2: Any): Any =
    Haversine.compute(lat1.asInstanceOf[Double], lon1.asInstanceOf[Double],
      lat2.asInstanceOf[Double], lon2.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cls = "org.apache.spark.sql.graftx.Haversine"
    defineCodeGen(ctx, ev, (a1, o1, a2, o2) =>
      s"$cls.compute($a1, $o1, $a2, $o2)")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(newFirst, newSecond, newThird, newFourth)
}

object Haversine {

  /** Shared by interpreted eval and generated code (static forwarder
    * makes it callable as a plain Java static). Mirrors the reference
    * formula exactly. */
  def compute(lat1: Double, lon1: Double,
              lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1) / 2
    val dLon = math.toRadians(lon2 - lon1) / 2
    val a = math.pow(math.sin(dLat), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon), 2)
    6371.0 * 2.0 * math.asin(math.sqrt(a))
  }

  /** Column-API entry point. */
  def col(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    ExpressionUtils.column(new Haversine(
      ExpressionUtils.expression(lat1), ExpressionUtils.expression(lon1),
      ExpressionUtils.expression(lat2), ExpressionUtils.expression(lon2)))
}
