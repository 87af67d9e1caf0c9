package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Municipality

/** Grid-indexed point-in-polygon lookup holder: the polygon set, the
  * coarse cell → candidate-indices index, and one PRE-BUILT result
  * row per polygon, shipped to executors once inside the serialized
  * plan (the dimension is ~10³ polygons — the same order as the old
  * broadcast). `lookup` is the per-row hot path: cell probe, then
  * bbox + ray-cast over only that cell's candidates in priority
  * order — exactly [[Municipality.contains]]'s arithmetic, so results
  * are bitwise identical to the retired UDF. */
final class PolyGridData(polys: Array[Municipality],
                         val cellLat: Double, val cellLon: Double)
    extends Serializable {

  private val index: java.util.HashMap[Long, Array[Int]] = {
    val m = new java.util.HashMap[Long, Array[Int]]()
    graft.operators.Spatial.gridIndex(polys.toSeq, cellLat, cellLon)
      .foreach { case ((a, b), idxs) =>
        m.put((a.toLong << 32) | (b.toLong & 0xffffffffL), idxs)
      }
    m
  }

  // one reusable InternalRow per polygon — the generated code returns
  // a reference, no per-row allocation
  @transient private lazy val rows: Array[InternalRow] =
    polys.map(p => new GenericInternalRow(Array[Any](
      UTF8String.fromString(p.name),
      UTF8String.fromString(p.canton)): Array[Any]): InternalRow)

  /** Index of the first (priority-ordered) polygon containing the
    * point, or −1. Called per row from generated code. */
  def lookup(lat: Double, lon: Double): Int = {
    val key = ((lat / cellLat).floor.toInt.toLong << 32) |
      ((lon / cellLon).floor.toInt.toLong & 0xffffffffL)
    val cand = index.get(key)
    if (cand == null) return -1
    var k = 0
    while (k < cand.length) {
      if (polys(cand(k)).contains(lat, lon)) return cand(k)
      k += 1
    }
    -1
  }

  def rowFor(idx: Int): InternalRow = rows(idx)
}

/** Native codegen replacement for the last per-row Scala UDF in the
  * engine (`Spatial.enrichGrid`'s grid-pruned municipality lookup):
  * (lat, lon) → struct(municipality, canton) or null. A UDF pays the
  * ScalaUDF boundary per row (boxing, `Option` allocation, catalyst ↔
  * Scala conversion of the tuple); this expression participates in
  * whole-stage codegen and calls one monomorphic JVM method per row,
  * returning a pre-built row reference. SpatialSpec locks parity with
  * the classifyExpr composed form on the demo polygons and q50/q64's
  * oracle locks the synthetic grid. */
case class PointInPolygons(left: Expression, right: Expression,
                           data: PolyGridData)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = StructType(Seq(
    StructField("municipality", StringType, nullable = false),
    StructField("canton", StringType, nullable = false)))
  override def nullable: Boolean = true

  override protected def nullSafeEval(lat: Any, lon: Any): Any = {
    val idx = data.lookup(lat.asInstanceOf[Double], lon.asInstanceOf[Double])
    if (idx < 0) null else data.rowFor(idx)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val dataRef = ctx.addReferenceObj("polyGrid", data,
      classOf[PolyGridData].getName)
    val idx = ctx.freshName("pipIdx")
    nullSafeCodeGen(ctx, ev, (lat, lon) =>
      s"""
         |int $idx = $dataRef.lookup($lat, $lon);
         |if ($idx < 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dataRef.rowFor($idx);
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PointInPolygons {
  def col(lat: Column, lon: Column, polys: Seq[Municipality],
          cellLat: Double, cellLon: Double): Column =
    ExpressionUtils.column(PointInPolygons(
      ExpressionUtils.expression(lat), ExpressionUtils.expression(lon),
      new PolyGridData(polys.toArray, cellLat, cellLon)))
}
