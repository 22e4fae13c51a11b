package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Codegen'd geodesic expressions: great-circle distance and broadcast
  * nearest-reference assignment (the geodesic sibling of
  * `nearest_centroid` — the reference table ships inside the serialized
  * plan via ctx.addReferenceObj, so assignment is a zero-shuffle map).
  */
case class HaversineExpr(first: Expression, second: Expression,
                         third: Expression, fourth: Expression)
    extends QuaternaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "haversine_m"
  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    graft.core.GeoKernels.haversineM(a.asInstanceOf[Double],
      b.asInstanceOf[Double], c.asInstanceOf[Double], d.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.core.GeoKernels.haversineM($a, $b, $c, $d)")
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): Expression =
    copy(a, b, c, d)
}

/** nearest_ref(lon, lat) → array<double> [ref_id, dist_m]. */
case class NearestRefExpr(left: Expression, right: Expression,
                          refs: Array[Array[Double]])
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "nearest_ref"
  override protected def nullSafeEval(lon: Any, lat: Any): Any =
    new GenericArrayData(graft.core.GeoKernels.nearestRef(
      lon.asInstanceOf[Double], lat.asInstanceOf[Double], refs))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("refs", refs, "double[][]")
    defineCodeGen(ctx, ev, (lon, lat) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.core.GeoKernels.nearestRef($lon, $lat, $ref))")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object geodesic {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def haversine_m(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column =
    column(HaversineExpr(expression(lon1), expression(lat1),
      expression(lon2), expression(lat2)))
  def nearest_ref(lon: Column, lat: Column, refs: Array[Array[Double]]): Column =
    column(NearestRefExpr(expression(lon), expression(lat), refs))
}
