package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** geoparse_mentions(text) → array<struct<lat,lon,kind,name>>.
  *
  * One compiled pass per row wrapping the scalar reference parser
  * (graft.core.Geoparse) — replaces 6 regexp passes + an interpreted
  * higher-order-function n-gram explode + broadcast join. DataFrame
  * results are parity-equal to Geoparse.parse BY CONSTRUCTION (same
  * function), which is the invariant the pipeline tests pin.
  */
object GeoparseExprHelper {
  val mentionType: StructType = StructType(Seq(
    StructField("lat", DoubleType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("name", StringType, nullable = false)))

  def mentions(text: UTF8String): ArrayData = {
    val ms = graft.core.Geoparse.parse(text.toString)
    val rows = new Array[Any](ms.length)
    var i = 0
    ms.foreach { m =>
      rows(i) = InternalRow(m.lat, m.lon,
        UTF8String.fromString(m.kind), UTF8String.fromString(m.name))
      i += 1
    }
    new GenericArrayData(rows)
  }
}

case class GeoparseMentionsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(GeoparseExprHelper.mentionType, containsNull = false)
  override def prettyName: String = "geoparse_mentions"
  override protected def nullSafeEval(s: Any): Any =
    GeoparseExprHelper.mentions(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.GeoparseExprHelper.mentions($s)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object geoparse {
  import org.apache.spark.sql.GraftBridge.{column, expression}
  def geoparse_mentions(text: Column): Column =
    column(GeoparseMentionsExpr(expression(text)))
}
