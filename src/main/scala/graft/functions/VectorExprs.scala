package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd float-embedding expressions: cosine, dot, random-hyperplane
  * LSH signature — the similarity-search kernel surface.
  */
case class CosineSimExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.core.VecKernels.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.core.VecKernels.cosineF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

case class DotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.core.VecKernels.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.core.VecKernels.dotF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

case class RpSignatureExpr(child: Expression, nBits: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rp_signature"
  override protected def nullSafeEval(a: Any): Any =
    graft.core.VecKernels.rpSignature(a.asInstanceOf[ArrayData], nBits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.core.VecKernels.rpSignature($a, $nBits, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** nearest_centroid(vec) → int: argmax-cosine centroid id. The centroid
  * table is embedded in the expression and ships with the serialized plan
  * (ctx.addReferenceObj) — on a cluster every executor gets it with the
  * task, no broadcast join, no shuffle (the IVF assign is a map).
  */
case class NearestCentroidExpr(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"
  override protected def nullSafeEval(a: Any): Any =
    graft.core.VecKernels.nearestCentroid(a.asInstanceOf[ArrayData], centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    defineCodeGen(ctx, ev, v => s"graft.core.VecKernels.nearestCentroid($v, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** nearest_centroids(vec, k) → array<int>: top-k probe list per query. */
case class NearestCentroidsExpr(child: Expression, centroids: Array[Array[Float]],
    k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"
  override protected def nullSafeEval(a: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      graft.core.VecKernels.nearestCentroids(a.asInstanceOf[ArrayData], centroids, k))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    defineCodeGen(ctx, ev, v =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.core.VecKernels.nearestCentroids($v, $ref, $k))")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** pca_project(vec) → array<float>: center on `mean`, project onto the
  * `basis` rows. Model rides the serialized plan (addReferenceObj) —
  * dimensionality reduction is a zero-shuffle map over the scan.
  */
case class PcaProjectExpr(child: Expression, mean: Array[Double],
                          basis: Array[Array[Double]]) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "pca_project"
  override protected def nullSafeEval(a: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      graft.core.PcaKernel.project(a.asInstanceOf[ArrayData], mean, basis))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("mean", mean, "double[]")
    val b = ctx.addReferenceObj("basis", basis, "double[][]")
    defineCodeGen(ctx, ev, v =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.core.PcaKernel.project($v, $m, $b))")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object vec {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def cosine_sim(a: Column, b: Column): Column =
    column(CosineSimExpr(expression(a), expression(b)))
  def dot(a: Column, b: Column): Column =
    column(DotExpr(expression(a), expression(b)))
  def rp_signature(a: Column, nBits: Int, seed: Long): Column =
    column(RpSignatureExpr(expression(a), nBits, seed))
  def nearest_centroid(a: Column, centroids: Array[Array[Float]]): Column =
    column(NearestCentroidExpr(expression(a), centroids))
  def nearest_centroids(a: Column, centroids: Array[Array[Float]], k: Int): Column =
    column(NearestCentroidsExpr(expression(a), centroids, k))
  def pca_project(a: Column, mean: Array[Double], basis: Array[Array[Double]]): Column =
    column(PcaProjectExpr(expression(a), mean, basis))
}
