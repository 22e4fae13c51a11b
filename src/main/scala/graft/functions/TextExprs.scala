package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd text-hash expressions (fingerprint, SimHash, MinHash) — the
  * dedup/fingerprint operator surface, kept inside whole-stage codegen via
  * static calls into graft.core.TextHash.
  */
case class Fingerprint64Expr(child: Expression) extends UnaryExpression
    {
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"
  override protected def nullSafeEval(s: Any): Any =
    graft.core.TextHash.fingerprint64(s.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.core.TextHash.fingerprint64($s.toString())")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class SimHash64Expr(child: Expression) extends UnaryExpression
    {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(s: Any): Any =
    graft.core.TextHash.simhash64(s.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.core.TextHash.simhash64($s.toString())")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** minhash(text, k, shingle) → array<bigint> signature. */
case class MinHashExpr(child: Expression, k: Int, shingle: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash"
  override protected def nullSafeEval(s: Any): Any =
    new GenericArrayData(
      graft.core.TextHash.minhash(s.asInstanceOf[UTF8String].toString, k, shingle))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.core.TextHash.minhash($s.toString(), $k, $shingle))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** jaccard_shingles(a, b, n) → double: exact word-n-gram Jaccard. */
case class JaccardShinglesExpr(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_shingles"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.core.TextHash.jaccardShingles(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.core.TextHash.jaccardShingles($a.toString(), $b.toString(), $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object text {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def fingerprint64(c: Column): Column = column(Fingerprint64Expr(expression(c)))
  def simhash64(c: Column): Column = column(SimHash64Expr(expression(c)))
  def minhash(c: Column, k: Int, shingle: Int): Column =
    column(MinHashExpr(expression(c), k, shingle))
  def jaccard_shingles(a: Column, b: Column, n: Int): Column =
    column(JaccardShinglesExpr(expression(a), expression(b), n))
}
