package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd URL expressions (canonicalize / host / domain) — static
  * calls into graft.core.UrlOps so the crawl-dedup pass stays inside
  * whole-stage codegen (same discipline as the text-hash expressions).
  */
case class UrlCanonicalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "url_canonicalize"
  override protected def nullSafeEval(s: Any): Any =
    UTF8String.fromString(
      graft.core.UrlOps.canonicalize(s.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.core.UrlOps.canonicalize($s.toString()))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class UrlHostExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "url_host"
  override protected def nullSafeEval(s: Any): Any =
    UTF8String.fromString(
      graft.core.UrlOps.host(s.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.core.UrlOps.host($s.toString()))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class UrlDomainExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "url_domain"
  override protected def nullSafeEval(s: Any): Any = {
    val u = s.asInstanceOf[UTF8String].toString
    UTF8String.fromString(graft.core.UrlOps.domain(graft.core.UrlOps.host(u)))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.core.UrlOps.domain(graft.core.UrlOps.host($s.toString())))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object url {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def canonicalize(c: Column): Column = column(UrlCanonicalizeExpr(expression(c)))
  def host(c: Column): Column = column(UrlHostExpr(expression(c)))
  def domain(c: Column): Column = column(UrlDomainExpr(expression(c)))
}
