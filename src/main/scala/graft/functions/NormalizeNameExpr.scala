package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen-friendly NFKD name normalization (SURVEY §7.3: promote the hot
  * fuzzy-join key function F2 from a Scala UDF to a native Catalyst
  * Expression). Unlike the UDF, this stays inside whole-stage codegen —
  * no Row encoding boundary per call — and is registered for SQL use.
  */
object NormalizeNameStatic {
  /** JVM kernel shared by eval and generated code. */
  def normalize(s: UTF8String): UTF8String =
    if (s == null) null
    else UTF8String.fromString(Udfs.normalizeNameFn(s.toString))
}

case class NormalizeNameExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_name"

  override def nullSafeEval(v: Any): Any =
    NormalizeNameStatic.normalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NormalizeNameStatic.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeNameExpr =
    copy(child = newChild)
}

object NormalizeNameExpr {
  /** Register `normalize_name(expr)` in the session function registry. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "normalize_name", exprs => NormalizeNameExpr(exprs.head), "scala_udf")

  /** Column-level entry point via the registered function (public API —
    * avoids the private[sql] Column constructors).
    */
  def normalizeName(c: Column): Column =
    org.apache.spark.sql.functions.call_function("normalize_name", c)
}
