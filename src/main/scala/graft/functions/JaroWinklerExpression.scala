package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}

/** Native Catalyst expression for Jaro-Winkler similarity.
  *
  * Unlike the Scala UDF it replaces, `doGenCode` emits a direct static call,
  * so the comparison stays INSIDE whole-stage codegen — no codegen break, no
  * Row boxing/serialization per pair. That is what makes JW affordable when
  * the name match runs against a fact-scale side (PolysemyEval.nameMatch's
  * fuzzy residual), not just a small dim.
  */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler_similarity"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.jaroWinkler(a.toString, b.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.jaroWinkler($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSimilarity =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerSimilarity {
  /** Column-level entry point (classic-mode Column ↔ Expression bridge). */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinklerSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
