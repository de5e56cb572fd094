package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native sequential-fold dot product of two `array<double>` columns
  * (custom-operator ladder step (b); the X3/X2 scoring hot path).
  *
  * Replaces `aggregate(zip_with(a, b, _*_), 0.0, _+_)`: semantically
  * the SAME left-to-right accumulation (bit-identical doubles, which
  * the DuckDB oracle parity depends on — list_inner_product folds in
  * element order too), but evaluated as one primitive loop instead of
  * per-element lambda dispatch over two allocated intermediate arrays,
  * and ~1 line of generated Java instead of a nested HOF tree (the
  * same Janino-compile-size argument as [[LshSigsExpr]]).
  *
  * On length mismatch the shorter length wins (all engine vectors are
  * fixed 64-dim; the HOF form instead nulls the tail via zip_with — a
  * deliberate, documented divergence that never fires on engine data).
  * Null elements are read as 0.0 rather than poisoning the sum.
  */
case class VecDotExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<double>), got (${l.catalogString}, ${r.catalogString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDotEval.eval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecDotEval.eval($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VecDotExpr =
    copy(left = newLeft, right = newRight)
}

/** Interpreted/codegen shared evaluator for [[VecDotExpr]]. */
object VecDotEval {

  def eval(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Column-API entry. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(VecDotExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
}
