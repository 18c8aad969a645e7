package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fused dot product over two array<double> columns, as a native
  * Catalyst expression with codegen.
  *
  * The builtin composition `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * is codegen'd too, but it materializes the zipped product ARRAY per
  * row pair before folding it — on an ANN scoring join that's one
  * 64-element allocation per candidate pair, millions per task. This
  * expression is a single allocation-free primitive loop emitted
  * directly into whole-stage codegen via a static call.
  *
  * Numerically IDENTICAL to the builtin form and the DuckDB oracle's
  * list_dot_product: all three sum products left-to-right in doubles,
  * so every query keeps hash-matching the oracle.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(VectorMath.dot(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorMath.dot($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotProduct = copy(left = l, right = r)
}

object VectorMath {

  /** Shared by interpreted eval and generated code. Null elements are
    * not expected in embedding vectors; lengths clamp to the shorter
    * side (same rows the builtin zip_with would pair non-null). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  def dotProduct(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
