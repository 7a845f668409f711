package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd dot product over two array<double> columns.
  *
  * Replaces `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, (acc,x) =>
  * acc + x)`: higher-order functions are interpreted (no codegen, no
  * CSE), which makes candidate verification O(pairs × dim) in lambda
  * dispatches — 20-100× slower than this tight loop on the hot paths
  * (ANN scoring, embedding near-dup verify).
  *
  * Bit-exact contract with the fold it replaces: accumulate
  * `acc + a(i)*b(i)` in element order starting from 0.0 — the
  * identical IEEE double sequence, so oracle-matched results do not
  * move. Null contract likewise mirrors the fold: a null input array,
  * any null element, or mismatched lengths (zip_with pads with null,
  * null poisons the sum) → null.
  */
object VecDotKernel {
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

case class VecDotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    VecDotKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.expr.VecDotKernel.dot($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_dot"
}

object VecDot {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  def apply(a: Column, b: Column): Column = column(VecDotExpr(expression(a), expression(b)))
}
