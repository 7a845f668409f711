package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd set-Jaccard over two array<string> columns (distinct
  * elements of each side).
  *
  * Replaces the declarative
  * `size(array_intersect(a,b)) / (size(a)+size(b)-inter)` chain on the
  * near-dup verify path: `array_intersect` is an interpreted O(|a|·?)
  * collection builder per row — this kernel is two hash sets and one
  * membership loop. Bit-exact contract with the chain it replaces on
  * already-distinct inputs: counts are integers, the quotient is the
  * same single IEEE division, and an empty union yields 0.0 (the
  * `when(union > 0, …).otherwise(0.0)` branch).
  */
object ArrayJaccardKernel {
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val setA = new java.util.HashSet[Any]()
    var i = 0
    val na = a.numElements()
    while (i < na) {
      setA.add(if (a.isNullAt(i)) null else a.getUTF8String(i)); i += 1
    }
    val setB = new java.util.HashSet[Any]()
    i = 0
    val nb = b.numElements()
    while (i < nb) {
      setB.add(if (b.isNullAt(i)) null else b.getUTF8String(i)); i += 1
    }
    var inter = 0
    val it = setB.iterator()
    while (it.hasNext) { if (setA.contains(it.next())) inter += 1 }
    val union = (setA.size + setB.size).toDouble - inter
    if (union > 0) inter / union else 0.0
  }
}

case class ArrayJaccardExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayJaccardKernel.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.ArrayJaccardKernel.jaccard($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayJaccardExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "array_jaccard"
}

object ArrayJaccard {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  def apply(a: Column, b: Column): Column = column(ArrayJaccardExpr(expression(a), expression(b)))
}
