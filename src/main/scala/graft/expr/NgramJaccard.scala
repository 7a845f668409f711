package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-n-gram Jaccard similarity as a native codegen'd
  * expression.
  *
  * Same motivation as [[MinHashKernel]]: the declarative form
  * (`transform` + `array_distinct` + `array_intersect`) is interpreted
  * and materializes two gram arrays per comparison; this kernel builds
  * two hash sets and counts the intersection in one pass. Semantics
  * are identical to the SQL formulation used by the DuckDB oracle:
  * grams are substr(text, i+1, n) for i in [0, max(len-n, 0)],
  * deduplicated, with |A∩B| / |A∪B| (0.0 when the union is empty).
  * Gram extraction is character-based (UTF-16 code units via String),
  * matching SQL substr semantics for BMP text.
  */
object NgramKernel {
  def jaccard(a: UTF8String, b: UTF8String, n: Int): Double = {
    val sa = grams(a.toString, n)
    val sb = grams(b.toString, n)
    if (sa.isEmpty && sb.isEmpty) return 0.0
    var inter = 0
    val (small, large) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
    val it = small.iterator()
    while (it.hasNext) if (large.contains(it.next())) inter += 1
    val union = sa.size + sb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  private def grams(s: String, n: Int): java.util.HashSet[String] = {
    val out = new java.util.HashSet[String]()
    val last = math.max(s.length - n, 0)
    var i = 0
    while (i <= last) {
      out.add(s.substring(i, math.min(i + n, s.length)))
      i += 1
    }
    out
  }
}

case class NgramJaccardExpr(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(l: Any, r: Any): Any =
    NgramKernel.jaccard(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.expr.NgramKernel.jaccard($l, $r, $n)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramJaccardExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "ngram_jaccard"
}

object NgramJaccard {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  def apply(a: Column, b: Column, n: Int = 3): Column =
    column(NgramJaccardExpr(expression(a), expression(b), n))
}
