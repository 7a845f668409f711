package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.Sentences

/** Codegen'd rebuild kernel for sentence-level corpus dedup
  * ([[graft.ops.Dedup.dedupSentences]]): re-split `text` with the
  * deterministic rule segmenter ([[Sentences.sentencesOf]] — the SAME
  * kernel that produced the positions being dropped, so indices line
  * up by construction), drop the sentences whose position appears in
  * `drops`, and rejoin the kept ones with one space.
  *
  * Why an expression and not a Dataset map: the removal lists arrive
  * via a left join of a SMALL aggregate onto the corpus (AQE
  * broadcast candidate), and this kernel then rides the same
  * scan-local projection as any scalar — document bodies never enter
  * an Exchange and never pay an InternalRow⇄object serialization
  * round-trip. The sibling [[graft.ops.Dedup.dedupLines]] gets the
  * same shape for free from `filter(split(...))`; sentences need a
  * real segmenter, hence this kernel.
  */
object SentenceDropKernel {
  def drop(text: UTF8String, drops: ArrayData): UTF8String = {
    val n = drops.numElements()
    // positions come from collect_set over this kernel's own output
    // indices: non-null ints, in-range for THIS text's segmentation
    val ds = new java.util.HashSet[Int](math.max(4, n * 2))
    var i = 0
    while (i < n) { ds.add(drops.getInt(i)); i += 1 }
    val sents = Sentences.sentencesOf(text.toString)
    val sb = new java.lang.StringBuilder(text.numBytes)
    var idx = 0
    var first = true
    while (idx < sents.length) {
      if (!ds.contains(idx)) {
        if (!first) sb.append(' ')
        sb.append(sents(idx))
        first = false
      }
      idx += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** (string, array<int>) → string with the listed sentence positions
  * removed. Null text or null drop list → null (callers coalesce).
  */
case class SentenceDropExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(text: Any, drops: Any): Any =
    SentenceDropKernel.drop(text.asInstanceOf[UTF8String], drops.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, d) => s"graft.expr.SentenceDropKernel.drop($t, $d)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SentenceDropExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sentence_drop"
}

object SentenceDrop {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  def apply(text: Column, drops: Column): Column =
    column(SentenceDropExpr(expression(text), expression(drops)))
}
