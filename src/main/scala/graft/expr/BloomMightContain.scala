package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Bloom membership probe: the filter bytes and hash count
  * are expression PARAMETERS (not children), added to the generated
  * class as references — so the bit array is materialized once per
  * task, not per row, and the per-row work is k md5-derived bit
  * tests via a static kernel call ([[graft.ops.Bloom.hit]]'s
  * arithmetic, shared with the SQL oracle). */
case class BloomMightContain(filter: Array[Byte], k: Int, child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any =
    graft.ops.Bloom.hit(filter, k, input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val filterRef = ctx.addReferenceObj("bloomFilter", filter, "byte[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.Bloom.hit($filterRef, $k, $c.toString())")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContain {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  def apply(filter: Array[Byte], k: Int, key: Column): Column =
    column(new BloomMightContain(filter, k, expression(key)))
}
