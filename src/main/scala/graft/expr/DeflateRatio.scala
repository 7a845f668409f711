package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal — deflate(bytes).length /
  * bytes.length over the document's UTF-8 bytes. The classic cheap
  * entropy proxy corpus-quality pipelines compute per document:
  * boilerplate, keyword-stuffed spam, and template farms compress
  * far below natural prose, while encrypted/encoded junk barely
  * compresses at all, so both tails of the ratio distribution are
  * filter candidates. Uses the repo's own from-spec RFC 1951
  * encoder ([[graft.ops.Deflate]], reference-pinned in DeflateSpec),
  * so the signal is bit-deterministic across runs and machines —
  * same input, same ratio, always.
  *
  * Empty text is defined as ratio 1.0 (nothing to compress, nothing
  * saved). Codegen'd scalar, scan-local; cost is one deflate pass
  * per document — the same order as the gzip packers the corpus
  * already pays for at ingest.
  */
object DeflateRatioKernel {
  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) 1.0
    else graft.ops.Deflate.compress(bytes).length.toDouble / bytes.length
  }
}

/** string → deflate compression ratio (codegen'd). */
case class DeflateRatioExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    DeflateRatioKernel.ratio(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.DeflateRatioKernel.ratio($c)")
  override protected def withNewChildInternal(newChild: Expression): DeflateRatioExpr =
    copy(child = newChild)
  override def prettyName: String = "deflate_ratio"
}

object DeflateRatio {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  def apply(u: Column): Column = column(DeflateRatioExpr(expression(u)))
}
