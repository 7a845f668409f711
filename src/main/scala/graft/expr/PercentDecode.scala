package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd RFC 3986 percent-decoding kernel.
  *
  * Decodes `%XX` hex escapes to bytes and reassembles UTF-8 runs;
  * `+` stays LITERAL (this is path decoding, not
  * application/x-www-form-urlencoded — the distinction Spark's
  * `url_decode` gets wrong for file paths). Malformed escapes (`%`
  * followed by fewer than two hex digits) pass through verbatim, the
  * tolerant behavior path consumers expect: a raw `%` in a legacy
  * path must not make the whole name undecodable.
  *
  * Used by the Delta transaction-log replay (add/remove paths are
  * percent-encoded per the Delta protocol's RFC 3986 rule) on the
  * distributed path, where a Scala UDF would break whole-stage
  * codegen inside the replay projection.
  */
object PercentDecodeKernel {
  def decode(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    val bytes = new java.io.ByteArrayOutputStream()
    var i = 0
    def flush(): Unit = if (bytes.size() > 0) {
      sb.append(new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
      bytes.reset()
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val h = Character.digit(s.charAt(i + 1), 16)
        val l = Character.digit(s.charAt(i + 2), 16)
        if (h >= 0 && l >= 0) { bytes.write((h << 4) | l); i += 3 }
        else { flush(); sb.append(c); i += 1 }
      } else { flush(); sb.append(c); i += 1 }
    }
    flush()
    sb.toString
  }

  def decode(s: UTF8String): UTF8String = UTF8String.fromString(decode(s.toString))
}

/** string → percent-decoded string (codegen'd). */
case class PercentDecodeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    PercentDecodeKernel.decode(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.PercentDecodeKernel.decode($c)")
  override protected def withNewChildInternal(newChild: Expression): PercentDecodeExpr =
    copy(child = newChild)
  override def prettyName: String = "percent_decode"
}

object PercentDecode {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  def apply(u: Column): Column = column(PercentDecodeExpr(expression(u)))
}
