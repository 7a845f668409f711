package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (UAX #15) — the canonical first step of any
  * text-dedup / hashing pipeline: visually identical strings with
  * different codepoint sequences (`e` + COMBINING ACUTE vs the
  * precomposed `é`, the Angstrom SIGN vs `Å`) must hash together, or
  * near-dup clusters silently split. NFC/NFD are the canonical
  * forms; NFKC/NFKD additionally fold compatibility variants
  * (ligatures `ﬁ`→`fi`, fullwidth `Ａ`→`A`, circled digits, unit
  * signs) — the aggressive fold tokenizer pipelines run before BPE.
  *
  * The normalization tables come from the JDK's own
  * `java.text.Normalizer` (ICU-lineage, part of the platform — the
  * same precedent as the JDK Deflater on the PNG write side); the
  * gate cross-pins our NFC against DuckDB's independent utf8proc
  * implementation, so two unrelated Unicode table builds must agree
  * on every byte.
  *
  * Scale shape: a codegen'd scalar with an ASCII fast path — a
  * string whose UTF-8 byte count equals its char count is pure
  * ASCII, already normalized in ALL four forms, and passes through
  * without so much as a String allocation (most corpus text).
  * Non-ASCII strings take the JDK's quick-check (`isNormalized`)
  * before paying for the rewrite.
  */
object UnicodeNormalizeKernel {

  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  private def formOf(name: String): java.text.Normalizer.Form = name match {
    case "NFC" => java.text.Normalizer.Form.NFC
    case "NFD" => java.text.Normalizer.Form.NFD
    case "NFKC" => java.text.Normalizer.Form.NFKC
    case _ => java.text.Normalizer.Form.NFKD
  }

  def normalize(s: UTF8String, form: String): UTF8String = {
    // ASCII fast path: numBytes == numChars ⇔ every char is one
    // UTF-8 byte ⇔ ASCII, which is normalized in every form.
    if (s.numBytes == s.numChars) return s
    val f = formOf(form)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }

  def normalize(s: String, form: String): String =
    java.text.Normalizer.normalize(s, formOf(form))
}

/** string → normalized string (codegen'd; `form` is compile-time). */
case class UnicodeNormalizeExpr(child: Expression, form: String) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UnicodeNormalizeKernel.normalize(input.asInstanceOf[UTF8String], form)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.expr.UnicodeNormalizeKernel.normalize($c, "$form")""")
  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalizeExpr =
    copy(child = newChild)
  override def prettyName: String = "unicode_normalize"
}

object UnicodeNormalize {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  def apply(u: Column, form: String = "NFC"): Column = {
    require(UnicodeNormalizeKernel.Forms(form),
      s"unicode_normalize: form must be one of ${UnicodeNormalizeKernel.Forms.mkString("/")}, got '$form'")
    column(UnicodeNormalizeExpr(expression(u), form))
  }
}
