package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair — the core transform of encoding-fixing tools
  * (ftfy's headline case): text whose UTF-8 bytes were once decoded
  * as windows-1252, turning every multi-byte character into 2-4
  * Latin junk characters (`é` → `Ã©`, `—` → `â€”`, `🙂` →
  * `ðŸ™‚`). Web crawls are full of it; repairing BEFORE dedup and
  * quality scoring keeps near-identical documents from hashing apart
  * and stops quality filters from punishing non-ASCII prose.
  *
  * Algorithm (deterministic, no heuristics beyond UTF-8 validity):
  * scan the text; wherever a character maps to a byte 0xC2-0xF4
  * under "sloppy windows-1252" (the cp1252 table with the five
  * undefined slots passing through as C1 controls — exactly how
  * lenient decoders behave) AND the following 1-3 characters map to
  * valid continuation bytes forming a STRICTLY valid UTF-8 sequence
  * (overlongs, surrogates, and > U+10FFFF rejected), replace the
  * run with the decoded character; otherwise copy the character
  * unchanged. The pass repeats to a fixpoint (≤ 3 rounds) so
  * double-garbled text (two bad decode hops) also recovers. Text
  * with no mojibake passes through character-identical, so the
  * repair is safe to run unconditionally at scan speed.
  *
  * [[garble]] is the exact inverse hop (UTF-8 bytes read as sloppy
  * cp1252) used by tests and the gate packer to plant mojibake the
  * oracle can predict.
  */
object MojibakeKernel {

  /** byte 0x80-0x9F → the windows-1252 character for it (the five
    * undefined slots keep their C1 control codepoint — "sloppy"). */
  private val cp1252High: Array[Char] = {
    val t = new Array[Char](32)
    var i = 0
    while (i < 32) { t(i) = (0x80 + i).toChar; i += 1 } // sloppy default
    val specials = Map(
      0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ', 0x84 -> '„',
      0x85 -> '…', 0x86 -> '†', 0x87 -> '‡', 0x88 -> 'ˆ',
      0x89 -> '‰', 0x8A -> 'Š', 0x8B -> '‹', 0x8C -> 'Œ',
      0x8E -> 'Ž', 0x91 -> '‘', 0x92 -> '’', 0x93 -> '“',
      0x94 -> '”', 0x95 -> '•', 0x96 -> '–', 0x97 -> '—',
      0x98 -> '˜', 0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
      0x9C -> 'œ', 0x9E -> 'ž', 0x9F -> 'Ÿ')
    specials.foreach { case (b, c) => t(b - 0x80) = c }
    t
  }

  /** char → its sloppy-cp1252 byte, or -1 if the char is not in the
    * table's image. */
  private val revMap: java.util.HashMap[Character, Integer] = {
    val m = new java.util.HashMap[Character, Integer]()
    var b = 0
    while (b < 0x80) { m.put(b.toChar, b); b += 1 }
    b = 0xA0
    while (b <= 0xFF) { m.put(b.toChar, b); b += 1 }
    var i = 0
    while (i < 32) { m.put(cp1252High(i), 0x80 + i); i += 1 }
    m
  }

  private def rev(c: Char): Int = {
    val v = revMap.get(c)
    if (v == null) -1 else v.intValue()
  }

  /** One repair pass; returns the input object unchanged if nothing
    * was repaired. */
  private def repairOnce(s: String): String = {
    var i = 0
    val n = s.length
    var sb: java.lang.StringBuilder = null // allocated on first repair
    var copied = 0
    while (i < n) {
      val b0 = rev(s.charAt(i))
      var seqLen = 0
      if (b0 >= 0xC2 && b0 <= 0xF4) {
        seqLen = if (b0 < 0xE0) 2 else if (b0 < 0xF0) 3 else 4
        if (i + seqLen > n) seqLen = 0
        else {
          var k = 1
          var ok = true
          val bs = new Array[Int](4)
          bs(0) = b0
          while (k < seqLen && ok) {
            val bk = rev(s.charAt(i + k))
            if (bk < 0x80 || bk > 0xBF) ok = false else bs(k) = bk
            k += 1
          }
          if (ok) {
            // strict validity: overlongs / surrogates / range
            val cp = seqLen match {
              case 2 => ((bs(0) & 0x1F) << 6) | (bs(1) & 0x3F)
              case 3 =>
                if (bs(0) == 0xE0 && bs(1) < 0xA0) -1
                else if (bs(0) == 0xED && bs(1) >= 0xA0) -1 // surrogates
                else ((bs(0) & 0x0F) << 12) | ((bs(1) & 0x3F) << 6) | (bs(2) & 0x3F)
              case _ =>
                if (bs(0) == 0xF0 && bs(1) < 0x90) -1
                else if (bs(0) == 0xF4 && bs(1) >= 0x90) -1
                else ((bs(0) & 0x07) << 18) | ((bs(1) & 0x3F) << 12) |
                  ((bs(2) & 0x3F) << 6) | (bs(3) & 0x3F)
            }
            if (cp < 0 || cp > 0x10FFFF) seqLen = 0
            else {
              if (sb == null) { sb = new java.lang.StringBuilder(n); sb.append(s, 0, i); copied = i }
              else sb.append(s, copied, i)
              sb.appendCodePoint(cp)
              i += seqLen
              copied = i
            }
          } else seqLen = 0
        }
      }
      if (seqLen == 0) i += 1
    }
    if (sb == null) s
    else { sb.append(s, copied, n); sb.toString }
  }

  def fix(s: String): String = {
    var cur = s
    var round = 0
    while (round < 3) {
      val next = repairOnce(cur)
      if (next eq cur) return cur
      cur = next
      round += 1
    }
    cur
  }

  /** The bad decode hop itself: UTF-8 bytes of `s` read as sloppy
    * windows-1252. `fix(garble(s)) == s` for any well-formed `s`. */
  def garble(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      sb.append(if (b < 0x80) b.toChar else if (b < 0xA0) cp1252High(b - 0x80) else b.toChar)
      i += 1
    }
    sb.toString
  }

  def fix(s: UTF8String): UTF8String = UTF8String.fromString(fix(s.toString))
}

/** string → mojibake-repaired string (codegen'd). */
case class FixMojibakeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    MojibakeKernel.fix(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.MojibakeKernel.fix($c)")
  override protected def withNewChildInternal(newChild: Expression): FixMojibakeExpr =
    copy(child = newChild)
  override def prettyName: String = "fix_mojibake"
}

object FixMojibake {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  def apply(u: Column): Column = column(FixMojibakeExpr(expression(u)))
}
