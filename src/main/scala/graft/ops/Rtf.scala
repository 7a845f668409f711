package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RTF text extraction — the legacy rich-text rung of the document
  * tier (round 15 continuation), beside DOCX/ODT/EPUB/PDF: decades
  * of exported documents and email attachments are .rtf, and the
  * format is a PUBLISHED specification (Microsoft's "Rich Text
  * Format (RTF) Specification", v1.9.1).
  *
  * The extraction walk:
  *  - groups `{}` maintain a state stack (current \ucN fallback
  *    count and codepage inherit into subgroups);
  *  - control words `\word[-]N` parse per the spec's grammar (letter
  *    run + optional signed parameter + ONE consumed space
  *    delimiter); control symbols `\{ \} \\` are literals,
  *    `\~` NBSP, `\-`/`\_` soft hyphens (dropped);
  *  - DESTINATION groups that are not document text are skipped
  *    whole: the `{\*\…}` ignorable form and the known binary/
  *    furniture destinations (fonttbl, colortbl, stylesheet, info,
  *    pict, object, themedata, datastore, …);
  *  - `\'hh` decodes through the declared codepage (`\ansicpgN` —
  *    windows-1252 default, the overwhelmingly common case; an
  *    unsupported codepage refuses rather than mis-decodes);
  *  - `\uN` emits the Unicode scalar (negative N + 65536 per the
  *    16-bit convention) and then SKIPS the current \uc count of
  *    fallback characters (plain or `\'hh`);
  *  - `\par`/`\line` → newline, `\tab` → tab, `\binN` skips N raw
  *    bytes (binary is never text).
  *
  * Never throws; None for non-RTF or structurally broken input
  * (unbalanced groups at EOF, truncated escapes). */
object Rtf {

  private object Bad extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bad(): Nothing = throw Bad

  private val SkipDestinations = Set(
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "themedata", "datastore", "xmlnstbl", "listtable", "listoverridetable",
    "generator", "filetbl", "revtbl", "header", "footer", "headerl",
    "headerr", "headerf", "footerl", "footerr", "footerf")

  def isRtf(p: Array[Byte]): Boolean =
    p != null && p.length >= 5 && p(0) == '{' && p(1) == '\\' &&
      p(2) == 'r' && p(3) == 't' && p(4) == 'f'

  def extract(p: Array[Byte]): Option[String] =
    try {
      if (!isRtf(p)) return None
      val sb = new java.lang.StringBuilder
      var i = 0
      var depth = 0
      var uc = 1
      var cp = "windows-1252"
      var ucStack = List.empty[(Int, String)]
      var skipDepth = -1 // when ≥ 0: inside a skipped destination
      var pendingUcSkip = 0
      var groupStart = false // just entered a group: destination checks
      val n = p.length
      def u8(k: Int): Int = { if (k >= n) bad(); p(k) & 0xFF }
      while (i < n) {
        val c = u8(i)
        c match {
          case '{' =>
            ucStack = (uc, cp) :: ucStack
            depth += 1
            groupStart = true
            i += 1
          case '}' =>
            depth -= 1
            if (depth < 0) bad()
            ucStack match {
              case (u, cpg) :: rest => uc = u; cp = cpg; ucStack = rest
              case Nil => bad()
            }
            if (skipDepth >= 0 && depth < skipDepth) skipDepth = -1
            groupStart = false
            i += 1
            if (depth == 0) i = n // ignore trailing bytes after the root
          case '\\' =>
            if (i + 1 >= n) bad()
            val c1 = u8(i + 1)
            if (c1 == '\'') {
              if (i + 4 > n) bad()
              val hex = Integer.parseInt(
                new String(p, i + 2, 2, java.nio.charset.StandardCharsets.US_ASCII), 16)
              if (pendingUcSkip > 0) pendingUcSkip -= 1
              else if (skipDepth < 0)
                sb.append(new String(Array(hex.toByte), java.nio.charset.Charset.forName(cp)))
              i += 4
              groupStart = false
            } else if (c1 == '{' || c1 == '}' || c1 == '\\') {
              if (pendingUcSkip > 0) pendingUcSkip -= 1
              else if (skipDepth < 0) sb.append(c1.toChar)
              i += 2
              groupStart = false
            } else if (c1 == '~') {
              if (skipDepth < 0) sb.append('\u00A0')
              i += 2; groupStart = false
            } else if (c1 == '-' || c1 == '_') {
              i += 2; groupStart = false // soft hyphens: dropped
            } else if (c1 == '*') {
              // the ignorable-destination marker: skip the group
              // unless a later known control claims it — the spec
              // contract is "skip if you do not understand", and we
              // only extract TEXT, so skip
              if (skipDepth < 0) skipDepth = depth
              i += 2
              groupStart = false
            } else if (c1 == '\n' || c1 == '\r') {
              // escaped newline = \par
              if (skipDepth < 0) sb.append('\n')
              i += 2; groupStart = false
            } else if ((c1 >= 'a' && c1 <= 'z') || (c1 >= 'A' && c1 <= 'Z')) {
              var j = i + 1
              while (j < n && ((u8(j) >= 'a' && u8(j) <= 'z') || (u8(j) >= 'A' && u8(j) <= 'Z'))) j += 1
              val word = new String(p, i + 1, j - i - 1,
                java.nio.charset.StandardCharsets.US_ASCII)
              var neg = false
              var num = -1L
              // presence tracked separately from the value: \u-1 is a
              // LEGAL parameter (U+FFFF after the +65536 wrap) and must
              // not be conflated with "no parameter"
              var hasNum = false
              if (j < n && (u8(j) == '-' || (u8(j) >= '0' && u8(j) <= '9'))) {
                if (u8(j) == '-') { neg = true; j += 1 }
                hasNum = true
                num = 0
                var digits = 0
                while (j < n && u8(j) >= '0' && u8(j) <= '9' && digits < 10) {
                  num = num * 10 + (u8(j) - '0'); j += 1; digits += 1
                }
                if (neg) num = -num
              }
              if (j < n && u8(j) == ' ') j += 1 // the consumed delimiter
              i = j
              val wasGroupStart = groupStart
              groupStart = false
              word match {
                case "bin" =>
                  val skip = math.max(0L, num)
                  if (skip > n) bad()
                  i += skip.toInt
                case "u" =>
                  if (pendingUcSkip > 0) pendingUcSkip -= 1 // nested fallback
                  else {
                    if (!hasNum) bad()
                    val scalar = if (num < 0) num + 65536 else num
                    if (scalar < 0 || scalar > 0xFFFF) bad()
                    if (skipDepth < 0) sb.append(scalar.toChar)
                    pendingUcSkip = uc
                  }
                case "uc" =>
                  uc = math.max(0L, math.min(num, 8L)).toInt
                case "ansicpg" =>
                  cp = num match {
                    case 1252 | -1 => "windows-1252"
                    case 1250 => "windows-1250"
                    case 1251 => "windows-1251"
                    case 65001 => "UTF-8"
                    case 10000 => "x-MacRoman"
                    case other => return None // unsupported codepage: refuse
                  }
                case "par" | "line" | "sect" | "page" =>
                  if (pendingUcSkip > 0) pendingUcSkip -= 1
                  else if (skipDepth < 0) sb.append('\n')
                case "tab" =>
                  if (pendingUcSkip > 0) pendingUcSkip -= 1
                  else if (skipDepth < 0) sb.append('\t')
                case "emdash" => if (skipDepth < 0) sb.append('\u2014')
                case "endash" => if (skipDepth < 0) sb.append('\u2013')
                case "lquote" => if (skipDepth < 0) sb.append('\u2018')
                case "rquote" => if (skipDepth < 0) sb.append('\u2019')
                case "ldblquote" => if (skipDepth < 0) sb.append('\u201C')
                case "rdblquote" => if (skipDepth < 0) sb.append('\u201D')
                case w if wasGroupStart && SkipDestinations.contains(w) =>
                  if (skipDepth < 0) skipDepth = depth
                case _ => () // formatting controls: no text
              }
            } else bad() // an unknown control symbol
          case '\r' | '\n' =>
            i += 1 // raw newlines are NOT text in RTF
            groupStart = false
          case _ =>
            if (pendingUcSkip > 0) pendingUcSkip -= 1
            else if (skipDepth < 0) sb.append(c.toChar)
            i += 1
            groupStart = false
        }
      }
      if (depth != 0) bad() // unbalanced at EOF
      Some(sb.toString)
    } catch {
      case Bad | _: NumberFormatException | _: ArrayIndexOutOfBoundsException |
        _: java.nio.charset.UnsupportedCharsetException => None
    }

  /** (id, decoded, n_chars, text) rows; refusals keep the row with
    * decoded=false (the quarantine contract). */
  def extractText(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        extract(if (payload == null) Array.emptyByteArray else payload) match {
          case Some(t) => (id, true, t.length.toLong, t)
          case None => (id, false, 0L, null: String)
        }
      })
      .toDF("id", "decoded", "n_chars", "text")
  }

  // ------------------------------------------------------------ builder

  /** Spec-legal RTF builder (fixture side): escapes text per the
    * spec — `\uN` with a `?` fallback under `\uc1` for every
    * non-ASCII scalar (surrogate pairs as two \u words), `\'hh` for
    * the cp1252-printable high bytes on ODD ids (both escape rungs
    * exercised), structural braces/backslashes escaped, newlines as
    * `\par` — wrapped in a header with a fonttbl + `{\*\generator}`
    * destination that the reader must skip. */
  private[graft] def build(id: Long, text: String): Array[Byte] = {
    val sb = new java.lang.StringBuilder
    sb.append("{\\rtf1\\ansi\\ansicpg1252\\deff0\\uc1")
    sb.append("{\\fonttbl{\\f0\\fswiss Helvetica;}}")
    sb.append("{\\*\\generator graft ").append(id).append(";}")
    sb.append("{\\info{\\title doc ").append(id).append("}}")
    sb.append("\\f0\\fs20 ")
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    text.foreach { ch =>
      ch match {
        case '\\' => sb.append("\\\\")
        case '{' => sb.append("\\{")
        case '}' => sb.append("\\}")
        case '\n' => sb.append("\\par\n")
        case '\t' => sb.append("\\tab ")
        case c if c < 32 => sb.append(f"\\'${c.toInt}%02x") // raw controls
        case c if c < 127 => sb.append(c)
        case c =>
          // odd ids: \'hh when cp1252 can hold the char; else \uN?
          val enc = cp1252.encode(java.nio.CharBuffer.wrap(Array(c)))
          if (id % 2 == 1 && enc.remaining() == 1 && {
            val b = enc.get(0)
            new String(Array(b), cp1252).charAt(0) == c
          }) sb.append(f"\\'${enc.get(0) & 0xFF}%02x")
          else sb.append("\\u").append(c.toInt.toShort.toInt).append('?')
      }
    }
    sb.append('}')
    sb.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** Gate packer: the document text round-trips through real RTF
    * with skipped destinations and both escape rungs. */
  def packTextRtf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Partitioning.fanOut(df)
      .select(col(idCol).cast("long"), coalesce(col(textCol), lit("")))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => (id, build(id, text)) })
      .toDF("id", "payload")
  }
}
