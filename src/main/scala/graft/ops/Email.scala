package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Email / mbox ingest — mailing-list archives and mail dumps are a
  * classic text corpus (Enron, LKML, pipermail), and the formats are
  * fully public: RFC 5322 (message syntax), RFC 2045/2046 (MIME,
  * multipart, transfer encodings), RFC 2047 (encoded-word headers),
  * and the mboxrd convention for message framing.
  *
  * What is implemented, from the specs alone:
  *  - mbox splitting: messages start at `From ` separator lines;
  *    body lines quoted as `>From ` / `>>From …` lose ONE `>`
  *    (mboxrd — the round-trip-safe variant);
  *  - header section: first blank line ends it; folded continuation
  *    lines (leading WSP) unfold to a space; names case-insensitive;
  *  - RFC 2047 encoded-words in headers: `=?charset?B?…?=` (base64)
  *    and `=?charset?Q?…?=` (`_` = space, `=XX` hex), linear
  *    whitespace BETWEEN adjacent encoded words removed (§6.2),
  *    charset through the same WHATWG-style label fold as the WARC
  *    ladder;
  *  - Content-Transfer-Encoding: `7bit`/`8bit`/`binary` pass,
  *    `quoted-printable` decoded per RFC 2045 §6.7 (hex escapes,
  *    soft line breaks, lenient on stray `=`), `base64` via the MIME
  *    decoder; unknown encodings refuse the message;
  *  - multipart bodies: boundary-delimited part walk (quoted or bare
  *    boundary parameter, preamble/epilogue dropped, `--…--`
  *    terminator), recursive for nested multiparts with a depth cap;
  *    the emitted text is the FIRST text/plain leaf, else the first
  *    text/html leaf verbatim with `body_is_html = true` (strip it
  *    downstream with html_extract — separation of concerns), else
  *    empty;
  *  - body charset through [[Warc.decodeBody]]'s ladder (declared
  *    charset → strict-UTF-8 → cp1252 fallback).
  *
  * One row per message: (seq, from, to, subject, date, message_id,
  * content_type, body_is_html, text) — dates verbatim (the sitemap
  * lastmod stance). Never throws; an unparseable message inside an
  * mbox quarantines as a seq-preserving null row rather than killing
  * the file.
  */
object Email {

  // ---- RFC 2045 §6.7 quoted-printable ----

  private[graft] def decodeQuotedPrintable(s: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s(i) & 0xFF
      if (c == '=') {
        if (i + 2 < s.length && s(i + 1) == '\r' && s(i + 2) == '\n') i += 3 // soft break CRLF
        else if (i + 1 < s.length && s(i + 1) == '\n') i += 2               // soft break LF
        else if (i + 2 < s.length &&
          Character.digit(s(i + 1), 16) >= 0 && Character.digit(s(i + 2), 16) >= 0) {
          out.write(Character.digit(s(i + 1), 16) * 16 + Character.digit(s(i + 2), 16))
          i += 3
        } else { out.write(c); i += 1 } // lenient: stray '=' passes through
      } else { out.write(c); i += 1 }
    }
    out.toByteArray
  }

  // ---- RFC 2047 encoded-words ----

  private def charsetOf(label: String): java.nio.charset.Charset = {
    val l = label.trim.toLowerCase(java.util.Locale.ROOT)
    val name = l match {
      case "utf-8" | "utf8" | "us-ascii" | "ascii" => "UTF-8"
      case "iso-8859-1" | "latin-1" | "latin1" | "windows-1252" | "cp1252" => "windows-1252"
      case other => other
    }
    try java.nio.charset.Charset.forName(name)
    catch { case _: Exception => java.nio.charset.StandardCharsets.UTF_8 }
  }

  private val EncodedWordRe = java.util.regex.Pattern.compile(
    "=\\?([^?]+)\\?([BbQq])\\?([^?]*)\\?=")

  private[graft] def decodeEncodedWords(header: String): String = {
    // §6.2: linear whitespace between adjacent encoded words is not displayed
    val joined = header.replaceAll("\\?=[ \t\r\n]+=\\?", "?==?")
    val m = EncodedWordRe.matcher(joined)
    val sb = new StringBuffer
    while (m.find()) {
      val cs = charsetOf(m.group(1))
      val decoded: Option[String] = m.group(2).toUpperCase match {
        case "B" =>
          try Some(new String(java.util.Base64.getMimeDecoder.decode(m.group(3)), cs))
          catch { case _: Exception => None }
        case _ =>
          val q = m.group(3).replace('_', ' ')
          Some(new String(decodeQuotedPrintable(
            q.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)), cs))
      }
      m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(
        decoded.getOrElse(m.group(0))))
    }
    m.appendTail(sb)
    sb.toString
  }

  // ---- message parsing ----

  private final case class Part(headers: Map[String, String], body: Array[Byte])

  /** Split head/body at the first blank line; unfold header lines. */
  private def parseHead(raw: Array[Byte]): Option[Part] = {
    val text = new String(raw, java.nio.charset.StandardCharsets.ISO_8859_1)
    val sep = "\r?\n\r?\n".r.findFirstMatchIn(text)
    val (headStr, bodyStart) = sep match {
      case Some(m) => (text.substring(0, m.start), m.end)
      case None => (text, text.length) // headers only, empty body
    }
    val unfolded = headStr.replaceAll("\r?\n[ \t]+", " ")
    val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
    unfolded.split("\r?\n").foreach { line =>
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon <= 0) return None // malformed header line
        val k = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        if (!headers.contains(k)) headers(k) = line.substring(colon + 1).trim
      }
    }
    Some(Part(headers.toMap,
      java.util.Arrays.copyOfRange(raw, bodyStart, raw.length)))
  }

  private def param(headerValue: String, name: String): Option[String] = {
    val lower = headerValue.toLowerCase(java.util.Locale.ROOT)
    val at = lower.indexOf(name + "=")
    if (at < 0) None
    else {
      val v = headerValue.substring(at + name.length + 1).trim
      if (v.startsWith("\"")) {
        val end = v.indexOf('"', 1)
        if (end < 0) None else Some(v.substring(1, end))
      } else {
        val end = v.indexWhere(c => c == ';' || c == ' ' || c == '\t')
        Some(if (end < 0) v else v.substring(0, end)).filter(_.nonEmpty)
      }
    }
  }

  private def decodeTransfer(enc: Option[String], body: Array[Byte]): Option[Array[Byte]] =
    enc.map(_.trim.toLowerCase(java.util.Locale.ROOT)).getOrElse("7bit") match {
      case "7bit" | "8bit" | "binary" | "" => Some(body)
      case "quoted-printable" => Some(decodeQuotedPrintable(body))
      case "base64" =>
        try Some(java.util.Base64.getMimeDecoder.decode(
          new String(body, java.nio.charset.StandardCharsets.US_ASCII)
            .filter(c => !c.isWhitespace)))
        catch { case _: Exception => None }
      case _ => None
    }

  /** Leaf (contentType, headers, decodedBody) parts, multiparts
    * expanded recursively. */
  private def leafParts(p: Part, depth: Int): Option[Seq[(String, Part)]] = {
    if (depth > 8) return None
    val ct = p.headers.getOrElse("content-type", "text/plain")
    val mime = ct.takeWhile(c => c != ';').trim.toLowerCase(java.util.Locale.ROOT)
    if (!mime.startsWith("multipart/")) {
      decodeTransfer(p.headers.get("content-transfer-encoding"), p.body)
        .map(b => Seq((mime, Part(p.headers, b))))
    } else {
      val boundary = param(ct, "boundary") match {
        case Some(b) => b; case None => return None
      }
      val text = new String(p.body, java.nio.charset.StandardCharsets.ISO_8859_1)
      val delim = "--" + boundary
      val lines = text.split("\r\n|\r|\n", -1)
      val sections = scala.collection.mutable.ArrayBuffer.empty[StringBuilder]
      var in = false
      var done = false
      lines.foreach { line =>
        if (!done) {
          if (line == delim) { sections += new StringBuilder; in = true }
          else if (line == delim + "--") done = true
          else if (in) {
            val sb = sections.last
            if (sb.nonEmpty) sb.append("\r\n")
            sb.append(line)
          } // preamble lines before the first delimiter drop
        } // epilogue drops
      }
      if (sections.isEmpty) return None
      val out = Seq.newBuilder[(String, Part)]
      sections.foreach { sb =>
        parseHead(sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)) match {
          case Some(part) => leafParts(part, depth + 1) match {
            case Some(ls) => out ++= ls
            case None => return None
          }
          case None => return None
        }
      }
      Some(out.result())
    }
  }

  final case class Message(from: String, to: String, subject: String,
      date: String, messageId: String, contentType: String,
      bodyIsHtml: Boolean, text: String)

  /** Parse one RFC 5322 message (without the mbox `From ` line). */
  def parseMessage(raw: Array[Byte]): Option[Message] = {
    val top = parseHead(raw) match { case Some(p) => p; case None => return None }
    def header(k: String): String =
      top.headers.get(k).map(decodeEncodedWords).orNull
    leafParts(top, 0).map { leaves =>
      val plain = leaves.find(_._1 == "text/plain")
      val html = leaves.find(_._1 == "text/html")
      val (chosen, isHtml) = plain.map((_, false)).orElse(html.map((_, true)))
        .map { case ((_, part), h) => (Some(part), h) }
        .getOrElse((None, false))
      // wire line endings are CRLF; corpora want LF (canonical form,
      // declared)
      val text = chosen.map { part =>
        Warc.decodeBody(part.body, 0,
          part.headers.getOrElse("content-type", null))._1
          .replace("\r\n", "\n").replace('\r', '\n')
      }.getOrElse("")
      Message(header("from"), header("to"), header("subject"),
        top.headers.get("date").orNull, top.headers.get("message-id").orNull,
        chosen.map(_.headers.getOrElse("content-type", "text/plain"))
          .getOrElse(top.headers.getOrElse("content-type", "text/plain")),
        isHtml, text)
    }
  }

  /** Split an mbox payload into raw messages: mboxrd unquoting
    * applied to body lines, and the ONE separator blank line that
    * precedes each `From ` line (and ends the file) stripped from
    * the message it terminates — it is framing, not body. */
  private[graft] def splitMbox(payload: Array[Byte]): Seq[Array[Byte]] = {
    val text = new String(payload, java.nio.charset.StandardCharsets.ISO_8859_1)
    val split = text.split("\r\n|\r|\n", -1)
    // a file ending in a newline yields one phantom "" element — an
    // artifact of the split, not a line
    val lines = if (split.nonEmpty && split.last.isEmpty) split.dropRight(1) else split
    val msgs = scala.collection.mutable.ArrayBuffer.empty[scala.collection.mutable.ArrayBuffer[String]]
    lines.foreach { line =>
      if (line.startsWith("From ")) msgs += scala.collection.mutable.ArrayBuffer.empty
      else if (msgs.nonEmpty)
        msgs.last += (if (line.matches(">+From .*")) line.substring(1) else line)
    }
    msgs.toSeq.map { ls =>
      val trimmed =
        if (ls.nonEmpty && ls.last.isEmpty) ls.dropRight(1) else ls.toSeq
      trimmed.mkString("\r\n")
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    }
  }

  // ---- fixture packer ----

  private def qpEncode(bytes: Array[Byte]): String = {
    val sb = new StringBuilder
    var lineLen = 0
    bytes.foreach { b =>
      val c = b & 0xFF
      val tok =
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9'))
          (c.toChar).toString
        else f"=$c%02X"
      if (lineLen + tok.length > 60) { sb.append("=\n"); lineLen = 0 }
      sb.append(tok); lineLen += tok.length
    }
    sb.toString
  }

  /** mboxrd-quote and append a body string as mbox lines. */
  private def quoteBody(sb: StringBuilder, body: String): Unit =
    body.split("\n", -1).foreach { line =>
      if (line.matches(">*From .*")) sb.append('>')
      sb.append(line).append('\n')
    }

  /** Shard documents over `nFiles` mbox files: per message the full
    * header set (From/To/Date/Message-ID), subjects cycling plain /
    * B-encoded / Q-encoded / plain RFC 2047 forms, bodies cycling
    * quoted-printable / base64 / raw-7bit transfer encodings, and
    * every fifth id a multipart/alternative whose text/plain part
    * (QP) must win over the text/html part. Raw bodies get real
    * mboxrd `>From` quoting. */
  def packDocsMbox(df: DataFrame, idCol: String, textCol: String,
      nFiles: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)),
        coalesce(col(textCol), lit("")))
      .as[(Long, String)]
      .groupByKey(_._1 % nFiles)
      .mapGroups { (fid, it) =>
        val sb = new StringBuilder
        it.toSeq.sortBy(_._1).foreach { case (id, text) =>
          val utf8 = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val subject = (id % 4) match {
            case 0 => s"Subject $id"
            case 1 => "=?utf-8?B?" + java.util.Base64.getEncoder.encodeToString(
              s"Sübject $id".getBytes("UTF-8")) + "?="
            case 2 => s"=?utf-8?Q?S=C3=BCbject_$id?="
            case _ => s"Plain subject $id"
          }
          sb.append(s"From sender$id@example.com Thu Jan  1 10:00:00 2026\n")
          sb.append(s"From: sender$id@example.com\n")
          sb.append(s"To: rcpt$id@example.org\n")
          sb.append(s"Subject: $subject\n")
          sb.append(s"Date: Thu, 1 Jan 2026 10:0${id % 6}:00 +0000\n")
          sb.append(s"Message-ID: <m$id@example.com>\n")
          if (id % 5 == 0) {
            val bnd = s"=_planted_$id"
            sb.append(s"""Content-Type: multipart/alternative; boundary="$bnd"\n""")
            sb.append("MIME-Version: 1.0\n\n")
            sb.append("preamble is dropped\n")
            sb.append(s"--$bnd\n")
            sb.append("Content-Type: text/plain; charset=utf-8\n")
            sb.append("Content-Transfer-Encoding: quoted-printable\n\n")
            quoteBody(sb, qpEncode(utf8))
            sb.append(s"--$bnd\n")
            sb.append("Content-Type: text/html; charset=utf-8\n\n")
            sb.append(s"<p>html alternative $id</p>\n")
            sb.append(s"--$bnd--\n")
            sb.append("epilogue is dropped\n")
          } else {
            sb.append("Content-Type: text/plain; charset=utf-8\n")
            (id % 3) match {
              case 0 =>
                sb.append("Content-Transfer-Encoding: quoted-printable\n\n")
                quoteBody(sb, qpEncode(utf8))
              case 1 =>
                sb.append("Content-Transfer-Encoding: base64\n\n")
                sb.append(java.util.Base64.getMimeEncoder.encodeToString(utf8))
                sb.append('\n')
              case _ =>
                sb.append("Content-Transfer-Encoding: 7bit\n\n")
                quoteBody(sb, text)
            }
          }
          sb.append('\n')
        }
        (fid, sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      .toDF("file_id", "payload")
  }

  /** [[splitMbox]] for the source layer. */
  def splitMboxPublic(payload: Array[Byte]): Seq[Array[Byte]] = splitMbox(payload)

  /** (id, seq, from, to, subject, date, message_id, content_type,
    * body_is_html, text) — one row per message per mbox payload;
    * unparseable messages quarantine as null rows at their seq. */
  def messages(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        splitMbox(if (payload == null) Array.emptyByteArray else payload)
          .zipWithIndex.map { case (raw, i) =>
            parseMessage(raw) match {
              case Some(m) => (id, i, m.from, m.to, m.subject, m.date,
                m.messageId, m.contentType, m.bodyIsHtml, m.text)
              case None => (id, i, null: String, null: String, null: String,
                null: String, null: String, null: String, false, null: String)
            }
          }
      }
      .toDF("id", "seq", "from", "to", "subject", "date", "message_id",
        "content_type", "body_is_html", "text")
  }
}
