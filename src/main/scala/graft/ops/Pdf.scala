package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** From-spec PDF text extraction (ISO 32000-1 / PDF 1.4 subset) —
  * the document format a large share of book/paper corpora arrive
  * in. Scope is the TEXT-bearing core of the spec, written from the
  * published standard alone:
  *
  *  - object syntax: dictionaries, arrays, names (with #xx escapes),
  *    numbers, booleans, null, literal strings (all escape forms:
  *    \n \r \t \b \f \( \) \\, 1-3 digit octal, line continuations,
  *    raw-EOL → \n normalization per §7.3.4.2), hex strings,
  *    indirect references, streams (/Length-measured);
  *  - cross-reference table + trailer walk (startxref → xref
  *    subsections → /Root, /Prev chains), with a linear object-scan
  *    fallback for files whose xref is damaged — a corpus scan must
  *    salvage what it can; xref STREAMS (PDF 1.5 compressed xref)
  *    are out of scope and fall back to the scan path;
  *  - /FlateDecode content streams through the from-spec zlib
  *    decoder ([[GzipCodec.unzlib]] — RFC 1950 with verified
  *    Adler-32), plus unfiltered streams;
  *  - page tree walk (Pages/Kids recursion, /Contents ref or array)
  *    and content-stream text collection: Tj, ' , " and TJ string
  *    operands in stream order, a newline per Td/TD/T* line move,
  *    pages joined by newline. Byte-transparent: string bytes are
  *    returned as written (UTF-8 documents round-trip exactly).
  *
  * No independent PDF implementation exists on this classpath, so
  * the cross-validation discipline is the [[Mkv]] one: the packer
  * emits spec-legal files (correct xref byte offsets, measured
  * /Length, balanced structure) that any external reader opens, the
  * spec suite additionally parses HAND-ASSEMBLED fixtures using
  * constructs the packer never writes (hex strings, octal escapes,
  * split-content arrays, comments, damaged xref), and the gate
  * oracle replays the full extraction from corpus columns.
  *
  * Hostile-bytes contract as the whole codec ladder: never throws,
  * bounds-checked, `None` on malformed files.
  */
object Pdf {

  private object Refuse extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def refuse(): Nothing = throw Refuse

  // ------------------------------------------------------------------
  // object model
  // ------------------------------------------------------------------

  sealed trait PObj
  final case class PNum(v: Double) extends PObj
  final case class PName(s: String) extends PObj
  final case class PStr(bytes: Array[Byte]) extends PObj
  final case class PArr(items: Vector[PObj]) extends PObj
  final case class PDict(m: Map[String, PObj]) extends PObj
  final case class PRef(num: Int, gen: Int) extends PObj
  final case class PStream(dict: PDict, data: Array[Byte]) extends PObj
  final case class PBool(b: Boolean) extends PObj
  case object PNull extends PObj
  /** bare keyword in a content stream (an operator) */
  final case class POp(op: String) extends PObj

  private def isWhite(c: Int): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == 0 || c == 12
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  /** Tokenizing cursor over the file bytes. */
  private final class Cur(val b: Array[Byte], var pos: Int) {
    def eof: Boolean = pos >= b.length
    def peek: Int = if (eof) -1 else b(pos) & 0xFF
    def next(): Int = { val c = peek; if (c < 0) refuse(); pos += 1; c }
    def skipWs(): Unit = {
      var go = true
      while (go && !eof) {
        val c = peek
        if (isWhite(c)) pos += 1
        else if (c == '%') { while (!eof && peek != '\n' && peek != '\r') pos += 1 } // comment
        else go = false
      }
    }
    def matches(s: String): Boolean =
      pos + s.length <= b.length && {
        var i = 0
        while (i < s.length && b(pos + i) == s.charAt(i).toByte) i += 1
        i == s.length
      }
    def expect(s: String): Unit = { if (!matches(s)) refuse(); pos += s.length }
  }

  /** One object at the cursor (content-stream mode also yields bare
    * operators as [[POp]]). */
  private def parseObj(c: Cur, contentMode: Boolean): PObj = {
    c.skipWs()
    if (c.eof) refuse()
    val ch = c.peek
    ch match {
      case '/' =>
        c.next()
        val sb = new StringBuilder
        while (!c.eof && !isWhite(c.peek) && !isDelim(c.peek)) {
          var v = c.next()
          if (v == '#' && !c.eof) { // #xx hex escape in names
            val h1 = Character.digit(c.next(), 16)
            val h2 = Character.digit(c.next(), 16)
            if (h1 < 0 || h2 < 0) refuse()
            v = h1 * 16 + h2
          }
          sb.append(v.toChar)
        }
        PName(sb.toString)
      case '(' =>
        c.next()
        val out = new java.io.ByteArrayOutputStream()
        var depth = 1
        while (depth > 0) {
          val v = c.next()
          v match {
            case '\\' =>
              val e = c.next()
              e match {
                case 'n' => out.write('\n')
                case 'r' => out.write('\r')
                case 't' => out.write('\t')
                case 'b' => out.write('\b')
                case 'f' => out.write(12)
                case '(' => out.write('(')
                case ')' => out.write(')')
                case '\\' => out.write('\\')
                case '\r' => if (c.peek == '\n') c.next() // line continuation
                case '\n' => // line continuation
                case d if d >= '0' && d <= '7' =>
                  var v2 = d - '0'
                  var n = 1
                  while (n < 3 && c.peek >= '0' && c.peek <= '7') { v2 = v2 * 8 + (c.next() - '0'); n += 1 }
                  out.write(v2 & 0xFF)
                case other => out.write(other) // spec: backslash ignored
              }
            case '(' => depth += 1; out.write('(')
            case ')' => depth -= 1; if (depth > 0) out.write(')')
            case '\r' => // raw EOL normalizes to \n (§7.3.4.2)
              if (c.peek == '\n') c.next()
              out.write('\n')
            case other => out.write(other)
          }
        }
        PStr(out.toByteArray)
      case '<' if c.matches("<<") =>
        c.pos += 2
        val m = Map.newBuilder[String, PObj]
        var done = false
        while (!done) {
          c.skipWs()
          if (c.matches(">>")) { c.pos += 2; done = true }
          else parseObj(c, contentMode) match {
            case PName(k) => m += (k -> parseObj(c, contentMode))
            case _ => refuse()
          }
        }
        PDict(m.result())
      case '<' =>
        c.next()
        val out = new java.io.ByteArrayOutputStream()
        var hi = -1
        var done = false
        while (!done) {
          val v = c.next()
          if (v == '>') { if (hi >= 0) out.write(hi * 16); done = true }
          else if (!isWhite(v)) {
            val d = Character.digit(v, 16)
            if (d < 0) refuse()
            if (hi < 0) hi = d else { out.write(hi * 16 + d); hi = -1 }
          }
        }
        PStr(out.toByteArray)
      case '[' =>
        c.next()
        val items = Vector.newBuilder[PObj]
        var done = false
        while (!done) {
          c.skipWs()
          if (c.peek == ']') { c.next(); done = true }
          else items += parseObj(c, contentMode)
        }
        PArr(items.result())
      case d if (d >= '0' && d <= '9') || d == '+' || d == '-' || d == '.' =>
        val start = c.pos
        while (!c.eof && !isWhite(c.peek) && !isDelim(c.peek)) c.next()
        val s = new String(c.b, start, c.pos - start, "US-ASCII")
        // try "N G R" indirect reference (object mode only)
        if (!contentMode && s.forall(_.isDigit)) {
          val save = c.pos
          c.skipWs()
          val gStart = c.pos
          while (!c.eof && c.peek >= '0' && c.peek <= '9') c.next()
          if (c.pos > gStart) {
            val g = new String(c.b, gStart, c.pos - gStart, "US-ASCII")
            c.skipWs()
            if (c.peek == 'R' && (c.pos + 1 >= c.b.length || isWhite(c.b(c.pos + 1)) || isDelim(c.b(c.pos + 1) & 0xFF))) {
              c.next()
              return PRef(s.toInt, g.toInt)
            }
          }
          c.pos = save
        }
        val v = try s.toDouble catch { case _: NumberFormatException => refuse() }
        PNum(v)
      case _ =>
        val start = c.pos
        while (!c.eof && !isWhite(c.peek) && !isDelim(c.peek)) c.next()
        if (c.pos == start) refuse()
        new String(c.b, start, c.pos - start, "US-ASCII") match {
          case "true" => PBool(true)
          case "false" => PBool(false)
          case "null" => PNull
          case kw if contentMode => POp(kw)
          case _ => refuse()
        }
    }
  }

  // ------------------------------------------------------------------
  // document load: xref walk with linear-scan fallback
  // ------------------------------------------------------------------

  final case class Doc(objects: Map[Int, PObj], root: Option[PRef], version: String)

  /** "N G obj ... endobj" at `off`; streams read their /Length
    * (resolving an indirect length via `lookup`). */
  private def parseIndirect(b: Array[Byte], off: Int,
      lookup: Int => Option[PObj]): (Int, PObj) = {
    val c = new Cur(b, off)
    c.skipWs()
    val numStart = c.pos
    while (c.peek >= '0' && c.peek <= '9') c.next()
    if (c.pos == numStart) refuse()
    val num = new String(b, numStart, c.pos - numStart, "US-ASCII").toInt
    c.skipWs()
    while (c.peek >= '0' && c.peek <= '9') c.next() // generation
    c.skipWs()
    c.expect("obj")
    val obj = parseObj(c, contentMode = false)
    c.skipWs()
    if (c.matches("stream")) {
      c.pos += "stream".length
      if (c.peek == '\r') c.next()
      if (c.peek == '\n') c.next() else refuse()
      val dict = obj match { case d: PDict => d; case _ => refuse() }
      val len = dict.m.get("Length") match {
        case Some(PNum(v)) => v.toInt
        case Some(PRef(n, _)) => lookup(n) match {
          case Some(PNum(v)) => v.toInt
          case _ => refuse()
        }
        case _ => refuse()
      }
      if (len < 0 || c.pos + len > b.length) refuse()
      val data = java.util.Arrays.copyOfRange(b, c.pos, c.pos + len)
      c.pos += len
      c.skipWs()
      c.expect("endstream")
      c.skipWs()
      c.expect("endobj")
      (num, PStream(dict, data))
    } else {
      c.skipWs()
      c.expect("endobj")
      (num, obj)
    }
  }

  private def findLast(b: Array[Byte], s: String): Int = {
    var i = b.length - s.length
    while (i >= 0) {
      var k = 0
      while (k < s.length && b(i + k) == s.charAt(k).toByte) k += 1
      if (k == s.length) return i
      i -= 1
    }
    -1
  }

  /** xref-driven load: startxref → table(s) → offsets → objects. */
  private def loadViaXref(b: Array[Byte]): Doc = {
    val sx = findLast(b, "startxref")
    if (sx < 0) refuse()
    val c0 = new Cur(b, sx + "startxref".length)
    c0.skipWs()
    val oStart = c0.pos
    while (c0.peek >= '0' && c0.peek <= '9') c0.next()
    if (c0.pos == oStart) refuse()
    var xrefAt = new String(b, oStart, c0.pos - oStart, "US-ASCII").toInt
    val offsets = scala.collection.mutable.Map[Int, Int]()
    var root: Option[PRef] = None
    var guard = 0
    while (xrefAt >= 0 && guard < 64) {
      guard += 1
      val c = new Cur(b, xrefAt)
      c.skipWs()
      c.expect("xref")
      var inSections = true
      while (inSections) {
        c.skipWs()
        if (c.matches("trailer")) inSections = false
        else {
          val s1 = c.pos
          while (c.peek >= '0' && c.peek <= '9') c.next()
          if (c.pos == s1) refuse()
          val first = new String(b, s1, c.pos - s1, "US-ASCII").toInt
          c.skipWs()
          val s2 = c.pos
          while (c.peek >= '0' && c.peek <= '9') c.next()
          val count = new String(b, s2, c.pos - s2, "US-ASCII").toInt
          c.skipWs()
          var i = 0
          while (i < count) {
            // 20-byte entries: 10-digit offset, 5-digit gen, f/n
            if (c.pos + 18 > b.length) refuse()
            val off = new String(b, c.pos, 10, "US-ASCII").toInt
            val kind = b(c.pos + 17).toChar
            if (kind == 'n' && !offsets.contains(first + i)) offsets(first + i) = off
            c.pos += 18
            while (!c.eof && isWhite(c.peek)) c.pos += 1
            i += 1
          }
        }
      }
      c.expect("trailer")
      val trailer = parseObj(c, contentMode = false) match {
        case d: PDict => d; case _ => refuse()
      }
      if (root.isEmpty) trailer.m.get("Root") match {
        case Some(r: PRef) => root = Some(r)
        case _ =>
      }
      xrefAt = trailer.m.get("Prev") match {
        case Some(PNum(v)) => v.toInt
        case _ => -1
      }
    }
    // two passes so streams with indirect /Length resolve
    val firstPass = scala.collection.mutable.Map[Int, PObj]()
    offsets.foreach { case (num, off) =>
      try {
        val (n, o) = parseIndirect(b, off, _ => None)
        if (n == num) firstPass(n) = o
      } catch { case Refuse => } // picked up in second pass if length was indirect
    }
    val objects = scala.collection.mutable.Map[Int, PObj]() ++ firstPass
    offsets.foreach { case (num, off) =>
      if (!objects.contains(num)) {
        val (n, o) = parseIndirect(b, off, firstPass.get)
        if (n == num) objects(n) = o
      }
    }
    if (objects.isEmpty) refuse()
    Doc(objects.toMap, root, version(b))
  }

  /** Fallback: linear scan for "N G obj" headers — salvages files
    * with a damaged or 1.5-style (xref-stream) cross-reference. */
  private def loadViaScan(b: Array[Byte]): Doc = {
    val objects = scala.collection.mutable.Map[Int, PObj]()
    val lengths = scala.collection.mutable.Map[Int, PObj]()
    var i = 0
    // first pass records plain objects (for indirect /Length)
    while (i + 3 < b.length) {
      if (b(i) == 'o' && b(i + 1) == 'b' && b(i + 2) == 'j' &&
          (i + 3 >= b.length || isWhite(b(i + 3) & 0xFF) || isDelim(b(i + 3) & 0xFF))) {
        // walk back over "N G "
        var j = i - 1
        while (j >= 0 && isWhite(b(j) & 0xFF)) j -= 1
        val gEnd = j + 1
        while (j >= 0 && b(j) >= '0' && b(j) <= '9') j -= 1
        val gStart = j + 1
        while (j >= 0 && isWhite(b(j) & 0xFF)) j -= 1
        val nEnd = j + 1
        while (j >= 0 && b(j) >= '0' && b(j) <= '9') j -= 1
        val nStart = j + 1
        if (gEnd > gStart && nEnd > nStart) {
          try {
            val (num, o) = parseIndirect(b, nStart, n => lengths.get(n).orElse(objects.get(n)))
            objects(num) = o
            o match { case PNum(_) => lengths(num) = o; case _ => }
          } catch { case Refuse => }
        }
      }
      i += 1
    }
    if (objects.isEmpty) refuse()
    // root from any /Type /Catalog object
    val root = objects.collectFirst {
      case (n, PDict(m)) if m.get("Type").contains(PName("Catalog")) => PRef(n, 0)
    }
    Doc(objects.toMap, root, version(b))
  }

  private def version(b: Array[Byte]): String = {
    if (b.length < 8 || !(new Cur(b, 0)).matches("%PDF-")) refuse()
    new String(b, 5, 3, "US-ASCII")
  }

  def load(b: Array[Byte]): Option[Doc] =
    try Some(loadViaXref(b))
    catch { case Refuse => try Some(loadViaScan(b)) catch { case Refuse => None } }

  // ------------------------------------------------------------------
  // text extraction
  // ------------------------------------------------------------------

  private def resolve(doc: Doc, o: PObj): PObj = o match {
    case PRef(n, _) => doc.objects.getOrElse(n, PNull)
    case other => other
  }

  private def streamBytes(doc: Doc, s: PStream): Array[Byte] =
    resolve(doc, s.dict.m.getOrElse("Filter", PNull)) match {
      case PNull => s.data
      case PName("FlateDecode") => GzipCodec.unzlib(s.data).getOrElse(refuse())
      case PArr(Vector(PName("FlateDecode"))) => GzipCodec.unzlib(s.data).getOrElse(refuse())
      case _ => refuse() // other filters out of scope
    }

  /** Text of one content stream: Tj / ' / " / TJ string operands in
    * order; newline per Td/TD/T* (and the ' / " implicit line move). */
  private def contentText(data: Array[Byte], out: java.io.ByteArrayOutputStream): Unit = {
    val c = new Cur(data, 0)
    val stack = scala.collection.mutable.ArrayBuffer[PObj]()
    var wroteAny = false
    def nl(): Unit = { if (wroteAny) out.write('\n') }
    while ({ c.skipWs(); !c.eof }) {
      parseObj(c, contentMode = true) match {
        case POp(op) =>
          op match {
            case "Tj" => stack.lastOption match {
              case Some(PStr(s)) => out.write(s); wroteAny = true
              case _ =>
            }
            case "'" | "\"" => stack.lastOption match {
              case Some(PStr(s)) => nl(); out.write(s); wroteAny = true
              case _ =>
            }
            case "TJ" => stack.lastOption match {
              case Some(PArr(items)) =>
                items.foreach { case PStr(s) => out.write(s); wroteAny = true; case _ => }
              case _ =>
            }
            case "Td" | "TD" | "T*" => nl()
            case _ => // positioning/style operators: no text effect
          }
          stack.clear()
        case operand => stack += operand
      }
    }
  }

  /** All text of the document, pages in tree order joined by
    * newlines. */
  def extractText(b: Array[Byte]): Option[String] =
    load(b).flatMap { doc =>
      try {
        val out = new java.io.ByteArrayOutputStream()
        var firstPage = true
        def walkPages(o: PObj, depth: Int): Unit = {
          if (depth > 64) refuse()
          resolve(doc, o) match {
            case PDict(m) if m.get("Type").contains(PName("Pages")) =>
              resolve(doc, m.getOrElse("Kids", PNull)) match {
                case PArr(kids) => kids.foreach(walkPages(_, depth + 1))
                case _ =>
              }
            case d @ PDict(m) if m.get("Type").contains(PName("Page")) =>
              if (!firstPage) out.write('\n')
              firstPage = false
              resolve(doc, m.getOrElse("Contents", PNull)) match {
                case s: PStream => contentText(streamBytes(doc, s), out)
                case PArr(parts) =>
                  // split content: one logical stream, concatenated
                  val joined = new java.io.ByteArrayOutputStream()
                  parts.foreach { p =>
                    resolve(doc, p) match {
                      case s: PStream => joined.write(streamBytes(doc, s)); joined.write(' ')
                      case _ =>
                    }
                  }
                  contentText(joined.toByteArray, out)
                case _ =>
              }
            case _ =>
          }
        }
        val rootObj = doc.root.map(resolve(doc, _)).getOrElse(refuse())
        rootObj match {
          case PDict(m) => walkPages(m.getOrElse("Pages", PNull), 0)
          case _ => refuse()
        }
        Some(new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
      } catch { case Refuse => None }
    }

  /** Structural metadata: version, object count, page count, whether
    * any stream is Flate-compressed. */
  def meta(b: Array[Byte]): Option[(String, Int, Int, Boolean)] =
    load(b).map { doc =>
      val pages = doc.objects.values.count {
        case PDict(m) => m.get("Type").contains(PName("Page"))
        case _ => false
      }
      val flate = doc.objects.values.exists {
        case PStream(d, _) => d.m.get("Filter").contains(PName("FlateDecode"))
        case _ => false
      }
      (doc.version, doc.objects.size, pages, flate)
    }

  // ------------------------------------------------------------------
  // packer (spec-legal writer for fixtures and gates)
  // ------------------------------------------------------------------

  private def escapeString(s: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length + 16)
    s.foreach { b =>
      val v = b & 0xFF
      if (v == '(' || v == ')' || v == '\\') { out.write('\\'); out.write(v) }
      else if (v < 0x20) out.write(f"\\${v}%03o".getBytes("US-ASCII"))
      else out.write(v)
    }
    out.toByteArray
  }

  /** One spec-legal single-page PDF showing `text` as one literal
    * string (arbitrary bytes escape-safe); `flate` compresses the
    * content stream with the JDK's zlib (the independent encoder).
    */
  def pdfOf(text: String, flate: Boolean): Array[Byte] = {
    val content = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write("BT /F1 12 Tf 72 720 Td (".getBytes("US-ASCII"))
      bos.write(escapeString(text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      bos.write(") Tj ET".getBytes("US-ASCII"))
      bos.toByteArray
    }
    val streamData =
      if (!flate) content
      else {
        val d = new java.util.zip.Deflater(6, false) // zlib wrapper
        d.setInput(content); d.finish()
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
        d.end()
        bos.toByteArray
      }
    val objs = Vector(
      "<< /Type /Catalog /Pages 2 0 R >>".getBytes("US-ASCII"),
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes("US-ASCII"),
      ("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>").getBytes("US-ASCII"),
      null, // stream, handled below
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>".getBytes("US-ASCII"))
    val out = new java.io.ByteArrayOutputStream()
    out.write("%PDF-1.4\n".getBytes("US-ASCII"))
    val offsets = new Array[Int](objs.length + 1)
    for (i <- objs.indices) {
      offsets(i + 1) = out.size()
      out.write(s"${i + 1} 0 obj\n".getBytes("US-ASCII"))
      if (objs(i) != null) out.write(objs(i))
      else {
        val filter = if (flate) " /Filter /FlateDecode" else ""
        out.write(s"<< /Length ${streamData.length}$filter >>\nstream\n".getBytes("US-ASCII"))
        out.write(streamData)
        out.write("\nendstream".getBytes("US-ASCII"))
      }
      out.write("\nendobj\n".getBytes("US-ASCII"))
    }
    val xrefAt = out.size()
    out.write(s"xref\n0 ${objs.length + 1}\n".getBytes("US-ASCII"))
    out.write("0000000000 65535 f \n".getBytes("US-ASCII"))
    for (i <- objs.indices)
      out.write(f"${offsets(i + 1)}%010d 00000 n \n".getBytes("US-ASCII"))
    out.write(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n"
      .getBytes("US-ASCII"))
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Spark seam
  // ------------------------------------------------------------------

  /** Per-document PDFs in the engine's media schema; Flate for even
    * ids, raw streams for odd — both decode paths in every corpus. */
  def packTextPdf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Partitioning.fanOut(df)
      .select(col(idCol).cast("long"), coalesce(col(textCol), lit("")))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => (id, pdfOf(text, id % 2 == 0)) })
      .toDF("id", "__payload")
      .select(col("id"), struct(
        col("__payload").as("payload"),
        lit("application/pdf").as("mime"),
        struct(
          octet_length(col("__payload")).cast("long").as("byte_len"),
          lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"),
          lit(null).cast("long").as("duration_ms")).as("meta")).as("media"))
  }

  /** Extract text + structural metadata from a PDF payload column;
    * refused payloads quarantine with decoded=false. */
  def extractPdfText(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(mediaCol + ".payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        (extractText(payload), meta(payload)) match {
          case (Some(text), Some((ver, nObj, nPages, flate))) =>
            (id, true, ver, nObj, nPages, flate, text)
          case _ =>
            (id, false, null: String, 0, 0, false, null: String)
        }
      })
      .toDF("id", "decoded", "version", "n_objects", "n_pages", "flate", "text")
  }
}
