package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PPTX and ODT text extraction — the rest of the office ladder on
  * the [[Zip]]+[[Xml]] seam opened by [[Docx]]:
  *
  *  - PPTX (ECMA-376 PresentationML + DrawingML): slide parts at
  *    `ppt/slides/slideN.xml`, ordered by their NUMBER (the package
  *    may list entries in any order); text lives in DrawingML `a:t`
  *    runs inside `a:p` paragraphs, `a:br` is a line break —
  *    speaker-notes parts declared out of scope;
  *  - ODT (OASIS OpenDocument): one `content.xml` part, `text:p` /
  *    `text:h` blocks in document order, inline character data plus
  *    `text:span` nesting, `text:tab` → tab, `text:line-break` →
  *    newline, `text:s` → its `text:c`-counted run of spaces (the
  *    whitespace-compression element, default 1); footnote bodies
  *    (`text:note`) are skipped — they are not body flow.
  *
  * Same never-throw contract as [[Docx]]: hostile bytes → None /
  * decoded = false. Packers build spec-valid minimal packages so the
  * gates replay the text column verbatim; the ODT packer writes the
  * `mimetype` member FIRST as the ODF convention prescribes.
  */
object Office {

  // ---- pptx ----

  private val SlideRe = java.util.regex.Pattern.compile("ppt/slides/slide(\\d+)\\.xml")

  private def drawingParaText(p: Xml.Elem): String = {
    val sb = new StringBuilder
    def walk(e: Xml.Elem): Unit = e.children.foreach {
      case c: Xml.Elem => c.local match {
        case "t" => sb.append(c.text)
        case "br" => sb.append('\n')
        case _ => walk(c)
      }
      case _ => ()
    }
    walk(p)
    sb.toString
  }

  /** Slide text of one .pptx payload: paragraphs joined by `\n`,
    * slides in numeric order joined by `\n`. */
  def extractPptxText(pptx: Array[Byte]): Option[String] =
    Zip.entries(pptx).flatMap { es =>
      val slides = es.flatMap { e =>
        val m = SlideRe.matcher(e.name)
        if (m.matches()) Some((m.group(1).toInt, e.data)) else None
      }.sortBy(_._1)
      if (slides.isEmpty) None
      else {
        val texts = slides.map { case (_, data) =>
          Xml.parse(new String(data, java.nio.charset.StandardCharsets.UTF_8)) match {
            case Some(root) =>
              Xml.collectByLocal(root, "p").map(drawingParaText)
            case None => return None
          }
        }
        Some(texts.flatten.mkString("\n"))
      }
    }

  // ---- odt ----

  private def odtBlocks(root: Xml.Elem): List[Xml.Elem] = {
    val out = List.newBuilder[Xml.Elem]
    def walk(e: Xml.Elem): Unit = {
      if (e.local == "p" || e.local == "h") out += e
      else if (e.local != "note") // footnote bodies are not body flow
        e.children.foreach { case c: Xml.Elem => walk(c); case _ => }
    }
    walk(root)
    out.result()
  }

  private def odtParaText(p: Xml.Elem): String = {
    val sb = new StringBuilder
    def walk(e: Xml.Elem): Unit = e.children.foreach {
      case Xml.Text(s) => sb.append(s)
      case c: Xml.Elem => c.local match {
        case "tab" => sb.append('\t')
        case "line-break" => sb.append('\n')
        case "s" =>
          val n = c.attr("text:c").orElse(c.attr("c"))
            .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(1)
          sb.append(" " * math.max(0, math.min(n, 1 << 16)))
        case "note" => () // footnote body
        case _ => walk(c)
      }
    }
    walk(p)
    sb.toString
  }

  /** Body text of one .odt payload: text:p / text:h blocks joined
    * by `\n`. */
  def extractOdtText(odt: Array[Byte]): Option[String] =
    Zip.entries(odt).flatMap(_.find(_.name == "content.xml")).flatMap { e =>
      Xml.parse(new String(e.data, java.nio.charset.StandardCharsets.UTF_8))
        .map(root => odtBlocks(root).map(odtParaText).mkString("\n"))
    }

  // ---- shared DataFrame surfaces ----

  private def decodeWith(df: DataFrame, idCol: String, payloadCol: String,
      extract: Array[Byte] => Option[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)), col(payloadCol))
      .as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        extract(if (payload == null) Array.emptyByteArray else payload) match {
          case Some(t) => (id, t, true)
          case None => (id, "", false)
        }
      }
      .toDF("id", "text", "decoded")
  }

  def decodePptxText(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    decodeWith(df, idCol, payloadCol, extractPptxText)

  def decodeOdtText(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    decodeWith(df, idCol, payloadCol, extractOdtText)

  private def escXml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Minimal spec-valid .pptx: text lines become one slide each
    * (line i on slide i+1), so slide ORDERING is load-bearing;
    * slides beyond 9 exercise numeric (not lexicographic) sort.
    * Even ids DEFLATE, odd store. */
  def packTextPptx(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val a = "http://schemas.openxmlformats.org/drawingml/2006/main"
    df.where(col(idCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)),
        coalesce(col(textCol), lit("")))
      .as[(Long, String)]
      .map { case (id, text) =>
        val lines = text.split("\n", -1)
        val slides = lines.zipWithIndex.map { case (line, i) =>
          s"ppt/slides/slide${i + 1}.xml" ->
            (s"""<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" xmlns:a="$a">""" +
              s"""<p:cSld><p:spTree><p:sp><p:txBody>""" +
              s"""<a:p><a:r><a:t>${escXml(line)}</a:t></a:r></a:p>""" +
              s"""</p:txBody></p:sp></p:spTree></p:cSld></p:sld>""").getBytes("UTF-8")
        }
        val ct = ("""<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="xml" ContentType="application/xml"/></Types>""").getBytes("UTF-8")
        // reversed listing order: the reader must sort by slide number
        val members = ("[Content_Types].xml" -> ct) +: slides.reverse.toSeq
        (id, Zip.zipOf(members, deflate = id % 2 == 0))
      }
      .toDF("id", "payload")
  }

  /** Minimal spec-valid .odt: mimetype member FIRST (ODF convention),
    * paragraphs from the text's lines. Even ids DEFLATE, odd store. */
  def packTextOdt(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)),
        coalesce(col(textCol), lit("")))
      .as[(Long, String)]
      .map { case (id, text) =>
        val paras = text.split("\n", -1).map(l =>
          s"<text:p>${escXml(l)}</text:p>").mkString
        val content =
          ("""<?xml version="1.0" encoding="UTF-8"?>""" +
            """<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" """ +
            """xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">""" +
            s"""<office:body><office:text>$paras</office:text></office:body>""" +
            """</office:document-content>""").getBytes("UTF-8")
        val zip = Zip.zipOf(Seq(
          "mimetype" -> "application/vnd.oasis.opendocument.text".getBytes("US-ASCII"),
          "content.xml" -> content),
          deflate = id % 2 == 0)
        (id, zip)
      }
      .toDF("id", "payload")
  }
}
