package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EPUB text extraction — the BOOK rung of the document ingest tier
  * (book corpora ship as EPUB), on the [[Zip]]+[[Xml]] seam: an EPUB
  * is an OCF container (ZIP) whose reading order is declared, not
  * implied by filenames —
  *
  *  1. `META-INF/container.xml` names the package document
  *     (`rootfile full-path`, OCF §3.5.2.1);
  *  2. the OPF package's `<manifest>` maps item ids to hrefs
  *     (relative to the OPF's own directory — resolved with the
  *     RFC 3986 dot-segment remover [[Links.removeDotSegments]]),
  *     and `<spine>` lists `itemref idref`s in READING ORDER (the
  *     gate lists manifest items reversed to prove the spine, not
  *     the package layout, drives ordering);
  *  3. each spine document is XHTML — XML, so the from-spec [[Xml]]
  *     parser applies — and its text is the block walk: `p`,
  *     `h1`–`h6`, `li`, `blockquote`, `pre`, `td` elements become
  *     blocks (inline markup traversed, `br` a newline inside the
  *     block), blocks joined by newline across the whole spine.
  *     Text outside block elements is not body flow (declared —
  *     real books keep prose in blocks).
  *
  * Never throws: missing container/package/spine, a spine idref
  * without a manifest item, or a non-well-formed content document
  * refuses the file (None).
  */
object Epub {

  private val BlockSet = Set("p", "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "blockquote", "pre", "td")

  private def blockText(e: Xml.Elem): String = {
    val sb = new StringBuilder
    def walk(x: Xml.Elem): Unit = x.children.foreach {
      case Xml.Text(s) => sb.append(s)
      case c: Xml.Elem =>
        if (c.local == "br") sb.append('\n') else walk(c)
    }
    walk(e)
    sb.toString
  }

  private def xhtmlBlocks(root: Xml.Elem): List[String] = {
    val out = List.newBuilder[String]
    def walk(e: Xml.Elem): Unit = {
      if (BlockSet.contains(e.local)) out += blockText(e)
      else e.children.foreach { case c: Xml.Elem => walk(c); case _ => }
    }
    walk(root)
    out.result()
  }

  /** Spine text of one .epub payload: blocks joined by `\n`. */
  def extractText(epub: Array[Byte]): Option[String] = {
    val entries = Zip.entries(epub) match { case Some(e) => e; case None => return None }
    def bytes(name: String): Option[Array[Byte]] = entries.find(_.name == name).map(_.data)
    def xml(name: String): Option[Xml.Elem] =
      bytes(name).flatMap(b => Xml.parse(new String(b,
        java.nio.charset.StandardCharsets.UTF_8)))
    val container = xml("META-INF/container.xml") match {
      case Some(c) => c; case None => return None
    }
    val opfPath = Xml.collectByLocal(container, "rootfile")
      .flatMap(_.attr("full-path")).headOption match {
      case Some(p) => p; case None => return None
    }
    val opf = xml(opfPath) match { case Some(o) => o; case None => return None }
    val opfDir = { val cut = opfPath.lastIndexOf('/'); if (cut < 0) "" else opfPath.substring(0, cut + 1) }
    val manifest: Map[String, String] = Xml.collectByLocal(opf, "item")
      .flatMap(i => for (id <- i.attr("id"); href <- i.attr("href")) yield {
        // zip entry names are slash-relative; a ../ climb past the OPF
        // dir leaves remove_dot_segments' leading slash — strip it
        val norm = Links.removeDotSegments(opfDir + href)
        id -> (if (norm.startsWith("/")) norm.substring(1) else norm)
      })
      .toMap
    val spine = Xml.collectByLocal(opf, "itemref").flatMap(_.attr("idref"))
    if (spine.isEmpty) return None
    val blocks = spine.map { idref =>
      val href = manifest.get(idref) match { case Some(h) => h; case None => return None }
      xml(href) match {
        case Some(doc) => xhtmlBlocks(doc)
        case None => return None
      }
    }
    Some(blocks.flatten.mkString("\n"))
  }

  /** (id, text, decoded) rows — scan-local, hostile bytes surface
    * decoded = false with empty text. */
  def decodeText(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)), col(payloadCol))
      .as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        extractText(if (payload == null) Array.emptyByteArray else payload) match {
          case Some(t) => (id, t, true)
          case None => (id, "", false)
        }
      }
      .toDF("id", "text", "decoded")
  }

  private def escXml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Minimal spec-valid .epub: text lines chunked three-per-chapter
    * XHTML docs, manifest listed in REVERSE so the spine's reading
    * order is load-bearing; mimetype member first (OCF convention).
    * Even ids DEFLATE, odd store. */
  def packTextEpub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)),
        coalesce(col(textCol), lit("")))
      .as[(Long, String)]
      .map { case (id, text) =>
        val lines = text.split("\n", -1)
        val chapters = lines.grouped(3).toSeq.zipWithIndex.map { case (chunk, i) =>
          val paras = chunk.map(l => s"<p>${escXml(l)}</p>").mkString
          (s"ch${i + 1}", s"OEBPS/ch${i + 1}.xhtml",
            s"""<html xmlns="http://www.w3.org/1999/xhtml"><head><title>c</title></head><body>$paras</body></html>""")
        }
        val manifest = chapters.reverse.map { case (cid, _, _) =>
          s"""<item id="$cid" href="ch${cid.substring(2)}.xhtml" media-type="application/xhtml+xml"/>"""
        }.mkString
        val spine = chapters.map { case (cid, _, _) =>
          s"""<itemref idref="$cid"/>""" }.mkString
        val opf =
          """<package xmlns="http://www.idpf.org/2007/opf" version="3.0" unique-identifier="u">""" +
            s"""<metadata/><manifest>$manifest</manifest><spine>$spine</spine></package>"""
        val container =
          """<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container" version="1.0">""" +
            """<rootfiles><rootfile full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/></rootfiles></container>"""
        val members = Seq(
          "mimetype" -> "application/epub+zip".getBytes("US-ASCII"),
          "META-INF/container.xml" -> container.getBytes("UTF-8"),
          "OEBPS/content.opf" -> opf.getBytes("UTF-8")) ++
          chapters.map { case (_, path, doc) => path -> doc.getBytes("UTF-8") }
        (id, Zip.zipOf(members, deflate = id % 2 == 0))
      }
      .toDF("id", "payload")
  }
}
