package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DOCX text extraction — the office-document rung of the document
  * ingest tier beside [[Pdf]]: a .docx is a ZIP package (ECMA-376
  * Part 2, OPC) whose `word/document.xml` part carries the body as
  * WordprocessingML (Part 1 §17) — both layers already exist
  * from-spec in this repo ([[Zip]]'s CRC-verified central-directory
  * walk, [[Xml]]'s well-formedness parser), so the format costs only
  * the element semantics:
  *
  *  - text lives in `<w:t>` runs; `<w:tab/>` is a tab, `<w:br/>` and
  *    `<w:cr/>` are line breaks (§17.3.3); everything else (run
  *    properties, hyperlink wrappers, bookmarks, smart tags) is
  *    traversed for the runs inside it, not rendered;
  *  - paragraphs (`<w:p>`, §17.3.1.22) are the block unit, joined
  *    with `\n`; table-cell paragraphs surface in document order via
  *    the same walk (a table reads row-major, as Word lays it out);
  *  - namespace prefixes match by LOCAL name ([[Xml]]'s declared
  *    scope) — real-world parts bind `w:` but the spec does not
  *    require that prefix.
  *
  * Headers/footers/footnotes live in other parts and are deliberately
  * NOT extracted (the main body is what a corpus wants; declared).
  * Never throws: not-a-zip, no `word/document.xml`, or malformed XML
  * → None.
  */
object Docx {

  private def paraText(p: Xml.Elem): String = {
    val sb = new StringBuilder
    def walk(e: Xml.Elem): Unit = e.children.foreach {
      case c: Xml.Elem => c.local match {
        case "t" => sb.append(c.text)
        case "tab" => sb.append('\t')
        case "br" | "cr" => sb.append('\n')
        case _ => walk(c)
      }
      case _ => () // character data outside w:t is not document text
    }
    walk(p)
    sb.toString
  }

  /** Body text of one .docx payload: paragraphs joined by `\n`. */
  def extractText(docx: Array[Byte]): Option[String] =
    Zip.entries(docx).flatMap(_.find(_.name == "word/document.xml")).flatMap { e =>
      Xml.parse(new String(e.data, java.nio.charset.StandardCharsets.UTF_8))
        .map { root =>
          Xml.collectByLocal(root, "p").map(paraText).mkString("\n")
        }
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

  private val WNs = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

  /** Minimal spec-valid .docx around a text column: OPC content
    * types + package rels + a document part whose paragraphs are the
    * text's `\n`-split lines (so multi-paragraph round-trips are
    * load-bearing), entity-escaped; even ids DEFLATE the members,
    * odd ids store them — both ZIP write paths appear in the corpus.
    */
  def packTextDocx(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)),
        coalesce(col(textCol), lit("")))
      .as[(Long, String)]
      .map { case (id, text) =>
        val paras = text.split("\n", -1).map { line =>
          s"""<w:p><w:r><w:t xml:space="preserve">${escXml(line)}</w:t></w:r></w:p>"""
        }.mkString
        val doc =
          s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
             |<w:document xmlns:w="$WNs"><w:body>$paras<w:sectPr/></w:body></w:document>"""
            .stripMargin
        val contentTypes =
          """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
            |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
            |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
            |<Default Extension="xml" ContentType="application/xml"/>
            |<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
            |</Types>""".stripMargin
        val rels =
          """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
            |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
            |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
            |</Relationships>""".stripMargin
        val zip = Zip.zipOf(Seq(
          "[Content_Types].xml" -> contentTypes.getBytes("UTF-8"),
          "_rels/.rels" -> rels.getBytes("UTF-8"),
          "word/document.xml" -> doc.getBytes("UTF-8")),
          deflate = id % 2 == 0)
        (id, zip)
      }
      .toDF("id", "payload")
  }
}
