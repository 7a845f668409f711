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
  * Headers, footers, and footnotes live in sibling parts
  * (`word/header*.xml` with root `w:hdr`, `word/footer*.xml` /
  * `w:ftr`, `word/footnotes.xml` / `w:footnotes` — §17.10) and
  * surface through [[extractParts]] (round 13; body-only extraction
  * keeps its original contract): header/footer parts in part-name
  * order, footnotes by their `w:id` with the separator /
  * continuation-separator stock entries (ids 0 and -1, or a `w:type`
  * saying so) skipped — they are rendering furniture, not document
  * text. Body `w:footnoteReference` marks stay unrendered, so the
  * body surface is unchanged.
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

  final case class Parts(body: String, headers: Seq[String],
      footers: Seq[String], footnotes: Seq[(Long, String)])

  private def partText(xml: Array[Byte]): Option[String] =
    Xml.parse(new String(xml, java.nio.charset.StandardCharsets.UTF_8))
      .map(root => Xml.collectByLocal(root, "p").map(paraText).mkString("\n"))

  /** Body + headers + footers + footnotes of one .docx payload.
    * Header/footer parts in part-name order; footnotes by `w:id`
    * ascending, separator stock entries skipped. None only when the
    * PACKAGE or its body part is unreadable — a malformed auxiliary
    * part is dropped (the body is the value; partial furniture is
    * not worth refusing the document over). */
  def extractParts(docx: Array[Byte]): Option[Parts] =
    Zip.entries(docx).flatMap { es =>
      es.find(_.name == "word/document.xml").flatMap(e => partText(e.data)).map { body =>
        def series(prefix: String): Seq[String] = es
          .filter(e => e.name.startsWith(prefix) && e.name.endsWith(".xml"))
          .sortBy(_.name)
          .flatMap(e => partText(e.data))
        val footnotes = es.find(_.name == "word/footnotes.xml").toSeq.flatMap { e =>
          Xml.parse(new String(e.data, java.nio.charset.StandardCharsets.UTF_8)).toSeq
            .flatMap { root =>
              Xml.collectByLocal(root, "footnote").flatMap { fn =>
                val id = fn.attrs.collectFirst {
                  case (k, v) if k == "id" || k.endsWith(":id") => v
                }.flatMap(v => scala.util.Try(v.toLong).toOption)
                val typ = fn.attrs.collectFirst {
                  case (k, v) if k == "type" || k.endsWith(":type") => v
                }
                val stock = typ.exists(t => t == "separator" || t == "continuationSeparator")
                id match {
                  case Some(i) if i > 0 && !stock =>
                    Some(i -> Xml.collectByLocal(fn, "p").map(paraText).mkString("\n"))
                  case _ => None
                }
              }.sortBy(_._1)
            }
        }
        Parts(body, series("word/header"), series("word/footer"), footnotes)
      }
    }

  /** Long-format rows: (id, kind, seq, text) with kind body (seq 0) /
    * header / footer (part order) / footnote (seq = w:id). Hostile
    * bytes emit nothing — pair with [[decodeText]]'s quarantine row
    * when refusal visibility is needed. */
  def decodeParts(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        extractParts(if (payload == null) Array.emptyByteArray else payload) match {
          case Some(p) =>
            Seq((id, "body", 0L, p.body)) ++
              p.headers.zipWithIndex.map { case (t, i) => (id, "header", i.toLong, t) } ++
              p.footers.zipWithIndex.map { case (t, i) => (id, "footer", i.toLong, t) } ++
              p.footnotes.map { case (fid, t) => (id, "footnote", fid, t) }
          case None => Seq.empty
        }
      }
      .toDF("id", "kind", "seq", "text")
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
    * Round 13 adds the furniture parts: one header part (two when
    * id % 3 == 0, exercising part-name ordering), one footer, and a
    * footnotes part whose separator + continuation-separator stock
    * entries (ids 0 and -1) precede id % 2 + 1 real footnotes — all
    * id-derived so the parts gate replays every row.
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
        def hdrPart(root: String, body: String) =
          s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
             |<w:$root xmlns:w="$WNs"><w:p><w:r><w:t xml:space="preserve">$body</w:t></w:r></w:p></w:$root>"""
            .stripMargin
        val nFoot = (id % 2 + 1).toInt
        val footnotesXml =
          s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
             |<w:footnotes xmlns:w="$WNs">
             |<w:footnote w:type="separator" w:id="-1"><w:p><w:r><w:separator/></w:r></w:p></w:footnote>
             |<w:footnote w:type="continuationSeparator" w:id="0"><w:p><w:r><w:continuationSeparator/></w:r></w:p></w:footnote>
             |${(1 to nFoot).map(k =>
                 s"""<w:footnote w:id="$k"><w:p><w:r><w:t xml:space="preserve">Note $k for doc $id</w:t></w:r></w:p></w:footnote>""")
                 .mkString("\n")}
             |</w:footnotes>""".stripMargin
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
        val aux = Seq(
          "word/header1.xml" -> hdrPart("hdr", s"Header $id").getBytes("UTF-8")) ++
          (if (id % 3 == 0)
            Seq("word/header2.xml" -> hdrPart("hdr", s"Header2 $id").getBytes("UTF-8"))
          else Seq.empty) ++ Seq(
          "word/footer1.xml" -> hdrPart("ftr", s"Footer $id page").getBytes("UTF-8"),
          "word/footnotes.xml" -> footnotesXml.getBytes("UTF-8"))
        val zip = Zip.zipOf(Seq(
          "[Content_Types].xml" -> contentTypes.getBytes("UTF-8"),
          "_rels/.rels" -> rels.getBytes("UTF-8"),
          "word/document.xml" -> doc.getBytes("UTF-8")) ++ aux,
          deflate = id % 2 == 0)
        (id, zip)
      }
      .toDF("id", "payload")
  }
}
