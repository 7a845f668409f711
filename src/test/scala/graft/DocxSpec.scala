package graft

import graft.ops.Docx
import org.apache.spark.sql.functions._

/** DOCX extraction on the from-spec Zip + Xml stack: element
  * semantics (w:t runs, tabs, breaks, hyperlink wrappers, table
  * order), a JDK-zip-written fixture (independent container writer),
  * the packer round-trip, the refusal ladder, and the disk source. */
class DocxSpec extends SparkSuite {
  import spark.implicits._

  private val W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

  /** Independent container writer: java.util.zip, not graft.ops.Zip. */
  private def jdkDocx(documentXml: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    def put(name: String, data: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(data.getBytes("UTF-8")); z.closeEntry()
    }
    put("[Content_Types].xml",
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    put("word/document.xml", documentXml)
    z.close()
    bos.toByteArray
  }

  test("runs, tabs, breaks, hyperlink wrappers, paragraphs — via a JDK-written zip") {
    val doc =
      s"""<w:document xmlns:w="$W"><w:body>
         |<w:p><w:r><w:t>Hello</w:t></w:r><w:r><w:tab/><w:t>world</w:t></w:r></w:p>
         |<w:p><w:hyperlink><w:r><w:t>linked</w:t></w:r></w:hyperlink>
         |  <w:r><w:t> and</w:t><w:br/><w:t>broken</w:t></w:r></w:p>
         |<w:p/>
         |</w:body></w:document>""".stripMargin
    assert(Docx.extractText(jdkDocx(doc)).contains(
      "Hello\tworld\nlinked and\nbroken\n"))
  }

  test("table-cell paragraphs surface in document order") {
    val doc =
      s"""<w:document xmlns:w="$W"><w:body>
         |<w:p><w:r><w:t>before</w:t></w:r></w:p>
         |<w:tbl><w:tr>
         |  <w:tc><w:p><w:r><w:t>c1</w:t></w:r></w:p></w:tc>
         |  <w:tc><w:p><w:r><w:t>c2</w:t></w:r></w:p></w:tc>
         |</w:tr></w:tbl>
         |<w:p><w:r><w:t>after</w:t></w:r></w:p>
         |</w:body></w:document>""".stripMargin
    assert(Docx.extractText(jdkDocx(doc)).contains("before\nc1\nc2\nafter"))
  }

  test("refusal ladder: not a zip, no document part, malformed xml") {
    assert(Docx.extractText("plain bytes".getBytes("UTF-8")).isEmpty)
    val noPart = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      z.putNextEntry(new java.util.zip.ZipEntry("other.txt"))
      z.write("x".getBytes("UTF-8")); z.closeEntry(); z.close()
      bos.toByteArray
    }
    assert(Docx.extractText(noPart).isEmpty)
    assert(Docx.extractText(jdkDocx("<w:document><broken")).isEmpty)
  }

  test("packTextDocx round-trips multi-paragraph, entity-laden, tabbed text") {
    val docs = Seq(
      (2L, "para one\npara two & <tag>\n\tindented"),
      (3L, ""),
      (4L, "already &amp; escaped")).toDF("doc_id", "text")
    val got = Docx.decodeText(Docx.packTextDocx(docs, "doc_id", "text"), "id", "payload")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    assert(got(2L) == (("para one\npara two & <tag>\n\tindented", true)))
    assert(got(3L) == (("", true)))
    assert(got(4L) == (("already &amp; escaped", true)))
  }

  test("extractParts: header order, footer, footnote ids, stock-entry skip, aux tolerance") {
    // independent JDK-zip package with furniture parts
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    def put(name: String, data: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(data.getBytes("UTF-8")); z.closeEntry()
    }
    def para(t: String) = s"""<w:p><w:r><w:t>$t</w:t></w:r></w:p>"""
    put("[Content_Types].xml",
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    put("word/document.xml",
      s"""<w:document xmlns:w="$W"><w:body>${para("the body")}</w:body></w:document>""")
    // deliberately out of zip order: header2 before header1 — the
    // reader must sort by part NAME
    put("word/header2.xml", s"""<w:hdr xmlns:w="$W">${para("second header")}</w:hdr>""")
    put("word/header1.xml", s"""<w:hdr xmlns:w="$W">${para("first header")}</w:hdr>""")
    put("word/footer1.xml", s"""<w:ftr xmlns:w="$W">${para("the footer")}</w:ftr>""")
    put("word/footnotes.xml",
      s"""<w:footnotes xmlns:w="$W">
         |<w:footnote w:type="separator" w:id="-1">${para("")}</w:footnote>
         |<w:footnote w:type="continuationSeparator" w:id="0">${para("")}</w:footnote>
         |<w:footnote w:id="2">${para("note two")}</w:footnote>
         |<w:footnote w:id="1">${para("note one")}</w:footnote>
         |</w:footnotes>""".stripMargin)
    put("word/headerBROKEN.xml", "<not xml") // malformed aux part: dropped, not fatal
    z.close()
    val p = Docx.extractParts(bos.toByteArray).get
    assert(p.body == "the body")
    assert(p.headers == Seq("first header", "second header"))
    assert(p.footers == Seq("the footer"))
    assert(p.footnotes == Seq(1L -> "note one", 2L -> "note two"))
    // body part unreadable -> whole document refuses
    assert(Docx.extractParts("junk".getBytes).isEmpty)
    // packer round trip through the long-format seam
    val rows = Docx.decodeParts(
      Docx.packTextDocx(Seq((6L, "body line")).toDF("doc_id", "text"), "doc_id", "text"),
      "id", "payload")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getString(3))).toSet
    assert(rows == Set(("body", 0L, "body line"), ("header", 0L, "Header 6"),
      ("header", 1L, "Header2 6"), ("footer", 0L, "Footer 6 page"),
      ("footnote", 1L, "Note 1 for doc 6")))
  }

  test("docx SOURCE reads files from disk; hostile file flagged") {
    val dir = java.nio.file.Files.createTempDirectory("graft-docx").toFile
    val payloads = Docx.packTextDocx(
      Seq((1L, "disk doc one"), (2L, "disk doc two")).toDF("doc_id", "text"),
      "doc_id", "text").collect()
    payloads.foreach { r =>
      val out = new java.io.FileOutputStream(new java.io.File(dir, s"d${r.getLong(0)}.docx"))
      try out.write(r.getAs[Array[Byte]](1)) finally out.close()
    }
    val bad = new java.io.FileOutputStream(new java.io.File(dir, "bad.docx"))
    try bad.write("not a docx".getBytes("UTF-8")) finally bad.close()
    val read = graft.sources.SourceReader.read(spark,
      graft.spec.SourceSpec("docs", "docx", graft.spec.Config.of(
        "path" -> s"${dir.getAbsolutePath}/*.docx")))
    val rows = read.collect().map(r =>
      (r.getString(0).split("/").last, r.getString(1), r.getBoolean(2))).toSet
    assert(rows == Set(("d1.docx", "disk doc one", true),
      ("d2.docx", "disk doc two", true), ("bad.docx", "", false)))
    dir.listFiles.foreach(_.delete()); dir.delete()
  }
}
