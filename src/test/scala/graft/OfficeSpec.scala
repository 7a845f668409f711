package graft

import graft.ops.Office
import org.apache.spark.sql.functions._

/** PPTX/ODT extraction: element semantics over JDK-zip-written
  * fixtures (independent container writer), numeric slide ordering,
  * ODT whitespace elements and footnote skip, packer round-trips,
  * refusals, and the disk sources. */
class OfficeSpec extends SparkSuite {
  import spark.implicits._

  private def jdkZip(members: (String, String)*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    members.foreach { case (name, data) =>
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(data.getBytes("UTF-8")); z.closeEntry()
    }
    z.close(); bos.toByteArray
  }

  private val P = "http://schemas.openxmlformats.org/presentationml/2006/main"
  private val A = "http://schemas.openxmlformats.org/drawingml/2006/main"

  private def slide(texts: String*): String =
    s"""<p:sld xmlns:p="$P" xmlns:a="$A"><p:cSld><p:spTree><p:sp><p:txBody>""" +
      texts.map(t => s"<a:p><a:r><a:t>$t</a:t></a:r></a:p>").mkString +
      "</p:txBody></p:sp></p:spTree></p:cSld></p:sld>"

  test("pptx: numeric slide order beats package and lexicographic order") {
    // listed out of order; slide10 would sort before slide2 lexicographically
    val pptx = jdkZip(
      "ppt/slides/slide10.xml" -> slide("ten"),
      "ppt/slides/slide1.xml" -> slide("one a", "one b"),
      "ppt/slides/slide2.xml" -> slide("two"))
    assert(Office.extractPptxText(pptx).contains("one a\none b\ntwo\nten"))
  }

  test("pptx: a:br breaks, no slides refuses, malformed slide refuses") {
    val pptx = jdkZip("ppt/slides/slide1.xml" ->
      s"""<p:sld xmlns:p="$P" xmlns:a="$A"><p:cSld><p:spTree><p:sp><p:txBody>
         |<a:p><a:r><a:t>x</a:t></a:r><a:br/><a:r><a:t>y</a:t></a:r></a:p>
         |</p:txBody></p:sp></p:spTree></p:cSld></p:sld>""".stripMargin)
    assert(Office.extractPptxText(pptx).contains("x\ny"))
    assert(Office.extractPptxText(jdkZip("other.xml" -> "<a/>")).isEmpty)
    assert(Office.extractPptxText(jdkZip("ppt/slides/slide1.xml" -> "<bad")).isEmpty)
  }

  private def odt(body: String): Array[Byte] = jdkZip(
    "mimetype" -> "application/vnd.oasis.opendocument.text",
    "content.xml" ->
      ("""<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" """ +
        """xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">""" +
        s"<office:body><office:text>$body</office:text></office:body>" +
        "</office:document-content>"))

  test("odt: headings, spans, tab/line-break/text:s, footnote skip") {
    val body =
      """<text:h>Title</text:h>
        |<text:p>plain <text:span>spanned</text:span> end</text:p>
        |<text:p>a<text:tab/>b<text:line-break/>c<text:s text:c="3"/>d</text:p>
        |<text:p>before<text:note><text:note-body><text:p>footnote</text:p></text:note-body></text:note> after</text:p>""".stripMargin
    val got = Office.extractOdtText(odt(body)).get
    assert(got.contains("Title"))
    assert(got.contains("plain spanned end"))
    assert(got.contains("a\tb\nc   d"))
    assert(got.contains("before after") && !got.contains("footnote"))
  }

  test("odt refusals: no content part, malformed xml, not a zip") {
    assert(Office.extractOdtText(jdkZip("mimetype" -> "x")).isEmpty)
    assert(Office.extractOdtText(jdkZip("content.xml" -> "<o:d><broken")).isEmpty)
    assert(Office.extractOdtText("junk".getBytes("UTF-8")).isEmpty)
  }

  test("packers round-trip multi-line entity-laden text; mimetype is first ODT member") {
    val docs = Seq((2L, "line one\nline & <two>\nthird"), (3L, "")).toDF("doc_id", "text")
    val pp = Office.decodePptxText(Office.packTextPptx(docs, "doc_id", "text"), "id", "payload")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pp(2L) == "line one\nline & <two>\nthird" && pp(3L) == "")
    val odtPacked = Office.packTextOdt(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val oo = Office.decodeOdtText(
      odtPacked.toSeq.toDF("id", "payload"), "id", "payload")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(oo(2L) == "line one\nline & <two>\nthird" && oo(3L) == "")
    // ODF convention: the first central-directory member is mimetype
    assert(graft.ops.Zip.entries(odtPacked(3L)).get.head.name == "mimetype")
  }

  test("pptx and odt SOURCES read from disk") {
    val dir = java.nio.file.Files.createTempDirectory("graft-office").toFile
    val docs = Seq((1L, "source check")).toDF("doc_id", "text")
    val p = Office.packTextPptx(docs, "doc_id", "text").collect()(0).getAs[Array[Byte]](1)
    val o = Office.packTextOdt(docs, "doc_id", "text").collect()(0).getAs[Array[Byte]](1)
    def put(name: String, b: Array[Byte]): Unit = {
      val out = new java.io.FileOutputStream(new java.io.File(dir, name))
      try out.write(b) finally out.close()
    }
    put("x.pptx", p); put("x.odt", o)
    def readAs(tpe: String, glob: String) =
      graft.sources.SourceReader.read(spark, graft.spec.SourceSpec("t", tpe,
        graft.spec.Config.of("path" -> s"${dir.getAbsolutePath}/$glob")))
        .select("text").as[String].head()
    assert(readAs("pptx", "*.pptx") == "source check")
    assert(readAs("odt", "*.odt") == "source check")
    dir.listFiles.foreach(_.delete()); dir.delete()
  }
}
