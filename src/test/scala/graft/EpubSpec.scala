package graft

import graft.ops.Epub
import org.apache.spark.sql.functions._

/** EPUB extraction: the OCF → OPF → spine chain over JDK-zip-written
  * fixtures, relative-href resolution with dot segments, block
  * semantics, refusals, the packer round-trip, and the disk source. */
class EpubSpec extends SparkSuite {
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

  private val Container =
    """<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container" version="1.0">
      |<rootfiles><rootfile full-path="book/pkg.opf" media-type="application/oebps-package+xml"/></rootfiles>
      |</container>""".stripMargin

  private def opf(manifest: String, spine: String): String =
    s"""<package xmlns="http://www.idpf.org/2007/opf" version="3.0">
       |<metadata/><manifest>$manifest</manifest><spine>$spine</spine></package>""".stripMargin

  private def xhtml(body: String): String =
    s"""<html xmlns="http://www.w3.org/1999/xhtml"><head><title>t</title></head><body>$body</body></html>"""

  test("spine order rules; hrefs resolve relative to the OPF with dot segments") {
    val epub = jdkZip(
      "mimetype" -> "application/epub+zip",
      "META-INF/container.xml" -> Container,
      "book/pkg.opf" -> opf(
        // manifest listed out of spine order; one href climbs out of book/
        """<item id="b" href="text/b.xhtml" media-type="application/xhtml+xml"/>
          |<item id="a" href="../shared/a.xhtml" media-type="application/xhtml+xml"/>""".stripMargin,
        """<itemref idref="a"/><itemref idref="b"/>"""),
      "shared/a.xhtml" -> xhtml("<p>first chapter</p>"),
      "book/text/b.xhtml" -> xhtml("<div><p>second</p><p>third</p></div>"))
    assert(Epub.extractText(epub).contains("first chapter\nsecond\nthird"))
  }

  test("block semantics: headings, lists, br inside a block, inline markup") {
    val epub = jdkZip(
      "mimetype" -> "application/epub+zip",
      "META-INF/container.xml" -> Container,
      "book/pkg.opf" -> opf(
        """<item id="c" href="c.xhtml" media-type="application/xhtml+xml"/>""",
        """<itemref idref="c"/>"""),
      "book/c.xhtml" -> xhtml(
        "<h1>Title</h1><p>one <em>two</em> three</p><ul><li>x</li><li>y<br/>z</li></ul>"))
    assert(Epub.extractText(epub).contains("Title\none two three\nx\ny\nz"))
  }

  test("refusal ladder: missing container, dangling idref, malformed chapter, junk") {
    assert(Epub.extractText("junk".getBytes("UTF-8")).isEmpty)
    assert(Epub.extractText(jdkZip("mimetype" -> "application/epub+zip")).isEmpty)
    val dangling = jdkZip(
      "META-INF/container.xml" -> Container,
      "book/pkg.opf" -> opf("", """<itemref idref="ghost"/>"""))
    assert(Epub.extractText(dangling).isEmpty)
    val badChapter = jdkZip(
      "META-INF/container.xml" -> Container,
      "book/pkg.opf" -> opf(
        """<item id="c" href="c.xhtml" media-type="application/xhtml+xml"/>""",
        """<itemref idref="c"/>"""),
      "book/c.xhtml" -> "<html><not closed")
    assert(Epub.extractText(badChapter).isEmpty)
  }

  test("packer round-trip: multi-chapter chunks, entities, trailing newline") {
    val docs = Seq(
      (2L, "l1\nl2\nl3\nl4 & <x>\nl5"),  // 2 chapters (3+2)
      (3L, ""), (4L, "ends with newline\n")).toDF("doc_id", "text")
    val got = Epub.decodeText(Epub.packTextEpub(docs, "doc_id", "text"), "id", "payload")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    assert(got(2L) == (("l1\nl2\nl3\nl4 & <x>\nl5", true)))
    assert(got(3L) == (("", true)))
    assert(got(4L) == (("ends with newline\n", true)))
  }

  test("epub SOURCE reads from disk") {
    val dir = java.nio.file.Files.createTempDirectory("graft-epub").toFile
    val p = Epub.packTextEpub(Seq((1L, "book text")).toDF("doc_id", "text"),
      "doc_id", "text").collect()(0).getAs[Array[Byte]](1)
    val out = new java.io.FileOutputStream(new java.io.File(dir, "b.epub"))
    try out.write(p) finally out.close()
    val read = graft.sources.SourceReader.read(spark,
      graft.spec.SourceSpec("t", "epub", graft.spec.Config.of(
        "path" -> s"${dir.getAbsolutePath}/*.epub")))
      .select("text").as[String].head()
    assert(read == "book text")
    dir.listFiles.foreach(_.delete()); dir.delete()
  }
}
