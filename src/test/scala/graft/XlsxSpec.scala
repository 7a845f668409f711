package graft

import graft.ops.Xlsx
import org.apache.spark.sql.functions._

/** XLSX cell extraction: the OPC discovery chain (workbook → rels →
  * sheets), cell types, address gaps, rich shared strings, multiple
  * sheets in workbook order — over JDK-zip-written fixtures — plus
  * the packer round-trip, refusals, and the disk source. */
class XlsxSpec extends SparkSuite {
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

  private val Main = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
  private val ROdf = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

  private def workbook(sheets: (String, String)*): (String, String) = {
    val wb = s"""<workbook xmlns="$Main" xmlns:r="$ROdf"><sheets>""" +
      sheets.zipWithIndex.map { case ((name, _), i) =>
        s"""<sheet name="$name" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
      }.mkString + "</sheets></workbook>"
    val rels = """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      sheets.zipWithIndex.map { case ((_, target), i) =>
        s"""<Relationship Id="rId${i + 1}" Type="$ROdf/worksheet" Target="$target"/>"""
      }.mkString + "</Relationships>"
    (wb, rels)
  }

  test("cell types, address gaps, rich shared strings, sheet order via rels") {
    val sst = s"""<sst xmlns="$Main">""" +
      "<si><t>plain</t></si>" +
      "<si><r><rPr/><t>rich </t></r><r><t>run</t></r></si></sst>"
    // second sheet listed FIRST in the package; workbook order rules.
    // D1 after a gap (no B-C cells); formula cached result; boolean.
    val s1 = s"""<worksheet xmlns="$Main"><sheetData>
                |<row r="1"><c r="A1" t="s"><v>1</v></c><c r="D1"><v>42.5</v></c></row>
                |<row r="3"><c r="B3" t="inlineStr"><is><t>inline &amp; text</t></is></c>
                |  <c r="C3" t="str"><v>SUMRESULT</v></c>
                |  <c r="E3" t="b"><v>1</v></c></row>
                |</sheetData></worksheet>""".stripMargin
    val s2 = s"""<worksheet xmlns="$Main"><sheetData>
                |<row r="1"><c r="A1" t="s"><v>0</v></c></row>
                |</sheetData></worksheet>""".stripMargin
    val (wb, rels) = workbook("first" -> "worksheets/sheet1.xml",
      "second" -> "worksheets/sheet2.xml")
    val xlsx = jdkZip(
      "xl/worksheets/sheet2.xml" -> s2,
      "xl/worksheets/sheet1.xml" -> s1,
      "xl/workbook.xml" -> wb,
      "xl/_rels/workbook.xml.rels" -> rels,
      "xl/sharedStrings.xml" -> sst)
    val got = Xlsx.cells(xlsx).get
    assert(got == Seq(
      Xlsx.Cell("first", 1, "A", "rich run"),
      Xlsx.Cell("first", 1, "D", "42.5"),
      Xlsx.Cell("first", 3, "B", "inline & text"),
      Xlsx.Cell("first", 3, "C", "SUMRESULT"),
      Xlsx.Cell("first", 3, "E", "1"),
      Xlsx.Cell("second", 1, "A", "plain")))
  }

  test("refusals: shared index out of range, missing parts, bad refs, junk") {
    val (wb, rels) = workbook("s" -> "worksheets/sheet1.xml")
    def make(sheet: String, sst: String = s"""<sst xmlns="$Main"/>""") = jdkZip(
      "xl/workbook.xml" -> wb, "xl/_rels/workbook.xml.rels" -> rels,
      "xl/sharedStrings.xml" -> sst, "xl/worksheets/sheet1.xml" -> sheet)
    assert(Xlsx.cells(make(
      s"""<worksheet xmlns="$Main"><sheetData><row r="1"><c r="A1" t="s"><v>5</v></c></row></sheetData></worksheet>""")).isEmpty)
    assert(Xlsx.cells(make(
      s"""<worksheet xmlns="$Main"><sheetData><row r="1"><c r="1A"><v>1</v></c></row></sheetData></worksheet>""")).isEmpty)
    assert(Xlsx.cells(jdkZip("xl/workbook.xml" -> wb)).isEmpty) // no rels
    assert(Xlsx.cells("not a zip".getBytes("UTF-8")).isEmpty)
  }

  test("packer round-trip: shared-string dedup, both zip modes, empty text") {
    val docs = Seq((0L, "web", "alpha & <b>"), (8L, "web", ""), (3L, "books", "line\ntwo"))
      .toDF("doc_id", "source", "text")
    val cells = Xlsx.decodeCells(
      Xlsx.packDocsXlsx(docs, "doc_id", "source", "text"), "file_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3), r.getString(4)))
    // file 0 holds docs 0 and 8 (both % 8 == 0) in id order
    assert(cells.filter(_._1 == 0L).toSet == Set(
      (0L, 1L, "A", "0"), (0L, 1L, "B", "web"), (0L, 1L, "C", "alpha & <b>"),
      (0L, 2L, "A", "8"), (0L, 2L, "B", "web"), (0L, 2L, "C", "")))
    assert(cells.filter(_._1 == 3L).toSet == Set(
      (3L, 1L, "A", "3"), (3L, 1L, "B", "books"), (3L, 1L, "C", "line\ntwo")))
  }

  test("xlsx SOURCE reads from disk; hostile file quarantines as row = -1") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx").toFile
    val p = Xlsx.packDocsXlsx(Seq((1L, "s", "t")).toDF("doc_id", "source", "text"),
      "doc_id", "source", "text", nFiles = 1).collect()(0).getAs[Array[Byte]](1)
    def put(name: String, b: Array[Byte]): Unit = {
      val out = new java.io.FileOutputStream(new java.io.File(dir, name))
      try out.write(b) finally out.close()
    }
    put("a.xlsx", p); put("bad.xlsx", "junk".getBytes("UTF-8"))
    val read = graft.sources.SourceReader.read(spark,
      graft.spec.SourceSpec("t", "xlsx", graft.spec.Config.of(
        "path" -> s"${dir.getAbsolutePath}/*.xlsx")))
      .collect().map(r => (r.getString(0).split("/").last, r.getLong(2),
        Option(r.getString(3)).orNull, Option(r.getString(4)).orNull)).toSet
    assert(read == Set(
      ("a.xlsx", 1L, "A", "1"), ("a.xlsx", 1L, "B", "s"), ("a.xlsx", 1L, "C", "t"),
      ("bad.xlsx", -1L, null, null)))
    dir.listFiles.foreach(_.delete()); dir.delete()
  }
}
