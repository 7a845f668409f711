package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** XLSX cell extraction — the TABULAR member of the office ladder
  * ([[Docx]] text, [[Office]] slides/ODT, this: spreadsheets), on
  * the same from-spec [[Zip]]+[[Xml]] stack. Spreadsheet dumps are a
  * routine corpus input (CSV's richer sibling), and the format is
  * fully specified in ECMA-376 SpreadsheetML:
  *
  *  - sheet DISCOVERY is the real OPC walk, not a filename guess:
  *    `xl/workbook.xml` lists sheets (name + `r:id`) in workbook
  *    order, and `xl/_rels/workbook.xml.rels` resolves each
  *    relationship id to its part (targets relative to `xl/`);
  *  - `xl/sharedStrings.xml` is the string table: one `si` per
  *    index, rich-text runs (`r`/`t`) concatenated;
  *  - cells carry their ADDRESS (`r="B3"` — the column walk must
  *    honor gaps, not count positions) and a type: `s` shared
  *    string, `inlineStr` (`is`/`t`), `str` formula result, `b`
  *    boolean, default number — values surface as the STRINGS the
  *    file stores (the csv all-string parity convention; no float
  *    reformatting);
  *  - output is LONG format: one (sheet, row, col, value) row per
  *    populated cell — schema-free, so a pipeline pivots/filters
  *    with ordinary ops downstream.
  *
  * Same never-throw contract as the rest of the ladder. Formulas'
  * cached results are read (`str`/number `v`), never evaluated —
  * declared.
  */
object Xlsx {

  final case class Cell(sheet: String, row: Long, col: String, value: String)

  /** "B3" → ("B", 3) — None on malformed refs. */
  private def splitRef(ref: String): Option[(String, Long)] = {
    val i = ref.indexWhere(c => c >= '0' && c <= '9')
    if (i <= 0 || !ref.substring(i).forall(_.isDigit)) None
    else if (!ref.substring(0, i).forall(c => c >= 'A' && c <= 'Z')) None
    else Some((ref.substring(0, i), ref.substring(i).toLong))
  }

  private def richText(si: Xml.Elem): String = {
    val sb = new StringBuilder
    def walk(e: Xml.Elem): Unit = e.children.foreach {
      case c: Xml.Elem => if (c.local == "t") sb.append(c.text) else walk(c)
      case _ => ()
    }
    walk(si)
    sb.toString
  }

  /** All populated cells of one .xlsx payload, sheets in workbook
    * order, rows/cells in file order. None on any structural
    * violation (the refuse-don't-guess stance). */
  def cells(xlsx: Array[Byte]): Option[Seq[Cell]] = {
    val entries = Zip.entries(xlsx) match { case Some(e) => e; case None => return None }
    def part(name: String): Option[Xml.Elem] =
      entries.find(_.name == name).flatMap(e =>
        Xml.parse(new String(e.data, java.nio.charset.StandardCharsets.UTF_8)))
    val workbook = part("xl/workbook.xml") match {
      case Some(w) => w; case None => return None
    }
    val rels = part("xl/_rels/workbook.xml.rels") match {
      case Some(r) => r; case None => return None
    }
    val relMap: Map[String, String] = Xml.collectByLocal(rels, "Relationship")
      .flatMap(r => for (id <- r.attr("Id"); t <- r.attr("Target")) yield id -> t)
      .toMap
    val shared: Vector[String] = part("xl/sharedStrings.xml") match {
      case Some(sst) => Xml.collectByLocal(sst, "si").map(richText).toVector
      case None => Vector.empty
    }
    val sheets: Seq[(String, String)] = Xml.collectByLocal(workbook, "sheet")
      .flatMap { sh =>
        for {
          name <- sh.attr("name")
          rid <- sh.attr("r:id").orElse(sh.attrs.collectFirst {
            case (k, v) if k.endsWith(":id") || k == "id" => v
          })
          target <- relMap.get(rid)
        } yield (name, if (target.startsWith("/")) target.substring(1)
                       else "xl/" + target)
      }
    if (sheets.isEmpty) return None
    val out = Seq.newBuilder[Cell]
    sheets.foreach { case (sheetName, path) =>
      val sheet = part(path) match { case Some(s) => s; case None => return None }
      Xml.collectByLocal(sheet, "row").foreach { row =>
        row.children.foreach {
          case c: Xml.Elem if c.local == "c" =>
            val ref = c.attr("r") match { case Some(r) => r; case None => return None }
            val (colL, rowN) = splitRef(ref) match {
              case Some(x) => x; case None => return None
            }
            val t = c.attr("t").getOrElse("n")
            val v: Option[String] = t match {
              case "s" =>
                c.elems("v").headOption.map(_.text.trim).flatMap { idx =>
                  val i = try idx.toInt catch { case _: Exception => return None }
                  if (i < 0 || i >= shared.length) return None
                  Some(shared(i))
                }
              case "inlineStr" =>
                c.elems("is").headOption.map(richText)
              case _ => // n (number), str (formula result), b (boolean)
                c.elems("v").headOption.map(_.text)
            }
            v.foreach(value => out += Cell(sheetName, rowN, colL, value))
          case _ => ()
        }
      }
    }
    Some(out.result())
  }

  /** (id, sheet, row, col, value) rows — scan-local; hostile bytes
    * emit nothing. */
  def decodeCells(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        cells(if (payload == null) Array.emptyByteArray else payload)
          .getOrElse(Seq.empty)
          .map(c => (id, c.sheet, c.row, c.col, c.value))
      }
      .toDF("id", "sheet", "row", "col", "value")
  }

  private def escXml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Minimal spec-valid .xlsx per group: rows (doc_id as a number
    * cell in A, source as a SHARED string in B — the table dedups,
    * so repeated sources share an index — text as an inline string
    * in C), one sheet, real workbook + rels discovery chain. Even
    * file ids DEFLATE, odd store. */
  def packDocsXlsx(df: DataFrame, idCol: String, sourceCol: String,
      textCol: String, nFiles: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)),
        coalesce(col(sourceCol), lit("")), coalesce(col(textCol), lit("")))
      .as[(Long, String, String)]
      .groupByKey(_._1 % nFiles)
      .mapGroups { (fileId, it) =>
        val rows = it.toSeq.sortBy(_._1)
        val sharedIdx = scala.collection.mutable.LinkedHashMap.empty[String, Int]
        rows.foreach { case (_, src, _) =>
          if (!sharedIdx.contains(src)) sharedIdx(src) = sharedIdx.size
        }
        val sst = """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
          sharedIdx.keys.map(s =>
            s"""<si><t xml:space="preserve">${escXml(s)}</t></si>""").mkString + "</sst>"
        val sheet = """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
          rows.zipWithIndex.map { case ((id, src, text), i) =>
            val r = i + 1
            s"""<row r="$r"><c r="A$r"><v>$id</v></c>""" +
              s"""<c r="B$r" t="s"><v>${sharedIdx(src)}</v></c>""" +
              s"""<c r="C$r" t="inlineStr"><is><t xml:space="preserve">${escXml(text)}</t></is></c></row>"""
          }.mkString + "</sheetData></worksheet>"
        val workbook = """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" """ +
          """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
          """<sheets><sheet name="docs" sheetId="1" r:id="rId1"/></sheets></workbook>"""
        val rels = """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
          """</Relationships>"""
        val ct = """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="xml" ContentType="application/xml"/></Types>"""
        (fileId, Zip.zipOf(Seq(
          "[Content_Types].xml" -> ct.getBytes("UTF-8"),
          "xl/workbook.xml" -> workbook.getBytes("UTF-8"),
          "xl/_rels/workbook.xml.rels" -> rels.getBytes("UTF-8"),
          "xl/sharedStrings.xml" -> sst.getBytes("UTF-8"),
          "xl/worksheets/sheet1.xml" -> sheet.getBytes("UTF-8")),
          deflate = fileId % 2 == 0))
      }
      .toDF("file_id", "payload")
  }
}
