package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTML table extraction — tables are where crawl pages keep their
  * densest structured facts (specs, standings, financials), and
  * table-to-text corpora mine exactly this surface; flattening
  * `<table>` content to (table, row, col, text) cells is the step
  * between raw HTML and any of that.
  *
  * Real crawl HTML is not XML: `</td>`/`</tr>` are OPTIONAL by the
  * HTML spec and widely omitted, so the walk is split-by-opening-tag
  * (a cell runs to the next cell/row opening or the table end), not
  * a well-formed parse. Rules: outermost non-nested `<table>` blocks
  * in document order (nested tables are declared out of scope — the
  * inner markup simply flattens into its enclosing cell's text);
  * rows split on `<tr`, cells on `<td`/`<th` with the header flag
  * from the tag; cell text is tag-stripped, entity-decoded (the
  * [[TextAnalysis]] prose set), whitespace-collapsed.
  *
  * Scale shape: scan-local per-document kernel, bounded by caps on
  * tables/rows/cells per document.
  */
object Tables {

  private val TableRe = java.util.regex.Pattern.compile(
    "(?is)<table[^>]*>(.*?)</table\\s*>")
  private val TrRe = java.util.regex.Pattern.compile("(?i)<tr[^>]*>")
  private val CellRe = java.util.regex.Pattern.compile("(?i)<(td|th)[^>]*>")

  private def decodeEntities(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&apos;", "'").replace("&nbsp;", " ")
      .replace("&amp;", "&")

  private def cellText(raw: String): String =
    decodeEntities(raw.replaceAll("(?s)<[^>]*>", ""))
      .replaceAll("[ \\t\\r\\n]+", " ").trim

  final case class Cell(table: Int, row: Int, col: Int, header: Boolean, text: String)

  /** (tag start, content start, first group or null) per opening —
    * one linear regex pass, so the segmentation stays linear. */
  private def openings(re: java.util.regex.Pattern, s: String): Vector[(Int, Int, String)] = {
    val out = Vector.newBuilder[(Int, Int, String)]
    val m = re.matcher(s)
    while (m.find()) out += ((m.start(), m.end(),
      if (m.groupCount() >= 1) m.group(1) else null))
    out.result()
  }

  /** Pure per-document kernel, exposed for the spec. */
  private[graft] def tablesOf(html: String, maxTables: Int = 256,
      maxRows: Int = 10000, maxCells: Int = 1000): Vector[Cell] = {
    if (html == null) return Vector.empty
    val out = Vector.newBuilder[Cell]
    val tm = TableRe.matcher(html)
    var ti = 0
    while (ti < maxTables && tm.find()) {
      val body = tm.group(1)
      // rows: content between <tr openings (text before the first
      // <tr — caption/thead noise — is ignored)
      val trs = openings(TrRe, body).take(maxRows)
      var ri = 0
      while (ri < trs.length) {
        val rowEnd = if (ri + 1 < trs.length) trs(ri + 1)._1 else body.length
        val rowBody = body.substring(trs(ri)._2, rowEnd)
        val cs = openings(CellRe, rowBody).take(maxCells)
        var ci = 0
        while (ci < cs.length) {
          val end = if (ci + 1 < cs.length) cs(ci + 1)._1 else rowBody.length
          out += Cell(ti, ri, ci, cs(ci)._3.equalsIgnoreCase("th"),
            cellText(rowBody.substring(cs(ci)._2, end)))
          ci += 1
        }
        ri += 1
      }
      ti += 1
    }
    out.result()
  }

  /** (id, table_idx, row, col, header, text) rows per document —
    * scan-local; null html yields nothing. */
  def extract(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(htmlCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, html) =>
        tablesOf(html).map(c => (id, c.table, c.row, c.col, c.header, c.text))
      })
      .toDF("id", "table_idx", "row", "col", "header", "text")
  }
}
