package graft

import org.apache.spark.sql.functions._

import graft.ops.Tables

/** HTML table extraction: the optional-closer reality, header flags,
  * entity decode, nested markup flattening, and caps. */
class TablesSpec extends SparkSuite {
  import spark.implicits._

  private def cells(html: String) =
    Tables.tablesOf(html).map(c => (c.table, c.row, c.col, c.header, c.text))

  test("well-formed table with headers and entities") {
    val html = """<table><tr><th>Name</th><th>Qty &amp; unit</th></tr>
                 |<tr><td>apples</td><td>3 &lt;kg&gt;</td></tr></table>""".stripMargin
    assert(cells(html) == Vector(
      (0, 0, 0, true, "Name"), (0, 0, 1, true, "Qty & unit"),
      (0, 1, 0, false, "apples"), (0, 1, 1, false, "3 <kg>")))
  }

  test("omitted </td> and </tr> closers parse identically") {
    val sloppy = "<table><tr><td>a<td>b<tr><td>c<td>d</table>"
    assert(cells(sloppy) == Vector(
      (0, 0, 0, false, "a"), (0, 0, 1, false, "b"),
      (0, 1, 0, false, "c"), (0, 1, 1, false, "d")))
    // attributes on every tag; mixed case
    val attrs = """<TABLE id=x><TR class=r><TD colspan="2">v</TD></TR></TABLE>"""
    assert(cells(attrs) == Vector((0, 0, 0, false, "v")))
  }

  test("multiple tables in document order; inner markup flattens; caption ignored") {
    val html = "<table><caption>skip</caption><tr><td><b>bold</b> text</td></tr></table>" +
      "<p>between</p><table><tr><th>solo</th></tr></table>"
    assert(cells(html) == Vector(
      (0, 0, 0, false, "bold text"), (1, 0, 0, true, "solo")))
  }

  test("degenerate inputs: no tables, empty rows, null, unterminated table") {
    assert(cells("<p>no tables here</p>").isEmpty)
    assert(cells("<table><tr></tr></table>").isEmpty)
    assert(Tables.tablesOf(null).isEmpty)
    // no </table>: the block never matches (declared — a truncated
    // page loses its trailing table, it does not crash)
    assert(cells("<table><tr><td>x").isEmpty)
  }

  test("DataFrame seam") {
    val df = Seq((5L, "<table><tr><td>only</td></tr></table>"), (6L, null: String))
      .toDF("doc_id", "html")
    val got = Tables.extract(df, "doc_id", "html")
      .select($"id", $"text").as[(Long, String)].collect()
    assert(got.toSeq == Seq((5L, "only")))
  }
}
