package graft

import org.apache.spark.sql.functions._

import graft.ops.Boilerplate

/** jusText-lite rules on hand pages: link density, length gate,
  * block splitting, script/comment removal, and the extract join. */
class BoilerplateSpec extends SparkSuite {
  import spark.implicits._

  private def blocks(html: String) =
    Boilerplate.blocksOf(html).map(b => (b.text, b.nWords, b.good))

  test("link-dense furniture is bad; prose with an inline link survives") {
    val html = """<nav><a href="/">Home</a> <a href="/x">About us</a></nav>
                 |<p>This paragraph has a <a href="/l">useful link</a> inside real prose.</p>""".stripMargin
    val got = blocks(html)
    assert(got.length == 2)
    assert(got(0) == (("Home About us", 3, false)))
    assert(got(1)._3 === true)
    // density accounting: anchor text chars over block chars
    val b = Boilerplate.blocksOf(html)
    assert(math.abs(b(0).linkDensity - ("HomeAbout us".length.toDouble / "Home About us".length)) < 1e-12)
  }

  test("short blocks are bad even without links; 4 words is the floor") {
    assert(blocks("<p>three short words</p>") == Vector(("three short words", 3, false)))
    assert(blocks("<p>exactly four words here</p>") == Vector(("exactly four words here", 4, true)))
  }

  test("block boundaries: headings, br, divs; script/style/comments vanish") {
    val html = "<script>var x = 'junk junk junk junk';</script>" +
      "<h2>A fine heading with words</h2>text after<br>more text after the break goes here" +
      "<!-- hidden furniture comment -->"
    val got = blocks(html)
    assert(got.map(_._1) == Vector("A fine heading with words",
      "text after", "more text after the break goes here"))
    assert(got.map(_._3) == Vector(true, false, true))
  }

  test("extract joins the good blocks; degenerate pages") {
    val html = "<nav><a>x</a></nav><p>the real content lives right here</p>" +
      "<footer><a>Terms</a></footer><p>and continues in this block too</p>"
    val df = Seq((1L, html), (2L, "<nav><a>only junk</a></nav>"), (3L, null: String))
      .toDF("id", "html")
    val got = Boilerplate.extract(df, "id", "html")
      .select($"id", $"text").as[(Long, String)].collect().sortBy(_._1)
    assert(got(0)._2 == "the real content lives right here\nand continues in this block too")
    assert(got(1)._2 == "")
    assert(got(2)._2 == "")
    assert(Boilerplate.blocksOf(null).isEmpty)
  }
}
