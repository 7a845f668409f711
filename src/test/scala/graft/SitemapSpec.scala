package graft

import graft.ops.Sitemap

/** sitemaps.org protocol: field extraction, invalid-value nulling,
  * the location rule, the sitemapindex recursion seam, and the
  * DataFrame surface. */
class SitemapSpec extends SparkSuite {
  import spark.implicits._

  private val Url = "https://ex.com/cat/sitemap.xml"

  test("urlset: full field surface, protocol's own example shape") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc>https://ex.com/cat/page?item=12&amp;desc=vacation</loc>
        |    <lastmod>2026-01-01</lastmod>
        |    <changefreq>monthly</changefreq>
        |    <priority>0.8</priority>
        |  </url>
        |  <url><loc> https://ex.com/cat/2 </loc></url>
        |</urlset>""".stripMargin
    val got = Sitemap.parse(Url, xml).get
    assert(got == Seq(
      Sitemap.Entry("url", "https://ex.com/cat/page?item=12&desc=vacation",
        Some("2026-01-01"), Some("monthly"), Some(0.8), inScope = true),
      Sitemap.Entry("url", "https://ex.com/cat/2", None, None, None,
        inScope = true)))
  }

  test("invalid optional values null; missing loc skips the entry") {
    val xml =
      """<urlset>
        |<url><loc>https://ex.com/cat/a</loc>
        |  <changefreq>Sometimes</changefreq><priority>1.5</priority></url>
        |<url><lastmod>2026-01-01</lastmod></url>
        |<url><loc>https://ex.com/cat/b</loc>
        |  <changefreq>WEEKLY</changefreq><priority>1.0</priority></url>
        |</urlset>""".stripMargin
    val got = Sitemap.parse(Url, xml).get
    assert(got.size == 2)
    assert(got.head.changefreq.isEmpty && got.head.priority.isEmpty)
    // case-insensitive enum, boundary priority 1.0 valid
    assert(got(1).changefreq.contains("weekly") && got(1).priority.contains(1.0))
  }

  test("location rule: host case-insensitive, path case-sensitive, queries in") {
    def scope(loc: String): Boolean =
      Sitemap.parse(Url, s"<urlset><url><loc>$loc</loc></url></urlset>")
        .get.head.inScope
    assert(scope("https://ex.com/cat/deep/x"))
    assert(scope("HTTPS://EX.COM/cat/x"))            // scheme+host fold
    assert(!scope("https://ex.com/CAT/x"))           // path is case-sensitive
    assert(!scope("https://ex.com/other/x"))
    assert(!scope("https://sub.ex.com/cat/x"))
    assert(!scope("relative/x"))
    assert(scope("https://ex.com/cat/p?q=1"))
  }

  test("sitemapindex: recursion seam, lastmod only") {
    val xml =
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<sitemap><loc>https://ex.com/cat/s1.xml</loc>
        |  <lastmod>2026-02-02</lastmod></sitemap>
        |<sitemap><loc>https://ex.com/cat/s2.xml</loc>
        |  <changefreq>daily</changefreq></sitemap>
        |</sitemapindex>""".stripMargin
    val got = Sitemap.parse(Url, xml).get
    assert(got.map(_.kind).distinct == Seq("sitemap"))
    assert(got.head.lastmod.contains("2026-02-02"))
    assert(got(1).changefreq.isEmpty) // index entries have no changefreq
  }

  test("namespace-prefixed documents and wrong roots") {
    val pfx = """<sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
                |<sm:url><sm:loc>https://ex.com/cat/a</sm:loc></sm:url>
                |</sm:urlset>""".stripMargin
    assert(Sitemap.parse(Url, pfx).get.map(_.loc) == Seq("https://ex.com/cat/a"))
    assert(Sitemap.parse(Url, "<rss><channel/></rss>").isEmpty)
    assert(Sitemap.parse(Url, "not xml").isEmpty)
  }

  test("DataFrame surface: malformed rows emit nothing, seq in order") {
    val df = Seq(
      (1L, Url, "<urlset><url><loc>https://ex.com/cat/a</loc></url>" +
        "<url><loc>https://ex.com/cat/b</loc></url></urlset>"),
      (2L, Url, "<urlset><url><loc>x"),
      (3L, Url, null)).toDF("doc_id", "url", "xml")
    val got = Sitemap.extract(df, "doc_id", "url", "xml")
      .select("id", "seq", "loc").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq((1L, 0, "https://ex.com/cat/a"),
      (1L, 1, "https://ex.com/cat/b")))
  }
}
