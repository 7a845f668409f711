package graft

import graft.ops.Feed

/** RSS 2.0 / Atom feed parsing on the Xml core: guid conventions,
  * the Atom link-rel rule, published/updated preference, identity
  * skips, root refusal, and the DataFrame surface. */
class FeedSpec extends SparkSuite {
  import spark.implicits._

  test("RSS: fields, guid isPermaLink conventions, identity skip") {
    val xml =
      """<rss version="2.0"><channel><title>Blog</title>
        |<item><title>A</title><link>https://b.ex/a</link>
        |  <guid isPermaLink="false">guid-a</guid>
        |  <pubDate>Mon, 02 Feb 2026 10:00:00 GMT</pubDate>
        |  <description>first   post</description></item>
        |<item><guid>https://b.ex/perma</guid></item>
        |<item><guid isPermaLink="false">only-id</guid></item>
        |<item><title>nothing crawlable</title></item>
        |</channel></rss>""".stripMargin
    val got = Feed.parse(xml).get
    assert(got.size == 3)
    assert(got.head == Feed.Entry("rss", Some("A"), Some("https://b.ex/a"),
      Some("guid-a"), Some("Mon, 02 Feb 2026 10:00:00 GMT"), Some("first post")))
    // permalink guid (default isPermaLink=true) doubles as the link
    assert(got(1).link.contains("https://b.ex/perma"))
    // non-permalink guid alone: identity yes, link no
    assert(got(2).link.isEmpty && got(2).entryId.contains("only-id"))
  }

  test("Atom: link-rel rule — alternate over self, rel-less is alternate") {
    val xml =
      """<feed xmlns="http://www.w3.org/2005/Atom">
        |<entry><title>E1</title>
        |  <link rel="self" href="https://b.ex/self"/>
        |  <link rel="alternate" href="https://b.ex/alt"/>
        |  <id>one</id><updated>2026-01-01T00:00:00Z</updated></entry>
        |<entry><title>E2</title>
        |  <link rel="enclosure" href="https://b.ex/file.mp3"/>
        |  <link href="https://b.ex/plain"/>
        |  <id>two</id><published>2026-02-01T00:00:00Z</published>
        |  <updated>2026-03-01T00:00:00Z</updated></entry>
        |<entry><title>E3</title>
        |  <link rel="self" href="https://b.ex/only-self"/>
        |  <id>three</id><updated>2026-04-01T00:00:00Z</updated></entry>
        |</feed>""".stripMargin
    val got = Feed.parse(xml).get
    assert(got.map(_.link) == Seq(Some("https://b.ex/alt"),
      Some("https://b.ex/plain"), None))
    // published preferred; updated is the fallback
    assert(got(0).published.contains("2026-01-01T00:00:00Z"))
    assert(got(1).published.contains("2026-02-01T00:00:00Z"))
    assert(got(2).entryId.contains("three")) // id alone keeps the entry
  }

  test("namespace-prefixed atom and wrong roots") {
    val pfx = """<a:feed xmlns:a="http://www.w3.org/2005/Atom">
                |<a:entry><a:id>x</a:id><a:updated>u</a:updated></a:entry>
                |</a:feed>""".stripMargin
    assert(Feed.parse(pfx).get.map(_.entryId) == Seq(Some("x")))
    assert(Feed.parse("<urlset></urlset>").isEmpty)
    assert(Feed.parse("garbage").isEmpty)
  }

  test("DataFrame surface: malformed rows emit nothing") {
    val df = Seq(
      (1L, "<rss><channel><item><link>https://b.ex/1</link></item></channel></rss>"),
      (2L, "<rss><channel><item>"),
      (3L, null)).toDF("doc_id", "xml")
    val got = Feed.extract(df, "doc_id", "xml").select("id", "link")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "https://b.ex/1")))
  }
}
