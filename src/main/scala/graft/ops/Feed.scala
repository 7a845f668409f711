package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RSS 2.0 / Atom feed parser on the from-spec [[Xml]] core — the
  * third crawl-discovery surface beside [[Sitemap]] (inventory) and
  * [[Links]] (in-page edges): feeds are how sites announce NEW
  * content, so an incremental crawl polls them between full sweeps.
  * Reference scope: none in `main.py`; §2.5 crawl tier.
  *
  * From the published formats alone:
  *  - RSS 2.0 (the rssboard spec): `<rss><channel>` with `<item>`
  *    children — title, `<link>` element text, `<pubDate>` verbatim
  *    (RFC 822 dates are the consumer's parse, the [[Sitemap]]
  *    lastmod stance), `<guid>` as the entry id with its
  *    `isPermaLink` default-true convention surfaced as a link
  *    fallback when `<link>` is absent;
  *  - Atom (RFC 4287): `<feed>` with `<entry>` children — title,
  *    the `<link href>` ATTRIBUTE with the spec's rel rule (a link
  *    without `rel` IS an alternate link, §4.2.7.2 — prefer
  *    rel="alternate", then rel-less, never enclosure/self), `<id>`,
  *    `<published>` preferred over the required `<updated>`;
  *  - either root is recognized by LOCAL name (feeds in the wild mix
  *    namespace prefixes freely); anything else refuses.
  *
  * Entries missing BOTH a link and an id carry no crawlable or
  * dedupable identity and are skipped (declared). Titles/summaries
  * are whitespace-collapsed; links are kept byte-faithful (resolve /
  * normalize downstream with [[Links]] / url_normalize — feeds may
  * carry relative URLs against xml:base, which is declared out of
  * scope and left verbatim).
  *
  * Scale shape: one scan-local flatMap over (id, xml); malformed
  * documents emit nothing; never throws.
  */
object Feed {

  final case class Entry(format: String, title: Option[String],
      link: Option[String], entryId: Option[String], published: Option[String],
      summary: Option[String])

  private def collapse(s: String): Option[String] = {
    val t = s.replaceAll("[ \\t\\r\\n]+", " ").trim
    if (t.isEmpty) None else Some(t)
  }

  private def childText(e: Xml.Elem, local: String): Option[String] =
    e.elems(local).headOption.flatMap(c => collapse(c.text))

  private def rssItem(it: Xml.Elem): Option[Entry] = {
    val guidEl = it.elems("guid").headOption
    val guid = guidEl.flatMap(g => collapse(g.text))
    // isPermaLink defaults to true: a permalink guid IS a URL
    val guidIsLink = guidEl.forall(g =>
      !g.attr("isPermaLink").exists(_.equalsIgnoreCase("false")))
    val link = childText(it, "link").orElse(if (guidIsLink) guid else None)
    if (link.isEmpty && guid.isEmpty) None
    else Some(Entry("rss", childText(it, "title"), link, guid,
      childText(it, "pubDate"), childText(it, "description")))
  }

  private def atomEntry(en: Xml.Elem): Option[Entry] = {
    val links = en.elems("link")
    val link = links.find(_.attr("rel").contains("alternate"))
      .orElse(links.find(_.attr("rel").isEmpty)) // §4.2.7.2: no rel = alternate
      .flatMap(_.attr("href")).flatMap(collapse)
    val eid = childText(en, "id")
    if (link.isEmpty && eid.isEmpty) None
    else Some(Entry("atom", childText(en, "title"), link, eid,
      childText(en, "published").orElse(childText(en, "updated")),
      childText(en, "summary").orElse(childText(en, "content"))))
  }

  /** Parse one feed document. None when the XML is malformed or the
    * root is neither rss nor feed. */
  def parse(xml: String): Option[Seq[Entry]] = {
    val root = Xml.parse(xml) match { case Some(r) => r; case None => return None }
    root.local match {
      case "rss" =>
        Some(root.elems("channel").flatMap(_.elems("item")).flatMap(rssItem))
      case "feed" =>
        Some(root.elems("entry").flatMap(atomEntry))
      case _ => None
    }
  }

  /** (id, seq, format, title, link, entry_id, published, summary)
    * rows — scan-local, malformed documents emit nothing. */
  def extract(df: DataFrame, idCol: String, xmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      // coalesce marks the id non-nullable for the primitive-Long
      // tuple encoder (nullable sources otherwise fail analysis)
      .select(coalesce(col(idCol).cast("long"), lit(0L)),
        coalesce(col(xmlCol).cast("string"), lit("")))
      .as[(Long, String)]
      .flatMap { case (id, xml) =>
        parse(xml).getOrElse(Seq.empty).zipWithIndex.map { case (e, i) =>
          (id, i, e.format, e.title, e.link, e.entryId, e.published, e.summary)
        }
      }
      .toDF("id", "seq", "format", "title", "link", "entry_id", "published",
        "summary")
  }
}
