package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** sitemaps.org protocol parser — the crawl-DISCOVERY op beside
  * [[Robots]] (politeness) and [[Links]] (in-page edges): sitemaps
  * are how sites declare their URL inventory to crawlers, and a
  * 100 TB crawl seeds its frontier from them. Reference scope: none
  * in `main.py`; §2.5 crawl tier.
  *
  * From the published protocol (sitemaps.org/protocol.html) on the
  * from-spec [[Xml]] parser:
  *  - a `<urlset>` document yields one row per `<url>` child:
  *    required `<loc>`, optional `<lastmod>` (kept verbatim — W3C
  *    datetime validation is the consumer's call, declared),
  *    `<changefreq>` (only the protocol's seven enum values survive;
  *    anything else nulls), `<priority>` (0.0–1.0; out-of-range or
  *    unparseable nulls — the protocol says consumers ignore
  *    invalid values);
  *  - a `<sitemapindex>` document yields one row per `<sitemap>`
  *    child (kind = "sitemap") with loc + lastmod — the recursion
  *    seam: feed those locs back through the fetch layer;
  *  - entries MISSING `<loc>` are skipped (it is the one required
  *    field); any other root local name refuses the document;
  *  - namespace prefixes are tolerated by matching LOCAL names (the
  *    protocol's own namespace is matched by convention, not
  *    resolved — [[Xml]]'s declared scope);
  *  - the protocol's LOCATION RULE is evaluated, not enforced: a
  *    sitemap at `/catalog/sitemap.xml` may only name URLs under
  *    `/catalog/` — `in_scope` carries the verdict (scheme+host
  *    case-insensitive, path prefix case-sensitive) so downstream
  *    decides, the robots-verdict pattern.
  *
  * Scale shape: one scan-local flatMap over (id, url, xml) rows —
  * no shuffle, no driver surface; malformed XML emits nothing
  * (never throws). Entry count per document is bounded by the XML
  * node cap.
  */
object Sitemap {

  final case class Entry(kind: String, loc: String, lastmod: Option[String],
      changefreq: Option[String], priority: Option[Double], inScope: Boolean)

  private val ChangefreqEnum = Set("always", "hourly", "daily", "weekly",
    "monthly", "yearly", "never")

  /** Directory scope of a sitemap URL: scheme+authority lowercased,
    * path cut after the last '/'. */
  private[graft] def scopePrefix(sitemapUrl: String): Option[String] = {
    val u = Links.parseUri(sitemapUrl)
    if (u.scheme.isEmpty || u.authority.isEmpty) return None
    val cut = u.path.lastIndexOf('/')
    val dir = if (cut < 0) "/" else u.path.substring(0, cut + 1)
    Some(u.scheme.get.toLowerCase + "://" + u.authority.get.toLowerCase + dir)
  }

  private def inScope(prefix: Option[String], loc: String): Boolean =
    prefix.exists { p =>
      val u = Links.parseUri(loc)
      if (u.scheme.isEmpty || u.authority.isEmpty) false
      else (u.scheme.get.toLowerCase + "://" + u.authority.get.toLowerCase +
        u.path + u.query.map("?" + _).getOrElse("")).startsWith(p)
    }

  /** Parse one sitemap document fetched from `sitemapUrl`. None when
    * the XML is malformed or the root is neither urlset nor
    * sitemapindex. */
  def parse(sitemapUrl: String, xml: String): Option[Seq[Entry]] = {
    val root = Xml.parse(xml) match { case Some(r) => r; case None => return None }
    val prefix = scopePrefix(sitemapUrl)
    def one(e: Xml.Elem, kind: String, withFreq: Boolean): Option[Entry] = {
      val loc = e.elems("loc").headOption.map(_.text.trim).filter(_.nonEmpty)
      loc.map { l =>
        val lastmod = e.elems("lastmod").headOption.map(_.text.trim).filter(_.nonEmpty)
        val freq =
          if (withFreq)
            e.elems("changefreq").headOption.map(_.text.trim.toLowerCase)
              .filter(ChangefreqEnum.contains)
          else None
        val prio =
          if (withFreq)
            e.elems("priority").headOption.flatMap { p =>
              try {
                val v = p.text.trim.toDouble
                if (v >= 0.0 && v <= 1.0) Some(v) else None
              } catch { case _: Exception => None }
            }
          else None
        Entry(kind, l, lastmod, freq, prio, inScope(prefix, l))
      }
    }
    root.local match {
      case "urlset" =>
        Some(root.elems("url").flatMap(one(_, "url", withFreq = true)))
      case "sitemapindex" =>
        Some(root.elems("sitemap").flatMap(one(_, "sitemap", withFreq = false)))
      case _ => None
    }
  }

  /** (id, seq, kind, loc, lastmod, changefreq, priority, in_scope)
    * rows — scan-local, malformed documents emit nothing. */
  def extract(df: DataFrame, idCol: String, urlCol: String,
      xmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      // coalesce marks the id non-nullable for the primitive-Long
      // tuple encoder (nullable sources otherwise fail analysis)
      .select(coalesce(col(idCol).cast("long"), lit(0L)), col(urlCol).cast("string"),
        coalesce(col(xmlCol).cast("string"), lit("")))
      .as[(Long, String, String)]
      .flatMap { case (id, url, xml) =>
        if (url == null) Seq.empty
        else parse(url, xml).getOrElse(Seq.empty).zipWithIndex.map {
          case (e, i) =>
            (id, i, e.kind, e.loc, e.lastmod, e.changefreq, e.priority, e.inScope)
        }
      }
      .toDF("id", "seq", "kind", "loc", "lastmod", "changefreq", "priority",
        "in_scope")
  }
}
