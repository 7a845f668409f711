package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML link extraction + RFC 3986 reference resolution — the edge
  * producer of the crawl-curation chain: WARC pages → (page, link,
  * anchor) edges → [[PageRank]] host authority / frontier discovery.
  * Reference scope: the reference pipeline (`main.py`) has no HTML
  * layer; this op exists for the §2.5 crawl tier, where the link
  * graph IS the discovery and ranking signal.
  *
  * Resolution is the published RFC 3986 §5 algorithm, implemented
  * from the spec alone: the appendix-B component regex (which cannot
  * fail — every string parses to five optional components),
  * `remove_dot_segments` (§5.2.4) verbatim with its four rule
  * classes, path merge (§5.3), and strict mode (an absolute-form
  * reference keeps its own scheme even when it equals the base's —
  * the spec's recommended behavior for new schemes). The §5.4
  * normal AND abnormal worked examples are pinned verbatim in
  * LinksSpec.
  *
  * Extraction is a deterministic scan per document:
  *  - the FIRST `<base href>` element, if any, rebases every link
  *    (itself resolved against the document URL first, as HTML
  *    prescribes; applied to all links regardless of position —
  *    declared simplification of the browser's from-here-on rule);
  *  - every `<a … href>` attribute (double-/single-/un-quoted),
  *    entity-decoded (`&amp;` in query strings is the common case),
  *    ASCII-whitespace-trimmed, resolved against the effective base;
  *  - anchor text = the run to the matching `</a>`, inner tags
  *    stripped, entities decoded, whitespace collapsed;
  *  - only http/https results survive (scheme compare
  *    case-insensitive — `javascript:`/`mailto:`/`data:` drop), and
  *    the FRAGMENT is stripped from emitted links (link-graph
  *    convention: a fragment never reaches the server);
  *  - `seq` is the document-order index among kept links, making
  *    (id, seq) the stable edge key.
  *
  * Scale shape: one flatMap over (id, url, html) — scan-local,
  * rows-parallel, no shuffle, no driver surface; output ∝ links.
  * A per-document link cap (default 10k) guards degenerate crafted
  * pages, the same role as Ogg's page cap. Hostile bytes never
  * throw: unparseable documents or base URLs simply emit nothing.
  */
object Links {

  /** The five components of RFC 3986 appendix B. `None` ≠ empty
    * string throughout (an empty query `?` is Some("")) — the
    * distinction is load-bearing in resolution (§5.3). */
  final case class Uri(scheme: Option[String], authority: Option[String],
      path: String, query: Option[String], fragment: Option[String]) {
    /** Component recomposition, §5.3. */
    def recompose: String = {
      val sb = new StringBuilder
      scheme.foreach(s => sb.append(s).append(':'))
      authority.foreach(a => sb.append("//").append(a))
      sb.append(path)
      query.foreach(q => sb.append('?').append(q))
      fragment.foreach(f => sb.append('#').append(f))
      sb.toString
    }
  }

  private val UriRe =
    "^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\\?([^#]*))?(#(.*))?".r

  /** Appendix-B parse — total: every string yields a Uri. */
  def parseUri(s: String): Uri = {
    val m = UriRe.findFirstMatchIn(s).get // the regex matches any input
    Uri(Option(m.group(2)), Option(m.group(4)), Option(m.group(5)).getOrElse(""),
      Option(m.group(7)), Option(m.group(9)))
  }

  /** §5.2.4 remove_dot_segments, the four rule classes verbatim. */
  private[graft] def removeDotSegments(path: String): String = {
    var in = path
    val out = new StringBuilder
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../") || in == "/..") {
        in = if (in == "/..") "/" else "/" + in.substring(4)
        val cut = out.lastIndexOf("/")
        out.setLength(if (cut < 0) 0 else cut)
      }
      else if (in == "." || in == "..") in = ""
      else {
        // move the first segment (incl. its leading "/", excl. the next "/")
        val from = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', from)
        val until = if (next < 0) in.length else next
        out.append(in.substring(0, until))
        in = in.substring(until)
      }
    }
    out.toString
  }

  /** §5.3 merge: reference path onto base. */
  private def merge(base: Uri, refPath: String): String =
    if (base.authority.isDefined && base.path.isEmpty) "/" + refPath
    else {
      val cut = base.path.lastIndexOf('/')
      if (cut < 0) refPath else base.path.substring(0, cut + 1) + refPath
    }

  /** §5.3 transform-references, strict mode. None iff the base is
    * not absolute (no scheme). */
  def resolve(baseStr: String, refStr: String): Option[String] = {
    val base = parseUri(baseStr)
    if (base.scheme.isEmpty) return None
    val r = parseUri(refStr)
    val t =
      if (r.scheme.isDefined)
        Uri(r.scheme, r.authority, removeDotSegments(r.path), r.query, r.fragment)
      else if (r.authority.isDefined)
        Uri(base.scheme, r.authority, removeDotSegments(r.path), r.query, r.fragment)
      else if (r.path.isEmpty)
        Uri(base.scheme, base.authority, base.path,
          if (r.query.isDefined) r.query else base.query, r.fragment)
      else if (r.path.startsWith("/"))
        Uri(base.scheme, base.authority, removeDotSegments(r.path), r.query, r.fragment)
      else
        Uri(base.scheme, base.authority, removeDotSegments(merge(base, r.path)),
          r.query, r.fragment)
    Some(t.recompose)
  }

  // ---- extraction ----

  private val BaseRe = java.util.regex.Pattern.compile(
    "(?is)<base\\s[^>]*?href\\s*=\\s*(\"([^\"]*)\"|'([^']*)'|([^\\s>]+))")
  private val AnchorRe = java.util.regex.Pattern.compile(
    "(?is)<a\\s([^>]*)>(.*?)</a\\s*>")
  // Both attribute names anchor on a negative lookbehind for
  // word/hyphen chars: a plain \b would let data-href= / data-rel=
  // match on their suffix and shadow (or falsely supply) the real
  // attribute.
  private val HrefRe = java.util.regex.Pattern.compile(
    "(?is)(?<![\\w-])href\\s*=\\s*(\"([^\"]*)\"|'([^']*)'|([^\\s>]+))")
  private val RelRe = java.util.regex.Pattern.compile(
    "(?is)(?<![\\w-])rel\\s*=\\s*(\"([^\"]*)\"|'([^']*)'|([^\\s>]+))")

  private def attr(m: java.util.regex.Matcher, g0: Int): String = {
    val v = if (m.group(g0 + 1) != null) m.group(g0 + 1)
            else if (m.group(g0 + 2) != null) m.group(g0 + 2)
            else m.group(g0 + 3)
    decodeEntities(v).trim
  }

  /** The prose entities [[TextAnalysis.htmlExtract]] decodes, same
    * order (&amp; last so double-escapes single-decode). */
  private def decodeEntities(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&apos;", "'").replace("&nbsp;", " ")
      .replace("&amp;", "&")

  private def anchorText(inner: String): String =
    decodeEntities(inner.replaceAll("<[^>]*>", ""))
      .replaceAll("[ \\t\\r\\n]+", " ").trim

  /** Pure per-document extraction, exposed for the spec:
    * (href-resolved link sans fragment, anchor text, nofollow) in
    * document order, http/https only. `nofollow` is true when the
    * anchor's rel attribute CONTAINS the nofollow token (rel is a
    * space-separated list) — the signal link-graph consumers must
    * honor (a nofollow edge should not pass PageRank mass). */
  private[graft] def linksOf(docUrl: String, html: String,
      maxLinks: Int): Seq[(String, String, Boolean)] = {
    if (parseUri(docUrl).scheme.isEmpty) return Seq.empty
    val bm = BaseRe.matcher(html)
    val base = if (bm.find) resolve(docUrl, attr(bm, 1)).getOrElse(docUrl)
               else docUrl
    val out = Seq.newBuilder[(String, String, Boolean)]
    val m = AnchorRe.matcher(html)
    var n = 0
    while (n < maxLinks && m.find) {
      val attrs = m.group(1)
      val hm = HrefRe.matcher(attrs)
      if (hm.find) {
        val rel = {
          val rm = RelRe.matcher(attrs)
          if (rm.find) attr(rm, 1) else ""
        }
        // HTML space-separated-tokens splits on ALL five ASCII
        // whitespace chars, not just space/tab.
        val nofollow = rel.toLowerCase(java.util.Locale.ROOT)
          .split("[ \t\r\n\f]+").contains("nofollow")
        resolve(base, attr(hm, 1)).foreach { abs =>
          val u = parseUri(abs)
          if (u.scheme.exists(s => s.equalsIgnoreCase("http") ||
              s.equalsIgnoreCase("https"))) {
            out += ((u.copy(fragment = None).recompose, anchorText(m.group(2)),
              nofollow))
            n += 1
          }
        }
      }
    }
    out.result()
  }

  /** (id, link, anchor, seq, nofollow) rows — one per kept link,
    * document order, scan-local. */
  def extract(df: DataFrame, idCol: String, urlCol: String, htmlCol: String,
      maxLinksPerDoc: Int = 10000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      // coalesce marks the id non-nullable for the primitive-Long
      // tuple encoder (nullable sources — inline, csv — otherwise
      // fail analysis)
      .select(coalesce(col(idCol).cast("long"), lit(0L)), col(urlCol).cast("string"),
        coalesce(col(htmlCol).cast("string"), lit("")))
      .as[(Long, String, String)]
      .flatMap { case (id, url, html) =>
        if (url == null) Seq.empty
        else linksOf(url, html, maxLinksPerDoc).zipWithIndex.map {
          case ((link, anchor, nofollow), i) => (id, link, anchor, i, nofollow)
        }
      }
      .toDF("id", "link", "anchor", "seq", "nofollow")
  }
}
