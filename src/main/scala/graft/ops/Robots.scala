package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt evaluation from RFC 9309 — the crawl-politeness gate a
  * corpus pipeline applies BEFORE fetching (frontier filtering) and
  * again when auditing an acquired crawl ("which of these documents
  * would a polite crawler have fetched under today's rules?").
  *
  * Contract (RFC 9309 §2.2, implemented exactly):
  *  - groups: consecutive `User-agent:` lines share the rule block
  *    that follows; rules before any user-agent line are ignored.
  *  - group selection (§2.2.1): case-insensitive EXACT product-token
  *    match; ALL matching groups merge into one rule set. No match →
  *    the `*` groups (merged); no `*` group → everything allowed.
  *  - rule choice (§2.2.2): the matching rule with the MOST OCTETS
  *    in its pattern wins; an allow and disallow of equal octets →
  *    allow. No matching rule → allowed. Empty patterns match
  *    nothing.
  *  - patterns (§2.2.3): `*` matches any run of characters including
  *    none; `$` at pattern end anchors the match to the path end
  *    (elsewhere it is literal). An unanchored pattern matches any
  *    path it prefixes.
  *  - unknown keys (Sitemap, Crawl-delay, …) and malformed lines are
  *    ignored; comments run from `#` to end of line; CR, LF and CRLF
  *    line breaks all accepted.
  *
  * Declared simplification: matching compares the raw path+query
  * string (UTF-8 octets); the RFC's percent-encoding normalization
  * of non-ASCII octets is not applied. ASCII rules — i.e. virtually
  * all real robots files — behave identically.
  *
  * Scale shape: [[rulesFor]] parses each robots body ONCE per host
  * on the (small) robots table and serializes the applicable rules
  * as an `array<string>` that rides the join; the per-URL work is
  * the codegen'd [[graft.expr.RobotsAllowed]] longest-match scan —
  * no per-row re-parse, no driver state. The join is a plain
  * host-equi-join Catalyst/AQE is free to broadcast when the robots
  * side is small.
  */
object Robots {

  /** One applicable rule, serialized "A<pattern>" / "D<pattern>". */
  type Rule = String

  /** Parse a robots.txt body and return the rules applicable to
    * `agent` (lowercase product token), per §2.2.1 group selection.
    * Never throws — hostile bytes degrade to "fewer rules". */
  def rulesFor(content: String, agent: String): Array[Rule] = {
    if (content == null) return Array.empty
    val want = agent.toLowerCase(java.util.Locale.ROOT)
    // group = (agents, rules); state machine over lines
    val groups = scala.collection.mutable.ArrayBuffer.empty[(scala.collection.mutable.ArrayBuffer[String], scala.collection.mutable.ArrayBuffer[Rule])]
    var collectingAgents = false
    for (raw <- content.split("\r\n|\r|\n", -1)) {
      val line = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!collectingAgents) {
              groups += ((scala.collection.mutable.ArrayBuffer.empty, scala.collection.mutable.ArrayBuffer.empty))
              collectingAgents = true
            }
            if (groups.nonEmpty && value.nonEmpty)
              groups.last._1 += value.toLowerCase(java.util.Locale.ROOT)
          case "allow" | "disallow" =>
            collectingAgents = false
            // rules before any user-agent line are ignored (§2.2.1);
            // empty patterns match nothing
            if (groups.nonEmpty && value.nonEmpty)
              groups.last._2 += (if (key == "allow") "A" else "D") + value
          case _ => collectingAgents = false // sitemap, crawl-delay, unknown
        }
      }
    }
    val exact = groups.filter(_._1.contains(want))
    val chosen = if (exact.nonEmpty) exact else groups.filter(_._1.contains("*"))
    chosen.flatMap(_._2).toArray
  }

  /** `Sitemap:` directive values, document order — the sitemaps.org
    * discovery hook robots.txt carries: the line is GROUP-INDEPENDENT
    * (the protocol says it may appear anywhere, regardless of
    * user-agent sections), its key case-insensitive, its value kept
    * verbatim (absolute-URL validation is [[Sitemap]]'s consumer
    * call). Same comment/line discipline as [[rulesFor]]; never
    * throws. */
  def sitemaps(content: String): Seq[String] = {
    if (content == null) return Seq.empty
    val out = Seq.newBuilder[String]
    for (raw <- content.split("\r\n|\r|\n", -1)) {
      val line = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }
      val colon = line.indexOf(':')
      if (colon > 0 &&
          line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT) == "sitemap") {
        val v = line.substring(colon + 1).trim
        if (v.nonEmpty) out += v
      }
    }
    out.result()
  }

  /** (… passthrough of `hostCol`, sitemap_url, seq) rows — one per
    * Sitemap directive of each robots body, the discovery feed into
    * the `sitemap_parse` fetch loop. Scan-local explode. */
  def sitemapUrls(robots: org.apache.spark.sql.DataFrame, hostCol: String,
      contentCol: String): org.apache.spark.sql.DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col(hostCol).cast("string"), col(contentCol).cast("string"))
      .as[(String, String)]
      .flatMap { case (host, content) =>
        sitemaps(content).zipWithIndex.map { case (u, i) => (host, i, u) }
      }
      .toDF(hostCol, "seq", "sitemap_url")
  }

  /** §2.2.3 pattern match: does `pat` (with `*` wildcards and an
    * optional trailing `$` anchor) match `path`? */
  def patternMatches(pat: String, path: String): Boolean = {
    val anchored = pat.nonEmpty && pat.charAt(pat.length - 1) == '$'
    val p0 = if (anchored) pat.substring(0, pat.length - 1) else pat
    val p = if (anchored) p0 else p0 + "*" // unanchored = prefix match
    // iterative glob with star backtracking
    var pi = 0; var si = 0; var star = -1; var mark = 0
    while (si < path.length) {
      if (pi < p.length && (p.charAt(pi) == path.charAt(si))) { pi += 1; si += 1 }
      else if (pi < p.length && p.charAt(pi) == '*') { star = pi; mark = si; pi += 1 }
      else if (star >= 0) { pi = star + 1; mark += 1; si = mark }
      else return false
    }
    while (pi < p.length && p.charAt(pi) == '*') pi += 1
    pi == p.length
  }

  /** §2.2.2 verdict: longest-octet matching rule wins, allow wins
    * ties, no match → allowed. */
  def allowed(rules: Array[Rule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < rules.length) {
      val r = rules(i)
      val pat = r.substring(1)
      if (patternMatches(pat, path)) {
        val len = pat.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
        if (len > bestLen) { bestLen = len; bestAllow = r.charAt(0) == 'A' }
        else if (len == bestLen && r.charAt(0) == 'A') bestAllow = true
      }
      i += 1
    }
    bestAllow
  }

  /** Path+query of a URL (the §2.2.2 match target), `/` when empty;
    * null for schemeless strings. Java∩RE2 so oracles can replay. */
  def pathOf(url: Column): Column = {
    val p = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/:?#]*(:[0-9]*)?([^#]*)", 2)
    when(DomainCap.hostOf(url).isNull, lit(null))
      .otherwise(when(p === "", lit("/")).otherwise(p))
  }

  /** Per-URL robots verdicts: join `urls` to the `robots` table
    * (host → robots.txt body) by host and evaluate. Hosts with no
    * robots row, schemeless rows, and null rules are ALLOWED (the
    * RFC's absent-file semantics). Appends `outCol` boolean. */
  def verdicts(urls: DataFrame, urlCol: String,
               robots: DataFrame, hostCol: String, contentCol: String,
               agent: String, outCol: String = "allowed"): DataFrame = {
    val rules = robots.select(
      lower(col(hostCol)).as("__r_host"),
      graft.expr.RobotsRules(col(contentCol), agent).as("__rules"))
    val out = urls
      .withColumn("__host", DomainCap.hostOf(col(urlCol)))
      .withColumn("__path", pathOf(col(urlCol)))
      .join(rules, col("__host") === col("__r_host"), "left")
      .withColumn(outCol,
        when(col("__rules").isNull || col("__path").isNull, lit(true))
          .otherwise(graft.expr.RobotsAllowed(col("__rules"), col("__path"))))
    out.drop("__host", "__path", "__r_host", "__rules")
  }

  /** Drop rows a polite `agent` may not fetch. */
  def filter(urls: DataFrame, urlCol: String,
             robots: DataFrame, hostCol: String, contentCol: String,
             agent: String): DataFrame = {
    val flagged = verdicts(urls, urlCol, robots, hostCol, contentCol, agent, "__robots_ok")
    flagged.filter(col("__robots_ok")).drop("__robots_ok")
  }
}
