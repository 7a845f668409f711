package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Block-level boilerplate classification (jusText-lite) — the step
  * between "tag-stripped page text" and "training-quality prose":
  * [[TextAnalysis.htmlExtract]] flattens a page but keeps the nav
  * bars, footers, and link farms; corpus pipelines drop those by
  * BLOCK-level signals, the two classic ones being link density
  * (furniture is mostly anchor text) and block length (furniture is
  * short). Deterministic rules, declared:
  *
  *  - a page splits into blocks at block-level tag boundaries
  *    (p/div/li/h1-6/td/section/article/header/footer/nav/aside/
  *    ul/ol/table/blockquote/pre/br), after script/style/comment
  *    removal; empty blocks vanish;
  *  - per block: prose text (tag-strip, entity-decode, whitespace
  *    collapse), word count, and link_density = anchor-text chars /
  *    block-text chars;
  *  - class `bad` when link_density > 0.4 OR n_words < 4, else
  *    `good` (the jusText thresholds, minus its context smoothing —
  *    declared out of scope);
  *  - [[extract]] = the good blocks joined by newlines: the page's
  *    main content.
  *
  * Scale shape: scan-local per-document kernel, linear passes.
  */
object Boilerplate {

  private val BlockRe = java.util.regex.Pattern.compile(
    "(?i)</?(p|div|li|h[1-6]|td|section|article|header|footer|nav|aside|ul|ol|table|blockquote|pre)[^>]*>|<br[ \\t]*/?>")
  private val ScriptRe = java.util.regex.Pattern.compile("(?is)<script[^>]*>.*?</script>")
  private val StyleRe = java.util.regex.Pattern.compile("(?is)<style[^>]*>.*?</style>")
  private val CommentRe = java.util.regex.Pattern.compile("(?s)<!--.*?-->")
  // attribute-less <a> is common in furniture markup — the optional
  // attribute group (unlike the link EXTRACTOR, which needs an href)
  private val AnchorRe = java.util.regex.Pattern.compile("(?is)<a(?:\\s[^>]*)?>(.*?)</a\\s*>")

  private def decodeEntities(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&apos;", "'").replace("&nbsp;", " ")
      .replace("&amp;", "&")

  private def prose(raw: String): String =
    decodeEntities(raw.replaceAll("(?s)<[^>]*>", ""))
      .replaceAll("[ \\t\\r\\n]+", " ").trim

  final case class Block(idx: Int, text: String, nWords: Int, linkDensity: Double,
      good: Boolean)

  /** Pure per-document kernel, exposed for the spec. */
  private[graft] def blocksOf(html: String): Vector[Block] = {
    if (html == null) return Vector.empty
    val clean = CommentRe.matcher(
      StyleRe.matcher(
        ScriptRe.matcher(html).replaceAll(" ")).replaceAll(" ")).replaceAll(" ")
    val out = Vector.newBuilder[Block]
    var idx = 0
    BlockRe.split(clean).foreach { seg =>
      val text = prose(seg)
      if (text.nonEmpty) {
        val linkChars = {
          val m = AnchorRe.matcher(seg)
          var n = 0
          while (m.find()) n += prose(m.group(1)).length
          n
        }
        val nWords = text.split(" ").count(_.nonEmpty)
        val density = linkChars.toDouble / text.length
        out += Block(idx, text, nWords, density, density <= 0.4 && nWords >= 4)
        idx += 1
      }
    }
    out.result()
  }

  /** (id, block_idx, text, n_words, link_density, good) rows. */
  def blocks(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(htmlCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, html) =>
        blocksOf(html).map(b => (id, b.idx, b.text, b.nWords, b.linkDensity, b.good))
      })
      .toDF("id", "block_idx", "text", "n_words", "link_density", "good")
  }

  /** (id, text): the good blocks joined by newlines — the page's
    * main content. Pages with no good block yield an empty string
    * (kept, so the row set is stable for joins). */
  def extract(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(htmlCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, html) =>
        (id, blocksOf(html).filter(_.good).map(_.text).mkString("\n"))
      })
      .toDF("id", "text")
  }
}
