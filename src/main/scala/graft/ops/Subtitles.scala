package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SRT / WebVTT subtitle parsing — the spoken-text rung of the
  * document tier (subtitle corpora: OpenSubtitles-style dumps,
  * caption tracks alongside the video ladder): timed cues whose text
  * is training prose once the markup is stripped.
  *
  * From the published formats alone:
  *  - SRT: blank-line-separated blocks — numeric index line, a
  *    `HH:MM:SS,mmm --> HH:MM:SS,mmm` timing line (COMMA decimal
  *    mark), then text lines. The index is consumed but the emitted
  *    `seq` is positional (real files renumber badly);
  *  - WebVTT: the `WEBVTT` signature line, then cue blocks — an
  *    optional cue-identifier line, `HH:MM:SS.mmm --> HH:MM:SS.mmm`
  *    (DOT decimal; the hours field optional: `MM:SS.mmm`), cue
  *    settings after the arrow timestamp ignored; `NOTE`, `STYLE`
  *    and `REGION` blocks skipped whole;
  *  - cue text: inline tags (`<i>`, `<c.class>`, `<v Name>`)
  *    stripped, the prose entity set decoded (&amp; last — the
  *    [[graft.ops.TextAnalysis.htmlExtract]] order), multi-line cue
  *    text joined by newline.
  *
  * A malformed timing line refuses the whole payload (framing
  * violation — the codec stance), never throws. Output long format:
  * (seq, start_ms, end_ms, text).
  */
object Subtitles {

  final case class Cue(startMs: Long, endMs: Long, text: String)

  /** `HH:MM:SS,mmm` / `HH:MM:SS.mmm` / `MM:SS.mmm` → ms. */
  private[graft] def timestampMs(s: String): Option[Long] = {
    val t = s.trim
    val parts = t.split(":")
    if (parts.length < 2 || parts.length > 3) return None
    val secMil = parts.last.split("[.,]")
    if (secMil.length != 2) return None
    try {
      val (h, m) =
        if (parts.length == 3) (parts(0).trim.toLong, parts(1).toLong)
        else (0L, parts(0).trim.toLong)
      val sec = secMil(0).toLong
      val mil = secMil(1).toLong
      if (m > 59 || sec > 59 || secMil(1).length != 3) None
      else Some(((h * 60 + m) * 60 + sec) * 1000 + mil)
    } catch { case _: Exception => None }
  }

  private def stripMarkup(s: String): String = {
    val noTags = s.replaceAll("<[^>]*>", "")
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (from, to)) => acc.replace(from, to) }
  }

  private def parseTiming(line: String): Option[(Long, Long)] = {
    val arrow = line.indexOf("-->")
    if (arrow < 0) return None
    val start = timestampMs(line.substring(0, arrow))
    // cue settings may follow the end timestamp (VTT) — first token only
    val rest = line.substring(arrow + 3).trim
    val endTok = rest.split("[ \t]")(0)
    val end = timestampMs(endTok)
    for (s <- start; e <- end) yield (s, e)
  }

  /** Parse one subtitle payload; format auto-detected by the WEBVTT
    * signature. None on any framing violation. */
  def parse(content: String): Option[Seq[Cue]] = {
    if (content == null) return None
    val lines = content.split("\r\n|\r|\n", -1)
    val isVtt = lines.headOption.exists(_.stripPrefix("﻿").startsWith("WEBVTT"))
    val out = Seq.newBuilder[Cue]
    var i = if (isVtt) 1 else 0
    while (i < lines.length) {
      // skip blank separators
      while (i < lines.length && lines(i).trim.isEmpty) i += 1
      if (i < lines.length) {
        val head = lines(i).trim
        if (isVtt && (head.startsWith("NOTE") || head == "STYLE" || head == "REGION")) {
          // skip the whole block
          while (i < lines.length && lines(i).trim.nonEmpty) i += 1
        } else {
          // optional identifier/index line before the timing line
          val timingAt =
            if (head.contains("-->")) i
            else if (i + 1 < lines.length && lines(i + 1).contains("-->")) i + 1
            else return None
          if (!isVtt && timingAt == i + 1 && !head.forall(_.isDigit)) return None
          val (s, e) = parseTiming(lines(timingAt)) match {
            case Some(t) => t
            case None => return None
          }
          var j = timingAt + 1
          val text = new StringBuilder
          while (j < lines.length && lines(j).trim.nonEmpty) {
            if (text.nonEmpty) text.append('\n')
            text.append(stripMarkup(lines(j)))
            j += 1
          }
          out += Cue(s, e, text.toString)
          i = j
        }
      }
    }
    Some(out.result())
  }

  /** (id, seq, start_ms, end_ms, text) rows from a subtitle TEXT
    * column — scan-local, malformed payloads emit nothing. */
  def extract(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)),
        coalesce(col(textCol).cast("string"), lit("")))
      .as[(Long, String)]
      .flatMap { case (id, content) =>
        parse(content).getOrElse(Seq.empty).zipWithIndex.map { case (c, i) =>
          (id, i, c.startMs, c.endMs, c.text)
        }
      }
      .toDF("id", "seq", "start_ms", "end_ms", "text")
  }
}
