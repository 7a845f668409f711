package graft

import graft.ops.Subtitles
import org.apache.spark.sql.functions._

/** SRT/WebVTT parsing: timestamp forms, multi-line cues, markup
  * strip, NOTE/STYLE skip, cue settings, the refusal ladder, and
  * the DataFrame surface. */
class SubtitlesSpec extends SparkSuite {
  import spark.implicits._

  test("timestamps: both decimal marks, optional hours, bounds") {
    assert(Subtitles.timestampMs("01:02:03,456").contains(3723456L))
    assert(Subtitles.timestampMs("01:02:03.456").contains(3723456L))
    assert(Subtitles.timestampMs("02:03.456").contains(123456L)) // VTT short form
    assert(Subtitles.timestampMs("99:59:59,999").contains(359999999L))
    assert(Subtitles.timestampMs("00:61:00,000").isEmpty) // minutes > 59
    assert(Subtitles.timestampMs("00:00:00,12").isEmpty)  // 2-digit millis
    assert(Subtitles.timestampMs("garbage").isEmpty)
  }

  test("SRT: blocks, multi-line cue text, markup strip, entities") {
    val srt =
      """1
        |00:00:01,000 --> 00:00:02,500
        |<i>Hello</i> &amp; welcome
        |second line
        |
        |2
        |00:00:03,000 --> 00:00:04,000
        |plain
        |""".stripMargin
    val got = Subtitles.parse(srt).get
    assert(got == Seq(
      Subtitles.Cue(1000, 2500, "Hello & welcome\nsecond line"),
      Subtitles.Cue(3000, 4000, "plain")))
  }

  test("WebVTT: signature, NOTE/STYLE skip, cue ids, settings after timestamp") {
    val vtt =
      """WEBVTT - with a description
        |
        |NOTE
        |this comment spans
        |two lines
        |
        |STYLE
        |::cue { color: red }
        |
        |intro-cue
        |00:05.000 --> 00:07.000 align:start position:10%
        |<v Speaker>Hi there</v>
        |
        |00:08.000 --> 00:09.000
        |no id cue
        |""".stripMargin
    val got = Subtitles.parse(vtt).get
    assert(got == Seq(
      Subtitles.Cue(5000, 7000, "Hi there"),
      Subtitles.Cue(8000, 9000, "no id cue")))
  }

  test("refusals: malformed timing, SRT non-numeric index, null") {
    assert(Subtitles.parse("1\n00:00:01,000 -> 00:00:02,000\nx\n").isEmpty)
    assert(Subtitles.parse("abc\n00:00:01,000 --> 00:00:02,000\nx\n").isEmpty)
    assert(Subtitles.parse("no cues at all").isEmpty)
    assert(Subtitles.parse(null).isEmpty)
    assert(Subtitles.parse("").get.isEmpty) // empty file: zero cues
  }

  test("DataFrame surface: seq order, malformed rows emit nothing") {
    val df = Seq(
      (1L, "1\n00:00:01,000 --> 00:00:02,000\na\n\n2\n00:00:03,000 --> 00:00:04,000\nb\n"),
      (2L, "broken --> nothing")).toDF("doc_id", "text")
    val rows = Subtitles.extract(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(4)))
      .sortBy(t => (t._1, t._2))
    assert(rows.toSeq == Seq((1L, 0, 1000L, "a"), (1L, 1, 3000L, "b")))
  }
}
