package graft

import org.apache.spark.sql.functions._

import graft.ops._

/** Format sniffing against REAL artifacts from this repo's own
  * packers/encoders — the dispatcher must route every format its
  * full decoders speak — plus the refusal ladder. */
class SniffSpec extends SparkSuite {
  import spark.implicits._

  test("real artifacts from the repo's own writers sniff correctly") {
    val jpeg = JpegEncoder.encode(PngCodec.Image(8, 8, 1, new Array[Byte](64)))
    assert(Sniff.detect(jpeg) == "jpeg")
    val tar = Tar.tarOf(Seq(("a.txt", "x".getBytes)))
    assert(Sniff.detect(tar) == "tar")
    val zip = Zip.zipOf(Seq(("a.txt", "x".getBytes)))
    assert(Sniff.detect(zip) == "zip")
    val gz = GzipCodec.gzip("hello".getBytes)
    assert(Sniff.detect(gz) == "gzip")
    val zst = ZstdCodec.encode("hello".getBytes)
    assert(Sniff.detect(zst) == "zstd")
    // the WAV the segmentation packer emits
    val wav = AudioSegments.packSegmentsWav(Seq(1L).toDF("doc_id"), "doc_id")
      .select($"payload").as[Array[Byte]].collect().head
    assert(Sniff.detect(wav) == "wav")
  }

  test("RIFF siblings disambiguate on the form tag") {
    def riff(tag: String) = "RIFF".getBytes ++ new Array[Byte](4) ++ tag.getBytes
    assert(Sniff.detect(riff("WEBP")) == "webp")
    assert(Sniff.detect(riff("WAVE")) == "wav")
    assert(Sniff.detect(riff("AVI ")) == "avi")
    assert(Sniff.detect("RIFF".getBytes ++ new Array[Byte](4) ++ "XXXX".getBytes) != "wav")
  }

  test("text heuristic and the refusal ladder") {
    assert(Sniff.detect("plain prose, nothing special".getBytes) == "text")
    assert(Sniff.detect("with\nnewlines\tand tabs".getBytes) == "text")
    // NUL anywhere in the prefix: not text
    assert(Sniff.detect(("a" * 10 + "\u0000" + "b" * 10).getBytes) == "unknown")
    assert(Sniff.detect(Array[Byte](1, 2, 3, 4, 5)) == "unknown")
    assert(Sniff.detect(Array.emptyByteArray) == "unknown")
    assert(Sniff.detect(null) == "unknown")
    // high-bit-heavy binary junk is not text
    val junk = Array.tabulate[Byte](100)(i => (i % 7 - 3).toByte)
    assert(Sniff.detect(junk) == "unknown")
    // NUL-free printable-range binary that is NOT UTF-8 (stray
    // continuation bytes) — the headerless-compressed-data shape the
    // old printable-only heuristic mislabeled as text
    val fauxText = Array.tabulate[Byte](100)(i => (0xA0 + (i % 16)).toByte)
    assert(Sniff.detect(fauxText) == "unknown")
    // real multibyte UTF-8 is text: 2-, 3-, and 4-byte sequences
    assert(Sniff.detect("naïve café — 中文テスト 🎉 end".getBytes("UTF-8")) == "text")
    // a multibyte char truncated by the 512-byte WINDOW (not by the
    // payload) is tolerated at the edge
    val atEdge = ("a" * 511).getBytes("UTF-8") ++ "中more text".getBytes("UTF-8")
    assert(Sniff.detect(atEdge) == "text")
    // but truncated by the PAYLOAD itself: not UTF-8 text — it falls
    // to the latin1 fallback (two stray printable high bytes in a sea
    // of ASCII are indistinguishable from genuine accented latin1)
    val cut = "中文".getBytes("UTF-8").dropRight(1)
    assert(Sniff.detect(("a" * 20).getBytes ++ cut) == "text-latin1")
  }

  test("legacy single-byte text: the bounded text-latin1 fallback (round 14)") {
    // ISO-8859-1 / cp1252 accented prose — invalid as UTF-8, but the
    // real corpus shape the universal decoder must not refuse
    val fr = "Le café naïve coûte très cher, déjà vu."
    assert(Sniff.detect(fr.getBytes("ISO-8859-1")) == "text-latin1")
    // cp1252's curly-quote row (0x80–0x9F printables) is admitted
    val quoted = "he said “hello” — twice."
    assert(Sniff.detect(quoted.getBytes("windows-1252")) == "text-latin1")
    // the five cp1252 holes are junk markers, not text
    assert(Sniff.detect(("plain words here then ".getBytes("ISO-8859-1") :+
      0x81.toByte) ++ " more words".getBytes) == "unknown")
    // high-byte-dense printable junk stays refused (ratio wall)
    val dense = Array.tabulate[Byte](100)(i => (0xC0 + (i % 30)).toByte)
    assert(Sniff.detect(dense) == "unknown")
    // too short to call responsibly
    assert(Sniff.detect("café".getBytes("ISO-8859-1")) == "unknown")
    // and DecodeAny surfaces the decoded text through windows-1252
    val (chain, ok, text) = graft.ops.DecodeAny.decodeOne(fr.getBytes("ISO-8859-1"))
    assert(chain == List("text-latin1") && ok && text.contains(fr))
  }

  test("DataFrame seam counts by format") {
    val rows = Seq(
      (1L, "GIF89a...".getBytes),
      (2L, "%PDF-1.4".getBytes),
      (3L, "just text".getBytes)).toDF("doc_id", "payload")
    val got = Sniff.formats(rows, "doc_id", "payload")
      .select($"id", $"format").as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "gif"), (2L, "pdf"), (3L, "text")))
  }
}
