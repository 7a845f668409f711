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
