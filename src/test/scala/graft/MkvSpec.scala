package graft

import graft.ops.{Mkv, Multimodal}
import org.apache.spark.sql.functions._

/** From-spec EBML/Matroska walk: parse pinned against an INDEPENDENT
  * hand-assembled fixture (minimal-width vints, float32 duration,
  * unknown-size Segment, non-default timescale — none of which the
  * [[Multimodal.packTextMkv]] synthesizer emits), the synthesizer
  * round-trip with its constant-overhead contract, hostile-byte
  * refusal, and the distributed decodeVideoMeta dispatch.
  */
class MkvSpec extends SparkSuite {
  import spark.implicits._

  // ---- independent fixture writer (no Mkv/packTextMkv code) ----

  /** Hand-encode an element with the MINIMAL-width size vint — the
    * opposite choice from packTextMkv's fixed 8-byte width. */
  private def el(idBytes: Int*)(body: Array[Byte]): Array[Byte] = {
    val n = body.length
    val size: Array[Byte] =
      if (n < 0x7F) Array((0x80 | n).toByte) // 0x7F itself = all-ones = unknown
      else if (n < 0x3FFF) Array((0x40 | (n >> 8)).toByte, n.toByte)
      else Array((0x20 | (n >> 16)).toByte, (n >> 8).toByte, n.toByte)
    idBytes.map(_.toByte).toArray ++ size ++ body
  }
  private def be(v: Long, w: Int): Array[Byte] =
    (0 until w).map(k => ((v >> (8 * (w - 1 - k))) & 0xFF).toByte).toArray

  /** Minimal hand MKV: webm doctype, timescale 500 000 ns (0.5 ms per
    * unit), duration as FLOAT32, 640×360 video track, Segment with
    * UNKNOWN size (all-ones vint) running to end of stream. */
  private def handMkv(durUnits: Float): Array[Byte] = {
    val header = el(0x1A, 0x45, 0xDF, 0xA3)(
      el(0x42, 0x82)("webm".getBytes("US-ASCII")))
    val info = el(0x15, 0x49, 0xA9, 0x66)(
      el(0x2A, 0xD7, 0xB1)(be(500000L, 3)) ++
      el(0x44, 0x89)(be(java.lang.Float.floatToIntBits(durUnits).toLong & 0xFFFFFFFFL, 4)))
    val video = el(0xE0)(el(0xB0)(be(640, 2)) ++ el(0xBA)(be(360, 2)))
    val track = el(0xAE)(el(0x83)(be(1, 1)) ++ video)
    val tracks = el(0x16, 0x54, 0xAE, 0x6B)(track)
    // Segment with unknown size: id + 0xFF (all-ones 1-byte size vint)
    header ++ Array(0x18, 0x53, 0x80, 0x67, 0xFF).map(_.toByte) ++ info ++ tracks
  }

  test("parse pins an independently hand-assembled webm (minimal vints, f32, unknown size)") {
    val m = Mkv.parse(handMkv(4000f)).getOrElse(fail("parse declined hand MKV"))
    assert(m.docType == "webm")
    // 4000 units × 500 000 ns = 2 000 ms
    assert(m.durationMs == 2000L)
    assert(m.width.contains(640) && m.height.contains(360))
  }

  test("packTextMkv round-trips with the constant 268-byte overhead") {
    for (text <- Seq("", "x", "hello world", "α βγ δε" * 40)) {
      val len = text.getBytes("UTF-8").length
      val df = Seq((7L, text)).toDF("doc_id", "text")
      val row = Multimodal.packTextMkv(df, "doc_id", "text")
        .select(col("media.payload")).as[Array[Byte]].head()
      assert(row.length == 268 + len, s"overhead drifted for len=$len")
      val m = Mkv.parse(row).getOrElse(fail(s"parse declined packed MKV len=$len"))
      assert(m.docType == "matroska")
      assert(m.durationMs == len.toLong * 20)
      assert(m.width.contains(16 + (len * 3) % 640))
      assert(m.height.contains(16 + (len * 11) % 480))
    }
  }

  test("hostile bytes refuse cleanly, never throw") {
    val good = handMkv(100f)
    assert(Mkv.parse(Array.emptyByteArray).isEmpty)
    assert(Mkv.parse("nowhere near an mkv".getBytes).isEmpty)
    // every truncation refuses or returns (no throw)
    for (cut <- 1 until good.length) Mkv.parse(good.take(cut))
    // zero first byte = illegal vint width
    assert(Mkv.parse(Array[Byte](0, 0, 0, 0, 0, 0, 0, 0)).isEmpty)
    // deep nesting bomb: Video elements nested past the depth cap
    val bomb = (1 to 64).foldLeft(Array.emptyByteArray) { (acc, _) => el(0xE0)(acc) }
    assert(Mkv.parse(
      el(0x1A, 0x45, 0xDF, 0xA3)(el(0x42, 0x82)("matroska".getBytes)) ++
        el(0x18, 0x53, 0x80, 0x67)(bomb)).isEmpty)
    // declared child size exceeding the parent refuses
    val lying = el(0x1A, 0x45, 0xDF, 0xA3)(el(0x42, 0x82)("matroska".getBytes)) ++
      Array(0x18, 0x53, 0x80, 0x67, 0x85, 0x44, 0x89, 0xFF, 0xFF).map(_.toByte)
    assert(Mkv.parse(lying).isEmpty)
    // mutation fuzz: deterministic byte flips never throw
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val mut = good.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      Mkv.parse(mut)
    }
  }

  test("decodeVideoMeta dispatches MKV payloads alongside MP4/AVI") {
    val docs = Seq((1L, "alpha"), (2L, "the quick brown fox")).toDF("doc_id", "text")
    val out = Multimodal.decodeVideoMeta(
      Multimodal.packTextMkv(docs, "doc_id", "text"), "id", "media")
      .orderBy("id")
      .select("id", "mime_detected", "brand", "duration_ms", "width", "height")
      .as[(Long, String, String, Long, Int, Int)].collect()
    assert(out(0) == ((1L, "video/x-matroska", "matroska", 100L, 31, 71)))
    val len2 = "the quick brown fox".length
    assert(out(1) == ((2L, "video/x-matroska", "matroska", len2 * 20L,
      16 + len2 * 3 % 640, 16 + len2 * 11 % 480)))
  }
}
