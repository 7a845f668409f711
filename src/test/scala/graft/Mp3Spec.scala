package graft

import graft.ops.{Mp3, Multimodal}
import org.apache.spark.sql.functions._

/** MPEG-audio metadata rung: frame geometry pinned against the ISO
  * 11172-3 / 13818-3 formulas on hand-assembled fixtures the packer
  * never emits (Layer I with padding, MPEG-2 Layer III, VBR bitrate
  * switches, protected frames), CRC-16 pinned against an independent
  * bit-at-a-time implementation and verified refusal on corruption,
  * ID3v2 syncsafe skip incl. the footer flag, ID3v1 trailer, the
  * refusal ladder (free format, reserved fields, truncation, junk),
  * the packTextMp3 round-trip, and the decodeAudioMeta sniff
  * ladder's fourth rung.
  */
class Mp3Spec extends SparkSuite {
  import spark.implicits._

  // ---- independent fixture writer (no Mp3 production code) ----

  /** Bit-at-a-time CRC-16/IBM (poly 0x8005, init 0xFFFF, MSB-first)
    * — the independent mirror of [[Mp3.crc16]]. */
  private def slowCrc16(bytes: Seq[Int]): Int = {
    var c = 0xFFFF
    for (b <- bytes) {
      var k = 7
      while (k >= 0) {
        val bit = ((b >> k) & 1) ^ ((c >> 15) & 1)
        c = (c << 1) & 0xFFFF
        if (bit == 1) c ^= 0x8005
        k -= 1
      }
    }
    c
  }

  /** Hand-build one frame header + body of exactly `frameLen` bytes
    * (caller computes frameLen from the spec formula — that is the
    * point: fixtures encode the published geometry independently). */
  private def frame(verId: Int, layerId: Int, brIdx: Int, srIdx: Int,
      pad: Int, mode: Int, prot: Boolean, frameLen: Int,
      fill: Byte = 0x5A): Array[Byte] = {
    val out = Array.fill[Byte](frameLen)(fill)
    out(0) = 0xFF.toByte
    out(1) = (0xE0 | (verId << 3) | (layerId << 1) | (if (prot) 0 else 1)).toByte
    out(2) = ((brIdx << 4) | (srIdx << 2) | (pad << 1)).toByte
    out(3) = (mode << 6).toByte
    if (prot) {
      val mpeg1 = verId == 3
      val side = if (layerId == 1) { // Layer III
        if (mpeg1) { if (mode == 3) 17 else 32 }
        else { if (mode == 3) 9 else 17 }
      } else 0
      val crc = slowCrc16(Seq(out(2) & 0xFF, out(3) & 0xFF) ++
        (0 until side).map(i => out(6 + i) & 0xFF))
      out(4) = (crc >> 8).toByte
      out(5) = crc.toByte
    }
    out
  }

  // MPEG-1 Layer III, 128 kbps @ 44100, no padding: 144·128000/44100 = 417
  private def v1l3: Array[Byte] = frame(3, 1, 9, 0, 0, 0, prot = false, 417)

  test("MPEG-1 Layer III single frame: fields and duration") {
    val m = Mp3.parse(v1l3).get
    assert(m.version == "1" && m.layer == 3 && m.channels == 2)
    assert(m.sampleRate == 44100 && m.bitrateKbps == 128 && m.frames == 1)
    assert(m.durationMs == 1152L * 1000 / 44100) // 26 ms
  }

  test("Layer I frame length is slot-quantized: (12·br/sr + pad)·4") {
    // MPEG-1 Layer I 32 kbps @ 32000 with padding: (12+1)·4 = 52
    val f = frame(3, 3, 1, 2, 1, 3, prot = false, 52)
    val m = Mp3.parse(f).get
    assert(m.layer == 1 && m.channels == 1 && m.sampleRate == 32000)
    assert(m.frames == 1 && m.durationMs == 384L * 1000 / 32000)
  }

  test("MPEG-2 Layer III: 72-factor frame length and 576 samples") {
    // 64 kbps @ 16000: 72·64000/16000 = 288
    val f = frame(2, 1, 8, 2, 0, 3, prot = false, 288)
    val m = Mp3.parse(f).get
    assert(m.version == "2" && m.sampleRate == 16000 && m.channels == 1)
    assert(m.durationMs == 576L * 1000 / 16000) // 36 ms
  }

  test("MPEG-2.5 uses the low-rate table") {
    // 2.5 Layer III 8 kbps @ 8000: 72·8000/8000 = 72
    val f = frame(0, 1, 1, 2, 0, 3, prot = false, 72)
    val m = Mp3.parse(f).get
    assert(m.version == "2.5" && m.sampleRate == 8000 && m.bitrateKbps == 8)
  }

  test("VBR: bitrate varies across frames, duration sums per frame") {
    // 128 then 192 kbps @ 44100: 417 + ⌊144·192000/44100⌋ = 626 bytes
    val s = v1l3 ++ frame(3, 1, 11, 0, 0, 0, prot = false, 626)
    val m = Mp3.parse(s).get
    assert(m.frames == 2 && m.bitrateKbps == 128)
    assert(m.durationMs == 2L * 1152 * 1000 / 44100)
  }

  test("sample-rate switch mid-stream is refused") {
    // 128 kbps @ 48000: 144·128000/48000 = 384
    val s = v1l3 ++ frame(3, 1, 9, 1, 0, 0, prot = false, 384)
    assert(Mp3.parse(s).isEmpty)
  }

  test("protected Layer III frame: CRC verified, corruption refused") {
    val good = frame(3, 1, 9, 0, 0, 0, prot = true, 417)
    assert(Mp3.parse(good).map(_.frames).contains(1))
    val badSide = good.clone; badSide(20) = (badSide(20) ^ 1).toByte
    assert(Mp3.parse(badSide).isEmpty)
    val badCrc = good.clone; badCrc(4) = (badCrc(4) ^ 1).toByte
    assert(Mp3.parse(badCrc).isEmpty)
    // a data byte BEYOND the mono side-info span is not protected
    val mono = frame(3, 1, 9, 0, 0, 3, prot = true, 417)
    val tail = mono.clone; tail(6 + 17) = (tail(6 + 17) ^ 1).toByte
    assert(Mp3.parse(tail).map(_.channels).contains(1))
  }

  test("ID3v2 tag skips by syncsafe size, footer flag honored") {
    def tag(size: Int, footer: Boolean): Array[Byte] = {
      val hdr = Array[Byte]('I', 'D', '3', 4, 0,
        (if (footer) 0x10 else 0).toByte,
        ((size >> 21) & 0x7F).toByte, ((size >> 14) & 0x7F).toByte,
        ((size >> 7) & 0x7F).toByte, (size & 0x7F).toByte)
      hdr ++ Array.fill[Byte](size + (if (footer) 10 else 0))(0x41)
    }
    assert(Mp3.parse(tag(200, footer = false) ++ v1l3).map(_.frames).contains(1))
    assert(Mp3.parse(tag(200, footer = true) ++ v1l3).map(_.frames).contains(1))
    // syncsafe violation: a size byte with bit 7 set
    val bad = tag(200, footer = false) ++ v1l3
    bad(9) = 0x80.toByte
    assert(Mp3.parse(bad).isEmpty)
    // tag longer than the payload
    assert(Mp3.parse(tag(200, footer = false).take(50)).isEmpty)
  }

  test("ID3v1 trailer accepted; other trailing junk refused") {
    val v1 = Array[Byte]('T', 'A', 'G') ++ Array.fill[Byte](125)(0)
    assert(Mp3.parse(v1l3 ++ v1).map(_.frames).contains(1))
    assert(Mp3.parse(v1l3 :+ 0x00.toByte).isEmpty)
    assert(Mp3.parse(v1l3 ++ Array.fill[Byte](128)(0)).isEmpty)
  }

  test("refusal ladder: free format, forbidden fields, truncation, junk") {
    assert(Mp3.parse(Array[Byte]()).isEmpty)
    assert(Mp3.parse("not audio at all".getBytes("US-ASCII")).isEmpty)
    assert(Mp3.parse(frame(3, 1, 0, 0, 0, 0, prot = false, 417)).isEmpty)  // free
    assert(Mp3.parse(frame(3, 1, 15, 0, 0, 0, prot = false, 417)).isEmpty) // forbidden br
    assert(Mp3.parse(frame(3, 1, 9, 3, 0, 0, prot = false, 417)).isEmpty)  // reserved sr
    assert(Mp3.parse(frame(1, 1, 9, 0, 0, 0, prot = false, 417)).isEmpty)  // reserved ver
    assert(Mp3.parse(frame(3, 0, 9, 0, 0, 0, prot = false, 417)).isEmpty)  // reserved layer
    assert(Mp3.parse(v1l3.dropRight(1)).isEmpty)                           // truncated
    assert(Mp3.parse(v1l3.drop(1)).isEmpty)                                // lost sync
  }

  test("crc16 matches the bit-at-a-time mirror and the published catalog value") {
    // same parameter set as catalog entry CRC-16/CMS (poly 0x8005,
    // init 0xFFFF, unreflected, xorout 0): check("123456789") = 0xAEE7
    val check = "123456789".getBytes("US-ASCII")
    assert(Mp3.crc16(check, Seq((0, 9))) == 0xAEE7)
    assert(slowCrc16(check.map(_ & 0xFF)) == 0xAEE7)
    val data = "123456789abcdef".getBytes("US-ASCII")
    for (from <- Seq(0, 3); until <- Seq(5, 9, 15) if until > from) {
      assert(Mp3.crc16(data, Seq((from, until))) ==
        slowCrc16((from until until).map(data(_) & 0xFF)))
    }
    // split-span equals contiguous
    assert(Mp3.crc16(data, Seq((0, 4), (4, 9))) == Mp3.crc16(data, Seq((0, 9))))
  }

  test("packTextMp3 → Mp3.parse round-trip: geometry replayed from text length") {
    val docs = Seq((1L, "hello mpeg world"), (2L, ""), (3L, "x" * 5000),
      (4L, "abcd"), (5L, "y" * 417)).toDF("doc_id", "text")
    val metas = Multimodal.decodeAudioMeta(
      Multimodal.packTextMp3(docs, "doc_id", "text"), "id", "media")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), r.getInt(3), r.getInt(4), r.getLong(5))).toMap
    def expect(len: Int): (Long, String, Int, Int, Long) = {
      val rate = len % 3 match { case 0 => 32000; case 1 => 44100; case _ => 48000 }
      val fl = 144 * 128000 / rate
      val n = math.max(1, (len + fl - 7) / (fl - 6))
      val bytes = 10L + len % 7 + n.toLong * fl + (if (len % 5 == 0) 128 else 0)
      (bytes, "audio/mpeg", 1 + len % 2, rate, n.toLong * 1152 * 1000 / rate)
    }
    assert(metas(1L) == expect(16))
    assert(metas(2L) == expect(0))
    assert(metas(3L) == expect(5000))
    assert(metas(4L) == expect(4))
    assert(metas(5L) == expect(417))
  }

  test("decodeAudioMeta sniff ladder still resolves WAV before MPEG") {
    val docs = Seq((9L, "ladder check")).toDF("doc_id", "text")
    val wav = Multimodal.decodeAudioMeta(
      Multimodal.packTextWav(docs, "doc_id", "text"), "id", "media")
      .select("mime_detected").as[String].head()
    assert(wav == "audio/wav")
  }
}
