package graft

import graft.ops.{FlacCodec, Multimodal, Ogg}
import org.apache.spark.sql.functions._

/** Ogg/Vorbis/Opus metadata rung: the page CRC pinned against an
  * independent bit-at-a-time implementation and the published
  * CRC-32/POSIX catalog value, parse pinned against hand-assembled
  * fixtures the synthesizer never emits (an Opus stream with
  * pre-skip, a Vorbis stream whose data spans several pages with a
  * granule-less middle page, minimal lacing layouts), hostile-byte
  * refusal incl. CRC corruption, the packTextOggVorbis round-trip,
  * and the decodeAudioMeta sniff ladder (WAV → FLAC → Ogg).
  */
class OggSpec extends SparkSuite {
  import spark.implicits._

  // ---- independent fixture writer (no Ogg packer code) ----

  private def le(v: Long, w: Int): Array[Byte] =
    (0 until w).map(k => ((v >> (8 * k)) & 0xFF).toByte).toArray

  /** Bit-at-a-time MSB-first CRC with the Ogg polynomial — the
    * independent mirror of the table-driven [[Ogg.pageCrc]]. */
  private def slowCrc(bytes: Array[Byte]): Int = {
    var crc = 0
    for (b <- bytes) {
      crc ^= (b & 0xFF) << 24
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80000000) != 0) (crc << 1) ^ 0x04C11DB7 else crc << 1
        k += 1
      }
    }
    crc
  }

  /** Hand-build one page: CRC from the INDEPENDENT slow
    * implementation, minimal lacing (one value per ≤255-byte run). */
  private def handPage(flags: Int, granule: Long, serial: Long, seq: Int,
      packets: Array[Byte]*): Array[Byte] = {
    val lacing = packets.flatMap { p =>
      val full = Array.fill[Byte](p.length / 255)(255.toByte)
      full :+ (p.length % 255).toByte
    }.toArray
    val head = "OggS".getBytes("US-ASCII") ++ Array[Byte](0, flags.toByte) ++
      le(granule, 8) ++ le(serial, 4) ++ le(seq.toLong, 4) ++ le(0L, 4) ++
      Array[Byte](lacing.length.toByte) ++ lacing
    val page = head ++ packets.flatten
    val crc = slowCrc(page)
    System.arraycopy(le(crc.toLong & 0xFFFFFFFFL, 4), 0, page, 22, 4)
    page
  }

  private def vorbisId(channels: Int, rate: Int): Array[Byte] =
    Array[Byte](0x01) ++ "vorbis".getBytes("US-ASCII") ++ le(0L, 4) ++
      Array[Byte](channels.toByte) ++ le(rate.toLong, 4) ++
      le(0L, 4) ++ le(0L, 4) ++ le(0L, 4) ++ Array[Byte](0xB8.toByte, 0x01)

  private def opusHead(channels: Int, preSkip: Int, rate: Int): Array[Byte] =
    "OpusHead".getBytes("US-ASCII") ++ Array[Byte](1, channels.toByte) ++
      le(preSkip.toLong, 2) ++ le(rate.toLong, 4) ++ le(0L, 2) ++ Array[Byte](0)

  test("pageCrc matches the independent bitwise CRC and the POSIX catalog value") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(0, 1, 27, 300)) {
      val b = Array.fill[Byte](n)(rnd.nextInt().toByte)
      assert(Ogg.pageCrc(b, 0, n, n + 8) == slowCrc(b))
    }
    // CRC-32/POSIX (cksum) is this exact config plus a final xor-out
    // of 0xFFFFFFFF; its published check value for "123456789" is
    // 0x765E7680, so the raw register must be its complement
    val check = "123456789".getBytes("US-ASCII")
    assert(Ogg.pageCrc(check, 0, check.length, 99) == ~0x765E7680)
    // the zeroFrom window must blank exactly 4 bytes
    val p = Array.fill[Byte](32)(0x5A)
    val zeroed = p.clone(); java.util.Arrays.fill(zeroed, 8, 12, 0.toByte)
    assert(Ogg.pageCrc(p, 0, 32, 8) == slowCrc(zeroed))
  }

  test("parse pins a hand-assembled multi-page Vorbis stream (granule-less middle page)") {
    val serial = 0xDEADBEEFL
    val id = handPage(0x02, 0L, serial, 0, vorbisId(2, 44100))
    // 300-byte packet spanning lacing values 255 + 45; page carries no
    // completed packet boundary semantics we rely on — granule −1
    // says "no packet ends here" and must NOT update the duration
    val mid = handPage(0x00, -1L, serial, 1, Array.fill[Byte](300)(7))
    val eos = handPage(0x04, 88200L, serial, 2, Array.fill[Byte](10)(9))
    val m = Ogg.parse(id ++ mid ++ eos).getOrElse(fail("parse declined hand Ogg"))
    assert(m.codec == "vorbis" && m.channels == 2 && m.sampleRate == 44100)
    assert(m.durationMs == 2000L) // 88200 samples / 44100 Hz
  }

  test("parse pins a hand-assembled Opus stream (pre-skip subtracted, 48 kHz granules)") {
    val id = handPage(0x02, 0L, 7L, 0, opusHead(2, 312, 44100))
    val eos = handPage(0x04, 48312L, 7L, 1, Array.fill[Byte](4)(1))
    val m = Ogg.parse(id ++ eos).getOrElse(fail("parse declined hand Opus"))
    assert(m.codec == "opus" && m.channels == 2 && m.sampleRate == 44100)
    assert(m.durationMs == 1000L) // (48312 − 312) / 48 000 s
  }

  test("refusals: garbage, corrupted CRC, non-BOS start, truncation, wrong id header") {
    val good = handPage(0x02, 0L, 1L, 0, vorbisId(1, 8000)) ++
      handPage(0x04, 8000L, 1L, 1, Array[Byte](1, 2, 3))
    assert(Ogg.parse(good).isDefined)
    assert(Ogg.parse(Array[Byte]()).isEmpty)
    assert(Ogg.parse("not an ogg stream at all".getBytes("US-ASCII")).isEmpty)
    // flip one payload byte: the page CRC must catch it
    val corrupt = good.clone(); corrupt(good.length - 2) = (corrupt(good.length - 2) ^ 1).toByte
    assert(Ogg.parse(corrupt).isEmpty)
    // first page without the BOS flag
    val nonBos = handPage(0x00, 0L, 1L, 0, vorbisId(1, 8000))
    assert(Ogg.parse(nonBos).isEmpty)
    // truncated mid-page (trailing bytes missing)
    assert(Ogg.parse(java.util.Arrays.copyOf(good, good.length - 1)).isEmpty)
    // BOS page whose first packet is neither id header
    val alien = handPage(0x02, 0L, 1L, 0, Array.fill[Byte](30)(0x41))
    assert(Ogg.parse(alien).isEmpty)
    // vorbis id with a nonzero version must be refused
    val badVer = vorbisId(1, 8000); badVer(7) = 1
    assert(Ogg.parse(handPage(0x02, 0L, 1L, 0, badVer)).isEmpty)
  }

  test("packTextOggVorbis round-trips through Ogg.parse with the declared arithmetic") {
    for (text <- Seq("", "x", "hello world", "α βγ δε" * 40, "z" * 600)) {
      val len = math.min(text.getBytes("UTF-8").length, 65025)
      val df = Seq((7L, text)).toDF("doc_id", "text")
      val payload = Multimodal.packTextOggVorbis(df, "doc_id", "text")
        .select(col("media.payload")).as[Array[Byte]].head()
      assert(payload.length == 86 + len + len / 255)
      val m = Ogg.parse(payload).getOrElse(fail(s"parse declined own packer (len=$len)"))
      assert(m.codec == "vorbis")
      assert(m.channels == 1 + len % 2)
      assert(m.sampleRate == 8000 * (1 + len % 3))
      assert(m.durationMs == len.toLong * 16 * 1000 / (8000 * (1 + len % 3)))
    }
  }

  test("decodeAudioMeta sniff ladder: WAV, FLAC STREAMINFO, Ogg, garbage in one frame") {
    val docs = Seq((1L, "wav doc"), (2L, "flac doc"), (3L, "ogg doc")).toDF("doc_id", "text")
    val wav = Multimodal.packTextWav(docs.filter($"doc_id" === 1), "doc_id", "text")
    val flac = Multimodal.packTextFlac(docs.filter($"doc_id" === 2), "doc_id", "text")
    val ogg = Multimodal.packTextOggVorbis(docs.filter($"doc_id" === 3), "doc_id", "text")
    val junk = Seq((4L, "junk!")).toDF("id", "txt")
      .select($"id", struct(
        encode($"txt", "UTF-8").as("payload"),
        lit("application/octet-stream").as("mime"),
        struct(lit(5L).as("byte_len"), lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"),
          lit(null).cast("long").as("duration_ms")).as("meta")).as("media"))
    val all = wav.unionByName(flac).unionByName(ogg).unionByName(junk)
    val out = Multimodal.decodeAudioMeta(all, "id", "media")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(2) == "audio/wav")
    assert(out(2L).getString(2) == "audio/flac")
    assert(out(2L).getInt(3) == 1 && out(2L).getInt(4) == 8000)
    // "flac doc" = 8 bytes → 8 samples at 8 kHz → 1 ms
    assert(out(2L).getLong(5) == 1L)
    assert(out(3L).getString(2) == "audio/ogg")
    assert(out(4L).isNullAt(2) && out(4L).isNullAt(3))
  }

  test("streamInfo agrees with the full decode header and refuses non-FLAC") {
    val clip = graft.ops.AudioPcm.Clip(1, 8000, 16,
      Array.tabulate(1000)(i => ((i * 37) % 256 - 128) * 256))
    val flac = FlacCodec.encode(clip)
    val (ch, rate, total) = FlacCodec.streamInfo(flac).getOrElse(fail("streamInfo declined"))
    assert(ch == 1 && rate == 8000 && total == 1000L)
    assert(FlacCodec.streamInfo("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    assert(FlacCodec.streamInfo(java.util.Arrays.copyOf(flac, 20)).isEmpty)
  }
}
