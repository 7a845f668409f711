package graft.ops

/** Ogg container metadata parser (RFC 3533) with Vorbis I and Opus
  * (RFC 7845) identification headers — the streamed-audio container
  * rung beside the RIFF/WAVE chunk walk and FLAC's STREAMINFO in
  * [[Multimodal.decodeAudioMeta]]. Reference scope: the reference
  * pipeline has no media layer at all (`main.py` is text-only); this
  * rung exists for the §2.6 multimodal tier, where curation filters
  * on (codec, channels, rate, duration) before any expensive decode.
  *
  * What is parsed, from the public specs alone:
  *  - the Ogg page sequence: capture pattern `OggS`, version 0,
  *    header-type flags (0x02 = beginning-of-stream), 64-bit
  *    little-endian granule position, serial, page sequence, CRC,
  *    segment count + lacing table (RFC 3533 §6). Every page's CRC
  *    is VERIFIED (CRC-32, polynomial 0x04C11DB7, unreflected,
  *    init 0, xorout 0 — RFC 3533 appendix A) before any field is
  *    trusted, the same refuse-on-corruption stance as FLAC's
  *    frame CRC-16.
  *  - the first packet of the beginning-of-stream page:
  *    `\x01vorbis` identification header (Vorbis I §4.2.2 —
  *    version 0, channel count, sample rate, the framing bit) or
  *    `OpusHead` (RFC 7845 §5.1 — version 1, channel count,
  *    pre-skip, input sample rate).
  *  - the stream's final granule position: for Vorbis the granule
  *    is the absolute PCM sample count (Vorbis-over-Ogg mapping),
  *    for Opus it counts 48 kHz samples including the pre-skip that
  *    the duration must subtract (RFC 7845 §4).
  *
  * Packet DATA: Vorbis streams decode fully through the from-spec
  * [[Vorbis]] decoder (round 14 — codebooks, floor1, residues,
  * IMDCT); this parser stays the cheap metadata rung curation runs
  * at scan speed before any sample decode.
  *
  * OPUS SAMPLE DECODE — DECLARED REFUSAL (the MP3 adjudication,
  * applied): RFC 6716 defines the decoder NORMATIVELY BY ITS
  * REFERENCE SOURCE — §1 states that when the included code and the
  * prose disagree, "the code takes precedence", and Appendix A
  * carries that implementation as a base64 tarball the RFC text
  * cannot substitute for. Both sub-codecs hard-depend on large
  * static spec DATA with no closed form: SILK's LSF/LTP/excitation
  * codebooks and PDF tables (RFC 6716 §4.2, tens of KB across
  * dozens of tables) and CELT's band allocation, PVQ spreading,
  * and static probability tables (§4.3) — several times MP3's
  * ~6 KB. This environment has no libopus and the JDK ships no
  * Opus decoder, so there is NO independent encoder/decoder to pin
  * fixtures against: a decoder built on re-typed tables would
  * round-trip its own fixtures while silently corrupting real
  * files — the exact wrong-data failure the refuse-don't-guess
  * contract exists to prevent. OpusHead/OpusTags metadata (the
  * curation surface) parses fully; packet decode refuses by
  * construction (no decode path exists to mis-serve).
  *
  * Hostile-bytes contract as everywhere in this package: never
  * throws — bounds-checked reads, Long cursors, a page-count cap —
  * and returns None rather than guessing.
  */
object Ogg {

  /** codec ∈ {"vorbis", "opus"}; durationMs derives from the final
    * granule position of the identified logical stream. */
  final case class Meta(codec: String, channels: Int, sampleRate: Int,
      durationMs: Long)

  /** Pages are ≥ 27 bytes; a corpus payload capped at ~1 MiB holds
    * < 40k pages. The cap only guards degenerate crafted streams. */
  private val MaxPages = 1 << 20

  /** CRC-32 lookup table for the Ogg polynomial 0x04C11DB7,
    * MSB-first (unreflected), per RFC 3533 appendix A. */
  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var k = 0
      while (k < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04C11DB7 else r << 1
        k += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  /** CRC over `p[from, until)` with the bytes at `[zeroFrom,
    * zeroFrom+4)` treated as zero — the page CRC is computed with its
    * own field zeroed (RFC 3533 §6), and substituting instead of
    * copying keeps the check allocation-free. */
  private[graft] def pageCrc(p: Array[Byte], from: Int, until: Int,
      zeroFrom: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      val b = if (i >= zeroFrom && i < zeroFrom + 4) 0 else p(i) & 0xFF
      crc = (crc << 8) ^ CrcTable(((crc >>> 24) ^ b) & 0xFF)
      i += 1
    }
    crc
  }

  def parse(p: Array[Byte]): Option[Meta] = {
    def u8(i: Int): Int = p(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)
    def le64(i: Int): Long = le32(i) | (le32(i + 4) << 32)

    if (p.length < 27 + 1) return None
    var pos = 0L
    var pages = 0
    var serial = 0L        // the logical stream we identified (BOS page)
    var haveId = false
    var codec: String = null
    var channels = 0; var rate = 0; var preSkip = 0
    var granule = -1L      // last non-(-1) granule seen for `serial`

    while (pos + 27 <= p.length && pages < MaxPages) {
      val at = pos.toInt // safe: pos + 27 <= p.length <= Int.MaxValue
      if (u8(at) != 'O' || u8(at + 1) != 'g' || u8(at + 2) != 'g' ||
          u8(at + 3) != 'S') return None
      if (u8(at + 4) != 0) return None // stream_structure_version
      val flags = u8(at + 5)
      val gran = le64(at + 6)
      val ser = le32(at + 14)
      val nSegs = u8(at + 26)
      if (at + 27 + nSegs > p.length) return None
      var dataLen = 0
      var s = 0
      while (s < nSegs) { dataLen += u8(at + 27 + s); s += 1 }
      val body = at + 27 + nSegs
      if (body + dataLen > p.length) return None
      val crcStored = le32(at + 22).toInt
      if (pageCrc(p, at, body + dataLen, at + 22) != crcStored) return None

      if (pages == 0) {
        // the physical stream must open with a beginning-of-stream page
        if ((flags & 0x02) == 0) return None
        serial = ser
        // first packet = first lacing run; the id headers below fit in
        // one segment, so inspecting the first segment's bytes suffices
        val seg0 = if (nSegs > 0) u8(at + 27) else 0
        if (seg0 >= 30 && u8(body) == 0x01 && u8(body + 1) == 'v' &&
            u8(body + 2) == 'o' && u8(body + 3) == 'r' && u8(body + 4) == 'b' &&
            u8(body + 5) == 'i' && u8(body + 6) == 's') {
          // Vorbis I identification header (§4.2.2)
          if (le32(body + 7) != 0L) return None // vorbis_version
          channels = u8(body + 11)
          rate = le32(body + 12).toInt
          // [16,28): bitrate max/nominal/min; [28]: blocksize nibbles
          if ((u8(body + 29) & 0x01) != 1) return None // framing bit
          if (channels < 1 || rate <= 0) return None
          codec = "vorbis"; haveId = true
        } else if (seg0 >= 19 && u8(body) == 'O' && u8(body + 1) == 'p' &&
            u8(body + 2) == 'u' && u8(body + 3) == 's' && u8(body + 4) == 'H' &&
            u8(body + 5) == 'e' && u8(body + 6) == 'a' && u8(body + 7) == 'd') {
          // OpusHead (RFC 7845 §5.1); major version must be 0
          if ((u8(body + 8) >> 4) != 0) return None
          channels = u8(body + 9)
          preSkip = le16(body + 10)
          rate = le32(body + 12).toInt // informational input rate
          if (channels < 1) return None
          codec = "opus"; haveId = true
        } else return None
      }
      // granule −1 marks a page with no packet ending on it
      if (ser == serial && gran != -1L) granule = gran
      pos = (body + dataLen).toLong
      pages += 1
    }
    if (!haveId || pos != p.length) return None
    val durMs = codec match {
      case "vorbis" =>
        if (granule < 0) 0L else granule * 1000L / rate
      case "opus" =>
        // granule counts 48 kHz samples and includes the pre-skip
        val samples = math.max(0L, (if (granule < 0) 0L else granule) - preSkip)
        samples * 1000L / 48000L
    }
    // Opus: the id header's rate is the informational ORIGINAL input
    // rate (may legitimately be 0 = unknown, RFC 7845 §5.1); the
    // decode rate is always 48 kHz and duration already uses it.
    Some(Meta(codec, channels, rate, durMs))
  }
}
