package graft.ops

/** MPEG audio (MP3-family) frame-sequence metadata parser — the
  * frame-stream rung beside the RIFF/WAVE chunk walk, FLAC's
  * STREAMINFO and the Ogg page walk in [[Multimodal.decodeAudioMeta]].
  * Reference scope: the reference pipeline has no media layer at all
  * (`main.py` is text-only); this rung exists for the §2.6 multimodal
  * tier — MP3 is the single most common audio wire format in scraped
  * corpora, and curation filters on (version, layer, channels, rate,
  * duration) before any expensive decode.
  *
  * What is parsed, from the public specs alone (ISO/IEC 11172-3 §2.4
  * for MPEG-1, ISO/IEC 13818-3 for MPEG-2, plus the de-facto
  * "MPEG 2.5" low-rate extension):
  *  - an optional leading ID3v2 tag: `ID3` + version + flags +
  *    28-bit SYNCSAFE size (7 bits per byte — the format's trick to
  *    keep the size field free of false sync bytes), skipped as
  *    opaque metadata, footer honored via flag 0x10;
  *  - the frame header sequence: 11-bit sync, version id, layer,
  *    protection bit, bitrate index (table per version×layer),
  *    sample-rate index, padding bit, channel mode. Frame length and
  *    samples-per-frame follow the spec formulas — Layer I
  *    `(12·br/sr + pad)·4` slots of 4 bytes / 384 samples, Layer II
  *    `144·br/sr + pad` / 1152, Layer III `144·br/sr + pad` / 1152
  *    for MPEG-1 and `72·br/sr + pad` / 576 for MPEG-2/2.5;
  *  - when the protection bit announces a CRC, the 16-bit checksum
  *    (CRC-16/IBM polynomial 0x8005, init 0xFFFF, MSB-first — ISO
  *    11172-3 §2.4.3.1) is VERIFIED for Layer III over the protected
  *    span (the last two header bytes + the side-info bytes: 17/32
  *    for MPEG-1 mono/stereo, 9/17 for MPEG-2/2.5 — §2.4.1.4), the
  *    same refuse-on-corruption stance as FLAC's frame CRC-16 and
  *    Ogg's page CRC. Layers I/II protect a bit-allocation-dependent
  *    bit span; their CRC bytes are consumed but not verified
  *    (declared — Layer III is what MP3 files actually are);
  *  - an optional trailing 128-byte ID3v1 `TAG` block.
  *
  * Deliberate strictness (declared): free-format bitrate (index 0)
  * is refused — its frame length is only discoverable by scanning
  * for the next sync, a guessing game this package's never-guess
  * contract rules out; version/layer/sample-rate/channel-mode must
  * stay constant across frames (bitrate may vary — real VBR varies
  * ONLY bitrate and padding); the byte stream must be exactly
  * ID3v2? + frames+ + ID3v1? with no junk before, between, or after.
  *
  * Frame DATA (Huffman-coded spectral values) is deliberately out of
  * scope, and the boundary is PRECISE (round 15): the decode
  * pipeline's MATH is all derivable from published formulas (the
  * [[Vorbis]] round proved requantize/IMDCT/windowing feasible
  * from-spec), but Layer III hard-depends on ~6 KB of static spec
  * DATA — the 34 spectral Huffman tables (ISO 11172-3 Table B.7)
  * and the 512-tap synthesis window (Table B.3) — that have no
  * closed form and are not reproducible from memory of the spec
  * text. Unlike Vorbis, whose codebooks travel IN the stream, a
  * Layer III decoder built on invented tables would round-trip its
  * own fixtures while silently corrupting every real file — the
  * exact failure mode the refuse-don't-guess contract exists to
  * prevent. Samples therefore refuse; metadata is what curation
  * filters on at scan speed anyway.
  *
  * Hostile-bytes contract as everywhere in this package: never
  * throws — bounds-checked reads, a frame-count cap — and returns
  * None rather than guessing.
  */
object Mp3 {

  /** version ∈ {"1", "2", "2.5"}; `bitrateKbps` is the first frame's
    * (VBR streams vary it; duration already sums per-frame sample
    * counts so it is exact either way). */
  final case class Meta(version: String, layer: Int, channels: Int,
      sampleRate: Int, bitrateKbps: Int, frames: Int, durationMs: Long)

  /** Frames are ≥ 24 bytes (smallest legal MPEG-2.5 Layer III frame);
    * a corpus payload capped at ~1 MiB holds < 44k frames. The cap
    * only guards degenerate crafted streams. */
  private val MaxFrames = 1 << 20

  /** Bitrate tables in kbps, indexed [1..14] (0 = free format —
    * refused; 15 = forbidden). ISO 11172-3 §2.4.2.3 / 13818-3. */
  private val BitrateV1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val BitrateV1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val BitrateV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BitrateV2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val BitrateV2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  /** Sample-rate tables indexed by the 2-bit field (3 = reserved). */
  private val RateV1 = Array(44100, 48000, 32000)
  private val RateV2 = Array(22050, 24000, 16000)
  private val RateV25 = Array(11025, 12000, 8000)

  /** CRC-16 with polynomial 0x8005, init 0xFFFF, MSB-first,
    * unreflected, no xorout (ISO 11172-3 §2.4.3.1). Spans are
    * (from, until) pairs so the non-contiguous protected bytes
    * (header tail + side info) check allocation-free. */
  private[graft] def crc16(p: Array[Byte], spans: Seq[(Int, Int)]): Int = {
    var c = 0xFFFF
    spans.foreach { case (from, until) =>
      var i = from
      while (i < until) {
        c ^= (p(i) & 0xFF) << 8
        var k = 0
        while (k < 8) {
          c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xFFFF else (c << 1) & 0xFFFF
          k += 1
        }
        i += 1
      }
    }
    c
  }

  /** Layer III side-info byte count (ISO 11172-3 §2.4.1.4 /
    * 13818-3) — the CRC-protected span beyond the header. */
  private def sideInfoLen(mpeg1: Boolean, mono: Boolean): Int =
    if (mpeg1) { if (mono) 17 else 32 } else { if (mono) 9 else 17 }

  def parse(p: Array[Byte]): Option[Meta] = {
    def u8(i: Int): Int = p(i) & 0xFF
    var pos = 0
    // ---- optional ID3v2 tag (id3v2.4 §3.1): syncsafe 28-bit size
    if (p.length >= 10 && u8(0) == 'I' && u8(1) == 'D' && u8(2) == '3') {
      // the four size bytes must have bit 7 clear (syncsafe)
      if ((u8(6) | u8(7) | u8(8) | u8(9)) >= 0x80) return None
      val size = (u8(6) << 21) | (u8(7) << 14) | (u8(8) << 7) | u8(9)
      val footer = (u8(5) & 0x10) != 0
      val total = 10L + size + (if (footer) 10 else 0)
      if (total > p.length) return None
      pos = total.toInt
    }

    var frames = 0
    var version: String = null
    var layer = 0; var channels = 0; var rate = 0; var firstKbps = 0
    var samplesTotal = 0L

    while (pos + 4 <= p.length && frames < MaxFrames &&
           !(p.length - pos == 128 && u8(pos) == 'T' && u8(pos + 1) == 'A' &&
             u8(pos + 2) == 'G')) {
      // 11-bit sync: 0xFF + top three bits of the next byte
      if (u8(pos) != 0xFF || (u8(pos + 1) & 0xE0) != 0xE0) return None
      val b1 = u8(pos + 1); val b2 = u8(pos + 2); val b3 = u8(pos + 3)
      val verId = (b1 >> 3) & 3    // 0=2.5, 1=reserved, 2=2, 3=1
      val layerId = (b1 >> 1) & 3  // 0=reserved, 1=III, 2=II, 3=I
      if (verId == 1 || layerId == 0) return None
      val ver = verId match { case 3 => "1"; case 2 => "2"; case _ => "2.5" }
      val lay = 4 - layerId        // 1, 2, 3
      val protected_ = (b1 & 1) == 0
      val brIdx = (b2 >> 4) & 15
      if (brIdx == 0 || brIdx == 15) return None // free format / forbidden
      val srIdx = (b2 >> 2) & 3
      if (srIdx == 3) return None
      val padding = (b2 >> 1) & 1
      val mode = (b3 >> 6) & 3     // 3 = single channel
      val mpeg1 = verId == 3
      val sr = (if (mpeg1) RateV1 else if (verId == 2) RateV2 else RateV25)(srIdx)
      val kbps = (if (mpeg1) { lay match { case 1 => BitrateV1L1; case 2 => BitrateV1L2; case _ => BitrateV1L3 } }
                  else { if (lay == 1) BitrateV2L1 else BitrateV2L23 })(brIdx)
      val ch = if (mode == 3) 1 else 2
      val frameLen = lay match {
        case 1 => (12 * kbps * 1000 / sr + padding) * 4
        case 2 => 144 * kbps * 1000 / sr + padding
        case _ => (if (mpeg1) 144 else 72) * kbps * 1000 / sr + padding
      }
      val samples = lay match {
        case 1 => 384
        case 2 => 1152
        case _ => if (mpeg1) 1152 else 576
      }
      if (frameLen < 4 || pos + frameLen > p.length) return None
      if (frames == 0) {
        version = ver; layer = lay; channels = ch; rate = sr; firstKbps = kbps
      } else if (ver != version || lay != layer || ch != channels || sr != rate)
        return None // real VBR varies only bitrate/padding (declared)
      if (protected_) {
        // CRC sits right after the 4-byte header
        if (pos + 6 > p.length) return None
        if (lay == 3) {
          val side = sideInfoLen(mpeg1, ch == 1)
          if (pos + 6 + side > p.length) return None
          val want = (u8(pos + 4) << 8) | u8(pos + 5)
          if (crc16(p, Seq((pos + 2, pos + 4), (pos + 6, pos + 6 + side))) != want)
            return None
        } // Layers I/II: bit-allocation-dependent span — consumed, not verified
      }
      samplesTotal += samples
      pos += frameLen
      frames += 1
    }
    // optional ID3v1 trailer
    if (pos + 128 == p.length && u8(pos) == 'T' && u8(pos + 1) == 'A' &&
        u8(pos + 2) == 'G') pos += 128
    if (frames == 0 || pos != p.length) return None
    Some(Meta(version, layer, channels, rate, firstKbps, frames,
      samplesTotal * 1000L / rate))
  }
}
