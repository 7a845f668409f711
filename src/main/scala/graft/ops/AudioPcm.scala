package graft.ops

/** Real PCM audio decode — the sample-level sibling of
  * [[Multimodal.AudioHeader]]'s header sniff, against the public
  * RIFF/WAVE layout: the "fmt " chunk declares the format code,
  * channels, rate, and bit depth; the "data" chunk carries the
  * samples. Decoded formats: 1 (linear PCM — 8-bit unsigned centered
  * at 128, or 16-bit signed little-endian), 6 (G.711 A-law) and
  * 7 (G.711 μ-law) through the from-spec [[G711]] expanders, and
  * 0x11 (IMA ADPCM) through [[ImaAdpcm]] with the fmt chunk's
  * blockAlign and the `fact` chunk's frame count. Everything else
  * (float, MS-ADPCM, extensible) returns None: refuse, don't guess.
  *
  * Truncation contract: samples decode from the bytes ACTUALLY
  * present (a truncated file yields the prefix that exists, bounded
  * by the declared size) — at corpus scale a cut-off upload should
  * still contribute its audible prefix to feature stats. Hostile
  * sizes can't overflow (Long cursor, same fix as AudioHeader) and
  * decoded sample count is capped before allocation.
  *
  * Same scale shape as every codec here: a pure function invoked
  * inside `mapPartitions`.
  */
object AudioPcm {

  /** Decoded clip: interleaved samples, 16-bit range (-32768..32767);
    * 8-bit input is centered ((b − 128) << 8) so features are
    * depth-comparable. */
  final case class Clip(channels: Int, sampleRate: Int, bitsPerSample: Int,
      samples: Array[Int])

  /** Refuse clips decoding to more than this many samples (64 Mi —
    * ~25 minutes of 16-bit stereo at 22 kHz). */
  val MaxSamples: Int = 64 << 20

  /** Container dispatch for the audio operators: `fLaC` streams decode
    * through the from-spec [[FlacCodec]], `OggS` through the from-spec
    * [[Vorbis]] decoder (round 14), `FORM`+AIFF/AIFC and `.snd`
    * through the legacy-container decoders (round 15), everything
    * else through the RIFF/WAVE path below — so fingerprint/spectral/
    * feature ops accept compressed fixtures without knowing which
    * codec produced them. */
  def decodeAny(p: Array[Byte]): Option[Clip] =
    if (p.length >= 4 && p(0) == 'f' && p(1) == 'L' && p(2) == 'a' && p(3) == 'C')
      FlacCodec.decode(p)
    else if (p.length >= 4 && p(0) == 'O' && p(1) == 'g' && p(2) == 'g' && p(3) == 'S')
      Vorbis.decodeClip(p)
    else if (Aiff.isAiff(p)) Aiff.decode(p)
    else if (AuSnd.isAu(p)) AuSnd.decode(p)
    else decode(p)

  def decode(p: Array[Byte]): Option[Clip] = {
    def u8(i: Int): Int = p(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int): String =
      if (i + 4 <= p.length) new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      else ""
    if (p.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12L
    var fmt = -1; var channels = 0; var rate = 0; var bits = 0; var blockAlign = 0
    var dataAt = -1L; var dataLen = 0L; var factFrames = -1L
    while (i + 8 <= p.length) {
      val at = i.toInt
      val id = tag(at)
      val len = le32(at + 4)
      if (id == "fmt " && at + 24 <= p.length) {
        fmt = le16(at + 8)
        channels = le16(at + 10)
        rate = le32(at + 12).toInt
        blockAlign = le16(at + 20)
        bits = le16(at + 22)
      } else if (id == "data" && dataAt < 0) {
        dataAt = i + 8
        dataLen = len
      } else if (id == "fact" && at + 12 <= p.length) {
        factFrames = le32(at + 8)
      }
      i += 8L + len + (len & 1L)
    }
    if (channels < 1 || channels > 16 || rate <= 0 || dataAt < 0) return None
    // bytes actually present, bounded by the declared size
    val avail = math.max(0L, math.min(dataLen, p.length - dataAt))
    val base = dataAt.toInt
    fmt match {
      case 1 =>
        if (bits != 8 && bits != 16) return None
        val bytesPerSample = bits / 8
        val n = (avail / bytesPerSample).toInt
        if (n > MaxSamples) return None
        val out = new Array[Int](n)
        var k = 0
        if (bits == 8) {
          while (k < n) { out(k) = (u8(base + k) - 128) << 8; k += 1 }
        } else {
          while (k < n) {
            val v = le16(base + 2 * k)
            out(k) = if (v >= 0x8000) v - 0x10000 else v // sign-extend
            k += 1
          }
        }
        Some(Clip(channels, rate, bits, out))
      case 6 | 7 =>
        // G.711 A-law (6) / μ-law (7): one companded byte per sample,
        // expanded through the spec tables to 16-bit working depth
        if (bits != 8) return None
        val n = avail.toInt
        if (n > MaxSamples) return None
        val table = if (fmt == 6) G711.AlawTable else G711.MulawTable
        val out = new Array[Int](n)
        var k = 0
        while (k < n) { out(k) = table(u8(base + k)); k += 1 }
        Some(Clip(channels, rate, 16, out))
      case 0x11 =>
        // IMA ADPCM: stateful nibble decode over fmt's blockAlign
        if (bits != 4 || channels > 2) return None
        val data = java.util.Arrays.copyOfRange(p, base, base + avail.toInt)
        ImaAdpcm.decodeData(data, channels, blockAlign, factFrames)
          .map(samples => Clip(channels, rate, 16, samples))
      case _ => None
    }
  }
}
