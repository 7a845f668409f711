package graft.ops

/** From-spec ITU-T G.711 companding — the 8-bit logarithmic PCM pair
  * (μ-law, North America/Japan; A-law, Europe) that telephony WAV
  * corpora actually carry (RIFF format codes 7 and 6). Reference
  * behavior: the reference pipeline has no audio layer at all
  * (`main.py` is a row ETL engine); this is part of the §2.6
  * multimodal extension surface, the companded rung of the audio
  * codec ladder between raw PCM ([[AudioPcm]]) and the compressed
  * frame codec ([[FlacCodec]]).
  *
  * Both directions implement the classic segment/mantissa expansion
  * exactly as specified in G.711's tables (the same arithmetic as the
  * widely published CCITT reference code): an 8-bit code is
  * sign(1) | segment(3) | mantissa(4), transmitted complemented
  * (μ-law) or with the even bits toggled by 0x55 (A-law). Decode is a
  * pure function of the code byte — 256 possible outputs — which is
  * what makes an exact SQL oracle possible for the gate: the DuckDB
  * side replays the formula below bit-for-bit.
  *
  * Encode is the matching segment search; round-tripping any 16-bit
  * sample through encode→decode lands on the segment's quantization
  * level (exactness pinned against `javax.sound.sampled`'s
  * INDEPENDENT ULAW/ALAW converters in G711Spec — two implementations
  * sharing zero code).
  *
  * Scale shape: pure byte→int functions invoked inside
  * `mapPartitions` decode loops; the 256-entry tables are
  * precomputed per-JVM, no per-row allocation.
  */
object G711 {

  private final val Bias = 0x84 // μ-law bias (132): keeps segment 0 monotone
  private final val Clip = 32635 // μ-law clip: BIAS would overflow past this

  /** μ-law code byte (0..255) → linear 16-bit sample.
    * u = ~code; t = ((u & 0xF) << 3) + 0x84 << ((u >> 4) & 7);
    * sample = (u & 0x80) != 0 ? 0x84 − t : t − 0x84.
    */
  def mulawDecode(code: Int): Int = {
    val u = (~code) & 0xFF
    val t = (((u & 0x0F) << 3) + Bias) << ((u >> 4) & 0x07)
    if ((u & 0x80) != 0) Bias - t else t - Bias
  }

  // CCITT reference segment ends: 14-bit domain for μ-law (after the
  // 16→14-bit shift), 13-bit domain for A-law (after 16→13).
  private val SegUEnd = Array(0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF)
  private val SegAEnd = Array(0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)

  /** Linear 16-bit sample → μ-law code byte (complemented form) —
    * the CCITT reference arithmetic: shift to the 14-bit domain, add
    * the 33 bias, find the segment, take 4 mantissa bits. */
  def mulawEncode(sample: Int): Int = {
    var pcm = sample >> 2 // 16 → 14 bit
    val mask = if (pcm < 0) { pcm = -pcm; 0x7F } else 0xFF
    if (pcm > 8159) pcm = 8159 // CLIP so that +33 stays in segment 7
    pcm += Bias >> 2 // 33
    var seg = 0
    while (seg < 8 && pcm > SegUEnd(seg)) seg += 1
    val uval =
      if (seg >= 8) 0x7F
      else (seg << 4) | ((pcm >> (seg + 1)) & 0x0F)
    (uval ^ mask) & 0xFF
  }

  /** A-law code byte (0..255) → linear 16-bit sample.
    * a = code ^ 0x55; seg = (a >> 4) & 7;
    * t = (a & 0xF) << 4; seg 0 → t + 8; seg ≥ 1 → (t + 0x108) << (seg − 1);
    * sample = (a & 0x80) != 0 ? t : −t.
    */
  def alawDecode(code: Int): Int = {
    val a = (code ^ 0x55) & 0xFF
    var t = (a & 0x0F) << 4
    val seg = (a >> 4) & 0x07
    if (seg == 0) t += 8
    else { t += 0x108; t <<= (seg - 1) }
    if ((a & 0x80) != 0) t else -t
  }

  /** Linear 16-bit sample → A-law code byte (0x55-toggled form) —
    * CCITT reference arithmetic in the 13-bit domain; −1 maps with
    * the negatives (two's-complement fold before the segment search). */
  def alawEncode(sample: Int): Int = {
    var pcm = sample >> 3 // 16 → 13 bit
    val mask = if (pcm >= 0) 0xD5 else { pcm = -pcm - 1; 0x55 }
    if (pcm > 0xFFF) pcm = 0xFFF
    var seg = 0
    while (seg < 8 && pcm > SegAEnd(seg)) seg += 1
    val aval =
      if (seg >= 8) 0x7F
      else {
        val mant = if (seg < 2) (pcm >> 1) & 0x0F else (pcm >> seg) & 0x0F
        (seg << 4) | mant
      }
    (aval ^ mask) & 0xFF
  }

  /** Precomputed decode tables (256 entries each) for the hot decode
    * loops — one array index per sample instead of re-running the
    * bit arithmetic. */
  val MulawTable: Array[Int] = Array.tabulate(256)(mulawDecode)
  val AlawTable: Array[Int] = Array.tabulate(256)(alawDecode)
}
