package graft.ops

/** From-spec FLAC codec (RFC 9639 / the public FLAC format spec) —
  * the compressed-audio rung of the codec ladder (PNG → JPEG → GIF →
  * AVI/MJPEG → now FLAC), retiring the PCM-WAV-only caveat on the
  * audio operators: [[AudioPcm.decodeAny]] dispatches `fLaC` payloads
  * here, so fingerprinting ([[AudioFingerprint]]), spectral features
  * ([[Spectral]]) and clip features ([[Multimodal.decodeAudioFeatures]])
  * run on compressed fixtures unchanged.
  *
  * Decoder surface (the spec's full frame layer):
  *   - STREAMINFO parse + any other metadata blocks skipped
  *   - frame sync / blocking strategy / all block-size codes /
  *     sample-rate-from-streaminfo / UTF-8-coded frame numbers
  *   - channel assignments: independent, left/side, right/side,
  *     mid/side (side channels carry one extra bit)
  *   - subframes: CONSTANT, VERBATIM, FIXED (orders 0–4), LPC (any
  *     order, quantized coefficients + arithmetic shift), wasted bits
  *   - residual: Rice and Rice2 partitions, any partition order,
  *     escape partitions (raw n-bit residuals)
  *   - integrity: CRC-8 over every frame header (poly 0x07), CRC-16
  *     over every frame (poly 0x8005) — both verified, not skipped
  *
  * Losslessness is proven END-TO-END by an INDEPENDENT hash: the
  * encoder stores the JDK MessageDigest MD5 of the raw little-endian
  * sample bytes in STREAMINFO (as the spec prescribes), and the
  * decoder re-derives the digest from its own output and refuses on
  * mismatch — so a matched encode/decode bug in the prediction or
  * Rice layers cannot silently round-trip: the digest comes from the
  * samples BEFORE encoding ever sees them.
  *
  * Encoder surface (fixture synthesis + a real compressor): fixed
  * blocking, per-channel best-of {CONSTANT, FIXED 0–4, VERBATIM} by
  * exact bit cost with per-frame Rice parameter search, an LPC path
  * (fixed order-2 quantized predictor) exercised on every 4th frame,
  * and mid/side decorrelation on every other stereo frame — so the
  * decoder paths above are all exercised by encoder output, not only
  * by hand-built vectors.
  *
  * Hostile-bytes contract as everywhere in this package: bounded
  * reads, sample-count caps, refuse-don't-guess; decode never throws.
  */
object FlacCodec {

  // ---------------- bit I/O (MSB-first, as the spec reads) ----------------

  private final class BitWriter {
    private var buf = new Array[Byte](1 << 12)
    private var bytePos = 0
    private var bitPos = 0 // bits already used in buf(bytePos), 0..7
    private def ensure(n: Int): Unit =
      if (bytePos + n + 8 > buf.length)
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, bytePos + n + 64))
    def writeBits(v: Long, n: Int): Unit = {
      ensure(n / 8 + 2)
      var k = n - 1
      while (k >= 0) {
        val bit = (v >> k) & 1L
        if (bit != 0) buf(bytePos) = (buf(bytePos) | (0x80 >> bitPos)).toByte
        bitPos += 1
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
        k -= 1
      }
    }
    def writeUnary(q: Int): Unit = { // q zero bits then a 1
      var r = q
      while (r > 0) { writeBits(0, 1); r -= 1 }
      writeBits(1, 1)
    }
    def alignByte(): Unit = if (bitPos != 0) writeBits(0, 8 - bitPos)
    def size: Int = bytePos + (if (bitPos > 0) 1 else 0)
    def byteAt(i: Int): Byte = buf(i)
    def toArray: Array[Byte] = java.util.Arrays.copyOf(buf, size)
  }

  private final class BitReader(p: Array[Byte]) {
    var bytePos = 0
    var bitPos = 0
    def atEnd: Boolean = bytePos >= p.length
    def readBit(): Int = {
      if (bytePos >= p.length) throw Refuse
      val b = (p(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      b
    }
    def readBits(n: Int): Long = {
      var v = 0L; var k = 0
      while (k < n) { v = (v << 1) | readBit(); k += 1 }
      v
    }
    def readSigned(n: Int): Int = {
      if (n == 0) return 0
      val u = readBits(n)
      val sign = 1L << (n - 1)
      (if ((u & sign) != 0) u - (sign << 1) else u).toInt
    }
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      q
    }
    def align(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
  }

  /** Control-flow sentinel for malformed input: caught in [[decode]],
    * converted to None. Stackless — hostile bytes must be cheap. */
  private object Refuse extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  // ---------------- CRCs (spec polynomials, init 0) ----------------

  private[graft] def crc8(p: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= p(i) & 0xFF
      var b = 0
      while (b < 8) { crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF else (crc << 1) & 0xFF; b += 1 }
      i += 1
    }
    crc
  }
  private[graft] def crc16(get: Int => Byte, from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (get(i) & 0xFF) << 8
      var b = 0
      while (b < 8) { crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF else (crc << 1) & 0xFFFF; b += 1 }
      i += 1
    }
    crc
  }

  /** MD5 of the unencoded audio: interleaved samples as little-endian
    * bytes at the stream's bit depth (the spec's layout). */
  private def sampleMd5(samples: Array[Int], bits: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bytesPer = bits / 8
    val chunk = new Array[Byte](8192 * bytesPer)
    var i = 0
    while (i < samples.length) {
      val n = math.min(8192, samples.length - i)
      var k = 0
      while (k < n) {
        val v = samples(i + k)
        var b = 0
        while (b < bytesPer) { chunk(k * bytesPer + b) = ((v >> (8 * b)) & 0xFF).toByte; b += 1 }
        k += 1
      }
      md.update(chunk, 0, n * bytesPer)
      i += n
    }
    md.digest()
  }

  // ---------------- encoder ----------------

  private def utf8Number(w: BitWriter, v0: Long): Unit = {
    if (v0 < 0x80) { w.writeBits(v0, 8); return }
    var bytes = 2
    while (bytes <= 6 && v0 >= (1L << (bytes * 5 + 1))) bytes += 1
    // lead byte: `bytes` ones then a zero, then the top value bits
    val leadBits = 7 - bytes
    w.writeBits((0xFF << (leadBits + 1)) & 0xFF | (v0 >> (6 * (bytes - 1))), 8)
    var k = bytes - 2
    while (k >= 0) { w.writeBits(0x80L | ((v0 >> (6 * k)) & 0x3F), 8); k -= 1 }
  }

  private def riceCost(res: Array[Int], k: Int): Long = {
    var bits = 0L
    var i = 0
    while (i < res.length) {
      val u = ((res(i) << 1) ^ (res(i) >> 31)) & 0xFFFFFFFFL
      bits += (u >>> k) + 1 + k
      i += 1
    }
    bits
  }
  private def bestRiceK(res: Array[Int]): (Int, Long) = {
    var bestK = 0; var bestC = Long.MaxValue
    var k = 0
    while (k <= 14) {
      val c = riceCost(res, k)
      if (c < bestC) { bestC = c; bestK = k }
      k += 1
    }
    (bestK, bestC)
  }
  private def writeRice(w: BitWriter, res: Array[Int], k: Int): Unit = {
    var i = 0
    while (i < res.length) {
      val u = ((res(i) << 1) ^ (res(i) >> 31)) & 0xFFFFFFFFL
      w.writeUnary((u >>> k).toInt)
      if (k > 0) w.writeBits(u & ((1L << k) - 1), k)
      i += 1
    }
  }
  /** residual block: method 00 (Rice), partition order 0, one param. */
  private def writeResidual(w: BitWriter, res: Array[Int], k: Int): Unit = {
    w.writeBits(0, 2); w.writeBits(0, 4)
    w.writeBits(k.toLong, 4)
    writeRice(w, res, k)
  }

  private def fixedResidual(s: Array[Int], order: Int): Array[Int] = {
    val n = s.length - order
    val out = new Array[Int](math.max(0, n))
    var i = order
    while (i < s.length) {
      val r = order match {
        case 0 => s(i)
        case 1 => s(i) - s(i - 1)
        case 2 => s(i) - 2 * s(i - 1) + s(i - 2)
        case 3 => s(i) - 3 * s(i - 1) + 3 * s(i - 2) - s(i - 3)
        case 4 => s(i) - 4 * s(i - 1) + 6 * s(i - 2) - 4 * s(i - 3) + s(i - 4)
      }
      out(i - order) = r
      i += 1
    }
    out
  }

  /** Encode one channel's subframe, choosing the cheapest of
    * CONSTANT / FIXED 0–4 / VERBATIM by exact bit cost; `forceLpc`
    * swaps in the quantized order-2 LPC path (still lossless — the
    * residual is computed against the real predictor). */
  private def writeSubframe(w: BitWriter, s: Array[Int], bits: Int, forceLpc: Boolean): Unit = {
    val allEqual = s.length > 0 && s.forall(_ == s(0))
    if (allEqual) {
      w.writeBits(0, 8) // pad(1)=0, type=000000 constant, wasted=0
      w.writeBits(s(0).toLong & ((1L << bits) - 1), bits)
      return
    }
    if (forceLpc && s.length > 2) {
      // order-2 quantized LPC: precision 4, shift 1, coeffs {3, -1}
      // → pred = (3·s[i−1] − s[i−2]) >> 1 (arithmetic)
      val order = 2
      w.writeBits((0x20L | (order - 1)) << 1, 8) // type 1ooooo, wasted=0
      var i = 0
      while (i < order) { w.writeBits(s(i).toLong & ((1L << bits) - 1), bits); i += 1 }
      w.writeBits(4 - 1, 4) // precision − 1
      w.writeBits(1, 5)     // shift (signed field, positive value)
      w.writeBits(3L & 0xF, 4); w.writeBits(-1L & 0xF, 4)
      val res = new Array[Int](s.length - order)
      i = order
      while (i < s.length) {
        val pred = (3 * s(i - 1) - s(i - 2)) >> 1
        res(i - order) = s(i) - pred
        i += 1
      }
      writeResidual(w, res, bestRiceK(res)._1)
      return
    }
    // best fixed order by exact cost vs verbatim
    var bestOrder = 0; var bestK = 0; var bestCost = Long.MaxValue
    var bestRes: Array[Int] = null
    var o = 0
    while (o <= math.min(4, s.length - 1)) {
      val res = fixedResidual(s, o)
      val (k, c) = bestRiceK(res)
      val cost = o.toLong * bits + 6 + c
      if (cost < bestCost) { bestCost = cost; bestOrder = o; bestK = k; bestRes = res }
      o += 1
    }
    if (bestCost >= s.length.toLong * bits) {
      w.writeBits(2, 8) // type 000001 verbatim
      var i = 0
      while (i < s.length) { w.writeBits(s(i).toLong & ((1L << bits) - 1), bits); i += 1 }
    } else {
      w.writeBits((0x08L | bestOrder) << 1, 8) // type 001ooo
      var i = 0
      while (i < bestOrder) { w.writeBits(s(i).toLong & ((1L << bits) - 1), bits); i += 1 }
      writeResidual(w, bestRes, bestK)
    }
  }

  private def blockSizeCode(bs: Int): (Int, Int, Int) = { // (code, extraBits, extraVal)
    bs match {
      case 192 => (1, 0, 0)
      case 576 | 1152 | 2304 | 4608 =>
        (2 + Integer.numberOfTrailingZeros(bs / 576), 0, 0)
      case _ if bs >= 256 && bs <= 32768 && Integer.bitCount(bs) == 1 =>
        (8 + Integer.numberOfTrailingZeros(bs / 256), 0, 0)
      case _ if bs <= 256 => (6, 8, bs - 1)
      case _ => (7, 16, bs - 1)
    }
  }

  /** Encode a 16-bit PCM clip (interleaved samples, 1–8 channels) as a
    * FLAC stream. `blockSize` is the fixed blocking interval; the last
    * frame may be shorter. */
  def encode(clip: AudioPcm.Clip, blockSize: Int = 4096): Array[Byte] = {
    require(clip.bitsPerSample == 16, "FLAC encoder is 16-bit")
    require(clip.channels >= 1 && clip.channels <= 8, "1..8 channels")
    require(blockSize >= 16 && blockSize <= 32768, "blockSize 16..32768")
    val ch = clip.channels
    val nTotal = clip.samples.length / ch
    val md5 = sampleMd5(java.util.Arrays.copyOf(clip.samples, nTotal * ch), 16)

    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO: last-block flag set, type 0, length 34
    val si = new BitWriter
    si.writeBits(blockSize.toLong, 16); si.writeBits(blockSize.toLong, 16)
    si.writeBits(0, 24); si.writeBits(0, 24) // frame sizes unknown
    si.writeBits(clip.sampleRate.toLong, 20)
    si.writeBits(ch.toLong - 1, 3)
    si.writeBits(16 - 1, 5)
    si.writeBits(nTotal.toLong, 36)
    val siBytes = si.toArray
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    out.write(siBytes, 0, siBytes.length)
    out.write(md5, 0, 16)

    var frameNo = 0L
    var pos = 0
    while (pos < nTotal) {
      val bs = math.min(blockSize, nTotal - pos)
      // deinterleave this block
      val chans = Array.tabulate(ch) { c =>
        val a = new Array[Int](bs)
        var i = 0
        while (i < bs) { a(i) = clip.samples((pos + i) * ch + c); i += 1 }
        a
      }
      // stereo: mid/side on every other frame exercises the
      // decorrelated decode path; mono/other stay independent
      val midSide = ch == 2 && frameNo % 2 == 1
      val w = new BitWriter
      val (bsCode, extraBits, extraVal) = blockSizeCode(bs)
      w.writeBits(0x3FFE, 14) // sync
      w.writeBits(0, 1)       // reserved
      w.writeBits(0, 1)       // fixed blocking
      w.writeBits(bsCode.toLong, 4)
      w.writeBits(0, 4)       // sample rate: from STREAMINFO
      w.writeBits(if (midSide) 0xAL else ch.toLong - 1, 4)
      w.writeBits(4, 3)       // sample size: 16-bit
      w.writeBits(0, 1)       // reserved
      utf8Number(w, frameNo)
      if (extraBits > 0) w.writeBits(extraVal.toLong, extraBits)
      val headerLen = w.size
      w.writeBits(crc8Of(w, headerLen).toLong, 8)
      if (midSide) {
        val mid = new Array[Int](bs); val side = new Array[Int](bs)
        var i = 0
        while (i < bs) {
          mid(i) = (chans(0)(i) + chans(1)(i)) >> 1
          side(i) = chans(0)(i) - chans(1)(i)
          i += 1
        }
        writeSubframe(w, mid, 16, forceLpc = frameNo % 4 == 3)
        writeSubframe(w, side, 17, forceLpc = false)
      } else {
        var c = 0
        while (c < ch) {
          writeSubframe(w, chans(c), 16, forceLpc = frameNo % 4 == 3)
          c += 1
        }
      }
      w.alignByte()
      val frameLen = w.size
      w.writeBits(crc16(w.byteAt, 0, frameLen).toLong, 16)
      val frame = w.toArray
      out.write(frame, 0, frame.length)
      pos += bs
      frameNo += 1
    }
    out.toByteArray
  }
  private def crc8Of(w: BitWriter, until: Int): Int = {
    var crc = 0
    var i = 0
    while (i < until) {
      crc ^= w.byteAt(i) & 0xFF
      var b = 0
      while (b < 8) { crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF else (crc << 1) & 0xFF; b += 1 }
      i += 1
    }
    crc
  }

  // ---------------- decoder ----------------

  private val BlockSizes = Array(-1, 192, 576, 1152, 2304, 4608, -8, -16,
    256, 512, 1024, 2048, 4096, 8192, 16384, 32768)

  private def readUtf8Number(r: BitReader): Long = {
    val first = r.readBits(8).toInt
    if ((first & 0x80) == 0) return first.toLong
    var bytes = 0
    var mask = 0x40
    while (mask != 0 && (first & mask) != 0) { bytes += 1; mask >>= 1 }
    if (bytes < 1 || bytes > 6) throw Refuse
    var v = (first & (mask - 1)).toLong
    var k = 0
    while (k < bytes) {
      val c = r.readBits(8).toInt
      if ((c & 0xC0) != 0x80) throw Refuse
      v = (v << 6) | (c & 0x3F)
      k += 1
    }
    v
  }

  private def readResidual(r: BitReader, bs: Int, order: Int, out: Array[Int]): Unit = {
    val method = r.readBits(2).toInt
    if (method > 1) throw Refuse
    val paramBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xF else 0x1F
    val po = r.readBits(4).toInt
    val parts = 1 << po
    var idx = 0
    var part = 0
    while (part < parts) {
      val n = (bs >> po) - (if (part == 0) order else 0)
      if (n < 0 || idx + n > out.length) throw Refuse
      val param = r.readBits(paramBits).toInt
      if (param == escape) {
        val raw = r.readBits(5).toInt
        var i = 0
        while (i < n) { out(idx + i) = if (raw == 0) 0 else r.readSigned(raw); i += 1 }
      } else {
        var i = 0
        while (i < n) {
          val q = r.readUnary()
          val u = ((q.toLong << param) | (if (param > 0) r.readBits(param) else 0L))
          out(idx + i) = ((u >>> 1) ^ -(u & 1L)).toInt // un-zigzag
          i += 1
        }
      }
      idx += n
      part += 1
    }
    if (idx != bs - order) throw Refuse
  }

  private def readSubframe(r: BitReader, bs: Int, bits0: Int): Array[Int] = {
    if (r.readBit() != 0) throw Refuse // mandatory zero pad
    val typ = r.readBits(6).toInt
    var wasted = 0
    if (r.readBit() == 1) wasted = r.readUnary() + 1
    val bits = bits0 - wasted
    if (bits < 1 || bits > 33) throw Refuse
    val s = new Array[Int](bs)
    if (typ == 0) { // CONSTANT
      val v = r.readSigned(bits)
      java.util.Arrays.fill(s, v)
    } else if (typ == 1) { // VERBATIM
      var i = 0
      while (i < bs) { s(i) = r.readSigned(bits); i += 1 }
    } else if ((typ & 0x38) == 0x08 && (typ & 0x07) <= 4) { // FIXED
      val order = typ & 0x07
      if (order > bs) throw Refuse
      var i = 0
      while (i < order) { s(i) = r.readSigned(bits); i += 1 }
      val res = new Array[Int](bs - order)
      readResidual(r, bs, order, res)
      i = order
      while (i < bs) {
        val pred = order match {
          case 0 => 0
          case 1 => s(i - 1)
          case 2 => 2 * s(i - 1) - s(i - 2)
          case 3 => 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
          case 4 => 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4)
        }
        s(i) = res(i - order) + pred
        i += 1
      }
    } else if ((typ & 0x20) != 0) { // LPC
      val order = (typ & 0x1F) + 1
      if (order > bs) throw Refuse
      var i = 0
      while (i < order) { s(i) = r.readSigned(bits); i += 1 }
      val precision = r.readBits(4).toInt + 1
      if (precision == 16) throw Refuse // 0b1111 is invalid
      val shift = r.readSigned(5)
      if (shift < 0) throw Refuse
      val coef = new Array[Int](order)
      i = 0
      while (i < order) { coef(i) = r.readSigned(precision); i += 1 }
      val res = new Array[Int](bs - order)
      readResidual(r, bs, order, res)
      i = order
      while (i < bs) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coef(j).toLong * s(i - 1 - j); j += 1 }
        s(i) = res(i - order) + (acc >> shift).toInt
        i += 1
      }
    } else throw Refuse // reserved type
    if (wasted > 0) {
      var i = 0
      while (i < bs) { s(i) = s(i) << wasted; i += 1 }
    }
    s
  }

  /** STREAMINFO-only metadata walk: (channels, sample_rate,
    * total_samples) without touching any frame — the O(metadata-
    * blocks) path [[Multimodal.decodeAudioMeta]] needs, where a full
    * [[decode]] (frames + CRCs + MD5) would read the whole payload
    * just to report three header fields. Same refusal rules as
    * [[decode]]'s header phase: STREAMINFO must be the first block,
    * sizes must be in-bounds. */
  def streamInfo(p: Array[Byte]): Option[(Int, Int, Long)] = {
    if (p.length < 42 || p(0) != 'f' || p(1) != 'L' || p(2) != 'a' || p(3) != 'C')
      return None
    val h = p(4) & 0xFF
    val len = ((p(5) & 0xFF) << 16) | ((p(6) & 0xFF) << 8) | (p(7) & 0xFF)
    if ((h & 0x7F) != 0 || len != 34 || 8 + len > p.length) return None
    val r = new BitReader(java.util.Arrays.copyOfRange(p, 8, 8 + 34))
    r.readBits(16); r.readBits(16); r.readBits(24); r.readBits(24)
    val rate = r.readBits(20).toInt
    val channels = r.readBits(3).toInt + 1
    r.readBits(5) // bits-per-sample − 1: not a metadata-tier concern
    val totalSamples = r.readBits(36)
    if (rate <= 0) return None
    Some((channels, rate, totalSamples))
  }

  /** Decode a FLAC stream; None on anything malformed, on any CRC
    * mismatch, and on an MD5 that does not match the decoded output. */
  def decode(p: Array[Byte]): Option[AudioPcm.Clip] = {
    try {
      if (p.length < 42 || p(0) != 'f' || p(1) != 'L' || p(2) != 'a' || p(3) != 'C')
        return None
      var pos = 4
      var last = false
      var rate = 0; var channels = 0; var bits = 0
      var totalSamples = 0L
      var md5: Array[Byte] = null
      var blockIdx = 0
      while (!last) {
        if (pos + 4 > p.length) return None
        val h = p(pos) & 0xFF
        last = (h & 0x80) != 0
        val typ = h & 0x7F
        val len = ((p(pos + 1) & 0xFF) << 16) | ((p(pos + 2) & 0xFF) << 8) | (p(pos + 3) & 0xFF)
        if (pos + 4 + len > p.length) return None
        if (blockIdx == 0) {
          if (typ != 0 || len != 34) return None // STREAMINFO must be first
          val r = new BitReader(java.util.Arrays.copyOfRange(p, pos + 4, pos + 4 + 34))
          r.readBits(16); r.readBits(16); r.readBits(24); r.readBits(24)
          rate = r.readBits(20).toInt
          channels = r.readBits(3).toInt + 1
          bits = r.readBits(5).toInt + 1
          totalSamples = r.readBits(36)
          md5 = java.util.Arrays.copyOfRange(p, pos + 4 + 18, pos + 4 + 34)
        }
        pos += 4 + len
        blockIdx += 1
      }
      if (rate <= 0 || bits != 16 && bits != 8) return None
      if (totalSamples * channels > AudioPcm.MaxSamples) return None
      val acc = new java.util.ArrayList[Array[Int]]()
      var decoded = 0L
      val r = new BitReader(p)
      r.bytePos = pos
      while (r.bytePos < p.length && (totalSamples == 0 || decoded < totalSamples)) {
        val frameStart = r.bytePos
        // frame header
        if (r.readBits(14) != 0x3FFE) return None
        r.readBits(1) // reserved
        val variable = r.readBits(1) == 1
        val bsCode = r.readBits(4).toInt
        val srCode = r.readBits(4).toInt
        val chAssign = r.readBits(4).toInt
        val ssCode = r.readBits(3).toInt
        if (r.readBits(1) != 0) return None
        readUtf8Number(r)
        val bs = bsCode match {
          case 0 => return None // reserved
          case 6 => r.readBits(8).toInt + 1
          case 7 => r.readBits(16).toInt + 1
          case c => BlockSizes(c)
        }
        srCode match { // only consume trailing rate bits; value from STREAMINFO
          case 12 => r.readBits(8)
          case 13 | 14 => r.readBits(16)
          case 15 => return None
          case _ => ()
        }
        val frameBits = ssCode match {
          case 0 => bits
          case 1 => 8
          case 4 => 16
          case 2 | 6 | 5 => return None // 12/24/20-bit unsupported here
          case _ => return None
        }
        if (frameBits != bits) return None
        val headerEnd = r.bytePos // crc8 is the next byte; header is [frameStart, headerEnd)
        if (r.bitPos != 0) return None // header is byte-aligned by construction
        val hcrc = r.readBits(8).toInt
        if (crc8(p, frameStart, headerEnd) != hcrc) return None
        val nCh = if (chAssign <= 7) chAssign + 1 else 2
        if (chAssign > 10 || nCh != channels) return None
        if (bs <= 0 || decoded + bs > (if (totalSamples > 0) totalSamples else Long.MaxValue))
          return None
        if ((decoded + bs) * channels > AudioPcm.MaxSamples) return None
        // subframes
        val chans = new Array[Array[Int]](nCh)
        var c = 0
        while (c < nCh) {
          val extra = chAssign match {
            case 8 => if (c == 1) 1 else 0  // left/side
            case 9 => if (c == 0) 1 else 0  // right/side
            case 10 => if (c == 1) 1 else 0 // mid/side
            case _ => 0
          }
          chans(c) = readSubframe(r, bs, frameBits + extra)
          c += 1
        }
        // inter-channel reconstruction
        chAssign match {
          case 8 => // left/side → right = left − side
            var i = 0
            while (i < bs) { chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
          case 9 => // right/side → left = right + side
            var i = 0
            while (i < bs) {
              val right = chans(1)(i); val side = chans(0)(i)
              chans(0)(i) = right + side
              i += 1
            }
          case 10 => // mid/side
            var i = 0
            while (i < bs) {
              var mid = chans(0)(i); val side = chans(1)(i)
              mid = (mid << 1) | (side & 1)
              chans(0)(i) = (mid + side) >> 1
              chans(1)(i) = (mid - side) >> 1
              i += 1
            }
          case _ => ()
        }
        r.align()
        val frameEnd = r.bytePos
        val fcrc = r.readBits(16).toInt
        if (crc16(p(_), frameStart, frameEnd) != fcrc) return None
        // interleave
        val block = new Array[Int](bs * nCh)
        var i = 0
        while (i < bs) {
          c = 0
          while (c < nCh) { block(i * nCh + c) = chans(c)(i); c += 1 }
          i += 1
        }
        acc.add(block)
        decoded += bs
        val _ = variable // both strategies accepted; numbers not cross-checked
      }
      if (totalSamples > 0 && decoded != totalSamples) return None
      var outLen = 0
      val it = acc.iterator()
      while (it.hasNext) outLen += it.next().length
      if (outLen > AudioPcm.MaxSamples) return None
      val samples = new Array[Int](outLen)
      var off = 0
      val it2 = acc.iterator()
      while (it2.hasNext) {
        val b = it2.next()
        System.arraycopy(b, 0, samples, off, b.length)
        off += b.length
      }
      // the independent end-to-end check: decoded output must hash to
      // the digest the encoder took of the ORIGINAL samples
      if (md5.exists(_ != 0) && !java.util.Arrays.equals(sampleMd5(samples, bits), md5))
        return None
      Some(AudioPcm.Clip(channels, rate, bits, samples))
    } catch {
      case Refuse => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }
}
