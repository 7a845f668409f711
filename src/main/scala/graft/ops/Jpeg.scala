package graft.ops

/** From-spec baseline JPEG (ITU-T T.81 / JFIF) decoder — completes the
  * real-codec family next to [[PngCodec]] (inflate+unfilter) and
  * [[GifCodec]] (LZW): marker parse → quant/Huffman table build →
  * entropy decode (DC prediction, AC run/size, byte unstuffing, RST
  * intervals) → dequantize → IDCT → level shift → chroma upsample →
  * YCbCr→RGB. Baseline sequential DCT only (SOF0); progressive (SOF2)
  * and arithmetic coding are declined with None, as is anything
  * malformed — the decoder never throws on hostile bytes (same
  * contract as the other codecs; fuzzed in MultimodalSpec).
  *
  * Fidelity note: JPEG is lossy and T.81 does not pin one IDCT, so
  * decoders legitimately differ by ±1-2 per sample from rounding; the
  * double-precision separable IDCT here tracks the JDK's ImageIO
  * decoder within that band on grayscale (asserted in tests). Chroma
  * upsampling is nearest-neighbor replication (the spec's baseline
  * option) — color output is PSNR-checked, not byte-pinned.
  *
  * Returns [[PngCodec.Image]]: 1 channel for grayscale JPEGs, 3 (RGB)
  * otherwise.
  */
object JpegCodec {

  import PngCodec.Image

  /** Hard cap shared with the other codecs: refuse rasters over
    * [[PngCodec.MaxPixelBytes]] decoded bytes. */
  private val MaxPixels = PngCodec.MaxPixelBytes

  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    // canonical code assignment: mincode/maxcode/valptr per length
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = if (counts(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def symbol(i: Int): Int = symbols(i)
  }

  /** Entropy-segment bit reader: FF00 unstuffing, stops at any other
    * marker (leaves the cursor ON the FF). Returns -1 on exhaustion. */
  private final class BitReader(p: Array[Byte], var pos: Int) {
    private var acc = 0
    private var bits = 0
    var hitMarker = false

    def readBit(): Int = {
      if (bits == 0) {
        if (pos >= p.length) return -1
        var b = p(pos) & 0xFF
        if (b == 0xFF) {
          if (pos + 1 >= p.length) { hitMarker = true; return -1 }
          val b2 = p(pos + 1) & 0xFF
          if (b2 == 0x00) { pos += 2 } // stuffed FF
          else { hitMarker = true; return -1 } // real marker: stop
        } else pos += 1
        acc = b
        bits = 8
      }
      bits -= 1
      (acc >> bits) & 1
    }

    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = readBit()
        if (b < 0) return Int.MinValue
        v = (v << 1) | b
        i += 1
      }
      v
    }

    def decodeHuff(h: Huff): Int = {
      var code = readBit()
      if (code < 0) return -1
      var l = 1
      while (l <= 16) {
        if (h.maxCode(l) >= 0 && code <= h.maxCode(l)) {
          if (code < h.minCode(l)) { /* fallthrough to extend */ }
          else return h.symbol(h.valPtr(l) + code - h.minCode(l))
        }
        val b = readBit()
        if (b < 0) return -1
        code = (code << 1) | b
        l += 1
      }
      -1
    }

    /** Byte-align and reset accumulator (for RST boundaries). */
    def reset(): Unit = { bits = 0; hitMarker = false }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Double-precision separable 8x8 inverse DCT (rows then columns),
    * the textbook T.81 Annex A formula — accuracy well inside the
    * IEEE-1180 error band ImageIO's decoder also meets. */
  private val IdctCos: Array[Double] = {
    val c = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        c(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0) *
          (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)
        u += 1
      }
      x += 1
    }
    c
  }

  private def idct8x8(in: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += IdctCos(x * 8 + u) * in(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) { // columns
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += IdctCos(yy * 8 + v) * tmp(v * 8 + x); v += 1 }
        val r = math.round(s / 2.0 + 128.0).toInt
        out(yy * 8 + x) = if (r < 0) 0 else if (r > 255) 255 else r
        yy += 1
      }
      x += 1
    }
  }

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int) {
    var dcTable: Int = 0
    var acTable: Int = 0
    var pred: Int = 0 // DC predictor
    var data: Array[Byte] = null // per-component plane (compW x compH)
    var compW: Int = 0
    var compH: Int = 0
  }

  def decode(p: Array[Byte]): Option[Image] = {
    try decodeInner(p)
    catch { case _: Throwable => None }
  }

  // scalastyle:off method.length cyclomatic.complexity
  private def decodeInner(p: Array[Byte]): Option[Image] = {
    if (p.length < 4 || (p(0) & 0xFF) != 0xFF || (p(1) & 0xFF) != 0xD8) return None
    val qt = Array.ofDim[Int](4, 64)
    val qtSeen = new Array[Boolean](4)
    val dcH = new Array[Huff](4)
    val acH = new Array[Huff](4)
    var comps: Array[Comp] = null
    var width = 0
    var height = 0
    var restartInterval = 0

    def be16(i: Int): Int = ((p(i) & 0xFF) << 8) | (p(i + 1) & 0xFF)

    var i = 2
    while (i + 4 <= p.length) {
      if ((p(i) & 0xFF) != 0xFF) return None
      var m = p(i + 1) & 0xFF
      // skip fill bytes
      var fi = i
      while (m == 0xFF && fi + 2 < p.length) { fi += 1; m = p(fi + 1) & 0xFF }
      i = fi
      if (m == 0xD9) return None // EOI before SOS
      val len = be16(i + 2)
      if (len < 2 || i + 2 + len > p.length) return None
      val seg = i + 4
      val segEnd = i + 2 + len
      m match {
        case 0xDB => // DQT
          var j = seg
          while (j < segEnd) {
            val pq = (p(j) & 0xF0) >> 4
            val tq = p(j) & 0x0F
            if (tq > 3) return None
            if (pq == 0) {
              if (j + 65 > segEnd) return None
              var k = 0
              while (k < 64) { qt(tq)(Zigzag(k)) = p(j + 1 + k) & 0xFF; k += 1 }
              j += 65
            } else if (pq == 1) {
              if (j + 129 > segEnd) return None
              var k = 0
              while (k < 64) { qt(tq)(Zigzag(k)) = be16(j + 1 + 2 * k); k += 1 }
              j += 129
            } else return None
            qtSeen(tq) = true
          }
        case 0xC4 => // DHT
          var j = seg
          while (j < segEnd) {
            val tc = (p(j) & 0xF0) >> 4
            val th = p(j) & 0x0F
            if (tc > 1 || th > 3 || j + 17 > segEnd) return None
            val counts = new Array[Int](16)
            var total = 0
            var k = 0
            while (k < 16) { counts(k) = p(j + 1 + k) & 0xFF; total += counts(k); k += 1 }
            if (total > 256 || j + 17 + total > segEnd) return None
            val syms = new Array[Int](total)
            k = 0
            while (k < total) { syms(k) = p(j + 17 + k) & 0xFF; k += 1 }
            val h = new Huff(counts, syms)
            if (tc == 0) dcH(th) = h else acH(th) = h
            j += 17 + total
          }
        case 0xC0 | 0xC1 => // SOF0/1: baseline (extended) sequential
          if (segEnd - seg < 6) return None
          val prec = p(seg) & 0xFF
          if (prec != 8) return None
          height = be16(seg + 1)
          width = be16(seg + 3)
          val nc = p(seg + 5) & 0xFF
          if (width == 0 || height == 0 || (nc != 1 && nc != 3)) return None
          if (segEnd - seg < 6 + 3 * nc) return None
          comps = new Array[Comp](nc)
          var k = 0
          while (k < nc) {
            val o = seg + 6 + 3 * k
            val hv = p(o + 1) & 0xFF
            val c = Comp(p(o) & 0xFF, (hv >> 4) & 0xF, hv & 0xF, p(o + 2) & 0xFF)
            if (c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.tq > 3) return None
            comps(k) = c
            k += 1
          }
        case 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
          return None // progressive/arithmetic/hierarchical: not baseline
        case 0xDD => // DRI
          if (segEnd - seg < 2) return None
          restartInterval = be16(seg)
        case 0xDA => // SOS — entropy data follows
          if (comps == null) return None
          val ns = p(seg) & 0xFF
          if (ns != comps.length || segEnd - seg < 1 + 2 * ns + 3) return None
          var k = 0
          while (k < ns) {
            val cs = p(seg + 1 + 2 * k) & 0xFF
            val td = (p(seg + 2 + 2 * k) & 0xF0) >> 4
            val ta = p(seg + 2 + 2 * k) & 0x0F
            var c: Comp = null
            var ck = 0
            while (ck < comps.length) {
              if (comps(ck).id == cs) c = comps(ck)
              ck += 1
            }
            if (c == null || td > 3 || ta > 3) return None
            c.dcTable = td
            c.acTable = ta
            k += 1
          }
          return scan(p, segEnd, comps, width, height, qt, qtSeen, dcH, acH, restartInterval)
        case _ => // APPn/COM/etc: skip
      }
      i = segEnd
    }
    None
  }

  private def scan(p: Array[Byte], start: Int, comps: Array[Comp],
      width: Int, height: Int, qt: Array[Array[Int]], qtSeen: Array[Boolean],
      dcH: Array[Huff], acH: Array[Huff], restartInterval: Int): Option[Image] = {
    val nc = comps.length
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcuW = hMax * 8
    val mcuH = vMax * 8
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH
    if (width.toLong * height * (if (nc == 1) 1 else 3) > MaxPixels) return None
    var k = 0
    while (k < nc) {
      val c = comps(k)
      if (!qtSeen(c.tq)) return None
      c.compW = mcusX * c.h * 8
      c.compH = mcusY * c.v * 8
      if (c.compW.toLong * c.compH > MaxPixels) return None
      c.data = new Array[Byte](c.compW * c.compH)
      k += 1
    }

    val br = new BitReader(p, start)
    val coef = new Array[Int](64)
    val px = new Array[Int](64)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    var rstExpect = 0
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // byte-align then consume the RST marker
        br.reset()
        var pos = br.pos
        while (pos + 1 < p.length && (p(pos) & 0xFF) == 0xFF && (p(pos + 1) & 0xFF) == 0x00)
          pos += 2 // shouldn't happen at alignment, defensive
        if (pos + 1 >= p.length || (p(pos) & 0xFF) != 0xFF) return None
        val m = p(pos + 1) & 0xFF
        if (m < 0xD0 || m > 0xD7 || (m & 7) != rstExpect) return None
        rstExpect = (rstExpect + 1) & 7
        br.pos = pos + 2
        var ci = 0
        while (ci < nc) { comps(ci).pred = 0; ci += 1 }
      }
      val my = mcu / mcusX
      val mx = mcu % mcusX
      var ci = 0
      while (ci < nc) {
        val c = comps(ci)
        val dc = dcH(c.dcTable)
        val ac = acH(c.acTable)
        if (dc == null || ac == null) return None
        val q = qt(c.tq)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(coef, 0)
            val t = br.decodeHuff(dc)
            if (t < 0 || t > 15) return None
            val diff0 = if (t == 0) 0 else br.receive(t)
            if (diff0 == Int.MinValue) return None
            c.pred += extend(diff0, t)
            coef(0) = c.pred * q(0)
            var kk = 1
            var done = false
            while (!done && kk < 64) {
              val rs = br.decodeHuff(ac)
              if (rs < 0) return None
              val r = (rs >> 4) & 0xF
              val s = rs & 0xF
              if (s == 0) {
                if (r == 15) kk += 16 // ZRL
                else done = true // EOB
              } else {
                kk += r
                if (kk > 63) return None
                val v0 = br.receive(s)
                if (v0 == Int.MinValue) return None
                coef(Zigzag(kk)) = extend(v0, s) * q(Zigzag(kk))
                kk += 1
              }
            }
            idct8x8(coef, px)
            // place block into the component plane
            val ox = (mx * c.h + bx) * 8
            val oy = (my * c.v + by) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              val rowOff = (oy + yy) * c.compW + ox
              while (xx < 8) {
                c.data(rowOff + xx) = px(yy * 8 + xx).toByte
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    // assemble output raster
    if (nc == 1) {
      val c = comps(0)
      val out = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        System.arraycopy(c.data, y * c.compW, out, y * width, width)
        y += 1
      }
      Some(Image(width, height, 1, out))
    } else {
      // nearest-neighbor chroma upsample + YCbCr -> RGB (JFIF eq.)
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      val out = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yy = cy.data((y * cy.v / vMax) * cy.compW + (x * cy.h / hMax)) & 0xFF
          val b0 = cb.data((y * cb.v / vMax) * cb.compW + (x * cb.h / hMax)) & 0xFF
          val r0 = cr.data((y * cr.v / vMax) * cr.compW + (x * cr.h / hMax)) & 0xFF
          val rd = yy + 1.402 * (r0 - 128)
          val gd = yy - 0.344136 * (b0 - 128) - 0.714136 * (r0 - 128)
          val bd = yy + 1.772 * (b0 - 128)
          val o = (y * width + x) * 3
          out(o) = clamp(rd); out(o + 1) = clamp(gd); out(o + 2) = clamp(bd)
          x += 1
        }
        y += 1
      }
      Some(Image(width, height, 3, out))
    }
  }
  // scalastyle:on

  private def clamp(d: Double): Byte = {
    val r = math.round(d).toInt
    (if (r < 0) 0 else if (r > 255) 255 else r).toByte
  }
}
