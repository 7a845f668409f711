package graft.ops

/** From-spec JPEG (ITU-T T.81 / JFIF) decoder — completes the
  * real-codec family next to [[PngCodec]] (inflate+unfilter) and
  * [[GifCodec]] (LZW): marker parse → quant/Huffman table build →
  * entropy decode (DC prediction, AC run/size, byte unstuffing, RST
  * intervals) → dequantize → IDCT → level shift → chroma upsample →
  * YCbCr→RGB. Supports BASELINE/extended sequential (SOF0/1) and
  * PROGRESSIVE (SOF2: spectral selection + successive approximation,
  * DC/AC first and refinement scans with EOB-run state, T.81 §G);
  * arithmetic coding and hierarchical modes are declined with None,
  * as is anything malformed — the decoder never throws on hostile
  * bytes (same contract as the other codecs; fuzzed in JpegSpec).
  *
  * Both modes accumulate RAW coefficients into per-component planes
  * (progressive scans revisit them) and share one final
  * dequantize+IDCT pass.
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
        val b = p(pos) & 0xFF
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

  /** Frame component. `coefs` holds RAW (undequantized) coefficients
    * for the PADDED MCU-aligned block grid (bW×bH blocks × 64,
    * natural order per block); progressive scans revisit it across
    * SOS segments. `trueBw`/`trueBh` is the non-interleaved block
    * grid (T.81 A.2.2) that single-component scans iterate. */
  private final case class Comp(id: Int, h: Int, v: Int, tq: Int) {
    var dcTable: Int = 0
    var acTable: Int = 0
    var pred: Int = 0 // DC predictor (per scan, un-shifted)
    var coefs: Array[Int] = null
    var bW: Int = 0 // padded blocks across (mcusX * h)
    var bH: Int = 0
    var trueBw: Int = 0
    var trueBh: Int = 0
    var compW: Int = 0 // padded pixels
    var compH: Int = 0
    var data: Array[Byte] = null
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
    var progressive = false
    var mcusX = 0
    var mcusY = 0
    var hMax = 0
    var vMax = 0
    var sawScan = false
    // Baseline files may legally split components across several SOS
    // segments (one non-interleaved scan per component); track which
    // component ids a scan has covered so a partial decode is refused
    // instead of finishing with silently-zero chroma planes.
    val coveredIds = scala.collection.mutable.Set.empty[Int]
    def allCovered: Boolean = comps != null && comps.forall(c => coveredIds(c.id))

    def be16(i: Int): Int = ((p(i) & 0xFF) << 8) | (p(i + 1) & 0xFF)

    def allocate(): Boolean = {
      hMax = comps.map(_.h).max
      vMax = comps.map(_.v).max
      mcusX = (width + hMax * 8 - 1) / (hMax * 8)
      mcusY = (height + vMax * 8 - 1) / (vMax * 8)
      if (width.toLong * height * (if (comps.length == 1) 1 else 3) > MaxPixels) return false
      comps.forall { c =>
        if (!qtSeen(c.tq)) false
        else {
          c.bW = mcusX * c.h
          c.bH = mcusY * c.v
          c.trueBw = (width * c.h + hMax * 8 - 1) / (hMax * 8)
          c.trueBh = (height * c.v + vMax * 8 - 1) / (vMax * 8)
          c.compW = c.bW * 8
          c.compH = c.bH * 8
          if (c.compW.toLong * c.compH > MaxPixels) false
          else {
            c.coefs = new Array[Int](c.bW * c.bH * 64)
            true
          }
        }
      }
    }

    var i = 2
    while (i + 4 <= p.length) {
      if ((p(i) & 0xFF) != 0xFF) return None
      var m = p(i + 1) & 0xFF
      // skip fill bytes
      var fi = i
      while (m == 0xFF && fi + 2 < p.length) { fi += 1; m = p(fi + 1) & 0xFF }
      i = fi
      if (m == 0xD9) { // EOI
        // baseline requires every component decoded; progressive may
        // legally stop after any complete scan (coarse-only decode)
        return if (sawScan && (progressive || allCovered))
          finish(comps, width, height, qt, hMax, vMax) else None
      }
      if (m >= 0xD0 && m <= 0xD7) return None // stray RST outside a scan
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
        case 0xC0 | 0xC1 | 0xC2 => // SOF0/1 baseline/extended, SOF2 progressive
          if (comps != null) return None // one frame only
          progressive = m == 0xC2
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
        case 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
          return None // lossless/arithmetic/hierarchical: unsupported
        case 0xDD => // DRI
          if (segEnd - seg < 2) return None
          restartInterval = be16(seg)
        case 0xDA => // SOS
          if (comps == null) return None
          if (!sawScan && !allocate()) return None
          val ns = p(seg) & 0xFF
          if (ns < 1 || ns > comps.length || segEnd - seg < 1 + 2 * ns + 3) return None
          val scanComps = new Array[Comp](ns)
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
            scanComps(k) = c
            k += 1
          }
          val ss = p(seg + 1 + 2 * ns) & 0xFF
          val se = p(seg + 2 + 2 * ns) & 0xFF
          val aa = p(seg + 3 + 2 * ns) & 0xFF
          val ah = (aa >> 4) & 0xF
          val al = aa & 0xF
          val (sS, sE) = if (progressive) (ss, se) else (0, 63)
          if (sS > sE || sE > 63 || (sS == 0 && sE != (if (progressive) 0 else 63) && progressive))
            return None
          if (progressive && sS > 0 && ns != 1) return None // AC scans: one component
          val br = new BitReader(p, segEnd)
          val ok = decodeScan(br, p, scanComps, dcH, acH, restartInterval,
            mcusX, mcusY, progressive, sS, sE, ah, al)
          if (!ok) return None
          sawScan = true
          scanComps.foreach(c => coveredIds += c.id)
          if (!progressive && allCovered) { // baseline: all components decoded
            return finish(comps, width, height, qt, hMax, vMax)
          }
          // progressive refinement scans, or remaining baseline
          // non-interleaved scans: continue from where the entropy
          // data ended
          br.reset()
          i = br.pos
          // find next marker (skip any pad bytes)
          while (i + 1 < p.length &&
            !((p(i) & 0xFF) == 0xFF && (p(i + 1) & 0xFF) != 0x00)) i += 1
          if (i + 1 >= p.length)
            return if (progressive || allCovered)
              finish(comps, width, height, qt, hMax, vMax) else None
          m = 0 // sentinel: loop continues at the found marker, not segEnd
        case _ => // APPn/COM/etc: skip
      }
      if (m != 0) i = segEnd
    }
    if (sawScan && (progressive || allCovered))
      finish(comps, width, height, qt, hMax, vMax)
    else None
  }

  /** One entropy-coded scan into the coefficient planes. Handles all
    * four progressive scan kinds (DC/AC × first/refinement) plus the
    * baseline full-band interleaved scan; restart markers reset DC
    * predictors and the EOB run. */
  private def decodeScan(br: BitReader, p: Array[Byte], scanComps: Array[Comp],
      dcH: Array[Huff], acH: Array[Huff], restartInterval: Int,
      mcusX: Int, mcusY: Int, progressive: Boolean,
      ss: Int, se: Int, ah: Int, al: Int): Boolean = {
    val ns = scanComps.length
    scanComps.foreach(_.pred = 0)
    var eobrun = 0
    var rstExpect = 0

    def consumeRst(): Boolean = {
      br.reset()
      var pos = br.pos
      while (pos + 1 < p.length && (p(pos) & 0xFF) == 0xFF && (p(pos + 1) & 0xFF) == 0x00)
        pos += 2
      if (pos + 1 >= p.length || (p(pos) & 0xFF) != 0xFF) return false
      val m = p(pos + 1) & 0xFF
      if (m < 0xD0 || m > 0xD7 || (m & 7) != rstExpect) return false
      rstExpect = (rstExpect + 1) & 7
      br.pos = pos + 2
      scanComps.foreach(_.pred = 0)
      eobrun = 0
      true
    }

    // ---- per-block decoders over a coefficient slice [off, off+64)
    def dcFirst(c: Comp, off: Int): Boolean = {
      val t = br.decodeHuff(dcH(c.dcTable))
      if (t < 0 || t > 15) return false
      val diff = if (t == 0) 0 else {
        val v = br.receive(t)
        if (v == Int.MinValue) return false
        extend(v, t)
      }
      c.pred += diff
      c.coefs(off) = c.pred << al
      true
    }

    def dcRefine(c: Comp, off: Int): Boolean = {
      val b = br.readBit()
      if (b < 0) return false
      if (b == 1) c.coefs(off) |= (1 << al)
      true
    }

    def acBaselineOrFull(c: Comp, off: Int): Boolean = {
      var kk = 1
      var done = false
      while (!done && kk < 64) {
        val rs = br.decodeHuff(acH(c.acTable))
        if (rs < 0) return false
        val r = (rs >> 4) & 0xF
        val s = rs & 0xF
        if (s == 0) {
          if (r == 15) kk += 16
          else done = true
        } else {
          kk += r
          if (kk > 63) return false
          val v = br.receive(s)
          if (v == Int.MinValue) return false
          c.coefs(off + Zigzag(kk)) = extend(v, s)
          kk += 1
        }
      }
      true
    }

    def acFirst(c: Comp, off: Int): Boolean = {
      if (eobrun > 0) { eobrun -= 1; return true }
      var k = ss
      while (k <= se) {
        val rs = br.decodeHuff(acH(c.acTable))
        if (rs < 0) return false
        val r = (rs >> 4) & 0xF
        val s = rs & 0xF
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else {
            eobrun = (1 << r) - 1
            if (r > 0) {
              val e = br.receive(r)
              if (e == Int.MinValue) return false
              eobrun += e
            }
            return true
          }
        } else {
          k += r
          if (k > se) return false
          val v = br.receive(s)
          if (v == Int.MinValue) return false
          c.coefs(off + Zigzag(k)) = extend(v, s) << al
          k += 1
        }
      }
      true
    }

    def acRefine(c: Comp, off: Int): Boolean = {
      val p1 = 1 << al
      val m1 = -1 << al
      var k = ss
      if (eobrun == 0) {
        var break = false
        while (k <= se && !break) {
          val rs = br.decodeHuff(acH(c.acTable))
          if (rs < 0) return false
          var r = (rs >> 4) & 0xF
          val s = rs & 0xF
          var newval = 0
          if (s == 0) {
            if (r < 15) { // EOB run begins (covers this block's tail)
              eobrun = (1 << r)
              if (r > 0) {
                val e = br.receive(r)
                if (e == Int.MinValue) return false
                eobrun += e
              }
              break = true
            }
            // r == 15: skip 16 zero-history positions, refining en route
          } else {
            if (s != 1) return false // refinement codes only ±1
            val b = br.receive(1)
            if (b == Int.MinValue) return false
            newval = if (b == 1) p1 else m1
          }
          if (!break) {
            // advance over the band: correction bits on nonzero history,
            // count r down on zero-history positions, then place newval
            var placed = false
            while (k <= se && !placed) {
              val z = off + Zigzag(k)
              if (c.coefs(z) != 0) {
                val b = br.readBit()
                if (b < 0) return false
                if (b == 1 && (c.coefs(z) & p1) == 0)
                  c.coefs(z) += (if (c.coefs(z) >= 0) p1 else m1)
              } else {
                if (r == 0) {
                  if (newval != 0) { c.coefs(z) = newval; placed = true }
                  else placed = true // end of a ZRL(15,0) run of 16
                } else r -= 1
              }
              k += 1
            }
          }
        }
      }
      if (eobrun > 0) {
        // EOB-run covers the rest of the band: refine existing nonzeros
        while (k <= se) {
          val z = off + Zigzag(k)
          if (c.coefs(z) != 0) {
            val b = br.readBit()
            if (b < 0) return false
            if (b == 1 && (c.coefs(z) & p1) == 0)
              c.coefs(z) += (if (c.coefs(z) >= 0) p1 else m1)
          }
          k += 1
        }
        eobrun -= 1
      }
      true
    }

    if (!progressive || (ss == 0 && ns >= 1)) {
      // interleaved MCU order (baseline full-band, or progressive DC)
      val interleaved = ns > 1
      val totalUnits =
        if (interleaved) mcusX * mcusY
        else {
          val c = scanComps(0)
          c.trueBw * c.trueBh
        }
      var unit = 0
      while (unit < totalUnits) {
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          if (!consumeRst()) return false
        }
        if (interleaved) {
          val my = unit / mcusX
          val mx = unit % mcusX
          var ci = 0
          while (ci < ns) {
            val c = scanComps(ci)
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                val off = (((my * c.v + by) * c.bW) + (mx * c.h + bx)) * 64
                if (progressive) {
                  if (ah == 0) { if (!dcFirst(c, off)) return false }
                  else if (!dcRefine(c, off)) return false
                } else {
                  if (!dcFirst(c, off)) return false
                  if (!acBaselineOrFull(c, off)) return false
                }
                bx += 1
              }
              by += 1
            }
            ci += 1
          }
        } else {
          val c = scanComps(0)
          val by = unit / c.trueBw
          val bx = unit % c.trueBw
          val off = (by * c.bW + bx) * 64
          if (progressive) {
            if (ah == 0) { if (!dcFirst(c, off)) return false }
            else if (!dcRefine(c, off)) return false
          } else {
            if (!dcFirst(c, off)) return false
            if (!acBaselineOrFull(c, off)) return false
          }
        }
        unit += 1
      }
      true
    } else {
      // progressive AC scan: single component, non-interleaved order
      val c = scanComps(0)
      val total = c.trueBw * c.trueBh
      var unit = 0
      while (unit < total) {
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          if (!consumeRst()) return false
        }
        val by = unit / c.trueBw
        val bx = unit % c.trueBw
        val off = (by * c.bW + bx) * 64
        if (ah == 0) { if (!acFirst(c, off)) return false }
        else if (!acRefine(c, off)) return false
        unit += 1
      }
      true
    }
  }

  /** Dequantize + IDCT every block, then upsample/color-convert. */
  private def finish(comps: Array[Comp], width: Int, height: Int,
      qt: Array[Array[Int]], hMax: Int, vMax: Int): Option[Image] = {
    val coef = new Array[Int](64)
    val px = new Array[Int](64)
    var ci = 0
    while (ci < comps.length) {
      val c = comps(ci)
      if (c.coefs == null) return None
      val q = qt(c.tq)
      c.data = new Array[Byte](c.compW * c.compH)
      var by = 0
      while (by < c.bH) {
        var bx = 0
        while (bx < c.bW) {
          val off = (by * c.bW + bx) * 64
          var j = 0
          while (j < 64) { coef(j) = c.coefs(off + j) * q(j); j += 1 }
          idct8x8(coef, px)
          val ox = bx * 8
          val oy = by * 8
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

    if (comps.length == 1) {
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
