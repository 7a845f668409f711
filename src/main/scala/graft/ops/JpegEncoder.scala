package graft.ops

/** From-spec BASELINE JPEG (ITU-T T.81 / JFIF) encoder — the encode
  * half of [[JpegCodec]], and the frame producer for the MJPEG video
  * path (see [[AviCodec]]): deterministic bytes in, real decodable
  * JPEG out, no JVM imaging dependency.
  *
  * Shape: level shift (+ YCbCr conversion for 3-channel input, JFIF
  * matrix) → 8×8 block FDCT (double-precision separable DCT-II) →
  * quantization with the Annex K example tables scaled by the
  * standard quality curve (scale = q<50 ? 5000/q : 200−2q, entries
  * clamped to [1,255]) → entropy coding with the Annex K "typical"
  * Huffman tables (K.3–K.6): DC prediction + magnitude categories,
  * AC run/size with ZRL and EOB, FF byte stuffing.
  *
  * Subsampling is 4:4:4 (every component full resolution, Hi=Vi=1) —
  * the simplest spec-legal layout; one interleaved scan, so the
  * output is decodable by any baseline decoder including our own
  * (round-trip parity asserted in JpegSpec, plus cross-validation
  * against the JDK's independent ImageIO decoder).
  *
  * Input is [[PngCodec.Image]] with 1 (grayscale) or 3 (RGB)
  * channels. Output is deterministic: same pixels + quality → same
  * bytes, on any JVM (all math is integer or strict double).
  */
object JpegEncoder {

  import PngCodec.Image

  // ---- Annex K example tables (T.81 §K.1, K.3) ----

  private val LumaQuant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  private val ChromaQuant: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  private val DcLumaBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).toArray
  private val DcChromaBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).toArray

  private val AcLumaBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  private val AcChromaBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Zigzag order shared with the decoder. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical code/size per symbol from a (bits, vals) table spec —
    * the encode-side mirror of the decoder's mincode/maxcode walk. */
  private final class HuffEnc(bits: Array[Int], vals: Array[Int]) {
    val code = new Array[Int](256)
    val size = new Array[Int](256)
    locally {
      var c = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l - 1)) {
          code(vals(k)) = c
          size(vals(k)) = l
          c += 1; k += 1; i += 1
        }
        c <<= 1
        l += 1
      }
    }
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, size: Int): Unit = {
      var i = size - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xFF)
          if ((acc & 0xFF) == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 §B.1.1.5). */
    def flush(): Unit = if (nbits > 0) {
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      out.write(acc & 0xFF)
      if ((acc & 0xFF) == 0xFF) out.write(0x00)
      acc = 0; nbits = 0
    }
  }

  private val CosTable: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
        u += 1
      }
      x += 1
    }
    t
  }

  /** Forward DCT-II of one level-shifted 8×8 block, natural order. */
  private def fdct(block: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          val cy = CosTable(y * 8 + u)
          while (x < 8) {
            s += block(y * 8 + x) * cy * CosTable(x * 8 + v)
            x += 1
          }
          y += 1
        }
        val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
        out(u * 8 + v) = 0.25 * cu * cv * s
        v += 1
      }
      u += 1
    }
    out
  }

  /** Scale an Annex K table by the standard quality curve. */
  private[graft] def scaledQuant(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map { v =>
      val s = (v * scale + 50) / 100
      math.max(1, math.min(255, s))
    }
  }

  /** Magnitude category (number of bits) of a DC diff / AC value. */
  private def category(v: Int): Int = {
    var a = math.abs(v)
    var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** Encode `img` (1 or 3 channels) as a baseline 4:4:4 JFIF JPEG. */
  def encode(img: Image, quality: Int = 75): Array[Byte] = {
    require(img.channels == 1 || img.channels == 3,
      s"jpeg encode: ${img.channels}-channel input (need 1=gray or 3=rgb)")
    require(img.width > 0 && img.height > 0, "jpeg encode: empty image")
    val w = img.width
    val h = img.height
    val nComp = img.channels

    // component planes, level-shifted to [-128, 127]
    val planes = Array.ofDim[Double](nComp, w * h)
    var i = 0
    while (i < w * h) {
      if (nComp == 1) planes(0)(i) = (img.pixels(i) & 0xFF) - 128.0
      else {
        val r = (img.pixels(i * 3) & 0xFF).toDouble
        val g = (img.pixels(i * 3 + 1) & 0xFF).toDouble
        val b = (img.pixels(i * 3 + 2) & 0xFF).toDouble
        planes(0)(i) = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        planes(1)(i) = -0.168736 * r - 0.331264 * g + 0.5 * b
        planes(2)(i) = 0.5 * r - 0.418688 * g - 0.081312 * b
      }
      i += 1
    }

    val quant = Array(scaledQuant(LumaQuant, quality),
      scaledQuant(ChromaQuant, quality))
    val dcEnc = Array(new HuffEnc(DcLumaBits, DcLumaVals),
      new HuffEnc(DcChromaBits, DcChromaVals))
    val acEnc = Array(new HuffEnc(AcLumaBits, AcLumaVals),
      new HuffEnc(AcChromaBits, AcChromaVals))

    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xFF); u8(m) }

    marker(0xD8) // SOI
    // APP0 / JFIF 1.01, no thumbnail
    marker(0xE0); u16(16)
    Array('J', 'F', 'I', 'F', 0.toChar).foreach(c => u8(c.toInt))
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    // DQT (one segment per table, 8-bit precision)
    val nTables = if (nComp == 1) 1 else 2
    var t = 0
    while (t < nTables) {
      marker(0xDB); u16(67); u8(t)
      var z = 0
      while (z < 64) { u8(quant(t)(Zigzag(z))); z += 1 }
      t += 1
    }
    // SOF0: baseline, 8-bit samples, Hi=Vi=1 (4:4:4)
    marker(0xC0); u16(8 + 3 * nComp); u8(8); u16(h); u16(w); u8(nComp)
    var c = 0
    while (c < nComp) {
      u8(c + 1); u8(0x11); u8(if (c == 0) 0 else 1)
      c += 1
    }
    // DHT segments
    def dht(clazz: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xC4); u16(19 + vals.length); u8((clazz << 4) | id)
      bits.foreach(u8); vals.foreach(u8)
    }
    dht(0, 0, DcLumaBits, DcLumaVals)
    dht(1, 0, AcLumaBits, AcLumaVals)
    if (nComp == 3) {
      dht(0, 1, DcChromaBits, DcChromaVals)
      dht(1, 1, AcChromaBits, AcChromaVals)
    }
    // SOS: one interleaved scan over all components
    marker(0xDA); u16(6 + 2 * nComp); u8(nComp)
    c = 0
    while (c < nComp) {
      u8(c + 1); u8(if (c == 0) 0x00 else 0x11)
      c += 1
    }
    u8(0); u8(63); u8(0) // Ss/Se/Ah|Al for baseline

    // entropy-coded data: MCU = one 8×8 block per component (4:4:4)
    val bw = new BitWriter(out)
    val dcPred = new Array[Int](nComp)
    val block = new Array[Double](64)
    val mcuRows = (h + 7) / 8
    val mcuCols = (w + 7) / 8
    var my = 0
    while (my < mcuRows) {
      var mx = 0
      while (mx < mcuCols) {
        c = 0
        while (c < nComp) {
          val ti = if (c == 0) 0 else 1
          // gather the block, clamping coordinates (edge replication —
          // the standard fill that avoids ringing at partial MCUs)
          var y = 0
          while (y < 8) {
            val sy = math.min(h - 1, my * 8 + y)
            var x = 0
            while (x < 8) {
              val sx = math.min(w - 1, mx * 8 + x)
              block(y * 8 + x) = planes(c)(sy * w + sx)
              x += 1
            }
            y += 1
          }
          val coef = fdct(block)
          // quantize in zigzag order (round half up toward +Inf via
          // math.round — spec-legal: T.81's quantizer is informative,
          // any deterministic rounding decodes consistently)
          val zz = new Array[Int](64)
          var z = 0
          while (z < 64) {
            val nat = Zigzag(z)
            zz(z) = math.round(coef(nat) / quant(ti)(nat)).toInt
            z += 1
          }
          // DC: predicted difference, category + magnitude bits
          val diff = zz(0) - dcPred(c)
          dcPred(c) = zz(0)
          val dcat = category(diff)
          bw.put(dcEnc(ti).code(dcat), dcEnc(ti).size(dcat))
          if (dcat > 0) {
            val bitsV = if (diff < 0) diff + (1 << dcat) - 1 else diff
            bw.put(bitsV, dcat)
          }
          // AC: run/size symbols with ZRL and EOB
          var run = 0
          z = 1
          while (z < 64) {
            if (zz(z) == 0) run += 1
            else {
              while (run > 15) { bw.put(acEnc(ti).code(0xF0), acEnc(ti).size(0xF0)); run -= 16 }
              val acat = category(zz(z))
              val sym = (run << 4) | acat
              bw.put(acEnc(ti).code(sym), acEnc(ti).size(sym))
              val bitsV = if (zz(z) < 0) zz(z) + (1 << acat) - 1 else zz(z)
              bw.put(bitsV, acat)
              run = 0
            }
            z += 1
          }
          if (run > 0) bw.put(acEnc(ti).code(0x00), acEnc(ti).size(0x00)) // EOB
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }
}
