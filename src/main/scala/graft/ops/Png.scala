package graft.ops

import java.util.zip.{CRC32, Deflater, Inflater}

/** Real PNG codec, written against the public PNG specification
  * (W3C PNG, 2nd ed. / RFC 2083): chunk stream with CRC-32, zlib
  * (DEFLATE) compressed scanlines, one filter byte per scanline from
  * the five-filter set (None/Sub/Up/Average/Paeth). Needs only
  * `java.util.zip` — no native image library — so the multimodal
  * decode seam carries an actual pixel decoder in this environment,
  * not just header sniffing.
  *
  * Supported: color types greyscale (0), truecolor (2), palette (3,
  * expanded to RGB via PLTE), grey+alpha (4), RGBA (6); bit depths
  * 1/2/4 (grey + palette, per the spec's valid combinations), 8, and
  * 16; BOTH interlace methods (round 15 continuation) — Adam7's
  * seven passes each unfilter as their own sub-image (per-pass
  * filter distance and previous-row state) before scattering into
  * the raster at the published row/column origins and strides.
  * The output raster stays 8 bits per sample: sub-byte grey samples
  * scale by the spec's bit-replication factors (255/85/17), 16-bit
  * samples reduce to their high byte (the spec's own recommended
  * depth rescaling), palette indices pass through unscaled.
  *
  * Garbage-safety contract (same as [[Multimodal.ImageHeader]]):
  * `decode` NEVER throws on truncated, corrupt, or hostile bytes —
  * wrong signature, bad CRC, bogus declared sizes, or an
  * `Inflater`-rejected stream all return None. Decoded size is capped
  * (`MaxPixelBytes`) so a crafted 65535×65535 header cannot OOM an
  * executor: the cap is checked BEFORE any allocation.
  *
  * Scale shape: the codec is a pure `Array[Byte] => Option[Image]`
  * function invoked inside `mapPartitions` — per-row work on
  * executors, zero driver involvement, no shared state.
  */
object PngCodec {

  /** Decoded raster: `pixels` is row-major, `channels` interleaved,
    * 8 bits per sample (palette images arrive expanded to 3-channel
    * RGB). */
  final case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  /** Refuse to allocate more than this many raw pixel bytes (64 MiB —
    * a 4096×4096 RGBA image; curation-pipeline thumbnails are far
    * smaller, and a hostile header names up to 16 EiB). */
  val MaxPixelBytes: Long = 64L << 20

  private val Signature = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  // ------------------------------------------------------------ decode

  def decode(p: Array[Byte]): Option[Image] = {
    if (p.length < 8 + 25 || !java.util.Arrays.equals(
        java.util.Arrays.copyOf(p, 8), Signature)) return None
    def be32(i: Int): Long =
      ((p(i) & 0xFF).toLong << 24) | ((p(i + 1) & 0xFF) << 16) |
        ((p(i + 2) & 0xFF) << 8) | (p(i + 3) & 0xFF)

    var width = 0; var height = 0; var bitDepth = 0; var colorType = -1
    var interlaced = false
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var sawIhdr = false; var sawIend = false

    var i = 8L
    while (!sawIend && i + 12 <= p.length) {
      val at = i.toInt
      val len = be32(at)
      if (len > Int.MaxValue - 12 || i + 12 + len > p.length) return None
      val ctype = new String(p, at + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new CRC32()
      crc.update(p, at + 4, 4 + len.toInt)
      if (crc.getValue != be32(at + 8 + len.toInt)) return None
      ctype match {
        case "IHDR" =>
          if (len != 13) return None
          width = be32(at + 8).toInt; height = be32(at + 12).toInt
          bitDepth = p(at + 16) & 0xFF; colorType = p(at + 17) & 0xFF
          val compression = p(at + 18) & 0xFF
          val filterMethod = p(at + 19) & 0xFF
          interlaced = (p(at + 20) & 0xFF) match {
            case 0 => false
            case 1 => true
            case _ => return None
          }
          if (compression != 0 || filterMethod != 0) return None
          sawIhdr = true
        case "PLTE" =>
          if (len % 3 != 0 || len > 768) return None
          palette = java.util.Arrays.copyOfRange(p, at + 8, at + 8 + len.toInt)
        case "IDAT" => idat.write(p, at + 8, len.toInt)
        case "IEND" => sawIend = true
        case _      => () // ancillary chunk — skip (tRNS/gAMA/tEXt/…)
      }
      i += 12 + len
    }
    if (!sawIhdr || !sawIend || width <= 0 || height <= 0) return None
    val srcCh = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    // the spec's valid depth/color combinations
    val depthOk = colorType match {
      case 0 => Set(1, 2, 4, 8, 16)(bitDepth)
      case 3 => Set(1, 2, 4, 8)(bitDepth)
      case _ => bitDepth == 8 || bitDepth == 16
    }
    if (!depthOk) return None
    if (colorType == 3 && palette == null) return None
    val bitsPerPixel = bitDepth * srcCh
    val filterBpp = math.max(1, bitsPerPixel / 8) // filter byte distance
    def rowBytesOf(w: Int): Long = (w.toLong * bitsPerPixel + 7) / 8

    // Adam7 pass geometry (x0, y0, dx, dy); non-interlaced = one
    // full pass
    val passes: Seq[(Int, Int, Int, Int)] =
      if (!interlaced) Seq((0, 0, 1, 1))
      else Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    def passDims(p: (Int, Int, Int, Int)): (Int, Int) = {
      val (x0, y0, dx, dy) = p
      (math.max(0, (width - x0 + dx - 1) / dx), math.max(0, (height - y0 + dy - 1) / dy))
    }
    // Bound each factor BEFORE forming products: width/height are
    // attacker-controlled 31-bit values, and (rowBytes + 1) * height
    // can wrap a Long otherwise.
    if (width.toLong * height > MaxPixelBytes) return None
    val rawLen = passes.map { ps =>
      val (pw, ph) = passDims(ps)
      if (pw == 0 || ph == 0) 0L else (rowBytesOf(pw) + 1) * ph
    }.sum
    if (rawLen <= 0 || rawLen > MaxPixelBytes) return None

    // zlib-inflate the concatenated IDAT stream into exactly rawLen bytes
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None // truncated
        off += n
      }
      if (off != raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()

    // per-sample extraction helpers over an UNFILTERED pass row.
    // sub-byte grey samples scale by the spec replication factors;
    // palette indices pass through; 16-bit keeps the high byte.
    val greyScale = bitDepth match {
      case 1 => 255; case 2 => 85; case 4 => 17; case _ => 1
    }
    val out = new Array[Byte]((width.toLong * height * srcCh).toInt)
    val outStride = width * srcCh
    var rawAt = 0
    passes.foreach { case ps @ (x0, y0, dx, dy) =>
      val (pw, ph) = passDims(ps)
      if (pw > 0 && ph > 0) {
        val rb = rowBytesOf(pw).toInt
        val cur = new Array[Byte](rb)
        val prev = new Array[Byte](rb)
        var y = 0
        while (y < ph) {
          val ft = raw(rawAt) & 0xFF
          System.arraycopy(raw, rawAt + 1, cur, 0, rb)
          rawAt += 1 + rb
          var x = 0
          ft match {
            case 0 => ()
            case 1 =>
              x = filterBpp
              while (x < rb) { cur(x) = (cur(x) + (cur(x - filterBpp) & 0xFF)).toByte; x += 1 }
            case 2 =>
              while (x < rb) { cur(x) = (cur(x) + (prev(x) & 0xFF)).toByte; x += 1 }
            case 3 =>
              while (x < rb) {
                val a = if (x >= filterBpp) cur(x - filterBpp) & 0xFF else 0
                cur(x) = (cur(x) + (a + (prev(x) & 0xFF)) / 2).toByte; x += 1
              }
            case 4 =>
              while (x < rb) {
                val a = if (x >= filterBpp) cur(x - filterBpp) & 0xFF else 0
                val c = if (x >= filterBpp) prev(x - filterBpp) & 0xFF else 0
                cur(x) = (cur(x) + paeth(a, prev(x) & 0xFF, c)).toByte; x += 1
              }
            case _ => return None
          }
          // scatter this pass row's samples into the raster
          val outY = y0 + y.toLong * dy
          var px = 0
          while (px < pw) {
            val outX = x0 + px.toLong * dx
            val dst = (outY * outStride + outX * srcCh).toInt
            var ch = 0
            while (ch < srcCh) {
              val sampleIx = px * srcCh + ch
              val v = bitDepth match {
                case 8 => cur(sampleIx) & 0xFF
                case 16 => cur(2 * sampleIx) & 0xFF // high byte
                case d =>
                  val bitAt = sampleIx * d
                  val b = cur(bitAt >> 3) & 0xFF
                  val shift = 8 - d - (bitAt & 7)
                  ((b >> shift) & ((1 << d) - 1)) *
                    (if (colorType == 3) 1 else greyScale)
              }
              out(dst + ch) = v.toByte
              ch += 1
            }
            px += 1
          }
          System.arraycopy(cur, 0, prev, 0, rb)
          y += 1
        }
      }
    }

    if (colorType == 3) {
      // expand palette indices to RGB; out-of-range index → None
      // (hostile or corrupt), matching the never-guess contract
      val rgb = new Array[Byte](width * height * 3)
      val nEntries = palette.length / 3
      var k = 0
      while (k < width * height) {
        val ix = out(k) & 0xFF
        if (ix >= nEntries) return None
        rgb(3 * k) = palette(3 * ix)
        rgb(3 * k + 1) = palette(3 * ix + 1)
        rgb(3 * k + 2) = palette(3 * ix + 2)
        k += 1
      }
      Some(Image(width, height, 3, rgb))
    } else Some(Image(width, height, srcCh, out))
  }

  /** Paeth predictor, verbatim from the spec's reference algorithm —
    * the closest of a (left) / b (up) / c (up-left) to a + b − c. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val pp = a + b - c
    val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // ------------------------------------------------------------ encode

  /** Encode an 8-bit raster as a valid PNG. `filterForRow` picks the
    * per-scanline filter type (0-4); the default cycles through all
    * five, which both exercises every unfilter path in round-trip
    * tests and approximates the adaptive filtering real encoders do.
    * Channels → color type: 1=grey, 2=grey+alpha, 3=RGB, 4=RGBA.
    */
  def encode(img: Image, filterForRow: Int => Int = _ % 5): Array[Byte] = {
    val Image(width, height, channels, pixels) = img
    require(width > 0 && height > 0, s"encode: bad dims ${width}x$height")
    require(channels >= 1 && channels <= 4, s"encode: channels=$channels")
    require(pixels.length == width * height * channels,
      s"encode: ${pixels.length} pixel bytes != $width*$height*$channels")
    val colorType = channels match { case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6 }
    val stride = width * channels
    val bpp = channels

    // filter scanlines
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      val ft = ((filterForRow(y) % 5) + 5) % 5
      val src = y * stride
      val prv = src - stride
      val dst = y * (stride + 1)
      raw(dst) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = pixels(src + x) & 0xFF
        val a = if (x >= bpp) pixels(src + x - bpp) & 0xFF else 0
        val b = if (y > 0) pixels(prv + x) & 0xFF else 0
        val c = if (y > 0 && x >= bpp) pixels(prv + x - bpp) & 0xFF else 0
        val v = ft match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - (a + b) / 2
          case 4 => cur - paeth(a, b, c)
        }
        raw(dst + 1 + x) = v.toByte
        x += 1
      }
      y += 1
    }

    // zlib-deflate
    val def_ = new Deflater()
    val compressed = try {
      def_.setInput(raw); def_.finish()
      val buf = new Array[Byte](8192)
      val bos = new java.io.ByteArrayOutputStream()
      while (!def_.finished()) bos.write(buf, 0, def_.deflate(buf))
      bos.toByteArray
    } finally def_.end()

    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, 8)
    def be32(v: Long): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length.toLong), 0, 4)
      val tb = ctype.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val crc = new CRC32()
      crc.update(tb); crc.update(data)
      out.write(be32(crc.getValue), 0, 4)
    }
    val ihdr = new java.io.ByteArrayOutputStream()
    ihdr.write(be32(width.toLong), 0, 4); ihdr.write(be32(height.toLong), 0, 4)
    ihdr.write(8); ihdr.write(colorType); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk("IHDR", ihdr.toByteArray)
    chunk("IDAT", compressed)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ------------------------------------------------------------ resize

  /** Exact box-average downscale/upscale: output pixel (X, Y, ch) is
    * the mean of the source rectangle [X·w/W, (X+1)·w/W) ×
    * [Y·h/H, (Y+1)·h/H) (bounds by integer floor, min 1 source pixel),
    * accumulated in integer and rounded half-up — fully deterministic,
    * no floating point, so an oracle can re-derive every output byte.
    */
  def resizeBox(img: Image, newW: Int, newH: Int): Image = {
    require(newW > 0 && newH > 0, s"resizeBox: bad target ${newW}x$newH")
    val Image(w, h, ch, px) = img
    val out = new Array[Byte](newW * newH * ch)
    var yy = 0
    while (yy < newH) {
      val y0 = (yy.toLong * h / newH).toInt
      val y1 = math.max(y0 + 1, ((yy + 1).toLong * h / newH).toInt)
      var xx = 0
      while (xx < newW) {
        val x0 = (xx.toLong * w / newW).toInt
        val x1 = math.max(x0 + 1, ((xx + 1).toLong * w / newW).toInt)
        var c = 0
        while (c < ch) {
          var sum = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { sum += px((y * w + x) * ch + c) & 0xFF; x += 1 }
            y += 1
          }
          val area = (y1 - y0).toLong * (x1 - x0)
          out((yy * newW + xx) * ch + c) = ((sum + area / 2) / area).toByte
          c += 1
        }
        xx += 1
      }
      yy += 1
    }
    Image(newW, newH, ch, out)
  }

  /** Bilinear resample in EXACT integer arithmetic — the standard
    * vision-preprocessing filter (box averaging blurs upscales and
    * aliases non-integer ratios), kept oracle-replayable like
    * [[resizeBox]]: no floating point anywhere.
    *
    * Half-pixel-center convention (what the mainstream image
    * libraries use, align_corners = false): output center X maps to
    * source position (X + 0.5)·w/W − 0.5, carried as the integer
    * numerator (2X+1)·w − W over denominator 2W (and likewise for
    * rows); positions before the first / after the last center clamp
    * (edge replication). Each output byte is the 4-tap weighted sum
    * over denominator (2W)·(2H), rounded half-up — every output is a
    * pure integer function of the inputs.
    */
  def resizeBilinear(img: Image, newW: Int, newH: Int): Image = {
    require(newW > 0 && newH > 0, s"resizeBilinear: bad target ${newW}x$newH")
    val Image(w, h, ch, px) = img
    val out = new Array[Byte](newW * newH * ch)
    val denX = 2L * newW
    val denY = 2L * newH
    var yy = 0
    while (yy < newH) {
      val syNum0 = (2L * yy + 1) * h - newH
      val syNum = if (syNum0 < 0) 0L else syNum0
      var y0 = (syNum / denY).toInt
      if (y0 > h - 1) y0 = h - 1
      val fy = if (y0 == (h - 1)) 0L else syNum % denY
      val y1 = if (fy == 0L) y0 else y0 + 1
      var xx = 0
      while (xx < newW) {
        val sxNum0 = (2L * xx + 1) * w - newW
        val sxNum = if (sxNum0 < 0) 0L else sxNum0
        var x0 = (sxNum / denX).toInt
        if (x0 > w - 1) x0 = w - 1
        val fx = if (x0 == (w - 1)) 0L else sxNum % denX
        val x1 = if (fx == 0L) x0 else x0 + 1
        var c = 0
        while (c < ch) {
          def p(x: Int, y: Int): Long = (px((y * w + x) * ch + c) & 0xFF).toLong
          val acc = (denX - fx) * (denY - fy) * p(x0, y0) +
            fx * (denY - fy) * p(x1, y0) +
            (denX - fx) * fy * p(x0, y1) +
            fx * fy * p(x1, y1)
          val den = denX * denY
          out((yy * newW + xx) * ch + c) = ((acc + den / 2) / den).toByte
          c += 1
        }
        xx += 1
      }
      yy += 1
    }
    Image(newW, newH, ch, out)
  }
}
