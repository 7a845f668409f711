package graft.ops

/** From-spec Windows BMP (DIB) decoder — the uncompressed-raster rung
  * of the image codec ladder next to [[PngCodec]] (inflate+filter),
  * [[GifCodec]] (LZW) and [[JpegCodec]] (DCT). Reference behavior:
  * none (the reference pipeline has no image layer); §2.6 multimodal
  * extension surface.
  *
  * Layout per the public BMP/DIB file format: a 14-byte file header
  * (`BM`, file size, pixel-array offset) then a DIB header —
  * BITMAPCOREHEADER (12 bytes, BGR palette triples) or
  * BITMAPINFOHEADER and its V4/V5 extensions (≥ 40 bytes, BGRA
  * palette quads) — then the palette (for ≤ 8 bpp) and the pixel
  * array: rows padded to 4-byte boundaries, stored bottom-up unless
  * the height is negative (top-down). Supported pixel formats:
  * 1/4/8 bpp palettized BI_RGB, 8 bpp BI_RLE8 (the classic 2-byte
  * run/escape encoding, incl. delta and absolute runs), 24 bpp BGR
  * and 32 bpp BGRX. Everything else (BI_RLE4, BI_BITFIELDS, PNG/JPEG
  * embedding) refuses with None.
  *
  * Output matches the other codecs' convention: 3-channel row-major
  * RGB, top-down, palette expanded — so [[Multimodal.decodeImagePixels]]
  * dispatches it interchangeably. Hostile-input contract: pixel
  * allocation capped by [[PngCodec.MaxPixelBytes]] BEFORE allocation,
  * Int-overflow-safe cursors, truncated files yield the rows whose
  * bytes exist (missing tail rows stay zero — the decoder never reads
  * past the buffer), RLE cursors bounds-checked per op, never throws.
  *
  * Scale shape: pure `Array[Byte] => Option[Image]` inside
  * `mapPartitions`, like every codec here.
  */
object BmpCodec {

  def decode(p: Array[Byte]): Option[PngCodec.Image] = {
    if (p.length < 14 + 12 || p(0) != 'B' || p(1) != 'M') return None
    def u8(i: Int): Int = p(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def le32s(i: Int): Int = le32(i).toInt

    val pixelOffset = le32(10)
    val dibSize = le32(14)
    if (pixelOffset < 0 || pixelOffset > p.length) return None

    var width = 0; var heightRaw = 0; var bpp = 0; var compression = 0L
    var clrUsed = 0L; var paletteAt = 0; var paletteEntryLen = 4
    if (dibSize == 12) { // BITMAPCOREHEADER: u16 dims, BGR palette triples
      if (p.length < 14 + 12) return None
      width = le16(18); heightRaw = le16(20); bpp = le16(24)
      paletteAt = 14 + 12; paletteEntryLen = 3
    } else if (dibSize >= 40 && dibSize <= 4096) { // INFO/V4/V5
      if (p.length < 14 + 40) return None
      width = le32s(18); heightRaw = le32s(22); bpp = le16(28)
      compression = le32(30)
      clrUsed = le32(46)
      paletteAt = 14 + dibSize.toInt; paletteEntryLen = 4
    } else return None

    val topDown = heightRaw < 0
    val height = math.abs(heightRaw)
    if (width <= 0 || height <= 0) return None
    if (width.toLong * height * 3 > PngCodec.MaxPixelBytes) return None

    // palette for indexed formats
    val palette: Array[Byte] =
      if (bpp <= 8) {
        val entries0 = if (clrUsed > 0) clrUsed else (1L << bpp)
        if (entries0 > 256) return None
        val entries = entries0.toInt
        if (paletteAt.toLong + entries.toLong * paletteEntryLen > p.length) return None
        val pal = new Array[Byte](256 * 3)
        var e = 0
        while (e < entries) {
          val at = paletteAt + e * paletteEntryLen
          pal(3 * e) = p(at + 2) // R (stored BGR[A])
          pal(3 * e + 1) = p(at + 1) // G
          pal(3 * e + 2) = p(at) // B
          e += 1
        }
        pal
      } else null

    val out = new Array[Byte](width * height * 3)
    def rowBase(y: Int): Int = (if (topDown) y else height - 1 - y) * width * 3

    compression match {
      case 0 => // BI_RGB
        if (bpp != 1 && bpp != 4 && bpp != 8 && bpp != 24 && bpp != 32) return None
        val rowBits = width.toLong * bpp
        val stride = (((rowBits + 31) / 32) * 4).toInt
        var y = 0
        var src = pixelOffset.toInt
        while (y < height && src + stride <= p.length) {
          val base = rowBase(y)
          var x = 0
          while (x < width) {
            if (bpp == 24 || bpp == 32) {
              val at = src + x * (bpp / 8)
              out(base + 3 * x) = p(at + 2)
              out(base + 3 * x + 1) = p(at + 1)
              out(base + 3 * x + 2) = p(at)
            } else {
              val bitPos = x * bpp
              val b = u8(src + (bitPos >> 3))
              val idx = bpp match {
                case 8 => b
                case 4 => if ((bitPos & 7) == 0) (b >> 4) & 0x0F else b & 0x0F
                case 1 => (b >> (7 - (bitPos & 7))) & 1
              }
              out(base + 3 * x) = palette(3 * idx)
              out(base + 3 * x + 1) = palette(3 * idx + 1)
              out(base + 3 * x + 2) = palette(3 * idx + 2)
            }
            x += 1
          }
          y += 1
          src += stride
        }
      case 1 => // BI_RLE8: encoded runs, bottom-up only per spec
        if (bpp != 8 || topDown) return None
        var src = pixelOffset.toInt
        var x = 0; var y = 0 // y counts from the BOTTOM row upward
        var done = false
        while (!done && src + 2 <= p.length && y < height) {
          val n = u8(src); val v = u8(src + 1); src += 2
          if (n > 0) { // run: n pixels of palette index v
            var k = 0
            val base = (if (topDown) y else height - 1 - y) * width * 3
            while (k < n && x < width) {
              out(base + 3 * x) = palette(3 * v)
              out(base + 3 * x + 1) = palette(3 * v + 1)
              out(base + 3 * x + 2) = palette(3 * v + 2)
              x += 1; k += 1
            }
          } else v match {
            case 0 => x = 0; y += 1 // end of line
            case 1 => done = true // end of bitmap
            case 2 => // delta: unsigned dx, dy move
              if (src + 2 > p.length) done = true
              else { x = math.min(width, x + u8(src)); y += u8(src + 1); src += 2 }
            case cnt => // absolute mode: cnt literal indices, word-aligned
              val base = (if (topDown) y else height - 1 - y) * width * 3
              var k = 0
              while (k < cnt && src < p.length) {
                val idx = u8(src); src += 1
                if (x < width && y < height) {
                  out(base + 3 * x) = palette(3 * idx)
                  out(base + 3 * x + 1) = palette(3 * idx + 1)
                  out(base + 3 * x + 2) = palette(3 * idx + 2)
                  x += 1
                }
                k += 1
              }
              if ((cnt & 1) != 0) src += 1 // pad to word boundary
          }
        }
      case 2 => // BI_RLE4 (round 15 continuation): runs ALTERNATE the
        // two nibbles of the value byte; absolute mode packs nibbles
        // and pads the BYTE count to a word boundary
        if (bpp != 4 || topDown) return None
        var src = pixelOffset.toInt
        var x = 0; var y = 0
        var done = false
        def put(base: Int, idx: Int): Unit = {
          out(base + 3 * x) = palette(3 * idx)
          out(base + 3 * x + 1) = palette(3 * idx + 1)
          out(base + 3 * x + 2) = palette(3 * idx + 2)
          x += 1
        }
        while (!done && src + 2 <= p.length && y < height) {
          val n = u8(src); val v = u8(src + 1); src += 2
          if (n > 0) {
            val base = (height - 1 - y) * width * 3
            var k = 0
            while (k < n && x < width) {
              put(base, if ((k & 1) == 0) v >> 4 else v & 0xF)
              k += 1
            }
          } else v match {
            case 0 => x = 0; y += 1
            case 1 => done = true
            case 2 =>
              if (src + 2 > p.length) done = true
              else { x = math.min(width, x + u8(src)); y += u8(src + 1); src += 2 }
            case cnt => // absolute: cnt nibbles, stored byte count padded
              val base = (height - 1 - y) * width * 3
              val nBytes = (cnt + 1) / 2
              var k = 0
              while (k < cnt && src + k / 2 < p.length) {
                val b = u8(src + k / 2)
                if (x < width && y < height)
                  put(base, if ((k & 1) == 0) b >> 4 else b & 0xF)
                k += 1
              }
              src += nBytes + (nBytes & 1) // pad to word boundary
          }
        }
      case _ => return None
    }
    Some(PngCodec.Image(width, height, 3, out))
  }
}
