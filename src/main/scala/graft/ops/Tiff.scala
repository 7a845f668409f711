package graft.ops

/** Baseline TIFF 6.0 pixel decoder — the archival/scan format rung
  * beside PNG/GIF/JPEG/BMP/WebP, written against the public TIFF 6.0
  * specification (Adobe, 1992) alone. [[Multimodal.ImageHeader]] has
  * read TIFF dimensions since round 11; this decodes the pixels so
  * image dedup (pHash, resize) takes `.tif` payloads.
  *
  * Supported (the baseline profile scanned corpora actually
  * contain): 8-bit greyscale (PhotometricInterpretation 0/1, the
  * WhiteIsZero inversion honored), 8-bit RGB (chunky
  * PlanarConfiguration), 8-bit palette (ColorMap expanded to RGB),
  * strip organization AND tile organization (round 15 continuation:
  * TileWidth/TileLength/TileOffsets/TileByteCounts, row-major tile
  * order, edge tiles stored full-size and clipped — tiled TIFF is
  * how large scans and geo rasters actually ship), compressions 1
  * (none), 5 (LZW — the TIFF variant: MSB-first codes, ClearCode
  * 256, EOI 257, the early-code-width change, horizontal Predictor
  * 2) and 32773 (PackBits). Planar separates, other bit depths and
  * compressions → None (refuse, never guess).
  *
  * Garbage-safety contract (same as [[PngCodec]]): never throws —
  * truncated IFDs, hostile strip offsets, LZW code overruns all
  * return None; the decoded size is capped by
  * [[PngCodec.MaxPixelBytes]] before allocation.
  *
  * Scale shape: pure `Array[Byte] => Option[Image]` inside
  * `mapPartitions` — per-row executor work.
  */
object TiffCodec {

  import PngCodec.Image

  private object Bad extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bad(): Nothing = throw Bad

  def decode(p: Array[Byte]): Option[Image] =
    try {
      if (p.length < 8) return None
      val le =
        if (p(0) == 'I' && p(1) == 'I' && (p(2) & 0xFF) == 0x2A && p(3) == 0) true
        else if (p(0) == 'M' && p(1) == 'M' && p(2) == 0 && (p(3) & 0xFF) == 0x2A) false
        else return None
      def u8(i: Int): Int = { if (i < 0 || i >= p.length) bad(); p(i) & 0xFF }
      def u16(i: Int): Int = if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
      def u32(i: Int): Long =
        if (le) (u16(i) & 0xFFFFL) | ((u16(i + 2) & 0xFFFFL) << 16)
        else ((u16(i) & 0xFFFFL) << 16) | (u16(i + 2) & 0xFFFFL)

      val ifd = u32(4)
      if (ifd < 8 || ifd > p.length - 2) return None
      val nEntries = u16(ifd.toInt)
      if (nEntries <= 0 || nEntries > 512) return None

      // tag -> (type, count, valueOffsetFieldPos)
      var width = 0L; var height = 0L
      var bits: Seq[Int] = Seq(1) // TIFF default BitsPerSample = 1
      var compression = 1
      var photometric = -1
      var spp = 1
      var rowsPerStrip = Long.MaxValue
      var stripOffsets: Seq[Long] = null
      var stripCounts: Seq[Long] = null
      var colorMap: Array[Int] = null
      var planar = 1
      var predictor = 1
      var tileW = 0L; var tileH = 0L
      var tileOffsets: Seq[Long] = null
      var tileCounts: Seq[Long] = null

      def typeSize(t: Int): Int = t match {
        case 1 | 2 | 6 | 7 => 1; case 3 | 8 => 2; case 4 | 9 | 11 => 4
        case 5 | 10 | 12 => 8; case _ => bad()
      }
      def values(entry: Int): Seq[Long] = {
        val t = u16(entry + 2); val n = u32(entry + 4)
        if (n < 0 || n > (1 << 20)) bad()
        val sz = typeSize(t)
        val at = if (sz * n <= 4) entry + 8L else u32(entry + 8)
        (0L until n).map { i =>
          val pos = (at + sz * i).toInt
          t match {
            case 1 | 2 | 6 | 7 => u8(pos).toLong
            case 3 | 8 => u16(pos).toLong
            case 4 | 9 | 11 => u32(pos)
            case _ => bad() // RATIONAL etc.: not used by the tags read here
          }
        }
      }

      var e = 0
      while (e < nEntries) {
        val entry = (ifd + 2 + 12 * e).toInt
        if (entry + 12 > p.length) bad()
        val tag = u16(entry)
        tag match {
          case 256 => width = values(entry).head
          case 257 => height = values(entry).head
          case 258 => bits = values(entry).map(_.toInt)
          case 259 => compression = values(entry).head.toInt
          case 262 => photometric = values(entry).head.toInt
          case 273 => stripOffsets = values(entry)
          case 277 => spp = values(entry).head.toInt
          case 278 => rowsPerStrip = values(entry).head
          case 279 => stripCounts = values(entry)
          case 284 => planar = values(entry).head.toInt
          case 317 => predictor = values(entry).head.toInt
          case 320 => colorMap = values(entry).map(_.toInt).toArray
          case 322 => tileW = values(entry).head
          case 323 => tileH = values(entry).head
          case 324 => tileOffsets = values(entry)
          case 325 => tileCounts = values(entry)
          case _ => () // unknown tags are fine (spec: readers skip)
        }
        e += 1
      }

      if (planar != 1) return None
      val anyTileTag = tileW > 0 || tileH > 0 || tileOffsets != null || tileCounts != null
      val useTiles = tileOffsets != null
      // mixing tile tags with strip offsets is malformed: refuse
      if (anyTileTag && stripOffsets != null) return None
      if (width <= 0 || height <= 0 || (!useTiles && stripOffsets == null)) return None
      if (useTiles && (tileW <= 0 || tileH <= 0 || tileW > (1 << 16) || tileH > (1 << 16)))
        return None
      if (photometric < 0 || photometric > 3) return None
      if (predictor != 1 && predictor != 2) return None
      val paletted = photometric == 3
      if (paletted && (colorMap == null || spp != 1)) return None
      if (!paletted && spp != (if (photometric == 2) 3 else 1)) return None
      if (bits.length != spp || bits.exists(_ != 8)) return None
      val outChannels = if (photometric == 2 || paletted) 3 else 1
      if (width * height * outChannels > PngCodec.MaxPixelBytes) return None

      // decompress strips (or tiles) into the raw chunky sample stream
      val w = width.toInt; val h = height.toInt
      val rowBytes = w * spp
      val raw = new Array[Byte](rowBytes * h)
      // one compressed region → `need` plain bytes into dst at dstOff
      def inflateRegion(off: Long, len: Long, dst: Array[Byte], dstOff: Int,
          need: Int): Unit = {
        if (off < 0 || len < 0 || off + len > p.length) bad()
        val got = compression match {
          case 1 =>
            val n = math.min(need.toLong, len).toInt
            System.arraycopy(p, off.toInt, dst, dstOff, n); n
          case 5 => lzw(p, off.toInt, len.toInt, dst, dstOff, need)
          case 32773 => packBits(p, off.toInt, len.toInt, dst, dstOff, need)
          case _ => bad() // unsupported compression (NOT `return`: a
          // nested def's return exits the DEF, skipping the checks)
        }
        if (got < need) bad() // short region: truncated data
      }
      def unpredict(dst: Array[Byte], base0: Int, rows: Int, rowB: Int): Unit =
        if (predictor == 2) {
          var r = 0
          while (r < rows) {
            val base = base0 + r * rowB
            var i = spp
            while (i < rowB) {
              dst(base + i) = (dst(base + i) + dst(base + i - spp)).toByte
              i += 1
            }
            r += 1
          }
        }
      if (!useTiles) {
        var rawAt = 0
        val counts = if (stripCounts != null) stripCounts
          else if (stripOffsets.length == 1) Seq((p.length - stripOffsets.head).max(0L))
          else return None
        if (counts.length != stripOffsets.length) return None
        var si = 0
        var rowsDone = 0L
        while (si < stripOffsets.length && rawAt < raw.length) {
          val stripRows = math.min(rowsPerStrip, height - rowsDone)
          val need = (stripRows * rowBytes).toInt
          inflateRegion(stripOffsets(si), counts(si), raw, rawAt, need)
          unpredict(raw, rawAt, stripRows.toInt, rowBytes)
          rawAt += need
          rowsDone += stripRows
          si += 1
        }
        if (rawAt < raw.length) bad()
      } else {
        // tiles: row-major, each stored FULL-SIZE (edge tiles padded
        // past the image bounds), clipped on the copy
        val across = ((width + tileW - 1) / tileW).toInt
        val down = ((height + tileH - 1) / tileH).toInt
        if (tileCounts == null || tileOffsets.length != across.toLong * down ||
          tileCounts.length != tileOffsets.length) return None
        val tw = tileW.toInt; val th = tileH.toInt
        val tileRowBytes = tw * spp
        if (tileRowBytes.toLong * th > PngCodec.MaxPixelBytes) return None
        val tile = new Array[Byte](tileRowBytes * th)
        var t = 0
        while (t < tileOffsets.length) {
          val x0 = (t % across) * tw
          val y0 = (t / across) * th
          inflateRegion(tileOffsets(t), tileCounts(t), tile, 0, tile.length)
          unpredict(tile, 0, th, tileRowBytes)
          val copyRows = math.min(th, h - y0)
          val copyBytes = math.min(tw, w - x0) * spp
          var r = 0
          while (r < copyRows) {
            System.arraycopy(tile, r * tileRowBytes, raw,
              (y0 + r) * rowBytes + x0 * spp, copyBytes)
            r += 1
          }
          t += 1
        }
      }

      val out: Array[Byte] =
        if (photometric == 2) raw // chunky RGB as-is
        else if (paletted) {
          // ColorMap: 3×256 16-bit values (all reds, greens, blues);
          // take the high byte per the 16-bit-to-8-bit convention
          val n = 1 << 8
          if (colorMap.length < 3 * n) return None
          val rgb = new Array[Byte](w * h * 3)
          var i = 0
          while (i < w * h) {
            val ix = raw(i) & 0xFF
            rgb(3 * i) = (colorMap(ix) >> 8).toByte
            rgb(3 * i + 1) = (colorMap(n + ix) >> 8).toByte
            rgb(3 * i + 2) = (colorMap(2 * n + ix) >> 8).toByte
            i += 1
          }
          rgb
        } else if (photometric == 0) { // WhiteIsZero: invert
          val g = new Array[Byte](w * h)
          var i = 0
          while (i < g.length) { g(i) = (255 - (raw(i) & 0xFF)).toByte; i += 1 }
          g
        } else raw
      Some(Image(w, h, outChannels, out))
    } catch {
      case Bad | _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException |
        _: ArithmeticException => None
    }

  /** TIFF PackBits (spec §9): n in 0..127 → copy n+1 literals;
    * -127..-1 → repeat next byte 1-n times; -128 no-op. Returns bytes
    * produced (≤ max). */
  private def packBits(src: Array[Byte], off: Int, len: Int,
      dst: Array[Byte], dstOff: Int, max: Int): Int = {
    var i = off; val end = off + len
    var o = dstOff; val lim = dstOff + max
    while (i < end && o < lim) {
      val n = src(i); i += 1
      if (n >= 0) {
        val cnt = math.min(n + 1, lim - o)
        if (i + n + 1 > end) bad()
        System.arraycopy(src, i, dst, o, cnt)
        i += n + 1; o += cnt
      } else if (n != -128) {
        if (i >= end) bad()
        val v = src(i); i += 1
        var c = math.min(1 - n, lim - o)
        while (c > 0) { dst(o) = v; o += 1; c -= 1 }
      }
    }
    o - dstOff
  }

  /** TIFF LZW (spec §13): MSB-first variable-width codes starting at
    * 9 bits, ClearCode 256, EOI 257, dictionary grows to 4094 with
    * the TIFF early-change rule (width bumps at table size 511/1023/
    * 2047). Returns bytes produced (≤ max). */
  private def lzw(src: Array[Byte], off: Int, len: Int,
      dst: Array[Byte], dstOff: Int, max: Int): Int = {
    val Clear = 256; val Eoi = 257
    var bitPos = 0L
    val totalBits = len.toLong * 8
    def code(width: Int): Int = {
      if (bitPos + width > totalBits) bad()
      var v = 0; var i = 0
      while (i < width) {
        val bp = bitPos + i
        v = (v << 1) | ((src(off + (bp >> 3).toInt) >> (7 - (bp & 7).toInt)) & 1)
        i += 1
      }
      bitPos += width
      v
    }
    // dictionary as (prefix, byte) with memoized first-byte/length
    val maxCodes = 4096
    val prefix = new Array[Int](maxCodes)
    val suffix = new Array[Byte](maxCodes)
    val length = new Array[Int](maxCodes)
    var next = 258
    var width = 9
    var o = dstOff; val lim = dstOff + max
    def emit(c: Int): Byte = { // writes the string for c, returns its first byte
      var n = length(c)
      if (c < 256) {
        if (o < lim) { dst(o) = c.toByte; o += 1 }
        return c.toByte
      }
      // walk up, write backwards
      val start = o
      var cc = c
      if (o + n > lim) n = lim - o
      o += n
      var at = start + length(c) - 1
      var first: Byte = 0
      while (cc >= 258) {
        if (at < lim && at >= start) dst(at) = suffix(cc)
        at -= 1
        cc = prefix(cc)
      }
      first = cc.toByte
      if (at < lim && at >= start) dst(at) = first
      first
    }
    (0 until 256).foreach { i => length(i) = 1; suffix(i) = i.toByte }
    var prev = -1
    var going = true
    while (going && o < lim) {
      val c = code(width)
      if (c == Eoi) going = false
      else if (c == Clear) { next = 258; width = 9; prev = -1 }
      else {
        if (prev < 0) {
          if (c >= 256) bad()
          emit(c)
          prev = c
        } else {
          var first: Byte = 0
          if (c < next && (c < 256 || c >= 258)) first = emit(c)
          else if (c == next) {
            // KwKwK: string(prev) + firstByte(prev)
            val mark = o
            first = emit(prev)
            val fb = first
            if (o < lim) { dst(o) = fb; o += 1 }
            if (o == mark) bad() // no progress: hostile stream
          } else bad()
          if (next < maxCodes - 2) {
            prefix(next) = prev; suffix(next) = first
            length(next) = length(prev) + 1
            next += 1
            // width sync (TIFF spec §13 "early change", the libtiff
            // rule): widen when the NEXT code to assign reaches
            // (1<<width)-1 — 511/1023/2047, one before the naive
            // 512/1024/2048. (An earlier vintage widened at 510 and
            // round-tripped only against its own encoder; the JDK
            // TIFF writer's streams exposed the off-by-one.)
            if (next == 511 && width == 9) width = 10
            else if (next == 1023 && width == 10) width = 11
            else if (next == 2047 && width == 11) width = 12
          }
          prev = c
        }
      }
    }
    o - dstOff
  }

  /** Fixture encoder: 8-bit greyscale, strips of `rowsPerStrip`,
    * PackBits-compressed, little-endian — enough surface to drive
    * decode through the strip/RLE path; the LZW path is pinned in
    * TiffSpec with hand-built code streams. */
  private[graft] def encodeGrey(width: Int, height: Int, pixels: Array[Byte],
      rowsPerStrip: Int = 8): Array[Byte] = {
    require(pixels.length == width * height)
    val strips = (0 until height by rowsPerStrip).map { y0 =>
      val rows = math.min(rowsPerStrip, height - y0)
      val bos = new java.io.ByteArrayOutputStream()
      var i = y0 * width
      val end = (y0 + rows) * width
      while (i < end) { // simple literal PackBits runs of up to 128
        val n = math.min(128, end - i)
        bos.write(n - 1)
        bos.write(pixels, i, n)
        i += n
      }
      bos.toByteArray
    }
    val nTags = 9
    val ifdAt = 8
    val ifdSize = 2 + 12 * nTags + 4
    val arraysAt = ifdAt + ifdSize
    val nStrips = strips.length
    // strip offset/count arrays (LONG each) when >1 strip
    val extDataAt = arraysAt + (if (nStrips > 1) 8 * nStrips else 0)
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
    def w32(v: Long): Unit = { w16((v & 0xFFFF).toInt); w16(((v >> 16) & 0xFFFF).toInt) }
    bos.write('I'); bos.write('I'); w16(42); w32(ifdAt)
    w16(nTags)
    def tag(t: Int, tpe: Int, n: Long, v: Long): Unit = { w16(t); w16(tpe); w32(n); w32(v) }
    val stripStarts = strips.scanLeft(extDataAt.toLong)((a, s) => a + s.length).init
    tag(256, 4, 1, width)
    tag(257, 4, 1, height)
    tag(258, 3, 1, 8)
    tag(259, 3, 1, 32773) // PackBits
    tag(262, 3, 1, 1) // BlackIsZero
    tag(273, 4, nStrips,
      if (nStrips == 1) stripStarts.head else arraysAt.toLong)
    tag(277, 3, 1, 1)
    tag(278, 4, 1, rowsPerStrip)
    tag(279, 4, nStrips,
      if (nStrips == 1) strips.head.length.toLong else (arraysAt + 4 * nStrips).toLong)
    w32(0) // next IFD
    if (nStrips > 1) {
      stripStarts.foreach(w32)
      strips.foreach(s => w32(s.length.toLong))
    }
    strips.foreach(bos.write)
    bos.toByteArray
  }
}
