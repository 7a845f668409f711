package graft.ops

/** WebP pixel decoder — BOTH halves of the format: lossless VP8L,
  * written against the public "WebP Lossless Bitstream
  * Specification" (Google, also RFC 9649 §3), and lossy VP8 through
  * the [[Vp8]] RFC 6386 keyframe decoder — the web's #2 image format
  * joins the PNG/GIF/JPEG/BMP rung so image dedup (pHash, bilinear
  * resize) takes `.webp` payloads. The reference repo has no
  * analogue (nearest: `main.py:159` map).
  *
  * Supported: the full VP8L lossless feature set — simple and
  * normal (code-length-coded) prefix codes, meta-prefix groups,
  * color cache, LZ77 backward references (2D distance map + direct
  * distances), and all four transforms (predictor ×14 modes, color,
  * subtract-green, color-indexing incl. sub-byte pixel bundling).
  * Lossy VP8 payloads decode through the [[Vp8]] keyframe decoder
  * (RFC 6386 reconstruction + the reference RGB conversion, both
  * pinned byte-exactly against the system libwebp); lossy images
  * with a separate ALPH chunk refuse by name.
  *
  * Garbage-safety contract (same as [[PngCodec]]): `decode` NEVER
  * throws — hostile headers, truncated bitstreams, over/under-
  * subscribed prefix codes, out-of-range back-references all return
  * None; decoded size is capped by [[PngCodec.MaxPixelBytes]]
  * BEFORE allocation.
  *
  * Scale shape: pure `Array[Byte] => Option[Image]` inside
  * `mapPartitions` — per-row executor work, no driver involvement.
  */
object WebpCodec {

  import PngCodec.Image

  private object Bad extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bad(): Nothing = throw Bad

  // ------------------------------------------------------------ bits

  /** LSB-first bit reader (VP8L convention: values little-endian,
    * prefix codes walked bit by bit). */
  private final class Br(val b: Array[Byte], var pos: Int) {
    def bit(): Int = {
      val i = pos >>> 3
      if (i >= b.length) bad()
      val v = (b(i) >>> (pos & 7)) & 1
      pos += 1
      v
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v |= bit() << i; i += 1 }
      v
    }
  }

  // ------------------------------------------------------------ codes

  /** Canonical prefix code (RFC 1951-style assignment; codes read
    * MSB-first, one bit per tree step). A one-symbol code consumes
    * zero bits. Build refuses over/under-subscribed length sets. */
  private final class Code(lengths: Array[Int]) {
    private val maxLen = lengths.max
    val single: Int = {
      val used = lengths.indices.filter(lengths(_) > 0)
      if (used.isEmpty) bad()
      if (used.length == 1) used.head else -1
    }
    private val (firstCode, firstIndex, symbols) = if (single >= 0) (null, null, null) else {
      if (maxLen > 15) bad()
      val count = new Array[Int](maxLen + 1)
      lengths.foreach(l => if (l > 0) count(l) += 1)
      // completeness (Kraft equality): an ambiguous or short code is
      // a malformed stream, not a guessing opportunity
      var kraft = 0L
      (1 to maxLen).foreach(l => kraft += count(l).toLong << (maxLen - l))
      if (kraft != (1L << maxLen)) bad()
      val fc = new Array[Int](maxLen + 2)
      val fi = new Array[Int](maxLen + 2)
      var code = 0; var idx = 0
      (1 to maxLen).foreach { l =>
        fc(l) = code; fi(l) = idx
        code = (code + count(l)) << 1; idx += count(l)
      }
      val syms = new Array[Int](idx)
      val next = new Array[Int](maxLen + 1)
      lengths.indices.foreach { s =>
        val l = lengths(s)
        if (l > 0) { syms(fi(l) + next(l)) = s; next(l) += 1 }
      }
      (fc, fi, syms)
    }
    def read(br: Br): Int = {
      if (single >= 0) return single
      var code = 0; var len = 0
      while (true) {
        code = (code << 1) | br.bit()
        len += 1
        if (len > maxLen) bad()
        val base = firstCode(len)
        val cnt = if (len + 1 <= maxLen) firstIndex(len + 1) - firstIndex(len)
                  else symbols.length - firstIndex(len)
        if (code - base < cnt && code >= base) return symbols(firstIndex(len) + (code - base))
      }
      bad()
    }
  }

  /** A simple code's symbols get canonical 1-bit lengths (one symbol
    * → the degenerate zero-bit single inside [[Code]]). */
  private def simpleCode(syms: Array[Int], alphabet: Int): Code = {
    if (syms.exists(s => s < 0 || s >= alphabet)) bad()
    val lengths = new Array[Int](alphabet)
    syms.foreach(lengths(_) = 1)
    new Code(lengths)
  }

  /** Spec §5.2.2 code-length-code symbol order. */
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read one prefix code (spec §5.2): simple (1-2 symbols) or
    * normal (code lengths themselves prefix-coded, with 16/17/18
    * repeat tokens and the optional max_symbol token budget). */
  private def readPrefixCode(br: Br, alphabet: Int): Code = {
    if (br.bits(1) == 1) { // simple
      val n = br.bits(1) + 1
      val first = if (br.bits(1) == 1) br.bits(8) else br.bits(1)
      if (n == 1) simpleCode(Array(first), alphabet)
      else {
        val second = br.bits(8)
        if (first == second) bad()
        simpleCode(Array(first, second), alphabet)
      }
    } else {
      val numCl = 4 + br.bits(4)
      val clLengths = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLengths(ClOrder(i)) = br.bits(3); i += 1 }
      val clCode = new Code(clLengths)
      var budget =
        if (br.bits(1) == 1) {
          val lb = 2 + 2 * br.bits(3)
          val ms = 2 + br.bits(lb)
          ms
        } else alphabet
      val lengths = new Array[Int](alphabet)
      var prev = 8
      var sym = 0
      while (sym < alphabet && budget > 0) {
        budget -= 1
        val cl = clCode.read(br)
        if (cl < 16) {
          lengths(sym) = cl; sym += 1
          if (cl != 0) prev = cl
        } else {
          val (rep, len) = cl match {
            case 16 => (3 + br.bits(2), prev)
            case 17 => (3 + br.bits(3), 0)
            case _ => (11 + br.bits(7), 0)
          }
          if (sym + rep > alphabet) bad()
          var r = 0
          while (r < rep) { lengths(sym) = len; sym += 1; r += 1 }
        }
      }
      new Code(lengths)
    }
  }

  // ------------------------------------------------------------ lz77

  private def lz77Value(code: Int, br: Br): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + br.bits(extra) + 1
    }

  /** Spec §4.2.2 short-distance map: codes 1..120 are 2D offsets
    * (dx, dy) relative to the current pixel. The first entries (the
    * ones real encoders emit constantly) are pinned in WebpSpec via
    * hand-written bitstreams. */
  private val DistanceMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (8, 3), (-8, 3), (5, 7), (-5, 7), (7, 5),
    (-7, 5), (8, 4), (3, 8), (-3, 8), (8, 5), (-8, 5), (8, 6), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 7))

  private def planeCodeToDistance(xsize: Int, planeCode: Int): Int =
    if (planeCode > 120) planeCode - 120
    else {
      val (dx, dy) = DistanceMap(planeCode - 1)
      val d = dy * xsize + dx
      if (d < 1) 1 else d
    }

  // ------------------------------------------------------------ image data

  /** Decode one "entropy-coded image" of w×h ARGB pixels (spec §5.3):
    * optional color cache, optional meta-prefix groups (main image
    * only), per-group {green+len+cache, red, blue, alpha, distance}
    * prefix codes, literals / back-references / cache hits. */
  private def decodeImageData(br: Br, w: Int, h: Int, isMain: Boolean): Array[Int] = {
    if (w <= 0 || h <= 0 || w.toLong * h * 4 > PngCodec.MaxPixelBytes) bad()
    val ccBits = if (br.bits(1) == 1) br.bits(4) else 0
    if (ccBits > 11) bad()
    val cache = if (ccBits > 0) new Array[Int](1 << ccBits) else null
    var metaBits = 0
    var metaImage: Array[Int] = null
    var nGroups = 1
    if (isMain && br.bits(1) == 1) {
      metaBits = br.bits(3) + 2
      val mw = (w + (1 << metaBits) - 1) >> metaBits
      val mh = (h + (1 << metaBits) - 1) >> metaBits
      metaImage = decodeImageData(br, mw, mh, isMain = false)
      var mx = 0
      metaImage.foreach { p =>
        val g = ((p >> 8) & 0xFFFF)
        if (g > mx) mx = g
      }
      nGroups = mx + 1
      if (nGroups > (1 << 16)) bad()
    }
    val greenAlpha = 256 + 24 + (if (ccBits > 0) 1 << ccBits else 0)
    val groups = Array.fill(nGroups)((
      readPrefixCode(br, greenAlpha), readPrefixCode(br, 256),
      readPrefixCode(br, 256), readPrefixCode(br, 256),
      readPrefixCode(br, 40)))
    val out = new Array[Int](w * h)
    var idx = 0
    val n = w * h
    val metaW = if (metaImage == null) 0 else (w + (1 << metaBits) - 1) >> metaBits
    def insert(p: Int): Unit =
      if (cache != null) cache((0x1E35A7BD * p) >>> (32 - ccBits)) = p
    while (idx < n) {
      val x = idx % w; val y = idx / w
      val g =
        if (metaImage == null) groups(0)
        else {
          val mp = metaImage((y >> metaBits) * metaW + (x >> metaBits))
          groups(((mp >> 8) & 0xFFFF) min (nGroups - 1))
        }
      val s = g._1.read(br)
      if (s < 256) {
        val red = g._2.read(br)
        val blue = g._3.read(br)
        val alpha = g._4.read(br)
        val p = (alpha << 24) | (red << 16) | (s << 8) | blue
        out(idx) = p; insert(p); idx += 1
      } else if (s < 256 + 24) {
        val length = lz77Value(s - 256, br)
        val planeCode = lz77Value(g._5.read(br), br)
        val dist = planeCodeToDistance(w, planeCode)
        if (dist > idx || length > n - idx) bad()
        var k = 0
        while (k < length) {
          val p = out(idx - dist)
          out(idx) = p; insert(p); idx += 1; k += 1
        }
      } else {
        if (cache == null) bad()
        val ci = s - 256 - 24
        if (ci >= (1 << ccBits)) bad()
        val p = cache(ci)
        out(idx) = p; insert(p); idx += 1
      }
    }
    out
  }

  // ------------------------------------------------------------ transforms

  private def avg2(a: Int, b: Int): Int = {
    // per-channel (a + b) / 2, SIMD-style without unpacking
    (((a ^ b) & 0xFEFEFEFE) >>> 1) + (a & b)
  }
  private def addPixels(a: Int, b: Int): Int = {
    // per-channel modular add
    val rb = (a & 0x00FF00FF) + (b & 0x00FF00FF)
    val ag = ((a >>> 8) & 0x00FF00FF) + ((b >>> 8) & 0x00FF00FF)
    ((ag & 0x00FF00FF) << 8) | (rb & 0x00FF00FF)
  }
  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
  private def select(l: Int, t: Int, tl: Int): Int = {
    def c(p: Int, s: Int) = (p >>> s) & 0xFF
    var pL = 0; var pT = 0
    var s = 0
    while (s < 32) {
      val pred = c(l, s) + c(t, s) - c(tl, s)
      pL += math.abs(pred - c(l, s)); pT += math.abs(pred - c(t, s))
      s += 8
    }
    if (pL < pT) l else t
  }
  private def casFull(l: Int, t: Int, tl: Int): Int = {
    var out = 0; var s = 0
    while (s < 32) {
      out |= clamp255(((l >>> s) & 0xFF) + ((t >>> s) & 0xFF) - ((tl >>> s) & 0xFF)) << s
      s += 8
    }
    out
  }
  private def casHalf(l: Int, t: Int, tl: Int): Int = {
    val a = avg2(l, t)
    var out = 0; var s = 0
    while (s < 32) {
      val av = (a >>> s) & 0xFF
      out |= clamp255(av + (av - ((tl >>> s) & 0xFF)) / 2) << s
      s += 8
    }
    out
  }

  /** Inverse predictor transform (spec §4.2.1): prediction residuals
    * were stored; add the per-block-mode prediction back, in scan
    * order. Linear indexing defines the edge TR behavior exactly as
    * the spec amends it. */
  private def inversePredictor(px: Array[Int], w: Int, h: Int,
      bits: Int, modes: Array[Int]): Unit = {
    val mw = (w + (1 << bits) - 1) >> bits
    var idx = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred: Int =
          if (idx == 0) 0xFF000000
          else if (y == 0) px(idx - 1)
          else if (x == 0) px(idx - w)
          else {
            val mode = (modes((y >> bits) * mw + (x >> bits)) >> 8) & 0xFF
            val l = px(idx - 1); val t = px(idx - w)
            val tl = px(idx - w - 1)
            val tr = px(idx - w + 1) // x = w-1 wraps to this row's first pixel
            mode match {
              case 0 => 0xFF000000
              case 1 => l
              case 2 => t
              case 3 => tr
              case 4 => tl
              case 5 => avg2(avg2(l, tr), t)
              case 6 => avg2(l, tl)
              case 7 => avg2(l, t)
              case 8 => avg2(tl, t)
              case 9 => avg2(t, tr)
              case 10 => avg2(avg2(l, tl), avg2(t, tr))
              case 11 => select(l, t, tl)
              case 12 => casFull(l, t, tl)
              case 13 => casHalf(l, t, tl)
              case _ => bad()
            }
          }
        px(idx) = addPixels(px(idx), pred)
        idx += 1; x += 1
      }
      y += 1
    }
  }

  /** Inverse color transform (spec §4.2.2 in RFC numbering; "color
    * transform" in the Google spec): per-block ColorTransformElement
    * (green_to_red in blue, green_to_blue in green, red_to_blue in
    * red), delta = (int8(t) · int8(c)) >> 5. */
  private def inverseColor(px: Array[Int], w: Int, h: Int,
      bits: Int, elems: Array[Int]): Unit = {
    val mw = (w + (1 << bits) - 1) >> bits
    def delta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5
    var idx = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val e = elems((y >> bits) * mw + (x >> bits))
        val g2r = e & 0xFF
        val g2b = (e >> 8) & 0xFF
        val r2b = (e >> 16) & 0xFF
        val p = px(idx)
        val green = (p >> 8) & 0xFF
        var red = (p >> 16) & 0xFF
        var blue = p & 0xFF
        red = (red + delta(g2r, green)) & 0xFF
        blue = (blue + delta(g2b, green)) & 0xFF
        blue = (blue + delta(r2b, red)) & 0xFF
        px(idx) = (p & 0xFF00FF00) | (red << 16) | blue
        idx += 1; x += 1
      }
      y += 1
    }
  }

  private def inverseSubtractGreen(px: Array[Int]): Unit = {
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val g = (p >>> 8) & 0xFF
      val r = (((p >>> 16) & 0xFF) + g) & 0xFF
      val b = ((p & 0xFF) + g) & 0xFF
      px(i) = (p & 0xFF00FF00) | (r << 16) | b
      i += 1
    }
  }

  private def colorIndexWidthBits(paletteSize: Int): Int =
    if (paletteSize <= 2) 3 else if (paletteSize <= 4) 2
    else if (paletteSize <= 16) 1 else 0

  /** Inverse color-indexing (spec §4.2.4): palette lookup, with
    * sub-byte bundling unpacked from the GREEN channel when the
    * palette is small. Out-of-range indexes decode as transparent
    * black (all zeroes). */
  private def inverseColorIndex(packed: Array[Int], w: Int, h: Int,
      palette: Array[Int]): Array[Int] = {
    val wb = colorIndexWidthBits(palette.length)
    if (wb == 0) {
      packed.map { p =>
        val i = (p >> 8) & 0xFF
        if (i < palette.length) palette(i) else 0
      }
    } else {
      val perByte = 1 << wb // pixels packed per green byte
      val idxBits = 8 >> wb
      val mask = (1 << idxBits) - 1
      val packedW = (w + perByte - 1) / perByte
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = (packed(y * packedW + x / perByte) >> 8) & 0xFF
          val i = (g >> (idxBits * (x % perByte))) & mask
          out(y * w + x) = if (i < palette.length) palette(i) else 0
          x += 1
        }
        y += 1
      }
      out
    }
  }

  // ------------------------------------------------------------ top level

  private final case class Transform(kind: Int, bits: Int, data: Array[Int])

  /** Decode a VP8L payload (the bytes after the 'VP8L' chunk header,
    * starting at the 0x2F signature). */
  /** The VP8L "image-stream" body — optional transforms, then the
    * entropy-coded image, inverses applied in reverse read order —
    * shared by the VP8L chunk (after its 5-byte header) and an ALPH
    * chunk's compressed alpha plane (implied dimensions, no header).
    * Returns ARGB pixels; throws Bad on malformed input. */
  private def decodeStream(br: Br, w: Int, h: Int): Array[Int] = {
    var curW = w
    var transforms = List.empty[Transform]
    var seen = Set.empty[Int]
    while (br.bits(1) == 1) {
      val kind = br.bits(2)
      if (seen(kind)) bad()
      seen += kind
      kind match {
        case 0 | 1 => // predictor / color: size bits + block image
          val tb = br.bits(3) + 2
          val mw = (curW + (1 << tb) - 1) >> tb
          val mh = (h + (1 << tb) - 1) >> tb
          transforms ::= Transform(kind, tb, decodeImageData(br, mw, mh, isMain = false))
        case 2 =>
          transforms ::= Transform(2, 0, null)
        case _ => // color indexing: palette, delta-coded
          val size = br.bits(8) + 1
          val pal = decodeImageData(br, size, 1, isMain = false)
          var i = 1
          while (i < pal.length) { pal(i) = addPixels(pal(i), pal(i - 1)); i += 1 }
          transforms ::= Transform(3, 0, pal)
          val perByte = 1 << colorIndexWidthBits(size)
          curW = (curW + perByte - 1) / perByte
      }
    }
    var px = decodeImageData(br, curW, h, isMain = true)
    // inverses in reverse read order (transforms list is already
    // reversed by consing)
    transforms.foreach { t =>
      t.kind match {
        case 0 => inversePredictor(px, curW, h, t.bits, t.data)
        case 1 => inverseColor(px, curW, h, t.bits, t.data)
        case 2 => inverseSubtractGreen(px)
        case _ =>
          px = inverseColorIndex(px, w, h, t.data)
          curW = w
      }
    }
    if (curW != w) bad() // a bundled image must end with its color-index inverse
    px
  }

  private[graft] def decodeVp8l(d: Array[Byte]): Option[Image] =
    try {
      if (d.length < 5 || (d(0) & 0xFF) != 0x2F) return None
      val br = new Br(d, 8)
      val w = br.bits(14) + 1
      val h = br.bits(14) + 1
      br.bits(1) // alpha hint (informational)
      if (br.bits(3) != 0) return None // version must be 0
      if (w.toLong * h * 4 > PngCodec.MaxPixelBytes) return None
      val px = decodeStream(br, w, h)
      val rgba = new Array[Byte](w * h * 4)
      var i = 0
      while (i < px.length) {
        val p = px(i)
        rgba(4 * i) = ((p >> 16) & 0xFF).toByte
        rgba(4 * i + 1) = ((p >> 8) & 0xFF).toByte
        rgba(4 * i + 2) = (p & 0xFF).toByte
        rgba(4 * i + 3) = ((p >>> 24) & 0xFF).toByte
        i += 1
      }
      Some(Image(w, h, 4, rgba))
    } catch { case Bad | _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException => None }

  /** ALPH chunk payload (RFC 9649 §2.3.1) → the w×h alpha plane.
    * One header byte — 2 reserved bits, 2 pre-processing (level
    * reduction is an ENCODER-side quantization, nothing to undo), 2
    * filtering, 2 compression — then the plane: raw w·h bytes (C=0)
    * or a HEADERLESS VP8L image-stream at implied dimensions whose
    * GREEN channel carries alpha (C=1). The per-pixel prediction
    * filter (none / horizontal / vertical / gradient) is then
    * un-applied with the reference edge rules: (0,0) predicts 0, the
    * rest of row 0 predicts LEFT for every filter, column 0 predicts
    * ABOVE for every filter. Pinned against `WebPDecodeRGBA` in
    * WebpVp8Spec. */
  private[graft] def decodeAlpha(d: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    try {
      if (d.length < 1 || w <= 0 || h <= 0) return None
      val hdr = d(0) & 0xFF
      if ((hdr >> 6) != 0) return None // reserved bits
      if (((hdr >> 4) & 3) > 1) return None // pre-processing: 0/1 only
      val filt = (hdr >> 2) & 3
      val a = (hdr & 3) match {
        case 0 =>
          if (d.length < 1 + w * h) return None
          java.util.Arrays.copyOfRange(d, 1, 1 + w * h)
        case 1 =>
          if (w.toLong * h * 4 > PngCodec.MaxPixelBytes) return None
          val px = decodeStream(new Br(d, 8), w, h)
          val out = new Array[Byte](w * h)
          var i = 0
          while (i < out.length) { out(i) = ((px(i) >> 8) & 0xFF).toByte; i += 1 }
          out
        case _ => return None
      }
      if (filt != 0) {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val i = y * w + x
            val pred =
              if (x == 0 && y == 0) 0
              else if (y == 0) a(i - 1) & 0xFF
              else if (x == 0) a(i - w) & 0xFF
              else filt match {
                case 1 => a(i - 1) & 0xFF
                case 2 => a(i - w) & 0xFF
                case _ =>
                  val g = (a(i - 1) & 0xFF) + (a(i - w) & 0xFF) - (a(i - w - 1) & 0xFF)
                  if (g < 0) 0 else if (g > 255) 255 else g
              }
            a(i) = ((a(i) & 0xFF) + pred).toByte
            x += 1
          }
          y += 1
        }
      }
      Some(a)
    } catch { case Bad | _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException => None }

  /** RIFF walk: WEBP container → the VP8L chunk (directly or behind
    * a VP8X extended header), or the lossy 'VP8 ' chunk via the
    * [[Vp8]] keyframe decoder (YUV 4:2:0 reconstructed per RFC 6386,
    * converted with the reference fixed-point BT.601 + fancy-
    * upsampling arithmetic), optionally combined with a preceding
    * ALPH chunk into RGBA — every decode path pinned byte-exactly
    * against the system libwebp in WebpVp8Spec. An ALPH chunk next
    * to a VP8L image is container-invalid (VP8L carries its own
    * alpha) and refuses. */
  def decode(p: Array[Byte]): Option[Image] = {
    if (p.length < 20 || p(0) != 'R' || p(1) != 'I' || p(2) != 'F' || p(3) != 'F' ||
      p(8) != 'W' || p(9) != 'E' || p(10) != 'B' || p(11) != 'P') return None
    decodeChunkSeq(p, 12, p.length)
  }

  /** Walk a chunk sequence (the container body, or an ANMF frame's
    * data) to the first image: VP8L directly, or optional ALPH + the
    * lossy VP8 chunk combined into RGBA. */
  private def decodeChunkSeq(p: Array[Byte], from: Int, until: Int): Option[Image] = {
    var alph: Array[Byte] = null
    var i = from
    while (i + 8 <= until) {
      val fourcc = new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = (p(i + 4) & 0xFF) | ((p(i + 5) & 0xFF) << 8) |
        ((p(i + 6) & 0xFF) << 16) | ((p(i + 7) & 0xFF) << 24)
      if (size < 0 || i + 8 + size > until) return None
      if (fourcc == "VP8L")
        return if (alph != null) None
          else decodeVp8l(java.util.Arrays.copyOfRange(p, i + 8, i + 8 + size))
      if (fourcc == "ALPH")
        alph = java.util.Arrays.copyOfRange(p, i + 8, i + 8 + size)
      if (fourcc == "VP8 ")
        return Vp8.decodeFrame(java.util.Arrays.copyOfRange(p, i + 8, i + 8 + size))
          .flatMap { f =>
            val rgb = Vp8.toRgb(f)
            if (alph == null) Some(Image(f.width, f.height, 3, rgb))
            else decodeAlpha(alph, f.width, f.height).map { a =>
              val rgba = new Array[Byte](f.width * f.height * 4)
              var j = 0
              while (j < a.length) {
                rgba(4 * j) = rgb(3 * j)
                rgba(4 * j + 1) = rgb(3 * j + 1)
                rgba(4 * j + 2) = rgb(3 * j + 2)
                rgba(4 * j + 3) = a(j)
                j += 1
              }
              Image(f.width, f.height, 4, rgba)
            }
          }
      i += 8 + size + (size & 1)
    }
    None
  }

  // ------------------------------------------------------------ animation

  /** One animation frame: placement/timing/flags from the ANMF
    * header plus the frame's own decoded pixels. */
  final case class AnimFrame(x: Int, y: Int, width: Int, height: Int,
      durationMs: Int, blend: Boolean, disposeToBg: Boolean, image: Image)

  /** A decoded animation: the canvas geometry and, per frame, both
    * the raw frame and the COMPOSED canvas (RGBA, canvas-sized)
    * after rendering that frame. */
  final case class Anim(width: Int, height: Int, loopCount: Int, bgColor: Int,
      frames: Vector[AnimFrame], canvases: Vector[Array[Byte]])

  /** Animated WebP (RFC 9649 §2.3.2-2.3.3): VP8X (animation flag,
    * canvas dims) + ANIM (background color, loop count) + ANMF
    * frames, each an (optional ALPH +) VP8/VP8L payload decoded by
    * the pinned still-image paths. Composition follows the spec's
    * normative pseudocode with the reference implementation's
    * integer evaluation (anim_decode.c shape: blend.A = fA +
    * cA·(255−fA)/255 with truncating divisions) onto a canvas
    * initialized TRANSPARENT; "dispose to background color" fills
    * the frame rectangle with transparent black — the reference
    * decoder's observable behavior (the spec itself marks the ANIM
    * background color as a hint "applications SHOULD treat ... as a
    * hint", and the reference zero-fills). Refusals: no animation
    * flag, frame rectangle outside the canvas, frame count over
    * `maxFrames`, canvas over the pixel cap, any undecodable frame. */
  def decodeAnim(p: Array[Byte], maxFrames: Int = 1024): Option[Anim] = {
    if (p.length < 20 || p(0) != 'R' || p(1) != 'I' || p(2) != 'F' || p(3) != 'F' ||
      p(8) != 'W' || p(9) != 'E' || p(10) != 'B' || p(11) != 'P') return None
    @inline def le24(o: Int): Int =
      (p(o) & 0xFF) | ((p(o + 1) & 0xFF) << 8) | ((p(o + 2) & 0xFF) << 16)
    var canvasW = 0; var canvasH = 0; var seenVp8x = false
    var loop = 0; var bg = 0; var seenAnim = false
    var frames = Vector.empty[AnimFrame]
    var i = 12
    while (i + 8 <= p.length) {
      val fourcc = new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = (p(i + 4) & 0xFF) | ((p(i + 5) & 0xFF) << 8) |
        ((p(i + 6) & 0xFF) << 16) | ((p(i + 7) & 0xFF) << 24)
      if (size < 0 || i + 8 + size > p.length) return None
      fourcc match {
        case "VP8X" =>
          if (size < 10) return None
          if ((p(i + 8) & 0x02) == 0) return None // not an animation
          canvasW = le24(i + 12) + 1
          canvasH = le24(i + 15) + 1
          if (canvasW.toLong * canvasH * 4 > PngCodec.MaxPixelBytes) return None
          seenVp8x = true
        case "ANIM" =>
          if (!seenVp8x || size < 6) return None
          bg = (p(i + 8) & 0xFF) | ((p(i + 9) & 0xFF) << 8) |
            ((p(i + 10) & 0xFF) << 16) | ((p(i + 11) & 0xFF) << 24)
          loop = (p(i + 12) & 0xFF) | ((p(i + 13) & 0xFF) << 8)
          seenAnim = true
        case "ANMF" =>
          if (!seenAnim || size < 16) return None
          if (frames.size >= maxFrames) return None
          val fx = le24(i + 8) * 2
          val fy = le24(i + 11) * 2
          val fw = le24(i + 14) + 1
          val fh = le24(i + 17) + 1
          val dur = le24(i + 20)
          val flags = p(i + 23) & 0xFF
          if (fx + fw > canvasW || fy + fh > canvasH) return None
          decodeChunkSeq(p, i + 8 + 16, i + 8 + size) match {
            case Some(img) if img.width == fw && img.height == fh =>
              frames :+= AnimFrame(fx, fy, fw, fh, dur,
                blend = (flags & 2) == 0, disposeToBg = (flags & 1) == 1, img)
            case _ => return None
          }
        case _ => ()
      }
      i += 8 + size + (size & 1)
    }
    if (!seenAnim || frames.isEmpty) return None
    Some(Anim(canvasW, canvasH, loop, bg, frames, composeAnim(canvasW, canvasH, frames)))
  }

  /** Frame-by-frame canvas composition (see [[decodeAnim]] for the
    * rounding/disposal provenance). Returns one canvas-sized RGBA
    * snapshot per frame, taken after rendering it and before its
    * disposal applies. */
  private def composeAnim(cw: Int, ch: Int,
      frames: Vector[AnimFrame]): Vector[Array[Byte]] = {
    val canvas = new Array[Byte](cw * ch * 4) // transparent black
    frames.map { f =>
      val img = f.image
      val nch = img.channels
      var yy = 0
      while (yy < f.height) {
        var xx = 0
        while (xx < f.width) {
          val ci = ((f.y + yy) * cw + (f.x + xx)) * 4
          val fi = (yy * f.width + xx) * nch
          val fr = img.pixels(fi) & 0xFF
          val fg = img.pixels(fi + 1) & 0xFF
          val fb = img.pixels(fi + 2) & 0xFF
          val fa = if (nch == 4) img.pixels(fi + 3) & 0xFF else 255
          if (!f.blend || fa == 255) {
            canvas(ci) = fr.toByte; canvas(ci + 1) = fg.toByte
            canvas(ci + 2) = fb.toByte; canvas(ci + 3) = fa.toByte
          } else if (fa > 0) {
            val ca = canvas(ci + 3) & 0xFF
            val scale = ca * (255 - fa) / 255
            val blendA = fa + scale
            if (blendA == 0) {
              canvas(ci) = 0; canvas(ci + 1) = 0; canvas(ci + 2) = 0; canvas(ci + 3) = 0
            } else {
              canvas(ci) = (((canvas(ci) & 0xFF) * scale + fr * fa) / blendA).toByte
              canvas(ci + 1) = (((canvas(ci + 1) & 0xFF) * scale + fg * fa) / blendA).toByte
              canvas(ci + 2) = (((canvas(ci + 2) & 0xFF) * scale + fb * fa) / blendA).toByte
              canvas(ci + 3) = blendA.toByte
            }
          } // fa == 0 under blending: canvas pixel unchanged
          xx += 1
        }
        yy += 1
      }
      val snapshot = canvas.clone()
      if (f.disposeToBg) {
        var y2 = 0
        while (y2 < f.height) {
          java.util.Arrays.fill(canvas, ((f.y + y2) * cw + f.x) * 4,
            ((f.y + y2) * cw + f.x + f.width) * 4, 0.toByte)
          y2 += 1
        }
      }
      snapshot
    }
  }

  // ------------------------------------------------------------ fixture encoder

  /** LSB-first bit writer; prefix codes written MSB-first. */
  private final class Bw {
    private val bos = new java.io.ByteArrayOutputStream()
    private var cur = 0; private var n = 0
    def bits(v: Int, len: Int): Unit = {
      var i = 0
      while (i < len) {
        cur |= ((v >> i) & 1) << n
        n += 1
        if (n == 8) { bos.write(cur); cur = 0; n = 0 }
        i += 1
      }
    }
    def code(v: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { bits((v >> i) & 1, 1); i -= 1 }
    }
    def bytes(): Array[Byte] = {
      if (n > 0) { bos.write(cur); cur = 0; n = 0 }
      bos.toByteArray
    }
  }

  /** Fixture/gate encoder: a GREEN-carrying VP8L image (red=blue=0,
    * alpha=255) — green uses a flat 8-bit normal prefix code
    * (declared through the code-length code with 16/17 repeat
    * tokens, so the decoder's full header path runs), the constant
    * channels use zero-bit simple codes. Deterministic; decodes to
    * RGBA (0, g, 0, 255) per pixel. */
  /** The GREEN-carrying image-stream body shared by [[encodeGreen]]
    * (full VP8L chunk) and the C=1 ALPH plane (headerless, implied
    * dims): no transforms, a flat 8-bit normal prefix code for green
    * (declared through the code-length code with 16/17 repeat
    * tokens, so a decoder's full header path runs), one-symbol codes
    * for the other channels. */
  private def writeGreenStream(bw: Bw, green: Array[Byte]): Unit = {
    bw.bits(0, 1) // no transforms
    bw.bits(0, 1) // no color cache
    bw.bits(0, 1) // no meta prefix codes
    // GREEN code: normal, flat 8-bit over symbols 0..255 (length-code
    // alphabet is 280; the 24 length codes get zero lengths via '17')
    bw.bits(0, 1) // not simple
    bw.bits(8, 4) // num_code_lengths = 12 (through '8' at order index 11)
    // order: 17,18,0,1,2,3,4,5,16,6,7,8 → lengths 2,0,0,0,0,0,0,0,2,0,0,1
    val clLens = Array(2, 0, 0, 0, 0, 0, 0, 0, 2, 0, 0, 1)
    clLens.foreach(l => bw.bits(l, 3))
    bw.bits(0, 1) // no max_symbol
    // code-length code (canonical): 8→'0' (1 bit), 16→'10', 17→'11'
    def cl8(): Unit = bw.code(0, 1)
    def cl16(extra2: Int): Unit = { bw.code(2, 2); bw.bits(extra2, 2) }
    def cl17(extra3: Int): Unit = { bw.code(3, 2); bw.bits(extra3, 3) }
    cl8() // symbol 0 has length 8
    var filled = 1
    while (filled < 256) { // 16: repeat prev len 3+extra times
      val rep = math.min(6, 256 - filled)
      cl16(rep - 3); filled += rep
    }
    cl17(7); cl17(7); cl17(1) // 24 zero lengths for the 24 length codes
    // RED, BLUE simple one-symbol 0 (1-bit form); ALPHA simple 255
    def simple1(sym: Int): Unit = {
      bw.bits(1, 1); bw.bits(0, 1) // simple, one symbol
      if (sym < 2) { bw.bits(0, 1); bw.bits(sym, 1) }
      else { bw.bits(1, 1); bw.bits(sym, 8) }
    }
    simple1(0) // red
    simple1(0) // blue
    simple1(255) // alpha
    simple1(0) // distance
    green.foreach(g => bw.code(g & 0xFF, 8))
  }

  /** Bare VP8L chunk payload (header + green stream) — the building
    * block [[encodeGreen]] wraps in RIFF and the animation fixture
    * builder drops into ANMF frames. */
  private[graft] def encodeGreenPayload(width: Int, height: Int,
      green: Array[Byte]): Array[Byte] = {
    require(width >= 1 && height >= 1 && green.length == width * height,
      s"encodeGreenPayload: ${green.length} != $width x $height")
    require(width <= 16384 && height <= 16384, "encodeGreenPayload: dim > 2^14")
    val bw = new Bw
    bw.bits(width - 1, 14); bw.bits(height - 1, 14)
    bw.bits(0, 1) // alpha hint off
    bw.bits(0, 3) // version
    writeGreenStream(bw, green)
    (0x2F.toByte) +: bw.bytes()
  }

  private[graft] def encodeGreen(width: Int, height: Int, green: Array[Byte]): Array[Byte] = {
    val payload = encodeGreenPayload(width, height, green)
    // RIFF container
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
    }
    val padded = payload.length + (payload.length & 1)
    out.write("RIFF".getBytes("US-ASCII")); le32(4 + 8 + padded)
    out.write("WEBP".getBytes("US-ASCII"))
    out.write("VP8L".getBytes("US-ASCII")); le32(payload.length)
    out.write(payload)
    if ((payload.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  /** Fixture/gate ALPH payload: forward-filters the plane with the
    * chosen prediction method (residual = value − predictor, mod 256,
    * predictors from the ORIGINAL neighbors — exactly what
    * [[decodeAlpha]]'s progressive unfilter reconstructs), then
    * stores it raw (C=0) or as a headerless GREEN image-stream (C=1).
    * Every (filter, compress) combination this writes was
    * cross-decoded against the system libwebp's `WebPDecodeRGBA`
    * (see Vp8Diff / WebpVp8Spec digest pins) — including filter
    * method 2, which the reference encoder's own heuristic rarely
    * emits. */
  private[graft] def encodeAlphaPayload(alpha: Array[Byte], w: Int, h: Int,
      filter: Int, compress: Int): Array[Byte] = {
    require(alpha.length == w * h, s"encodeAlphaPayload: ${alpha.length} != $w x $h")
    require(filter >= 0 && filter <= 3 && (compress == 0 || compress == 1))
    val res = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val pred =
          if (filter == 0) 0
          else if (x == 0 && y == 0) 0
          else if (y == 0) alpha(i - 1) & 0xFF
          else if (x == 0) alpha(i - w) & 0xFF
          else filter match {
            case 1 => alpha(i - 1) & 0xFF
            case 2 => alpha(i - w) & 0xFF
            case _ =>
              val g = (alpha(i - 1) & 0xFF) + (alpha(i - w) & 0xFF) - (alpha(i - w - 1) & 0xFF)
              if (g < 0) 0 else if (g > 255) 255 else g
          }
        res(i) = ((alpha(i) & 0xFF) - pred).toByte
        x += 1
      }
      y += 1
    }
    val hdr = ((filter << 2) | compress).toByte
    if (compress == 0) hdr +: res
    else {
      val bw = new Bw
      writeGreenStream(bw, res)
      hdr +: bw.bytes()
    }
  }

  /** One RIFF chunk: fourcc + LE32 size + body + odd-size pad. */
  private[graft] def chunkBytes(fourcc: String, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(fourcc.getBytes("US-ASCII"))
    out.write(body.length & 0xFF); out.write((body.length >> 8) & 0xFF)
    out.write((body.length >> 16) & 0xFF); out.write((body.length >> 24) & 0xFF)
    out.write(body)
    if ((body.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  /** Fixture/gate ANMF frame description: placement (even offsets,
    * as the wire stores them halved), timing, flags, and the frame's
    * inner chunk bytes (e.g. `chunkBytes("VP8L",
    * encodeGreenPayload(...))`, optionally preceded by an ALPH
    * chunk). */
  private[graft] final case class AnimFrameSpec(x: Int, y: Int, w: Int, h: Int,
      durationMs: Int, blend: Boolean, disposeToBg: Boolean, data: Array[Byte])

  /** Fixture/gate animation container: VP8X (animation flag) + ANIM +
    * one ANMF per frame. */
  private[graft] def encodeAnim(canvasW: Int, canvasH: Int, loopCount: Int,
      bgColor: Int, frames: Seq[AnimFrameSpec]): Array[Byte] = {
    require(frames.nonEmpty && frames.forall(f => (f.x & 1) == 0 && (f.y & 1) == 0),
      "encodeAnim: frame offsets must be even")
    val body = new java.io.ByteArrayOutputStream()
    val vp8x = new Array[Byte](10)
    vp8x(0) = 0x02 // animation flag
    vp8x(4) = ((canvasW - 1) & 0xFF).toByte
    vp8x(5) = (((canvasW - 1) >> 8) & 0xFF).toByte
    vp8x(6) = (((canvasW - 1) >> 16) & 0xFF).toByte
    vp8x(7) = ((canvasH - 1) & 0xFF).toByte
    vp8x(8) = (((canvasH - 1) >> 8) & 0xFF).toByte
    vp8x(9) = (((canvasH - 1) >> 16) & 0xFF).toByte
    body.write(chunkBytes("VP8X", vp8x))
    val anim = new Array[Byte](6)
    anim(0) = (bgColor & 0xFF).toByte; anim(1) = ((bgColor >> 8) & 0xFF).toByte
    anim(2) = ((bgColor >> 16) & 0xFF).toByte; anim(3) = ((bgColor >>> 24) & 0xFF).toByte
    anim(4) = (loopCount & 0xFF).toByte; anim(5) = ((loopCount >> 8) & 0xFF).toByte
    body.write(chunkBytes("ANIM", anim))
    for (f <- frames) {
      val hdr = new Array[Byte](16)
      def le24(o: Int, v: Int): Unit = {
        hdr(o) = (v & 0xFF).toByte; hdr(o + 1) = ((v >> 8) & 0xFF).toByte
        hdr(o + 2) = ((v >> 16) & 0xFF).toByte
      }
      le24(0, f.x / 2); le24(3, f.y / 2)
      le24(6, f.w - 1); le24(9, f.h - 1)
      le24(12, f.durationMs)
      hdr(15) = (((if (f.blend) 0 else 2) | (if (f.disposeToBg) 1 else 0))).toByte
      body.write(chunkBytes("ANMF", hdr ++ f.data))
    }
    val b = body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    val sz = 4 + b.length
    out.write(sz & 0xFF); out.write((sz >> 8) & 0xFF)
    out.write((sz >> 16) & 0xFF); out.write((sz >> 24) & 0xFF)
    out.write("WEBP".getBytes("US-ASCII"))
    out.write(b)
    out.toByteArray
  }

  /** Fixture/gate container: VP8X (alpha flag + canvas dims) + ALPH +
    * a lossy 'VP8 ' chunk (e.g. from the [[Vp8Enc]] encoder). */
  private[graft] def encodeLossyAlphaWebp(vp8Payload: Array[Byte],
      alphPayload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
    }
    def chunk(fourcc: String, body: Array[Byte]): Unit = {
      out.write(fourcc.getBytes("US-ASCII")); le32(body.length)
      out.write(body)
      if ((body.length & 1) == 1) out.write(0)
    }
    val vp8x = new Array[Byte](10)
    vp8x(0) = 0x10 // alpha flag
    vp8x(4) = ((w - 1) & 0xFF).toByte
    vp8x(5) = (((w - 1) >> 8) & 0xFF).toByte
    vp8x(6) = (((w - 1) >> 16) & 0xFF).toByte
    vp8x(7) = ((h - 1) & 0xFF).toByte
    vp8x(8) = (((h - 1) >> 8) & 0xFF).toByte
    vp8x(9) = (((h - 1) >> 16) & 0xFF).toByte
    out.write("RIFF".getBytes("US-ASCII"))
    val sz = 4 + (8 + 10) + (8 + alphPayload.length + (alphPayload.length & 1)) +
      (8 + vp8Payload.length + (vp8Payload.length & 1))
    le32(sz)
    out.write("WEBP".getBytes("US-ASCII"))
    chunk("VP8X", vp8x)
    chunk("ALPH", alphPayload)
    chunk("VP8 ", vp8Payload)
    out.toByteArray
  }
}
