package graft.ops

/** VP8 intra-frame (keyframe) decoder — RFC 6386, from the spec:
  * the LOSSY half of WebP ([[WebpCodec]] decodes the VP8L lossless
  * half), which is what the web's WebP majority actually is. Decodes
  * the full keyframe pipeline to the RFC-defined YUV 4:2:0 output:
  *
  *  - the boolean (arithmetic) decoder (§7) and tree decoding (§8);
  *  - the uncompressed frame tag + keyframe header (§9.1-9.2) and
  *    the first-partition header walk: segmentation (map + feature
  *    data), loop-filter type/level/sharpness + ref/mode deltas,
  *    token partitions, quantizer indices with per-plane deltas,
  *    coefficient-probability updates, the skip flag (§9.3-9.11);
  *  - per-macroblock intra modes (§11): the keyframe 16x16 tree,
  *    B_PRED 4x4 submodes with above/left context, chroma modes;
  *  - DCT/WHT token decoding (§13) with plane-typed band/context
  *    probabilities, category extra bits, and the zero-token
  *    context rule; dequantization with the §14.1 lookup tables and
  *    per-segment quantizer resolution;
  *  - the inverse WHT (Y2 → per-subblock DC, §14.3) and the exact
  *    integer inverse DCT (20091/35468 multipliers, §14.4);
  *  - intra prediction (§12): 16x16 DC/V/H/TM with the 127/129
  *    virtual borders, all ten 4x4 B modes (including the
  *    stale-above-right rule for right-edge subblocks AND the
  *    reference rule that rightmost-column i4x4 macroblocks with an
  *    above row replicate the above row's last pixel as their
  *    above-right, not the 127 border), chroma 8x8;
  *  - the in-loop deblocking filter (§15), BOTH profiles: the
  *    normal filter (MB-edge 27/18/9-tap and subblock 4-tap with
  *    high-edge-variance switching) and the simple filter, with
  *    keyframe hev thresholds, sharpness-derived interior limits,
  *    and per-segment / per-mode level adjustment.
  *
  * Static tables live in [[Vp8Tables]] — RFC-published data,
  * extracted from the system libwebp (both of its in-binary copies
  * verified identical) and cross-validated by the WebpVp8Spec pin:
  * byte-exact Y/U/V equality against `WebPDecodeYUV` of the
  * reference implementation over reference-encoded streams spanning
  * qualities 5-95, sizes 16x16-128x96, smooth/blocky/noise content
  * (every coefficient category, all ten B modes, segmentation on
  * and off, both partial-macroblock edges). [[toRgb]] converts the
  * 4:2:0 planes with the reference fixed-point BT.601 arithmetic and
  * "fancy" chroma upsampler, pinned byte-exactly against
  * `WebPDecodeRGB` on the same fixtures; [[Vp8EncSpec]]'s 367-case
  * crafted-stream grid (own encoder as differential driver) was
  * additionally cross-decoded by libwebp with zero mismatches.
  *
  * Out of scope, refused by construction (None): interframes (the
  * WebP still-image wire is always a keyframe), the show_frame=0
  * and scaling hints, and RFC version numbers > 3. Hostile-bytes
  * contract as everywhere in this package: bounds-checked reads,
  * never throws, None instead of guessing.
  *
  * Scale shape: one decode call per payload inside a scan-local
  * `mapPartitions` — no shuffle, no driver state; planes are
  * O(width · height) per row, the same envelope as the PNG/JPEG
  * rungs.
  */
object Vp8 {

  /** Tight planes: y is width*height; u and v are
    * ceil(w/2)*ceil(h/2) (4:2:0). */
  final case class Frame(width: Int, height: Int,
      y: Array[Byte], u: Array[Byte], v: Array[Byte])

  private object Bad extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bad(): Nothing = throw Bad

  // ---------------------------------------------------------- bool decoder

  private[ops] final class BoolDec(b: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var range = 255
    private var value = 0
    private var bitCount = 0
    private def nextByte(): Int =
      if (pos < end) { val v = b(pos) & 0xFF; pos += 1; v } else 0
    value = (nextByte() << 8) | nextByte()

    def bool(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val big = split << 8
      val ret = if (value >= big) { range -= split; value -= big; 1 }
                else { range = split; 0 }
      while (range < 128) {
        value <<= 1; range <<= 1
        bitCount += 1
        if (bitCount == 8) { bitCount = 0; value |= nextByte() }
      }
      ret
    }
    def literal(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bool(128); i += 1 }
      v
    }
    /** value-then-sign, the header's signed-field convention. */
    def signed(n: Int): Int = {
      val v = literal(n)
      if (bool(128) == 1) -v else v
    }
    /** §8 tree decode: positive entries are node indices, -v a leaf. */
    def tree(t: Array[Int], probs: Array[Int], probOff: Int, startIdx: Int): Int = {
      var i = startIdx
      while ({ i = t(i + bool(probs(probOff + (i >> 1)))); i > 0 }) ()
      -i
    }
  }

  // ---------------------------------------------------------- static trees

  // keyframe 16x16 luma: B_PRED(4), DC(0), V(1), H(2), TM(3)
  private val KfYModeTree = Array(-4, 2, 4, 6, -0, -1, -2, -3)
  private val KfYModeProb = Array(145, 156, 163, 128)
  // chroma: DC, V, H, TM
  private val UvModeTree = Array(-0, 2, -1, 4, -2, -3)
  private val KfUvModeProb = Array(142, 114, 183)
  // 4x4 submodes, §11.2 order: DC TM VE HE LD RD VR VL HD HU
  private val BModeTree = Array(
    -0, 2, -1, 4, -2, 6, 8, 12, -3, 10, -5, -6, -4, 14, -7, 16, -8, -9)
  // the mapping of 16x16 modes onto submode context values
  private val YModeToB = Array(0 /*DC*/ , 2 /*V→VE*/ , 3 /*H→HE*/ , 1 /*TM*/ )
  private val SegmentTree = Array(2, 4, -0, -1, -2, -3)

  // token tree (§13.2): EOB, 0, 1, 2, 3, 4, cat1..cat6
  private val CoeffTree = Array(
    -11, 2, // -DCT_EOB
    -0, 4, // ZERO
    -1, 6, // ONE
    8, 12,
    -2, 10, // TWO
    -3, -4, // THREE FOUR
    14, 16,
    -5, -6, // CAT1 CAT2
    18, 20,
    -7, -8, // CAT3 CAT4
    -9, -10) // CAT5 CAT6
  private val CatProbs: Array[Array[Int]] = Array(
    Array(159),
    Array(165, 145),
    Array(173, 148, 140),
    Array(176, 155, 140, 135),
    Array(180, 157, 141, 134, 130),
    Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))
  private val CatBase = Array(5, 7, 11, 19, 35, 67)
  private[ops] val CoeffBands = Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
  private[ops] val Zigzag = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
  private def clamp127(v: Int): Int = if (v < 0) 0 else if (v > 127) 127 else v

  // ---------------------------------------------------------- transforms

  /** Exact integer inverse DCT (§14.4); in/out are 16-int blocks. */
  private[ops] def idct4x4(blk: Array[Int]): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) { // columns
      val ip0 = blk(i); val ip4 = blk(i + 4); val ip8 = blk(i + 8); val ip12 = blk(i + 12)
      val a1 = ip0 + ip8
      val b1 = ip0 - ip8
      val t1 = ((ip4 * 35468) >> 16) - (ip12 + ((ip12 * 20091) >> 16))
      val t2 = (ip4 + ((ip4 * 20091) >> 16)) + ((ip12 * 35468) >> 16)
      tmp(i) = a1 + t2
      tmp(i + 12) = a1 - t2
      tmp(i + 4) = b1 + t1
      tmp(i + 8) = b1 - t1
      i += 1
    }
    i = 0
    while (i < 4) { // rows
      val o = i * 4
      val ip0 = tmp(o); val ip1 = tmp(o + 1); val ip2 = tmp(o + 2); val ip3 = tmp(o + 3)
      val a1 = ip0 + ip2
      val b1 = ip0 - ip2
      val t1 = ((ip1 * 35468) >> 16) - (ip3 + ((ip3 * 20091) >> 16))
      val t2 = (ip1 + ((ip1 * 20091) >> 16)) + ((ip3 * 35468) >> 16)
      blk(o) = (a1 + t2 + 4) >> 3
      blk(o + 3) = (a1 - t2 + 4) >> 3
      blk(o + 1) = (b1 + t1 + 4) >> 3
      blk(o + 2) = (b1 - t1 + 4) >> 3
      i += 1
    }
  }

  /** Inverse Walsh-Hadamard for the Y2 block (§14.3). */
  private[ops] def iwht4x4(blk: Array[Int]): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a1 = blk(i) + blk(i + 12)
      val b1 = blk(i + 4) + blk(i + 8)
      val c1 = blk(i + 4) - blk(i + 8)
      val d1 = blk(i) - blk(i + 12)
      tmp(i) = a1 + b1
      tmp(i + 4) = c1 + d1
      tmp(i + 8) = a1 - b1
      tmp(i + 12) = d1 - c1
      i += 1
    }
    i = 0
    while (i < 4) {
      val o = i * 4
      val a1 = tmp(o) + tmp(o + 3)
      val b1 = tmp(o + 1) + tmp(o + 2)
      val c1 = tmp(o + 1) - tmp(o + 2)
      val d1 = tmp(o) - tmp(o + 3)
      blk(o) = (a1 + b1 + 3) >> 3
      blk(o + 1) = (c1 + d1 + 3) >> 3
      blk(o + 2) = (a1 - b1 + 3) >> 3
      blk(o + 3) = (d1 - c1 + 3) >> 3
      i += 1
    }
  }

  // ---------------------------------------------------------- header state

  private[ops] final class Header {
    var width = 0; var height = 0
    var segEnabled = false; var segUpdateMap = false; var segAbsDelta = false
    val segQuant = new Array[Int](4)
    val segLf = new Array[Int](4)
    val segTreeProbs = Array(255, 255, 255)
    var filterSimple = false; var filterLevel = 0; var sharpness = 0
    var lfDeltaEnabled = false
    val refLfDeltas = new Array[Int](4)
    val modeLfDeltas = new Array[Int](4)
    var nParts = 1
    var yacQi = 0
    var ydcDelta = 0; var y2dcDelta = 0; var y2acDelta = 0
    var uvdcDelta = 0; var uvacDelta = 0
    var probSkip = 0; var mbNoSkip = false
    // coefficient probabilities, flattened [4][8][3][11]
    val coeffProbs: Array[Int] = Vp8Tables.coeffProbs.clone()
  }

  private def parseHeader(bd: BoolDec, h: Header): Unit = {
    if (bd.literal(1) != 0) bad() // color space: reserved value
    bd.literal(1) // clamping type (hint only; reconstruction clamps anyway)
    h.segEnabled = bd.literal(1) == 1
    if (h.segEnabled) {
      h.segUpdateMap = bd.literal(1) == 1
      val updateData = bd.literal(1) == 1
      if (updateData) {
        h.segAbsDelta = bd.literal(1) == 1
        var i = 0
        while (i < 4) {
          h.segQuant(i) = if (bd.literal(1) == 1) bd.signed(7) else 0
          i += 1
        }
        i = 0
        while (i < 4) {
          h.segLf(i) = if (bd.literal(1) == 1) bd.signed(6) else 0
          i += 1
        }
      }
      if (h.segUpdateMap) {
        var i = 0
        while (i < 3) {
          h.segTreeProbs(i) = if (bd.literal(1) == 1) bd.literal(8) else 255
          i += 1
        }
      }
    }
    h.filterSimple = bd.literal(1) == 1
    h.filterLevel = bd.literal(6)
    h.sharpness = bd.literal(3)
    h.lfDeltaEnabled = bd.literal(1) == 1
    if (h.lfDeltaEnabled && bd.literal(1) == 1) { // delta update
      var i = 0
      while (i < 4) {
        if (bd.literal(1) == 1) h.refLfDeltas(i) = bd.signed(6)
        i += 1
      }
      i = 0
      while (i < 4) {
        if (bd.literal(1) == 1) h.modeLfDeltas(i) = bd.signed(6)
        i += 1
      }
    }
    h.nParts = 1 << bd.literal(2)
    h.yacQi = bd.literal(7)
    h.ydcDelta = if (bd.literal(1) == 1) bd.signed(4) else 0
    h.y2dcDelta = if (bd.literal(1) == 1) bd.signed(4) else 0
    h.y2acDelta = if (bd.literal(1) == 1) bd.signed(4) else 0
    h.uvdcDelta = if (bd.literal(1) == 1) bd.signed(4) else 0
    h.uvacDelta = if (bd.literal(1) == 1) bd.signed(4) else 0
    bd.literal(1) // refresh_entropy_probs: keyframe decode keeps defaults
    var i = 0
    while (i < 1056) {
      if (bd.bool(Vp8Tables.coeffUpdateProbs(i)) == 1)
        h.coeffProbs(i) = bd.literal(8)
      i += 1
    }
    h.mbNoSkip = bd.literal(1) == 1
    h.probSkip = if (h.mbNoSkip) bd.literal(8) else 0
  }

  // ---------------------------------------------------------- tokens

  /** Decode one block's coefficients into `out(base + 0..15)`
    * (natural order, dequantized). Returns the end-of-block
    * position. */
  private def decodeCoeffs(bd: BoolDec, probs: Array[Int], plane: Int,
      first: Int, ctx0: Int, dqDC: Int, dqAC: Int,
      out: Array[Int], base: Int): Int = {
    var n = first
    var ctx = ctx0
    var skipEob = false
    while (n < 16) {
      val band = CoeffBands(n)
      val off = ((plane * 8 + band) * 3 + ctx) * 11
      val tok = bd.tree(CoeffTree, probs, off, if (skipEob) 2 else 0)
      if (tok == 11) return n // EOB
      if (tok == 0) {
        ctx = 0; skipEob = true; n += 1
      } else {
        skipEob = false
        var v =
          if (tok <= 4) tok
          else {
            val cat = tok - 5
            val cp = CatProbs(cat)
            var extra = 0
            var i = 0
            while (i < cp.length) { extra = (extra << 1) | bd.bool(cp(i)); i += 1 }
            CatBase(cat) + extra
          }
        ctx = if (v == 1) 1 else 2
        if (bd.bool(128) == 1) v = -v
        out(base + Zigzag(n)) = v * (if (n == 0) dqDC else dqAC)
        n += 1
      }
    }
    16
  }

  // ---------------------------------------------------------- prediction

  /** Planes padded by 1 top row, 1 left col and 8 right cols: the
    * top border row is 127 everywhere (including the corner and the
    * right extension, which the above-right rule reads and which is
    * NEVER overwritten — the spec's quirk that off-frame above-right
    * stays 127 for all rows); the left border col is 129 below it. */
  private[ops] final class Plane(val w: Int, val h: Int) {
    val stride: Int = 1 + w + 8
    val px = new Array[Byte](stride * (1 + h))
    java.util.Arrays.fill(px, 0, stride, 127.toByte)
    var r = 1
    while (r <= h) {
      px(r * stride) = 129.toByte
      // right extension rows keep 127 (never reconstructed into)
      var c = 1 + w
      while (c < stride) { px(r * stride + c) = 127.toByte; c += 1 }
      r += 1
    }
    @inline def get(x: Int, y: Int): Int = px((y + 1) * stride + (x + 1)) & 0xFF
    @inline def set(x: Int, y: Int, v: Int): Unit =
      px((y + 1) * stride + (x + 1)) = v.toByte
    def crop(cw: Int, ch: Int): Array[Byte] = {
      val out = new Array[Byte](cw * ch)
      var yy = 0
      while (yy < ch) {
        System.arraycopy(px, (yy + 1) * stride + 1, out, yy * cw, cw)
        yy += 1
      }
      out
    }
  }

  /** Whole-block (16x16 / 8x8) intra prediction into the plane. */
  private[ops] def predictBlock(p: Plane, x0: Int, y0: Int, size: Int,
      mode: Int, hasAbove: Boolean, hasLeft: Boolean): Unit = {
    mode match {
      case 0 => // DC with edge rules
        var sum = 0; var count = 0
        if (hasAbove) { var i = 0; while (i < size) { sum += p.get(x0 + i, y0 - 1); i += 1 }; count += size }
        if (hasLeft) { var i = 0; while (i < size) { sum += p.get(x0 - 1, y0 + i); i += 1 }; count += size }
        val dc =
          if (count == 0) 128
          else (sum + count / 2) / count
        var yy = 0
        while (yy < size) { var xx = 0; while (xx < size) { p.set(x0 + xx, y0 + yy, dc); xx += 1 }; yy += 1 }
      case 1 => // V
        var yy = 0
        while (yy < size) { var xx = 0; while (xx < size) { p.set(x0 + xx, y0 + yy, p.get(x0 + xx, y0 - 1)); xx += 1 }; yy += 1 }
      case 2 => // H
        var yy = 0
        while (yy < size) { var xx = 0; while (xx < size) { p.set(x0 + xx, y0 + yy, p.get(x0 - 1, y0 + yy)); xx += 1 }; yy += 1 }
      case _ => // TM
        val tl = p.get(x0 - 1, y0 - 1)
        var yy = 0
        while (yy < size) {
          val l = p.get(x0 - 1, y0 + yy)
          var xx = 0
          while (xx < size) { p.set(x0 + xx, y0 + yy, clamp255(l + p.get(x0 + xx, y0 - 1) - tl)); xx += 1 }
          yy += 1
        }
    }
  }

  @inline private def avg2(a: Int, b: Int): Int = (a + b + 1) >> 1
  @inline private def avg3(a: Int, b: Int, c: Int): Int = (a + 2 * b + c + 2) >> 2

  /** 4x4 B_PRED submode prediction (§12.3). `arFromTop` carries the
    * stale-above-right rule: right-edge subblocks read the above-MB
    * row's pixels, not same-MB reconstruction. */
  private[ops] def predictB(p: Plane, x0: Int, y0: Int, mode: Int, arY: Int): Unit = {
    val a = new Array[Int](4); val l = new Array[Int](4); val ar = new Array[Int](4)
    var i = 0
    while (i < 4) {
      a(i) = p.get(x0 + i, y0 - 1)
      l(i) = p.get(x0 - 1, y0 + i)
      ar(i) = p.get(x0 + 4 + i, arY)
      i += 1
    }
    val tl = p.get(x0 - 1, y0 - 1)
    @inline def s(x: Int, y: Int, v: Int): Unit = p.set(x0 + x, y0 + y, v)
    mode match {
      case 0 => // B_DC
        var sum = 4; i = 0
        while (i < 4) { sum += a(i) + l(i); i += 1 }
        val dc = sum >> 3
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) { s(x, y, dc); x += 1 }; y += 1 }
      case 1 => // B_TM
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) { s(x, y, clamp255(l(y) + a(x) - tl)); x += 1 }; y += 1 }
      case 2 => // B_VE: filtered vertical
        val f = Array(avg3(tl, a(0), a(1)), avg3(a(0), a(1), a(2)),
          avg3(a(1), a(2), a(3)), avg3(a(2), a(3), ar(0)))
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) { s(x, y, f(x)); x += 1 }; y += 1 }
      case 3 => // B_HE: filtered horizontal
        val f = Array(avg3(tl, l(0), l(1)), avg3(l(0), l(1), l(2)),
          avg3(l(1), l(2), l(3)), avg3(l(2), l(3), l(3)))
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) { s(x, y, f(y)); x += 1 }; y += 1 }
      case 4 => // B_LD (down-left)
        val e = Array(a(0), a(1), a(2), a(3), ar(0), ar(1), ar(2), ar(3))
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val k = x + y
            s(x, y, if (k == 6) avg3(e(6), e(7), e(7)) else avg3(e(k), e(k + 1), e(k + 2)))
            x += 1
          }
          y += 1
        }
      case 5 => // B_RD (down-right)
        val e = Array(l(3), l(2), l(1), l(0), tl, a(0), a(1), a(2), a(3))
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) { val k = x - y + 4; s(x, y, avg3(e(k - 1), e(k), e(k + 1))); x += 1 }
          y += 1
        }
      case 6 => // B_VR (vertical-right): rows 2,3 copy rows 0,1 shifted
        val r0 = Array(avg2(tl, a(0)), avg2(a(0), a(1)), avg2(a(1), a(2)), avg2(a(2), a(3)))
        val r1 = Array(avg3(l(0), tl, a(0)), avg3(tl, a(0), a(1)),
          avg3(a(0), a(1), a(2)), avg3(a(1), a(2), a(3)))
        var x = 0
        while (x < 4) { s(x, 0, r0(x)); s(x, 1, r1(x)); x += 1 }
        s(0, 2, avg3(l(1), l(0), tl)); s(1, 2, r0(0)); s(2, 2, r0(1)); s(3, 2, r0(2))
        s(0, 3, avg3(l(2), l(1), l(0))); s(1, 3, r1(0)); s(2, 3, r1(1)); s(3, 3, r1(2))
      case 7 => // B_VL (vertical-left): rows 2,3 copy rows 0,1 shifted
        val r0 = Array(avg2(a(0), a(1)), avg2(a(1), a(2)), avg2(a(2), a(3)), avg2(a(3), ar(0)))
        val r1 = Array(avg3(a(0), a(1), a(2)), avg3(a(1), a(2), a(3)),
          avg3(a(2), a(3), ar(0)), avg3(a(3), ar(0), ar(1)))
        var x = 0
        while (x < 4) { s(x, 0, r0(x)); s(x, 1, r1(x)); x += 1 }
        s(0, 2, r0(1)); s(1, 2, r0(2)); s(2, 2, r0(3)); s(3, 2, avg3(ar(0), ar(1), ar(2)))
        s(0, 3, r1(1)); s(1, 3, r1(2)); s(2, 3, r1(3)); s(3, 3, avg3(ar(1), ar(2), ar(3)))
      case 8 => // B_HD (horizontal-down): cols 2,3 copy cols 0,1 shifted up
        val e = Array(l(3), l(2), l(1), l(0), tl, a(0), a(1), a(2))
        val c0 = Array(avg2(e(3), e(4)), avg2(e(2), e(3)), avg2(e(1), e(2)), avg2(e(0), e(1)))
        val c1 = Array(avg3(e(3), e(4), e(5)), avg3(e(2), e(3), e(4)),
          avg3(e(1), e(2), e(3)), avg3(e(0), e(1), e(2)))
        var y = 0
        while (y < 4) { s(0, y, c0(y)); s(1, y, c1(y)); y += 1 }
        s(2, 0, avg3(e(4), e(5), e(6))); s(3, 0, avg3(e(5), e(6), e(7)))
        s(2, 1, c0(0)); s(3, 1, c1(0))
        s(2, 2, c0(1)); s(3, 2, c1(1))
        s(2, 3, c0(2)); s(3, 3, c1(2))
      case _ => // B_HU (horizontal-up)
        val v0 = avg2(l(0), l(1)); val v1 = avg3(l(0), l(1), l(2))
        val v2 = avg2(l(1), l(2)); val v3 = avg3(l(1), l(2), l(3))
        val v4 = avg2(l(2), l(3)); val v5 = avg3(l(2), l(3), l(3))
        s(0, 0, v0); s(1, 0, v1); s(2, 0, v2); s(3, 0, v3)
        s(0, 1, v2); s(1, 1, v3); s(2, 1, v4); s(3, 1, v5)
        s(0, 2, v4); s(1, 2, v5); s(2, 2, l(3)); s(3, 2, l(3))
        s(0, 3, l(3)); s(1, 3, l(3)); s(2, 3, l(3)); s(3, 3, l(3))
    }
  }

  /** Add a residual block to the plane with clamping. */
  private[ops] def addResidual(p: Plane, x0: Int, y0: Int, blk: Array[Int]): Unit = {
    var y = 0
    while (y < 4) {
      var x = 0
      while (x < 4) {
        p.set(x0 + x, y0 + y, clamp255(p.get(x0 + x, y0 + y) + blk(y * 4 + x)))
        x += 1
      }
      y += 1
    }
  }

  // ---------------------------------------------------------- loop filter

  @inline private def sclamp(v: Int): Int = if (v < -128) -128 else if (v > 127) v.min(127) else v
  @inline private def u2s(v: Int): Int = v - 128
  @inline private def s2u(v: Int): Int = clamp255(v + 128)

  private final class Edge(p: Plane, x: Int, y: Int, dx: Int, dy: Int) {
    // pixel at signed offset k across the edge: k<0 = p side
    @inline def get(k: Int): Int = p.get(x + k * dx, y + k * dy)
    @inline def set(k: Int, v: Int): Unit = p.set(x + k * dx, y + k * dy, v)
  }

  private def simpleMask(e: Edge, limit: Int): Boolean =
    math.abs(e.get(-1) - e.get(0)) * 2 + math.abs(e.get(-2) - e.get(1)) / 2 <= limit

  private def normalMask(e: Edge, interior: Int, edgeLimit: Int): Boolean =
    simpleMask(e, edgeLimit) &&
      math.abs(e.get(-4) - e.get(-3)) <= interior &&
      math.abs(e.get(-3) - e.get(-2)) <= interior &&
      math.abs(e.get(-2) - e.get(-1)) <= interior &&
      math.abs(e.get(3) - e.get(2)) <= interior &&
      math.abs(e.get(2) - e.get(1)) <= interior &&
      math.abs(e.get(1) - e.get(0)) <= interior

  private def hev(e: Edge, thresh: Int): Boolean =
    math.abs(e.get(-2) - e.get(-1)) > thresh || math.abs(e.get(1) - e.get(0)) > thresh

  /** The common 4-tap adjust (§15.2); useOuter taps p1/q1 into the
    * delta, applyOuter spreads half the delta onto them. */
  private def commonAdjust(e: Edge, useOuter: Boolean, applyOuter: Boolean): Unit = {
    val p1 = u2s(e.get(-2)); val p0 = u2s(e.get(-1))
    val q0 = u2s(e.get(0)); val q1 = u2s(e.get(1))
    var a = 3 * (q0 - p0)
    if (useOuter) a += sclamp(p1 - q1)
    a = sclamp(a)
    val f = sclamp(a + 4) >> 3
    val ee = sclamp(a + 3) >> 3
    e.set(0, s2u(q0 - f))
    e.set(-1, s2u(p0 + ee))
    if (applyOuter) {
      val a2 = (f + 1) >> 1
      e.set(1, s2u(q1 - a2))
      e.set(-2, s2u(p1 + a2))
    }
  }

  /** The 27/18/9 macroblock-edge filter (§15.3). */
  private def mbFilter(e: Edge): Unit = {
    val p2 = u2s(e.get(-3)); val p1 = u2s(e.get(-2)); val p0 = u2s(e.get(-1))
    val q0 = u2s(e.get(0)); val q1 = u2s(e.get(1)); val q2 = u2s(e.get(2))
    val w = sclamp(sclamp(p1 - q1) + 3 * (q0 - p0))
    var a = (27 * w + 63) >> 7
    e.set(0, s2u(q0 - a)); e.set(-1, s2u(p0 + a))
    a = (18 * w + 63) >> 7
    e.set(1, s2u(q1 - a)); e.set(-2, s2u(p1 + a))
    a = (9 * w + 63) >> 7
    e.set(2, s2u(q2 - a)); e.set(-3, s2u(p2 + a))
  }

  private def filterEdgeNormal(e: Edge, interior: Int, edgeLimit: Int,
      hevT: Int, isMbEdge: Boolean): Unit =
    if (normalMask(e, interior, edgeLimit)) {
      if (hev(e, hevT)) commonAdjust(e, useOuter = true, applyOuter = false)
      else if (isMbEdge) mbFilter(e)
      else commonAdjust(e, useOuter = false, applyOuter = true)
    }

  // ---------------------------------------------------------- decode

  /** Decode a VP8 keyframe payload (the bytes after the 'VP8 ' chunk
    * header). None for interframes, hostile bytes, or reserved
    * features. */
  def decodeFrame(d: Array[Byte]): Option[Frame] =
    try {
      if (d.length < 10) return None
      val tag = (d(0) & 0xFF) | ((d(1) & 0xFF) << 8) | ((d(2) & 0xFF) << 16)
      if ((tag & 1) != 0) return None // interframe
      if (((tag >> 1) & 7) > 3) return None // version
      val part0Len = tag >>> 5
      if ((d(3) & 0xFF) != 0x9d || (d(4) & 0xFF) != 0x01 || (d(5) & 0xFF) != 0x2a) return None
      val width = ((d(6) & 0xFF) | ((d(7) & 0xFF) << 8)) & 0x3FFF
      val height = ((d(8) & 0xFF) | ((d(9) & 0xFF) << 8)) & 0x3FFF
      if (width == 0 || height == 0) return None
      if (width.toLong * height > PngCodec.MaxPixelBytes / 4) return None
      if (10L + part0Len > d.length) return None
      val bd = new BoolDec(d, 10, 10 + part0Len)
      val h = new Header
      h.width = width; h.height = height
      parseHeader(bd, h)
      // token partitions
      val sizesAt = 10 + part0Len
      if (sizesAt + 3L * (h.nParts - 1) > d.length) return None
      var off = sizesAt + 3 * (h.nParts - 1)
      val parts = new Array[BoolDec](h.nParts)
      var pi = 0
      while (pi < h.nParts) {
        val len =
          if (pi == h.nParts - 1) d.length - off
          else {
            val o = sizesAt + 3 * pi
            (d(o) & 0xFF) | ((d(o + 1) & 0xFF) << 8) | ((d(o + 2) & 0xFF) << 16)
          }
        if (len < 0 || off + len > d.length) return None
        parts(pi) = new BoolDec(d, off, off + len)
        off += len
        pi += 1
      }

      val mbW = (width + 15) / 16
      val mbH = (height + 15) / 16
      val yP = new Plane(mbW * 16, mbH * 16)
      val uP = new Plane(mbW * 8, mbH * 8)
      val vP = new Plane(mbW * 8, mbH * 8)

      // contexts
      val aboveModes = Array.fill(mbW * 4)(0)
      val leftModes = new Array[Int](4)
      // nonzero flags: above per mb-col (y 4, u 2, v 2, y2 1), left likewise
      val aboveNz = Array.ofDim[Int](mbW, 9)
      val leftNz = new Array[Int](9)
      // per-MB facts for the loop filter
      val mbLevel = new Array[Int](mbW * mbH)
      val mbInner = new Array[Boolean](mbW * mbH)

      val coeffs = new Array[Int](25 * 16)
      val blk = new Array[Int](16)
      val y2 = new Array[Int](16)

      var mby = 0
      while (mby < mbH) {
        java.util.Arrays.fill(leftNz, 0)
        java.util.Arrays.fill(leftModes, 0)
        val td = parts(mby % h.nParts)
        var mbx = 0
        while (mbx < mbW) {
          // ---- modes (first partition) ----
          val seg =
            if (h.segEnabled && h.segUpdateMap)
              bd.tree(SegmentTree, h.segTreeProbs, 0, 0)
            else 0
          val skipFlag = if (h.mbNoSkip) bd.bool(h.probSkip) == 1 else false
          val yMode = bd.tree(KfYModeTree, KfYModeProb, 0, 0)
          val isB = yMode == 4
          val subModes = new Array[Int](16)
          if (isB) {
            var sb = 0
            while (sb < 16) {
              val sx = sb & 3; val sy = sb >> 2
              val above = if (sy == 0) aboveModes(mbx * 4 + sx) else subModes(sb - 4)
              val left = if (sx == 0) leftModes(sy) else subModes(sb - 1)
              subModes(sb) = bd.tree(BModeTree, Vp8Tables.kfBModeProbs,
                (above * 10 + left) * 9, 0)
              sb += 1
            }
          } else java.util.Arrays.fill(subModes, YModeToB(yMode))
          var i = 0
          while (i < 4) {
            aboveModes(mbx * 4 + i) = subModes(12 + i)
            leftModes(i) = subModes(i * 4 + 3)
            i += 1
          }
          val uvMode = bd.tree(UvModeTree, KfUvModeProb, 0, 0)

          // ---- quantizers for this MB's segment ----
          val qi0 =
            if (h.segEnabled) {
              if (h.segAbsDelta) h.segQuant(seg) else h.yacQi + h.segQuant(seg)
            } else h.yacQi
          val qi = clamp127(qi0)
          val ydc = Vp8Tables.dcQ(clamp127(qi + h.ydcDelta))
          val yac = Vp8Tables.acQ(qi)
          val y2dc = Vp8Tables.dcQ(clamp127(qi + h.y2dcDelta)) * 2
          val y2acRaw = Vp8Tables.acQ(clamp127(qi + h.y2acDelta)) * 155 / 100
          val y2ac = if (y2acRaw < 8) 8 else y2acRaw
          val uvdcRaw = Vp8Tables.dcQ(clamp127(qi + h.uvdcDelta))
          val uvdc = if (uvdcRaw > 132) 132 else uvdcRaw
          val uvac = Vp8Tables.acQ(clamp127(qi + h.uvacDelta))

          // ---- tokens ----
          val hasY2 = !isB
          java.util.Arrays.fill(coeffs, 0)
          var mbNonzero = false
          if (skipFlag) {
            var k = 0
            while (k < 8) { leftNz(k) = 0; aboveNz(mbx)(k) = 0; k += 1 }
            if (hasY2) { leftNz(8) = 0; aboveNz(mbx)(8) = 0 }
          } else {
            var firstY = 0
            var planeY = 3
            if (hasY2) {
              val ctx = aboveNz(mbx)(8) + leftNz(8)
              val eob = decodeCoeffs(td, h.coeffProbs, 1, 0, ctx, y2dc, y2ac,
                coeffs, 24 * 16)
              val nz = if (eob > 0) 1 else 0
              aboveNz(mbx)(8) = nz; leftNz(8) = nz
              if (nz == 1) mbNonzero = true
              firstY = 1
              planeY = 0
            }
            var b = 0
            while (b < 16) {
              val bx = b & 3; val by = b >> 2
              val ctx = aboveNz(mbx)(bx) + leftNz(by)
              val eob = decodeCoeffs(td, h.coeffProbs, planeY, firstY, ctx,
                ydc, yac, coeffs, b * 16)
              val nz = if (eob > firstY) 1 else 0
              aboveNz(mbx)(bx) = nz; leftNz(by) = nz
              if (nz == 1) mbNonzero = true
              b += 1
            }
            var pl = 0
            while (pl < 2) {
              var c = 0
              while (c < 4) {
                val b2 = 16 + pl * 4 + c
                val cx = c & 1; val cy = c >> 1
                val ctx = aboveNz(mbx)(4 + pl * 2 + cx) + leftNz(4 + pl * 2 + cy)
                val eob = decodeCoeffs(td, h.coeffProbs, 2, 0, ctx,
                  uvdc, uvac, coeffs, b2 * 16)
                val nz = if (eob > 0) 1 else 0
                aboveNz(mbx)(4 + pl * 2 + cx) = nz; leftNz(4 + pl * 2 + cy) = nz
                if (nz == 1) mbNonzero = true
                c += 1
              }
              pl += 1
            }
          }

          // ---- reconstruction ----
          val x0 = mbx * 16; val y0 = mby * 16
          if (hasY2) {
            var k = 0
            while (k < 16) { y2(k) = coeffs(24 * 16 + k); k += 1 }
            iwht4x4(y2)
            var b = 0
            while (b < 16) { coeffs(b * 16) = y2(b); b += 1 }
            predictBlock(yP, x0, y0, 16, yMode, mby > 0, mbx > 0)
            var bb = 0
            while (bb < 16) {
              var k2 = 0
              while (k2 < 16) { blk(k2) = coeffs(bb * 16 + k2); k2 += 1 }
              idct4x4(blk)
              addResidual(yP, x0 + (bb & 3) * 4, y0 + (bb >> 2) * 4, blk)
              bb += 1
            }
          } else {
            // Reference rule (libwebp dec/frame_dec.c ReconstructRow,
            // same in libvpx): for i4x4 MBs in the RIGHTMOST MB column
            // with an above row, the four above-right pixels replicate
            // the above row's last in-MB pixel — they are not the 127
            // border.
            if (mbx == mbW - 1 && mby > 0) {
              val v = yP.get(x0 + 15, y0 - 1)
              var i = 0
              while (i < 4) { yP.set(x0 + 16 + i, y0 - 1, v); i += 1 }
            }
            var bb = 0
            while (bb < 16) {
              val bx0 = x0 + (bb & 3) * 4; val by0 = y0 + (bb >> 2) * 4
              // right-edge subblocks read above-right from the MB's
              // top border row (stale rule)
              val arY = if ((bb & 3) == 3) y0 - 1 else by0 - 1
              predictB(yP, bx0, by0, subModes(bb), arY)
              var k2 = 0
              while (k2 < 16) { blk(k2) = coeffs(bb * 16 + k2); k2 += 1 }
              idct4x4(blk)
              addResidual(yP, bx0, by0, blk)
              bb += 1
            }
          }
          val cx0 = mbx * 8; val cy0 = mby * 8
          predictBlock(uP, cx0, cy0, 8, uvMode, mby > 0, mbx > 0)
          predictBlock(vP, cx0, cy0, 8, uvMode, mby > 0, mbx > 0)
          var cb = 0
          while (cb < 8) {
            val plane = if (cb < 4) uP else vP
            val ci = cb & 3
            var k2 = 0
            while (k2 < 16) { blk(k2) = coeffs((16 + cb) * 16 + k2); k2 += 1 }
            idct4x4(blk)
            addResidual(plane, cx0 + (ci & 1) * 4, cy0 + (ci >> 1) * 4, blk)
            cb += 1
          }

          // ---- loop-filter facts ----
          var lvl =
            if (h.segEnabled) {
              if (h.segAbsDelta) h.segLf(seg) else h.filterLevel + h.segLf(seg)
            } else h.filterLevel
          if (h.lfDeltaEnabled) {
            lvl += h.refLfDeltas(0) // intra frame
            if (isB) lvl += h.modeLfDeltas(0)
          }
          mbLevel(mby * mbW + mbx) = if (lvl < 0) 0 else if (lvl > 63) 63 else lvl
          mbInner(mby * mbW + mbx) = isB || mbNonzero
          mbx += 1
        }
        mby += 1
      }

      // ---- loop filter over the reconstructed frame ----
      {
        mby = 0
        while (mby < mbH) {
          var mbx = 0
          while (mbx < mbW) {
            val level = mbLevel(mby * mbW + mbx)
            if (level > 0) {
              var interior = level
              if (h.sharpness > 0) {
                interior >>= (if (h.sharpness > 4) 2 else 1)
                if (interior > 9 - h.sharpness) interior = 9 - h.sharpness
              }
              if (interior < 1) interior = 1
              val mbLimit = (level + 2) * 2 + interior
              val sbLimit = level * 2 + interior
              val hevT = if (level >= 40) 2 else if (level >= 15) 1 else 0
              val inner = mbInner(mby * mbW + mbx)
              val x0 = mbx * 16; val y0 = mby * 16
              val cx0 = mbx * 8; val cy0 = mby * 8
              if (h.filterSimple) {
                if (mbx > 0) {
                  var r = 0
                  while (r < 16) {
                    val e = new Edge(yP, x0, y0 + r, 1, 0)
                    if (simpleMask(e, mbLimit)) commonAdjust(e, useOuter = true, applyOuter = false)
                    r += 1
                  }
                }
                if (inner) {
                  var c = 4
                  while (c < 16) {
                    var r = 0
                    while (r < 16) {
                      val e = new Edge(yP, x0 + c, y0 + r, 1, 0)
                      if (simpleMask(e, sbLimit)) commonAdjust(e, useOuter = true, applyOuter = false)
                      r += 1
                    }
                    c += 4
                  }
                }
                if (mby > 0) {
                  var c = 0
                  while (c < 16) {
                    val e = new Edge(yP, x0 + c, y0, 0, 1)
                    if (simpleMask(e, mbLimit)) commonAdjust(e, useOuter = true, applyOuter = false)
                    c += 1
                  }
                }
                if (inner) {
                  var rr = 4
                  while (rr < 16) {
                    var c = 0
                    while (c < 16) {
                      val e = new Edge(yP, x0 + c, y0 + rr, 0, 1)
                      if (simpleMask(e, sbLimit)) commonAdjust(e, useOuter = true, applyOuter = false)
                      c += 1
                    }
                    rr += 4
                  }
                }
              } else {
                if (mbx > 0) {
                  var r = 0
                  while (r < 16) {
                    filterEdgeNormal(new Edge(yP, x0, y0 + r, 1, 0), interior, mbLimit, hevT, isMbEdge = true)
                    r += 1
                  }
                  r = 0
                  while (r < 8) {
                    filterEdgeNormal(new Edge(uP, cx0, cy0 + r, 1, 0), interior, mbLimit, hevT, isMbEdge = true)
                    filterEdgeNormal(new Edge(vP, cx0, cy0 + r, 1, 0), interior, mbLimit, hevT, isMbEdge = true)
                    r += 1
                  }
                }
                if (inner) {
                  var c = 4
                  while (c < 16) {
                    var r = 0
                    while (r < 16) {
                      filterEdgeNormal(new Edge(yP, x0 + c, y0 + r, 1, 0), interior, sbLimit, hevT, isMbEdge = false)
                      r += 1
                    }
                    c += 4
                  }
                  var r = 0
                  while (r < 8) {
                    filterEdgeNormal(new Edge(uP, cx0 + 4, cy0 + r, 1, 0), interior, sbLimit, hevT, isMbEdge = false)
                    filterEdgeNormal(new Edge(vP, cx0 + 4, cy0 + r, 1, 0), interior, sbLimit, hevT, isMbEdge = false)
                    r += 1
                  }
                }
                if (mby > 0) {
                  var c = 0
                  while (c < 16) {
                    filterEdgeNormal(new Edge(yP, x0 + c, y0, 0, 1), interior, mbLimit, hevT, isMbEdge = true)
                    c += 1
                  }
                  c = 0
                  while (c < 8) {
                    filterEdgeNormal(new Edge(uP, cx0 + c, cy0, 0, 1), interior, mbLimit, hevT, isMbEdge = true)
                    filterEdgeNormal(new Edge(vP, cx0 + c, cy0, 0, 1), interior, mbLimit, hevT, isMbEdge = true)
                    c += 1
                  }
                }
                if (inner) {
                  var rr = 4
                  while (rr < 16) {
                    var c = 0
                    while (c < 16) {
                      filterEdgeNormal(new Edge(yP, x0 + c, y0 + rr, 0, 1), interior, sbLimit, hevT, isMbEdge = false)
                      c += 1
                    }
                    rr += 4
                  }
                  var c = 0
                  while (c < 8) {
                    filterEdgeNormal(new Edge(uP, cx0 + c, cy0 + 4, 0, 1), interior, sbLimit, hevT, isMbEdge = false)
                    filterEdgeNormal(new Edge(vP, cx0 + c, cy0 + 4, 0, 1), interior, sbLimit, hevT, isMbEdge = false)
                    c += 1
                  }
                }
              }
            }
            mbx += 1
          }
          mby += 1
        }
      }

      Some(Frame(width, height, yP.crop(width, height),
        uP.crop((width + 1) / 2, (height + 1) / 2),
        vP.crop((width + 1) / 2, (height + 1) / 2)))
    } catch {
      case Bad | _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException => None
    }

  /** RIFF walk: WEBP container → the lossy 'VP8 ' chunk. */
  def decode(p: Array[Byte]): Option[Frame] = {
    if (p.length < 20 || p(0) != 'R' || p(1) != 'I' || p(2) != 'F' || p(3) != 'F' ||
      p(8) != 'W' || p(9) != 'E' || p(10) != 'B' || p(11) != 'P') return None
    var i = 12
    while (i + 8 <= p.length) {
      val fourcc = new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = (p(i + 4) & 0xFF) | ((p(i + 5) & 0xFF) << 8) |
        ((p(i + 6) & 0xFF) << 16) | ((p(i + 7) & 0xFF) << 24)
      if (size < 0 || i + 8 + size > p.length) return None
      if (fourcc == "VP8 ")
        return decodeFrame(java.util.Arrays.copyOfRange(p, i + 8, i + 8 + size))
      i += 8 + size + (size & 1)
    }
    None
  }

  // ------------------------------------------------------ YUV -> RGB

  // The reference library's fixed-point full-swing BT.601 conversion
  // (libwebp dsp/yuv.h: 14-bit coefficients applied as (v*k)>>8, a
  // final 6-bit shift inside the clip) — pinned byte-exactly against
  // WebPDecodeRGB in WebpVp8Spec.
  @inline private def mulHi(v: Int, coeff: Int): Int = (v * coeff) >> 8
  @inline private def clip8(v: Int): Int =
    if ((v & ~16383) == 0) v >> 6 else if (v < 0) 0 else 255
  @inline private def yuvR(y: Int, v: Int): Int =
    clip8(mulHi(y, 19077) + mulHi(v, 26149) - 14234)
  @inline private def yuvG(y: Int, u: Int, v: Int): Int =
    clip8(mulHi(y, 19077) - mulHi(u, 6419) - mulHi(v, 13320) + 8708)
  @inline private def yuvB(y: Int, u: Int): Int =
    clip8(mulHi(y, 19077) + mulHi(u, 33050) - 17685)

  /** One output row pair of the reference "fancy" 4:2:0 chroma
    * upsampler (libwebp dsp/upsampling.c): each luma pixel gets
    * chroma bilinearly interpolated from the surrounding 2x2 chroma
    * samples with 9/3/3/1 diagonal weights; frame edges clamp. A
    * negative `botY` row index means "no bottom row". */
  private def upsampleRowPair(f: Frame, topY: Int, botY: Int,
      topUV: Int, curUV: Int, rgb: Array[Byte]): Unit = {
    val w = f.width; val uvw = (w + 1) / 2
    val tOff = topY * w; val bOff = botY * w
    val tuv = topUV * uvw; val cuv = curUV * uvw
    @inline def emit(off: Int, yv: Int, u: Int, v: Int): Unit = {
      rgb(3 * off) = yuvR(yv, v).toByte
      rgb(3 * off + 1) = yuvG(yv, u, v).toByte
      rgb(3 * off + 2) = yuvB(yv, u).toByte
    }
    var tlU = f.u(tuv) & 0xFF; var tlV = f.v(tuv) & 0xFF
    var lU = f.u(cuv) & 0xFF; var lV = f.v(cuv) & 0xFF
    emit(tOff, f.y(tOff) & 0xFF, (3 * tlU + lU + 2) >> 2, (3 * tlV + lV + 2) >> 2)
    if (botY >= 0)
      emit(bOff, f.y(bOff) & 0xFF, (3 * lU + tlU + 2) >> 2, (3 * lV + tlV + 2) >> 2)
    val lastPair = (w - 1) >> 1
    var x = 1
    while (x <= lastPair) {
      val tU = f.u(tuv + x) & 0xFF; val tV = f.v(tuv + x) & 0xFF
      val cU = f.u(cuv + x) & 0xFF; val cV = f.v(cuv + x) & 0xFF
      val avgU = tlU + tU + lU + cU + 8
      val avgV = tlV + tV + lV + cV + 8
      val d12U = (avgU + 2 * (tU + lU)) >> 3; val d12V = (avgV + 2 * (tV + lV)) >> 3
      val d03U = (avgU + 2 * (tlU + cU)) >> 3; val d03V = (avgV + 2 * (tlV + cV)) >> 3
      emit(tOff + 2 * x - 1, f.y(tOff + 2 * x - 1) & 0xFF, (d12U + tlU) >> 1, (d12V + tlV) >> 1)
      emit(tOff + 2 * x, f.y(tOff + 2 * x) & 0xFF, (d03U + tU) >> 1, (d03V + tV) >> 1)
      if (botY >= 0) {
        emit(bOff + 2 * x - 1, f.y(bOff + 2 * x - 1) & 0xFF, (d03U + lU) >> 1, (d03V + lV) >> 1)
        emit(bOff + 2 * x, f.y(bOff + 2 * x) & 0xFF, (d12U + cU) >> 1, (d12V + cV) >> 1)
      }
      tlU = tU; tlV = tV; lU = cU; lV = cV
      x += 1
    }
    if ((w & 1) == 0) {
      emit(tOff + w - 1, f.y(tOff + w - 1) & 0xFF,
        (3 * tlU + lU + 2) >> 2, (3 * tlV + lV + 2) >> 2)
      if (botY >= 0)
        emit(bOff + w - 1, f.y(bOff + w - 1) & 0xFF,
          (3 * lU + tlU + 2) >> 2, (3 * lV + tlV + 2) >> 2)
    }
  }

  /** YUV 4:2:0 frame → interleaved RGB with the reference
    * conversion: first and last rows mirror chroma, interior rows go
    * in pairs straddling the chroma grid. */
  def toRgb(f: Frame): Array[Byte] = {
    val rgb = new Array[Byte](f.width * f.height * 3)
    val uvh = (f.height + 1) / 2
    upsampleRowPair(f, 0, -1, 0, 0, rgb)
    var r = 0
    while (2 * r + 2 < f.height) {
      upsampleRowPair(f, 2 * r + 1, 2 * r + 2, r, r + 1, rgb)
      r += 1
    }
    if (f.height > 1 && (f.height & 1) == 0)
      upsampleRowPair(f, f.height - 1, -1, uvh - 1, uvh - 1, rgb)
    rgb
  }
}
