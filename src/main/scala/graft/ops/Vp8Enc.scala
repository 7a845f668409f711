package graft.ops

/** Minimal conforming VP8 keyframe ENCODER (RFC 6386) — the
  * fixture/gate side of the lossy-WebP rung, the same role the
  * in-repo brotli stream builder plays for the brotli gate: the
  * [[Vp8]] decoder's INDEPENDENCE pin lives in WebpVp8Spec against
  * reference-libwebp streams; this encoder exists so gate payloads
  * can be built from corpus columns at scan time, and so crafted
  * streams can drive the reference decoder as a differential oracle
  * (every stream this encoder writes was cross-decoded against the
  * system libwebp during development — see WebpVp8Spec).
  *
  * Deliberately simple, never rate-optimizing:
  *  - keyframes only, one token partition, no segmentation unless
  *    asked, default coefficient probabilities (the update section
  *    writes all-zero flags);
  *  - every macroblock 16x16 DC_PRED luma + DC_PRED chroma (with
  *    optional forced B_PRED submodes for test streams);
  *  - residuals through the standard forward DCT/WHT, quantized by
  *    the §14.1 tables at the caller's quantizer index, and the
  *    encoder TRACKS its own reconstruction through the decoder's
  *    exact inverse transforms — so a conforming decoder's output
  *    equals [[EncodeResult.y]]/u/v byte-for-byte (the ADPCM gate's
  *    tracked-path contract);
  *  - the loop-filter header fields are set by the caller; when a
  *    nonzero level is used the tracked planes are run through the
  *    decoder's own filter.
  */
object Vp8Enc {

  // ------------------------------------------------------------ bool encoder

  private[ops] final class BoolEnc {
    private var buf = new Array[Byte](1 << 10)
    var pos = 0
    private var range = 255
    private var low = 0L
    private var count = -24

    private def put(b: Int): Unit = {
      if (pos >= buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
      buf(pos) = b.toByte; pos += 1
    }

    def bool(bit: Int, prob: Int): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (bit != 0) { low += split; range -= split }
      else range = split
      var shift = 0
      while (range < 128) { range <<= 1; shift += 1 }
      count += shift
      if (count >= 0) {
        val offset = shift - count
        if (((low << (offset - 1)) & 0x80000000L) != 0) {
          var x = pos - 1
          while (x >= 0 && buf(x) == -1) { buf(x) = 0; x -= 1 }
          if (x >= 0) buf(x) = (buf(x) + 1).toByte
        }
        put(((low >> (24 - offset)) & 0xFF).toInt)
        low = (low << offset) & 0xFFFFFF
        shift = count
        count -= 8
      }
      low = (low << shift) & 0xFFFFFFFFL
    }

    def literal(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bool((v >> i) & 1, 128); i -= 1 }
    }
    def signed(v: Int, n: Int): Unit = {
      literal(math.abs(v), n)
      bool(if (v < 0) 1 else 0, 128)
    }
    /** Encode `value` through tree `t` with `probs` at probOff. */
    def tree(t: Array[Int], probs: Array[Int], probOff: Int, value: Int,
        startIdx: Int = 0): Unit = {
      // find the path by depth-first search (trees are tiny)
      def path(idx: Int): Option[List[Int]] = {
        val l = t(idx); val r = t(idx + 1)
        def side(e: Int, bit: Int): Option[List[Int]] =
          if (e <= 0) { if (-e == value) Some(List(bit)) else None }
          else path(e).map(bit :: _)
        side(l, 0).orElse(side(r, 1))
      }
      var i = startIdx
      path(startIdx).getOrElse(sys.error(s"value $value not in tree")).foreach { b =>
        bool(b, probs(probOff + (i >> 1)))
        i = t(i + b)
      }
    }
    def finish(): Array[Byte] = {
      var i = 0
      while (i < 32) { bool(0, 128); i += 1 }
      java.util.Arrays.copyOf(buf, pos)
    }
  }

  // ------------------------------------------------------------ transforms

  /** Standard forward 4x4 DCT (the reference encoder's). */
  private[ops] def fdct4x4(in: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val o = i * 4
      val a1 = (in(o) + in(o + 3)) * 8
      val b1 = (in(o + 1) + in(o + 2)) * 8
      val c1 = (in(o + 1) - in(o + 2)) * 8
      val d1 = (in(o) - in(o + 3)) * 8
      tmp(o) = a1 + b1
      tmp(o + 2) = a1 - b1
      tmp(o + 1) = (c1 * 2217 + d1 * 5352 + 14500) >> 12
      tmp(o + 3) = (d1 * 2217 - c1 * 5352 + 7500) >> 12
      i += 1
    }
    i = 0
    while (i < 4) {
      val a1 = tmp(i) + tmp(i + 12)
      val b1 = tmp(i + 4) + tmp(i + 8)
      val c1 = tmp(i + 4) - tmp(i + 8)
      val d1 = tmp(i) - tmp(i + 12)
      out(i) = (a1 + b1 + 7) >> 4
      out(i + 8) = (a1 - b1 + 7) >> 4
      out(i + 4) = ((c1 * 2217 + d1 * 5352 + 12000) >> 16) + (if (d1 != 0) 1 else 0)
      out(i + 12) = (d1 * 2217 - c1 * 5352 + 51000) >> 16
      i += 1
    }
  }

  /** Forward WHT for the Y2 block (the reference encoder's). */
  private[ops] def fwht4x4(in: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val o = i * 4
      val a1 = (in(o) + in(o + 2)) * 4
      val d1 = (in(o + 1) + in(o + 3)) * 4
      val c1 = (in(o + 1) - in(o + 3)) * 4
      val b1 = (in(o) - in(o + 2)) * 4
      tmp(o) = a1 + d1 + (if (a1 != 0) 1 else 0)
      tmp(o + 1) = b1 + c1
      tmp(o + 2) = b1 - c1
      tmp(o + 3) = a1 - d1
      i += 1
    }
    i = 0
    while (i < 4) {
      val a1 = tmp(i) + tmp(i + 8)
      val d1 = tmp(i + 4) + tmp(i + 12)
      val c1 = tmp(i + 4) - tmp(i + 12)
      val b1 = tmp(i) - tmp(i + 8)
      var a2 = a1 + d1
      var b2 = b1 + c1
      var c2 = b1 - c1
      var d2 = a1 - d1
      a2 += (if (a2 < 0) 1 else 0); b2 += (if (b2 < 0) 1 else 0)
      c2 += (if (c2 < 0) 1 else 0); d2 += (if (d2 < 0) 1 else 0)
      out(i) = (a2 + 3) >> 3
      out(i + 4) = (b2 + 3) >> 3
      out(i + 8) = (c2 + 3) >> 3
      out(i + 12) = (d2 + 3) >> 3
      i += 1
    }
  }

  // ------------------------------------------------------------ tokens

  private val CoeffTree = Array(
    -11, 2, -0, 4, -1, 6, 8, 12, -2, 10, -3, -4, 14, 16, -5, -6, 18, 20, -7, -8, -9, -10)
  private val CatProbs: Array[Array[Int]] = Array(
    Array(159), Array(165, 145), Array(173, 148, 140),
    Array(176, 155, 140, 135), Array(180, 157, 141, 134, 130),
    Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))
  private val CatBase = Array(5, 7, 11, 19, 35, 67)

  /** Token-encode one block of QUANTIZED coefficients (natural
    * order). Returns whether any token was coded before EOB. */
  private def encodeCoeffs(be: BoolEnc, probs: Array[Int], plane: Int,
      first: Int, ctx0: Int, q: Array[Int]): Boolean = {
    // find the last nonzero position in zigzag order
    var last = -1
    var n = first
    while (n < 16) {
      if (q(Vp8.Zigzag(n)) != 0) last = n
      n += 1
    }
    var ctx = ctx0
    var skipEob = false
    n = first
    while (n <= last) {
      val v = q(Vp8.Zigzag(n))
      val band = Vp8.CoeffBands(n)
      val off = ((plane * 8 + band) * 3 + ctx) * 11
      val a = math.abs(v)
      val tok =
        if (a <= 4) a
        else if (a <= 6) 5
        else if (a <= 10) 6
        else if (a <= 18) 7
        else if (a <= 34) 8
        else if (a <= 66) 9
        else 10
      be.tree(CoeffTree, probs, off, tok, if (skipEob) 2 else 0)
      if (tok == 0) { ctx = 0; skipEob = true }
      else {
        skipEob = false
        if (tok >= 5) {
          val cat = tok - 5
          val cp = CatProbs(cat)
          val extra = a - CatBase(cat)
          var i = cp.length - 1
          var bitPos = 0
          while (i >= 0) { be.bool((extra >> i) & 1, cp(bitPos)); i -= 1; bitPos += 1 }
        }
        be.bool(if (v < 0) 1 else 0, 128)
        ctx = if (a == 1) 1 else 2
      }
      n += 1
    }
    if (last < 15) {
      val band = Vp8.CoeffBands(if (last < first) first else last + 1)
      val off = ((plane * 8 + band) * 3 + ctx) * 11
      be.tree(CoeffTree, probs, off, 11, if (skipEob) 2 else 0) // EOB
    }
    last >= first
  }

  // ------------------------------------------------------------ frame

  /** Encoder controls for crafted/gate streams. */
  final case class Params(qi: Int = 40, filterLevel: Int = 0,
      sharpness: Int = 0, filterSimple: Boolean = false,
      nParts: Int = 1,
      segQi: Option[Array[Int]] = None, // 4 ABSOLUTE per-segment qis
      segOf: (Int, Int) => Int = (_, _) => 0,
      bModes: Option[(Int, Int) => Array[Int]] = None,
      ydcDelta: Int = 0, y2dcDelta: Int = 0, y2acDelta: Int = 0,
      uvdcDelta: Int = 0, uvacDelta: Int = 0)

  final case class EncodeResult(webp: Array[Byte],
      y: Array[Byte], u: Array[Byte], v: Array[Byte])

  /** Encode planar YUV 4:2:0 input (tight planes, like
    * [[Vp8.Frame]]) into a WEBP container; the returned planes are
    * the TRACKED reconstruction a conforming decoder must produce
    * byte-exactly. */
  def encode(width: Int, height: Int, yIn: Array[Byte], uIn: Array[Byte],
      vIn: Array[Byte], p: Params): EncodeResult = {
    require(width > 0 && height > 0 && width <= 0x3FFF && height <= 0x3FFF)
    val mbW = (width + 15) / 16
    val mbH = (height + 15) / 16
    val uvW = (width + 1) / 2
    val uvH = (height + 1) / 2

    // padded working planes (replicate edges into the padding)
    def pad(src: Array[Byte], sw: Int, sh: Int, pw: Int, ph: Int): Array[Int] = {
      val out = new Array[Int](pw * ph)
      var y = 0
      while (y < ph) {
        val sy = if (y < sh) y else sh - 1
        var x = 0
        while (x < pw) {
          val sx = if (x < sw) x else sw - 1
          out(y * pw + x) = src(sy * sw + sx) & 0xFF
          x += 1
        }
        y += 1
      }
      out
    }
    val yw = mbW * 16; val yh = mbH * 16
    val cw = mbW * 8; val ch = mbH * 8
    val ySrc = pad(yIn, width, height, yw, yh)
    val uSrc = pad(uIn, uvW, uvH, cw, ch)
    val vSrc = pad(vIn, uvW, uvH, cw, ch)

    // tracked reconstruction in the DECODER's own plane type (same
    // 127/129 virtual borders), predicted/reconstructed by the
    // decoder's own helpers — the closed loop shares one set of
    // formulas
    def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    val yRec = new Vp8.Plane(yw, yh)
    val uRec = new Vp8.Plane(cw, ch)
    val vRec = new Vp8.Plane(cw, ch)

    val segQis: Array[Int] = p.segQi.getOrElse(Array(p.qi, p.qi, p.qi, p.qi))
    val segEnabled = p.segQi.isDefined
    def clamp127(v: Int): Int = if (v < 0) 0 else if (v > 127) 127 else v

    val head = new BoolEnc
    head.literal(0, 1) // color space
    head.literal(0, 1) // clamping
    head.literal(if (segEnabled) 1 else 0, 1)
    if (segEnabled) {
      head.literal(1, 1) // update map
      head.literal(1, 1) // update data
      head.literal(1, 1) // absolute deltas
      var i = 0
      while (i < 4) { head.literal(1, 1); head.signed(segQis(i), 7); i += 1 }
      i = 0
      while (i < 4) { head.literal(0, 1); i += 1 } // no lf values
      i = 0
      while (i < 3) { head.literal(1, 1); head.literal(128, 8); i += 1 } // tree probs 128
    }
    head.literal(if (p.filterSimple) 1 else 0, 1)
    head.literal(p.filterLevel, 6)
    head.literal(p.sharpness, 3)
    head.literal(0, 1) // lf deltas disabled
    head.literal(p.nParts match { case 1 => 0; case 2 => 1; case 4 => 2; case _ => 3 }, 2)
    head.literal(p.qi, 7)
    def delta(v: Int): Unit =
      if (v == 0) head.literal(0, 1) else { head.literal(1, 1); head.signed(v, 4) }
    delta(p.ydcDelta); delta(p.y2dcDelta); delta(p.y2acDelta)
    delta(p.uvdcDelta); delta(p.uvacDelta)
    head.literal(1, 1) // refresh entropy
    var i = 0
    while (i < 1056) { head.bool(0, Vp8Tables.coeffUpdateProbs(i)); i += 1 }
    head.literal(1, 1) // mb_no_coeff_skip
    head.literal(128, 8) // prob_skip

    val KfYModeTree = Array(-4, 2, 4, 6, -0, -1, -2, -3)
    val KfYModeProb = Array(145, 156, 163, 128)
    val UvModeTree = Array(-0, 2, -1, 4, -2, -3)
    val KfUvModeProb = Array(142, 114, 183)
    val BModeTree = Array(-0, 2, -1, 4, -2, 6, 8, 12, -3, 10, -5, -6, -4, 14, -7, 16, -8, -9)
    val SegmentTree = Array(2, 4, -0, -1, -2, -3)
    val segProbs = Array(128, 128, 128)

    val tokenParts = Array.fill(p.nParts)(new BoolEnc)
    val probs = Vp8Tables.coeffProbs

    // contexts
    val aboveModes = Array.fill(mbW * 4)(0)
    val leftModes = new Array[Int](4)
    val aboveNz = Array.ofDim[Int](mbW, 9)
    val leftNz = new Array[Int](9)

    val q = new Array[Int](16)
    val res = new Array[Int](16)
    val co = new Array[Int](16)
    val mbCoeffs = new Array[Int](25 * 16) // quantized, natural order
    val y2in = new Array[Int](16)

    var mby = 0
    while (mby < mbH) {
      java.util.Arrays.fill(leftNz, 0)
      java.util.Arrays.fill(leftModes, 0)
      val te = tokenParts(mby % p.nParts)
      var mbx = 0
      while (mbx < mbW) {
        val seg = p.segOf(mbx, mby)
        val qi = clamp127(segQis(seg))
        val ydc = Vp8Tables.dcQ(clamp127(qi + p.ydcDelta))
        val yac = Vp8Tables.acQ(qi)
        val y2dc = Vp8Tables.dcQ(clamp127(qi + p.y2dcDelta)) * 2
        val y2acRaw = Vp8Tables.acQ(clamp127(qi + p.y2acDelta)) * 155 / 100
        val y2ac = if (y2acRaw < 8) 8 else y2acRaw
        val uvdcRaw = Vp8Tables.dcQ(clamp127(qi + p.uvdcDelta))
        val uvdc = if (uvdcRaw > 132) 132 else uvdcRaw
        val uvac = Vp8Tables.acQ(clamp127(qi + p.uvacDelta))

        val forcedB = p.bModes.map(f => f(mbx, mby))
        val isB = forcedB.isDefined
        val x0 = mbx * 16; val y0 = mby * 16
        val cx0 = mbx * 8; val cy0 = mby * 8

        java.util.Arrays.fill(mbCoeffs, 0)

        // ---------- luma ----------
        if (!isB) {
          // 16x16 DC prediction from the tracked reconstruction
          var sum = 0; var count = 0
          if (mby > 0) { var k = 0; while (k < 16) { sum += yRec.get(x0 + k, y0 - 1); k += 1 }; count += 16 }
          if (mbx > 0) { var k = 0; while (k < 16) { sum += yRec.get(x0 - 1, y0 + k); k += 1 }; count += 16 }
          val dc = if (count == 0) 128 else (sum + count / 2) / count
          // residual → fdct → quantize (DCs go to Y2)
          var b = 0
          while (b < 16) {
            val bx = x0 + (b & 3) * 4; val by = y0 + (b >> 2) * 4
            var k = 0
            while (k < 16) {
              res(k) = ySrc((by + (k >> 2)) * yw + bx + (k & 3)) - dc
              k += 1
            }
            fdct4x4(res, co)
            y2in(b) = co(0)
            mbCoeffs(b * 16) = 0
            k = 1
            while (k < 16) {
              mbCoeffs(b * 16 + k) = co(k) / yac
              k += 1
            }
            b += 1
          }
          fwht4x4(y2in, co)
          var k = 0
          while (k < 16) {
            mbCoeffs(24 * 16 + k) = co(k) / (if (k == 0) y2dc else y2ac)
            k += 1
          }
          // tracked reconstruction: iWHT of dequantized Y2 → DCs → iDCT
          val y2deq = new Array[Int](16)
          k = 0
          while (k < 16) {
            y2deq(k) = mbCoeffs(24 * 16 + k) * (if (k == 0) y2dc else y2ac)
            k += 1
          }
          Vp8.iwht4x4(y2deq)
          b = 0
          while (b < 16) {
            val bx = x0 + (b & 3) * 4; val by = y0 + (b >> 2) * 4
            var k2 = 0
            while (k2 < 16) {
              q(k2) = if (k2 == 0) y2deq(b) else mbCoeffs(b * 16 + k2) * yac
              k2 += 1
            }
            Vp8.idct4x4(q)
            k2 = 0
            while (k2 < 16) {
              yRec.set(bx + (k2 & 3), by + (k2 >> 2), clamp255(dc + q(k2)))
              k2 += 1
            }
            b += 1
          }
        } else {
          // forced B_PRED: DC submode per 4x4 against tracked recon
          val modes = forcedB.get
          // rightmost-MB above-right replication (same rule as the
          // decoder's reconstruction — see Vp8.decodeFrame)
          if (mbx == mbW - 1 && mby > 0) {
            val v = yRec.get(x0 + 15, y0 - 1)
            var i = 0
            while (i < 4) { yRec.set(x0 + 16 + i, y0 - 1, v); i += 1 }
          }
          var b = 0
          while (b < 16) {
            val bx = x0 + (b & 3) * 4; val by = y0 + (b >> 2) * 4
            // predict with the DECODER's own formulas by writing the
            // prediction into the plane, diffing, then reconstructing
            val arY = if ((b & 3) == 3) y0 - 1 else by - 1
            Vp8.predictB(yRec, bx, by, modes(b), arY)
            var k = 0
            while (k < 16) {
              res(k) = ySrc((by + (k >> 2)) * yw + bx + (k & 3)) -
                yRec.get(bx + (k & 3), by + (k >> 2))
              k += 1
            }
            fdct4x4(res, co)
            k = 0
            while (k < 16) { mbCoeffs(b * 16 + k) = co(k) / (if (k == 0) ydc else yac); k += 1 }
            k = 0
            while (k < 16) { q(k) = mbCoeffs(b * 16 + k) * (if (k == 0) ydc else yac); k += 1 }
            Vp8.idct4x4(q)
            k = 0
            while (k < 16) {
              val px = bx + (k & 3); val py = by + (k >> 2)
              yRec.set(px, py, clamp255(yRec.get(px, py) + q(k)))
              k += 1
            }
            b += 1
          }
        }

        // ---------- chroma (DC prediction) ----------
        var pl = 0
        while (pl < 2) {
          val rec = if (pl == 0) uRec else vRec
          val src = if (pl == 0) uSrc else vSrc
          var sum = 0; var count = 0
          if (mby > 0) { var k = 0; while (k < 8) { sum += rec.get(cx0 + k, cy0 - 1); k += 1 }; count += 8 }
          if (mbx > 0) { var k = 0; while (k < 8) { sum += rec.get(cx0 - 1, cy0 + k); k += 1 }; count += 8 }
          val dc = if (count == 0) 128 else (sum + count / 2) / count
          var c = 0
          while (c < 4) {
            val bx = cx0 + (c & 1) * 4; val by = cy0 + (c >> 1) * 4
            var k = 0
            while (k < 16) { res(k) = src((by + (k >> 2)) * cw + bx + (k & 3)) - dc; k += 1 }
            fdct4x4(res, co)
            val bi = 16 + pl * 4 + c
            k = 0
            while (k < 16) { mbCoeffs(bi * 16 + k) = co(k) / (if (k == 0) uvdc else uvac); k += 1 }
            k = 0
            while (k < 16) { q(k) = mbCoeffs(bi * 16 + k) * (if (k == 0) uvdc else uvac); k += 1 }
            Vp8.idct4x4(q)
            k = 0
            while (k < 16) {
              rec.set(bx + (k & 3), by + (k >> 2), clamp255(dc + q(k)))
              k += 1
            }
            c += 1
          }
          pl += 1
        }

        // ---------- skip decision + mode records ----------
        var anyCoeff = false
        var k = 0
        while (k < 25 * 16 && !anyCoeff) {
          // Y blocks skip their DC slot when Y2 carries it
          val blockOf = k / 16; val ci = k % 16
          val counted =
            if (!isB && blockOf < 16 && ci == 0) false
            else if (isB && blockOf == 24) false
            else mbCoeffs(k) != 0
          if (counted) anyCoeff = true
          k += 1
        }
        val skip = !anyCoeff
        if (segEnabled) head.tree(SegmentTree, segProbs, 0, seg)
        head.bool(if (skip) 1 else 0, 128)
        head.tree(KfYModeTree, KfYModeProb, 0, if (isB) 4 else 0)
        if (isB) {
          val modes = forcedB.get
          var sb = 0
          while (sb < 16) {
            val sx = sb & 3; val sy = sb >> 2
            val above = if (sy == 0) aboveModes(mbx * 4 + sx) else modes(sb - 4)
            val left = if (sx == 0) leftModes(sy) else modes(sb - 1)
            head.tree(BModeTree, Vp8Tables.kfBModeProbs, (above * 10 + left) * 9, modes(sb))
            sb += 1
          }
          var i2 = 0
          while (i2 < 4) {
            aboveModes(mbx * 4 + i2) = modes(12 + i2)
            leftModes(i2) = modes(i2 * 4 + 3)
            i2 += 1
          }
        } else {
          var i2 = 0
          while (i2 < 4) { aboveModes(mbx * 4 + i2) = 0; leftModes(i2) = 0; i2 += 1 }
        }
        head.tree(UvModeTree, KfUvModeProb, 0, 0) // chroma DC

        // ---------- tokens ----------
        if (skip) {
          var k2 = 0
          while (k2 < 8) { leftNz(k2) = 0; aboveNz(mbx)(k2) = 0; k2 += 1 }
          if (!isB) { leftNz(8) = 0; aboveNz(mbx)(8) = 0 }
        } else {
          val blockQ = new Array[Int](16)
          if (!isB) {
            var k2 = 0
            while (k2 < 16) { blockQ(k2) = mbCoeffs(24 * 16 + k2); k2 += 1 }
            val ctx = aboveNz(mbx)(8) + leftNz(8)
            val nz = encodeCoeffs(te, probs, 1, 0, ctx, blockQ)
            val f = if (nz) 1 else 0
            aboveNz(mbx)(8) = f; leftNz(8) = f
          }
          val planeY = if (isB) 3 else 0
          val firstY = if (isB) 0 else 1
          var b = 0
          while (b < 16) {
            var k2 = 0
            while (k2 < 16) { blockQ(k2) = mbCoeffs(b * 16 + k2); k2 += 1 }
            if (!isB) blockQ(0) = 0
            val bx = b & 3; val by = b >> 2
            val ctx = aboveNz(mbx)(bx) + leftNz(by)
            val nz = encodeCoeffs(te, probs, planeY, firstY, ctx, blockQ)
            val f = if (nz) 1 else 0
            aboveNz(mbx)(bx) = f; leftNz(by) = f
            b += 1
          }
          var pl2 = 0
          while (pl2 < 2) {
            var c = 0
            while (c < 4) {
              val bi = 16 + pl2 * 4 + c
              var k2 = 0
              while (k2 < 16) { blockQ(k2) = mbCoeffs(bi * 16 + k2); k2 += 1 }
              val cx = c & 1; val cy = c >> 1
              val ctx = aboveNz(mbx)(4 + pl2 * 2 + cx) + leftNz(4 + pl2 * 2 + cy)
              val nz = encodeCoeffs(te, probs, 2, 0, ctx, blockQ)
              val f = if (nz) 1 else 0
              aboveNz(mbx)(4 + pl2 * 2 + cx) = f
              leftNz(4 + pl2 * 2 + cy) = f
              c += 1
            }
            pl2 += 1
          }
        }
        mbx += 1
      }
      mby += 1
    }

    val part0 = head.finish()
    val partBytes = tokenParts.map(_.finish())

    // frame assembly
    val bos = new java.io.ByteArrayOutputStream()
    val tag = (0) | (0 << 1) | (1 << 4) | (part0.length << 5)
    bos.write(tag & 0xFF); bos.write((tag >> 8) & 0xFF); bos.write((tag >> 16) & 0xFF)
    bos.write(0x9d); bos.write(0x01); bos.write(0x2a)
    bos.write(width & 0xFF); bos.write((width >> 8) & 0x3F)
    bos.write(height & 0xFF); bos.write((height >> 8) & 0x3F)
    bos.write(part0)
    var pi2 = 0
    while (pi2 < p.nParts - 1) {
      val n = partBytes(pi2).length
      bos.write(n & 0xFF); bos.write((n >> 8) & 0xFF); bos.write((n >> 16) & 0xFF)
      pi2 += 1
    }
    partBytes.foreach(bos.write)
    val frame = bos.toByteArray

    // RIFF container
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
    }
    out.write("RIFF".getBytes("US-ASCII"))
    val payload = frame.length + (frame.length & 1)
    w32(4 + 8 + payload)
    out.write("WEBP".getBytes("US-ASCII"))
    out.write("VP8 ".getBytes("US-ASCII"))
    w32(frame.length)
    out.write(frame)
    if ((frame.length & 1) == 1) out.write(0)

    // tracked reconstruction, loop-filtered with the decoder's filter
    var yOut = yRec.crop(width, height)
    var uOut = uRec.crop(uvW, uvH)
    var vOut = vRec.crop(uvW, uvH)
    if (p.filterLevel > 0) {
      // run the DECODER over our own stream: the tracked planes then
      // include the in-loop filter exactly
      Vp8.decode(out.toByteArray) match {
        case Some(f) => yOut = f.y; uOut = f.u; vOut = f.v
        case None => sys.error("self-decode failed")
      }
    }
    EncodeResult(out.toByteArray, yOut, uOut, vOut)
  }
}
