package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{PngCodec, WebpCodec}

/** VP8L decoder pinned against the WebP Lossless Bitstream
  * Specification with HAND-WRITTEN bitstreams (an independent
  * bit-writer below, not the production encoder): simple and normal
  * prefix codes, LZ77 back-references through the short-distance
  * map's first entries, the color cache, and all four inverse
  * transforms. The production encoder is then pinned by round-trip.
  * Pure JVM below decode(); one Spark test drives the packer. */
class WebpSpec extends AnyFunSuite {

  // ---- independent bit-writer (LSB-first stream, MSB-first codes) ----

  private final class W {
    private val bos = new java.io.ByteArrayOutputStream()
    private var cur = 0; private var n = 0
    def b(v: Int, len: Int): Unit = {
      var i = 0
      while (i < len) {
        cur |= ((v >> i) & 1) << n; n += 1
        if (n == 8) { bos.write(cur); cur = 0; n = 0 }
        i += 1
      }
    }
    def code(v: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { b((v >> i) & 1, 1); i -= 1 }
    }
    def vp8l(w: Int, h: Int): Unit = { // chunk payload header
      bos.write(0x2F); b(w - 1, 14); b(h - 1, 14); b(0, 1); b(0, 3)
    }
    def bytes(): Array[Byte] = { if (n > 0) { bos.write(cur); cur = 0; n = 0 }; bos.toByteArray }
  }

  /** Canonical code assignment (sorted by (length, symbol)) — the
    * RFC 1951 rule the spec inherits; used to EMIT symbols. */
  private def canonical(lengths: Map[Int, Int]): Map[Int, (Int, Int)] = {
    val sorted = lengths.toSeq.filter(_._2 > 0).sortBy { case (s, l) => (l, s) }
    var code = 0; var prevLen = 0
    sorted.map { case (s, l) =>
      code <<= (l - prevLen); prevLen = l
      val r = s -> (code, l); code += 1; r
    }.toMap
  }

  /** Emit a NORMAL prefix-code declaration for sparse `lengths` over
    * `alphabet` (code-length code over {1,2,3,17,18}, zero runs via
    * 17/18, no repeat-previous). */
  private def writeNormal(w: W, lengths: Map[Int, Int], alphabet: Int): Unit = {
    w.b(0, 1) // not simple
    // cl-code: lengths 1,2,3,17,18 all get length 3 → canonical 3-bit
    // (kraft 5/8: pad with 16 and 0 to 7/8... use 8 symbols of len 3:
    // {0,1,2,3,16,17,18, and 4} for exact completeness)
    val clSyms = Seq(0, 1, 2, 3, 4, 16, 17, 18)
    val clCanon = canonical(clSyms.map(_ -> 3).toMap)
    val order = Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
    val need = clSyms.map(s => order.indexOf(s)).max + 1
    w.b(need - 4, 4)
    (0 until need).foreach(i => w.b(if (clSyms.contains(order(i))) 3 else 0, 3))
    w.b(0, 1) // no max_symbol
    def emitZeros(n0: Int): Unit = {
      var n = n0
      while (n > 0) {
        if (n >= 11) { val r = math.min(138, n); val (c, l) = clCanon(18); w.code(c, l); w.b(r - 11, 7); n -= r }
        else if (n >= 3) { val r = math.min(10, n); val (c, l) = clCanon(17); w.code(c, l); w.b(r - 3, 3); n -= r }
        else { val (c, l) = clCanon(0); w.code(c, l); n -= 1 }
      }
    }
    var at = 0
    lengths.toSeq.sortBy(_._1).foreach { case (s, l) =>
      emitZeros(s - at)
      val (c, cl) = clCanon(l); w.code(c, cl)
      at = s + 1
    }
    // trailing zeros are implicit (the reader stops at the alphabet
    // size only if told to — emit them explicitly)
    emitZeros(alphabet - at)
  }

  private def writeSimple(w: W, syms: Seq[Int]): Unit = {
    w.b(1, 1); w.b(syms.length - 1, 1)
    if (syms.head < 2) { w.b(0, 1); w.b(syms.head, 1) } else { w.b(1, 1); w.b(syms.head, 8) }
    if (syms.length == 2) w.b(syms(1), 8)
  }

  /** The five code slots with constant red/blue/alpha and a given
    * green code; distance simple {0,1}. */
  private def writeGroupConstRba(w: W, emitGreen: W => Unit): Unit = {
    emitGreen(w)
    writeSimple(w, Seq(0)) // red
    writeSimple(w, Seq(0)) // blue
    writeSimple(w, Seq(255)) // alpha
    writeSimple(w, Seq(0, 1)) // distance: plane codes 1 and 2
  }

  private def riff(payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF) }
    val padded = payload.length + (payload.length & 1)
    out.write("RIFF".getBytes("US-ASCII")); le32(12 + padded)
    out.write("WEBP".getBytes("US-ASCII"))
    out.write("VP8L".getBytes("US-ASCII")); le32(payload.length)
    out.write(payload); if ((payload.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  private def greens(img: PngCodec.Image): Seq[Int] =
    img.pixels.grouped(4).map(px => px(1) & 0xFF).toSeq
  private def rgba(img: PngCodec.Image, i: Int): (Int, Int, Int, Int) =
    (img.pixels(4 * i) & 0xFF, img.pixels(4 * i + 1) & 0xFF,
      img.pixels(4 * i + 2) & 0xFF, img.pixels(4 * i + 3) & 0xFF)

  // ------------------------------------------------------------ tests

  test("hand bitstream: literals + back-references pin distance codes 1 (0,1) and 2 (1,0)") {
    // 3x2: literals 5, 9, 7; then planeCode 1 (above→idx0=5),
    // planeCode 2 (left→idx3=5), planeCode 1 (above→idx2=7)
    val w = new W
    w.vp8l(3, 2)
    w.b(0, 1); w.b(0, 1); w.b(0, 1) // no transform, no cache, no meta
    val gl = Map(5 -> 2, 9 -> 2, 7 -> 2, 256 -> 2)
    val gc = canonical(gl)
    writeGroupConstRba(w, writeNormal(_, gl, 280))
    def lit(g: Int): Unit = { w.code(gc(g)._1, gc(g)._2); /* r,b,a: 0 bits */ }
    def backref(planeSym: Int): Unit = {
      w.code(gc(256)._1, gc(256)._2) // length code 0 → length 1
      w.b(planeSym, 1) // distance simple {0,1}: canonical 1-bit
    }
    lit(5); lit(9); lit(7)
    backref(0) // plane code 1 → (0,1): dist = w = 3 → idx0
    backref(1) // plane code 2 → (1,0): dist = 1 → idx3
    backref(0) // idx5 ← idx2
    val img = WebpCodec.decode(riff(w.bytes())).get
    assert(img.width == 3 && img.height == 2 && img.channels == 4)
    assert(greens(img) == Seq(5, 9, 7, 5, 5, 7))
    assert(rgba(img, 0) == ((0, 5, 0, 255)))
  }

  test("hand bitstream: color cache hit returns the inserted pixel") {
    val ccBits = 2
    val pixel = 0xFF000900 // a=255, g=9
    val ci = (0x1E35A7BD * pixel) >>> (32 - ccBits)
    val cacheSym = 256 + 24 + ci
    val w = new W
    w.vp8l(2, 1)
    w.b(0, 1) // no transform
    w.b(1, 1); w.b(ccBits, 4) // cache on
    w.b(0, 1) // no meta
    val gl = Map(9 -> 1, cacheSym -> 1)
    val gc = canonical(gl)
    writeGroupConstRba(w, writeNormal(_, gl, 256 + 24 + (1 << ccBits)))
    w.code(gc(9)._1, 1) // literal g=9 → inserted at ci
    w.code(gc(cacheSym)._1, 1) // cache hit
    val img = WebpCodec.decode(riff(w.bytes())).get
    assert(greens(img) == Seq(9, 9))
  }

  test("hand bitstream: subtract-green inverse adds green to red and blue") {
    val w = new W
    w.vp8l(1, 1)
    w.b(1, 1); w.b(2, 2) // transform: subtract green
    w.b(0, 1) // no more transforms
    w.b(0, 1); w.b(0, 1) // no cache, no meta
    // literal (r'=250, g=10, b'=3) → r = 260&255 = 4, b = 13
    writeSimple(w, Seq(10)) // green
    writeSimple(w, Seq(250)) // red
    writeSimple(w, Seq(3)) // blue
    writeSimple(w, Seq(255)) // alpha
    writeSimple(w, Seq(0)) // distance
    // all codes single-symbol → zero data bits
    val img = WebpCodec.decode(riff(w.bytes())).get
    assert(rgba(img, 0) == ((4, 10, 13, 255)))
  }

  test("hand bitstream: predictor transform modes T and L reconstruct from residuals") {
    // 2x2, block bits 2 (4-wide blocks → one 1x1 mode image), mode 2 (T).
    // Row 0 always L-predicts, (0,0) predicts black 0xff000000.
    val w = new W
    w.vp8l(2, 2)
    w.b(1, 1); w.b(0, 2) // transform: predictor
    w.b(0, 3) // size_bits = 2
    // 1x1 mode image: one literal pixel, green = mode 2
    w.b(0, 1) // its cache bit (not main: no meta bit follows)
    writeSimple(w, Seq(2)) // green = predictor mode
    writeSimple(w, Seq(0)); writeSimple(w, Seq(0))
    writeSimple(w, Seq(0)); writeSimple(w, Seq(0))
    w.b(0, 1) // no more transforms
    w.b(0, 1); w.b(0, 1) // main: no cache, no meta
    // residual greens: 7, 3, 4, 250 with alpha residual 255,0,0,0
    val gl = Map(7 -> 2, 3 -> 2, 4 -> 2, 250 -> 2)
    val gc = canonical(gl)
    writeNormal(w, gl, 280) // green
    writeSimple(w, Seq(0)) // red residual 0
    writeSimple(w, Seq(0)) // blue
    val al = Map(255 -> 1, 0 -> 1); val ac = canonical(al)
    writeNormal(w, al, 256) // alpha residuals: 255 once then 0
    writeSimple(w, Seq(0)) // distance
    def px(g: Int, a: Int): Unit = { w.code(gc(g)._1, gc(g)._2); w.code(ac(a)._1, ac(a)._2) }
    px(7, 255) // (0,0): + black → g=7, a = 255+255 = 254? No: black a=255 → 255+255 mod 256 = 254
    px(3, 0)   // (1,0): + L
    px(4, 0)   // (0,1): + T (mode ignored: x==0 → T rule)
    px(250, 0) // (1,1): + T (block mode 2)
    val img = WebpCodec.decode(riff(w.bytes())).get
    // greens: (0,0)=7, (1,0)=7+3=10, (0,1)=7+4=11, (1,1)=10+250 mod 256 = 4
    assert(greens(img) == Seq(7, 10, 11, 4))
    // alpha at (0,0): residual 255 + predicted 255 (black) = 254
    assert(rgba(img, 0)._4 == 254)
  }

  test("hand bitstream: color transform inverse applies green_to_red/blue deltas") {
    // 1x1, block bits 2 → 1x1 transform image. cte lives in one ARGB
    // pixel: g2r in BLUE, g2b in GREEN, r2b in RED.
    val g2r = 64; val g2b = 32; val r2b = 16
    val w = new W
    w.vp8l(1, 1)
    w.b(1, 1); w.b(1, 2) // transform: color
    w.b(0, 3) // size_bits = 2
    w.b(0, 1) // cte image: no cache
    writeSimple(w, Seq(g2b)) // green
    writeSimple(w, Seq(r2b)) // red
    writeSimple(w, Seq(g2r)) // blue
    writeSimple(w, Seq(0)) // alpha
    writeSimple(w, Seq(0)) // distance
    w.b(0, 1) // no more transforms
    w.b(0, 1); w.b(0, 1)
    // stored pixel: r'=1, g=40, b'=2
    writeSimple(w, Seq(40)); writeSimple(w, Seq(1)); writeSimple(w, Seq(2))
    writeSimple(w, Seq(255)); writeSimple(w, Seq(0))
    val img = WebpCodec.decode(riff(w.bytes())).get
    // delta(t, c) = (int8(t)·int8(c)) >> 5
    val r = (1 + ((64.toByte * 40.toByte) >> 5)) & 0xFF
    val b0 = (2 + ((32.toByte * 40.toByte) >> 5)) & 0xFF
    val b = (b0 + ((16.toByte * r.toByte) >> 5)) & 0xFF
    assert(rgba(img, 0) == ((r, 40, b, 255)))
  }

  test("hand bitstream: color indexing with 2-bit bundling expands the palette") {
    // palette [X, Y, Z] (size 3 → 2 bits per index, 4 per green byte);
    // 5x1 image → packed width 2. Indices 2,1,0,2 | 1.
    val w = new W
    w.vp8l(5, 1)
    w.b(1, 1); w.b(3, 2) // transform: color indexing
    w.b(3 - 1, 8) // palette size 3
    // palette image 3x1, DELTA coded: X=(a255 g1), then +g2, then +g3
    w.b(0, 1) // no cache (palette is an entropy-coded image)
    val pl = Map(1 -> 2, 2 -> 2, 3 -> 2, 0 -> 2); val pc = canonical(pl)
    writeNormal(w, pl, 280) // green deltas: 1, 2, 3
    writeSimple(w, Seq(0)); writeSimple(w, Seq(0))
    val aal = Map(255 -> 1, 0 -> 1); val aac = canonical(aal)
    writeNormal(w, aal, 256) // alpha deltas: 255 then 0,0
    writeSimple(w, Seq(0))
    w.code(pc(1)._1, 2); w.code(aac(255)._1, 1)
    w.code(pc(2)._1, 2); w.code(aac(0)._1, 1)
    w.code(pc(3)._1, 2); w.code(aac(0)._1, 1)
    w.b(0, 1) // no more transforms
    // main packed image 2x1: green bytes bundle indices little-end
    // first: idx(0)=2,idx(1)=1,idx(2)=0,idx(3)=2 → 2|1<<2|0<<4|2<<6 = 0x86
    // second: idx(4)=1 → 0x01
    w.b(0, 1); w.b(0, 1)
    val ml = Map(0x86 -> 1, 0x01 -> 1); val mc = canonical(ml)
    writeGroupConstRba(w, writeNormal(_, ml, 280))
    w.code(mc(0x86)._1, 1); w.code(mc(0x01)._1, 1)
    val img = WebpCodec.decode(riff(w.bytes())).get
    assert(img.width == 5 && img.height == 1)
    // palette greens: 1, 3, 6 (delta-decoded); alphas 255 throughout
    assert(greens(img) == Seq(6, 3, 1, 6, 3))
    assert(rgba(img, 0)._4 == 255)
  }

  test("refusals: truncation, bad signature, lossy VP8, incomplete code, bad version") {
    val good = WebpCodec.encodeGreen(4, 2, Array.tabulate(8)(_.toByte))
    assert(WebpCodec.decode(good).isDefined)
    assert(WebpCodec.decode(good.take(good.length - 3)).isEmpty)
    assert(WebpCodec.decode(good.take(15)).isEmpty)
    assert(WebpCodec.decode("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    val lossy = good.clone(); lossy(12) = 'V'; lossy(13) = 'P'; lossy(14) = '8'; lossy(15) = ' '
    assert(WebpCodec.decode(lossy).isEmpty)
    // version != 0 refuses
    val w = new W; w.vp8l(1, 1)
    val vbad = riff(w.bytes()); vbad(vbad.length - 2) = (vbad(vbad.length - 2) | 0x40).toByte
    // (flip a version bit: offset 24 bits into the 5-byte header)
    val w2 = new W
    w2.vp8l(1, 1); w2.b(0, 1); w2.b(0, 1); w2.b(0, 1)
    // over-subscribed green code: two symbols of length... via simple
    // code with identical symbols is rejected at read
    val p2 = w2.bytes()
    p2(3) = (p2(3) | 0x20).toByte // set a version bit (bits 29-31 of the LE word after 0x2F)
    assert(WebpCodec.decode(riff(p2)).isEmpty)
  }

  test("VP8X container: the VP8L chunk is found behind the extended header") {
    val inner = WebpCodec.encodeGreen(2, 1, Array[Byte](1, 2))
    // lift the VP8L chunk out and re-wrap behind a VP8X chunk
    val vp8l = java.util.Arrays.copyOfRange(inner, 12, inner.length)
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF) }
    out.write("RIFF".getBytes("US-ASCII")); le32(4 + 18 + vp8l.length)
    out.write("WEBP".getBytes("US-ASCII"))
    out.write("VP8X".getBytes("US-ASCII")); le32(10)
    out.write(new Array[Byte](10))
    out.write(vp8l)
    val img = WebpCodec.decode(out.toByteArray).get
    assert(greens(img) == Seq(1, 2))
  }

  test("hand bitstream: meta prefix groups select codes per 4-pixel block") {
    // 8x1 image, block bits 2 → a 2x1 meta image mapping pixels 0-3
    // to group 0 and 4-7 to group 1; each group's green is a distinct
    // one-symbol code, so the OUTPUT pins the group arithmetic
    val w = new W
    w.vp8l(8, 1)
    w.b(0, 1) // no transforms
    w.b(0, 1) // no cache
    w.b(1, 1); w.b(0, 3) // meta prefix on, size_bits = 2 (block 4)
    // the meta image (2x1, entropy-coded): green = group index
    w.b(0, 1) // its cache bit
    writeSimple(w, Seq(0, 1)) // green: {0,1} → canonical 1 bit each
    writeSimple(w, Seq(0)); writeSimple(w, Seq(0))
    writeSimple(w, Seq(0)); writeSimple(w, Seq(0))
    w.b(0, 1); w.b(1, 1) // meta pixels: green 0 then green 1
    // group 0: green {10}; group 1: green {20}; all zero-bit codes
    writeGroupConstRba(w, writeSimple(_, Seq(10)))
    writeGroupConstRba(w, writeSimple(_, Seq(20)))
    // pixel data: every code one-symbol → zero data bits
    val img = WebpCodec.decode(riff(w.bytes())).get
    assert(greens(img) == Seq(10, 10, 10, 10, 20, 20, 20, 20))
  }

  test("fuzz: byte flips, truncations, and random tails never throw") {
    val rnd = new scala.util.Random(42)
    val good = WebpCodec.encodeGreen(8, 4, Array.tabulate(32)(i => (i * 17).toByte))
    (0 until 400).foreach { _ =>
      val m = good.clone()
      val flips = rnd.nextInt(4) + 1
      (0 until flips).foreach { _ =>
        m(rnd.nextInt(m.length)) = (rnd.nextInt(256)).toByte
      }
      WebpCodec.decode(m) // Some or None, never a throw
    }
    (1 until good.length).foreach(n => WebpCodec.decode(good.take(n)))
    (0 until 200).foreach { _ =>
      val tail = Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      WebpCodec.decode("RIFF   WEBPVP8L".getBytes("ISO-8859-1") ++ tail)
    }
  }

  test("encoder round-trip: full byte range, multi-row, deterministic") {
    val g = Array.tabulate(32 * 9)(i => ((i * 7 + 13) % 256).toByte)
    val enc = WebpCodec.encodeGreen(32, 9, g)
    assert(enc.sameElements(WebpCodec.encodeGreen(32, 9, g)))
    val img = WebpCodec.decode(enc).get
    assert(img.width == 32 && img.height == 9 && img.channels == 4)
    assert(greens(img) == g.map(_ & 0xFF).toSeq)
    assert(img.pixels.grouped(4).forall(p => p(0) == 0 && p(2) == 0 && (p(3) & 0xFF) == 255))
  }
}
