package graft

import graft.ops.{Vp8Enc, WebpCodec}
import graft.ops.WebpCodec.AnimFrameSpec
import org.scalatest.funsuite.AnyFunSuite

/** Animated WebP demux + canvas composition. Frame payloads ride the
  * independently-pinned still-image decode paths (VP8L, VP8, ALPH —
  * see WebpVp8Spec / Vp8EncSpec); what THIS spec pins is the ANMF
  * layer: header fields, frame placement, and the spec's normative
  * blend/dispose composition, checked against hand-written integer
  * arithmetic (not against the production compositor). */
class WebpAnimSpec extends AnyFunSuite {

  private def greenTile(w: Int, h: Int, g: Int): Array[Byte] =
    WebpCodec.chunkBytes("VP8L", WebpCodec.encodeGreenPayload(w, h, Array.fill(w * h)(g.toByte)))

  /** A lossy 16x16 frame (flat YUV 128) + constant alpha plane. */
  private def lossyAlphaTile(alpha: Int): Array[Byte] = {
    val y = Array.fill[Byte](256)(128.toByte)
    val u = Array.fill[Byte](64)(128.toByte)
    val v = Array.fill[Byte](64)(128.toByte)
    val enc = Vp8Enc.encode(16, 16, y, u, v, Vp8Enc.Params(qi = 40))
    val vp8 = java.util.Arrays.copyOfRange(enc.webp, 20, enc.webp.length)
    WebpCodec.chunkBytes("ALPH",
      WebpCodec.encodeAlphaPayload(Array.fill[Byte](256)(alpha.toByte), 16, 16, 0, 0)) ++
      WebpCodec.chunkBytes("VP8 ", vp8)
  }

  test("header fields: canvas, loop count, background color, durations, flags") {
    val webp = WebpCodec.encodeAnim(32, 16, loopCount = 7, bgColor = 0x11223344,
      Seq(AnimFrameSpec(0, 0, 16, 16, 40, blend = true, disposeToBg = false, greenTile(16, 16, 9)),
        AnimFrameSpec(16, 0, 16, 16, 80, blend = false, disposeToBg = true, greenTile(16, 16, 200))))
    val anim = WebpCodec.decodeAnim(webp).getOrElse(fail("refused"))
    assert(anim.width == 32 && anim.height == 16)
    assert(anim.loopCount == 7 && anim.bgColor == 0x11223344)
    assert(anim.frames.map(_.durationMs) == Vector(40, 80))
    assert(anim.frames.map(_.blend) == Vector(true, false))
    assert(anim.frames.map(_.disposeToBg) == Vector(false, true))
    assert(anim.frames(1).x == 16 && anim.frames(1).y == 0)
  }

  test("opaque frames compose by overwrite; untouched canvas stays transparent") {
    val webp = WebpCodec.encodeAnim(16, 32, 0, 0,
      Seq(AnimFrameSpec(0, 0, 16, 16, 10, blend = true, disposeToBg = false, greenTile(16, 16, 50)),
        AnimFrameSpec(0, 16, 16, 16, 10, blend = true, disposeToBg = false, greenTile(16, 16, 99))))
    val anim = WebpCodec.decodeAnim(webp).get
    val c0 = anim.canvases(0); val c1 = anim.canvases(1)
    // after frame 0: top tile (0,50,0,255), bottom transparent
    assert(c0.slice(0, 4).toSeq == Seq[Byte](0, 50, 0, -1))
    assert(c0.slice(16 * 16 * 4, 16 * 16 * 4 + 4).toSeq == Seq[Byte](0, 0, 0, 0))
    // after frame 1: both tiles
    assert(c1.slice(0, 4).toSeq == Seq[Byte](0, 50, 0, -1))
    assert(c1.slice(16 * 16 * 4, 16 * 16 * 4 + 4).toSeq == Seq[Byte](0, 99, 0, -1))
  }

  test("dispose-to-background clears the frame rect AFTER its snapshot") {
    val webp = WebpCodec.encodeAnim(16, 16, 0, 0,
      Seq(AnimFrameSpec(0, 0, 16, 16, 10, blend = true, disposeToBg = true, greenTile(16, 16, 77)),
        AnimFrameSpec(0, 0, 16, 2, 10, blend = true, disposeToBg = false, greenTile(16, 2, 5))))
    val anim = WebpCodec.decodeAnim(webp).get
    // frame 0's own snapshot still shows it
    assert(anim.canvases(0).slice(0, 4).toSeq == Seq[Byte](0, 77, 0, -1))
    // frame 1's canvas: rows 0-1 from frame 1, the rest DISPOSED (transparent)
    val c1 = anim.canvases(1)
    assert(c1.slice(0, 4).toSeq == Seq[Byte](0, 5, 0, -1))
    assert(c1.slice(16 * 4 * 4, 16 * 4 * 4 + 4).toSeq == Seq[Byte](0, 0, 0, 0), "row 4 disposed")
  }

  test("partial alpha over transparent canvas: RGB preserved, alpha = frame alpha") {
    val webp = WebpCodec.encodeAnim(16, 16, 0, 0,
      Seq(AnimFrameSpec(0, 0, 16, 16, 10, blend = true, disposeToBg = false, lossyAlphaTile(128))))
    val anim = WebpCodec.decodeAnim(webp).get
    // the lossy frame standalone (pinned path) gives the RGB
    val encStill = Vp8Enc.encode(16, 16, Array.fill[Byte](256)(128.toByte),
      Array.fill[Byte](64)(128.toByte), Array.fill[Byte](64)(128.toByte),
      Vp8Enc.Params(qi = 40))
    val still = WebpCodec.decode(WebpCodec.encodeLossyAlphaWebp(
      java.util.Arrays.copyOfRange(encStill.webp, 20, encStill.webp.length),
      WebpCodec.encodeAlphaPayload(Array.fill[Byte](256)(128.toByte), 16, 16, 0, 0),
      16, 16)).get
    // over transparent canvas (cA=0): scale=0, blendA=fA, rgb=(f.rgb*fA)/fA = f.rgb
    val c = anim.canvases(0)
    assert(c(3) == 128.toByte, "alpha")
    assert(c(0) == still.pixels(0) && c(1) == still.pixels(1) && c(2) == still.pixels(2))
  }

  test("partial alpha over an opaque tile blends with the spec's integer arithmetic") {
    // frame 0: opaque green 100; frame 1: the lossy gray tile at alpha 128
    val webp = WebpCodec.encodeAnim(16, 16, 0, 0,
      Seq(AnimFrameSpec(0, 0, 16, 16, 10, blend = true, disposeToBg = false, greenTile(16, 16, 100)),
        AnimFrameSpec(0, 0, 16, 16, 10, blend = true, disposeToBg = false, lossyAlphaTile(128))))
    val anim = WebpCodec.decodeAnim(webp).get
    // the frame's own RGB from the pinned still path
    val frameRgb = {
      val y = Array.fill[Byte](256)(128.toByte)
      val u = Array.fill[Byte](64)(128.toByte); val v = Array.fill[Byte](64)(128.toByte)
      val enc = Vp8Enc.encode(16, 16, y, u, v, Vp8Enc.Params(qi = 40))
      graft.ops.Vp8.toRgb(graft.ops.Vp8.Frame(16, 16, enc.y, enc.u, enc.v))
    }
    // hand arithmetic, NOT the production compositor:
    //   cA=255, fA=128 → scale = 255*(255-128)/255 = 127, blendA = 255
    //   out.ch = (c.ch*127 + f.ch*128) / 255
    val c = anim.canvases(1)
    for (ch <- 0 until 3) {
      val cv = ch match { case 0 => 0; case 1 => 100; case 2 => 0 }
      val fv = frameRgb(ch) & 0xFF
      val want = (cv * 127 + fv * 128) / 255
      assert((c(ch) & 0xFF) == want, s"channel $ch")
    }
    assert((c(3) & 0xFF) == 255)
  }

  test("no-blend flag overwrites even with partial alpha") {
    val webp = WebpCodec.encodeAnim(16, 16, 0, 0,
      Seq(AnimFrameSpec(0, 0, 16, 16, 10, blend = true, disposeToBg = false, greenTile(16, 16, 100)),
        AnimFrameSpec(0, 0, 16, 16, 10, blend = false, disposeToBg = false, lossyAlphaTile(128))))
    val anim = WebpCodec.decodeAnim(webp).get
    assert((anim.canvases(1)(3) & 0xFF) == 128, "alpha written through")
  }

  test("refusals: still image, no animation flag, frame out of bounds, frame cap, truncation") {
    assert(WebpCodec.decodeAnim(WebpCodec.encodeGreen(4, 4, new Array[Byte](16))).isEmpty,
      "still VP8L image is not an animation")
    val ok = WebpCodec.encodeAnim(16, 16, 0, 0,
      Seq(AnimFrameSpec(0, 0, 16, 16, 10, blend = true, disposeToBg = false, greenTile(16, 16, 1))))
    assert(WebpCodec.decodeAnim(ok).isDefined)
    val noFlag = ok.clone(); noFlag(20) = 0 // VP8X flags byte
    assert(WebpCodec.decodeAnim(noFlag).isEmpty, "animation flag off")
    val oob = WebpCodec.encodeAnim(16, 16, 0, 0,
      Seq(AnimFrameSpec(8, 0, 16, 16, 10, blend = true, disposeToBg = false, greenTile(16, 16, 1))))
    assert(WebpCodec.decodeAnim(oob).isEmpty, "frame rect outside canvas")
    val two = WebpCodec.encodeAnim(16, 32, 0, 0,
      Seq(AnimFrameSpec(0, 0, 16, 16, 10, blend = true, disposeToBg = false, greenTile(16, 16, 1)),
        AnimFrameSpec(0, 16, 16, 16, 10, blend = true, disposeToBg = false, greenTile(16, 16, 2))))
    assert(WebpCodec.decodeAnim(two, maxFrames = 1).isEmpty, "frame cap")
    (1 until ok.length by 11).foreach { n =>
      WebpCodec.decodeAnim(java.util.Arrays.copyOf(ok, n)) // never throws
    }
    val rng = new scala.util.Random(11)
    (0 until 100).foreach { _ =>
      val junk = new Array[Byte](rng.nextInt(300)); rng.nextBytes(junk)
      WebpCodec.decodeAnim(junk)
    }
  }
}
