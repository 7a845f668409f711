package graft

import graft.ops.Vp8Enc

/** The crafted-stream grid shared by [[Vp8EncSpec]] (committed
  * self-consistency + digest pins) and [[Vp8Diff]] (the out-of-band
  * libwebp differential): every encoder feature in isolation —
  * per-quality sweeps, forced B_PRED submodes (all ten, mixed, and a
  * full (above,left) context-pair grid over the three modes whose
  * enum order differs between the RFC and the reference library),
  * loop-filter configurations (no-op hard-edge, active smooth-
  * gradient, simple profile), segmentation, multiple token
  * partitions, skip macroblocks, odd sizes. */
object Vp8Cases {

  /** Grayscale-ish planes from a luma function (chroma derived so
    * every case exercises all three planes). */
  def gray(w: Int, h: Int, f: (Int, Int) => Int): (Array[Byte], Array[Byte], Array[Byte]) = {
    val y = new Array[Byte](w * h)
    for (yy <- 0 until h; xx <- 0 until w) y(yy * w + xx) = f(xx, yy).toByte
    val uw = (w + 1) / 2; val uh = (h + 1) / 2
    val u = new Array[Byte](uw * uh); val v = new Array[Byte](uw * uh)
    for (yy <- 0 until uh; xx <- 0 until uw) {
      u(yy * uw + xx) = (f(xx * 2, yy * 2) / 2 + 64).toByte
      v(yy * uw + xx) = (255 - f(xx * 2, yy * 2) / 2 - 64).toByte
    }
    (y, u, v)
  }

  def flat(v: Int): (Int, Int) => Int = (_, _) => v
  def grad: (Int, Int) => Int = (x, y) => (x * 5 + y * 3) % 256
  def noise: (Int, Int) => Int = (x, y) => ((x * 31 + y * 17 + (x * y) % 97) * 13) % 256
  def blocks: (Int, Int) => Int = (x, y) => if (((x / 4) + (y / 4)) % 2 == 0) 230 else 20

  val all: Vector[(String, Int, Int, (Int, Int) => Int, Vp8Enc.Params)] = {
    val P = Vp8Enc.Params
    var cases = Vector[(String, Int, Int, (Int, Int) => Int, Vp8Enc.Params)]()
    cases :+= (("flat", 32, 32, flat(128), P(qi = 60)))
    cases :+= (("grad-dc", 48, 48, grad, P(qi = 30)))
    cases :+= (("noise-lowq", 32, 32, noise, P(qi = 10)))
    cases :+= (("noise-hiq", 32, 32, noise, P(qi = 100)))
    cases :+= (("qi0", 16, 16, noise, P(qi = 0)))
    cases :+= (("qi127", 16, 16, noise, P(qi = 127)))
    cases :+= (("uvclamp", 32, 16, grad, P(qi = 112, uvdcDelta = 15)))
    cases :+= (("oddsize", 33, 17, grad, P(qi = 40)))
    cases :+= (("row1", 32, 1, grad, P(qi = 40)))   // single-pixel-row crop
    cases :+= (("px1", 1, 1, flat(77), P(qi = 40))) // minimal frame
    // forced B_PRED: each MB uses one submode everywhere; 10 modes
    // over a 5x2 MB grid (80x32)
    val allB = (mx: Int, my: Int) => Array.fill(16)(my * 5 + mx)
    cases :+= (("bpred-all", 80, 32, grad, P(qi = 40, bModes = Some(allB))))
    cases :+= (("bpred-noise", 80, 32, noise, P(qi = 30, bModes = Some(allB))))
    // mixed submodes inside one MB (context coverage)
    val mixB = (mx: Int, my: Int) => Array.tabulate(16)(i => (i * 7 + mx + my) % 10)
    cases :+= (("bpred-mix", 64, 48, grad, P(qi = 50, bModes = Some(mixB))))
    // loop filter sweeps over hard-edge content (edges exceed the
    // limits: filter is a verified no-op)
    for (lvl <- Seq(10, 25, 40, 63); sh <- Seq(0, 3, 7))
      cases :+= ((s"lf-$lvl-$sh", 48, 48, blocks, P(qi = 30, filterLevel = lvl, sharpness = sh)))
    for (lvl <- Seq(10, 40, 63))
      cases :+= ((s"lfsimple-$lvl", 48, 48, blocks,
        P(qi = 30, filterLevel = lvl, filterSimple = true)))
    // filter-ACTIVE cases: coarse-quantized smooth gradient leaves
    // small block steps under the limits, so the filter fires
    cases :+= (("lf-active", 48, 48, grad, P(qi = 100, filterLevel = 40)))
    cases :+= (("lf-active-sharp", 48, 48, grad, P(qi = 100, filterLevel = 40, sharpness = 5)))
    cases :+= (("lf-active-simple", 48, 48, grad, P(qi = 100, filterLevel = 40, filterSimple = true)))
    cases :+= (("lf-bpred", 64, 32, blocks,
      P(qi = 25, filterLevel = 35, bModes = Some(allB))))
    // segmentation: 4 absolute qis by quadrant
    cases :+= (("seg", 64, 64, grad,
      P(qi = 40, segQi = Some(Array(10, 40, 80, 120)),
        segOf = (mx, my) => (my % 2) * 2 + (mx % 2))))
    // multiple token partitions
    for (np <- Seq(2, 4, 8))
      cases :+= ((s"nparts-$np", 64, 64, noise, P(qi = 30, nParts = np)))
    // skip macroblocks: flat content quantizes to zero → skip path
    cases :+= (("skips", 64, 64, flat(200), P(qi = 90, filterLevel = 20)))

    // single-MB, single-submode isolation: 16x16, every subblock mode k
    for (k <- 0 until 10)
      cases :+= ((s"b1-$k", 16, 16, grad, P(qi = 40, bModes = Some((_, _) => Array.fill(16)(k)))))
    // same but with zero residual (flat at the DC predictor's output)
    for (k <- 0 until 10)
      cases :+= ((s"b1f-$k", 16, 16, flat(128), P(qi = 40, bModes = Some((_, _) => Array.fill(16)(k)))))

    // sb0-only probes: mode k at subblock 0, DC everywhere else, flat
    // content, zero residual — the reference decoder's sb0 pixels
    // identify which prediction it associates with each coded value
    for (k <- 0 until 10)
      cases :+= ((s"probe-$k", 16, 16, flat(128),
        P(qi = 40, bModes = Some((_, _) => Array.tabulate(16)(i => if (i == 0) k else 0)))))

    // ctx probes: sb5 = value k under context (above = modes(1) = a,
    // left = modes(4) = l); gradient content so any divergence shows.
    // k ranges over exactly the three B modes whose enum order
    // differs between RFC 6386 (LD,RD,VR at 4,5,6) and the reference
    // library's internal tree-leaf order (RD,VR,LD) — the axis the
    // kfBModeProbs row/col permutation in Vp8Tables is about.
    for (k <- Seq(4, 5, 6); a <- 0 until 10; l <- 0 until 10)
      cases :+= ((s"ctx-$k-$a-$l", 16, 16, grad,
        P(qi = 40, bModes = Some((_, _) =>
          Array.tabulate(16)(i => if (i == 1) a else if (i == 4) l else if (i == 5) k else 0)))))
    cases
  }

  /** One lossy+ALPH container (VP8X + ALPH + VP8) for the given
    * alpha filter/compression combination, plus the exact RGBA a
    * conforming decoder must produce (tracked RGB, original alpha).
    * Shared by [[Vp8Diff]] (libwebp cross-check files) and
    * [[Vp8EncSpec]] (digest pins). */
  def alphaCase(filter: Int, compress: Int, w: Int, h: Int): (Array[Byte], Array[Byte]) = {
    import graft.ops.{Vp8, WebpCodec}
    val (y, u, v) = gray(w, h, grad)
    val alpha = Array.tabulate(w * h)(i => ((i * 7 + (i / w) * 3 + 13) % 256).toByte)
    val enc = Vp8Enc.encode(w, h, y, u, v, Vp8Enc.Params(qi = 40))
    val vp8Payload = java.util.Arrays.copyOfRange(enc.webp, 20, enc.webp.length)
    val container = WebpCodec.encodeLossyAlphaWebp(vp8Payload,
      WebpCodec.encodeAlphaPayload(alpha, w, h, filter, compress), w, h)
    val rgb = Vp8.toRgb(Vp8.Frame(w, h, enc.y, enc.u, enc.v))
    val rgba = new Array[Byte](w * h * 4)
    var j = 0
    while (j < alpha.length) {
      rgba(4 * j) = rgb(3 * j); rgba(4 * j + 1) = rgb(3 * j + 1)
      rgba(4 * j + 2) = rgb(3 * j + 2); rgba(4 * j + 3) = alpha(j)
      j += 1
    }
    (container, rgba)
  }
}
