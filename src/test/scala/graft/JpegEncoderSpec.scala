package graft

import javax.imageio.ImageIO
import graft.ops.{JpegCodec, JpegEncoder, PngCodec}
import org.scalatest.funsuite.AnyFunSuite

/** From-spec baseline JPEG encoder: round-trips through our own
  * decoder AND through the JDK's independent ImageIO decoder (two
  * implementations agreeing on our bytes = the bytes are spec-legal),
  * determinism, edge dims, quality curve.
  */
class JpegEncoderSpec extends AnyFunSuite {

  private def grayGradient(w: Int, h: Int): PngCodec.Image = {
    val px = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      px(y * w + x) = (((x * 255) / math.max(1, w - 1) + (y * 255) / math.max(1, h - 1)) / 2).toByte
    PngCodec.Image(w, h, 1, px)
  }

  private def rgbPattern(w: Int, h: Int): PngCodec.Image = {
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      px((y * w + x) * 3) = ((x * 255) / math.max(1, w - 1)).toByte
      px((y * w + x) * 3 + 1) = ((y * 255) / math.max(1, h - 1)).toByte
      px((y * w + x) * 3 + 2) = (((x + y) * 127) / math.max(1, w + h - 2)).toByte
    }
    PngCodec.Image(w, h, 3, px)
  }

  private def psnr(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length == b.length)
    val mse = a.zip(b).map { case (x, y) =>
      val d = (x & 0xFF) - (y & 0xFF); d.toDouble * d
    }.sum / a.length
    if (mse == 0) Double.PositiveInfinity else 10 * math.log10(255.0 * 255.0 / mse)
  }

  test("grayscale round-trip through our decoder: dims exact, high PSNR") {
    for ((w, h) <- Seq((8, 8), (16, 24), (17, 9), (40, 33))) {
      val img = grayGradient(w, h)
      val bytes = JpegEncoder.encode(img, quality = 90)
      val back = JpegCodec.decode(bytes).getOrElse(fail(s"own decoder declined ${w}x$h"))
      assert(back.width == w && back.height == h && back.channels == 1)
      val p = psnr(img.pixels, back.pixels)
      assert(p > 35, s"${w}x$h gray PSNR $p dB")
    }
  }

  test("our bytes are spec-legal: ImageIO decodes them to the same picture") {
    val img = grayGradient(32, 20)
    val bytes = JpegEncoder.encode(img, quality = 90)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ref != null, "ImageIO rejected our bytes")
    assert(ref.getWidth == 32 && ref.getHeight == 20)
    // raster samples, not getRGB: getRGB runs gray→sRGB conversion
    val refPx = new Array[Byte](32 * 20)
    for (y <- 0 until 20; x <- 0 until 32)
      refPx(y * 32 + x) = ref.getRaster.getSample(x, y, 0).toByte
    assert(psnr(img.pixels, refPx) > 35, "ImageIO round-trip PSNR")
    // and the two decoders agree on our bytes within the IDCT band
    val own = JpegCodec.decode(bytes).get
    val maxDiff = own.pixels.zip(refPx).map { case (a, b) =>
      math.abs((a & 0xFF) - (b & 0xFF))
    }.max
    assert(maxDiff <= 2, s"own vs ImageIO on our bytes: max diff $maxDiff")
  }

  test("color round-trip: 4:4:4 YCbCr survives both decoders") {
    val img = rgbPattern(24, 16)
    val bytes = JpegEncoder.encode(img, quality = 90)
    val own = JpegCodec.decode(bytes).getOrElse(fail("own decoder declined color"))
    assert(own.width == 24 && own.height == 16 && own.channels == 3)
    assert(psnr(img.pixels, own.pixels) > 30, "own color PSNR")
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val refPx = new Array[Byte](24 * 16 * 3)
    for (y <- 0 until 16; x <- 0 until 24) {
      val rgb = ref.getRGB(x, y)
      refPx((y * 24 + x) * 3) = ((rgb >> 16) & 0xFF).toByte
      refPx((y * 24 + x) * 3 + 1) = ((rgb >> 8) & 0xFF).toByte
      refPx((y * 24 + x) * 3 + 2) = (rgb & 0xFF).toByte
    }
    assert(psnr(img.pixels, refPx) > 30, "ImageIO color PSNR")
  }

  test("encoding is deterministic and the quality knob is monotone") {
    val img = rgbPattern(40, 40)
    val a = JpegEncoder.encode(img, quality = 75)
    val b = JpegEncoder.encode(img, quality = 75)
    assert(java.util.Arrays.equals(a, b), "same input+quality must give same bytes")
    val lo = JpegEncoder.encode(img, quality = 10)
    val hi = JpegEncoder.encode(img, quality = 95)
    assert(lo.length < hi.length, s"q10=${lo.length}B q95=${hi.length}B")
  }

  test("1x1 and single-row/column images encode and decode") {
    for ((w, h) <- Seq((1, 1), (1, 9), (9, 1))) {
      val img = grayGradient(w, h)
      val back = JpegCodec.decode(JpegEncoder.encode(img, 85))
        .getOrElse(fail(s"decline at ${w}x$h"))
      assert(back.width == w && back.height == h)
    }
  }

  test("invalid inputs are rejected eagerly") {
    assertThrows[IllegalArgumentException] {
      JpegEncoder.encode(PngCodec.Image(2, 2, 4, new Array[Byte](16)))
    }
    assertThrows[IllegalArgumentException] {
      JpegEncoder.encode(PngCodec.Image(0, 2, 1, Array.emptyByteArray))
    }
  }

  test("quality table scaling matches the published curve endpoints") {
    // q=50 is the unscaled Annex K table; q=100 clamps to all-ones floor
    val q50 = JpegEncoder.scaledQuant(Array.fill(64)(16), 50)
    assert(q50.forall(_ == 16))
    val q100 = JpegEncoder.scaledQuant(Array.fill(64)(16), 100)
    assert(q100.forall(_ == 1))
  }
}
