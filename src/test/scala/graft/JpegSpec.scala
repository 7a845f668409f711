package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.JpegCodec

/** From-spec baseline JPEG decoder vs the JDK's independent ImageIO
  * implementation: grayscale tracks it within the IDCT rounding band,
  * color (4:2:0 subsampled by the JDK writer) within a PSNR bound,
  * progressive is declined, hostile/truncated bytes never throw.
  */
class JpegSpec extends AnyFunSuite {

  private def detPixels(n: Int, seed: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var s = seed.toLong
    var i = 0
    while (i < n) { s = s * 6364136223846793005L + 1442695040888963407L; out(i) = (s >>> 33).toByte; i += 1 }
    out
  }

  private def encodeJpeg(img: BufferedImage, quality: Float,
      progressive: Boolean = false): Array[Byte] = {
    val w = ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    if (progressive) p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new IIOImage(img, null, null), p)
    ios.flush(); w.dispose()
    bos.toByteArray
  }

  private def grayImage(w: Int, h: Int, seed: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val px = detPixels(w * h, seed)
    // smooth the noise a little so quality-0.95 JPEG stays close
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((px(y * w + x) & 0xFF) / 2 + (x * 7 + y * 5) % 128)
        img.getRaster.setSample(x, y, 0, v & 0xFF)
        x += 1
      }
      y += 1
    }
    img
  }

  test("grayscale: dims exact, every sample within the IDCT rounding band of ImageIO") {
    for ((w, h) <- Seq((8, 8), (17, 23), (64, 64), (40, 8))) {
      val bytes = encodeJpeg(grayImage(w, h, w * 31 + h), 0.95f)
      val mine = JpegCodec.decode(bytes)
      assert(mine.isDefined, s"decode failed at ${w}x$h")
      val m = mine.get
      assert(m.width == w && m.height == h && m.channels == 1)
      val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(ref.getWidth == w && ref.getHeight == h)
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w) {
        val a = m.pixels(y * w + x) & 0xFF
        val b = ref.getRaster.getSample(x, y, 0)
        maxDiff = math.max(maxDiff, math.abs(a - b))
      }
      assert(maxDiff <= 2, s"${w}x$h: max |mine - ImageIO| = $maxDiff")
    }
  }

  test("color 4:2:0: dims/channels exact, PSNR vs ImageIO above 30 dB") {
    val (w, h) = (48, 32)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 255) / (w - 1)
      val g = (y * 255) / (h - 1)
      val b = ((x + y) * 255) / (w + h - 2)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bytes = encodeJpeg(img, 0.9f)
    val mine = JpegCodec.decode(bytes).get
    assert(mine.width == w && mine.height == h && mine.channels == 3)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var se = 0.0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val o = (y * w + x) * 3
      val dr = (mine.pixels(o) & 0xFF) - ((rgb >> 16) & 0xFF)
      val dg = (mine.pixels(o + 1) & 0xFF) - ((rgb >> 8) & 0xFF)
      val db = (mine.pixels(o + 2) & 0xFF) - (rgb & 0xFF)
      se += dr * dr + dg * dg + db * db
    }
    val mse = se / (w * h * 3)
    val psnr = 10 * math.log10(255.0 * 255.0 / math.max(mse, 1e-12))
    assert(psnr > 30, s"PSNR vs ImageIO = $psnr dB")
    // decode is deterministic
    assert(JpegCodec.decode(bytes).get.pixels.sameElements(mine.pixels))
  }

  test("restart intervals (DRI + RSTn markers) decode identically to ImageIO") {
    // force a restart interval through the writer's native metadata tree
    val img = grayImage(64, 48, 13) // 48 MCUs -> several restarts at interval 4
    val w = ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.95f)
    val meta = w.getDefaultImageMetadata(
      javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img), p)
    val fmt = "javax_imageio_jpeg_image_1.0"
    val tree = meta.getAsTree(fmt).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
    val seq = tree.getElementsByTagName("markerSequence").item(0)
      .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
    val dri = new javax.imageio.metadata.IIOMetadataNode("dri")
    dri.setAttribute("interval", "4")
    seq.insertBefore(dri, seq.getFirstChild)
    meta.setFromTree(fmt, tree)
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new IIOImage(img, null, meta), p)
    ios.flush(); w.dispose()
    val bytes = bos.toByteArray
    // confirm the stream really contains DRI (FFDD) and an RST marker
    def hasMarker(m: Int) = bytes.sliding(2).exists(s =>
      (s(0) & 0xFF) == 0xFF && (s(1) & 0xFF) == m)
    assert(hasMarker(0xDD), "writer did not emit DRI — fixture invalid")
    assert(hasMarker(0xD0), "no RST0 in stream — fixture invalid")
    val mine = JpegCodec.decode(bytes)
    assert(mine.isDefined, "DRI stream not decoded")
    val m = mine.get
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until 48; x <- 0 until 64)
      maxDiff = math.max(maxDiff,
        math.abs((m.pixels(y * 64 + x) & 0xFF) - ref.getRaster.getSample(x, y, 0)))
    assert(maxDiff <= 2, s"DRI decode diverges: max diff $maxDiff")
  }

  test("progressive JPEG decodes within the rounding band of ImageIO") {
    for ((w, h) <- Seq((32, 32), (17, 23), (64, 48))) {
      val bytes = encodeJpeg(grayImage(w, h, w + h * 3), 0.92f, progressive = true)
      // confirm the stream is really SOF2
      assert(bytes.sliding(2).exists(s => (s(0) & 0xFF) == 0xFF && (s(1) & 0xFF) == 0xC2),
        "writer did not emit SOF2 — fixture invalid")
      val mine = JpegCodec.decode(bytes)
      assert(mine.isDefined, s"progressive decode failed at ${w}x$h")
      val m = mine.get
      assert(m.width == w && m.height == h && m.channels == 1)
      val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w)
        maxDiff = math.max(maxDiff, math.abs((m.pixels(y * w + x) & 0xFF) -
          ref.getRaster.getSample(x, y, 0)))
      assert(maxDiff <= 2, s"progressive ${w}x$h: max |mine - ImageIO| = $maxDiff")
    }
    // progressive COLOR (4:2:0, multi-component DC scan + per-component
    // AC scans): PSNR-checked like sequential color
    val (w, h) = (48, 32)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (((x * 255) / (w - 1)) << 16) | (((y * 255) / (h - 1)) << 8) | 0x60)
    val cb = encodeJpeg(img, 0.9f, progressive = true)
    val cm = JpegCodec.decode(cb)
    assert(cm.isDefined, "progressive color decode failed")
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(cb))
    var se = 0.0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val o = (y * w + x) * 3
      val dr = (cm.get.pixels(o) & 0xFF) - ((rgb >> 16) & 0xFF)
      val dg = (cm.get.pixels(o + 1) & 0xFF) - ((rgb >> 8) & 0xFF)
      val db = (cm.get.pixels(o + 2) & 0xFF) - (rgb & 0xFF)
      se += dr * dr + dg * dg + db * db
    }
    val psnr = 10 * math.log10(255.0 * 255.0 / math.max(se / (w * h * 3), 1e-12))
    assert(psnr > 28, s"progressive color PSNR vs ImageIO = $psnr dB")
  }

  test("hostile bytes: truncations, bit flips, and garbage never throw") {
    val valid = encodeJpeg(grayImage(24, 16, 9), 0.9f)
    for (len <- 0 to valid.length by 3)
      JpegCodec.decode(java.util.Arrays.copyOf(valid, len)) // must not throw
    for (seed <- 1 to 50)
      JpegCodec.decode(detPixels(200, seed)) // must not throw
    val flipped = valid.clone()
    for (i <- flipped.indices by 7) {
      flipped(i) = (flipped(i) ^ 0x40).toByte
    }
    JpegCodec.decode(flipped) // must not throw
    // and a flood of tiny prefixes with the right magic
    JpegCodec.decode(Array(0xFF, 0xD8).map(_.toByte))
    JpegCodec.decode(Array(0xFF, 0xD8, 0xFF, 0xDB, 0x00, 0x01).map(_.toByte))
    succeed
  }

  test("non-MCU-aligned color image: padding blocks do not corrupt the visible region") {
    val (w, h) = (19, 13) // forces partial MCUs on both axes at 4:2:0
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, ((x * 13) << 16) | ((y * 19) << 8) | 0x40)
    val bytes = encodeJpeg(img, 0.92f)
    val mine = JpegCodec.decode(bytes).get
    assert(mine.width == w && mine.height == h && mine.channels == 3)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var se = 0.0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val o = (y * w + x) * 3
      val dr = (mine.pixels(o) & 0xFF) - ((rgb >> 16) & 0xFF)
      val dg = (mine.pixels(o + 1) & 0xFF) - ((rgb >> 8) & 0xFF)
      val db = (mine.pixels(o + 2) & 0xFF) - (rgb & 0xFF)
      se += dr * dr + dg * dg + db * db
    }
    val psnr = 10 * math.log10(255.0 * 255.0 / math.max(se / (w * h * 3), 1e-12))
    assert(psnr > 28, s"PSNR vs ImageIO = $psnr dB")
  }
}
