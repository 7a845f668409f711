package graft

import java.awt.image.BufferedImage
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Multimodal, PngCodec}
import graft.ops.PngCodec.Image

/** Real PNG codec: self round-trips over every filter type and color
  * type, cross-validation against the JDK's independent ImageIO PNG
  * implementation in BOTH directions, hostile-bytes safety, and exact
  * box resize.
  */
class PngSpec extends AnyFunSuite {

  private def detPixels(n: Int, seed: Int): Array[Byte] = {
    // deterministic pseudo-random bytes (LCG) — varied enough to
    // exercise filter deltas without Math.random nondeterminism
    val out = new Array[Byte](n)
    var s = seed.toLong
    var i = 0
    while (i < n) { s = (s * 6364136223846793005L + 1442695040888963407L); out(i) = (s >>> 33).toByte; i += 1 }
    out
  }

  test("round-trip: every filter type × every color type recovers exact pixels") {
    for (ch <- Seq(1, 2, 3, 4); ft <- 0 to 4) {
      val img = Image(13, 7, ch, detPixels(13 * 7 * ch, seed = ch * 31 + ft))
      val bytes = PngCodec.encode(img, _ => ft)
      val back = PngCodec.decode(bytes)
      assert(back.isDefined, s"ch=$ch ft=$ft failed to decode")
      assert(back.get.width == 13 && back.get.height == 7 && back.get.channels == ch)
      assert(java.util.Arrays.equals(back.get.pixels, img.pixels), s"ch=$ch ft=$ft pixel mismatch")
    }
    // cycling default (the gate's configuration) too
    val img = Image(32, 9, 1, detPixels(32 * 9, seed = 99))
    assert(java.util.Arrays.equals(
      PngCodec.decode(PngCodec.encode(img)).get.pixels, img.pixels))
  }

  test("cross-validation: ImageIO-written PNGs decode to identical pixels") {
    // RGB
    val w = 21; val h = 11
    val rgb = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val px = detPixels(w * h * 3, seed = 7)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      rgb.setRGB(x, y, ((px(i) & 0xFF) << 16) | ((px(i + 1) & 0xFF) << 8) | (px(i + 2) & 0xFF))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(rgb, "png", bos))
    val ours = PngCodec.decode(bos.toByteArray)
    assert(ours.isDefined && ours.get.width == w && ours.get.height == h)
    assert(ours.get.channels == 3)
    assert(java.util.Arrays.equals(ours.get.pixels, px))

    // greyscale
    val grey = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val gpx = detPixels(w * h, seed = 13)
    for (y <- 0 until h; x <- 0 until w) {
      val v = gpx(y * w + x) & 0xFF
      grey.getRaster.setSample(x, y, 0, v)
    }
    val gos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(grey, "png", gos))
    val g = PngCodec.decode(gos.toByteArray)
    assert(g.isDefined && g.get.channels == 1)
    assert(java.util.Arrays.equals(g.get.pixels, gpx))
  }

  test("cross-validation: our PNGs read back identically through ImageIO") {
    for (ft <- 0 to 4) {
      val w = 17; val h = 9
      val px = detPixels(w * h * 3, seed = 40 + ft)
      val bytes = PngCodec.encode(Image(w, h, 3, px), _ => ft)
      val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected our PNG (filter $ft)")
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val i = (y * w + x) * 3
        val expected = ((px(i) & 0xFF) << 16) | ((px(i + 1) & 0xFF) << 8) | (px(i + 2) & 0xFF)
        assert((img.getRGB(x, y) & 0xFFFFFF) == expected, s"ft=$ft pixel ($x,$y)")
      }
    }
  }

  test("palette PNGs expand to RGB") {
    // hand-build a palette PNG: 4 colors, 4x2 indices — via our
    // encoder machinery is impossible (we don't emit type 3), so this
    // uses ImageIO's indexed type
    val cm = new java.awt.image.IndexColorModel(8, 4,
      Array[Byte](0, 50.toByte, 100.toByte, 200.toByte),
      Array[Byte](10, 60.toByte, 110.toByte, 210.toByte),
      Array[Byte](20, 70.toByte, 120.toByte, 220.toByte))
    val img = new BufferedImage(4, 2, BufferedImage.TYPE_BYTE_INDEXED, cm)
    for (y <- 0 until 2; x <- 0 until 4) img.getRaster.setSample(x, y, 0, (x + y) % 4)
    val bos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", bos))
    val out = PngCodec.decode(bos.toByteArray)
    assert(out.isDefined && out.get.channels == 3)
    val p = out.get.pixels
    // pixel (0,0) = index 0 = (0,10,20); pixel (3,1) = index 0 too ((3+1)%4)
    assert((p(0) & 0xFF, p(1) & 0xFF, p(2) & 0xFF) == ((0, 10, 20)))
    // pixel (1,0) = index 1 = (50,60,70)
    assert((p(3) & 0xFF, p(4) & 0xFF, p(5) & 0xFF) == ((50, 60, 70)))
  }

  test("hostile and truncated bytes return None, never throw") {
    val good = PngCodec.encode(Image(8, 8, 1, detPixels(64, 3)))
    assert(PngCodec.decode(Array.emptyByteArray).isEmpty)
    assert(PngCodec.decode("not a png at all, sorry".getBytes).isEmpty)
    for (cut <- Seq(4, 8, 20, 33, good.length - 5))
      assert(PngCodec.decode(good.take(cut)).isEmpty, s"truncated at $cut")
    // flip a byte inside IDAT → CRC mismatch → None
    val corrupt = good.clone(); corrupt(good.length - 20) = (corrupt(good.length - 20) ^ 0x55).toByte
    assert(PngCodec.decode(corrupt).isEmpty)
    // hostile dims: claims 65535x65535 → cap refuses before allocating
    val huge = good.clone()
    huge(16) = 0; huge(17) = 0xFF.toByte; huge(18) = 0xFF.toByte; huge(19) = 0xFF.toByte
    assert(PngCodec.decode(huge).isEmpty) // (CRC now fails anyway — also None)
  }

  test("box resize: exact integer semantics, 2x downsample = rounded quad mean") {
    val src = Image(4, 4, 1, Array[Byte](
      10, 20, 30, 40,
      50, 60, 70, 80,
      90, 100, 110, 120,
      (130 & 0xFF).toByte, (140 & 0xFF).toByte, (150 & 0xFF).toByte, (160 & 0xFF).toByte))
    val out = PngCodec.resizeBox(src, 2, 2)
    assert(out.pixels.toSeq.map(_ & 0xFF) == Seq(
      (10 + 20 + 50 + 60 + 2) / 4, (30 + 40 + 70 + 80 + 2) / 4,
      (90 + 100 + 130 + 140 + 2) / 4, (110 + 120 + 150 + 160 + 2) / 4))
    // identity resize is lossless
    assert(java.util.Arrays.equals(PngCodec.resizeBox(src, 4, 4).pixels, src.pixels))
    // upscale then check every output maps to its unique source pixel
    val up = PngCodec.resizeBox(Image(2, 1, 1, Array[Byte](100, (200 & 0xFF).toByte)), 4, 1)
    assert(up.pixels.toSeq.map(_ & 0xFF) == Seq(100, 100, 200, 200))
  }

  test("Adam7 interlaced PNGs from the JDK's progressive writer decode to identical pixels") {
    // odd dims exercise edge passes; every channel count
    for ((w, h, tpe, ch) <- Seq((13, 11, BufferedImage.TYPE_3BYTE_BGR, 3),
      (21, 7, BufferedImage.TYPE_BYTE_GRAY, 1),
      (8, 8, BufferedImage.TYPE_4BYTE_ABGR, 4),
      (1, 9, BufferedImage.TYPE_BYTE_GRAY, 1),
      (9, 1, BufferedImage.TYPE_3BYTE_BGR, 3))) {
      val img = new BufferedImage(w, h, tpe)
      val px = detPixels(w * h * ch, seed = w * 131 + h)
      // grey writes through the raster: setRGB would colorspace-convert
      for (y <- 0 until h; x <- 0 until w) {
        val i = (y * w + x) * ch
        if (ch == 1) img.getRaster.setSample(x, y, 0, px(i) & 0xFF)
        else {
          val a = if (ch == 4) px(i + 3) & 0xFF else 255
          img.setRGB(x, y, (a << 24) | ((px(i) & 0xFF) << 16) |
            ((px(i + 1) & 0xFF) << 8) | (px(i + 2) & 0xFF))
        }
      }
      val bos = new java.io.ByteArrayOutputStream()
      val writer = ImageIO.getImageWritersByFormatName("png").next()
      val ios = ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT) // Adam7
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      writer.dispose(); ios.close()
      val bytes = bos.toByteArray
      assert((bytes(28) & 0xFF) == 1, s"${w}x$h not actually interlaced")
      val ours = PngCodec.decode(bytes)
      assert(ours.isDefined, s"${w}x$h ch=$ch interlaced decode failed")
      assert(ours.get.width == w && ours.get.height == h && ours.get.channels == ch)
      assert(java.util.Arrays.equals(ours.get.pixels, px), s"${w}x$h ch=$ch pixels")
    }
  }

  test("16-bit greyscale reduces to the high byte (the spec's depth rescaling)") {
    val w = 17; val h = 5
    val img = new BufferedImage(w, h, BufferedImage.TYPE_USHORT_GRAY)
    val raster = img.getRaster
    val vals = Array.tabulate(w * h)(i => (i * 2749 + 11) % 65536)
    for (y <- 0 until h; x <- 0 until w) raster.setSample(x, y, 0, vals(y * w + x))
    val bos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", bos))
    val ours = PngCodec.decode(bos.toByteArray)
    assert(ours.isDefined && ours.get.channels == 1)
    val got = ours.get.pixels
    vals.indices.foreach(i =>
      assert((got(i) & 0xFF) == (vals(i) >> 8), s"sample $i"))
  }

  test("sub-byte depths: 1-bit binary and 4-bit palette PNGs decode") {
    // 1-bit: TYPE_BYTE_BINARY (the JDK writes depth-1 PNG)
    val w = 19; val h = 6
    val bin = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_BINARY)
    for (y <- 0 until h; x <- 0 until w)
      bin.setRGB(x, y, if ((x * 7 + y * 3) % 5 < 2) 0xFFFFFF else 0)
    val bos1 = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(bin, "png", bos1))
    assert((bos1.toByteArray()(24) & 0xFF) == 1, "not depth 1")
    val ours1 = PngCodec.decode(bos1.toByteArray)
    assert(ours1.isDefined, "1-bit decode failed")
    val im1 = ours1.get
    for (y <- 0 until h; x <- 0 until w) {
      val want = if ((x * 7 + y * 3) % 5 < 2) 255 else 0
      val at = (y * w + x) * im1.channels
      assert((im1.pixels(at) & 0xFF) == want, s"1-bit ($x,$y)")
    }
    // 4-bit palette via IndexColorModel (16 grey entries)
    val greys = Array.tabulate(16)(i => (i * 17).toByte)
    val icm = new java.awt.image.IndexColorModel(4, 16, greys, greys, greys)
    val pal = new BufferedImage(23, 9, BufferedImage.TYPE_BYTE_BINARY, icm)
    for (y <- 0 until 9; x <- 0 until 23) {
      val v = (x + y * 5) % 16
      pal.setRGB(x, y, (v * 17 << 16) | (v * 17 << 8) | (v * 17))
    }
    val bos4 = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(pal, "png", bos4))
    assert((bos4.toByteArray()(24) & 0xFF) == 4, "not depth 4")
    val ours4 = PngCodec.decode(bos4.toByteArray)
    assert(ours4.isDefined, "4-bit decode failed")
    val im4 = ours4.get
    // a grey-ramp palette may be written as palette (3ch out) OR as
    // depth-4 greyscale (1ch, spec-scaled *17) — both must agree
    for (y <- 0 until 9; x <- 0 until 23) {
      val v = ((x + y * 5) % 16) * 17
      val at = (y * 23 + x) * im4.channels
      assert((im4.pixels(at) & 0xFF) == v, s"4-bit ($x,$y) ch=${im4.channels}")
    }
  }
}

/** Deterministic fuzz over every real codec: at 100 TB some payloads
  * WILL be arbitrary garbage, and a decode task must refuse (None),
  * never die. 2000 pseudo-random byte arrays per codec, plus
  * signature-prefixed garbage (passes the magic check, then turns to
  * noise — the hard path) and truncations of valid files at every
  * offset.
  */
class CodecFuzzSpec extends AnyFunSuite {

  private def rndBytes(n: Int, seed: Long): Array[Byte] = {
    val out = new Array[Byte](n)
    var s = seed
    var i = 0
    while (i < n) { s = s * 6364136223846793005L + 1442695040888963407L; out(i) = (s >>> 33).toByte; i += 1 }
    out
  }

  private val codecs: Seq[(String, Array[Byte] => Any)] = Seq(
    ("png", graft.ops.PngCodec.decode _),
    ("gif", graft.ops.GifCodec.decode _),
    ("mp4", graft.ops.Mp4.parse _),
    ("wav-header", (p: Array[Byte]) => graft.ops.Multimodal.AudioHeader.parse(p)),
    ("wav-pcm", graft.ops.AudioPcm.decode _),
    ("image-header", (p: Array[Byte]) => graft.ops.Multimodal.ImageHeader.parse(p)))

  test("random garbage never throws in any codec") {
    for ((name, decode) <- codecs; i <- 0 until 2000) {
      val n = (i * 37) % 512
      try decode(rndBytes(n, seed = name.hashCode.toLong * 100003 + i))
      catch { case e: Throwable => fail(s"$name threw on fuzz case $i (len $n): $e") }
    }
  }

  test("signature-prefixed garbage never throws") {
    val sigs = Seq(
      "png" -> Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte),
      "gif" -> "GIF89a".getBytes("US-ASCII"),
      "wav" -> ("RIFF".getBytes("US-ASCII") ++ Array.fill(4)(0x7F.toByte) ++
        "WAVE".getBytes("US-ASCII")),
      "mp4" -> (Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes("US-ASCII") ++
        Array.fill(4)(0.toByte)),
      "jpeg" -> Array(0xFF, 0xD8).map(_.toByte))
    for ((sname, sig) <- sigs; (cname, decode) <- codecs; i <- 0 until 300) {
      val body = rndBytes(64 + (i * 13) % 256, seed = sname.hashCode.toLong * 7919 + i)
      try decode(sig ++ body)
      catch { case e: Throwable => fail(s"$cname threw on $sname-prefixed fuzz $i: $e") }
    }
  }

  test("every truncation of a valid file refuses cleanly in every codec") {
    val png = graft.ops.PngCodec.encode(
      graft.ops.PngCodec.Image(9, 7, 3, rndBytes(9 * 7 * 3, 5)))
    for ((name, decode) <- codecs; cut <- 0 until png.length)
      try decode(png.take(cut))
      catch { case e: Throwable => fail(s"$name threw on png truncated at $cut: $e") }
  }
}

/** Real GIF decoder: validated exclusively against ImageIO-written
  * fixtures — this repo has no GIF encoder, so every test byte comes
  * from an independent implementation.
  */
class GifSpec extends AnyFunSuite {

  private def detBytes(n: Int, seed: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var s = seed.toLong
    var i = 0
    while (i < n) { s = s * 6364136223846793005L + 1442695040888963407L; out(i) = (s >>> 33).toByte; i += 1 }
    out
  }

  private def greyGif(px: Array[Byte], w: Int, h: Int, interlaced: Boolean = false): Array[Byte] = {
    val grey = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grey, grey, grey)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm)
    img.getRaster.setDataElements(0, 0, w, h, px)
    val bos = new java.io.ByteArrayOutputStream()
    if (!interlaced) assert(ImageIO.write(img, "gif", bos))
    else {
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val out = ImageIO.createImageOutputStream(bos)
      writer.setOutput(out)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      out.close(); writer.dispose()
    }
    bos.toByteArray
  }

  test("ImageIO-written greyscale GIFs decode to exact pixel triplets") {
    for ((w, h, seed) <- Seq((32, 9, 1), (7, 5, 2), (1, 1, 3), (64, 64, 4))) {
      val px = detBytes(w * h, seed)
      val out = graft.ops.GifCodec.decode(greyGif(px, w, h))
      assert(out.isDefined, s"${w}x$h failed")
      val img = out.get
      assert(img.width == w && img.height == h && img.channels == 3)
      for (k <- 0 until w * h; c <- 0 until 3)
        assert(img.pixels(3 * k + c) == px(k), s"pixel $k ch $c (${w}x$h)")
    }
  }

  test("interlaced GIFs deinterlace to the same pixels") {
    val w = 16; val h = 19 // odd height exercises all four passes
    val px = detBytes(w * h, 7)
    val plain = graft.ops.GifCodec.decode(greyGif(px, w, h)).get
    val inter = graft.ops.GifCodec.decode(greyGif(px, w, h, interlaced = true))
    assert(inter.isDefined, "interlaced GIF failed to decode")
    assert(java.util.Arrays.equals(inter.get.pixels, plain.pixels))
  }

  test("color-palette GIFs expand through the color table") {
    val r = Array[Byte](10, 110.toByte, 210.toByte, 0)
    val g = Array[Byte](20, 120.toByte, 220.toByte, 0)
    val b = Array[Byte](30, 130.toByte, 230.toByte, 0)
    val cm = new java.awt.image.IndexColorModel(8, 4, r, g, b)
    val img = new BufferedImage(3, 2, BufferedImage.TYPE_BYTE_INDEXED, cm)
    for (y <- 0 until 2; x <- 0 until 3) img.getRaster.setSample(x, y, 0, (x + y) % 3)
    val bos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(img, "gif", bos))
    val out = graft.ops.GifCodec.decode(bos.toByteArray)
    assert(out.isDefined && out.get.channels == 3)
    val p = out.get.pixels
    // pixel (0,0) = index 0 → (10,20,30); (1,0) = index 1 → (110,120,130)
    assert((p(0) & 0xFF, p(1) & 0xFF, p(2) & 0xFF) == ((10, 20, 30)))
    assert((p(3) & 0xFF, p(4) & 0xFF, p(5) & 0xFF) == ((110, 120, 130)))
  }

  test("hostile and truncated GIF bytes return None, never throw") {
    val good = greyGif(detBytes(64, 9), 8, 8)
    assert(graft.ops.GifCodec.decode(Array.emptyByteArray).isEmpty)
    assert(graft.ops.GifCodec.decode("GIF89a but nonsense".getBytes).isEmpty)
    for (cut <- Seq(5, 13, 20, good.length / 2, good.length - 2))
      assert(graft.ops.GifCodec.decode(good.take(cut)).isEmpty, s"truncated at $cut")
    // corrupt the LZW stream body → decode must fail closed, not throw
    val corrupt = good.clone()
    for (i <- good.length - 12 until good.length - 2)
      corrupt(i) = (corrupt(i) ^ 0xA5).toByte
    assert(graft.ops.GifCodec.decode(corrupt).isEmpty ||
      graft.ops.GifCodec.decode(corrupt).get.pixels.length == 3 * 64)
    // hostile dims: hand-crafted GIF whose image descriptor claims
    // 65535×65535 (12.9 GB of pixels) — the cap must refuse BEFORE
    // allocating anything
    val huge = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](8, 0, 8, 0, 0x80.toByte, 0, 0) ++          // screen descriptor, GCT of 2
      Array[Byte](0, 0, 0, 255.toByte, 255.toByte, 255.toByte) ++ // 2-entry palette
      Array[Byte](0x2C, 0, 0, 0, 0,                          // image descriptor at (0,0)
        0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte,  // 65535 × 65535
        0) ++
      Array[Byte](2, 1, 0x4C, 0)                             // min code 2 + tiny lzw + terminator
    assert(graft.ops.GifCodec.decode(huge).isEmpty)
  }
}

/** Spark-side seam tests for the real PNG path (separate class so the
  * pure-codec suite above never starts a session).
  */
class PngSeamSpec extends SparkSuite {
  import spark.implicits._

  test("packTextPng → decodeImagePixels round-trips text bytes through real PNGs") {
    val docs = Seq(
      (1L, "hello png world"),
      (2L, "a" * 100),            // multi-row image, padded tail
      (3L, ""),                   // empty → one zero row
      (4L, "exactly thirty-two bytes wide!!!")) // = 32 bytes, no pad
      .toDF("doc_id", "text")
    val out = Multimodal.decodeImagePixels(
      Multimodal.packTextPng(docs, "doc_id", "text", width = 32), "id", "media")
      .collect().map(r => r.getLong(0) -> r).toMap
    for ((id, text) <- Seq(1L -> "hello png world", 2L -> ("a" * 100), 3L -> "",
        4L -> "exactly thirty-two bytes wide!!!")) {
      val bytes = text.getBytes("UTF-8")
      val h = math.max(1, (bytes.length + 31) / 32)
      val padded = java.util.Arrays.copyOf(bytes, 32 * h)
      var hh = 17L; var sum = 0L
      padded.foreach { b => hh = (31L * hh + (b & 0xFF)) % 16777216L; sum += b & 0xFF }
      val r = out(id)
      assert(r.getInt(1) == 32 && r.getInt(2) == h && r.getInt(3) == 1, s"doc $id dims")
      assert(r.getLong(4) == 32L * h && r.getLong(5) == sum && r.getLong(6) == hh, s"doc $id stats")
    }
  }

  test("packTextGif → decodeImagePixels round-trips text bytes through ImageIO GIFs") {
    val docs = Seq((1L, "gif pixels here"), (2L, "b" * 70), (3L, ""))
      .toDF("doc_id", "text")
    val out = Multimodal.decodeImagePixels(
      Multimodal.packTextGif(docs, "doc_id", "text", width = 32), "id", "media")
      .collect().map(r => r.getLong(0) -> r).toMap
    for ((id, text) <- Seq(1L -> "gif pixels here", 2L -> ("b" * 70), 3L -> "")) {
      val bytes = text.getBytes("UTF-8")
      val h = math.max(1, (bytes.length + 31) / 32)
      val padded = java.util.Arrays.copyOf(bytes, 32 * h)
      var hh = 17L; var sum = 0L
      padded.foreach { b =>
        // decoded channels are greyscale triplets (v, v, v)
        for (_ <- 0 until 3) { hh = (31L * hh + (b & 0xFF)) % 16777216L; sum += b & 0xFF }
      }
      val r = out(id)
      assert(r.getInt(1) == 32 && r.getInt(2) == h && r.getInt(3) == 3, s"doc $id dims")
      assert(r.getLong(4) == 96L * h && r.getLong(5) == sum && r.getLong(6) == hh, s"doc $id stats")
    }
  }

  test("packTextWav → decodeAudioFeatures round-trips text bytes as PCM samples") {
    val docs = Seq((1L, "abc"), (2L, ""), (3L, " ")).toDF("doc_id", "text")
    val out = Multimodal.decodeAudioFeatures(
      Multimodal.packTextWav(docs, "doc_id", "text"), "id", "media")
      .collect().map(r => r.getLong(0) -> r).toMap
    // "abc" = bytes 97,98,99 → samples (b-128)*256 = -7936,-7680,-7424
    val r1 = out(1L)
    assert(r1.getInt(1) == 1 && r1.getInt(2) == 8000 && r1.getInt(3) == 8)
    assert(r1.getLong(4) == 3 && r1.getLong(5) == 7936)
    assert(r1.getLong(6) == 7936L * 7936 + 7680L * 7680 + 7424L * 7424)
    assert(r1.getLong(7) == 0) // all negative, no crossings
    val r2 = out(2L)
    assert(r2.getLong(4) == 0 && r2.getLong(5) == 0 && r2.getLong(6) == 0 && r2.getLong(7) == 0)
    // bytes 0 (neg) then 127 (neg): still no crossing; byte < 128 ⟺ negative
    assert(out(3L).getLong(7) == 0)
  }

  test("PngResizer really resamples PNG payloads; non-PNG falls back to stand-in") {
    val png = PngCodec.encode(Image(8, 8, 1, Array.tabulate(64)(i => (i * 4).toByte)))
    val media = Seq((1L, png), (2L, "definitely not a png".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
      .select(col("doc_id"), struct(col("payload"), lit("image/png").as("mime"),
        struct(octet_length(col("payload")).cast("long").as("byte_len"),
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
          lit(null).cast("long").as("duration_ms")).as("meta")).as("media"))
    val out = Multimodal.resize(media, "doc_id", "media", 4, 4,
        resizer = new Multimodal.PngResizer())
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    val resized = PngCodec.decode(out(1L))
    assert(resized.isDefined && resized.get.width == 4 && resized.get.height == 4)
    assert(java.util.Arrays.equals(resized.get.pixels,
      PngCodec.resizeBox(Image(8, 8, 1, Array.tabulate(64)(i => (i * 4).toByte)), 4, 4).pixels))
    assert(PngCodec.decode(out(2L)).isEmpty) // fallback output isn't a PNG
  }

  test("resizeBilinear: hand-computed taps, identity, edge clamp, channels") {
    // 2x2 [0 255 / 255 0] -> 4x4: corners clamp to the sources, the
    // interior mixes with quarter weights (hand math: e.g. (1,1) =
    // (3*3*0 + 1*3*255 + 3*1*255 + 1*1*0 + 8)/16 = 96)
    val src = Image(2, 2, 1, Array[Byte](0, -1, -1, 0)) // 0,255,255,0
    val up = PngCodec.resizeBilinear(src, 4, 4)
    def px(x: Int, y: Int) = up.pixels(y * 4 + x) & 0xFF
    assert(px(0, 0) == 0 && px(3, 0) == 255 && px(0, 3) == 255 && px(3, 3) == 0)
    assert(px(1, 1) == 96 && px(2, 2) == 96)
    assert(px(2, 1) == (1 * 3 * 0 + 3 * 3 * 255 + 1 * 1 * 255 + 3 * 1 * 0 + 8) / 16)
    // identity dimensions copy exactly (fx = fy = 0 everywhere)
    val any = Image(3, 2, 1, Array.tabulate(6)(i => (i * 40).toByte))
    assert(java.util.Arrays.equals(PngCodec.resizeBilinear(any, 3, 2).pixels, any.pixels))
    // single-pixel source replicates everywhere
    val one = PngCodec.resizeBilinear(Image(1, 1, 1, Array[Byte](7)), 3, 3)
    assert(one.pixels.forall(_ == 7))
    // RGB: channels resample independently
    val rgb = Image(2, 1, 3, Array[Byte](0, 100, -56, 100, 0, 56)) // 200/56 unsigned
    val r2 = PngCodec.resizeBilinear(rgb, 4, 1)
    assert((r2.pixels(0) & 0xFF, r2.pixels(1) & 0xFF, r2.pixels(2) & 0xFF) == ((0, 100, 200)))
    assert((r2.pixels(9) & 0xFF, r2.pixels(10) & 0xFF, r2.pixels(11) & 0xFF) == ((100, 0, 56)))
    // downscale is bounded by the source range
    val down = PngCodec.resizeBilinear(src, 3, 3)
    assert(down.pixels.forall(p => (p & 0xFF) <= 255))
  }
}
