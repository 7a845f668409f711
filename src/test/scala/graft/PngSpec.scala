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
}
