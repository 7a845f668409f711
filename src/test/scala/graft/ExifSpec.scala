package graft

import org.apache.spark.sql.functions._

import graft.ops.{Exif, JpegCodec, JpegEncoder, PngCodec}

/** EXIF reader/writer/scrubber: both byte orders, the
  * value-or-offset rule, GPS reduction, the rebuild-not-patch strip
  * contract, and hostile bytes. */
class ExifSpec extends SparkSuite {
  import spark.implicits._

  private def baseJpeg(seed: Int): Array[Byte] = {
    val px = new Array[Byte](64)
    var i = 0
    while (i < 64) { px(i) = ((seed + i * 7) % 256).toByte; i += 1 }
    JpegEncoder.encode(PngCodec.Image(8, 8, 1, px))
  }

  private val gps = Exif.GpsCoord("N", Seq((51L, 1L), (30L, 1L), (1234L, 100L)),
    "W", Seq((0L, 1L), (7L, 1L), (5678L, 100L)))

  test("writer -> reader round trip, both byte orders, inline and offset ASCII") {
    for (le <- Seq(true, false)) {
      // "Mk" + NUL = 3 bytes -> INLINE value; the others go to the data area
      val app1 = Exif.exifApp1(le, orientation = 6, make = "Mk",
        model = "Model X", datetime = "2024:01:02 03:04:05", gps = Some(gps))
      val jpeg = Exif.insertApp1(baseJpeg(1), app1)
      val m = Exif.findExif(jpeg).flatMap(Exif.parseTiff).get
      assert(m.endian == (if (le) "II" else "MM"))
      assert(m.orientation.contains(6))
      assert(m.make.contains("Mk") && m.model.contains("Model X"))
      assert(m.datetime.contains("2024:01:02 03:04:05"))
      // 51 + 30/60 + 12.34/3600 ; lon ref W negates
      assert(math.abs(m.lat.get - (51.0 + 0.5 + 12.34 / 3600)) < 1e-9)
      assert(math.abs(m.lon.get - -(0.0 + 7.0 / 60 + 56.78 / 3600)) < 1e-9)
      // the image itself still decodes with the APP1 in place
      assert(JpegCodec.decode(jpeg).isDefined)
    }
  }

  test("webp EXIF chunk: both wire variants (bare TIFF and Exif-prefixed) decode") {
    for (prefixed <- Seq(false, true)) {
      val app1 = Exif.exifApp1(le = true, orientation = 3, make = "Mk",
        model = "WebP M", datetime = "2023:05:06 07:08:09", gps = Some(gps))
      val tiff = java.util.Arrays.copyOfRange(app1, 10, app1.length)
      val body = if (prefixed) "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
                 else tiff
      val green = Array.tabulate(16)(i => (i * 9).toByte)
      val inner = graft.ops.WebpCodec.chunkBytes("VP8X",
        { val v = new Array[Byte](10); v(0) = 0x08; v(4) = 3; v(7) = 3; v }) ++
        graft.ops.WebpCodec.chunkBytes("VP8L",
          graft.ops.WebpCodec.encodeGreenPayload(4, 4, green)) ++
        graft.ops.WebpCodec.chunkBytes("EXIF", body)
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes("US-ASCII"))
      val sz = 4 + inner.length
      out.write(sz & 0xFF); out.write((sz >> 8) & 0xFF)
      out.write((sz >> 16) & 0xFF); out.write((sz >> 24) & 0xFF)
      out.write("WEBP".getBytes("US-ASCII")); out.write(inner)
      val webp = out.toByteArray
      val m = Exif.findExif(webp).flatMap(Exif.parseTiff)
        .getOrElse(fail(s"refused (prefixed=$prefixed)"))
      assert(m.orientation.contains(3) && m.model.contains("WebP M"))
      assert(m.datetime.contains("2023:05:06 07:08:09") && m.lat.isDefined)
      // the image itself still decodes with the EXIF chunk in place
      assert(graft.ops.WebpCodec.decode(webp).isDefined)
    }
  }

  test("stripGps: rebuild keeps safe tags, removes coordinates, image survives") {
    val app1 = Exif.exifApp1(le = true, 3, "Maker", "Model", "2020:06:07 08:09:10", Some(gps))
    val jpeg = Exif.insertApp1(baseJpeg(2), app1)
    val stripped = Exif.stripGps(jpeg)
    assert(!java.util.Arrays.equals(stripped, jpeg))
    val m = Exif.findExif(stripped).flatMap(Exif.parseTiff).get
    assert(m.lat.isEmpty && m.lon.isEmpty)
    assert(m.orientation.contains(3) && m.make.contains("Maker") &&
      m.datetime.contains("2020:06:07 08:09:10"))
    assert(JpegCodec.decode(stripped).isDefined)
    // the coordinate BYTES are gone, not just the pointer: no 12.34s
    // rational (1234/100) survives anywhere in the file
    assert(Exif.stripGps(stripped).toSeq == stripped.toSeq) // idempotent, byte-identical
  }

  test("stripGps: no-GPS and no-Exif inputs pass through byte-identical") {
    val noGps = Exif.insertApp1(baseJpeg(3),
      Exif.exifApp1(le = false, 1, "M", "N", "2021:01:01 00:00:00", None))
    assert(Exif.stripGps(noGps) eq noGps)
    val plain = baseJpeg(4)
    assert(Exif.stripGps(plain) eq plain)
  }

  test("stripGps: unparseable Exif is dropped whole (privacy-safe default)") {
    val app1 = Exif.exifApp1(le = true, 1, "M", "N", "2022:02:02 02:02:02", Some(gps))
    // corrupt the TIFF magic inside the APP1 (offset: FFE1 len Exif\0\0 II [magic])
    val jpeg = Exif.insertApp1(baseJpeg(5), app1)
    jpeg(12) = 99
    assert(Exif.findExif(jpeg).flatMap(Exif.parseTiff).isEmpty)
    val stripped = Exif.stripGps(jpeg)
    assert(Exif.findExif(stripped).isEmpty) // APP1 gone entirely
    assert(JpegCodec.decode(stripped).isDefined)
  }

  test("stripGps: rebuild past the 16-bit APP1 bound falls back to drop-whole") {
    // hostile shape: large-but-legal make/model whose COUNT fields are
    // then inflated so the entries overlap the rest of the data area —
    // each read stays in-bounds (ascii truncates at the TIFF end), but
    // the rebuilt strings sum past 65535, which would wrap the APP1
    // length field. The scrub must take the drop-whole-APP1 path, not
    // emit a corrupt JPEG.
    val app1 = Exif.exifApp1(le = true, 1, "A" * 30000, "B" * 30000,
      "2022:02:02 02:02:02", Some(gps))
    def patch(tagLo: Int, tagHi: Int, count: Int, offset: Int): Unit = {
      var i = 0
      var done = false
      while (!done && i + 12 < app1.length) {
        if ((app1(i) & 0xFF) == tagLo && (app1(i + 1) & 0xFF) == tagHi &&
          (app1(i + 2) & 0xFF) == 2 && (app1(i + 3) & 0xFF) == 0) {
          var k = 0
          while (k < 4) { app1(i + 4 + k) = ((count >> (8 * k)) & 0xFF).toByte; k += 1 }
          if (offset >= 0) {
            k = 0
            while (k < 4) { app1(i + 8 + k) = ((offset >> (8 * k)) & 0xFF).toByte; k += 1 }
          }
          done = true
        }
        i += 1
      }
      assert(done, s"entry $tagHi$tagLo not found")
    }
    // both entries stay in-bounds individually (the IFD walk enforces
    // o + size <= tiff length) but OVERLAP the same region
    patch(0x0F, 0x01, 45000, -1)  // make: count inflated, offset kept
    patch(0x10, 0x01, 45000, 200) // model: re-aimed into make's area
    val jpeg = Exif.insertApp1(baseJpeg(6), app1)
    // the hostile segment still parses (each entry in-bounds)...
    val m = Exif.findExif(jpeg).flatMap(Exif.parseTiff).get
    assert(m.make.get.length + m.model.get.length > 66000)
    // ...but the scrub refuses to rebuild an over-long APP1
    val stripped = Exif.stripGps(jpeg)
    assert(Exif.findExif(stripped).isEmpty, "oversize rebuild must drop the APP1 whole")
    assert(JpegCodec.decode(stripped).isDefined)
  }

  test("applyOrientation: all eight maps on a hand image, involution pairs") {
    // 2x3 gray image, pixels numbered row-major:
    //   0 1
    //   2 3
    //   4 5
    val img = PngCodec.Image(2, 3, 1, Array[Byte](0, 1, 2, 3, 4, 5))
    def px(i: PngCodec.Image) = i.pixels.toSeq.map(_.toInt)
    def o(n: Int) = Exif.applyOrientation(img, n)
    assert(o(1) eq img)
    assert((o(2).width, px(o(2))) == ((2, Seq(1, 0, 3, 2, 5, 4))))        // mirror H
    assert((o(3).width, px(o(3))) == ((2, Seq(5, 4, 3, 2, 1, 0))))        // rotate 180
    assert((o(4).width, px(o(4))) == ((2, Seq(4, 5, 2, 3, 0, 1))))        // mirror V
    assert((o(5).width, px(o(5))) == ((3, Seq(0, 2, 4, 1, 3, 5))))        // transpose
    assert((o(6).width, px(o(6))) == ((3, Seq(4, 2, 0, 5, 3, 1))))        // rotate 90 CW
    assert((o(7).width, px(o(7))) == ((3, Seq(5, 3, 1, 4, 2, 0))))        // transverse
    assert((o(8).width, px(o(8))) == ((3, Seq(1, 3, 5, 0, 2, 4))))        // rotate 270 CW
    // self-inverse transforms: 2, 3, 4, 5, 7 applied twice = identity
    for (n <- Seq(2, 3, 4, 5, 7))
      assert(px(Exif.applyOrientation(o(n), n)) == px(img), s"o=$n")
    // 6 then 8 = identity (90 CW then 90 CCW)
    assert(px(Exif.applyOrientation(o(6), 8)) == px(img))
    // multi-channel: channels move together
    val rgb = PngCodec.Image(2, 1, 3, Array[Byte](10, 11, 12, 20, 21, 22))
    assert(px(Exif.applyOrientation(rgb, 2)) == Seq(20, 21, 22, 10, 11, 12))
    // out-of-range orientation: pass-through (the spec default)
    assert(Exif.applyOrientation(img, 0) eq img)
    assert(Exif.applyOrientation(img, 9) eq img)
  }

  test("hostile bytes: truncation and junk report has_exif = false, never throw") {
    val rows = Seq(
      (1L, Array[Byte](1, 2, 3)),
      (2L, baseJpeg(6).take(3)),
      (3L, null: Array[Byte]),
      (4L, baseJpeg(7))).toDF("doc_id", "payload")
    val got = Exif.decodeMeta(rows, "doc_id", "payload")
      .select($"id", $"has_exif").as[(Long, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, false), (2L, false), (3L, false), (4L, false)))
    val rnd = new scala.util.Random(3)
    (1 to 100).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(128)); rnd.nextBytes(b)
      Exif.stripGps(if (b.length >= 2) { b(0) = 0xFF.toByte; b(1) = 0xD8.toByte; b } else b)
      Exif.findExif(b).flatMap(Exif.parseTiff) // must not throw
    }
  }
}
