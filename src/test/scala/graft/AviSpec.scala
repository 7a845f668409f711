package graft

import graft.ops.{AviCodec, JpegCodec, JpegEncoder, Multimodal, PngCodec}
import org.apache.spark.sql.functions._

/** From-spec AVI/MJPEG codec: demux pinned against an INDEPENDENT
  * hand-written RIFF fixture (separate byte-assembly code, written
  * from the Microsoft AVI RIFF reference), round-trips, hostile-byte
  * fuzzing, and the distributed frame-decode operator.
  */
class AviSpec extends SparkSuite {
  import spark.implicits._

  // ---- independent fixture writer (no AviCodec code) ----

  private def leBytes(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >> (8 * i)) & 0xFF).toByte).toArray

  /** Assemble an AVI by hand: explicit byte concatenation, sizes
    * computed by a different method (child-first) than the encoder's
    * arithmetic. */
  private def handAvi(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ leBytes(body.length.toLong, 4) ++ body ++
        (if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ body)
    val avih = chunk("avih",
      leBytes(40000, 4) ++ leBytes(0, 4) ++ leBytes(0, 4) ++ leBytes(0x10, 4) ++
        leBytes(frames.length.toLong, 4) ++ leBytes(0, 4) ++ leBytes(1, 4) ++
        leBytes(0, 4) ++ leBytes(w.toLong, 4) ++ leBytes(h.toLong, 4) ++ new Array[Byte](16))
    val strh = chunk("strh",
      "vids".getBytes("US-ASCII") ++ "MJPG".getBytes("US-ASCII") ++
        leBytes(0, 4) ++ leBytes(0, 4) ++ leBytes(0, 4) ++
        leBytes(1, 4) ++ leBytes(25, 4) ++ leBytes(0, 4) ++
        leBytes(frames.length.toLong, 4) ++ leBytes(0, 4) ++
        leBytes(0xFFFFFFFFL, 4) ++ leBytes(0, 4) ++
        leBytes(0, 2) ++ leBytes(0, 2) ++ leBytes(w.toLong, 2) ++ leBytes(h.toLong, 2))
    val strf = chunk("strf",
      leBytes(40, 4) ++ leBytes(w.toLong, 4) ++ leBytes(h.toLong, 4) ++
        leBytes(1, 2) ++ leBytes(24, 2) ++ "MJPG".getBytes("US-ASCII") ++
        leBytes(w.toLong * h * 3, 4) ++ new Array[Byte](16))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ leBytes(body.length.toLong, 4) ++ body
  }

  private def grayFrame(w: Int, h: Int, shift: Int): PngCodec.Image = {
    val px = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      px(y * w + x) = (((x * 255) / math.max(1, w - 1) +
        (y * 255) / math.max(1, h - 1)) / 2 / 2 + shift).toByte
    PngCodec.Image(w, h, 1, px)
  }

  test("demux parses an independently hand-written AVI") {
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5, 6, 7), Array[Byte](8))
    val avi = handAvi(320, 240, frames)
    val info = AviCodec.demux(avi).getOrElse(fail("demux declined hand-written AVI"))
    assert(info.width == 320 && info.height == 240)
    assert(info.usPerFrame == 40000 && info.handler == "MJPG")
    assert(info.declaredFrames == 3 && info.frames.length == 3)
    info.frames.zip(frames).foreach { case ((off, len), expect) =>
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(avi, off, off + len), expect))
    }
  }

  test("encode → demux round-trip recovers every frame byte-for-byte") {
    val frames = Seq(
      JpegEncoder.encode(grayFrame(16, 16, 0), 90),
      JpegEncoder.encode(grayFrame(16, 16, 40), 90),
      JpegEncoder.encode(grayFrame(16, 16, 80), 90))
    val avi = AviCodec.encode(16, 16, fps = 25, frames)
    val info = AviCodec.demux(avi).getOrElse(fail("demux declined own encoding"))
    assert(info.width == 16 && info.height == 16 && info.usPerFrame == 40000)
    assert(info.frames.length == 3)
    info.frames.zip(frames).foreach { case ((off, len), expect) =>
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(avi, off, off + len), expect))
    }
    // odd-length frames exercise the word-alignment pad
    val odd = frames.map(f => java.util.Arrays.copyOf(f, f.length | 1))
    val avi2 = AviCodec.encode(16, 16, 25, odd)
    assert(AviCodec.demux(avi2).get.frames.map(_._2) == odd.map(_.length).toVector)
  }

  test("MJPEG frames mux/demux/decode against the independent ImageIO encoder") {
    // frames encoded by the JDK (independent of JpegEncoder), muxed,
    // demuxed, decoded by our from-spec JpegCodec
    import javax.imageio.{ImageIO, ImageWriteParam, IIOImage}
    def imageioJpeg(img: PngCodec.Image): Array[Byte] = {
      val bi = new java.awt.image.BufferedImage(
        img.width, img.height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until img.height; x <- 0 until img.width)
        bi.getRaster.setSample(x, y, 0, img.pixels(y * img.width + x) & 0xFF)
      val w = ImageIO.getImageWritersByFormatName("jpeg").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      w.setOutput(ios)
      val p = w.getDefaultWriteParam
      p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(0.95f)
      w.write(null, new IIOImage(bi, null, null), p)
      ios.close(); w.dispose()
      bos.toByteArray
    }
    val sources = (0 until 3).map(i => grayFrame(24, 16, i * 30))
    val avi = AviCodec.encode(24, 16, 30, sources.map(imageioJpeg))
    val info = AviCodec.demux(avi).get
    info.frames.zip(sources).foreach { case ((off, len), src) =>
      val img = JpegCodec.decode(java.util.Arrays.copyOfRange(avi, off, off + len))
        .getOrElse(fail("JpegCodec declined an ImageIO frame"))
      assert(img.width == 24 && img.height == 16)
      val maxDiff = img.pixels.zip(src.pixels).map { case (a, b) =>
        math.abs((a & 0xFF) - (b & 0xFF))
      }.max
      assert(maxDiff <= 4, s"decoded frame drifted: max diff $maxDiff")
    }
  }

  test("hostile bytes never throw: truncation, bit flips, lying sizes") {
    val good = AviCodec.encode(16, 16, 25,
      Seq(JpegEncoder.encode(grayFrame(16, 16, 0), 85)))
    // truncations at every prefix length (stride for speed)
    (0 until good.length by 7).foreach { n =>
      AviCodec.demux(java.util.Arrays.copyOf(good, n)) // must not throw
    }
    // single-byte corruption across the header region
    (0 until math.min(good.length, 200)).foreach { i =>
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x55).toByte
      AviCodec.demux(bad) // must not throw
    }
    // lying chunk size: claim more than the file holds
    val lying = good.clone()
    lying(4) = -1; lying(5) = -1; lying(6) = -1; lying(7) = 0x7F
    AviCodec.demux(lying)
    assert(AviCodec.demux("RIFFxxxxAVI ".getBytes("US-ASCII")).isEmpty)
    assert(AviCodec.demux(Array.emptyByteArray).isEmpty)
    assert(AviCodec.demux(new Array[Byte](64)).isEmpty)
  }

  test("deeply nested LIST headers are rejected, not a StackOverflowError") {
    // ~90k nested `LIST hdrl` shells: each level is a 12-byte header
    // whose declared size covers everything inside it. Recursion per
    // level would blow the stack PAST the RuntimeException net; the
    // depth cap must turn this into a clean None.
    val depth = 90000
    val out = new java.io.ByteArrayOutputStream()
    val innerLevels = depth
    val totalNested = 12 * innerLevels // each level: LIST + size + type
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(leBytes(4L + totalNested, 4))
    out.write("AVI ".getBytes("US-ASCII"))
    var remaining = totalNested
    (0 until innerLevels).foreach { _ =>
      out.write("LIST".getBytes("US-ASCII"))
      out.write(leBytes((remaining - 8).toLong, 4)) // body = type + children
      out.write("hdrl".getBytes("US-ASCII"))
      remaining -= 12
    }
    assert(AviCodec.demux(out.toByteArray).isEmpty)
  }

  test("decodeMjpegFrames: stride, non-AVI exclusion, real pixel stats") {
    val docs = Seq((1L, "abcdef"), (2L, "x")).toDF("doc_id", "text")
    val packed = Multimodal.packTextMjpegAvi(docs, "doc_id", "text")
    val all = Multimodal.decodeMjpegFrames(packed, "id", "media")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    // len 6 → 2+6%4 = 4 frames; len 1 → 3 frames
    assert(all.count(_._1 == 1L) == 4 && all.count(_._1 == 2L) == 3)
    assert(all.forall(f => f._3 == 16 && f._4 == 16))
    val strided = Multimodal.decodeMjpegFrames(packed, "id", "media", stride = 2)
      .where(col("id") === 1L).select("frame_idx").as[Int].collect().sorted
    assert(strided.toSeq == Seq(0, 2))
    // a non-AVI payload yields no rows
    val junk = Seq((9L, ("junk-bytes".getBytes("UTF-8"), "application/octet-stream")))
      .toDF("id", "m").select(col("id"), struct(
        col("m._1").as("payload"), col("m._2").as("mime")).as("media"))
    assert(Multimodal.decodeMjpegFrames(junk, "id", "media").count() == 0)
  }

  test("decodeVideoMeta recognizes AVI next to MP4") {
    val docs = Seq((5L, "hello world")).toDF("doc_id", "text")
    val meta = Multimodal.decodeVideoMeta(
      Multimodal.packTextMjpegAvi(docs, "doc_id", "text"), "id", "media")
      .collect().head
    assert(meta.getAs[String]("mime_detected") == "video/avi")
    assert(meta.getAs[String]("brand") == "MJPG")
    assert(meta.getAs[Int]("width") == 16 && meta.getAs[Int]("height") == 16)
    // 11 chars → 2 + 11%4 = 5 frames at 25fps → 200 ms
    assert(meta.getAs[Long]("duration_ms") == 200L)
  }

  test("encoder rejects invalid shapes eagerly") {
    assertThrows[IllegalArgumentException] { AviCodec.encode(0, 16, 25, Seq(Array[Byte](1))) }
    assertThrows[IllegalArgumentException] { AviCodec.encode(16, 16, 0, Seq(Array[Byte](1))) }
    assertThrows[IllegalArgumentException] { AviCodec.encode(16, 16, 25, Nil) }
  }
}
