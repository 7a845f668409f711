package graft

import graft.ops.{Icc, JpegEncoder, PngCodec, WebpCodec}
import org.scalatest.funsuite.AnyFunSuite

/** ICC profile metadata (round 17), pinned against the JDK's own ICC
  * implementation (`java.awt.color.ICC_Profile` supplies the fixture
  * profile AND cross-checks every parsed header field), with the
  * three container extraction seams and the hostile-bytes ladder. */
class IccSpec extends AnyFunSuite with SparkSuite {

  private def srgb: Array[Byte] =
    java.awt.color.ICC_Profile.getInstance(java.awt.color.ColorSpace.CS_sRGB).getData

  private def img = {
    val px = Array.tabulate(16 * 16)(i => (i % 251).toByte)
    PngCodec.Image(16, 16, 1, px)
  }

  test("header fields cross-check the JDK reference implementation") {
    val p = srgb
    val jdk = java.awt.color.ICC_Profile.getInstance(p)
    val h = Icc.parseHeader(p).getOrElse(fail("sRGB header refused"))
    assert(h.size == p.length)
    assert(h.versionMajor == jdk.getMajorVersion)
    // the JDK getter returns the RAW BCD byte (minor nibble high)
    assert(h.versionMinor == (jdk.getMinorVersion >> 4))
    assert(h.deviceClass == "mntr" &&
      jdk.getProfileClass == java.awt.color.ICC_Profile.CLASS_DISPLAY)
    assert(h.colorSpace == "RGB " &&
      jdk.getColorSpaceType == java.awt.color.ColorSpace.TYPE_RGB)
    assert(h.pcs == "XYZ " &&
      jdk.getPCSType == java.awt.color.ColorSpace.TYPE_XYZ)
    assert(h.renderingIntent == 0 && h.tagCount > 0)
    // the description tag parses to non-empty text (desc or mluc form)
    assert(h.description.exists(_.nonEmpty))
  }

  test("jpeg APP2 reassembly: single + multi-segment, oversized profiles") {
    val jpeg = JpegEncoder.encode(img, quality = 90)
    for (segs <- Seq(1, 2, 5)) {
      val out = Icc.extract(Icc.embedJpeg(jpeg, srgb, segments = segs))
        .getOrElse(fail(s"jpeg $segs-segment extract failed"))
      assert(out.toSeq == srgb.toSeq, s"$segs segments")
    }
    // a >64 KB profile MUST span segments: pad the sRGB bytes and
    // patch the header size accordingly
    val big = srgb ++ new Array[Byte](70000)
    val sz = big.length
    big(0) = ((sz >> 24) & 0xFF).toByte; big(1) = ((sz >> 16) & 0xFF).toByte
    big(2) = ((sz >> 8) & 0xFF).toByte; big(3) = (sz & 0xFF).toByte
    val out = Icc.extract(Icc.embedJpeg(jpeg, big, segments = 2))
      .getOrElse(fail("oversized extract failed"))
    assert(out.toSeq == big.toSeq)
    assert(Icc.parseHeader(out).exists(_.size == sz))
    // a plain jpeg carries none
    assert(Icc.extract(jpeg).isEmpty)
  }

  test("png iCCP roundtrips through the in-repo zlib; webp ICCP through VP8X") {
    val png = PngCodec.encode(img)
    val outP = Icc.extract(Icc.embedPng(png, srgb)).getOrElse(fail("png extract"))
    assert(outP.toSeq == srgb.toSeq)
    assert(Icc.extract(png).isEmpty)
    val webp = WebpCodec.encodeGreen(16, 16, img.pixels)
    val outW = Icc.extract(Icc.embedWebp(webp, srgb, 16, 16)).getOrElse(fail("webp extract"))
    assert(outW.toSeq == srgb.toSeq)
    assert(Icc.extract(webp).isEmpty)
    // raw profile bytes pass through
    assert(Icc.extract(srgb).exists(_.toSeq == srgb.toSeq))
  }

  test("hostile bytes: header + extractor refusals, fuzz never throws") {
    assert(Icc.parseHeader(Array.emptyByteArray).isEmpty)
    assert(Icc.parseHeader(new Array[Byte](200)).isEmpty) // no acsp magic
    val broken = srgb.clone(); broken(36) = 'x'
    assert(Icc.parseHeader(broken).isEmpty)
    val shortSize = srgb.clone(); shortSize(0) = 0x7F.toByte // size > length
    assert(Icc.parseHeader(shortSize).isEmpty)
    val carriers = Seq(
      Icc.embedJpeg(JpegEncoder.encode(img), srgb),
      Icc.embedPng(PngCodec.encode(img), srgb),
      Icc.embedWebp(WebpCodec.encodeGreen(16, 16, img.pixels), srgb, 16, 16))
    val rng = new scala.util.Random(41)
    for (c <- carriers) {
      (1 until c.length by 97).foreach(n =>
        Icc.extract(java.util.Arrays.copyOf(c, n)))
      (0 until 60).foreach { _ =>
        val mut = c.clone()
        mut(rng.nextInt(mut.length)) = rng.nextInt(256).toByte
        Icc.extract(mut).foreach(Icc.parseHeader)
      }
    }
  }

  test("image_icc spec-op dispatches") {
    import spark.implicits._
    val df = Seq((1L, Icc.embedPng(PngCodec.encode(img), srgb))).toDF("doc_id", "__p")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.struct(
          org.apache.spark.sql.functions.col("__p").as("payload")).as("media"))
    val out = graft.transforms.Transforms.apply(df,
      graft.spec.TransformSpec("t", "image_icc",
        graft.spec.Config.of("id_field" -> "doc_id")), Map.empty)
    val r = out.collect().head
    assert(r.getString(1) == "png" && r.getBoolean(2))
    assert(r.getLong(3) == srgb.length && r.getString(5) == "mntr")
  }
}
