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

  test("grid (tiled) primaries: dims, tile shape, codec; libheif+libavif-agreed bytes digest-frozen") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val cases = for {
      avif <- Seq(true, false); rot <- Seq(0, 90)
      (rows, cols, tw, th, ow, oh) <- Seq((2, 2, 64, 64, 128, 128), (2, 3, 512, 512, 1440, 960))
      inIdat <- Seq(false, true); wide <- Seq(false, true)
    } yield (s"grid-${if (avif) "avif" else "heic"}-$rot-${rows}x$cols-$inIdat-$wide",
      (avif, rot, rows, cols, tw, th, ow, oh, inIdat, wide))
    for ((_, (avif, rot, rows, cols, tw, th, ow, oh, inIdat, wide)) <- cases.sortBy(_._1)) {
      val bytes = Heif.buildGrid(avif, tw, th, rows, cols, ow, oh,
        gridIspe = true, inIdat = inIdat, rotationCcw = rot, wideFields = wide)
      md.update(bytes)
      val m = Heif.parse(bytes).getOrElse(fail(s"refused grid $avif $rot ${rows}x$cols"))
      val (ew, eh) = if (rot == 90) (oh, ow) else (ow, oh)
      assert(m.width == ew && m.height == eh)
      assert(m.codedWidth == ow && m.codedHeight == oh)
      assert(m.gridRows == rows && m.gridCols == cols)
      assert(m.codec == (if (avif) "av01" else "hvc1"))
      assert(m.itemCount == rows * cols + 1 && m.primaryId == 1)
    }
    val hex = md.digest().map(x => f"${x & 0xFF}%02x").mkString
    assert(hex == "d80d502051812c3dff31cb4a5fdc41e2", "grid digest")
  }

  test("grid fallback and refusal ladder") {
    // no ispe on the grid item: dims fall back to the ImageGrid config
    val noIspe = Heif.buildGrid(avif = true, 512, 512, 2, 2, 1000, 900,
      gridIspe = false)
    val m = Heif.parse(noIspe).getOrElse(fail("config-dims fallback refused"))
    assert(m.width == 1000 && m.height == 900 && m.gridRows == 2 && m.gridCols == 2)
    // tile count != rows*cols: refuse (corrupt the cols byte in the
    // ImageGrid payload — it lives in mdat at the iloc-recorded spot)
    val bytes = Heif.buildGrid(avif = true, 64, 64, 2, 2, 128, 128)
    val gridCfgAt = {
      // the ImageGrid payload starts right after the mdat header
      val s = bytes.indexOfSlice("mdat".getBytes("US-ASCII"))
      s + 4
    }
    val corrupt = bytes.clone()
    corrupt(gridCfgAt + 3) = 2 // cols-1 = 2 → 2x3 grid, but only 4 tiles
    assert(Heif.parse(corrupt).isEmpty)
    // unknown ImageGrid version: refuse
    val badVer = bytes.clone()
    badVer(gridCfgAt) = 1
    assert(Heif.parse(badVer).isEmpty)
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
