package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{PngCodec, TiffCodec}

/** Baseline TIFF decode pinned with a TEST-LOCAL file builder (both
  * endians, arbitrary tags) and a test-local LZW encoder — the
  * production encoder only does little-endian PackBits greyscale, so
  * LZW/predictor/palette/RGB/WhiteIsZero/big-endian paths are all
  * exercised from independently written bytes. Pure JVM. */
class TiffSpec extends AnyFunSuite {

  // ---- test-local TIFF builder ----

  private def build(le: Boolean, tags: Seq[(Int, Int, Seq[Long])],
      blobs: Seq[Array[Byte]]): Array[Byte] = {
    // tags: (tag, type, values); values with count*size>4 or marked
    // via type get spilled after the IFD; blob i's final offset is
    // referenced by value == -100 - i (patched)
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (le) { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
      else { bos.write((v >> 8) & 0xFF); bos.write(v & 0xFF) }
    def w32(v: Long): Unit =
      if (le) { w16((v & 0xFFFF).toInt); w16(((v >> 16) & 0xFFFF).toInt) }
      else { w16(((v >> 16) & 0xFFFF).toInt); w16((v & 0xFFFF).toInt) }
    def tsize(t: Int) = t match { case 3 => 2; case 4 => 4; case _ => 1 }
    if (le) { bos.write('I'); bos.write('I'); w16(42) }
    else { bos.write('M'); bos.write('M'); w16(42) }
    w32(8)
    val ifdSize = 2 + 12 * tags.length + 4
    var spillAt = 8L + ifdSize
    val spills = tags.map { case (_, t, vs) =>
      if (vs.length * tsize(t) > 4) { val at = spillAt; spillAt += vs.length * tsize(t); Some(at) }
      else None
    }
    val blobAt = blobs.scanLeft(spillAt)((a, b) => a + b.length).init
    def resolved(v: Long): Long = if (v <= -100) blobAt((-100 - v).toInt) else v
    w16(tags.length)
    tags.zip(spills).foreach { case ((tag, t, vs), spill) =>
      w16(tag); w16(t); w32(vs.length)
      spill match {
        case Some(_) => w32(spills.zip(tags).collectFirst {
          case (Some(at), (tg, _, _)) if tg == tag => at }.get)
        case None =>
          val before = bos.size()
          vs.foreach(v => if (t == 3) w16(resolved(v).toInt) else if (t == 4) w32(resolved(v))
            else bos.write(resolved(v).toInt))
          while (bos.size() < before + 4) bos.write(0)
      }
    }
    w32(0)
    tags.zip(spills).foreach { case ((_, t, vs), spill) =>
      if (spill.isDefined)
        vs.foreach(v => if (t == 3) w16(resolved(v).toInt) else if (t == 4) w32(resolved(v))
          else bos.write(resolved(v).toInt))
    }
    blobs.foreach(bos.write)
    bos.toByteArray
  }

  private def grey(img: PngCodec.Image): Seq[Int] = {
    assert(img.channels == 1); img.pixels.map(_ & 0xFF).toSeq
  }

  // ---- test-local TIFF LZW encoder (MSB-first, early change) ----

  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    var cur = 0L; var nbits = 0
    def put(code: Int, width: Int): Unit = {
      cur = (cur << width) | code; nbits += width
      while (nbits >= 8) { bos.write(((cur >> (nbits - 8)) & 0xFF).toInt); nbits -= 8 }
    }
    var width = 9
    val dict = scala.collection.mutable.HashMap[List[Byte], Int]()
    var next = 258
    put(256, width) // Clear
    var w = List.empty[Byte]
    data.foreach { b =>
      val wb = w :+ b
      if (w.isEmpty || dict.contains(wb)) w = wb
      else {
        put(if (w.length == 1) w.head & 0xFF else dict(w), width)
        if (next < 4094) {
          dict(wb) = next; next += 1
          // early change, the libtiff/JDK convention: the DECODER
          // widens when its next-to-assign hits 511/1023/2047; the
          // encoder runs one entry ahead, so it widens at 512/1024/
          // 2048 (verified against the JDK TIFF writer's streams)
          if (next == 512) width = 10
          else if (next == 1024) width = 11
          else if (next == 2048) width = 12
        }
        w = List(b)
      }
    }
    if (w.nonEmpty) put(if (w.length == 1) w.head & 0xFF else dict(w), width)
    put(257, width) // EOI
    if (nbits > 0) bos.write(((cur << (8 - nbits)) & 0xFF).toInt)
    bos.toByteArray
  }

  private def greyTags(w: Int, h: Int, comp: Int, strip: Array[Byte],
      extra: Seq[(Int, Int, Seq[Long])] = Nil): Seq[(Int, Int, Seq[Long])] =
    Seq((256, 4, Seq(w.toLong)), (257, 4, Seq(h.toLong)), (258, 3, Seq(8L)),
      (259, 3, Seq(comp.toLong)), (262, 3, Seq(1L)), (273, 4, Seq(-100L)),
      (277, 3, Seq(1L)), (278, 4, Seq(h.toLong)), (279, 4, Seq(strip.length.toLong))) ++ extra

  // ------------------------------------------------------------ tests

  test("production encoder round-trip: PackBits strips, multi-strip, exact pixels") {
    val px = Array.tabulate(32 * 17)(i => ((i * 11 + 5) % 256).toByte)
    val enc = TiffCodec.encodeGrey(32, 17, px, rowsPerStrip = 4)
    val img = TiffCodec.decode(enc).get
    assert(img.width == 32 && img.height == 17 && img.channels == 1)
    assert(img.pixels.sameElements(px))
    // single strip too
    val one = TiffCodec.decode(TiffCodec.encodeGrey(8, 3, px.take(24), rowsPerStrip = 64)).get
    assert(one.pixels.sameElements(px.take(24)))
  }

  test("LZW strips decode (hand encoder): repeats exercise the dictionary and KwKwK") {
    // data with heavy repetition drives multi-byte dictionary entries;
    // 'aaaa...' opens with the classic KwKwK case
    val data = ("aaaaaa" + "abcabcabcabc" * 10 + "zyx" * 7).getBytes("US-ASCII")
    val w = data.length; val h = 1
    val strip = lzwEncode(data)
    val bytes = build(le = true, greyTags(w, h, 5, strip), Seq(strip))
    val img = TiffCodec.decode(bytes).get
    assert(grey(img) == data.map(_ & 0xFF).toSeq)
  }

  test("LZW early change: >510 dictionary entries force the 10-bit width switch") {
    // 600 distinct pairs → dictionary passes 511; both coders must
    // switch width at the same code or the stream shears
    val rnd = new scala.util.Random(7)
    val data = Array.fill(4000)((rnd.nextInt(256)).toByte)
    val strip = lzwEncode(data)
    val bytes = build(le = true, greyTags(data.length, 1, 5, strip), Seq(strip))
    assert(grey(TiffCodec.decode(bytes).get) == data.map(_ & 0xFF).toSeq)
  }

  test("horizontal predictor 2 integrates across each row (uncompressed and LZW)") {
    // stored residuals reconstruct row-cumulative, mod 256, row-reset
    val w = 5; val h = 2
    val resid = Array[Byte](10, 1, 1, -1, 2, /* row 2 */ 100, 50, 50, 56, 100)
    val expected = Seq(10, 11, 12, 11, 13, 100, 150, 200, 0, 100)
    val plain = build(le = true,
      greyTags(w, h, 1, resid, extra = Seq((317, 3, Seq(2L)))), Seq(resid))
    assert(grey(TiffCodec.decode(plain).get) == expected)
    val lz = lzwEncode(resid)
    val lzBytes = build(le = true,
      greyTags(w, h, 5, lz, extra = Seq((317, 3, Seq(2L)))), Seq(lz))
    assert(grey(TiffCodec.decode(lzBytes).get) == expected)
  }

  test("big-endian MM header reads; WhiteIsZero inverts; RGB passes through") {
    val data = Array[Byte](0, 50, 100, -56) // greys 0,50,100,200
    val be = build(le = false, greyTags(4, 1, 1, data), Seq(data))
    assert(grey(TiffCodec.decode(be).get) == Seq(0, 50, 100, 200))
    // WhiteIsZero (photometric 0): inverted
    val wiz = build(le = true,
      greyTags(4, 1, 1, data).map { case (262, t, _) => (262, t, Seq(0L)); case x => x },
      Seq(data))
    assert(grey(TiffCodec.decode(wiz).get) == Seq(255, 205, 155, 55))
    // RGB chunky
    val rgb = Array[Byte](1, 2, 3, 4, 5, 6)
    val rgbTags = Seq((256, 4, Seq(2L)), (257, 4, Seq(1L)), (258, 3, Seq(8L, 8L, 8L)),
      (259, 3, Seq(1L)), (262, 3, Seq(2L)), (273, 4, Seq(-100L)),
      (277, 3, Seq(3L)), (278, 4, Seq(1L)), (279, 4, Seq(6L)))
    val rgbImg = TiffCodec.decode(build(le = true, rgbTags, Seq(rgb))).get
    assert(rgbImg.channels == 3 && rgbImg.pixels.sameElements(rgb))
  }

  test("palette expands through ColorMap high bytes") {
    val data = Array[Byte](0, 1, 2, 1)
    // ColorMap: 3*256 SHORTs; entries 0..2 distinctive
    val cm = (0 until 768).map { i =>
      val (ch, ix) = (i / 256, i % 256)
      if (ix <= 2) ((ix + 1) * 40 + ch * 7) << 8 else 0
    }.map(_.toLong)
    val tags = Seq((256, 4, Seq(4L)), (257, 4, Seq(1L)), (258, 3, Seq(8L)),
      (259, 3, Seq(1L)), (262, 3, Seq(3L)), (273, 4, Seq(-100L)),
      (277, 3, Seq(1L)), (278, 4, Seq(1L)), (279, 4, Seq(4L)),
      (320, 3, cm))
    val img = TiffCodec.decode(build(le = true, tags, Seq(data))).get
    assert(img.channels == 3)
    val px = img.pixels.map(_ & 0xFF).grouped(3).map(_.toSeq).toSeq
    assert(px(0) == Seq(40, 47, 54) && px(1) == Seq(80, 87, 94) && px(2) == Seq(120, 127, 134))
    assert(px(3) == px(1))
  }

  test("tiled TIFFs from the JDK's own writer decode: edge tiles clip, LZW and None compressions") {
    import javax.imageio.ImageIO
    def tiled(w: Int, h: Int, tw: Int, th: Int, compress: Option[String]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, (x * 7 + y * 13) % 256)
      val bos = new java.io.ByteArrayOutputStream()
      val writer = ImageIO.getImageWritersByFormatName("tiff").next()
      val ios = ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      val param = writer.getDefaultWriteParam
      param.setTilingMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setTiling(tw, th, 0, 0)
      compress.foreach { c =>
        param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionType(c)
      }
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      writer.dispose(); ios.close()
      bos.toByteArray
    }
    // edge tiles on both axes; exact multiples; LZW-compressed tiles
    for ((w, h, tw, th, c) <- Seq(
      (50, 37, 16, 16, None), (32, 32, 16, 16, None),
      (50, 37, 16, 16, Some("LZW")), (20, 45, 16, 32, Some("LZW")))) {
      val bytes = tiled(w, h, tw, th, c)
      val got = TiffCodec.decode(bytes)
      assert(got.isDefined, s"${w}x$h tiles ${tw}x$th $c failed")
      val im = got.get
      assert(im.width == w && im.height == h && im.channels == 1)
      for (y <- 0 until h; x <- 0 until w)
        assert((im.pixels(y * w + x) & 0xFF) == (x * 7 + y * 13) % 256,
          s"($x,$y) ${w}x$h $c")
    }
  }

  test("refusals: tiles, planar separates, 16-bit, unknown compression, truncated strip, junk") {
    val data = Array[Byte](1, 2, 3, 4)
    def g(extra: Seq[(Int, Int, Seq[Long])] = Nil,
        mut: Seq[(Int, Int, Seq[Long])] => Seq[(Int, Int, Seq[Long])] = identity) =
      build(le = true, mut(greyTags(4, 1, 1, data) ++ extra), Seq(data))
    assert(TiffCodec.decode(g(extra = Seq((322, 4, Seq(16L))))).isEmpty) // tile tag + strips
    assert(TiffCodec.decode(g(extra = Seq((284, 3, Seq(2L))))).isEmpty) // planar 2
    assert(TiffCodec.decode(g(mut = _.map {
      case (258, t, _) => (258, t, Seq(16L)); case x => x })).isEmpty)
    assert(TiffCodec.decode(g(mut = _.map {
      case (259, t, _) => (259, t, Seq(7L)); case x => x })).isEmpty) // JPEG-in-TIFF
    assert(TiffCodec.decode(g(mut = _.map {
      case (279, t, _) => (279, t, Seq(2L)); case x => x })).isEmpty) // short strip
    assert(TiffCodec.decode("II*not a real tiff at all".getBytes("US-ASCII")).isEmpty)
    assert(TiffCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    val rnd = new scala.util.Random(3)
    (0 until 200).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(64) + 4)(rnd.nextInt(256).toByte)
      junk(0) = 'I'; junk(1) = 'I'; junk(2) = 0x2A; junk(3) = 0
      TiffCodec.decode(junk) // must not throw
    }
  }
}
