package graft

import graft.ops.BmpCodec
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** From-spec BMP/DIB decoder. Independence: the main fixtures are
  * written by the JDK's OWN ImageIO BMP writer (an encoder this repo
  * does not own); the formats ImageIO never emits (1/4 bpp, RLE8,
  * top-down, BITMAPCOREHEADER) are hand-assembled byte-by-byte from
  * the public DIB layout. Hostile-input contracts match the other
  * codecs: truncation yields the rows present, fuzz never throws.
  */
class BmpSpec extends AnyFunSuite {

  System.setProperty("java.awt.headless", "true")

  private def greyIndexed(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val grey = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grey, grey, grey)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    img.getRaster.setDataElements(0, 0, w, h, px)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos), "no JDK BMP writer?")
    bos.toByteArray
  }

  test("JDK-written grey-indexed BMPs decode to (v,v,v) triplets — incl. padded widths") {
    val rnd = new Random(5)
    // widths that exercise 0/1/2/3 bytes of row padding
    Seq((32, 3), (31, 4), (30, 2), (29, 5), (1, 7), (3, 1)).foreach { case (w, h) =>
      val px = Array.tabulate[Byte](w * h)(_ => rnd.nextInt(256).toByte)
      val img = BmpCodec.decode(greyIndexed(px, w, h)).get
      assert(img.width == w && img.height == h && img.channels == 3, s"dims ${w}x$h")
      px.indices.foreach { i =>
        val v = px(i)
        assert(img.pixels(3 * i) == v && img.pixels(3 * i + 1) == v &&
          img.pixels(3 * i + 2) == v, s"pixel $i of ${w}x$h")
      }
    }
  }

  test("JDK-written 24-bit RGB BMP decodes channel-exact") {
    val w = 13; val h = 6
    val img0 = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd = new Random(9)
    val rgb = Array.tabulate(w * h)(_ => rnd.nextInt(1 << 24))
    (0 until h).foreach(y => (0 until w).foreach(x => img0.setRGB(x, y, rgb(y * w + x))))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img0, "bmp", bos))
    val img = BmpCodec.decode(bos.toByteArray).get
    assert(img.width == w && img.height == h && img.channels == 3)
    (0 until w * h).foreach { i =>
      val c = rgb(i)
      assert((img.pixels(3 * i) & 0xFF) == ((c >> 16) & 0xFF), s"R at $i")
      assert((img.pixels(3 * i + 1) & 0xFF) == ((c >> 8) & 0xFF), s"G at $i")
      assert((img.pixels(3 * i + 2) & 0xFF) == (c & 0xFF), s"B at $i")
    }
  }

  // ---- hand-assembled fixtures for layouts ImageIO never writes ----

  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  /** BITMAPINFOHEADER BMP with an explicit palette and raw pixel rows. */
  private def infoBmp(w: Int, h: Int, bpp: Int, compression: Int,
      palette: Array[Byte], pixelData: Array[Byte]): Array[Byte] = {
    val paletteEntries = palette.length / 4
    val off = 14 + 40 + palette.length
    Array[Byte]('B', 'M') ++ le32(off + pixelData.length) ++ le32(0) ++ le32(off) ++
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(bpp) ++ le32(compression) ++
      le32(pixelData.length) ++ le32(2835) ++ le32(2835) ++
      le32(paletteEntries) ++ le32(0) ++ palette ++ pixelData
  }

  test("hand-assembled 1-bpp: MSB-first bits select palette entries, rows bottom-up") {
    // 2 rows of 10 pixels; palette: 0 → (10,20,30), 1 → (200,210,220)
    val palette = Array[Byte](30, 20, 10, 0, /* BGRA */ (220 - 256).toByte, (210 - 256).toByte, (200 - 256).toByte, 0)
    // bottom row first in the file: bits 1010101010¦000000, top row 1100000000
    val bottomRow = Array[Byte]((0xAA).toByte, (0x80).toByte, 0, 0) // padded to 4
    val topRow = Array[Byte]((0xC0).toByte, 0x00, 0, 0)
    val p = infoBmp(10, 2, 1, 0, palette, bottomRow ++ topRow)
    val img = BmpCodec.decode(p).get
    assert(img.width == 10 && img.height == 2)
    def px(x: Int, y: Int): Int = img.pixels(3 * (y * 10 + x)) & 0xFF
    // top row (file's SECOND row): 1100000000
    assert(px(0, 0) == 200 && px(1, 0) == 200 && px(2, 0) == 10)
    // bottom row: 1010101010
    assert(px(0, 1) == 200 && px(1, 1) == 10 && px(2, 1) == 200 && px(9, 1) == 10)
  }

  test("hand-assembled 4-bpp: high nibble first") {
    val palette = (0 until 16).flatMap(i => Seq[Byte]((i * 17).toByte, (i * 17).toByte, (i * 17).toByte, 0)).toArray
    // one row, 3 pixels: indices 0xA, 0x5, 0xF → bytes A5 F0 + pad
    val row = Array[Byte]((0xA5).toByte, (0xF0).toByte, 0, 0)
    val img = BmpCodec.decode(infoBmp(3, 1, 4, 0, palette, row)).get
    assert((img.pixels(0) & 0xFF) == 0xA * 17)
    assert((img.pixels(3) & 0xFF) == 0x5 * 17)
    assert((img.pixels(6) & 0xFF) == 0xF * 17)
  }

  test("hand-assembled top-down 8-bpp (negative height)") {
    val palette = (0 until 256).flatMap(i => Seq[Byte](i.toByte, i.toByte, i.toByte, 0)).toArray
    val rows = Array[Byte](1, 2, 3, 0, /* row 0 */ 4, 5, 6, 0 /* row 1 */)
    val off = 14 + 40 + palette.length
    val p = Array[Byte]('B', 'M') ++ le32(off + rows.length) ++ le32(0) ++ le32(off) ++
      le32(40) ++ le32(3) ++ le32(-2) ++ le16(1) ++ le16(8) ++ le32(0) ++
      le32(rows.length) ++ le32(2835) ++ le32(2835) ++ le32(256) ++ le32(0) ++ palette ++ rows
    val img = BmpCodec.decode(p).get
    assert(img.width == 3 && img.height == 2)
    // top-down: file row 0 IS the top row
    assert((img.pixels(0) & 0xFF) == 1 && (img.pixels(3 * 3) & 0xFF) == 4)
  }

  test("hand-assembled BI_RLE8: runs, absolute mode, delta, EOL, EOB") {
    val palette = (0 until 256).flatMap(i => Seq[Byte](i.toByte, i.toByte, i.toByte, 0)).toArray
    // 2 rows × 6 px. Encoded bottom row first:
    //   run 3×7, absolute [9,8,6] (odd count → 1 pad byte), EOL;
    //   top row: delta (+2,+0) — skipped pixels stay palette 0 — then run 4×5, EOB
    val rle = Array[Byte](3, 7, 0, 3, 9, 8, 6, 0, 0, 0, /* EOL */
      0, 2, 2, 0, /* delta */ 4, 5, 0, 1 /* EOB */)
    val img = BmpCodec.decode(infoBmp(6, 2, 8, 1, palette, rle)).get
    def px(x: Int, y: Int): Int = img.pixels(3 * (y * 6 + x)) & 0xFF
    // bottom row (y=1): 7 7 7 9 8 6
    assert(px(0, 1) == 7 && px(2, 1) == 7 && px(3, 1) == 9 && px(4, 1) == 8 && px(5, 1) == 6)
    // top row (y=0): 0 0 5 5 5 5
    assert(px(0, 0) == 0 && px(1, 0) == 0 && px(2, 0) == 5 && px(5, 0) == 5)
  }

  test("hand-assembled BITMAPCOREHEADER (12-byte DIB, BGR palette triples)") {
    // core header: the palette must carry the full 2^bpp entries
    val palette = (0 until 256).flatMap(i =>
      Seq[Byte](((i + 2) & 0xFF).toByte, ((i + 1) & 0xFF).toByte, i.toByte)).toArray
    val row = Array[Byte](1, 0, 1, 0) // 3 px + pad: idx 1,0,1
    val off = 14 + 12 + palette.length
    val p = Array[Byte]('B', 'M') ++ le32(off + row.length) ++ le32(0) ++ le32(off) ++
      le32(12) ++ le16(3) ++ le16(1) ++ le16(1) ++ le16(8) ++ palette ++ row
    val img = BmpCodec.decode(p).get
    assert(img.width == 3 && img.height == 1)
    // entry i is stored (B=i+2, G=i+1, R=i): pixel 0 uses idx 1
    assert((img.pixels(0) & 0xFF) == 1 && (img.pixels(1) & 0xFF) == 2 && (img.pixels(2) & 0xFF) == 3)
    assert((img.pixels(3) & 0xFF) == 0)
  }

  test("hand-assembled BI_RLE4: alternating-nibble runs, absolute mode, delta, EOL, EOB") {
    val palette = (0 until 256).flatMap(i => Seq[Byte](i.toByte, i.toByte, i.toByte, 0)).toArray
    // 2 rows × 6 px, bottom row first:
    //   run 5 of value 0x37 → 3,7,3,7,3; absolute 3 nibbles [9,8,6]
    //   (2 data bytes → 1 pad byte to the word boundary)... but x is
    //   already 5, so only nibble 9 lands; EOL; top row: delta (+2,0),
    //   run 4×0x50 → 5,0,5,0; EOB
    val rle = Array[Byte](5, 0x37, 0, 3, (0x98 & 0xFF).toByte, 0x60, 0, 0,
      0, 2, 2, 0, 4, 0x50, 0, 1)
    val img = BmpCodec.decode(infoBmp(6, 2, 4, 2, palette, rle)).get
    def px(x: Int, y: Int): Int = img.pixels(3 * (y * 6 + x)) & 0xFF
    // bottom row (y=1): 3 7 3 7 3 9
    assert(px(0, 1) == 3 && px(1, 1) == 7 && px(4, 1) == 3 && px(5, 1) == 9)
    // top row (y=0): 0 0 5 0 5 0
    assert(px(0, 0) == 0 && px(2, 0) == 5 && px(3, 0) == 0 && px(4, 0) == 5 && px(5, 0) == 0)
  }

  test("BI_RLE4 from the JDK's own BMP writer decodes pixel-exact") {
    import javax.imageio._
    val greys = Array.tabulate(16)(i => (i * 17).toByte)
    val icm = new java.awt.image.IndexColorModel(4, 16, greys, greys, greys)
    val img = new java.awt.image.BufferedImage(27, 9,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY, icm)
    for (y <- 0 until 9; x <- 0 until 27) {
      val v = ((x / 3 + y) % 16) * 17 // runs of 3: RLE-friendly
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("bmp").next()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionType("BI_RLE4")
    writer.write(null, new IIOImage(img, null, null), param)
    writer.dispose(); ios.close()
    val ours = BmpCodec.decode(bos.toByteArray)
    assert(ours.isDefined, "JDK RLE4 decode failed")
    for (y <- 0 until 9; x <- 0 until 27) {
      val v = ((x / 3 + y) % 16) * 17
      assert((ours.get.pixels(3 * (y * 27 + x)) & 0xFF) == v, s"($x,$y)")
    }
  }

  test("refusals: RLE4-with-wrong-bpp, BITFIELDS, zero dims, oversized, palette overflow") {
    val pal = (0 until 16).flatMap(_ => Seq[Byte](0, 0, 0, 0)).toArray
    assert(BmpCodec.decode(infoBmp(4, 1, 8, 2, pal, Array[Byte](0, 0, 0, 0))).isEmpty) // RLE4 needs bpp 4
    assert(BmpCodec.decode(infoBmp(4, 1, 32, 3, Array.empty, new Array[Byte](16))).isEmpty) // BITFIELDS
    assert(BmpCodec.decode(infoBmp(0, 1, 8, 0, new Array[Byte](1024), Array.empty)).isEmpty)
    // hostile dims: 60000×60000 would need > MaxPixelBytes
    assert(BmpCodec.decode(infoBmp(60000, 60000, 8, 0, new Array[Byte](1024), Array.empty)).isEmpty)
  }

  test("truncation yields the rows whose bytes exist; fuzz never throws") {
    val rnd = new Random(21)
    val px = Array.tabulate[Byte](32 * 8)(_ => rnd.nextInt(256).toByte)
    val full = greyIndexed(px, 32, 8)
    (1 until full.length by 37).foreach { cut =>
      BmpCodec.decode(java.util.Arrays.copyOf(full, cut)) // Option either way, no throw
    }
    (1 to 300).foreach { _ =>
      val m = full.clone()
      (1 to 6).foreach(_ => m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte)
      BmpCodec.decode(m)
    }
    (1 to 100).foreach { _ =>
      val junk = new Array[Byte](rnd.nextInt(256))
      rnd.nextBytes(junk)
      BmpCodec.decode(junk)
    }
  }
}
