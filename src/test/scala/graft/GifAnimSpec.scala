package graft

import java.awt.image.{BufferedImage, IndexColorModel}
import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
import javax.imageio.metadata.IIOMetadataNode
import graft.ops.GifCodec
import graft.ops.GifCodec.GifFrameSpec
import org.scalatest.funsuite.AnyFunSuite

/** Animated GIF demux + composition. The INDEPENDENCE pin: fixtures
  * written by the JDK ImageIO GIF sequence writer (an implementation
  * this codebase never produced) decode to the same per-frame pixels,
  * placements, delays, and disposal codes that ImageIO's own reader
  * reports; composition (which ImageIO does not do) is pinned by
  * hand-computed canvases over the in-repo writer's streams,
  * including disposal 2 (clear to transparent), disposal 3 (restore
  * previous), and transparency holes. */
class GifAnimSpec extends AnyFunSuite {

  private def grayIcm: IndexColorModel = {
    val ramp = Array.tabulate[Byte](256)(_.toByte)
    new IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  private def indexedFrame(w: Int, h: Int, f: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, grayIcm)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, f(x, y) & 0xFF)
    img
  }

  private def gifImageMeta(writer: javax.imageio.ImageWriter, img: BufferedImage,
      x: Int, y: Int, delayCs: Int, disposal: String): javax.imageio.metadata.IIOMetadata = {
    val meta = writer.getDefaultImageMetadata(new ImageTypeSpecifier(img), null)
    val fmt = "javax_imageio_gif_image_1.0"
    val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
    def child(name: String): IIOMetadataNode = {
      var n = root.getFirstChild
      while (n != null && n.getNodeName != name) n = n.getNextSibling
      if (n != null) n.asInstanceOf[IIOMetadataNode]
      else { val c = new IIOMetadataNode(name); root.appendChild(c); c }
    }
    val gce = child("GraphicControlExtension")
    gce.setAttribute("disposalMethod", disposal)
    gce.setAttribute("userInputFlag", "FALSE")
    gce.setAttribute("transparentColorFlag", "FALSE")
    gce.setAttribute("delayTime", delayCs.toString)
    gce.setAttribute("transparentColorIndex", "0")
    val desc = child("ImageDescriptor")
    desc.setAttribute("imageLeftPosition", x.toString)
    desc.setAttribute("imageTopPosition", y.toString)
    meta.setFromTree(fmt, root)
    meta
  }

  test("ImageIO-written animation: frames, placement, delays, disposal match both readers") {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    val specs = Seq(
      (indexedFrame(24, 16, (x, y) => x * 10 + y), 0, 0, 5, "doNotDispose"),
      (indexedFrame(8, 8, (x, y) => 200 - x - y), 4, 4, 10, "restoreToBackgroundColor"),
      (indexedFrame(12, 6, (x, y) => (x * y + 7)), 10, 2, 15, "restoreToPrevious"),
      (indexedFrame(24, 16, (x, y) => (x + 3 * y)), 0, 0, 20, "none"))
    for ((img, x, y, d, disp) <- specs)
      writer.writeToSequence(new IIOImage(img, null, gifImageMeta(writer, img, x, y, d, disp)), null)
    writer.endWriteSequence()
    ios.close()
    val bytes = bos.toByteArray

    val anim = GifCodec.decodeAnim(bytes).getOrElse(fail("decodeAnim refused ImageIO stream"))
    assert(anim.frames.length == 4)
    // disposal codes: none=0/doNotDispose=1/background=2/previous=3
    assert(anim.frames.map(_.disposal) == Vector(1, 2, 3, 0))
    assert(anim.frames.map(_.delayCs) == Vector(5, 10, 15, 20))
    assert(anim.frames.map(f => (f.x, f.y)) == Vector((0, 0), (4, 4), (10, 2), (0, 0)))

    // per-frame RAW pixels against the independent ImageIO reader
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    reader.setInput(ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes)))
    val n = reader.getNumImages(true)
    assert(n == 4)
    for (i <- 0 until n) {
      val ref = reader.read(i)
      val f = anim.frames(i)
      assert(ref.getWidth == f.width && ref.getHeight == f.height, s"frame $i dims")
      for (y <- 0 until f.height; x <- 0 until f.width) {
        val ix = f.indices(y * f.width + x) & 0xFF
        val ours = (f.palette(3 * ix) & 0xFF, f.palette(3 * ix + 1) & 0xFF,
          f.palette(3 * ix + 2) & 0xFF)
        val rgb = ref.getRGB(x, y)
        val theirs = ((rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF)
        assert(ours == theirs, s"frame $i pixel ($x,$y)")
      }
    }
  }

  test("composition: overwrite, disposal 2 clears to transparent, disposal 3 restores") {
    val gct = Array.tabulate(256 * 3)(i => (i / 3).toByte)
    val full = Array.fill[Byte](16)(100.toByte) // 4x4 tile, gray 100
    val tile = Array.fill[Byte](4)(200.toByte) // 2x2 tile, gray 200
    val gif = GifCodec.encodeAnim(8, 4, Some(0), gct, Seq(
      GifFrameSpec(0, 0, 4, 4, 1, disposal = 0, None, full), // base
      GifFrameSpec(2, 1, 2, 2, 1, disposal = 2, None, tile), // then clears its rect
      GifFrameSpec(4, 0, 2, 2, 1, disposal = 3, None, tile), // then restores previous
      GifFrameSpec(6, 2, 2, 2, 1, disposal = 0, None, tile)))
    val anim = GifCodec.decodeAnim(gif).getOrElse(fail("refused"))
    def px(c: Array[Byte], x: Int, y: Int): (Int, Int) =
      ((c((y * 8 + x) * 4) & 0xFF, c((y * 8 + x) * 4 + 3) & 0xFF))
    val c0 = anim.canvases(0)
    assert(px(c0, 0, 0) == (100, 255) && px(c0, 3, 3) == (100, 255))
    assert(px(c0, 4, 0) == (0, 0), "right half transparent")
    val c1 = anim.canvases(1)
    assert(px(c1, 2, 1) == (200, 255), "tile rendered in its own snapshot")
    val c2 = anim.canvases(2)
    assert(px(c2, 2, 1) == (0, 0), "disposal 2 cleared the tile rect before frame 2")
    assert(px(c2, 2, 3) == (100, 255), "outside the disposed rect the base remains")
    assert(px(c2, 4, 0) == (200, 255), "frame 2's own tile visible in its snapshot")
    val c3 = anim.canvases(3)
    assert(px(c3, 4, 0) == (0, 0), "disposal 3 rolled frame 2's tile back")
    assert(px(c3, 6, 2) == (200, 255), "frame 3 tile")
  }

  test("transparency holes leave the canvas pixel untouched") {
    val gct = Array.tabulate(256 * 3)(i => (i / 3).toByte)
    val base = Array.fill[Byte](16)(80.toByte)
    val holed = Array.tabulate[Byte](16)(i => if (i % 2 == 0) 7 else 250.toByte)
    val gif = GifCodec.encodeAnim(4, 4, None, gct, Seq(
      GifFrameSpec(0, 0, 4, 4, 1, 0, None, base),
      GifFrameSpec(0, 0, 4, 4, 1, 0, transparent = Some(7), holed)))
    val anim = GifCodec.decodeAnim(gif).get
    val c1 = anim.canvases(1)
    assert((c1(0) & 0xFF) == 80, "transparent index kept the base pixel")
    assert((c1(4) & 0xFF) == 250, "opaque index overwrote")
    assert(anim.loopCount == -1, "no NETSCAPE block")
  }

  test("poster-frame decode still works on animated streams; refusals never throw") {
    val gct = Array.tabulate(256 * 3)(i => (i / 3).toByte)
    val gif = GifCodec.encodeAnim(4, 2, Some(3), gct, Seq(
      GifFrameSpec(0, 0, 4, 2, 1, 0, None, Array.tabulate[Byte](8)(_.toByte)),
      GifFrameSpec(0, 0, 4, 2, 1, 0, None, Array.fill[Byte](8)(9.toByte))))
    val poster = GifCodec.decode(gif).getOrElse(fail("poster decode refused"))
    assert(poster.width == 4 && poster.height == 2)
    assert((poster.pixels(0) & 0xFF) == 0 && (poster.pixels(3) & 0xFF) == 1)
    val anim = GifCodec.decodeAnim(gif).get
    assert(anim.loopCount == 3 && anim.frames.length == 2)
    // frame cap, truncation, fuzz
    assert(GifCodec.decodeAnim(gif, maxFrames = 1).isEmpty)
    (1 until gif.length by 5).foreach { n =>
      GifCodec.decodeAnim(java.util.Arrays.copyOf(gif, n))
    }
    val rng = new scala.util.Random(19)
    (0 until 150).foreach { _ =>
      val junk = new Array[Byte](rng.nextInt(300)); rng.nextBytes(junk)
      GifCodec.decodeAnim(junk)
      val mut = gif.clone()
      mut(rng.nextInt(mut.length)) = rng.nextInt(256).toByte
      GifCodec.decodeAnim(mut) // never throws
    }
  }
}
