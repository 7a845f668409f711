package graft

import graft.ops.Mkv
import org.scalatest.funsuite.AnyFunSuite

/** Matroska block-stream resolution: cluster-timestamp + relative
  * offset combination, SimpleBlock keyframe flags, the BlockGroup
  * keyframe-by-absent-ReferenceBlock rule, lacing refusal, and the
  * hostile-bytes ladder — over hand-built EBML (the same fixed-width
  * size technique as the metadata fixtures). */
class MkvBlocksSpec extends AnyFunSuite {

  private def size8(v: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    b(0) = 0x01
    var k = 0
    while (k < 7) { b(7 - k) = ((v >> (8 * k)) & 0xFF).toByte; k += 1 }
    b
  }
  private def el(id: Array[Byte], body: Array[Byte]): Array[Byte] =
    id ++ size8(body.length.toLong) ++ body
  private def id(bs: Int*): Array[Byte] = bs.map(_.toByte).toArray
  private def u(v: Long, w: Int): Array[Byte] =
    (0 until w).map(k => ((v >> (8 * (w - 1 - k))) & 0xFF).toByte).toArray

  private def header = el(id(0x1A, 0x45, 0xDF, 0xA3),
    el(id(0x42, 0x82), "matroska".getBytes("US-ASCII")))
  private def tracks(codec: String) = el(id(0x16, 0x54, 0xAE, 0x6B),
    el(id(0xAE),
      el(id(0xD7), u(1, 1)) ++ el(id(0x83), u(1, 1)) ++
      el(id(0x86), codec.getBytes("US-ASCII")) ++
      el(id(0xE0), el(id(0xB0), u(32, 2)) ++ el(id(0xBA), u(24, 2)))))
  private def infoEl = el(id(0x15, 0x49, 0xA9, 0x66),
    el(id(0x2A, 0xD7, 0xB1), u(1000000L, 4)))

  private def simpleBlock(track: Int, rel: Int, flags: Int, data: Array[Byte]) =
    el(id(0xA3), Array((0x80 | track).toByte,
      ((rel >> 8) & 0xFF).toByte, (rel & 0xFF).toByte, flags.toByte) ++ data)

  test("cluster + relative timing, keyframe flags, payload slicing") {
    val d1 = Array.fill[Byte](5)(1); val d2 = Array.fill[Byte](7)(2)
    val d3 = Array.fill[Byte](3)(3)
    val seg = el(id(0x18, 0x53, 0x80, 0x67), infoEl ++ tracks("V_MJPEG") ++
      el(id(0x1F, 0x43, 0xB6, 0x75),
        el(id(0xE7), u(100, 2)) ++
        simpleBlock(1, 0, 0x80, d1) ++ simpleBlock(1, 40, 0x00, d2)) ++
      el(id(0x1F, 0x43, 0xB6, 0x75),
        el(id(0xE7), u(200, 2)) ++ simpleBlock(1, -20, 0x80, d3)))
    val mkv = header ++ seg
    val bs = Mkv.blocks(mkv).getOrElse(fail("refused"))
    assert(bs.codec == "V_MJPEG" && bs.trackNo == 1 && bs.width == 32 && bs.height == 24)
    assert(bs.blocks.map(_.timeMs) == Vector(100L, 140L, 180L))
    assert(bs.blocks.map(_.keyframe) == Vector(true, false, true))
    for ((b, want) <- bs.blocks.zip(Seq(d1, d2, d3)))
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(mkv, b.offset, b.offset + b.size), want))
  }

  test("BlockGroup: keyframe iff no ReferenceBlock sibling; other-track blocks skipped") {
    val body = Array[Byte](0x81.toByte, 0, 0, 0) ++ Array.fill[Byte](4)(9)
    val otherTrack = el(id(0xA3), Array[Byte](0x82.toByte, 0, 0, 0x80.toByte) ++ Array.fill[Byte](2)(8))
    val seg = el(id(0x18, 0x53, 0x80, 0x67), infoEl ++ tracks("V_MJPEG") ++
      el(id(0x1F, 0x43, 0xB6, 0x75),
        el(id(0xE7), u(0, 1)) ++
        el(id(0xA0), el(id(0xA1), body)) ++ // no ReferenceBlock -> key
        el(id(0xA0), el(id(0xA1), body) ++ el(id(0xFB), u(0xD8, 1))) ++
        otherTrack))
    val bs = Mkv.blocks(header ++ seg).get
    assert(bs.blocks.length == 2, "other-track block excluded")
    assert(bs.blocks.map(_.keyframe) == Vector(true, false))
  }

  test("lacing (round 17): all three modes unpack per frame, hand-built vectors") {
    def stream(blockPayload: Array[Byte]): Array[Byte] =
      header ++ el(id(0x18, 0x53, 0x80, 0x67), infoEl ++ tracks("V_MJPEG") ++
        el(id(0x1F, 0x43, 0xB6, 0x75),
          el(id(0xE7), u(10, 1)) ++ el(id(0xA3), blockPayload)))
    def head(rel: Int, flags: Int) = Array(0x81.toByte,
      ((rel >> 8) & 0xFF).toByte, (rel & 0xFF).toByte, flags.toByte)
    def slices(bytes: Array[Byte], bs: Mkv.BlockStream): Vector[Vector[Byte]] =
      bs.blocks.map(b => bytes.slice(b.offset, b.offset + b.size).toVector)

    // Xiph, 3 frames: sizes 2 and 300 (a 255-continued run), last = rest
    val f0 = Array[Byte](1, 2)
    val f1 = Array.fill[Byte](300)(7)
    val f2 = Array[Byte](9, 9, 9)
    val xiph = stream(head(5, 0x80 | 0x02) ++ Array(2.toByte) ++
      Array[Byte](2) ++ Array(0xFF.toByte, 45.toByte) ++ f0 ++ f1 ++ f2)
    val xs = Mkv.blocks(xiph).get
    assert(slices(xiph, xs) == Vector(f0.toVector, f1.toVector, f2.toVector))
    assert(xs.blocks.map(_.timeMs) == Vector(15L, 15L, 15L)) // cluster 10 + rel 5
    assert(xs.blocks.map(_.keyframe) == Vector(true, true, true))

    // fixed, 4 equal frames
    val q = Array[Byte](1, 2, 3)
    val fixed = stream(head(0, 0x04) ++ Array(3.toByte) ++ q ++ q ++ q ++ q)
    val fs = Mkv.blocks(fixed).get
    assert(fs.blocks.length == 4 && slices(fixed, fs).forall(_ == q.toVector))
    assert(fs.blocks.forall(!_.keyframe))
    // uneven payload refuses
    assert(Mkv.blocks(stream(head(0, 0x04) ++ Array(3.toByte) ++
      Array.fill[Byte](13)(1))).isEmpty)

    // EBML, 3 frames: first size 2 (vint 0x82), delta +1 via the
    // 1-byte signed vint (bias 63 → 0x80|64), last = rest
    val e0 = Array[Byte](5, 5)
    val e1 = Array[Byte](6, 6, 6)
    val e2 = Array[Byte](8)
    val ebml = stream(head(0, 0x06) ++ Array(2.toByte) ++
      Array(0x82.toByte, (0x80 | 64).toByte) ++ e0 ++ e1 ++ e2)
    val es = Mkv.blocks(ebml).get
    assert(slices(ebml, es) == Vector(e0.toVector, e1.toVector, e2.toVector))
    // sizes overrunning the block refuse
    assert(Mkv.blocks(stream(head(0, 0x02) ++ Array(1.toByte) ++
      Array(200.toByte) ++ Array.fill[Byte](10)(1))).isEmpty)
  }

  test("junk and truncation never throw") {
    val good = header ++ el(id(0x18, 0x53, 0x80, 0x67), infoEl ++ tracks("V_MJPEG") ++
      el(id(0x1F, 0x43, 0xB6, 0x75),
        el(id(0xE7), u(0, 1)) ++ simpleBlock(1, 0, 0x80, Array.fill[Byte](4)(1))))
    assert(Mkv.blocks(good).exists(_.blocks.length == 1))
    (1 until good.length by 7).foreach { n =>
      Mkv.blocks(java.util.Arrays.copyOf(good, n)) // never throws
    }
    val rng = new scala.util.Random(23)
    (0 until 150).foreach { _ =>
      val junk = new Array[Byte](rng.nextInt(300)); rng.nextBytes(junk)
      Mkv.blocks(junk)
      val mut = good.clone()
      mut(rng.nextInt(mut.length)) = rng.nextInt(256).toByte
      Mkv.blocks(mut)
    }
  }
}
