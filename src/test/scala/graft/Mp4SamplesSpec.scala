package graft

import graft.ops.Mp4
import org.scalatest.funsuite.AnyFunSuite

/** MP4 sample-table resolution (stsd/stts/stsc/stsz/stco/co64/stss):
  * muxer round-trip plus hand-built tables for the layouts the muxer
  * does not emit (multi-sample chunk runs, uniform sizes, 64-bit
  * chunk offsets, absent stss), and the hostile-bytes ladder. */
class Mp4SamplesSpec extends AnyFunSuite {

  private def frames(sizes: Int*): Seq[Array[Byte]] =
    sizes.zipWithIndex.map { case (n, i) => Array.fill(n)((i + 1).toByte) }

  test("muxer round-trip: offsets, sizes, 40ms timing, every-third stss") {
    val fs = frames(100, 33, 7, 250, 61)
    val mp4 = Mp4.mux(32, 24, fps = 25, fs)
    val t = Mp4.samples(mp4).getOrElse(fail("refused"))
    assert(t.codec == "jpeg" && t.width == 32 && t.height == 24)
    assert(t.samples.length == 5)
    for ((s, i) <- t.samples.zipWithIndex) {
      assert(s.size == fs(i).length, s"size $i")
      assert(s.timeMs == i * 40L, s"time $i")
      assert(s.keyframe == (i % 3 == 0), s"key $i")
      val body = java.util.Arrays.copyOfRange(mp4, s.offset.toInt, (s.offset + s.size).toInt)
      assert(body.forall(_ == (i + 1).toByte), s"payload $i")
    }
    // the Meta parse still works on the same bytes
    val meta = Mp4.parse(mp4).getOrElse(fail("meta refused"))
    assert(meta.width.contains(32) && meta.height.contains(24))
    assert(meta.durationMs == 5 * 40L)
  }

  test("hand tables: multi-sample chunks, uniform stsz, absent stss, co64") {
    // build from the muxer then splice replacement tables
    def be32(v: Long): Array[Byte] = Array((v >>> 24).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(t: String, p: Array[Byte]): Array[Byte] =
      be32(8 + p.length) ++ t.getBytes("US-ASCII") ++ p
    def fullbox(t: String, p: Array[Byte]): Array[Byte] = box(t, be32(0) ++ p)
    // 6 samples of 10 bytes each in 2 chunks of 3 (run table with one
    // entry), uniform stsz, no stss, co64 offsets
    val mdatPayload = Array.tabulate(60)(i => (i / 10 + 1).toByte)
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0) ++ "isom".getBytes("US-ASCII"))
    val off1 = ftyp.length + 8L; val off2 = off1 + 30L
    val stsd = fullbox("stsd", be32(1) ++ (be32(86) ++ "jpeg".getBytes("US-ASCII") ++
      new Array[Byte](6) ++ Array[Byte](0, 1) ++ new Array[Byte](16) ++
      Array[Byte](0, 16, 0, 16) ++ new Array[Byte](50)))
    val stts = fullbox("stts", be32(1) ++ be32(6) ++ be32(100))
    val stsc = fullbox("stsc", be32(1) ++ be32(1) ++ be32(3) ++ be32(1))
    val stsz = fullbox("stsz", be32(10) ++ be32(6)) // uniform size 10
    val co64 = fullbox("co64", be32(2) ++ be32(0) ++ be32(off1) ++ be32(0) ++ be32(off2))
    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ co64)
    val mdhd = fullbox("mdhd", be32(0) ++ be32(0) ++ be32(1000) ++ be32(600) ++
      Array[Byte](0x55, (0xC4 - 256).toByte, 0, 0))
    val hdlr = fullbox("hdlr", be32(0) ++ "vide".getBytes("US-ASCII") ++
      new Array[Byte](13))
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", mdia)
    val mvhd = fullbox("mvhd", be32(0) ++ be32(0) ++ be32(1000) ++ be32(600) ++
      new Array[Byte](80))
    val moov = box("moov", mvhd ++ trak)
    val mp4 = ftyp ++ box("mdat", mdatPayload) ++ moov
    val t = Mp4.samples(mp4).getOrElse(fail("refused"))
    assert(t.samples.length == 6)
    assert(t.samples.forall(_.size == 10))
    assert(t.samples.forall(_.keyframe), "no stss: every sample is sync")
    assert(t.samples.map(_.timeMs) == Vector(0L, 100L, 200L, 300L, 400L, 500L))
    assert(t.samples.map(_.offset) ==
      Vector(off1, off1 + 10, off1 + 20, off2, off2 + 10, off2 + 20))
  }

  test("refusals: sample beyond file end, count mismatch, truncation, fuzz") {
    val good = Mp4.mux(16, 16, 25, frames(40, 40, 40))
    assert(Mp4.samples(good).isDefined)
    // corrupt one stco offset to point past the file
    val s = new String(good.map(_.toChar))
    val stcoAt = s.indexOf("stco")
    val bad = good.clone()
    bad(stcoAt + 12) = 0x7F // first offset's high byte → way out of range
    assert(Mp4.samples(bad).isEmpty)
    (1 until good.length by 13).foreach { n =>
      Mp4.samples(java.util.Arrays.copyOf(good, n)) // never throws
    }
    val rng = new scala.util.Random(17)
    (0 until 150).foreach { _ =>
      val junk = new Array[Byte](rng.nextInt(400)); rng.nextBytes(junk)
      Mp4.samples(junk)
      val mut = good.clone()
      mut(rng.nextInt(mut.length)) = rng.nextInt(256).toByte
      Mp4.samples(mut) // arbitrary corruption: never throws
    }
  }

  test("fragmented (round 17): moof/tfhd/tfdt/trun resolve; trex defaults; fuzz") {
    val frames = (0 until 5).map(f => Array.fill[Byte](10 + f)(f.toByte))
    val bytes = Mp4.muxFragmented(32, 24, fps = 25, frames, framesPerFragment = 2)
    val t = Mp4.samples(bytes).getOrElse(fail("fragmented refused"))
    assert(t.codec == "jpeg" && t.width == 32 && t.height == 24)
    assert(t.samples.length == 5)
    // payload slicing identity across fragments
    t.samples.zipWithIndex.foreach { case (s, i) =>
      assert(bytes.slice(s.offset.toInt, (s.offset + s.size).toInt).toSeq ==
        frames(i).toSeq, s"frame $i bytes")
    }
    // tfdt + trex default duration: 40 ms steps across fragments
    assert(t.samples.map(_.timeMs) == Vector(0L, 40L, 80L, 120L, 160L))
    // per-sample flags: every third GLOBAL frame sync
    assert(t.samples.map(_.keyframe) == Vector(true, false, false, true, false))
    // truncation + corruption never throw
    (1 until bytes.length by 11).foreach { n =>
      Mp4.samples(java.util.Arrays.copyOf(bytes, n))
    }
    val rng = new scala.util.Random(31)
    (0 until 150).foreach { _ =>
      val mut = bytes.clone()
      mut(rng.nextInt(mut.length)) = rng.nextInt(256).toByte
      Mp4.samples(mut)
    }
  }

  test("fragmented: first-sample-flags override and size-only truns") {
    // hand-build a moof whose trun uses first-sample-flags (0x04) and
    // per-sample sizes only — remaining flags come from trex (non-sync)
    def be32(v: Long): Array[Byte] = Array((v >>> 24).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(t: String, p: Array[Byte]): Array[Byte] =
      be32(8 + p.length) ++ t.getBytes("US-ASCII") ++ p
    val base = Mp4.muxFragmented(32, 24, fps = 25,
      Seq(Array.fill[Byte](4)(1)), framesPerFragment = 1)
    // locate the generated moof and REPLACE it with the hand variant
    val moofAt = {
      var i = 0; var found = -1
      while (found < 0 && i + 8 <= base.length) {
        if (new String(base, i + 4, 4, "US-ASCII") == "moof") found = i
        else i += (((base(i) & 0xFF) << 24) | ((base(i + 1) & 0xFF) << 16) |
          ((base(i + 2) & 0xFF) << 8) | (base(i + 3) & 0xFF))
      }
      found
    }
    val head = java.util.Arrays.copyOf(base, moofAt)
    val fA = Array.fill[Byte](6)(9)
    val fB = Array.fill[Byte](7)(8)
    def trun(dataOffset: Long) = box("trun", be32(0x01L | 0x04L | 0x200L) ++
      be32(2) ++ be32(dataOffset) ++ be32(0L) ++ // firstFlags = SYNC
      be32(fA.length) ++ be32(fB.length))
    def moof(off: Long) = box("moof",
      box("mfhd", be32(0) ++ be32(1)) ++
        box("traf", box("tfhd", be32(0x20000L) ++ be32(1)) ++
          box("tfdt", be32(0) ++ be32(0)) ++ trun(off)))
    val m = moof(moof(0).length + 8L)
    val full = head ++ m ++ box("mdat", fA ++ fB)
    val t = Mp4.samples(full).getOrElse(fail("hand fragment refused"))
    assert(t.samples.length == 2)
    assert(full.slice(t.samples(0).offset.toInt,
      (t.samples(0).offset + t.samples(0).size).toInt).toSeq == fA.toSeq)
    assert(full.slice(t.samples(1).offset.toInt,
      (t.samples(1).offset + t.samples(1).size).toInt).toSeq == fB.toSeq)
    // firstFlags made sample 0 sync; sample 1 inherits trex non-sync
    assert(t.samples.map(_.keyframe) == Vector(true, false))
    // trex default duration drives the timing
    assert(t.samples.map(_.timeMs) == Vector(0L, 40L))
  }
}
