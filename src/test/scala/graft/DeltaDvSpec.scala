package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.DeltaDv

/** Deletion-vector plumbing below the DeltaLog surface: Z85, the
  * portable RoaringBitmapArray layout (array / bitmap / run
  * containers, multi-key, multi-bitmap), and the DV file wrapper
  * (version byte, big-endian length, CRC-32). Pure JVM — no Spark. */
class DeltaDvSpec extends AnyFunSuite {

  // --- Z85 ---

  test("Z85 round-trips the ZeroMQ spec test vector") {
    // rfc.zeromq.org/spec/32: 0x86 0x4F 0xD2 0x6F 0xB5 0x59 0xF7 0x5B == "HelloWorld"
    val bytes = Array(0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B).map(_.toByte)
    assert(DeltaDv.z85Encode(bytes) == "HelloWorld")
    assert(DeltaDv.z85Decode("HelloWorld").sameElements(bytes))
  }

  test("Z85 pads non-multiple-of-4 input with zeros; decode refuses bad lengths/chars") {
    val enc = DeltaDv.z85Encode(Array[Byte](1, 2, 3))
    assert(enc.length == 5)
    assert(DeltaDv.z85Decode(enc).sameElements(Array[Byte](1, 2, 3, 0)))
    intercept[GraftAnalysisException] { DeltaDv.z85Decode("abcd") }
    intercept[GraftAnalysisException] { DeltaDv.z85Decode("abc~d") } // ~ not in Z85
  }

  // --- RoaringBitmapArray portable format ---

  private def roundTrip(pos: Seq[Long], useRuns: Boolean = false): Seq[Long] =
    DeltaDv.positions(DeltaDv.serialize(pos, useRuns)).toSeq

  test("array containers: small sparse sets round-trip sorted and deduplicated") {
    assert(roundTrip(Seq(5L, 1L, 5L, 99L, 70000L)) == Seq(1L, 5L, 99L, 70000L))
    assert(roundTrip(Seq.empty) == Seq.empty)
  }

  test("bitmap containers: >4096 values in one 64Ki chunk round-trip") {
    val dense = (0L until 5000L).map(_ * 2) // card 5000 > 4096 → bitmap container
    assert(roundTrip(dense) == dense)
  }

  test("run containers: consecutive runs round-trip under the run-cookie layout") {
    val runs = (100L to 600L) ++ (70000L to 70010L) ++ Seq(131071L)
    assert(roundTrip(runs, useRuns = true) == runs.sorted)
    // and the run encoding is actually exercised: smaller than array form
    assert(DeltaDv.serialize(runs, useRuns = true).length <
      DeltaDv.serialize(runs, useRuns = false).length)
  }

  test("multiple keys force the offset header path (NO_OFFSET_THRESHOLD=4)") {
    val spread = Seq(1L, 65536L + 2, 2 * 65536L + 3, 3 * 65536L + 4, 4 * 65536L + 5)
    assert(roundTrip(spread) == spread)
    assert(roundTrip(spread, useRuns = true) == spread)
  }

  test("values above 2^32 span multiple bitmaps in the array") {
    val multi = Seq(7L, (1L << 32) + 3, (1L << 32) + 9, (2L << 32) + 1)
    assert(roundTrip(multi) == multi)
  }

  test("positions refuses bad magic and truncation") {
    intercept[GraftAnalysisException] { DeltaDv.positions(Array[Byte](1, 2, 3, 4, 0, 0, 0, 0, 0, 0, 0, 0)) }
    val good = DeltaDv.serialize(Seq(1L, 2L, 3L))
    intercept[GraftAnalysisException] { DeltaDv.positions(good.dropRight(2)) }
  }

  // --- DV file wrapper + descriptor access ---

  private def tmpDir() = java.nio.file.Files.createTempDirectory("graft-dv").toFile

  test("on-disk DV: version byte, offsets, big-endian length, CRC verify; corruption refuses") {
    val dir = tmpDir()
    val a = DeltaDv.serialize(Seq(0L, 2L, 4L))
    val b = DeltaDv.serialize(Seq(1L, 3L))
    val f = new java.io.File(dir, "dv.bin")
    val offs = DeltaDv.writeDvFile(f, Seq(a, b))
    assert(offs == Seq(1L, 1L + 4 + a.length + 4))
    def desc(off: Long, size: Long) = DeltaDv.Descriptor("p", f.getAbsolutePath, Some(off), size, 0)
    assert(DeltaDv.positions(DeltaDv.load(dir.getAbsolutePath, desc(offs(0), a.length))).toSeq == Seq(0L, 2L, 4L))
    assert(DeltaDv.positions(DeltaDv.load(dir.getAbsolutePath, desc(offs(1), b.length))).toSeq == Seq(1L, 3L))
    // descriptor size mismatch refuses
    intercept[GraftAnalysisException] { DeltaDv.load(dir.getAbsolutePath, desc(offs(0), a.length + 1)) }
    // flip a payload byte: CRC mismatch refuses
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    bytes(6) = (bytes(6) ^ 0x40).toByte
    java.nio.file.Files.write(f.toPath, bytes)
    intercept[GraftAnalysisException] { DeltaDv.load(dir.getAbsolutePath, desc(offs(0), a.length)) }
    // bad version byte refuses
    bytes(6) = (bytes(6) ^ 0x40).toByte; bytes(0) = 2
    java.nio.file.Files.write(f.toPath, bytes)
    intercept[GraftAnalysisException] { DeltaDv.load(dir.getAbsolutePath, desc(offs(0), a.length)) }
  }

  test("'u' storage: Z85 UUID tail maps to <prefix>/deletion_vector_<uuid>.bin") {
    val uuid = new java.util.UUID(0x0123456789ABCDEFL, 0xFEDCBA9876543210L)
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits)
    val enc = DeltaDv.z85Encode(bb.array())
    assert(enc.length == 20)
    assert(DeltaDv.uPath("/tbl", "ab" + enc) == s"/tbl/ab/deletion_vector_$uuid.bin")
    assert(DeltaDv.uPath("/tbl", enc) == s"/tbl/deletion_vector_$uuid.bin")
    // end-to-end: write under the prefix dir, load via a 'u' descriptor
    val dir = tmpDir()
    new java.io.File(dir, "ab").mkdirs()
    val data = DeltaDv.serialize(Seq(5L, 6L))
    val offs = DeltaDv.writeDvFile(
      new java.io.File(dir, s"ab/deletion_vector_$uuid.bin"), Seq(data))
    val d = DeltaDv.Descriptor("u", "ab" + enc, Some(offs(0)), data.length, 2)
    assert(DeltaDv.positions(DeltaDv.load(dir.getAbsolutePath, d)).toSeq == Seq(5L, 6L))
  }

  test("'i' storage: inline Z85 payload, sizeInBytes trims the pad") {
    val data = DeltaDv.serialize(Seq(9L, 11L, 13L))
    val d = DeltaDv.Descriptor("i", DeltaDv.z85Encode(data), None, data.length, 3)
    assert(DeltaDv.positions(DeltaDv.load("/nowhere", d)).toSeq == Seq(9L, 11L, 13L))
    intercept[GraftAnalysisException] {
      DeltaDv.load("/nowhere", d.copy(storageType = "x"))
    }
  }
}
