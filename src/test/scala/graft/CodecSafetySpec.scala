package graft

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{JpegCodec, PngCodec}

/** Regression tests for two codec-hardening findings:
  *
  *  1. PNG: a crafted IHDR whose `(rowBytes + 1) * height` product
  *     wraps a 64-bit signed integer must be refused by the
  *     MaxPixelBytes cap, not slip past it as a negative length and
  *     throw NegativeArraySizeException inside a Spark task.
  *  2. JPEG: baseline files may legally carry one non-interleaved
  *     scan per component (T.81 allows up to 3 scans in a baseline
  *     frame). The decoder must decode ALL scans before finishing —
  *     and refuse a file whose scans do not cover every component —
  *     rather than returning after the first SOS with the remaining
  *     components' coefficients silently zero.
  */
class CodecSafetySpec extends AnyFunSuite {

  // ------------------------------------------------------------- PNG

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def pngChunk(ctype: String, data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(be32(data.length))
    val tb = ctype.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    bos.write(tb)
    bos.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(data)
    bos.write(be32(crc.getValue))
    bos.toByteArray
  }

  test("PNG: IHDR sized to wrap (rowBytes+1)*height past Long.Max is refused, not thrown") {
    // width 2^31-1, RGBA, height 2^30: rowBytes+1 ≈ 2^33, times height
    // ≈ 2^63 — wraps negative, so the naive `rawLen > cap` check passes
    val ihdr = pngChunk("IHDR", Array[Byte](
      0x7F, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte, // width  = 2^31 - 1
      0x40, 0x00, 0x00, 0x00,                      // height = 2^30
      8, 6, 0, 0, 0))                              // depth 8, RGBA, no interlace
    val idat = pngChunk("IDAT", Array[Byte](0x78, 0x9C.toByte))
    val iend = pngChunk("IEND", Array.emptyByteArray)
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val bytes = sig ++ ihdr ++ idat ++ iend
    // must return None from the size cap — never NegativeArraySizeException
    assert(PngCodec.decode(bytes).isEmpty)
    // sanity: moderately-large-but-sane dims also refused by the same cap
    val ihdr2 = pngChunk("IHDR",
      be32(65535) ++ be32(65535) ++ Array[Byte](8, 6, 0, 0, 0))
    assert(PngCodec.decode(sig ++ ihdr2 ++ idat ++ iend).isEmpty)
  }

  // ------------------------------------------------------------ JPEG

  /** Hand-assembled 8×8 baseline JPEG, 3 components at 1×1 sampling,
    * one NON-interleaved scan per component (every coefficient zero:
    * each block's entropy data is DC-symbol-0 + AC-EOB, both coded
    * with a one-entry Huffman table = single 0 bit each). Decodes to
    * a uniform mid-grey: Y = Cb = Cr = 128 after level shift.
    */
  private def multiScanBaseline(scans: Seq[Int]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def w(bs: Int*): Unit = bs.foreach(b => bos.write(b & 0xFF))
    w(0xFF, 0xD8) // SOI
    // DQT: table 0, all ones
    w(0xFF, 0xDB, 0x00, 0x43, 0x00)
    (0 until 64).foreach(_ => w(0x01))
    // SOF0: 8-bit, 8×8, 3 components, ids 1/2/3, sampling 1×1, qt 0
    w(0xFF, 0xC0, 0x00, 0x11, 0x08, 0x00, 0x08, 0x00, 0x08, 0x03)
    Seq(1, 2, 3).foreach(id => w(id, 0x11, 0x00))
    // DHT: DC table 0 and AC table 0, each one code of length 1 for symbol 0
    for (tcth <- Seq(0x00, 0x10)) {
      w(0xFF, 0xC4, 0x00, 0x14, tcth, 0x01)
      (0 until 15).foreach(_ => w(0x00))
      w(0x00) // the single symbol: 0
    }
    // one non-interleaved scan per requested component id
    scans.foreach { id =>
      w(0xFF, 0xDA, 0x00, 0x08, 0x01, id, 0x00, 0x00, 0x3F, 0x00)
      // entropy: 1 block = DC sym 0 ("0") + AC EOB ("0"), pad with 1s
      w(0x3F)
    }
    w(0xFF, 0xD9) // EOI
    bos.toByteArray
  }

  test("JPEG: baseline with one scan per component decodes all three planes") {
    val img = JpegCodec.decode(multiScanBaseline(Seq(1, 2, 3)))
    assert(img.isDefined, "spec-legal multi-scan baseline must decode")
    val m = img.get
    assert(m.width == 8 && m.height == 8 && m.channels == 3)
    // all-zero coefficients in all THREE planes → uniform 128,128,128 RGB.
    // (The pre-fix decoder returned after the first SOS with chroma
    // coefficients zeroed only by allocation — same numbers here, but
    // the bitstream for components 2 and 3 was never consumed.)
    assert(m.pixels.forall(b => (b & 0xFF) == 128),
      s"expected uniform grey, got ${m.pixels.take(6).map(_ & 0xFF).mkString(",")}")
  }

  test("JPEG: baseline whose scans do not cover every component is refused") {
    assert(JpegCodec.decode(multiScanBaseline(Seq(1))).isEmpty,
      "1-of-3 scans must not finish with silently-zero chroma")
    assert(JpegCodec.decode(multiScanBaseline(Seq(1, 2))).isEmpty,
      "2-of-3 scans must not finish with a silently-zero component")
    // coverage is by component, not scan count: a duplicate scan of an
    // already-covered component still leaves component 3 undecoded
    assert(JpegCodec.decode(multiScanBaseline(Seq(1, 2, 2))).isEmpty)
  }
}
