package graft

import graft.ops.Bzip2Codec
import org.apache.commons.compress.compressors.bzip2.{BZip2CompressorInputStream, BZip2CompressorOutputStream}
import org.scalatest.funsuite.AnyFunSuite

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** From-spec bzip2 decoder pinned against commons-compress (the
  * independent implementation on the Spark classpath) as the
  * hostile-grade encoder across every block size, multi-block
  * streams, CRC tamper gates, and fuzz.
  */
class Bzip2Spec extends AnyFunSuite {

  private val rnd = new scala.util.Random(77)

  private def cc(data: Array[Byte], level: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new BZip2CompressorOutputStream(bos, level)
    z.write(data); z.close()
    bos.toByteArray
  }

  private def prose(n: Int): Array[Byte] = {
    val words = Array("the", "quick", "brown", "wiki", "dump", "block", "sort", "bwt")
    val sb = new StringBuilder
    while (sb.length < n) {
      sb.append(words(rnd.nextInt(words.length))).append(' ')
      if (rnd.nextInt(15) == 0) sb.append('\n')
    }
    sb.substring(0, n).getBytes("UTF-8")
  }

  private val fixtures: Seq[(String, Array[Byte])] = Seq(
    "empty" -> Array.emptyByteArray,
    "one byte" -> Array[Byte](42),
    "short" -> "hello bzip2 world".getBytes("UTF-8"),
    "zeros 50k" -> new Array[Byte](50000),
    "fours" -> Array.fill[Byte](4)(9), // exactly one RLE group, no count emitted? (encoder decides)
    "rle edge 259" -> Array.fill[Byte](259)(7), // 4 + 255-count boundary
    "random 40k" -> Array.fill[Byte](40960)(rnd.nextInt().toByte),
    "prose 4k" -> prose(4096),
    "prose 300k (spans blocks at level 1)" -> prose(300000),
    "all bytes" -> Array.tabulate[Byte](4096)(i => i.toByte)
  )

  test("decode round-trips commons-compress output at every block size") {
    for ((name, data) <- fixtures; level <- Seq(1, 5, 9)) {
      val z = cc(data, level)
      val got = Bzip2Codec.decode(z)
      assert(got.isDefined, s"$name level=$level refused")
      assert(java.util.Arrays.equals(got.get, data), s"$name level=$level mismatched")
    }
  }

  test("multi-block streams: level 1 with > 100k input exercises the combined CRC") {
    val data = prose(250000) // 3 blocks at level 1
    val z = cc(data, 1)
    assert(Bzip2Codec.decode(z).exists(java.util.Arrays.equals(_, data)))
  }

  test("tamper gates: block CRC, combined CRC, header, truncation all refuse") {
    val data = prose(5000)
    val z = cc(data, 9)
    // flip a payload byte mid-stream → block CRC (or the Huffman walk) catches it
    val mid = z.clone(); mid(z.length / 2) = (mid(z.length / 2) ^ 0x10).toByte
    assert(Bzip2Codec.decode(mid).isEmpty)
    val hdr = z.clone(); hdr(3) = '0'
    assert(Bzip2Codec.decode(hdr).isEmpty)
    for (cut <- Seq(2, 5, 20, z.length / 2, z.length - 1))
      assert(Bzip2Codec.decode(z.take(cut)).isEmpty, s"accepted truncation at $cut")
  }

  test("fuzz: random buffers never throw") {
    for (_ <- 0 until 300) {
      val junk = Array.fill[Byte](rnd.nextInt(500))(rnd.nextInt().toByte)
      Bzip2Codec.decode(junk)
      val framed = "BZh5".getBytes ++ junk
      Bzip2Codec.decode(framed)
    }
  }

  test("cross-check: our decode output re-compresses to the same bytes via commons-compress") {
    val data = prose(20000)
    val got = Bzip2Codec.decode(cc(data, 5)).get
    val in = new BZip2CompressorInputStream(new ByteArrayInputStream(cc(got, 5)))
    assert(java.util.Arrays.equals(in.readAllBytes(), data))
  }
}
