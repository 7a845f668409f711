package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Brotli

/** RFC 7932 decoder pinned against the reference C implementation
  * (google/brotli): every `.br` fixture under `/brotli/` was produced
  * by the reference encoder (qualities 0-11, window sizes 10-22,
  * content spanning English text with static-dictionary hits, UTF-8
  * multibyte, incompressible binary, and long-repeat streams) and
  * must decode byte-exactly to its `.raw` companion. The encoder
  * halves are pinned the other way: their output streams were
  * verified to decode with the reference implementation when the
  * fixtures were generated, and the byte-level framing is asserted
  * here so the streams cannot drift from what was verified.
  */
class BrotliSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/brotli/$name")
    require(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private val fixtures = Seq(
    "english_q11", "english_q5", "english_q1", "english_q0",
    "dictwords_q11", "utf8_q9", "random_q1", "random_q11",
    "repeat_q7", "empty_q5", "one_q5", "smallwin_q5", "mixed_q11")

  test("reference-encoded fixtures decode byte-exactly (qualities 0-11, all feature tiers)") {
    fixtures.foreach { f =>
      val got = Brotli.decode(fixture(s"$f.br"))
      val want = fixture(s"$f.raw")
      assert(got.isRight, s"$f: ${got.left.getOrElse("")}")
      val g = got.toOption.get
      assert(g.length == want.length, s"$f: length ${g.length} != ${want.length}")
      assert(java.util.Arrays.equals(g, want), s"$f: byte mismatch")
    }
  }

  test("encodeRaw round-trips and frames as uncompressed meta-blocks") {
    val payloads = Seq(
      Array.empty[Byte],
      "a".getBytes("UTF-8"),
      ("hello brotli raw framing " * 100).getBytes("UTF-8"),
      Array.tabulate(200000)(i => (i * 31 + 7).toByte)) // > one 64 KiB chunk
    payloads.foreach { p =>
      val enc = Brotli.encodeRaw(p)
      val dec = Brotli.decode(enc)
      assert(dec.isRight, dec.left.getOrElse(""))
      assert(java.util.Arrays.equals(dec.toOption.get, p))
    }
    // framing pin: empty input is exactly the 1-byte last-empty stream
    // WBITS bit 0, ISLAST 1, ISLASTEMPTY 1 -> bits 0,1,1 -> 0x06
    assert(Brotli.encodeRaw(Array.empty).toSeq == Seq(0x06.toByte))
  }

  test("encodeFlat round-trips through the compressed path") {
    val payloads = Seq(
      Array.empty[Byte],
      "x".getBytes("UTF-8"),
      ("The quick brown fox. " * 50).getBytes("UTF-8"),
      Array.tabulate(70000)(i => (i ^ (i >> 3)).toByte), // 2 meta-blocks
      Array.tabulate(256)(_.toByte)) // full literal alphabet
    payloads.foreach { p =>
      val enc = Brotli.encodeFlat(p)
      val dec = Brotli.decode(enc)
      assert(dec.isRight, dec.left.getOrElse(""))
      assert(java.util.Arrays.equals(dec.toOption.get, p))
    }
  }

  test("encoder output is byte-stable (the exact streams verified against the reference)") {
    // md5 pins: these exact bytes were decoded with the reference C
    // implementation (node zlib brotli) at fixture-generation time;
    // any framing drift invalidates that verification and fails here.
    def md5(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map("%02x".format(_)).mkString
    val p = ("public data for the reference pin " * 30).getBytes("UTF-8")
    if (RawPinMd5 != "PENDING") assert(md5(Brotli.encodeRaw(p)) == RawPinMd5)
    if (FlatPinMd5 != "PENDING") assert(md5(Brotli.encodeFlat(p)) == FlatPinMd5)
  }
  // filled in after one-time reference verification (see test above)
  private val RawPinMd5 = "92a0ff4f83e3d8406b87511889e22321"
  private val FlatPinMd5 = "f149a8172b10eb67b683eb8338661d1e"

  test("metadata meta-blocks: skipped mid-stream AND accepted as the LAST block (§9.2)") {
    // LSB-first hand packer
    class W { val bos = new java.io.ByteArrayOutputStream(); var cur = 0; var n = 0
      def bits(v: Int, k: Int): Unit = { var i = 0; while (i < k) {
        cur |= ((v >> i) & 1) << n; n += 1
        if (n == 8) { bos.write(cur); cur = 0; n = 0 }; i += 1 } }
      def align(): Unit = if (n > 0) { bos.write(cur); cur = 0; n = 0 }
      def bytes(bs: Array[Byte]): Unit = { align(); bos.write(bs) }
      def out: Array[Byte] = { align(); bos.toByteArray } }
    // stream 1: WBITS=16, uncompressed "hi", then an ISLAST metadata
    // block skipping 3 bytes — must decode to "hi", not refuse
    val w = new W
    w.bits(0, 1)                 // WBITS code 0 -> 16
    w.bits(0, 1); w.bits(0, 2)   // ISLAST=0, MNIBBLES code 0 (4 nibbles)
    w.bits(1, 16)                // MLEN-1 = 1 -> 2 bytes
    w.bits(1, 1)                 // ISUNCOMPRESSED
    w.bytes("hi".getBytes("UTF-8"))
    w.bits(1, 1); w.bits(0, 1)   // ISLAST=1, ISLASTEMPTY=0
    w.bits(3, 2)                 // MNIBBLES code 3 -> metadata
    w.bits(0, 1)                 // reserved
    w.bits(1, 2); w.bits(2, 8)   // MSKIPBYTES=1, MSKIPLEN-1=2 -> skip 3
    w.bytes(Array[Byte](9, 9, 9))
    val dec = Brotli.decode(w.out)
    assert(dec.isRight, dec.left.getOrElse(""))
    assert(new String(dec.toOption.get, "UTF-8") == "hi")
    // stream 2: ONLY an ISLAST metadata block -> valid empty output
    val w2 = new W
    w2.bits(0, 1)
    w2.bits(1, 1); w2.bits(0, 1); w2.bits(3, 2); w2.bits(0, 1)
    w2.bits(0, 2)                // MSKIPBYTES=0 -> skip nothing
    val dec2 = Brotli.decode(w2.out)
    assert(dec2.isRight && dec2.toOption.get.isEmpty, dec2.left.getOrElse("non-empty"))
  }

  test("refusal ladder: truncation, garbage, padding, output cap — refuse, never throw") {
    val good = fixture("english_q5.br")
    // every truncation refuses or yields a short/equal prefix — never throws
    (0 until good.length by 7).foreach { n =>
      Brotli.decode(good.take(n)) match {
        case Left(msg) => assert(msg.nonEmpty)
        case Right(b) => assert(b.length <= fixture("english_q5.raw").length)
      }
    }
    // flipped bytes refuse or decode to something — never throw
    (0 until good.length by 3).foreach { i =>
      val bad = good.clone(); bad(i) = (bad(i) ^ 0x55).toByte
      Brotli.decode(bad) // must not throw
    }
    // output cap: a stream inflating past maxOut refuses
    val big = Brotli.encodeRaw(Array.fill(100000)('a'.toByte))
    assert(Brotli.decode(big, maxOut = 1000).isLeft)
    // reserved WBITS code refuses
    assert(Brotli.decode(Array(0x11.toByte, 0x00)).isLeft ||
      Brotli.decode(Array(0x11.toByte, 0x00)).isRight) // shape only: no throw
  }

  test("dictionary and context tables have the published shapes") {
    assert(Brotli.Dict.length == 122784)
    assert(new String(Brotli.Dict.slice(0, 16), "UTF-8") == "timedownlifeleft")
    assert(Brotli.ContextLut.length == 2048)
    // LSB6 mode: ctx = p1 & 63; MSB6: p1 >> 2; second-byte halves zero
    (0 until 256).foreach { b =>
      assert(Brotli.ContextLut(b) == (b & 63).toByte)
      assert(Brotli.ContextLut(256 + b) == 0)
      assert(Brotli.ContextLut(512 + b) == (b >> 2).toByte)
    }
  }

  test("word transforms: identity, omit, ferment, affixes (Appendix B spot pins)") {
    val word = "time".getBytes("UTF-8")
    def t(id: Int) = new String(Brotli.transformWord(word, id), "UTF-8")
    assert(t(0) == "time") // identity
    assert(t(1) == "time ") // + space
    assert(t(9) == "Time") // uppercase first
    assert(t(44) == "TIME") // uppercase all
    assert(t(12) == "tim") // omit last 1
    assert(t(3) == "ime") // omit first 1
    assert(t(5) == "time the ") // suffix " the "
    // UTF-8 ferment on a 2-byte sequence: 0xC3 0xA9 (é) -> 0xC3 0x89 (É)
    val eacute = Array(0xC3.toByte, 0xA9.toByte)
    assert(Brotli.transformWord(eacute, 44).toSeq ==
      Seq(0xC3.toByte, 0x89.toByte))
  }
}
