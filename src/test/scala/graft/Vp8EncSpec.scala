package graft

import graft.ops.{Vp8, Vp8Enc}
import org.scalatest.funsuite.AnyFunSuite

/** The VP8 encoder/decoder differential, committed: every crafted
  * stream in [[Vp8Cases]] (367 cases — per-feature isolation probes
  * plus full-feature content) must decode through [[Vp8]] back to
  * exactly the planes the encoder tracked during encoding, and a
  * representative subset is pinned by md5 digest of BOTH the stream
  * bytes and the decoded planes. Those digest pins are the committed
  * form of an independent-reference check: each pinned (webp, yuv)
  * pair was verified byte-exact against the system libwebp's
  * `WebPDecodeYUV` via the [[Vp8Diff]] harness (all 367 cases, zero
  * mismatches), so a regression in either the encoder's determinism
  * or the decoder's arithmetic breaks a digest that reference
  * hardware agreed with. */
class Vp8EncSpec extends AnyFunSuite {

  test("every crafted stream round-trips byte-exactly through the decoder") {
    for ((name, w, h, f, params) <- Vp8Cases.all) {
      val (y, u, v) = Vp8Cases.gray(w, h, f)
      val enc = Vp8Enc.encode(w, h, y, u, v, params)
      val fr = Vp8.decode(enc.webp).getOrElse(fail(s"$name: own decode refused"))
      assert(java.util.Arrays.equals(fr.y, enc.y), s"$name: Y plane")
      assert(java.util.Arrays.equals(fr.u, enc.u), s"$name: U plane")
      assert(java.util.Arrays.equals(fr.v, enc.v), s"$name: V plane")
    }
  }

  // (name, md5(stream bytes), md5(y ++ u ++ v)) — generated from a
  // run where libwebp decoded every stream to the identical planes
  private val pins = Seq(
    ("flat", "c1562cffd2384fc11752fa6368faa70d", "b8a24b9e33b5b90ed627a72133cb9d74"),
    ("grad-dc", "e97028f0b85d0ce215a94614d196a18b", "bd5ed0fb87ff649aeb9fcb787019ba07"),
    ("noise-lowq", "b467614543ce98cb0d1b4d474707dffc", "b79165060eaeca8e840ef7820717c0f5"),
    ("noise-hiq", "cd0a1070235442f6b68c518a117b3a94", "6abe262671dfeb9a99a1c0d2aa75d7b3"),
    ("qi0", "a7dc8605276d24b235083ee448f86601", "13c76a998a22a6f35f640cf254f23491"),
    ("qi127", "322ce23a30639fb3bb6e1eeda93ebdbb", "ae919b100ee3b02848fddb1137eabe18"),
    ("uvclamp", "b895041ff43e2bb7461eb59e4294a228", "8709aa922483acc47eda9432ce4f7f85"),
    ("oddsize", "2b13759b3be7e9775bf45174b533ebff", "bb8e133585c0339fe32f1381893611e0"),
    ("row1", "1fdc4f5fa550c27f662a9e1c2cb72cfe", "5dc02322749656281b71d9c66846417f"),
    ("px1", "1cab292af434c9a987d1d349104d5bcb", "3a2c78195fcae43c748c4ed4d8af9ca7"),
    ("bpred-all", "736437ca59a5c8a47652ab2e8ad56f70", "a3f01ba943a5ac17a6adad5a82973154"),
    ("bpred-noise", "928649374206537a1662b526d5f89c32", "c1f455315509370a1b97adc910da6c99"),
    ("bpred-mix", "4b479117412dc358a6f32f650a6a9a2c", "014182ded5d4d09cce3b7382044bbb49"),
    ("lf-25-3", "7922cd3c999e70b79bf15d0840395911", "f4f788de5a5b12c251e51807be5111ee"),
    ("lf-63-7", "c2f02937c9f20819a9a84c01239cd496", "f4f788de5a5b12c251e51807be5111ee"),
    ("lfsimple-40", "5919dd2a0011b4ef9cd0d38a35d1d451", "f4f788de5a5b12c251e51807be5111ee"),
    ("lf-active", "d3710047d4682bd0ab04b5f231b74dbb", "5396e6a34a6db4d5f94672fb5b9c7453"),
    ("lf-active-sharp", "c65a41ea53d2476794f30d2287499803", "eabe6aeb5329c9bae54c313e6ade6552"),
    ("lf-active-simple", "73f276368ccf16cdb92049af23bcf53e", "4a056d8cd6f5d7961ea064d697f36e0d"),
    ("lf-bpred", "04c2302153c51779c23bd6366b90a16b", "1cdc195d5567974f57aa1bd76d260d72"),
    ("seg", "505f191886a6983feee332a137552f30", "67c66b113c0079965760f7bba4119127"),
    ("nparts-4", "5bbf0e9de32e0ddf87bd95112a75705b", "353625acdce244982e287cc0ec58e8d2"),
    ("skips", "0b7b0acdb170ab096606896a198c369b", "9c15cfb7ea31d29298a90eb23d4f506f"),
    ("b1-4", "665a47e3a229d3994ff82f8199e70cc6", "ebb89a61e663b0505851ee20d2acb25f"),
    ("b1-5", "d962147e8d94d3e24ee373468bf42c4e", "617e84222d923ac9a16a87c0649c2116"),
    ("b1-6", "d38f53d056004efd28b666169bf8a1f5", "d9e96ca82c90d4d876b35642bad10deb"),
    ("b1-9", "076089ddbf70f3888577114cb0329312", "6f0483d0cf3daf917da74f667a425c19")
  )

  test("libwebp-verified digest pins: stream bytes and decoded planes") {
    val byName = Vp8Cases.all.map(c => c._1 -> c).toMap
    def md5(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map(x => f"${x & 0xFF}%02x").mkString
    for ((name, wantWebp, wantYuv) <- pins) {
      val (_, w, h, f, params) = byName(name)
      val (y, u, v) = Vp8Cases.gray(w, h, f)
      val enc = Vp8Enc.encode(w, h, y, u, v, params)
      assert(md5(enc.webp) == wantWebp, s"$name: stream digest")
      val fr = Vp8.decode(enc.webp).getOrElse(fail(s"$name: decode refused"))
      assert(md5(fr.y ++ fr.u ++ fr.v) == wantYuv, s"$name: plane digest")
    }
  }

  // (name, md5(container), md5(expected RGBA)) — every (alpha filter,
  // alpha compression) combination at two sizes, each container
  // decoded by libwebp's WebPDecodeRGBA to the identical RGBA during
  // the Vp8Diff cross-check run (this includes filter method 2, which
  // the reference encoder's own heuristic rarely emits)
  private val alphaPins = Seq(
    ("alpha-0-0-32x32", "b22640d30ff4c7b076290684f25f5702", "4ec3117ae8d488491c010f6ab9c01dee"),
    ("alpha-0-0-33x17", "f977cdf18f70ed5b3522d8214834bd3d", "e389813338fd01e0d6d5d42060e6943d"),
    ("alpha-0-1-32x32", "a02688e17ceac5df24e8db98c0db063f", "4ec3117ae8d488491c010f6ab9c01dee"),
    ("alpha-0-1-33x17", "f2ee8f8804d58c43ee12088aefe3a638", "e389813338fd01e0d6d5d42060e6943d"),
    ("alpha-1-0-32x32", "0e88d9c2a7a5e8aaa9870664c25a4fa4", "4ec3117ae8d488491c010f6ab9c01dee"),
    ("alpha-1-0-33x17", "cc25a6d4e8892e7c97da6db47102d29f", "e389813338fd01e0d6d5d42060e6943d"),
    ("alpha-1-1-32x32", "a0eed38b251d8cb7c5eafa8edcf608c2", "4ec3117ae8d488491c010f6ab9c01dee"),
    ("alpha-1-1-33x17", "40ca65f785b324a9ca8b5dddb3e408b1", "e389813338fd01e0d6d5d42060e6943d"),
    ("alpha-2-0-32x32", "a011b3453d2890d15a50e2ce16ba10d9", "4ec3117ae8d488491c010f6ab9c01dee"),
    ("alpha-2-0-33x17", "4b1f9a598a9fb36ab06e25bd626ecf7c", "e389813338fd01e0d6d5d42060e6943d"),
    ("alpha-2-1-32x32", "885793b393991ab82aa2b5ea6b55f8b8", "4ec3117ae8d488491c010f6ab9c01dee"),
    ("alpha-2-1-33x17", "9b44fc879a2aaec32d0ce88ef965799d", "e389813338fd01e0d6d5d42060e6943d"),
    ("alpha-3-0-32x32", "e6ac1c68382f0dd7b033a9d5e45ba2b0", "4ec3117ae8d488491c010f6ab9c01dee"),
    ("alpha-3-0-33x17", "76344281d91450e6a853dcdace29bff9", "e389813338fd01e0d6d5d42060e6943d"),
    ("alpha-3-1-32x32", "0f68f28f67a19707863f44db39eb2cbd", "4ec3117ae8d488491c010f6ab9c01dee"),
    ("alpha-3-1-33x17", "64ffa0388e184b87ae62eb8c21aa13bb", "e389813338fd01e0d6d5d42060e6943d")
  )

  test("libwebp-verified ALPH pins: every alpha filter x compression combination") {
    def md5(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map(x => f"${x & 0xFF}%02x").mkString
    for ((name, wantWebp, wantRgba) <- alphaPins) {
      val parts = name.stripPrefix("alpha-").split("[-x]")
      val (filter, compress, w, h) = (parts(0).toInt, parts(1).toInt, parts(2).toInt, parts(3).toInt)
      val (container, rgba) = Vp8Cases.alphaCase(filter, compress, w, h)
      assert(md5(container) == wantWebp, s"$name: container digest")
      assert(md5(rgba) == wantRgba, s"$name: expected-RGBA digest")
      val img = graft.ops.WebpCodec.decode(container).getOrElse(fail(s"$name: decode refused"))
      assert(img.channels == 4 && java.util.Arrays.equals(img.pixels, rgba), s"$name: decode")
    }
  }

  test("the three filter-active cases actually change pixels (filter is not a no-op)") {
    for (name <- Seq("lf-active", "lf-active-sharp", "lf-active-simple")) {
      val (_, w, h, f, params) = Vp8Cases.all.find(_._1 == name).get
      val (y, u, v) = Vp8Cases.gray(w, h, f)
      val withLf = Vp8Enc.encode(w, h, y, u, v, params)
      val noLf = Vp8Enc.encode(w, h, y, u, v, params.copy(filterLevel = 0))
      // same quantized coefficients, filter on vs off: planes differ
      assert(!java.util.Arrays.equals(
        Vp8.decode(withLf.webp).get.y, Vp8.decode(noLf.webp).get.y), name)
    }
  }
}
