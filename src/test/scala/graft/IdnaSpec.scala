package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Idna

/** Punycode (RFC 3492) pinned against the spec's §7.1 sample vectors
  * and cross-pinned against `java.net.IDN` — the JDK's independent
  * IDNA implementation — on both fixed labels and generated
  * multi-script strings; plus the host ToASCII seam the PSL and URL
  * normalizers consume.
  */
class IdnaSpec extends AnyFunSuite {

  test("RFC 3492 §7.1 sample vectors encode and decode exactly") {
    // (A) Arabic (Egyptian), (B) Chinese (simplified), (L) 3<nen>B<gumi>...
    val vectors = Seq(
      "ليهمابتكل" +
        "موشعربي؟" -> "egbpdaj6bu4bxfgehfvwxn",
      "他们为什么不说中文" -> "ihqwcrb4cv8a8dqg056pqjye",
      "Pročprost" +
        "ěnemluvíč" +
        "esky" -> "Proprostnemluvesky-uyb24dma41a",
      // the classic bücher label (the gate's planted constant)
      "bücher" -> "bcher-kva")
    vectors.foreach { case (uni, puny) =>
      assert(Idna.punycodeEncode(uni).contains(puny), s"encode $puny")
      assert(Idna.punycodeDecode(puny).contains(uni), s"decode $puny")
    }
  }

  test("cross-pin vs java.net.IDN on multi-script labels") {
    val labels = Seq(
      "bücher", "münchen", "中文", "рус",
      "café", "日本語テスト",
      "한국어", "naïveÿ",
      "ελλάδα")
    labels.foreach { l =>
      val ours = Idna.toAscii(l).get
      val jdk = java.net.IDN.toASCII(l)
      assert(ours == jdk, s"label '$l': ours=$ours jdk=$jdk")
      assert(Idna.toUnicode(ours) == java.net.IDN.toUnicode(jdk))
    }
    // deterministic pseudo-random CJK/Cyrillic labels
    var seed = 12345L
    def next(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (Math.floorMod(seed >>> 17, bound.toLong)).toInt
    }
    (0 until 200).foreach { _ =>
      val n = next(12) + 1
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        next(4) match {
          case 0 => sb.append(('a' + next(26)).toChar)
          case 1 => sb.append((0x4E00 + next(0x300)).toChar) // CJK
          case 2 => sb.append((0x0430 + next(32)).toChar) // Cyrillic lowercase
          case _ => sb.append((0x3041 + next(0x50)).toChar) // hiragana
        }
      }
      val l = sb.toString
      assert(Idna.toAscii(l).contains(java.net.IDN.toASCII(l)), s"label '$l'")
    }
  }

  test("toAscii host seam: per-label, case fold, NFC, passthrough, bounds") {
    assert(Idna.toAscii("sub.bücher.com").contains("sub.xn--bcher-kva.com"))
    assert(Idna.toAscii("BÜCHER.COM").contains("xn--bcher-kva.com"))
    // NFC: u + combining diaeresis == precomposed ü
    assert(Idna.toAscii("bücher.com").contains("xn--bcher-kva.com"))
    // pure ASCII (including existing ACE) passes through
    assert(Idna.toAscii("www.example.com").contains("www.example.com"))
    assert(Idna.toAscii("a.xn--bcher-kva.com").contains("a.xn--bcher-kva.com"))
    // invalids refuse: empty labels, empty host, oversize label
    assert(Idna.toAscii("a..b").isEmpty)
    assert(Idna.toAscii("").isEmpty)
    assert(Idna.toAscii(null).isEmpty)
    assert(Idna.toAscii("中" * 60).isEmpty) // encodes past 63 octets
  }

  test("hostile punycode refuses: bad digits, overflow, stray non-ASCII") {
    assert(Idna.punycodeDecode("abc-ü").isEmpty) // non-ASCII in ACE
    assert(Idna.punycodeDecode("!!!-x").isEmpty)
    assert(Idna.punycodeDecode("99999999999").isEmpty) // overflow ladder
    // decode tolerance at the display seam: bad ACE labels stay as-is
    assert(Idna.toUnicode("xn--!!!.com") == "xn--!!!.com")
  }

  test("PSL + URL normalize see one canonical host for all spellings") {
    val rules = graft.ops.Psl.parse(Seq("com"))
    val spellings = Seq("bücher.com", "BÜcher.com",
      "bu\u0308cher.com", // NFD: u + combining diaeresis
      "xn--bcher-kva.com")
    val regs = spellings.map(graft.ops.Psl.registrableDomain(_, rules))
    assert(regs.forall(_.contains("xn--bcher-kva.com")), regs.toString)
    val urls = spellings.map(h =>
      graft.expr.UrlNormalizeKernel.normalize(s"https://$h/p?b=1&a=2"))
    assert(urls.toSet == Set("https://xn--bcher-kva.com/p?a=2&b=1"), urls.toString)
  }
}
