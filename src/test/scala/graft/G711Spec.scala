package graft

import graft.ops.{AudioPcm, G711}
import org.scalatest.funsuite.AnyFunSuite

/** From-spec G.711 companding. Independence of the checks: the decode
  * tables are compared entry-for-entry against `javax.sound.sampled`'s
  * OWN ULAW/ALAW → PCM converters (an implementation this repo does
  * not own — two independent codebases must agree on all 512 table
  * entries); the encode direction is pinned by the spec's involution
  * (every code survives encode(decode(code))) and by the segment
  * quantization-error bound over the full 16-bit sample range.
  */
class G711Spec extends AnyFunSuite {

  /** Decode all 256 code bytes through javax.sound's converter. */
  private def jdkTable(encoding: javax.sound.sampled.AudioFormat.Encoding): Array[Int] = {
    import javax.sound.sampled._
    val codes = Array.tabulate[Byte](256)(i => i.toByte)
    val srcFmt = new AudioFormat(encoding, 8000f, 8, 1, 1, 8000f, false)
    val src = new AudioInputStream(new java.io.ByteArrayInputStream(codes), srcFmt, 256)
    val dstFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
    val pcm = AudioSystem.getAudioInputStream(dstFmt, src)
    val out = pcm.readAllBytes()
    assert(out.length == 512, s"expected 512 PCM bytes, got ${out.length}")
    Array.tabulate(256) { i =>
      val v = (out(2 * i) & 0xFF) | ((out(2 * i + 1) & 0xFF) << 8)
      if (v >= 0x8000) v - 0x10000 else v
    }
  }

  test("mulaw decode table matches javax.sound's independent converter (all 256 codes)") {
    val jdk = jdkTable(javax.sound.sampled.AudioFormat.Encoding.ULAW)
    (0 until 256).foreach { c =>
      assert(G711.mulawDecode(c) == jdk(c), s"mulaw code $c: mine=${G711.mulawDecode(c)} jdk=${jdk(c)}")
    }
  }

  test("alaw decode table matches javax.sound's independent converter (all 256 codes)") {
    val jdk = jdkTable(javax.sound.sampled.AudioFormat.Encoding.ALAW)
    (0 until 256).foreach { c =>
      assert(G711.alawDecode(c) == jdk(c), s"alaw code $c: mine=${G711.alawDecode(c)} jdk=${jdk(c)}")
    }
  }

  test("involution: encode(decode(code)) == code") {
    // μ-law's one exception: negative zero (0x7F) and positive zero
    // (0xFF) both decode to 0, which re-encodes as positive (0xFF)
    (0 until 256).filter(_ != 0x7F).foreach { c =>
      assert(G711.mulawEncode(G711.mulawDecode(c)) == c, s"mulaw involution at $c")
    }
    assert(G711.mulawEncode(G711.mulawDecode(0x7F)) == 0xFF)
    (0 until 256).foreach { c =>
      assert(G711.alawEncode(G711.alawDecode(c)) == c, s"alaw involution at $c")
    }
  }

  test("round-trip quantization error bounded over the full 16-bit range") {
    var s = -32768
    while (s <= 32767) {
      val mu = G711.mulawDecode(G711.mulawEncode(s))
      val al = G711.alawDecode(G711.alawEncode(s))
      // top-segment quantization intervals: μ-law 1024 (14-bit step
      // 256 << 2), A-law 2048 (13-bit step 256 << 3); half-interval
      // plus the encoder's truncation bias stays within one interval
      assert(math.abs(mu - s) <= 1024, s"mulaw error at $s: $mu")
      assert(math.abs(al - s) <= 2048, s"alaw error at $s: $al")
      s += 1
    }
  }

  test("decode tables are monotone within each sign (quantizer sanity)") {
    // μ-law positive codes 0xFF..0x80 decode increasing from 0;
    // simpler invariant: distinct codes → distinct values except the
    // two zeros, and min/max hit the spec extremes
    assert(G711.MulawTable.min == -32124 && G711.MulawTable.max == 32124)
    assert(G711.AlawTable.min == -32256 && G711.AlawTable.max == 32256)
  }

  test("fmt 6/7 WAV decode applies the tables through AudioPcm (spec-correct header)") {
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val data = Array.tabulate[Byte](256)(i => i.toByte)
    def wav(fmtCode: Int): Array[Byte] = {
      val body = "WAVE".getBytes("US-ASCII") ++
        "fmt ".getBytes("US-ASCII") ++ le32(18) ++
        le16(fmtCode) ++ le16(1) ++ le32(8000) ++ le32(8000) ++
        le16(1) ++ le16(8) ++ le16(0) ++
        "fact".getBytes("US-ASCII") ++ le32(4) ++ le32(data.length) ++
        "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }
    val mu = AudioPcm.decodeAny(wav(7)).get
    assert(mu.channels == 1 && mu.sampleRate == 8000 && mu.bitsPerSample == 16)
    assert(mu.samples.toSeq == (0 until 256).map(G711.mulawDecode))
    val al = AudioPcm.decodeAny(wav(6)).get
    assert(al.samples.toSeq == (0 until 256).map(G711.alawDecode))
    // 16-bit G.711 is not a thing: refuse
    val bad = wav(7)
    // bits field lives at fmt chunk offset +22 = byte 34
    bad(34) = 16
    assert(AudioPcm.decodeAny(bad).isEmpty)
  }
}
