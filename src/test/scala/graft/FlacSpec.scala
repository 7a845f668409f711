package graft

import graft.ops.{AudioPcm, FlacCodec, Multimodal, Spectral}
import org.apache.spark.sql.functions._

/** From-spec FLAC codec. Independence of the checks:
  *   - the CRC-8/CRC-16 kernels are pinned against the PUBLIC catalog
  *     check values for their polynomials (computed by third-party
  *     implementations, not by this repo);
  *   - losslessness rides the STREAMINFO MD5 (JDK MessageDigest — an
  *     implementation this repo does not own): the digest is taken
  *     from the samples BEFORE encoding, and decode refuses unless its
  *     own output re-hashes to it, so a matched encoder/decoder bug in
  *     the prediction or Rice layers cannot silently round-trip;
  *   - tamper tests prove each integrity layer actually gates.
  */
class FlacSpec extends SparkSuite {
  import spark.implicits._

  private def clip(samples: Array[Int], ch: Int = 1, rate: Int = 8000) =
    AudioPcm.Clip(ch, rate, 16, samples)

  test("CRC kernels match the public catalog check values") {
    val check = "123456789".getBytes("US-ASCII")
    // CRC-8 (poly 0x07, init 0, no reflect): check value 0xF4
    assert(FlacCodec.crc8(check, 0, 9) == 0xF4)
    // CRC-16/UMTS (poly 0x8005, init 0, no reflect): check value 0xFEE8
    assert(FlacCodec.crc16(check(_), 0, 9) == 0xFEE8)
  }

  test("round-trips are bit-exact across lengths, block boundaries and UTF-8 frame numbers") {
    val rnd = new scala.util.Random(7)
    // > 128 frames at blockSize 64 → multi-byte UTF-8 frame numbers
    for (n <- Seq(0, 1, 5, 63, 64, 65, 1000, 130 * 64 + 17)) {
      val s = Array.fill(n)(rnd.nextInt(65536) - 32768)
      val enc = FlacCodec.encode(clip(s), blockSize = 64)
      val dec = FlacCodec.decode(enc).getOrElse(fail(s"decode refused n=$n"))
      assert(dec.channels == 1 && dec.sampleRate == 8000 && dec.bitsPerSample == 16)
      assert(dec.samples.toSeq == s.toSeq, s"samples drifted at n=$n")
    }
  }

  test("stereo round-trip exercises mid/side and LPC frames") {
    val rnd = new scala.util.Random(11)
    // smooth-ish stereo: correlated channels so mid/side has signal
    val n = 6 * 256 // 6 frames: even=independent, odd=mid/side, frame 3=LPC
    val s = new Array[Int](2 * n)
    var acc = 0
    for (i <- 0 until n) {
      acc = math.max(-30000, math.min(30000, acc + rnd.nextInt(201) - 100))
      s(2 * i) = acc
      s(2 * i + 1) = math.max(-32768, math.min(32767, acc + rnd.nextInt(33) - 16))
    }
    val enc = FlacCodec.encode(clip(s, ch = 2), blockSize = 256)
    val dec = FlacCodec.decode(enc).getOrElse(fail("stereo decode refused"))
    assert(dec.channels == 2 && dec.samples.toSeq == s.toSeq)
  }

  test("prediction actually compresses a smooth signal") {
    val n = 8192
    val s = Array.tabulate(n)(i => (10000 * math.sin(i * 0.02)).toInt)
    val enc = FlacCodec.encode(clip(s))
    assert(enc.length < n * 2 / 2, s"no compression: ${enc.length} vs raw ${n * 2}")
    assert(FlacCodec.decode(enc).exists(_.samples.toSeq == s.toSeq))
  }

  test("every integrity layer gates: frame tamper, MD5 tamper") {
    val rnd = new scala.util.Random(13)
    val s = Array.fill(2000)(rnd.nextInt(4096) - 2048)
    val enc = FlacCodec.encode(clip(s), blockSize = 256)
    assert(FlacCodec.decode(enc).isDefined)
    // STREAMINFO md5 lives at bytes [26, 42); corrupt one digest byte —
    // frames and their CRCs stay valid, so ONLY the end-to-end MD5
    // re-derivation can catch it
    val badMd5 = enc.clone(); badMd5(30) = (badMd5(30) ^ 0x55).toByte
    assert(FlacCodec.decode(badMd5).isEmpty, "MD5 tamper survived")
    // all-zero md5 = unknown → decode accepts (spec: digest optional)
    val noMd5 = enc.clone()
    for (i <- 26 until 42) noMd5(i) = 0
    assert(FlacCodec.decode(noMd5).isDefined)
    // flip one byte inside frame data → CRC (or MD5) must refuse
    val badFrame = enc.clone(); badFrame(enc.length - 40) = (badFrame(enc.length - 40) ^ 1).toByte
    assert(FlacCodec.decode(badFrame).isEmpty, "frame tamper survived")
  }

  test("hostile bytes refuse cleanly, never throw") {
    val rnd = new scala.util.Random(17)
    val s = Array.fill(500)(rnd.nextInt(65536) - 32768)
    val good = FlacCodec.encode(clip(s), blockSize = 128)
    assert(FlacCodec.decode(Array.emptyByteArray).isEmpty)
    assert(FlacCodec.decode("fLaC but not really a stream".getBytes).isEmpty)
    for (cut <- 1 until good.length by 7) FlacCodec.decode(good.take(cut))
    for (_ <- 1 to 1000) {
      val mut = good.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      FlacCodec.decode(mut) // any result fine; throwing is the failure
    }
  }

  test("decodeAny dispatches FLAC and WAV to the right codec") {
    val s = Array.tabulate(300)(i => (i * 37) % 2048 - 1024)
    val flac = FlacCodec.encode(clip(s))
    assert(AudioPcm.decodeAny(flac).exists(_.samples.toSeq == s.toSeq))
    // WAV path unchanged: 16-bit mono little-endian
    val data = s.flatMap(v => Array(v.toByte, (v >> 8).toByte))
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val wav = "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(16000) ++ le16(2) ++ le16(16) ++ "data".getBytes ++ le32(data.length) ++ data
    assert(AudioPcm.decodeAny(wav).exists(_.samples.toSeq == s.toSeq))
  }

  test("spectral features are identical on WAV and FLAC fixtures of the same tone") {
    val docs = Seq((3L, "t"), (12L, "t")).toDF("doc_id", "text")
    val wavTones = Spectral.packSineWav(docs, "doc_id")
    // re-encode each WAV payload as FLAC through the real codec
    val flacTones = wavTones.select(col("id"), col("media.payload")).as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        val c = AudioPcm.decode(payload).get
        (id, FlacCodec.encode(c, blockSize = 1024))
      }
      .toDF("id", "__p")
      .select(col("id"), struct(col("__p").as("payload"), lit("audio/flac").as("mime"),
        struct(octet_length(col("__p")).cast("long").as("byte_len"),
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
          lit(null).cast("long").as("duration_ms")).as("meta")).as("media"))
    val a = Spectral.spectralDf(wavTones, "id", "media").orderBy("id").collect().toSeq
    val b = Spectral.spectralDf(flacTones, "id", "media").orderBy("id").collect().toSeq
    assert(a == b, "spectral features diverged between WAV and FLAC carriers")
  }

  test("packTextFlac → decodeAudioFeatures replays the WAV-path features at 16-bit") {
    val docs = Seq((1L, "hello flac"), (2L, ""), (3L, "zzzzzzzz")).toDF("doc_id", "text")
    val out = Multimodal.decodeAudioFeatures(
      Multimodal.packTextFlac(docs, "doc_id", "text"), "id", "media")
      .orderBy("id")
      .select("id", "channels", "sample_rate", "bits", "n_samples", "peak", "sum_sq", "zero_crossings")
      .as[(Long, Int, Int, Int, Long, Long, Long, Long)].collect()
    def feats(text: String): (Long, Long, Long) = {
      val bs = text.getBytes("UTF-8").map(b => ((b & 0xFF) - 128) << 8)
      val peak = if (bs.isEmpty) 0L else bs.map(v => math.abs(v.toLong)).max
      val ss = bs.map(v => v.toLong * v).sum
      val zc = bs.sliding(2).count(p => p.length == 2 && (p(0) < 0) != (p(1) < 0))
      (peak, ss, zc.toLong)
    }
    val (p1, s1, z1) = feats("hello flac")
    assert(out(0) == ((1L, 1, 8000, 16, 10L, p1, s1, z1)))
    assert(out(1) == ((2L, 1, 8000, 16, 0L, 0L, 0L, 0L)))
    val (p3, s3, z3) = feats("zzzzzzzz")
    assert(out(2) == ((3L, 1, 8000, 16, 8L, p3, s3, z3)))
  }
}
