package graft

import graft.ops.{Aiff, AuSnd, AudioPcm, G711}

/** AIFF/AIFF-C and Sun AU: the 80-bit extended-float rate codec,
  * every container class, 8-bit signedness (the anti-WAV trap),
  * G.711 routes, dispatch, and the refusal ladder. */
class AiffSpec extends SparkSuite {
  import spark.implicits._

  test("80-bit extended float rate: common audio rates round-trip exactly") {
    Seq(8000, 11025, 16000, 22050, 44100, 48000, 96000).foreach { r =>
      val b = Aiff.rateToExtended(r)
      assert(Aiff.extendedToRate(b, 0).contains(r), s"rate $r")
    }
    // negative sign bit refuses
    val neg = Aiff.rateToExtended(8000)
    neg(0) = (neg(0) | 0x80).toByte
    assert(Aiff.extendedToRate(neg, 0).isEmpty)
    // zero refuses
    assert(Aiff.extendedToRate(new Array[Byte](10), 0).isEmpty)
  }

  test("AIFF PCM16/PCM8, AIFC NONE/sowt/ulaw/alaw all decode; unknown compression refuses") {
    val s16 = (0 until 40).map(i => (i * 311 % 20001) - 10000)
    def be(vals: Seq[Int]) = vals.flatMap(v => Seq(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)).toArray
    def le(vals: Seq[Int]) = vals.flatMap(v => Seq((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)).toArray
    val plain = Aiff.decode(Aiff.build(1, 8000, 16, "", 40L, be(s16))).get
    assert(plain.sampleRate == 8000 && plain.bitsPerSample == 16)
    assert(plain.samples.toSeq == s16)
    val none = Aiff.decode(Aiff.build(2, 44100, 16, "NONE", 20L, be(s16))).get
    assert(none.channels == 2 && none.samples.toSeq == s16)
    val sowt = Aiff.decode(Aiff.build(1, 16000, 16, "sowt", 40L, le(s16))).get
    assert(sowt.samples.toSeq == s16)
    // 8-bit AIFF is SIGNED: byte -5 must decode to -5<<8, not (251-128)<<8
    val s8 = Seq[Byte](-120, -5, 0, 7, 127)
    val eight = Aiff.decode(Aiff.build(1, 22050, 8, "", 5L, s8.toArray)).get
    assert(eight.bitsPerSample == 8)
    assert(eight.samples.toSeq == s8.map(_.toInt << 8))
    // G.711 routes share the spec tables
    val codes = (0 until 256).map(_.toByte).toArray
    val ul = Aiff.decode(Aiff.build(1, 8000, 8, "ulaw", 256L, codes)).get
    assert(ul.samples.toSeq == (0 until 256).map(G711.MulawTable(_)))
    val al = Aiff.decode(Aiff.build(1, 8000, 8, "ALAW", 256L, codes)).get
    assert(al.samples.toSeq == (0 until 256).map(G711.AlawTable(_)))
    // unknown compression refuses
    assert(Aiff.decode(Aiff.build(1, 8000, 32, "fl32", 10L, new Array[Byte](40))).isEmpty)
  }

  test("AU encodings: int16 BE, int8, mu-law, A-law; unknown refuses; to-EOF size") {
    val s16 = (0 until 30).map(i => (i * 977 % 30001) - 15000)
    val be = s16.flatMap(v => Seq(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)).toArray
    val a = AuSnd.decode(AuSnd.build(3, 8000, 1, be)).get
    assert(a.samples.toSeq == s16 && a.sampleRate == 8000)
    val i8 = AuSnd.decode(AuSnd.build(2, 11025, 1, Array[Byte](-100, 0, 50))).get
    assert(i8.samples.toSeq == Seq(-100 << 8, 0, 50 << 8) && i8.bitsPerSample == 8)
    val codes = (0 until 256).map(_.toByte).toArray
    val mu = AuSnd.decode(AuSnd.build(1, 8000, 1, codes)).get
    assert(mu.samples.toSeq == (0 until 256).map(G711.MulawTable(_)))
    val al = AuSnd.decode(AuSnd.build(27, 8000, 1, codes)).get
    assert(al.samples.toSeq == (0 until 256).map(G711.AlawTable(_)))
    assert(AuSnd.decode(AuSnd.build(6, 8000, 1, be)).isEmpty) // float: refuse
    // declared size 0xFFFFFFFF reads to EOF
    val eof = AuSnd.build(3, 8000, 1, be)
    (8 until 12).foreach(i => eof(i) = 0xFF.toByte)
    assert(AuSnd.decode(eof).get.samples.toSeq == s16)
  }

  test("decodeAny dispatch routes AIFF and AU; hostile bytes refuse") {
    val s16 = Seq(100, -200, 300)
    val be = s16.flatMap(v => Seq(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)).toArray
    assert(AudioPcm.decodeAny(Aiff.build(1, 8000, 16, "", 3L, be)).get.samples.toSeq == s16)
    assert(AudioPcm.decodeAny(AuSnd.build(3, 8000, 1, be)).get.samples.toSeq == s16)
    assert(Aiff.decode("FORMxxxxAIFF".getBytes("US-ASCII")).isEmpty)
    assert(AuSnd.decode(".snd".getBytes("US-ASCII")).isEmpty)
    val good = Aiff.build(1, 8000, 16, "", 3L, be)
    (1 until good.length by 3).foreach(n =>
      assert(AudioPcm.decodeAny(java.util.Arrays.copyOf(good, n)).forall(_ != null)))
  }

  test("Spark seam: the six-class packer replays through decodeClipRows") {
    val ids = (0L until 12L)
    val packed = Aiff.packPlantedAiffAu(ids.toDF("doc_id"), "doc_id")
    val rows = Aiff.decodeClipRows(packed, "id", "payload")
      .select($"id", $"sample_rate", $"bits", $"n_samples")
      .as[(Long, Int, Int, Long)].collect().sortBy(_._1)
    assert(rows.length == 12)
    rows.foreach { case (id, rate, bits, n) =>
      val wantRate = (id % 6) match {
        case 0 | 4 | 5 => 8000; case 1 => 11025; case 2 => 16000; case _ => 22050
      }
      assert(rate == wantRate && n == id % 50 + 20, s"id=$id")
      assert(bits == (if (id % 6 == 3) 8 else 16), s"id=$id bits")
    }
  }
}
