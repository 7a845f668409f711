package graft

import org.apache.spark.sql.functions._
import graft.ops.{AudioPcm, Spectral}

/** From-spec FFT + spectral features: transform pinned against a
  * naive DFT, Parseval, impulse/sine analytic spectra, and the
  * distributed feature operator on synthesized tones.
  */
class SpectralSpec extends SparkSuite {
  import spark.implicits._

  private def naiveDft(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    for (k <- 0 until n; t <- 0 until n) {
      val ang = -2.0 * math.Pi * k * t / n
      re(k) += x(t) * math.cos(ang)
      im(k) += x(t) * math.sin(ang)
    }
    (re, im)
  }

  test("fft matches a naive DFT on seeded random input") {
    val rnd = new scala.util.Random(11)
    val x = Array.fill(64)(rnd.nextDouble() * 2 - 1)
    val re = x.clone()
    val im = new Array[Double](64)
    Spectral.fft(re, im)
    val (er, ei) = naiveDft(x)
    for (k <- 0 until 64) {
      assert(math.abs(re(k) - er(k)) < 1e-9, s"re[$k]")
      assert(math.abs(im(k) - ei(k)) < 1e-9, s"im[$k]")
    }
  }

  test("Parseval: spectrum energy equals N times signal energy") {
    val rnd = new scala.util.Random(13)
    val x = Array.fill(256)(rnd.nextDouble() * 2 - 1)
    val re = x.clone(); val im = new Array[Double](256)
    Spectral.fft(re, im)
    val sig = x.map(v => v * v).sum
    val spec = (0 until 256).map(k => re(k) * re(k) + im(k) * im(k)).sum
    assert(math.abs(spec - 256.0 * sig) < 1e-6 * spec.max(1.0))
  }

  test("impulse has a flat spectrum; bin-aligned sine peaks at its bin") {
    val re1 = new Array[Double](32); re1(0) = 1.0
    val im1 = new Array[Double](32)
    Spectral.fft(re1, im1)
    assert((0 until 32).forall(k => math.abs(re1(k) - 1.0) < 1e-12 && math.abs(im1(k)) < 1e-12))
    // sine at exactly bin 5 of 128
    val x = Array.tabulate(128)(t => math.sin(2 * math.Pi * 5 * t / 128))
    val re = x.clone(); val im = new Array[Double](128)
    Spectral.fft(re, im)
    val mags = (0 until 64).map(k => math.sqrt(re(k) * re(k) + im(k) * im(k)))
    assert(mags.indexOf(mags.max) == 5)
    assert(math.abs(mags(5) - 64.0) < 1e-9) // N/2 for unit sine
  }

  test("fft rejects non-power-of-two lengths") {
    assertThrows[IllegalArgumentException] {
      Spectral.fft(new Array[Double](48), new Array[Double](48))
    }
  }

  test("distributed features find each tone's frequency exactly") {
    val docs = (0L until 16L).toDF("doc_id")
    val out = Spectral.spectralDf(
      Spectral.packSineWav(docs, "doc_id"), "id", "media")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(4), r.getDouble(5)))
    assert(out.length == 16)
    out.foreach { case (id, nFrames, centroid, flatness, peakHz) =>
      val f = 500.0 + (id % 16) * 250.0
      assert(nFrames == 3)
      assert(math.abs(peakHz - f) < 1e-9, s"id=$id peak $peakHz want $f")
      assert(math.abs(centroid - f) < 50.0, s"id=$id centroid $centroid want $f")
      assert(flatness < 0.1, s"id=$id flatness $flatness should be tonal")
    }
  }

  test("too-short clips and non-PCM payloads yield no rows") {
    // 8-bit text WAV shorter than one 1024-sample frame
    val tiny = Seq((1L, "abc")).toDF("doc_id", "text")
    val packed = graft.ops.Multimodal.packTextWav(tiny, "doc_id", "text")
    assert(Spectral.spectralDf(packed, "id", "media").count() == 0)
    val junk = Seq((9L, "junk".getBytes("UTF-8"))).toDF("id", "p")
      .select(col("id"), struct(col("p").as("payload"), lit("x").as("mime")).as("media"))
    assert(Spectral.spectralDf(junk, "id", "media").count() == 0)
  }

  test("long text WAVs produce stable features through the 8-bit decode path") {
    val doc = Seq((1L, "abcdefgh" * 400)).toDF("doc_id", "text") // 3200 samples
    val packed = graft.ops.Multimodal.packTextWav(doc, "doc_id", "text")
    val rows = Spectral.spectralDf(packed, "id", "media", frameSize = 512).collect()
    assert(rows.length == 1)
    val clip = AudioPcm.decode(
      packed.select("media.payload").as[Array[Byte]].head()).get
    assert(clip.bitsPerSample == 8 && rows.head.getInt(1) == clip.samples.length / 512)
  }
}
