package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spectral audio features over decoded PCM — the DSP rung above
  * [[Multimodal.decodeAudioFeatures]]'s time-domain peak/energy/ZCR:
  * Hann-windowed non-overlapping frames → iterative radix-2 FFT
  * (textbook Cooley-Tukey, public algorithm) → per-clip spectral
  * centroid, 85% rolloff, spectral flatness, and the dominant
  * frequency — the standard content descriptors an audio curation
  * pass filters and dedups on.
  *
  * Determinism: twiddle factors and the Hann window are built with
  * StrictMath, accumulation orders are fixed, so features are
  * bit-identical on any JVM/platform.
  *
  * Scale shape: pure mapPartitions projection (decode + frame FFTs
  * are scan-local per payload; an N-sample clip costs O(N log F) for
  * frame size F); one short feature row per clip, nothing shuffles.
  */
object Spectral {

  /** In-place iterative radix-2 FFT (decimation in time): bit-reversal
    * permutation then butterfly passes. `re.length` must be a power
    * of two and equal `im.length`.
    */
  private[graft] def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && (n & (n - 1)) == 0, s"fft: length $n not a power of 2")
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // butterflies
    var len = 2
    while (len <= n) {
      val ang = -2.0 * StrictMath.PI / len
      val wr = StrictMath.cos(ang)
      val wi = StrictMath.sin(ang)
      var blockStart = 0
      while (blockStart < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val a = blockStart + k
          val b = a + len / 2
          val xr = re(b) * cr - im(b) * ci
          val xi = re(b) * ci + im(b) * cr
          re(b) = re(a) - xr
          im(b) = im(a) - xi
          re(a) += xr
          im(a) += xi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        blockStart += len
      }
      len <<= 1
    }
  }

  /** Per-clip spectral features. Channels beyond the first are
    * ignored (deterministic mono-ization); clips shorter than one
    * frame yield None. DC (bin 0) is excluded from every statistic so
    * a constant offset cannot masquerade as content.
    */
  final case class Features(
      nFrames: Int, centroidHz: Double, rolloffHz: Double,
      flatness: Double, peakHz: Double)

  private[graft] def features(clip: AudioPcm.Clip, frameSize: Int = 1024): Option[Features] = {
    require(frameSize >= 8 && (frameSize & (frameSize - 1)) == 0,
      s"spectral: frameSize=$frameSize must be a power of 2 >= 8")
    val mono = {
      val n = clip.samples.length / clip.channels
      val out = new Array[Double](n)
      var i = 0
      while (i < n) { out(i) = clip.samples(i * clip.channels).toDouble; i += 1 }
      out
    }
    val nFrames = mono.length / frameSize
    if (nFrames == 0) return None
    val half = frameSize / 2
    val hann = Array.tabulate(frameSize)(n =>
      0.5 - 0.5 * StrictMath.cos(2.0 * StrictMath.PI * n / (frameSize - 1)))
    val power = new Array[Double](half) // aggregate power per bin, DC excluded via index 0 unused
    var f = 0
    while (f < nFrames) {
      val re = new Array[Double](frameSize)
      val im = new Array[Double](frameSize)
      var n = 0
      while (n < frameSize) { re(n) = mono(f * frameSize + n) * hann(n); n += 1 }
      fft(re, im)
      var k = 1
      while (k < half) {
        power(k) += re(k) * re(k) + im(k) * im(k)
        k += 1
      }
      f += 1
    }
    val binHz = clip.sampleRate.toDouble / frameSize
    var totP = 0.0
    var centNum = 0.0
    var peakK = 1
    var k = 1
    while (k < half) {
      totP += power(k)
      centNum += k * binHz * power(k)
      if (power(k) > power(peakK)) peakK = k
      k += 1
    }
    if (totP <= 0) return Some(Features(nFrames, 0.0, 0.0, 1.0, 0.0))
    // 85% rolloff: smallest bin whose cumulative power crosses the line
    var cum = 0.0
    var rollK = half - 1
    k = 1
    var found = false
    while (k < half && !found) {
      cum += power(k)
      if (cum >= 0.85 * totP) { rollK = k; found = true }
      k += 1
    }
    // flatness: geometric over arithmetic mean of per-bin power
    var logSum = 0.0
    k = 1
    while (k < half) { logSum += StrictMath.log(power(k) + 1e-12); k += 1 }
    val flat = StrictMath.exp(logSum / (half - 1)) / (totP / (half - 1) + 1e-12)
    Some(Features(nFrames, centNum / totP, rollK * binHz, flat, peakK * binHz))
  }

  /** Distributed spectral features: decode each WAV payload
    * ([[AudioPcm]]) and emit one row per decodable clip —
    * (id, sample_rate, n_frames, centroid_hz, rolloff_hz, flatness,
    * peak_hz). Non-PCM / too-short payloads produce no rows.
    */
  def spectralDf(df: DataFrame, idCol: String, mediaCol: String,
      frameSize: Int = 1024): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(mediaCol + ".payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          AudioPcm.decodeAny(payload).flatMap(features(_, frameSize)).map { ft =>
            (id, ft.nFrames, ft.centroidHz, ft.rolloffHz, ft.flatness, ft.peakHz)
          }
        }
      }
      .toDF("id", "n_frames", "centroid_hz", "rolloff_hz", "flatness", "peak_hz")
  }

  /** Pure-tone 16-bit PCM WAV payloads with id-derived frequency
    * (500 + (id mod 16)·250 Hz at 16 kHz — all far under Nyquist), so
    * a gate can assert the measured dominant frequency and centroid
    * against arithmetic on the id alone. 250 ms → 4000 samples.
    */
  def packSineWav(df: DataFrame, idCol: String,
      sampleRate: Int = 16000, durMs: Int = 250): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // sine synthesis is CPU-bound per row: fan out past the 1-2
    // parquet splits a small documents table yields
    Partitioning.fanOut(df)
      .select(col(idCol).cast("long"))
      .as[Long]
      .mapPartitions { rows =>
        def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
        def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
        rows.map { id =>
          val freq = 500.0 + ((id % 16) + 16) % 16 * 250.0
          val n = sampleRate * durMs / 1000
          val data = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val s = (12000.0 * StrictMath.sin(2.0 * StrictMath.PI * freq * i / sampleRate)).toInt
            data(i * 2) = s.toByte
            data(i * 2 + 1) = (s >> 8).toByte
            i += 1
          }
          val wav = "RIFF".getBytes("US-ASCII") ++ le32(36 + data.length) ++
            "WAVE".getBytes("US-ASCII") ++
            "fmt ".getBytes("US-ASCII") ++ le32(16) ++
            le16(1) ++ le16(1) ++ le32(sampleRate) ++ le32(sampleRate * 2) ++
            le16(2) ++ le16(16) ++
            "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
          (id, wav)
        }
      }
      .toDF("id", "__payload")
      .select(col("id"), struct(
        col("__payload").as("payload"),
        lit("audio/wav").as("mime"),
        struct(
          octet_length(col("__payload")).cast("long").as("byte_len"),
          lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"),
          lit(durMs.toLong).as("duration_ms")).as("meta")).as("media"))
  }
}
