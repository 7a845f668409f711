package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Energy-based audio segmentation — the first pass any speech-data
  * pipeline runs before transcription/alignment: split a recording
  * into voiced segments at silence gaps so downstream per-utterance
  * work (ASR, speaker ID, CTC alignment) gets bounded inputs instead
  * of one multi-minute clip. This is the classic fixed-window RMS
  * energy gate (the pre-neural VAD baseline): deterministic, cheap,
  * and exactly reproducible by an external oracle — not a model.
  *
  * Algorithm: mono-mix the clip (channel average), cut into
  * fixed-length windows (`windowMs`, trailing partial window
  * dropped — declared), mark a window ACTIVE when its RMS on the
  * 16-bit sample scale reaches `threshold`, and merge consecutive
  * active windows into segments. Per segment: window-aligned
  * start/end milliseconds, the window count, and the mean of the
  * per-window RMS values.
  *
  * Scale shape: scan-local per-row kernel (mapPartitions over
  * clips), state bounded by one window; hostile payloads quarantine
  * as seg = -1 rows through the [[AudioPcm.decodeAny]] never-throw
  * seam.
  */
object AudioSegments {

  /** (start window, window count, mean window RMS) per segment. */
  private[graft] def segmentsOf(samples: Array[Int], channels: Int,
      windowSamples: Int, threshold: Double): Vector[(Int, Int, Double)] = {
    val frames = samples.length / channels
    val nWin = frames / windowSamples
    val out = Vector.newBuilder[(Int, Int, Double)]
    var segStart = -1
    var segRmsSum = 0.0
    def flush(atWin: Int): Unit = if (segStart >= 0) {
      out += ((segStart, atWin - segStart, segRmsSum / (atWin - segStart)))
      segStart = -1
      segRmsSum = 0.0
    }
    var w = 0
    while (w < nWin) {
      var sq = 0.0
      var f = w * windowSamples
      val end = f + windowSamples
      while (f < end) {
        // mono mix: channel average per frame
        var c = 0
        var sum = 0.0
        while (c < channels) { sum += samples(f * channels + c); c += 1 }
        val v = sum / channels
        sq += v * v
        f += 1
      }
      val rms = math.sqrt(sq / windowSamples)
      if (rms >= threshold) {
        if (segStart < 0) segStart = w
        segRmsSum += rms
      } else flush(w)
      w += 1
    }
    flush(nWin)
    out.result()
  }

  /** Segment rows per clip: (id, seg, start_ms, end_ms, n_windows,
    * rms). Undecodable payloads quarantine as seg = -1. */
  def segments(df: DataFrame, idCol: String, payloadCol: String,
      windowMs: Int = 25, threshold: Double = 100.0): DataFrame = {
    require(windowMs > 0, "audio segments: windowMs must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        Option(payload).flatMap(AudioPcm.decodeAny) match {
          case Some(clip) if clip.sampleRate > 0 =>
            val windowSamples = math.max(1, clip.sampleRate * windowMs / 1000)
            segmentsOf(clip.samples, clip.channels, windowSamples, threshold)
              .zipWithIndex.map { case ((startWin, nWin, rms), seg) =>
                (id, seg, startWin.toLong * windowMs, (startWin + nWin).toLong * windowMs,
                  nWin, rms)
              }
          case _ => Seq((id, -1, -1L, -1L, 0, 0.0))
        }
      })
      .toDF("id", "seg", "start_ms", "end_ms", "n_windows", "rms")
  }

  /** Gate packer: one 8 kHz mono 16-bit WAV per document with an
    * id-arithmetic silence layout — one leading silent window, then
    * id%3+1 constant-amplitude segments of (id+s)%4+1 windows
    * separated by id%2+1 silent windows. Constant amplitude makes
    * the window RMS EXACT (sqrt of a perfect square), so the oracle
    * replays rms without any float slack. */
  def packSegmentsWav(df: DataFrame, idCol: String,
      sampleRate: Int = 8000, windowMs: Int = 25): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val win = sampleRate * windowMs / 1000
    df.where(col(idCol).isNotNull).select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val nSegs = (id % 3 + 1).toInt
        val gap = (id % 2 + 1).toInt
        val windows = Vector.newBuilder[Int] // amplitude per window
        (1 to 1).foreach(_ => windows += 0)  // leading silence
        var s = 0
        while (s < nSegs) {
          val dur = ((id + s) % 4 + 1).toInt
          val amp = (4000 + 1000 * s).toInt
          (0 until dur).foreach(_ => windows += amp)
          if (s < nSegs - 1) (0 until gap).foreach(_ => windows += 0)
          s += 1
        }
        windows += 0 // trailing silence
        val amps = windows.result()
        val data = new Array[Byte](amps.length * win * 2)
        var w = 0
        while (w < amps.length) {
          val a = amps(w)
          var i = 0
          while (i < win) {
            val at = (w * win + i) * 2
            data(at) = (a & 0xFF).toByte
            data(at + 1) = ((a >> 8) & 0xFF).toByte
            i += 1
          }
          w += 1
        }
        def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
        def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
        val wav = "RIFF".getBytes("US-ASCII") ++ le32(36 + data.length) ++
          "WAVE".getBytes("US-ASCII") ++
          "fmt ".getBytes("US-ASCII") ++ le32(16) ++
          le16(1) ++ le16(1) ++ le32(sampleRate) ++ le32(sampleRate * 2) ++
          le16(2) ++ le16(16) ++
          "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
        (id, wav)
      })
      .toDF("doc_id", "payload")
  }
}
