package graft.ops

/** From-spec IMA/DVI ADPCM (WAV format code 0x11) — the 4-bit
  * adaptive-delta rung of the audio codec ladder: each sample is a
  * nibble whose magnitude bits scale the current step size and whose
  * state (predictor, step index) adapts via the public IMA tables.
  * Reference behavior: none (the reference pipeline has no audio
  * layer); this is §2.6 multimodal extension surface, sitting between
  * G.711 companding ([[G711]], stateless per-byte) and FLAC
  * ([[FlacCodec]], lossless frames) — the classic LOSSY stateful
  * telephony/game-audio format.
  *
  * Block layout (the RIFF `fmt 0x11` layout used by every WAV
  * writer): per block and per channel a 4-byte header — predictor
  * (int16 LE, which IS the block's first output sample), step index
  * (uint8, clamped to 0..88), reserved — then nibble data, low nibble
  * first within each byte; stereo interleaves 4-byte groups per
  * channel (8 nibbles ch0, 8 nibbles ch1, …).
  *
  * Decode/encode per nibble (the IMA reference arithmetic, integer
  * exact):
  * {{{
  *   step = StepTable(index)
  *   diff = step>>3 (+ step>>2 if bit0) (+ step>>1 if bit1) (+ step if bit2)
  *   predictor ± diff (bit3 = sign), clamped to 16-bit
  *   index += IndexTable(nibble & 7), clamped to 0..88
  * }}}
  *
  * Hostile-input contract matches the other codecs: Long cursors, no
  * allocation from declared sizes beyond what is present, truncated
  * final blocks decode the nibbles that exist, never throws on
  * garbage (returns None at the [[AudioPcm]] dispatch layer).
  *
  * Scale shape: pure functions invoked inside `mapPartitions`.
  */
object ImaAdpcm {

  /** IMA step-size table, 89 entries (index 0..88). */
  val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Index adjustment per nibble magnitude (low 3 bits). */
  val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  private def clampIndex(i: Int): Int = if (i < 0) 0 else if (i > 88) 88 else i
  private def clamp16(v: Int): Int = if (v < -32768) -32768 else if (v > 32767) 32767 else v

  /** One decode step: returns the new predictor; callers track index
    * separately via [[IndexTable]]. Exposed for the spec's worked
    * example. */
  def decodeStep(nibble: Int, predictor: Int, step: Int): Int = {
    var diff = step >> 3
    if ((nibble & 1) != 0) diff += step >> 2
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 4) != 0) diff += step
    clamp16(if ((nibble & 8) != 0) predictor - diff else predictor + diff)
  }

  /** Decode the `data` chunk of a fmt-0x11 WAV. `declaredSamples` is
    * the `fact` chunk's per-channel frame count when present (caps the
    * output; ADPCM blocks are padded to whole bytes/groups so the
    * tail must be trimmable). Returns interleaved 16-bit samples.
    */
  def decodeData(data: Array[Byte], channels: Int, blockAlign: Int,
      declaredSamples: Long = -1L): Option[Array[Int]] = {
    if (channels < 1 || channels > 2) return None
    val headerBytes = 4 * channels
    if (blockAlign <= headerBytes || blockAlign > (1 << 20)) return None
    // per-channel samples in a full block: 1 (header) + 2 data nibbles/byte
    val samplesPerBlock = (blockAlign - headerBytes) * 2 / channels + 1
    if (samplesPerBlock < 1) return None
    val nBlocks = (data.length + blockAlign - 1) / blockAlign
    val maxFrames = nBlocks.toLong * samplesPerBlock
    if (maxFrames * channels > AudioPcm.MaxSamples) return None
    val out = new Array[Int](maxFrames.toInt * channels)
    var outN = 0 // frames written so far (per channel)
    var blockStart = 0
    while (blockStart < data.length) {
      val blockEnd = math.min(blockStart + blockAlign, data.length)
      if (blockEnd - blockStart < headerBytes) {
        blockStart = blockEnd // truncated header: drop the partial block
      } else {
        val pred = new Array[Int](channels)
        val idx = new Array[Int](channels)
        var c = 0
        while (c < channels) {
          val at = blockStart + 4 * c
          val lo = data(at) & 0xFF; val hi = data(at + 1) & 0xFF
          val p = lo | (hi << 8)
          pred(c) = if (p >= 0x8000) p - 0x10000 else p
          idx(c) = clampIndex(data(at + 2) & 0xFF)
          // first output frame of the block is the header predictor
          out(outN * channels + c) = pred(c)
          c += 1
        }
        val blockFrame0 = outN
        outN += 1
        // data region: 4-byte groups per channel, low nibble first; a
        // truncated block decodes only the WHOLE interleave groups
        // present (partial groups have missing channels — dropped)
        var at = blockStart + headerBytes
        var frameInBlock = 1
        while (at + 4 * channels <= blockEnd && frameInBlock < samplesPerBlock) {
          val groupFrames = math.min(8, samplesPerBlock - frameInBlock)
          var c2 = 0
          while (c2 < channels) {
            val base = at + 4 * c2
            var k = 0
            while (k < groupFrames) {
              val b = data(base + (k >> 1)) & 0xFF
              val nib = if ((k & 1) == 0) b & 0x0F else (b >> 4) & 0x0F
              val step = StepTable(idx(c2))
              pred(c2) = decodeStep(nib, pred(c2), step)
              idx(c2) = clampIndex(idx(c2) + IndexTable(nib & 7))
              out((blockFrame0 + frameInBlock + k) * channels + c2) = pred(c2)
              k += 1
            }
            c2 += 1
          }
          at += 4 * channels
          frameInBlock += groupFrames
        }
        // mono only: a blockAlign whose data region is not a multiple
        // of 4 (e.g. 6 → header + 2 bytes = 4 nibbles) leaves a
        // partial group; its nibbles are still well-defined for one
        // channel, so decode them rather than silently dropping the
        // trailing samples. (Stereo genuinely needs whole groups —
        // a partial group is missing one channel's bytes.)
        if (channels == 1) {
          while (at < blockEnd && frameInBlock < samplesPerBlock) {
            val b = data(at) & 0xFF
            var half = 0
            while (half < 2 && frameInBlock < samplesPerBlock) {
              val nib = if (half == 0) b & 0x0F else (b >> 4) & 0x0F
              val step = StepTable(idx(0))
              pred(0) = decodeStep(nib, pred(0), step)
              idx(0) = clampIndex(idx(0) + IndexTable(nib & 7))
              out(blockFrame0 + frameInBlock) = pred(0)
              frameInBlock += 1
              half += 1
            }
            at += 1
          }
        }
        outN = blockFrame0 + frameInBlock
        blockStart += blockAlign
      }
    }
    val totalFrames =
      if (declaredSamples >= 0) math.min(outN.toLong, declaredSamples).toInt else outN
    Some(java.util.Arrays.copyOf(out, totalFrames * channels))
  }

  /** One encode step: quantize `sample` against (predictor, index),
    * returning (nibble, newPredictor) — the reconstruction uses the
    * SAME decode arithmetic, so encoder and decoder state never
    * drift. Exposed for the spec. */
  def encodeStep(sample: Int, predictor: Int, index: Int): (Int, Int) = {
    val step = StepTable(index)
    var diff = sample - predictor
    var nib = 0
    if (diff < 0) { nib = 8; diff = -diff }
    if (diff >= step) { nib |= 4; diff -= step }
    if (diff >= (step >> 1)) { nib |= 2; diff -= step >> 1 }
    if (diff >= (step >> 2)) { nib |= 1 }
    (nib, decodeStep(nib, predictor, step))
  }

  /** Encode interleaved 16-bit samples as a complete fmt-0x11 WAV
    * (fmt + fact + data). Lossy by design; the decoder reconstructs
    * exactly the predictor path the encoder tracked. */
  def encodeWav(clip: AudioPcm.Clip, blockAlign: Int = 256): Array[Byte] = {
    val ch = clip.channels
    require(ch == 1 || ch == 2, s"ImaAdpcm.encodeWav: channels=$ch")
    val headerBytes = 4 * ch
    require(blockAlign > headerBytes && (blockAlign - headerBytes) % (4 * ch) == 0,
      s"ImaAdpcm.encodeWav: blockAlign=$blockAlign must leave whole 4-byte groups per channel")
    val samplesPerBlock = (blockAlign - headerBytes) * 2 / ch + 1
    val frames = clip.samples.length / ch
    val nBlocks = if (frames == 0) 0 else (frames + samplesPerBlock - 1) / samplesPerBlock
    val data = new Array[Byte](nBlocks * blockAlign)
    val idx = new Array[Int](ch) // step index carries ACROSS blocks (standard practice)
    var blk = 0
    while (blk < nBlocks) {
      val blockStart = blk * blockAlign
      val frame0 = blk * samplesPerBlock
      val pred = new Array[Int](ch)
      var c = 0
      while (c < ch) {
        pred(c) = clip.samples(frame0 * ch + c)
        val at = blockStart + 4 * c
        data(at) = pred(c).toByte
        data(at + 1) = (pred(c) >> 8).toByte
        data(at + 2) = idx(c).toByte
        data(at + 3) = 0
        c += 1
      }
      var at = blockStart + headerBytes
      var frameInBlock = 1
      while (frameInBlock < samplesPerBlock) {
        var c2 = 0
        while (c2 < ch) {
          val base = at + 4 * c2
          var k = 0
          while (k < 8) {
            val frame = frame0 + frameInBlock + k
            // past-the-end frames encode as "repeat the predictor"
            val sample =
              if (frame < frames) clip.samples(frame * ch + c2) else pred(c2)
            val (nib, p2) = encodeStep(sample, pred(c2), idx(c2))
            pred(c2) = p2
            idx(c2) = clampIndex(idx(c2) + IndexTable(nib & 7))
            val bi = base + (k >> 1)
            if ((k & 1) == 0) data(bi) = (data(bi) & 0xF0 | nib).toByte
            else data(bi) = (data(bi) & 0x0F | (nib << 4)).toByte
            k += 1
          }
          c2 += 1
        }
        at += 4 * ch
        frameInBlock += 8
      }
      blk += 1
    }
    // RIFF wrapper: fmt (20 bytes incl. cbSize + samplesPerBlock) + fact + data
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val byteRate = (clip.sampleRate.toLong * blockAlign / samplesPerBlock).toInt
    val fmt = le16(0x11) ++ le16(ch) ++ le32(clip.sampleRate) ++ le32(byteRate) ++
      le16(blockAlign) ++ le16(4) ++ le16(2) ++ le16(samplesPerBlock)
    val fact = le32(frames)
    val body = "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(fmt.length) ++ fmt ++
      "fact".getBytes("US-ASCII") ++ le32(fact.length) ++ fact ++
      "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }
}
