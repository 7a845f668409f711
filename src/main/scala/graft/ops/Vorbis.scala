package graft.ops

/** From-spec Vorbis I decoder (Xiph Vorbis I specification) over the
  * Ogg framing [[Ogg]] already parses for metadata — the packet-data
  * rung that round 13 declared out of scope, closed in round 14 with
  * the same discipline that produced FLAC/MP3/Brotli:
  *
  *  - Ogg packet demux: lacing-value reassembly across pages
  *    (255-continuation rule, the continued-packet flag), every page
  *    CRC-verified with [[Ogg.pageCrc]] before a byte is trusted;
  *  - the three headers (§4.2): identification (version 0, blocksize
  *    gates), comment (skipped past), setup — codebooks with the
  *    canonical codeword assignment (§3.2.1), both lookup types and
  *    the float32_unpack format (§9.2.2), floor type 1 (§7.2),
  *    residue types 0/1/2 (§8.6), mapping type 0, modes;
  *  - audio packets (§4.3): floor1 curve synthesis with the exact
  *    integer render_point/render_line arithmetic and the published
  *    inverse-dB table (10^((i−255)·7/256) — spot-pinned against the
  *    spec's literals), residue partition/classword decode, inverse
  *    channel coupling, floor×residue, the IMDCT (direct form — the
  *    blocks a corpus hits are ≤8192 and decode is scan-local), the
  *    Vorbis window with long/short slope matching, and center-
  *    aligned overlap-add with granule truncation.
  *
  * Out of scope, refused with reasons: floor type 0 (the legacy LSP
  * floor essentially no modern encoder emits) and non-audio streams.
  *
  * No Vorbis implementation exists on this classpath, so the
  * cross-validation discipline is the [[Mkv]]/[[Pdf]] one: a minimal
  * spec-legal ENCODER ([[packTonePages]]) writes streams exercising
  * the real machinery (huffman classbooks, VQ value books, floor
  * posts, residue cascades), the spec suite pins hand-computed
  * vectors (the §3.2.1 codeword example, float32_unpack cases,
  * render_line, window values) and reconstructs decoder PCM against
  * a closed-form IMDCT computed independently in the test.
  *
  * Hostile-bytes contract as the whole codec ladder: never throws,
  * bounds-checked, None on malformed streams; a premature packet end
  * during AUDIO decode is, per §4.3, not an error (remaining vectors
  * zero).
  */
object Vorbis {

  private object Refuse extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def refuse(): Nothing = throw Refuse
  /** test-only: observes each floor's raw decoded post values. */
  private[graft] var debugHook: Array[Int] => Unit = null
  /** end-of-packet inside an audio packet: legal, zeros follow. */
  private object Eop extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** Vorbis bit reader: LSB-first within bytes (§2). */
  private final class Br(val b: Array[Byte], val from: Int, val until: Int) {
    private var bit = 0
    private var pos = from
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= until) throw Eop
        v |= ((b(pos) >> bit) & 1) << i
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
    def read1(): Int = read(1)
    def readLong(n: Int): Long = {
      val lo = read(math.min(n, 24)).toLong
      if (n <= 24) lo else lo | (read(n - 24).toLong << 24)
    }
  }

  private def ilog(x0: Int): Int = {
    var x = x0
    var r = 0
    while (x > 0) { r += 1; x >>= 1 }
    r
  }

  /** §9.2.2 float32_unpack: 21-bit mantissa, 10-bit exponent biased
    * 788, sign bit. */
  private[graft] def float32Unpack(x: Long): Float = {
    val mant = (x & 0x1FFFFF).toDouble
    val sign = (x & 0x80000000L) != 0
    val exp = ((x & 0x7FE00000L) >> 21).toInt
    val v = mant * math.pow(2.0, exp - 788)
    (if (sign) -v else v).toFloat
  }

  /** Inverse for the dyadic values the fixture encoder plants. */
  private[graft] def float32Pack(v0: Double): Long = {
    if (v0 == 0.0) return 0L
    val sign = if (v0 < 0) 0x80000000L else 0L
    var mant = math.abs(v0)
    var exp = 788
    while (mant < (1 << 20) && exp > 0) { mant *= 2; exp -= 1 }
    while (mant >= (1 << 21)) { mant /= 2; exp += 1 }
    require(mant == math.floor(mant), s"not dyadic-representable: $v0")
    sign | (exp.toLong << 21) | mant.toLong
  }

  /** §3.2.1 canonical codeword assignment. lengths(i) = 0 marks an
    * unused entry. Returns codes aligned with lengths; refuses over-
    * and underpopulated trees (single-entry books excepted). */
  private[graft] def assignCodewords(lengths: Array[Int]): Array[Int] = {
    val codes = new Array[Int](lengths.length)
    val marker = new Array[Long](33)
    val used = lengths.count(_ > 0)
    var i = 0
    while (i < lengths.length) {
      val len = lengths(i)
      if (len > 0) {
        val entry = marker(len)
        if (len < 32 && (entry >>> len) != 0) refuse() // overpopulated
        codes(i) = entry.toInt
        var j = len
        var done = false
        while (j > 0 && !done) {
          if ((marker(j) & 1) != 0) {
            if (j == 1) marker(1) += 1
            else marker(j) = marker(j - 1) << 1
            done = true
          } else { marker(j) += 1; j -= 1 }
        }
        var k = len + 1
        var e = entry
        var cont = true
        while (k <= 32 && cont) {
          if ((marker(k) >>> 1) == e) { e = marker(k); marker(k) = marker(k - 1) << 1 }
          else cont = false
          k += 1
        }
      }
      i += 1
    }
    // underpopulated-tree check: the assignment must have consumed the
    // whole unit interval (marker(1) reaches 2 via the carries), i.e.
    // the longest marker sits exactly at the top. Single-entry books
    // are the spec-blessed exception.
    if (used > 1) {
      var full = false
      var j = 1
      while (j <= 32 && !full) { if (marker(j) == (1L << j)) full = true; j += 1 }
      if (!full) refuse()
    }
    codes
  }

  /** One parsed codebook: scalar huffman decode + optional VQ
    * vectors. */
  private final class Codebook(val dims: Int, val entries: Int,
      val lengths: Array[Int], codes: Array[Int], val vq: Array[Array[Float]]) {
    // (length<<32 | code) -> entry
    private val map: java.util.HashMap[Long, Integer] = {
      val m = new java.util.HashMap[Long, Integer]()
      var i = 0
      while (i < entries) {
        if (lengths(i) > 0) m.put((lengths(i).toLong << 32) | (codes(i).toLong & 0xFFFFFFFFL), i)
        i += 1
      }
      m
    }
    private val single: Int = if (map.size == 1) {
      var e = -1; map.values().forEach(v => e = v); e
    } else -1
    def decode(br: Br): Int = {
      if (single >= 0) { br.read1(); return single } // single-entry: one bit, entry 0
      var code = 0L
      var len = 0
      while (len < 32) {
        code = (code << 1) | br.read1()
        len += 1
        val e = map.get((len.toLong << 32) | code)
        if (e != null) return e
      }
      refuse()
    }
  }

  private def lookup1Values(entries: Int, dims: Int): Int = {
    var v = 1
    while (math.pow(v + 1, dims) <= entries) v += 1
    v
  }

  private def readCodebook(br: Br): Codebook = {
    if (br.read(24) != 0x564342) refuse() // 'BCV' sync
    val dims = br.read(16)
    val entries = br.readLong(24).toInt
    // caps: real codebooks are ≤ a few thousand entries; the bound
    // exists so a crafted setup cannot allocate gigabytes of VQ
    // vectors before the huffman layer even runs (256 books × the
    // old 2^24-value cap was a 16 GiB hostile allocation)
    if (dims < 1 || entries < 1 || entries > (1 << 18)) refuse()
    val lengths = new Array[Int](entries)
    val ordered = br.read1() == 1
    if (!ordered) {
      val sparse = br.read1() == 1
      var i = 0
      while (i < entries) {
        if (sparse) {
          lengths(i) = if (br.read1() == 1) br.read(5) + 1 else 0
        } else lengths(i) = br.read(5) + 1
        i += 1
      }
    } else {
      var cur = 0
      var len = br.read(5) + 1
      while (cur < entries) {
        val num = br.read(ilog(entries - cur))
        if (cur + num > entries || len > 32) refuse()
        var i = 0
        while (i < num) { lengths(cur + i) = len; i += 1 }
        cur += num
        len += 1
      }
    }
    val codes = assignCodewords(lengths)
    val lookupType = br.read(4)
    val vq: Array[Array[Float]] = lookupType match {
      case 0 => null
      case 1 | 2 =>
        val min = float32Unpack(br.readLong(32))
        val delta = float32Unpack(br.readLong(32))
        val valueBits = br.read(4) + 1
        val seqP = br.read1() == 1
        val nVals = if (lookupType == 1) lookup1Values(entries, dims) else entries * dims
        if (nVals > (1 << 20) || entries.toLong * dims > (1 << 20)) refuse()
        val mults = new Array[Int](nVals)
        var i = 0
        while (i < nVals) { mults(i) = br.readLong(valueBits).toInt; i += 1 }
        val out = new Array[Array[Float]](entries)
        var e = 0
        while (e < entries) {
          val v = new Array[Float](dims)
          var last = 0.0f
          if (lookupType == 1) {
            var idxDiv = 1
            var d = 0
            while (d < dims) {
              val off = (e / idxDiv) % nVals
              v(d) = mults(off) * delta + min + last
              if (seqP) last = v(d)
              idxDiv *= nVals
              d += 1
            }
          } else {
            var d = 0
            while (d < dims) {
              v(d) = mults(e * dims + d) * delta + min + last
              if (seqP) last = v(d)
              d += 1
            }
          }
          out(e) = v
          e += 1
        }
        out
      case _ => refuse()
    }
    new Codebook(dims, entries, lengths, codes, vq)
  }

  // --- floor 1 -------------------------------------------------------

  private final class Floor1(val partClassList: Array[Int], val classDims: Array[Int],
      val classSubs: Array[Int], val classMaster: Array[Int],
      val subBooks: Array[Array[Int]], val multiplier: Int, val xList: Array[Int])

  private def readFloor1(br: Br, books: Array[Codebook]): Floor1 = {
    val partitions = br.read(5)
    val pcl = new Array[Int](partitions)
    var maxClass = -1
    var i = 0
    while (i < partitions) {
      pcl(i) = br.read(4)
      if (pcl(i) > maxClass) maxClass = pcl(i)
      i += 1
    }
    val nCls = maxClass + 1
    val dims = new Array[Int](nCls)
    val subs = new Array[Int](nCls)
    val master = Array.fill(nCls)(-1)
    val sub = new Array[Array[Int]](nCls)
    i = 0
    while (i < nCls) {
      dims(i) = br.read(3) + 1
      subs(i) = br.read(2)
      if (subs(i) > 0) {
        master(i) = br.read(8)
        if (master(i) >= books.length) refuse()
      }
      val n = 1 << subs(i)
      sub(i) = new Array[Int](n)
      var k = 0
      while (k < n) {
        sub(i)(k) = br.read(8) - 1
        if (sub(i)(k) >= books.length) refuse()
        k += 1
      }
      i += 1
    }
    val multiplier = br.read(2) + 1
    val rangebits = br.read(4)
    val xb = scala.collection.mutable.ArrayBuffer[Int](0, 1 << rangebits)
    i = 0
    while (i < partitions) {
      var j = 0
      while (j < dims(pcl(i))) { xb += br.read(rangebits); j += 1 }
      i += 1
    }
    if (xb.length > 65) refuse()
    if (xb.distinct.length != xb.length) refuse() // non-unique X values
    new Floor1(pcl, dims, subs, master, sub, multiplier, xb.toArray)
  }

  private val Floor1Ranges = Array(256, 128, 86, 64)

  /** The published floor1_inverse_dB_table: amplitude =
    * 10^((i−255)·7/256); the spec's literal endpoints are pinned in
    * VorbisSpec. */
  private[graft] val inverseDbTable: Array[Float] =
    Array.tabulate(256)(i => math.pow(10.0, (i - 255) * 7.0 / 256.0).toFloat)

  private def renderPoint(x0: Int, y0: Int, x1: Int, y1: Int, x: Int): Int = {
    val dy = y1 - y0
    val adx = x1 - x0
    val ady = math.abs(dy)
    val err = ady * (x - x0)
    val off = err / adx
    if (dy < 0) y0 - off else y0 + off
  }

  private def renderLine(x0: Int, y0: Int, x1: Int, y1: Int,
      v: Array[Int], n: Int): Unit = {
    val dy = y1 - y0
    val adx = x1 - x0
    var ady = math.abs(dy)
    val base = dy / adx
    val sy = if (dy < 0) base - 1 else base + 1
    ady -= math.abs(base) * adx
    var x = x0
    var y = y0
    var err = 0
    if (x < n) v(x) = y
    x += 1
    while (x < math.min(x1, n)) {
      err += ady
      if (err >= adx) { err -= adx; y += sy } else y += base
      v(x) = y
      x += 1
    }
  }

  /** Decode one channel's floor1 into a linear curve of length n2, or
    * null for an unused channel. */
  private def floor1Decode(br: Br, f: Floor1, books: Array[Codebook], n2: Int): Array[Float] = {
    if (br.read1() == 0) return null
    val range = Floor1Ranges(f.multiplier - 1)
    val posts = f.xList.length
    val y = new Array[Int](posts)
    val bits = ilog(range - 1)
    y(0) = br.read(bits)
    y(1) = br.read(bits)
    var offset = 2
    var i = 0
    while (i < f.partClassList.length) {
      val cls = f.partClassList(i)
      val cdim = f.classDims(cls)
      val cbits = f.classSubs(cls)
      val csub = (1 << cbits) - 1
      var cval = 0
      if (cbits > 0) cval = books(f.classMaster(cls)).decode(br)
      var j = 0
      while (j < cdim) {
        val book = f.subBooks(cls)(cval & csub)
        cval >>= cbits
        y(offset + j) = if (book >= 0) books(book).decode(br) else 0
        j += 1
      }
      offset += cdim
      i += 1
    }
    if (debugHook != null) debugHook(y.clone())
    // amplitude value synthesis (§7.2.4 step 1)
    val finalY = new Array[Int](posts)
    val step2 = new Array[Boolean](posts)
    step2(0) = true; step2(1) = true
    finalY(0) = y(0); finalY(1) = y(1)
    i = 2
    while (i < posts) {
      // low/high neighbors among positions 0..i-1
      var low = 0; var high = 1
      var k = 0
      while (k < i) {
        if (f.xList(k) < f.xList(i) && f.xList(k) > f.xList(low)) low = k
        if (f.xList(k) > f.xList(i) &&
          (f.xList(high) <= f.xList(i) || f.xList(k) < f.xList(high))) high = k
        k += 1
      }
      val predicted = renderPoint(f.xList(low), finalY(low), f.xList(high), finalY(high), f.xList(i))
      val value = y(i)
      val highroom = range - predicted
      val lowroom = predicted
      val room = math.min(highroom, lowroom) * 2
      if (value != 0) {
        step2(low) = true; step2(high) = true; step2(i) = true
        finalY(i) =
          if (value >= room) {
            if (highroom > lowroom) value - lowroom + predicted
            else predicted - (value - highroom) - 1
          } else if ((value & 1) == 1) predicted - ((value + 1) / 2)
          else predicted + value / 2
      } else {
        step2(i) = false
        finalY(i) = predicted
      }
      if (finalY(i) < 0) finalY(i) = 0
      if (finalY(i) >= range) finalY(i) = range - 1
      i += 1
    }
    // curve synthesis (step 2): sort posts by X, render lines
    val order = (0 until posts).sortBy(f.xList)
    val idx = new Array[Int](n2)
    var lx = 0
    var ly = finalY(order.head) * f.multiplier
    var hx = 0
    var hy = ly
    order.tail.foreach { p =>
      if (step2(p)) {
        hy = finalY(p) * f.multiplier
        hx = f.xList(p)
        renderLine(lx, ly, hx, hy, idx, n2)
        lx = hx; ly = hy
      }
    }
    if (hx < n2) renderLine(hx, hy, n2, hy, idx, n2) // extend flat
    val out = new Array[Float](n2)
    i = 0
    while (i < n2) {
      out(i) = inverseDbTable(math.min(255, math.max(0, idx(i))))
      i += 1
    }
    out
  }

  // --- residues ------------------------------------------------------

  private final class Residue(val rType: Int, val begin: Int, val end: Int,
      val partSize: Int, val classifications: Int, val classbook: Int,
      val cascade: Array[Int], val books: Array[Array[Int]])

  private def readResidue(br: Br, rType: Int, nBooks: Int): Residue = {
    val begin = br.readLong(24).toInt
    val end = br.readLong(24).toInt
    val partSize = br.readLong(24).toInt + 1
    val classifications = br.read(6) + 1
    val classbook = br.read(8)
    if (classbook >= nBooks || begin < 0 || end < begin) refuse()
    val cascade = new Array[Int](classifications)
    var i = 0
    while (i < classifications) {
      val low = br.read(3)
      val high = if (br.read1() == 1) br.read(5) else 0
      cascade(i) = (high << 3) | low
      i += 1
    }
    val books = Array.ofDim[Int](classifications, 8)
    i = 0
    while (i < classifications) {
      var j = 0
      while (j < 8) {
        books(i)(j) = if (((cascade(i) >> j) & 1) == 1) {
          val b = br.read(8)
          if (b >= nBooks) refuse()
          b
        } else -1
        j += 1
      }
      i += 1
    }
    new Residue(rType, begin, end, partSize, classifications, classbook, cascade, books)
  }

  /** §8.6.2 residue decode into `vecs` (one per channel for types
    * 0/1; for type 2 callers pass ONE interleaved vector). */
  private def residueDecode(br: Br, r: Residue, books: Array[Codebook],
      vecs: Array[Array[Float]], doNotDecode: Array[Boolean]): Unit = {
    val actualSize = vecs(0).length
    val begin = math.min(r.begin, actualSize)
    val end = math.min(r.end, actualSize)
    val nToRead = end - begin
    if (nToRead == 0) return
    val partitionsToRead = nToRead / r.partSize
    val classbook = books(r.classbook)
    val classwords = classbook.dims
    val ch = vecs.length
    val classifs = Array.ofDim[Int](ch, partitionsToRead + classwords)
    var pass = 0
    while (pass < 8) {
      var partitionCount = 0
      try {
        while (partitionCount < partitionsToRead) {
          if (pass == 0) {
            var j = 0
            while (j < ch) {
              if (!doNotDecode(j)) {
                var temp = classbook.decode(br)
                var i = classwords - 1
                while (i >= 0) {
                  classifs(j)(partitionCount + i) = temp % r.classifications
                  temp /= r.classifications
                  i -= 1
                }
              }
              j += 1
            }
          }
          var i = 0
          while (i < classwords && partitionCount < partitionsToRead) {
            var j = 0
            while (j < ch) {
              if (!doNotDecode(j)) {
                val vq = classifs(j)(partitionCount)
                val bookIdx = r.books(vq)(pass)
                if (bookIdx >= 0) {
                  val book = books(bookIdx)
                  if (book.vq == null) refuse()
                  val offset = begin + partitionCount * r.partSize
                  if (r.rType == 0) {
                    val step = r.partSize / book.dims
                    var s = 0
                    while (s < step) {
                      val vals = book.vq(book.decode(br))
                      var d = 0
                      while (d < book.dims) {
                        vecs(j)(offset + s + d * step) += vals(d)
                        d += 1
                      }
                      s += 1
                    }
                  } else { // formats 1 and 2 share the sequential add
                    var s = 0
                    while (s < r.partSize) {
                      val vals = book.vq(book.decode(br))
                      var d = 0
                      while (d < book.dims) {
                        vecs(j)(offset + s) += vals(d)
                        s += 1
                        d += 1
                      }
                    }
                  }
                }
              }
              j += 1
            }
            partitionCount += 1
            i += 1
          }
        }
      } catch { case Eop => return } // end of packet: zeros remain
      pass += 1
      // skip passes with no books anywhere (nothing more to read)
      if (r.cascade.forall(c => (c >> pass) == 0)) return
    }
  }

  // --- mappings & modes ---------------------------------------------

  private final class Mapping(val submaps: Int, val magnitude: Array[Int],
      val angle: Array[Int], val mux: Array[Int], val submapFloor: Array[Int],
      val submapResidue: Array[Int])
  private final class Mode(val blockflag: Int, val mapping: Int)

  private final class Setup(val books: Array[Codebook], val floors: Array[Floor1],
      val residues: Array[Residue], val mappings: Array[Mapping], val modes: Array[Mode])

  private def readSetup(br: Br, channels: Int): Setup = {
    val nBooks = br.read(8) + 1
    val books = Array.fill(nBooks)(readCodebook(br))
    // time-domain transforms: all zero placeholders
    val nTimes = br.read(6) + 1
    var i = 0
    while (i < nTimes) { if (br.read(16) != 0) refuse(); i += 1 }
    val nFloors = br.read(6) + 1
    val floors = new Array[Floor1](nFloors)
    i = 0
    while (i < nFloors) {
      br.read(16) match {
        case 1 => floors(i) = readFloor1(br, books)
        case _ => refuse() // floor 0: legacy LSP, declared out
      }
      i += 1
    }
    val nRes = br.read(6) + 1
    val residues = new Array[Residue](nRes)
    i = 0
    while (i < nRes) {
      val t = br.read(16)
      if (t > 2) refuse()
      residues(i) = readResidue(br, t, nBooks)
      i += 1
    }
    val nMaps = br.read(6) + 1
    val mappings = new Array[Mapping](nMaps)
    i = 0
    while (i < nMaps) {
      if (br.read(16) != 0) refuse() // mapping type 0 only (the only defined type)
      val submaps = if (br.read1() == 1) br.read(4) + 1 else 1
      var mag: Array[Int] = Array.emptyIntArray
      var ang: Array[Int] = Array.emptyIntArray
      if (br.read1() == 1) {
        val steps = br.read(8) + 1
        mag = new Array[Int](steps)
        ang = new Array[Int](steps)
        var s = 0
        while (s < steps) {
          mag(s) = br.read(ilog(channels - 1))
          ang(s) = br.read(ilog(channels - 1))
          if (mag(s) == ang(s) || mag(s) >= channels || ang(s) >= channels) refuse()
          s += 1
        }
      }
      if (br.read(2) != 0) refuse() // reserved
      val mux = new Array[Int](channels)
      if (submaps > 1) {
        var c = 0
        while (c < channels) {
          mux(c) = br.read(4)
          if (mux(c) >= submaps) refuse()
          c += 1
        }
      }
      val sf = new Array[Int](submaps)
      val sr = new Array[Int](submaps)
      var s = 0
      while (s < submaps) {
        br.read(8) // unused time config
        sf(s) = br.read(8)
        sr(s) = br.read(8)
        if (sf(s) >= nFloors || sr(s) >= nRes) refuse()
        s += 1
      }
      mappings(i) = new Mapping(submaps, mag, ang, mux, sf, sr)
      i += 1
    }
    val nModes = br.read(6) + 1
    val modes = new Array[Mode](nModes)
    i = 0
    while (i < nModes) {
      val blockflag = br.read1()
      if (br.read(16) != 0 || br.read(16) != 0) refuse() // window/transform type
      val mapping = br.read(8)
      if (mapping >= nMaps) refuse()
      modes(i) = new Mode(blockflag, mapping)
      i += 1
    }
    if (br.read1() != 1) refuse() // framing
    new Setup(books, floors, residues, mappings, modes)
  }

  // --- window & IMDCT -------------------------------------------------

  private def vorbisWindow(n: Int, blockflag: Boolean, shortN: Int,
      prevFlag: Boolean, nextFlag: Boolean): Array[Double] = {
    val w = new Array[Double](n)
    val (leftStart, leftN) =
      if (blockflag && !prevFlag) (n / 4 - shortN / 4, shortN / 2) else (0, n / 2)
    val (rightStart, rightN) =
      if (blockflag && !nextFlag) (n * 3 / 4 - shortN / 4, shortN / 2) else (n / 2, n / 2)
    var i = 0
    while (i < n) {
      w(i) =
        if (i < leftStart) 0.0
        else if (i < leftStart + leftN) {
          val x = (i - leftStart + 0.5) / leftN * (math.Pi / 2)
          math.sin(math.Pi / 2 * math.pow(math.sin(x), 2))
        } else if (i < rightStart) 1.0
        else if (i < rightStart + rightN) {
          val x = (i - rightStart + 0.5) / rightN * (math.Pi / 2) + math.Pi / 2
          math.sin(math.Pi / 2 * math.pow(math.sin(x), 2))
        } else 0.0
      i += 1
    }
    w
  }

  /** Per-blocksize cosine tables: the IMDCT argument is
    * π/2n · M with M = (2j+1+n/2)(2k+1), periodic in M mod 4n — one
    * bounded table per n replaces a trig call per term. */
  private val cosTables = new java.util.concurrent.ConcurrentHashMap[Int, Array[Double]]()
  private def cosTable(n: Int): Array[Double] =
    cosTables.computeIfAbsent(n, n0 => {
      val t = new Array[Double](4 * n0)
      var m = 0
      while (m < 4 * n0) { t(m) = math.cos(math.Pi / (2.0 * n0) * m); m += 1 }
      t
    })

  /** Direct-form IMDCT (§4.3.7's definition): y[j] = Σ X[k]
    * cos(π/2n · (2j+1+n/2)(2k+1)). O(n·nnz) over the cosine table —
    * the spectra real floors produce are dense, but the table keeps
    * every term a lookup, and skipping exact-zero coefficients makes
    * sparse spectra (silence-classed partitions) nearly free. Fine
    * for scan-local decode of ≤8192 blocks. */
  private def imdct(x: Array[Float], n: Int): Array[Double] = {
    val out = new Array[Double](n)
    val n2 = n / 2
    val tab = cosTable(n)
    val period = 4L * n
    // nonzero coefficient list: residue silence classes leave runs of
    // exact zeros that contribute nothing
    var nnz = 0
    val nzIdx = new Array[Int](n2)
    var k = 0
    while (k < n2) { if (x(k) != 0f) { nzIdx(nnz) = k; nnz += 1 }; k += 1 }
    var j = 0
    while (j < n) {
      var acc = 0.0
      val a = 2L * j + 1 + n2
      var i = 0
      while (i < nnz) {
        val kk = nzIdx(i)
        acc += x(kk) * tab(((a * (2 * kk + 1)) % period).toInt)
        i += 1
      }
      out(j) = acc
      j += 1
    }
    out
  }

  // --- Ogg packet demux ------------------------------------------------

  /** All packets of the FIRST logical stream, page-CRC verified, plus
    * the stream's final granule. None on framing damage. */
  private[graft] def packets(p: Array[Byte]): Option[(Vector[Array[Byte]], Long)] = {
    def u8(i: Int): Int = p(i) & 0xFF
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def le64(i: Int): Long = le32(i) | (le32(i + 4) << 32)
    if (p.length < 28) return None
    val out = Vector.newBuilder[Array[Byte]]
    val cur = new java.io.ByteArrayOutputStream()
    var haveSerial = false
    var serial = 0L
    var granule = -1L
    var pos = 0
    var pages = 0
    var open = false // a packet is mid-assembly
    while (pos + 27 <= p.length && pages < (1 << 20)) {
      if (u8(pos) != 'O' || u8(pos + 1) != 'g' || u8(pos + 2) != 'g' || u8(pos + 3) != 'S')
        return None
      if (u8(pos + 4) != 0) return None
      val flags = u8(pos + 5)
      val gran = le64(pos + 6)
      val ser = le32(pos + 14)
      val nSegs = u8(pos + 26)
      if (pos + 27 + nSegs > p.length) return None
      var dataLen = 0
      var s = 0
      while (s < nSegs) { dataLen += u8(pos + 27 + s); s += 1 }
      val body = pos + 27 + nSegs
      if (body + dataLen > p.length) return None
      if (Ogg.pageCrc(p, pos, body + dataLen, pos + 22) != le32(pos + 22).toInt) return None
      if (!haveSerial) {
        if ((flags & 0x02) == 0) return None
        serial = ser; haveSerial = true
      }
      if (ser == serial) {
        if ((flags & 0x01) == 0 && open) { cur.reset(); open = false } // lost continuation
        var off = body
        s = 0
        while (s < nSegs) {
          val l = u8(pos + 27 + s)
          cur.write(p, off, l)
          off += l
          if (l < 255) { out += cur.toByteArray; cur.reset(); open = false }
          else open = true
          s += 1
        }
        if (gran != -1L) granule = gran
      }
      pos = body + dataLen
      pages += 1
    }
    if (!haveSerial || pos != p.length) return None
    Some((out.result(), granule))
  }

  // --- the decoder -----------------------------------------------------

  /** Decoded stream: float PCM per channel plus the stream facts. */
  final case class Pcm(channels: Int, sampleRate: Int, samples: Array[Array[Float]])

  def decode(p: Array[Byte], maxSamples: Int = AudioPcm.MaxSamples): Option[Pcm] =
    try {
      val (pkts, granule) = packets(p).getOrElse(return None)
      if (pkts.length < 3) return None
      // identification header
      val id = pkts(0)
      def hdrOk(pkt: Array[Byte], t: Int): Boolean =
        pkt.length > 7 && (pkt(0) & 0xFF) == t && pkt(1) == 'v' && pkt(2) == 'o' &&
          pkt(3) == 'r' && pkt(4) == 'b' && pkt(5) == 'i' && pkt(6) == 's'
      if (!hdrOk(id, 1) || !hdrOk(pkts(1), 3) || !hdrOk(pkts(2), 5)) return None
      val ibr = new Br(id, 7, id.length)
      if (ibr.readLong(32) != 0L) return None // vorbis_version
      val channels = ibr.read(8)
      val rate = ibr.readLong(32).toInt
      ibr.readLong(32); ibr.readLong(32); ibr.readLong(32) // bitrates
      val bs0 = 1 << ibr.read(4)
      val bs1 = 1 << ibr.read(4)
      if (channels < 1 || channels > 16 || rate <= 0 ||
        bs0 < 64 || bs1 < bs0 || bs1 > 8192 || ibr.read1() != 1) return None
      val setup = readSetup(new Br(pkts(2), 7, pkts(2).length), channels)
      val modeBits = ilog(setup.modes.length - 1)

      val floatOuts = Array.fill(channels)(scala.collection.mutable.ArrayBuffer[Float]())
      var prevRight: Array[Array[Double]] = null
      var prevN = 0
      var total = 0L
      var pi = 3
      while (pi < pkts.length) {
        val pkt = pkts(pi)
        if (pkt.nonEmpty) {
          val br = new Br(pkt, 0, pkt.length)
          try {
            if (br.read1() == 0) { // audio packet
              val mode = setup.modes(br.read(modeBits))
              val long = mode.blockflag == 1
              val n = if (long) bs1 else bs0
              val (prevFlag, nextFlag) =
                if (long) (br.read1() == 1, br.read1() == 1) else (false, false)
              val mapping = setup.mappings(mode.mapping)
              val n2 = n / 2
              // floors
              val floors = new Array[Array[Float]](channels)
              val noResidue = new Array[Boolean](channels)
              var c = 0
              while (c < channels) {
                val f = setup.floors(mapping.submapFloor(mapping.mux(c)))
                floors(c) = floor1Decode(br, f, setup.books, n2)
                noResidue(c) = floors(c) == null
                c += 1
              }
              // coupling: a coupled pair decodes if EITHER side has a floor
              var s = 0
              while (s < mapping.magnitude.length) {
                if (!noResidue(mapping.magnitude(s)) || !noResidue(mapping.angle(s))) {
                  noResidue(mapping.magnitude(s)) = false
                  noResidue(mapping.angle(s)) = false
                }
                s += 1
              }
              // residues per submap
              val residueVecs = Array.fill(channels)(new Array[Float](n2))
              var sm = 0
              while (sm < mapping.submaps) {
                val chIdx = (0 until channels).filter(mapping.mux(_) == sm).toArray
                val r = setup.residues(mapping.submapResidue(sm))
                if (r.rType == 2) {
                  val dnd = chIdx.map(noResidue)
                  if (!dnd.forall(identity)) {
                    val inter = new Array[Float](n2 * chIdx.length)
                    residueDecode(br, r, setup.books,
                      Array(inter), Array(false))
                    var k = 0
                    while (k < n2) {
                      var j = 0
                      while (j < chIdx.length) {
                        residueVecs(chIdx(j))(k) = inter(k * chIdx.length + j)
                        j += 1
                      }
                      k += 1
                    }
                  }
                } else {
                  residueDecode(br, r, setup.books,
                    chIdx.map(residueVecs), chIdx.map(noResidue))
                }
                sm += 1
              }
              // inverse coupling (§4.3.5), last step first
              s = mapping.magnitude.length - 1
              while (s >= 0) {
                val mv = residueVecs(mapping.magnitude(s))
                val av = residueVecs(mapping.angle(s))
                var k = 0
                while (k < n2) {
                  val m = mv(k); val a = av(k)
                  if (m > 0) {
                    if (a > 0) { av(k) = m - a } else { av(k) = m; mv(k) = m + a }
                  } else {
                    if (a > 0) { av(k) = m + a } else { av(k) = m; mv(k) = m - a }
                  }
                  k += 1
                }
                s -= 1
              }
              // floor × residue → IMDCT → window
              val win = vorbisWindow(n, long, bs0, prevFlag, nextFlag)
              val blocks = new Array[Array[Double]](channels)
              c = 0
              while (c < channels) {
                val spec = new Array[Float](n2)
                if (floors(c) != null) {
                  var k = 0
                  while (k < n2) { spec(k) = floors(c)(k) * residueVecs(c)(k); k += 1 }
                }
                val t = imdct(spec, n)
                var k = 0
                while (k < n) { t(k) *= win(k); k += 1 }
                blocks(c) = t
                c += 1
              }
              // center-aligned overlap-add: emit (prevN/4 + n/4) samples
              if (prevRight != null) {
                val outLen = prevN / 4 + n / 4
                val off = n / 4 - prevN / 4
                c = 0
                while (c < channels) {
                  var t = 0
                  while (t < outLen) {
                    var v = 0.0
                    if (t < prevN / 2) v += prevRight(c)(t)
                    val ci = t + off
                    if (ci >= 0 && ci < n / 2) v += blocks(c)(ci)
                    floatOuts(c) += v.toFloat
                    t += 1
                  }
                  c += 1
                }
                total += outLen
                if (total > maxSamples) return None
              }
              prevRight = blocks.map(_.drop(n / 2))
              prevN = n
            }
          } catch { case Eop => () } // truncated audio packet: emitted what we had
        }
        pi += 1
      }
      if (floatOuts(0).isEmpty) return None
      // granule truncation: the final granule position is the absolute
      // sample count of the stream
      val want = if (granule >= 0 && granule < floatOuts(0).length) granule.toInt
                 else floatOuts(0).length
      Some(Pcm(channels, rate, floatOuts.map(_.take(want).toArray)))
    } catch { case Refuse | Eop | _: ArrayIndexOutOfBoundsException |
        _: NegativeArraySizeException | _: ArithmeticException => None }

  // --- fixture encoder -------------------------------------------------
  // A minimal spec-legal Vorbis encoder: mono, a single 256-sample
  // mode, two codebooks (a 1-bit residue classbook and a 16-entry
  // 4-bit lookup-type-1 value book over the exact dyadic grid
  // level·0.5 − 4.0), a 3-post floor1 whose middle post predicts
  // exactly (flat curve at a planted dB index), residue type 2 with a
  // silence class. Degenerate as COMPRESSION, but every decode-side
  // mechanism — huffman classwords, VQ value lookup, floor post
  // prediction, cascade bitmaps, coupling-free mapping, IMDCT,
  // lapping, granule truncation — runs the same code a libvorbis
  // stream exercises. The [[Mkv]]/[[Pdf]] packer discipline.

  /** Vorbis bit writer (LSB-first); huffman codewords go MSB-first. */
  private final class Bw {
    private val bos = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    def bit(v: Int): Unit = {
      cur |= (v & 1) << n
      n += 1
      if (n == 8) { bos.write(cur); cur = 0; n = 0 }
    }
    def bits(v: Long, k: Int): Unit = { var i = 0; while (i < k) { bit(((v >> i) & 1).toInt); i += 1 } }
    def code(v: Int, len: Int): Unit = { var i = len - 1; while (i >= 0) { bit((v >> i) & 1); i -= 1 } }
    def bytes(b: Array[Byte]): Unit = { require(n == 0); bos.write(b) }
    def out: Array[Byte] = { if (n > 0) { bos.write(cur); cur = 0; n = 0 }; bos.toByteArray }
  }

  private def headerPrefix(t: Int): Array[Byte] =
    (t.toByte +: "vorbis".getBytes(java.nio.charset.StandardCharsets.US_ASCII)).toArray

  private def idPacket(rate: Int, channels: Int = 1,
      bs0Exp: Int = 8, bs1Exp: Int = 8): Array[Byte] = {
    val w = new Bw
    w.bytes(headerPrefix(1))
    w.bits(0L, 32) // vorbis_version
    w.bits(channels.toLong, 8)
    w.bits(rate.toLong, 32)
    w.bits(0L, 32); w.bits(0L, 32); w.bits(0L, 32) // bitrates
    w.bits(bs0Exp.toLong, 4); w.bits(bs1Exp.toLong, 4)
    w.bit(1) // framing
    w.out
  }

  private def commentPacket(): Array[Byte] = {
    val w = new Bw
    w.bytes(headerPrefix(3))
    val vendor = "graft".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    w.bits(vendor.length.toLong, 32)
    w.bytes(vendor)
    w.bits(0L, 32) // no comments
    w.bit(1)
    w.out
  }

  /** Setup: two codebooks, one floor, one residue (type 0/1/2), one
    * mapping (coupled 0↔1 when `coupled`), one or two modes (short;
    * + long when `twoModes`). `end` bounds the residue vector — 128
    * covers a mono short block, 256 a stereo interleaved one.
    * `dims2` swaps the scalar value book for a 2-dimensional
    * lookup-type-2 book (the shape real libvorbis streams use with
    * residue formats 0/1 — the two formats only DIFFER with
    * multi-dimension books: 0 strides interleaved, 1 runs
    * sequential). */
  private def setupPacket(channels: Int = 1, twoModes: Boolean = false,
      coupled: Boolean = false, end: Int = 128, residueType: Int = 2,
      dims2: Boolean = false, floorBooks: Boolean = false): Array[Byte] = {
    val w = new Bw
    w.bytes(headerPrefix(5))
    w.bits(if (floorBooks) 3L else 1L, 8) // codebook count − 1
    // book 0: residue classbook — dims 1, entries 2, lengths [1,1]
    w.bits(0x564342L, 24); w.bits(1L, 16); w.bits(2L, 24)
    w.bit(0); w.bit(0) // unordered, non-sparse
    w.bits(0L, 5); w.bits(0L, 5) // lengths 1,1
    w.bits(0L, 4) // lookup 0
    if (!dims2) {
      // book 1: value book — dims 1, entries 16, all length 4,
      // lookup 1: value[e] = e·0.5 − 4.0
      w.bits(0x564342L, 24); w.bits(1L, 16); w.bits(16L, 24)
      w.bit(0); w.bit(0)
      var i = 0
      while (i < 16) { w.bits(3L, 5); i += 1 } // length 4
      w.bits(1L, 4) // lookup type 1
      w.bits(float32Pack(-4.0), 32)
      w.bits(float32Pack(0.5), 32)
      w.bits(3L, 4) // value_bits − 1 → 4-bit multiplicands
      w.bit(0) // sequence_p
      i = 0
      while (i < 16) { w.bits(i.toLong, 4); i += 1 } // mults 0..15
    } else {
      // book 1: value book — dims 2, entries 16 (all 4×4 level
      // pairs), all length 4, lookup type 2: value = mult·0.5 − 1.0,
      // entry e → pair (e>>2, e&3)
      w.bits(0x564342L, 24); w.bits(2L, 16); w.bits(16L, 24)
      w.bit(0); w.bit(0)
      var i = 0
      while (i < 16) { w.bits(3L, 5); i += 1 }
      w.bits(2L, 4) // lookup type 2
      w.bits(float32Pack(-1.0), 32)
      w.bits(float32Pack(0.5), 32)
      w.bits(1L, 4) // value_bits − 1 → 2-bit multiplicands
      w.bit(0) // sequence_p
      i = 0
      while (i < 16) { w.bits((i >> 2).toLong, 2); w.bits((i & 3).toLong, 2); i += 1 }
    }
    if (floorBooks) {
      // book 2: floor class MASTER book — 8 entries, 3-bit codes
      w.bits(0x564342L, 24); w.bits(1L, 16); w.bits(8L, 24)
      w.bit(0); w.bit(0)
      var i = 0
      while (i < 8) { w.bits(2L, 5); i += 1 }
      w.bits(0L, 4)
      // book 3: floor post-VALUE book — 64 entries, 6-bit codes
      // (scalar huffman: the decoded entry number IS the Y value)
      w.bits(0x564342L, 24); w.bits(1L, 16); w.bits(64L, 24)
      w.bit(0); w.bit(0)
      i = 0
      while (i < 64) { w.bits(5L, 5); i += 1 }
      w.bits(0L, 4)
    }
    // time transforms
    w.bits(0L, 6); w.bits(0L, 16)
    // floors: one, type 1
    w.bits(0L, 6); w.bits(1L, 16)
    if (!floorBooks) {
      w.bits(1L, 5) // 1 partition
      w.bits(0L, 4) // class 0
      w.bits(0L, 3) // class dims − 1 → 1
      w.bits(0L, 2) // subclasses 0
      w.bits(0L, 8) // subclass book: 0 → −1 (none)
      w.bits(0L, 2) // multiplier − 1 → 1 (range 256)
      w.bits(7L, 4) // rangebits
      w.bits(64L, 7) // the one class X value
    } else {
      // the BOOK-CODED floor: one partition, class 0 with THREE
      // posts, one subclass bit through the master book, both
      // subclass slots the post-value book
      w.bits(1L, 5)
      w.bits(0L, 4)
      w.bits(2L, 3) // class dims − 1 → 3
      w.bits(1L, 2) // subclasses → 1 bit
      w.bits(2L, 8) // master book 2
      w.bits(4L, 8); w.bits(4L, 8) // both subclass slots → book 3 (+1 encoding)
      w.bits(0L, 2) // multiplier 1 (range 256)
      w.bits(7L, 4)
      w.bits(32L, 7); w.bits(64L, 7); w.bits(96L, 7) // class X values
    }
    // residues: one
    w.bits(0L, 6); w.bits(residueType.toLong, 16)
    w.bits(0L, 24) // begin
    w.bits(end.toLong, 24)
    w.bits(15L, 24) // partition size − 1 → 16
    w.bits(1L, 6) // classifications − 1 → 2
    w.bits(0L, 8) // classbook 0
    w.bits(0L, 3); w.bit(0) // class 0 cascade 0 (silence)
    w.bits(1L, 3); w.bit(0) // class 1 cascade 1 (pass 0)
    w.bits(1L, 8) // class 1 pass 0 → book 1
    // mappings: one, type 0, 1 submap
    w.bits(0L, 6); w.bits(0L, 16)
    w.bit(0) // submaps flag → 1
    if (coupled) {
      w.bit(1)
      w.bits(0L, 8) // coupling steps − 1 → 1
      // magnitude 0, angle 1 (ilog(channels−1) bits each)
      val b = 32 - Integer.numberOfLeadingZeros(channels - 1)
      w.bits(0L, b); w.bits(1L, b)
    } else w.bit(0)
    w.bits(0L, 2) // reserved
    w.bits(0L, 8) // time config
    w.bits(0L, 8) // floor 0
    w.bits(0L, 8) // residue 0
    // modes
    w.bits(if (twoModes) 1L else 0L, 6)
    w.bit(0) // mode 0: short
    w.bits(0L, 16); w.bits(0L, 16)
    w.bits(0L, 8)
    if (twoModes) {
      w.bit(1) // mode 1: long
      w.bits(0L, 16); w.bits(0L, 16)
      w.bits(0L, 8)
    }
    w.bit(1) // framing
    w.out
  }

  /** One audio packet: flat floor at dB index `floorAmp` per channel
    * (a null channel writes an UNUSED floor), and residue-2 levels ∈
    * [−8, 7] over the interleaved vector [0, interleavedEnd)
    * (coefficient = table[floorAmp] · level·0.5). */
  private def audioPacket(floorAmp: Int, chLevels: Array[Array[Int]],
      interleavedEnd: Int, long: Boolean = false, prevFlag: Boolean = false,
      nextFlag: Boolean = false, twoModes: Boolean = false): Array[Byte] = {
    val ch = chLevels.length
    val w = new Bw
    w.bit(0) // audio packet
    if (twoModes) w.bit(if (long) 1 else 0) // mode number (1 bit with 2 modes)
    if (long) { w.bit(if (prevFlag) 1 else 0); w.bit(if (nextFlag) 1 else 0) }
    chLevels.foreach { lv =>
      if (lv == null) w.bit(0) // unused floor (silent channel)
      else {
        w.bit(1)
        w.bits(floorAmp.toLong, 8)
        w.bits(floorAmp.toLong, 8) // flat: the middle post predicts exactly
      }
    }
    // residue: partitions of 16 over the interleaved vector; classword
    // per partition (classbook dims 1): class 1 iff any nonzero
    val inter = new Array[Int](interleavedEnd)
    var j = 0
    while (j < interleavedEnd) {
      val lv = chLevels(j % ch)
      inter(j) = if (lv == null) 0 else lv(j / ch)
      j += 1
    }
    var part = 0
    while (part < interleavedEnd / 16) {
      val active = (0 until 16).exists(i => inter(part * 16 + i) != 0)
      w.code(if (active) 1 else 0, 1) // classbook codewords: 0→'0', 1→'1'
      if (active) {
        var i = 0
        while (i < 16) {
          w.code(inter(part * 16 + i) + 8, 4) // value book: entry = level+8
          i += 1
        }
      }
      part += 1
    }
    w.out
  }

  /** One mono audio packet through the 2-dimensional value book:
    * `vals` are 128 coefficients on the {−1.0, −0.5, 0, 0.5} grid;
    * the emission order compensates the format's layout (format 1
    * sequential pairs, format 0 interleaved stride-8 pairs) so both
    * decode to the SAME spectrum. */
  private def audioPacketDims2(floorAmp: Int, vals: Array[Float], rType: Int): Array[Byte] = {
    require(vals.length == 128 && (rType == 0 || rType == 1))
    val w = new Bw
    w.bit(0)
    w.bit(1); w.bits(floorAmp.toLong, 8); w.bits(floorAmp.toLong, 8)
    def entryOf(a: Float, b: Float): Int = {
      def idx(v: Float): Int = {
        val m = math.round((v + 1.0f) / 0.5f)
        require(m >= 0 && m <= 3, s"off-grid value $v")
        m
      }
      idx(a) * 4 + idx(b)
    }
    var part = 0
    while (part < 8) {
      val off = part * 16
      val active = (0 until 16).exists(i => vals(off + i) != 0f)
      w.code(if (active) 1 else 0, 1)
      if (active) {
        if (rType == 1) {
          var s = 0
          while (s < 16) { w.code(entryOf(vals(off + s), vals(off + s + 1)), 4); s += 2 }
        } else {
          var s = 0
          while (s < 8) { w.code(entryOf(vals(off + s), vals(off + s + 8)), 4); s += 1 }
        }
      }
      part += 1
    }
    w.out
  }

  /** One mono audio packet through the BOOK-CODED floor: raw
    * endpoint posts, the class master codeword, three book-coded
    * post values (driving the prediction/room arithmetic — a
    * non-flat curve), then the scalar-book residue. */
  private def audioPacketFloorBooks(y0: Int, y1: Int, postVals: Array[Int],
      levels: Array[Int]): Array[Byte] = {
    require(postVals.length == 3 && levels.length == 128)
    require(postVals.forall(v => v >= 0 && v < 64), "post values must fit book 3")
    val w = new Bw
    w.bit(0)
    w.bit(1)
    w.bits(y0.toLong, 8); w.bits(y1.toLong, 8)
    w.code(0, 3) // master cval = 0 (both subclass slots are book 3)
    postVals.foreach(v => w.code(v, 6))
    var part = 0
    while (part < 8) {
      val active = (0 until 16).exists(i => levels(part * 16 + i) != 0)
      w.code(if (active) 1 else 0, 1)
      if (active) {
        var i = 0
        while (i < 16) { w.code(levels(part * 16 + i) + 8, 4); i += 1 }
      }
      part += 1
    }
    w.out
  }

  /** Mono short-block fixture with the book-coded, NON-FLAT floor:
    * posts at x = 0,128 (raw) and 32,64,96 (book 3 via master book
    * 2) exercise neighbor search, render_point prediction, the
    * odd/even value offsets and room clamping, and real render_line
    * slopes. */
  def encodeFixtureFloorBooks(rate: Int, y0: Int, y1: Int, postVals: Array[Int],
      levels: Array[Int], blocks: Int, granule: Long): Array[Byte] = {
    val serial = 0x67726166L
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(oggPage(serial, 0, 0L, 0x02, Seq(idPacket(rate))))
    bos.write(oggPage(serial, 1, 0L, 0,
      Seq(commentPacket(), setupPacket(floorBooks = true))))
    var i = 0
    while (i < blocks) {
      val last = i == blocks - 1
      val gran = if (last) granule else math.max(0L, i.toLong * 128)
      bos.write(oggPage(serial, 2 + i, gran, if (last) 0x04 else 0,
        Seq(audioPacketFloorBooks(y0, y1, postVals, levels))))
      i += 1
    }
    bos.toByteArray
  }

  /** Mono short-block fixture through residue format 0 or 1 with the
    * 2-dimensional value book — the multi-dimension shapes real
    * libvorbis streams use, where the two formats genuinely differ
    * (interleaved stride vs sequential run). */
  def encodeFixtureResidue01(rType: Int, rate: Int, floorAmp: Int,
      vals: Array[Array[Float]], granule: Long): Array[Byte] = {
    val serial = 0x67726166L
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(oggPage(serial, 0, 0L, 0x02, Seq(idPacket(rate))))
    bos.write(oggPage(serial, 1, 0L, 0,
      Seq(commentPacket(), setupPacket(residueType = rType, dims2 = true))))
    var i = 0
    while (i < vals.length) {
      val last = i == vals.length - 1
      val gran = if (last) granule else math.max(0L, i.toLong * 128)
      bos.write(oggPage(serial, 2 + i, gran, if (last) 0x04 else 0,
        Seq(audioPacketDims2(floorAmp, vals(i), rType))))
      i += 1
    }
    bos.toByteArray
  }

  /** Write one Ogg page. */
  private def oggPage(serial: Long, seq: Int, granule: Long, flags: Int,
      packets: Seq[Array[Byte]]): Array[Byte] = {
    val lacing = packets.flatMap { p =>
      val full = Array.fill(p.length / 255)(255)
      full :+ (p.length % 255)
    }
    require(lacing.length <= 255)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("OggS".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bos.write(0) // version
    bos.write(flags)
    var i = 0
    while (i < 8) { bos.write(((granule >> (8 * i)) & 0xFF).toInt); i += 1 }
    i = 0
    while (i < 4) { bos.write(((serial >> (8 * i)) & 0xFF).toInt); i += 1 }
    i = 0
    while (i < 4) { bos.write(((seq >> (8 * i)) & 0xFF).toInt); i += 1 }
    bos.write(Array[Byte](0, 0, 0, 0)) // CRC placeholder
    bos.write(lacing.length)
    lacing.foreach(bos.write)
    packets.foreach(p => bos.write(p, 0, p.length))
    val page = bos.toByteArray
    val crc = Ogg.pageCrc(page, 0, page.length, 22)
    i = 0
    while (i < 4) { page(22 + i) = ((crc >> (8 * i)) & 0xFF).toByte; i += 1 }
    page
  }

  /** Fixture stream: mono at `rate`, one 256-block per levels row,
    * final granule `granule` (≤ the (rows−1)·128 samples the lapping
    * emits — the decoder truncates to it). */
  def encodeFixture(rate: Int, floorAmp: Int, levels: Array[Array[Int]],
      granule: Long): Array[Byte] = {
    val serial = 0x67726166L // 'graf'
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(oggPage(serial, 0, 0L, 0x02, Seq(idPacket(rate))))
    bos.write(oggPage(serial, 1, 0L, 0, Seq(commentPacket(), setupPacket())))
    var i = 0
    while (i < levels.length) {
      val last = i == levels.length - 1
      val gran = if (last) granule else math.max(0L, i.toLong * 128)
      bos.write(oggPage(serial, 2 + i, gran,
        if (last) 0x04 else 0, Seq(audioPacket(floorAmp, Array(levels(i)), 128))))
      i += 1
    }
    bos.toByteArray
  }

  /** Mixed-blocksize mono fixture: two modes (256 / 2048), plan
    * entries (isLong, 128 levels over the first 128 spectral bins);
    * window flags follow the real neighbors, so the hybrid long-block
    * slopes and the center-aligned lapping across UNEQUAL sizes both
    * run. */
  def encodeFixtureMixed(rate: Int, floorAmp: Int,
      plan: Seq[(Boolean, Array[Int])], granule: Long): Array[Byte] = {
    val serial = 0x67726166L
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(oggPage(serial, 0, 0L, 0x02, Seq(idPacket(rate, 1, 8, 11))))
    bos.write(oggPage(serial, 1, 0L, 0,
      Seq(commentPacket(), setupPacket(twoModes = true))))
    def nOf(long: Boolean) = if (long) 2048 else 256
    var cum = 0L
    var i = 0
    while (i < plan.length) {
      val (long, levels) = plan(i)
      if (i > 0) cum += (nOf(plan(i - 1)._1) + nOf(long)) / 4
      val prevFlag = i > 0 && plan(i - 1)._1
      val nextFlag = i < plan.length - 1 && plan(i + 1)._1
      val last = i == plan.length - 1
      bos.write(oggPage(serial, 2 + i, if (last) granule else cum,
        if (last) 0x04 else 0,
        Seq(audioPacket(floorAmp, Array(levels), 128, long, prevFlag, nextFlag,
          twoModes = true))))
      i += 1
    }
    bos.toByteArray
  }

  /** Coupled-stereo fixture (short blocks): per-block MAGNITUDE and
    * ANGLE residue levels (null angle rows = an unused angle floor —
    * the coupling rule still forces the pair's residue decode). */
  def encodeFixtureStereo(rate: Int, floorAmp: Int,
      magLevels: Array[Array[Int]], angLevels: Array[Array[Int]],
      granule: Long): Array[Byte] = {
    val serial = 0x67726166L
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(oggPage(serial, 0, 0L, 0x02, Seq(idPacket(rate, channels = 2))))
    bos.write(oggPage(serial, 1, 0L, 0,
      Seq(commentPacket(), setupPacket(channels = 2, coupled = true, end = 256))))
    var i = 0
    while (i < magLevels.length) {
      val last = i == magLevels.length - 1
      val gran = if (last) granule else math.max(0L, i.toLong * 128)
      bos.write(oggPage(serial, 2 + i, gran, if (last) 0x04 else 0,
        Seq(audioPacket(floorAmp, Array(magLevels(i), angLevels(i)), 256))))
      i += 1
    }
    bos.toByteArray
  }

  /** Gate packer: one stream per document — rate 8000/12000/16000 by
    * id%3, 4 + id%3 blocks, a single planted bin k = (id%13)·8+3 at
    * level 1 + id%3, flat floor at dB index 200 + id%30, granule
    * truncating the tail by id%5 samples. */
  def packTonesOgg(df: org.apache.spark.sql.DataFrame, idCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    df.where(col(idCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)))
      .as[Long]
      .map { id =>
        val blocks = 4 + (id % 3).toInt
        val k = (id % 13).toInt * 8 + 3
        val level = 1 + (id % 3).toInt
        val levels = Array.fill(blocks) {
          val row = new Array[Int](128)
          row(k) = level
          row
        }
        val granule = (blocks - 1).toLong * 128 - (id % 5)
        (id, encodeFixture(8000 + (id % 3).toInt * 4000, 200 + (id % 30).toInt,
          levels, granule))
      }
      .toDF("id", "payload")
  }

  /** Adapter to the audio ladder's [[AudioPcm.Clip]]: interleaved
    * 16-bit samples. */
  def decodeClip(p: Array[Byte]): Option[AudioPcm.Clip] =
    decode(p).map { pcm =>
      val n = pcm.samples(0).length
      val out = new Array[Int](n * pcm.channels)
      var i = 0
      while (i < n) {
        var c = 0
        while (c < pcm.channels) {
          val v = math.max(-1.0f, math.min(1.0f, pcm.samples(c)(i)))
          out(i * pcm.channels + c) = math.round(v * 32767f)
          c += 1
        }
        i += 1
      }
      AudioPcm.Clip(pcm.channels, pcm.sampleRate, 16, out)
    }
}
