package graft.ops

/** Real GIF decoder, written against the public GIF89a specification:
  * logical screen descriptor, global/local color tables, extension
  * blocks (skipped via their sub-block chains), image descriptor,
  * variable-width LZW decompression (clear/EOI codes, dictionary to
  * 4096 entries), Adam-less 4-pass deinterlace, palette expansion to
  * RGB. First image frame only — the curation-pipeline contract
  * (animated GIFs decode their poster frame).
  *
  * Same garbage-safety contract as [[PngCodec]]: truncated, corrupt,
  * or hostile bytes return None, never throw; decoded size is capped
  * before allocation ([[PngCodec.MaxPixelBytes]] shared). And the same
  * scale shape: a pure function run inside `mapPartitions`.
  *
  * Unlike PNG there is no in-repo encoder, which makes the gate
  * STRONGER, not weaker: fixtures are written by the JDK's ImageIO GIF
  * writer — a fully independent implementation — so decode correctness
  * is checked against bytes this codebase never produced.
  */
object GifCodec {

  def decode(p: Array[Byte]): Option[PngCodec.Image] = {
    def u8(i: Int): Int = p(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (p.length < 13) return None
    if (!(p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8' &&
        (p(4) == '7' || p(4) == '9') && p(5) == 'a')) return None
    val flags = u8(10)
    val hasGct = (flags & 0x80) != 0
    val gctSize = 2 << (flags & 7)
    var pos = 13
    val gct: Array[Byte] =
      if (hasGct) {
        if (pos + 3 * gctSize > p.length) return None
        val t = java.util.Arrays.copyOfRange(p, pos, pos + 3 * gctSize)
        pos += 3 * gctSize
        t
      } else null

    // walk blocks to the first image descriptor
    while (pos < p.length) {
      u8(pos) match {
        case 0x3B => return None // trailer before any image
        case 0x21 => // extension: label + sub-block chain
          pos += 2
          var done = false
          while (!done) {
            if (pos >= p.length) return None
            val n = u8(pos); pos += 1 + n
            done = n == 0
          }
        case 0x2C =>
          // image descriptor
          if (pos + 10 > p.length) return None
          val w = le16(pos + 5); val h = le16(pos + 7)
          val iflags = u8(pos + 9)
          pos += 10
          val interlaced = (iflags & 0x40) != 0
          val lct: Array[Byte] =
            if ((iflags & 0x80) != 0) {
              val n = 2 << (iflags & 7)
              if (pos + 3 * n > p.length) return None
              val t = java.util.Arrays.copyOfRange(p, pos, pos + 3 * n)
              pos += 3 * n
              t
            } else gct
          if (lct == null || w <= 0 || h <= 0) return None
          if (w.toLong * h * 3 > PngCodec.MaxPixelBytes) return None
          if (pos >= p.length) return None
          val minCodeSize = u8(pos); pos += 1
          if (minCodeSize < 2 || minCodeSize > 11) return None
          // concatenate the sub-block chained LZW stream
          val data = new java.io.ByteArrayOutputStream()
          var done = false
          while (!done) {
            if (pos >= p.length) return None
            val n = u8(pos); pos += 1
            if (n == 0) done = true
            else {
              if (pos + n > p.length) return None
              data.write(p, pos, n); pos += n
            }
          }
          val indices = lzwDecode(data.toByteArray, minCodeSize, w * h).getOrElse(return None)
          val nColors = lct.length / 3
          val deinter = if (interlaced) deinterlace(indices, w, h) else indices
          val rgb = new Array[Byte](w * h * 3)
          var k = 0
          while (k < w * h) {
            val ix = deinter(k) & 0xFF
            if (ix >= nColors) return None
            rgb(3 * k) = lct(3 * ix); rgb(3 * k + 1) = lct(3 * ix + 1)
            rgb(3 * k + 2) = lct(3 * ix + 2)
            k += 1
          }
          return Some(PngCodec.Image(w, h, 3, rgb))
        case _ => return None // desynced block stream
      }
    }
    None
  }

  // ------------------------------------------------------------ animation

  /** One animation frame: placement + timing + disposal from the
    * graphic control extension, the raw palette indices, and the
    * frame's own palette (local or inherited global). */
  final case class GifFrame(x: Int, y: Int, width: Int, height: Int,
      delayCs: Int, disposal: Int, transparent: Option[Int],
      indices: Array[Byte], palette: Array[Byte])

  /** A decoded animation: canvas geometry, NETSCAPE loop count (0 =
    * forever, -1 = no loop extension), frame metadata, and the
    * COMPOSED canvas (RGBA, canvas-sized) after each frame. */
  final case class GifAnim(width: Int, height: Int, loopCount: Int,
      frames: Vector[GifFrame], canvases: Vector[Array[Byte]])

  /** Animated GIF (GIF89a): every image block with its preceding
    * graphic control extension, the NETSCAPE2.0 loop count, and
    * canvas composition with the renderer-consensus semantics (what
    * browsers and the JDK reader's metadata model agree on): the
    * canvas starts TRANSPARENT; a frame's non-transparent indices
    * overwrite its rectangle (clamped to the canvas); disposal 0/1
    * leave the canvas, disposal 2 "restore to background" clears the
    * frame rectangle to transparent (the universal renderer behavior
    * — no modern renderer paints the background color), disposal 3
    * restores the canvas as it was before the frame rendered.
    * Per-frame RAW pixels are cross-checked against the JDK ImageIO
    * GIF reader in GifAnimSpec (fixtures written by ImageIO's own
    * sequence writer); composition is pinned by hand-computed
    * canvases. Refusals: over `maxFrames`, canvas over the pixel
    * cap, any undecodable frame. */
  def decodeAnim(p: Array[Byte], maxFrames: Int = 1024): Option[GifAnim] = {
    def u8(i: Int): Int = p(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (p.length < 13) return None
    if (!(p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8' &&
        (p(4) == '7' || p(4) == '9') && p(5) == 'a')) return None
    val cw = le16(6); val ch = le16(8)
    if (cw <= 0 || ch <= 0 || cw.toLong * ch * 4 > PngCodec.MaxPixelBytes) return None
    val flags = u8(10)
    var pos = 13
    val gct: Array[Byte] =
      if ((flags & 0x80) != 0) {
        val n = 2 << (flags & 7)
        if (pos + 3 * n > p.length) return None
        val t = java.util.Arrays.copyOfRange(p, pos, pos + 3 * n)
        pos += 3 * n
        t
      } else null

    var loop = -1
    var delayCs = 0; var disposal = 0; var transparent: Option[Int] = None
    var frames = Vector.empty[GifFrame]

    def skipSubBlocks(): Boolean = {
      var done = false
      while (!done) {
        if (pos >= p.length) return false
        val n = u8(pos); pos += 1
        if (n == 0) done = true
        else { if (pos + n > p.length) return false; pos += n }
      }
      true
    }

    while (pos < p.length) {
      u8(pos) match {
        case 0x3B => // trailer
          if (frames.isEmpty) return None
          return Some(compose(cw, ch, loop, frames))
        case 0x21 =>
          if (pos + 2 > p.length) return None
          val label = u8(pos + 1)
          pos += 2
          if (label == 0xF9) { // graphic control extension
            if (pos + 6 > p.length) return None
            val n = u8(pos)
            if (n != 4) return None
            val gf = u8(pos + 1)
            disposal = (gf >> 2) & 7
            delayCs = le16(pos + 2)
            transparent = if ((gf & 1) == 1) Some(u8(pos + 4)) else None
            pos += 5 // size + 4 data bytes; the terminator follows
            if (pos >= p.length || u8(pos) != 0) return None
            pos += 1
          } else if (label == 0xFF) { // application extension
            if (pos >= p.length) return None
            val n = u8(pos)
            if (n == 11 && pos + 12 <= p.length &&
              new String(p, pos + 1, 11, "US-ASCII") == "NETSCAPE2.0") {
              pos += 12
              // sub-blocks: 3-byte (1, loop_lo, loop_hi)
              var done = false
              while (!done) {
                if (pos >= p.length) return None
                val m = u8(pos); pos += 1
                if (m == 0) done = true
                else {
                  if (pos + m > p.length) return None
                  if (m == 3 && u8(pos) == 1) loop = le16(pos + 1)
                  pos += m
                }
              }
            } else if (!skipSubBlocks()) return None
          } else if (!skipSubBlocks()) return None
        case 0x2C =>
          if (frames.length >= maxFrames) return None
          if (pos + 10 > p.length) return None
          val fx = le16(pos + 1); val fy = le16(pos + 3)
          val w = le16(pos + 5); val h = le16(pos + 7)
          val iflags = u8(pos + 9)
          pos += 10
          val interlaced = (iflags & 0x40) != 0
          val lct: Array[Byte] =
            if ((iflags & 0x80) != 0) {
              val n = 2 << (iflags & 7)
              if (pos + 3 * n > p.length) return None
              val t = java.util.Arrays.copyOfRange(p, pos, pos + 3 * n)
              pos += 3 * n
              t
            } else gct
          if (lct == null || w <= 0 || h <= 0) return None
          if (w.toLong * h > PngCodec.MaxPixelBytes / 4) return None
          if (pos >= p.length) return None
          val minCodeSize = u8(pos); pos += 1
          if (minCodeSize < 2 || minCodeSize > 11) return None
          val data = new java.io.ByteArrayOutputStream()
          var done = false
          while (!done) {
            if (pos >= p.length) return None
            val n = u8(pos); pos += 1
            if (n == 0) done = true
            else {
              if (pos + n > p.length) return None
              data.write(p, pos, n); pos += n
            }
          }
          val indices = lzwDecode(data.toByteArray, minCodeSize, w * h).getOrElse(return None)
          val nColors = lct.length / 3
          var k = 0
          while (k < indices.length) {
            if ((indices(k) & 0xFF) >= nColors) return None
            k += 1
          }
          val deinter = if (interlaced) deinterlace(indices, w, h) else indices
          frames :+= GifFrame(fx, fy, w, h, delayCs, disposal, transparent, deinter, lct)
          // GCE scope is exactly one image block
          delayCs = 0; disposal = 0; transparent = None
        case _ => return None
      }
    }
    None // ran off the end without a trailer
  }

  private def compose(cw: Int, ch: Int, loop: Int,
      frames: Vector[GifFrame]): GifAnim = {
    val canvas = new Array[Byte](cw * ch * 4)
    val canvases = frames.map { f =>
      val saved = if (f.disposal == 3) canvas.clone() else null
      var yy = 0
      while (yy < f.height) {
        val cy = f.y + yy
        if (cy >= 0 && cy < ch) {
          var xx = 0
          while (xx < f.width) {
            val cx = f.x + xx
            if (cx >= 0 && cx < cw) {
              val ix = f.indices(yy * f.width + xx) & 0xFF
              if (!f.transparent.contains(ix)) {
                val ci = (cy * cw + cx) * 4
                canvas(ci) = f.palette(3 * ix)
                canvas(ci + 1) = f.palette(3 * ix + 1)
                canvas(ci + 2) = f.palette(3 * ix + 2)
                canvas(ci + 3) = -1
              }
            }
            xx += 1
          }
        }
        yy += 1
      }
      val snapshot = canvas.clone()
      f.disposal match {
        case 2 => // restore to background = clear rect to transparent
          var y2 = math.max(0, f.y)
          val yEnd = math.min(ch, f.y + f.height)
          while (y2 < yEnd) {
            val from = (y2 * cw + math.max(0, f.x)) * 4
            val until = (y2 * cw + math.min(cw, f.x + f.width)) * 4
            if (until > from) java.util.Arrays.fill(canvas, from, until, 0.toByte)
            y2 += 1
          }
        case 3 =>
          System.arraycopy(saved, 0, canvas, 0, canvas.length)
        case _ => ()
      }
      snapshot
    }
    GifAnim(cw, ch, loop, frames, canvases)
  }

  /** GIF-variant LZW: codes start at minCodeSize+1 bits, LSB-first bit
    * packing; CLEAR resets the table, EOI ends; width grows after the
    * table reaches 2^width (capped at 12 bits). Returns exactly
    * `expected` indices or None.
    */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int, expected: Int): Option[Array[Byte]] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new Array[Byte](expected)
    var outLen = 0
    // dictionary as prefix links: prefix(c) = previous code, tail(c) = appended byte
    val maxDict = 4096
    val prefix = new Array[Int](maxDict)
    val tail = new Array[Byte](maxDict)
    var dictSize = eoi + 1
    var codeWidth = minCodeSize + 1
    var prev = -1
    var acc = 0L; var accBits = 0; var bytePos = 0
    val stack = new Array[Byte](maxDict)

    def emitCode(c: Int): Boolean = {
      // walk the prefix chain (stack-reversed), bounded by dict size
      var sp = 0
      var cur = c
      while (cur >= clear) {
        if (sp >= maxDict) return false // corrupt cycle
        stack(sp) = tail(cur); sp += 1
        cur = prefix(cur)
      }
      if (cur >= clear) return false
      stack(sp) = cur.toByte; sp += 1
      if (outLen + sp > expected) return false
      while (sp > 0) { sp -= 1; out(outLen) = stack(sp); outLen += 1 }
      true
    }
    def firstByte(c: Int): Byte = {
      var cur = c
      var guard = 0
      while (cur >= clear && guard < maxDict) { cur = prefix(cur); guard += 1 }
      cur.toByte
    }

    while (outLen < expected) {
      // pull next code (LSB-first)
      while (accBits < codeWidth) {
        if (bytePos >= data.length) return None // truncated stream
        acc |= (data(bytePos) & 0xFFL) << accBits
        accBits += 8; bytePos += 1
      }
      val code = (acc & ((1L << codeWidth) - 1)).toInt
      acc >>>= codeWidth; accBits -= codeWidth

      if (code == clear) {
        dictSize = eoi + 1; codeWidth = minCodeSize + 1; prev = -1
      } else if (code == eoi) {
        return if (outLen == expected) Some(out) else None
      } else if (prev < 0) {
        if (code >= clear) return None // first code must be a literal
        if (!emitCode(code)) return None
        prev = code
      } else {
        val valid = code < dictSize
        if (!valid && code != dictSize) return None // kwkwk case only
        // add prev + firstByte(valid ? code : prev) to the dictionary
        if (dictSize < maxDict) {
          prefix(dictSize) = prev
          tail(dictSize) = firstByte(if (valid) code else prev)
          dictSize += 1
          if (dictSize == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        }
        if (!emitCode(code)) return None
        prev = code
      }
    }
    Some(out)
  }

  // ------------------------------------------------------------ fixture writer

  /** Spec-legal LZW stream of pure LITERAL codes: a CLEAR before the
    * decoder's dictionary would force a code-width change keeps every
    * code at minCodeSize+1 bits — the classic "uncompressed GIF"
    * technique, exercising the decoder's clear/reset path heavily. */
  private def lzwLiterals(indices: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val width = minCodeSize + 1
    val bos = new java.io.ByteArrayOutputStream()
    var acc = 0L; var accBits = 0
    def put(code: Int): Unit = {
      acc |= code.toLong << accBits; accBits += width
      while (accBits >= 8) { bos.write((acc & 0xFF).toInt); acc >>>= 8; accBits -= 8 }
    }
    put(clear)
    var sinceClear = 0
    for (ix <- indices) {
      // the decoder's dictionary reaches 2^(width) after 2^m-1
      // literals and would widen the NEXT code — clear one early
      if (sinceClear == (1 << minCodeSize) - 2) { put(clear); sinceClear = 0 }
      put(ix & 0xFF)
      sinceClear += 1
    }
    put(eoi)
    if (accBits > 0) bos.write((acc & 0xFF).toInt)
    bos.toByteArray
  }

  /** Fixture/gate frame description for [[encodeAnim]]. */
  private[graft] final case class GifFrameSpec(x: Int, y: Int, w: Int, h: Int,
      delayCs: Int, disposal: Int, transparent: Option[Int],
      indices: Array[Byte], localPalette: Option[Array[Byte]] = None)

  /** Fixture/gate animated-GIF writer: GIF89a header + global color
    * table, optional NETSCAPE2.0 loop block, and per frame a graphic
    * control extension + image descriptor (+ optional local color
    * table) + literal-coded LZW data. */
  private[graft] def encodeAnim(cw: Int, ch: Int, loop: Option[Int],
      gct: Array[Byte], frames: Seq[GifFrameSpec]): Array[Byte] = {
    require(frames.nonEmpty && gct.length % 3 == 0)
    val nGct = gct.length / 3
    require(nGct >= 2 && (nGct & (nGct - 1)) == 0 && nGct <= 256, s"gct size $nGct")
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
    bos.write("GIF89a".getBytes("US-ASCII"))
    le16(cw); le16(ch)
    val gctBits = 31 - Integer.numberOfLeadingZeros(nGct)
    bos.write(0x80 | (gctBits - 1)) // gct present, size bits
    bos.write(0) // background color index
    bos.write(0) // aspect
    bos.write(gct)
    loop.foreach { n =>
      bos.write(0x21); bos.write(0xFF); bos.write(11)
      bos.write("NETSCAPE2.0".getBytes("US-ASCII"))
      bos.write(3); bos.write(1); le16(n); bos.write(0)
    }
    for (f <- frames) {
      require(f.indices.length == f.w * f.h)
      bos.write(0x21); bos.write(0xF9); bos.write(4)
      bos.write(((f.disposal & 7) << 2) | (if (f.transparent.isDefined) 1 else 0))
      le16(f.delayCs)
      bos.write(f.transparent.getOrElse(0))
      bos.write(0)
      bos.write(0x2C)
      le16(f.x); le16(f.y); le16(f.w); le16(f.h)
      f.localPalette match {
        case Some(lp) =>
          val n = lp.length / 3
          require(n >= 2 && (n & (n - 1)) == 0 && n <= 256)
          bos.write(0x80 | (31 - Integer.numberOfLeadingZeros(n) - 1))
          bos.write(lp)
        case None => bos.write(0)
      }
      val mcs = math.max(2, if (f.localPalette.isDefined)
        31 - Integer.numberOfLeadingZeros(f.localPalette.get.length / 3) else gctBits)
      bos.write(mcs)
      val lzw = lzwLiterals(f.indices, mcs)
      var at = 0
      while (at < lzw.length) {
        val n = math.min(255, lzw.length - at)
        bos.write(n); bos.write(lzw, at, n)
        at += n
      }
      bos.write(0)
    }
    bos.write(0x3B)
    bos.toByteArray
  }

  /** GIF 4-pass interlace: rows 0,8,16… then 4,12… then 2,6,10… then
    * odd rows. Input rows arrive in pass order; output is scan order. */
  private def deinterlace(src: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](src.length)
    val passes = Array((0, 8), (4, 8), (2, 4), (1, 2))
    var srcRow = 0
    passes.foreach { case (start, step) =>
      var y = start
      while (y < h) {
        System.arraycopy(src, srcRow * w, out, y * w, w)
        srcRow += 1
        y += step
      }
    }
    out
  }
}
