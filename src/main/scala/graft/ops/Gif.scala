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
