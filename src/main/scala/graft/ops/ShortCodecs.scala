package graft.ops

/** From-spec Snappy and LZ4 BLOCK decoders — the two short-window
  * LZ77 formats the columnar world actually runs on (Snappy is
  * parquet's default codec; LZ4 is Spark's shuffle/TorrentBroadcast
  * codec and a common shard wrapper). Written from the published
  * format descriptions (google/snappy `format_description.txt`;
  * lz4 `lz4_Block_format.md`) and pinned in ShortCodecsSpec against
  * the INDEPENDENT reference implementations on the Spark classpath
  * (snappy-java, lz4-java) over the same fixture family as the
  * gzip/zstd rungs.
  *
  * The BLOCK forms are raw (no framing/checksum layer): the caller
  * supplies trust boundaries; here that is the decoded-size cap plus
  * exact-consumption checks. Round 14 adds both formats' STREAM
  * layers — the snappy FRAMING format and the LZ4 FRAME format (with
  * a from-spec xxHash32) — each verifying every checksum the layer
  * defines; those are what .sz/.lz4 FILES in the wild actually are.
  * Hostile-bytes contract as the rest of the ladder: never throws,
  * bounds-checked, None on any malformed construct. Encoders are the
  * spec-legal literal-only forms (one big literal run) plus framed
  * writers exercising every chunk type, enough to WRITE streams any
  * decoder accepts — the reference libraries supply the
  * hostile-grade compressed fixtures, exactly the ZstdCodec division
  * of labor.
  */
object ShortCodecs {

  private object Refuse extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def refuse(): Nothing = throw Refuse

  val MaxOutput: Int = 1 << 28

  // ------------------------------------------------------------------
  // Snappy raw block (format_description.txt)
  // ------------------------------------------------------------------

  /** Decode a raw snappy block: uvarint decoded length, then
    * literal/copy tags until exact end. */
  def unsnappy(p: Array[Byte]): Option[Array[Byte]] =
    try {
      var pos = 0
      def u8(): Int = { if (pos >= p.length) refuse(); val v = p(pos) & 0xFF; pos += 1; v }
      // uvarint decoded length
      var declared = 0L
      var shift = 0
      var more = true
      while (more) {
        if (shift > 35) refuse()
        val b = u8()
        declared |= (b & 0x7FL) << shift
        shift += 7
        more = (b & 0x80) != 0
      }
      if (declared > MaxOutput) refuse()
      val out = new Array[Byte](declared.toInt)
      var o = 0
      while (pos < p.length) {
        val tag = u8()
        (tag & 3) match {
          case 0 => // literal
            var len = (tag >>> 2) + 1
            if (len > 60) {
              val extra = len - 60 // 1-4 length bytes
              var v = 0L
              var i = 0
              while (i < extra) { v |= u8().toLong << (8 * i); i += 1 }
              len = (v + 1).toInt
              if (len <= 0) refuse()
            }
            if (pos + len > p.length || o + len > out.length) refuse()
            System.arraycopy(p, pos, out, o, len)
            pos += len; o += len
          case c => // copy
            val (len, offset) = c match {
              case 1 => (((tag >>> 2) & 7) + 4, ((tag >>> 5) << 8) | u8())
              case 2 => ((tag >>> 2) + 1, u8() | (u8() << 8))
              case _ => ((tag >>> 2) + 1, u8() | (u8() << 8) | (u8() << 16) | (u8() << 24))
            }
            if (offset <= 0 || offset > o || o + len > out.length) refuse()
            var i = 0
            while (i < len) { out(o) = out(o - offset); o += 1; i += 1 } // overlap-safe
        }
      }
      if (o != out.length) refuse()
      Some(out)
    } catch { case Refuse => None }

  /** Spec-legal literal-only snappy block. */
  def snappyLiteral(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(data.length + 8)
    var v = data.length
    while ((v & ~0x7F) != 0) { bos.write((v & 0x7F) | 0x80); v >>>= 7 }
    bos.write(v)
    var i = 0
    while (i < data.length) {
      val n = math.min(data.length - i, 65536)
      // length 61: 2 extra bytes (n-1 LE)
      bos.write((61 << 2)); bos.write((n - 1) & 0xFF); bos.write(((n - 1) >> 8) & 0xFF)
      bos.write(data, i, n)
      i += n
    }
    if (data.length == 0) () // just the 0 uvarint
    bos.toByteArray
  }

  // ------------------------------------------------------------------
  // Snappy FRAMING format (framing_format.txt, round 14) — the
  // checksummed stream layer hadoop-land wraps blocks in. Chunks:
  // 1-byte type + 3-byte LE length; 0x00 compressed / 0x01
  // uncompressed (each led by the masked CRC-32C of the UNCOMPRESSED
  // data — the same rotate-15-plus-constant mask as TFRecord),
  // 0x80–0xFE skippable (0xFE is padding), 0x02–0x7F unskippable
  // reserved → refuse, 0xFF the stream identifier (must re-match).
  // Uncompressed chunk data is capped at 65536 bytes by the spec.
  // ------------------------------------------------------------------

  private val FrameMagic = Array[Byte](0xFF.toByte, 6, 0, 0, 's', 'N', 'a', 'P', 'p', 'Y')

  /** Does the payload open with the framing stream identifier? */
  def isSnappyFramed(p: Array[Byte]): Boolean =
    p != null && p.length >= 10 && (0 until 10).forall(i => p(i) == FrameMagic(i))

  private def u32le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  /** Decode a framed snappy stream: every data chunk's masked
    * CRC-32C verified before its bytes join the output. */
  def unsnappyFramed(p: Array[Byte]): Option[Array[Byte]] =
    try {
      if (!isSnappyFramed(p)) refuse()
      val out = new java.io.ByteArrayOutputStream()
      var pos = 10
      while (pos < p.length) {
        if (pos + 4 > p.length) refuse()
        val t = p(pos) & 0xFF
        val len = (p(pos + 1) & 0xFF) | ((p(pos + 2) & 0xFF) << 8) | ((p(pos + 3) & 0xFF) << 16)
        pos += 4
        if (pos + len > p.length) refuse()
        t match {
          case 0x00 =>
            if (len < 4) refuse()
            val data = unsnappy(java.util.Arrays.copyOfRange(p, pos + 4, pos + len))
              .getOrElse(refuse())
            if (data.length > 65536) refuse()
            if (TfRecord.maskedCrc(data) != u32le(p, pos)) refuse()
            if (out.size().toLong + data.length > MaxOutput) refuse()
            out.write(data)
          case 0x01 =>
            if (len < 4 || len - 4 > 65536) refuse()
            if (TfRecord.maskedCrc(p, pos + 4, len - 4) != u32le(p, pos)) refuse()
            if (out.size().toLong + len - 4 > MaxOutput) refuse()
            out.write(p, pos + 4, len - 4)
          case 0xFF =>
            if (len != 6) refuse()
            var i = 0
            while (i < 6) { if (p(pos + i) != FrameMagic(4 + i)) refuse(); i += 1 }
          case x if x >= 0x80 => () // skippable, incl. 0xFE padding
          case _ => refuse() // 0x02–0x7F unskippable reserved
        }
        pos += len
      }
      Some(out.toByteArray)
    } catch { case Refuse => None }

  /** Framed writer for fixtures: chunks alternate UNCOMPRESSED and
    * COMPRESSED (literal-only blocks), with a padding chunk between —
    * every chunk type the decoder must walk. */
  def snappyFramed(data: Array[Byte], chunkSize: Int = 16384): Array[Byte] = {
    require(chunkSize >= 1 && chunkSize <= 65536)
    val bos = new java.io.ByteArrayOutputStream(data.length + 64)
    bos.write(FrameMagic, 0, 10)
    var i = 0
    var k = 0
    def w32(v: Int): Unit = { var j = 0; while (j < 4) { bos.write((v >> (8 * j)) & 0xFF); j += 1 } }
    while (i < data.length || (i == 0 && data.length == 0)) {
      val n = math.min(chunkSize, data.length - i)
      val crc = TfRecord.maskedCrc(data, i, n)
      if (k % 2 == 0) {
        bos.write(0x01); val l = n + 4
        bos.write(l & 0xFF); bos.write((l >> 8) & 0xFF); bos.write((l >> 16) & 0xFF)
        w32(crc); bos.write(data, i, n)
      } else {
        val block = snappyLiteral(java.util.Arrays.copyOfRange(data, i, i + n))
        bos.write(0x00); val l = block.length + 4
        bos.write(l & 0xFF); bos.write((l >> 8) & 0xFF); bos.write((l >> 16) & 0xFF)
        w32(crc); bos.write(block, 0, block.length)
      }
      if (k == 0) { bos.write(0xFE); bos.write(2); bos.write(0); bos.write(0); bos.write(0); bos.write(0) }
      i += n
      k += 1
      if (data.length == 0) i = 1 // emitted the one empty chunk
    }
    bos.toByteArray
  }

  // ------------------------------------------------------------------
  // LZ4 raw block (lz4_Block_format.md)
  // ------------------------------------------------------------------

  /** Decode a raw LZ4 block into exactly `declaredLen` bytes (LZ4
    * blocks do not carry their decoded size — the container does). */
  def unlz4(p: Array[Byte], declaredLen: Int): Option[Array[Byte]] =
    try {
      if (declaredLen < 0 || declaredLen > MaxOutput) refuse()
      val out = new Array[Byte](declaredLen)
      var pos = 0
      var o = 0
      def u8(): Int = { if (pos >= p.length) refuse(); val v = p(pos) & 0xFF; pos += 1; v }
      var done = false
      while (!done) {
        if (declaredLen == 0 && p.length == 0) { done = true }
        else {
          val token = u8()
          var litLen = token >>> 4
          if (litLen == 15) {
            var b = 255
            while (b == 255) { b = u8(); litLen += b }
          }
          if (pos + litLen > p.length || o + litLen > out.length) refuse()
          System.arraycopy(p, pos, out, o, litLen)
          pos += litLen; o += litLen
          if (pos == p.length) {
            // last sequence: literals only, no match
            done = true
          } else {
            val offset = u8() | (u8() << 8)
            var matchLen = (token & 0x0F) + 4
            if ((token & 0x0F) == 15) {
              var b = 255
              while (b == 255) { b = u8(); matchLen += b }
            }
            if (offset <= 0 || offset > o || o + matchLen > out.length) refuse()
            var i = 0
            while (i < matchLen) { out(o) = out(o - offset); o += 1; i += 1 }
          }
        }
      }
      if (o != declaredLen) refuse()
      Some(out)
    } catch { case Refuse => None }

  // ------------------------------------------------------------------
  // LZ4 FRAME format (lz4_Frame_format.md, round 14) — the .lz4 FILE
  // layer: magic 0x184D2204, an xxHash32-checked frame descriptor
  // (version 01, block-independence/checksum flags, optional content
  // size + checksum, dict-ID refused — no external dictionaries
  // here), 4-byte-LE-sized blocks (high bit = stored uncompressed)
  // up to the descriptor's max, an EndMark, and optional content
  // checksum. Blocks decode into ONE rolling buffer so
  // block-DEPENDENT frames (matches reaching into earlier blocks)
  // work, skippable frames (0x184D2A5x) skip, frames concatenate,
  // and the legacy 0x184C2102 frame refuses (declared).
  // ------------------------------------------------------------------

  /** xxHash32 (the published algorithm; LZ4 framing's checksum). */
  def xxh32(p: Array[Byte], off: Int, len: Int, seed: Int): Int = {
    val P1 = 0x9E3779B1; val P2 = 0x85EBCA77; val P3 = 0xC2B2AE3D
    val P4 = 0x27D4EB2F; val P5 = 0x165667B1
    def lane(i: Int): Int =
      (p(i) & 0xFF) | ((p(i + 1) & 0xFF) << 8) | ((p(i + 2) & 0xFF) << 16) | ((p(i + 3) & 0xFF) << 24)
    var i = off
    val end = off + len
    var h =
      if (len >= 16) {
        var a1 = seed + P1 + P2; var a2 = seed + P2; var a3 = seed; var a4 = seed - P1
        while (i + 16 <= end) {
          a1 = Integer.rotateLeft(a1 + lane(i) * P2, 13) * P1
          a2 = Integer.rotateLeft(a2 + lane(i + 4) * P2, 13) * P1
          a3 = Integer.rotateLeft(a3 + lane(i + 8) * P2, 13) * P1
          a4 = Integer.rotateLeft(a4 + lane(i + 12) * P2, 13) * P1
          i += 16
        }
        Integer.rotateLeft(a1, 1) + Integer.rotateLeft(a2, 7) +
          Integer.rotateLeft(a3, 12) + Integer.rotateLeft(a4, 18)
      } else seed + P5
    h += len
    while (i + 4 <= end) { h = Integer.rotateLeft(h + lane(i) * P3, 17) * P4; i += 4 }
    while (i < end) { h = Integer.rotateLeft(h + (p(i) & 0xFF) * P5, 11) * P1; i += 1 }
    h ^= h >>> 15; h *= P2; h ^= h >>> 13; h *= P3; h ^= h >>> 16
    h
  }

  /** Decode one raw LZ4 block from p[from,until) APPENDING into
    * `out` at `o` — matches may reach back past the block start
    * (block-dependent frames). Returns the new write position. */
  private def lz4BlockInto(p: Array[Byte], from: Int, until: Int,
      out: Array[Byte], o0: Int, cap: Int): Int = {
    var pos = from
    var o = o0
    def u8(): Int = { if (pos >= until) refuse(); val v = p(pos) & 0xFF; pos += 1; v }
    if (from == until) return o // empty block: no sequences
    var done = false
    while (!done) {
      val token = u8()
      var litLen = token >>> 4
      if (litLen == 15) { var b = 255; while (b == 255) { b = u8(); litLen += b } }
      if (pos + litLen > until || o + litLen > cap) refuse()
      System.arraycopy(p, pos, out, o, litLen)
      pos += litLen; o += litLen
      if (pos == until) done = true // last sequence: literals only
      else {
        val offset = u8() | (u8() << 8)
        var matchLen = (token & 0x0F) + 4
        if ((token & 0x0F) == 15) { var b = 255; while (b == 255) { b = u8(); matchLen += b } }
        if (offset <= 0 || offset > o || o + matchLen > cap) refuse()
        var i = 0
        while (i < matchLen) { out(o) = out(o - offset); o += 1; i += 1 }
      }
    }
    o
  }

  /** Does the payload open with an LZ4 frame (or skippable) magic? */
  def isLz4Framed(p: Array[Byte]): Boolean =
    p != null && p.length >= 4 && {
      val m = (p(0) & 0xFF) | ((p(1) & 0xFF) << 8) | ((p(2) & 0xFF) << 16) | ((p(3) & 0xFF) << 24)
      m == 0x184D2204 || (m & 0xFFFFFFF0) == 0x184D2A50
    }

  def unlz4Framed(p: Array[Byte]): Option[Array[Byte]] =
    try {
      var pos = 0
      var out = new Array[Byte](math.min(MaxOutput, math.max(1024, p.length * 4)))
      var o = 0
      def u8(): Int = { if (pos >= p.length) refuse(); val v = p(pos) & 0xFF; pos += 1; v }
      def u32(): Int = {
        if (pos + 4 > p.length) refuse()
        val v = u32le(p, pos); pos += 4; v
      }
      def ensure(n: Int): Unit = if (o + n > out.length) {
        if (o.toLong + n > MaxOutput) refuse()
        out = java.util.Arrays.copyOf(out,
          math.min(MaxOutput.toLong, math.max(out.length.toLong * 2, o.toLong + n)).toInt)
      }
      var sawFrame = false
      while (pos < p.length) {
        val magic = u32()
        if ((magic & 0xFFFFFFF0) == 0x184D2A50) { // skippable frame
          val sz = u32()
          if (sz < 0 || pos + sz > p.length) refuse()
          pos += sz
        } else if (magic == 0x184C2102) {
          refuse() // legacy frame: declared out
        } else if (magic == 0x184D2204) {
          sawFrame = true
          val descStart = pos
          val flg = u8()
          val bd = u8()
          if ((flg >>> 6) != 1) refuse() // version
          if ((flg & 0x02) != 0) refuse() // reserved flag bit
          val bChecksum = (flg & 0x10) != 0
          val hasCSize = (flg & 0x08) != 0
          val cChecksum = (flg & 0x04) != 0
          if ((flg & 0x01) != 0) refuse() // dict-ID: no external dictionaries
          val bmaxCode = (bd >>> 4) & 0x07
          if (bmaxCode < 4 || (bd & 0x8F) != 0) refuse()
          val blockMax = 1 << (8 + 2 * bmaxCode) // 4→64 KiB … 7→4 MiB
          val contentSize: Long =
            if (hasCSize) {
              if (pos + 8 > p.length) refuse()
              var v = 0L; var i = 0
              while (i < 8) { v |= (p(pos + i) & 0xFFL) << (8 * i); i += 1 }
              pos += 8; v
            } else -1L
          val hc = u8()
          if (((xxh32(p, descStart, pos - 1 - descStart, 0) >>> 8) & 0xFF) != hc)
            refuse() // descriptor checksum
          val frameStart = o
          var ended = false
          while (!ended) {
            val bsz = u32()
            if (bsz == 0) ended = true
            else {
              val stored = (bsz & 0x80000000) != 0
              val len = bsz & 0x7FFFFFFF
              if (len > blockMax || pos + len > p.length) refuse()
              if (stored) {
                ensure(len)
                System.arraycopy(p, pos, out, o, len)
                o += len
              } else {
                ensure(blockMax)
                // a block may not inflate past the descriptor's max
                o = lz4BlockInto(p, pos, pos + len, out, o, o + blockMax)
              }
              pos += len
              if (bChecksum) {
                val c = u32()
                if (xxh32(p, pos - 4 - len, len, 0) != c) refuse()
              }
            }
          }
          if (cChecksum) {
            val c = u32()
            if (xxh32(out, frameStart, o - frameStart, 0) != c) refuse()
          }
          if (contentSize >= 0 && (o - frameStart).toLong != contentSize) refuse()
        } else refuse()
      }
      if (!sawFrame) refuse()
      Some(java.util.Arrays.copyOf(out, o))
    } catch { case Refuse => None }

  /** Framed writer for fixtures: a leading skippable frame, then one
    * frame with content size + both checksum layers, blocks
    * alternating STORED and compressed (literal-only). */
  def lz4Framed(data: Array[Byte], chunkSize: Int = 16384): Array[Byte] = {
    require(chunkSize >= 1 && chunkSize <= 65536)
    val bos = new java.io.ByteArrayOutputStream(data.length + 64)
    def w32(v: Int): Unit = { var j = 0; while (j < 4) { bos.write((v >> (8 * j)) & 0xFF); j += 1 } }
    w32(0x184D2A50); w32(3); bos.write(Array[Byte](9, 9, 9)) // skippable
    w32(0x184D2204)
    val desc = Array[Byte](0x7C.toByte, 0x40, // FLG: v01+indep+bsum+csize+csum; BD: 64 KiB
      0, 0, 0, 0, 0, 0, 0, 0)
    var i = 0
    while (i < 8) { desc(2 + i) = ((data.length.toLong >> (8 * i)) & 0xFF).toByte; i += 1 }
    bos.write(desc, 0, 10)
    bos.write((xxh32(desc, 0, 10, 0) >>> 8) & 0xFF)
    i = 0
    var k = 0
    while (i < data.length) {
      val n = math.min(chunkSize, data.length - i)
      if (k % 2 == 0) {
        w32(n | 0x80000000) // stored
        bos.write(data, i, n)
        w32(xxh32(data, i, n, 0))
      } else {
        val block = lz4Literal(java.util.Arrays.copyOfRange(data, i, i + n))
        w32(block.length)
        bos.write(block, 0, block.length)
        w32(xxh32(block, 0, block.length, 0))
      }
      i += n
      k += 1
    }
    w32(0) // EndMark
    w32(xxh32(data, 0, data.length, 0))
    bos.toByteArray
  }

  // ------------------------------------------------------------------
  // Spark seam (the packTextZstd/decodeZstdText contract)
  // ------------------------------------------------------------------

  /** Per-doc blocks compressed by the REFERENCE libraries — snappy
    * for even ids, lz4 (fast/high alternating) for odd — with the
    * original byte length carried alongside (LZ4 blocks don't store
    * it, the container does; here the row is the container). */
  def packTextShort(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    Partitioning.fanOut(df)
      .select(col(idCol).cast("long"), coalesce(col(textCol), lit("")))
      .as[(Long, String)]
      .mapPartitions { rows =>
        lazy val lz4 = net.jpountz.lz4.LZ4Factory.fastestJavaInstance()
        rows.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          if (id % 2 == 0)
            (id, "snappy", bytes.length.toLong, org.xerial.snappy.Snappy.compress(bytes))
          else {
            val comp = if (id % 4 == 1) lz4.fastCompressor() else lz4.highCompressor()
            (id, "lz4", bytes.length.toLong, comp.compress(bytes))
          }
        }
      }
      .toDF("id", "codec", "orig_len", "payload")
  }

  /** Decode back through the from-spec decoders; the quarantine
    * contract of the other codec seams. */
  def decodeShortText(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("codec"),
        org.apache.spark.sql.functions.col("orig_len"),
        org.apache.spark.sql.functions.col("payload"))
      .as[(Long, String, Long, Array[Byte])]
      .mapPartitions(_.map { case (id, codec, origLen, payload) =>
        val decoded = codec match {
          case "snappy" => unsnappy(payload)
          case "lz4" => unlz4(payload, origLen.toInt)
          case _ => None
        }
        decoded match {
          case Some(bytes) => (id, codec, true, bytes.length.toLong,
            new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
          case None => (id, codec, false, 0L, null: String)
        }
      })
      .toDF("id", "codec", "decoded", "n_bytes", "text")
  }

  /** FRAMED fixture packer (round 14): per-doc streams through the
    * INDEPENDENT reference frame writers — snappy-java's
    * SnappyFramedOutputStream on even ids, lz4-java's
    * LZ4FrameOutputStream on odd — so the gate decodes frames this
    * repo never wrote. */
  def packTextFramed(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    Partitioning.fanOut(df)
      .select(col(idCol).cast("long"), coalesce(col(textCol), lit("")))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val bos = new java.io.ByteArrayOutputStream()
        if (id % 2 == 0) {
          val w = new org.xerial.snappy.SnappyFramedOutputStream(bos)
          w.write(bytes); w.close()
          (id, "snappy-framed", bos.toByteArray)
        } else {
          val w = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
          w.write(bytes); w.close()
          (id, "lz4-framed", bos.toByteArray)
        }
      })
      .toDF("id", "codec", "payload")
  }

  /** Decode framed streams back — the payloads carry no out-of-band
    * length (the frame layer owns it), so this also proves the frame
    * walk end to end. Codec re-derived by SNIFF, not trusted from
    * the column. */
  def decodeFramedText(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val codec = Sniff.detect(payload)
        val decoded = codec match {
          case "snappy-framed" => unsnappyFramed(payload)
          case "lz4-framed" => unlz4Framed(payload)
          case _ => None
        }
        decoded match {
          case Some(bytes) => (id, codec, true, bytes.length.toLong,
            new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
          case None => (id, codec, false, 0L, null: String)
        }
      })
      .toDF("id", "codec", "decoded", "n_bytes", "text")
  }

  /** Spec-legal literal-only LZ4 block (one final sequence). */
  def lz4Literal(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(data.length + 8)
    val lit = data.length
    if (lit < 15) bos.write(lit << 4)
    else {
      bos.write(15 << 4)
      var rest = lit - 15
      while (rest >= 255) { bos.write(255); rest -= 255 }
      bos.write(rest)
    }
    bos.write(data, 0, data.length)
    bos.toByteArray
  }
}
