package graft.ops

/** Delta Lake deletion-vector support — the row-level-delete rung of
  * the [[DeltaLog]] reader (round 15). Modern Delta writers enable
  * deletion vectors by default: instead of rewriting a parquet file
  * to delete rows, a commit attaches a bitmap of DELETED ROW INDEXES
  * to the file's `add` action, and readers must anti-filter those
  * positions or silently return deleted rows.
  *
  * Everything here is from the published Delta Transaction Log
  * Protocol (PROTOCOL.md, Linux Foundation), "Deletion Vectors" +
  * "Deletion Vector Descriptor Schema" + "Deletion Vector File
  * Storage Format" sections; the reference repo has no analogue
  * (its sqlite source is `main.py:118-138`).
  *
  *  - the `add.deletionVector` descriptor carries `storageType`
  *    (`u` relative file named by a Z85 UUID, `p` absolute-path
  *    file, `i` inline), `pathOrInlineDv`, optional `offset`,
  *    `sizeInBytes` (length of the serialized bitmap) and
  *    `cardinality` (number of deleted rows);
  *  - on-disk DV files open with a single format-version byte `1`;
  *    each DV within sits at `offset`: a BIG-endian int32 length
  *    (== sizeInBytes), the bitmap bytes, then a BIG-endian int32
  *    CRC-32 of the bitmap bytes;
  *  - `u` storage: `pathOrInlineDv` = `<random prefix><20-char Z85
  *    UUID>`; the file lives at
  *    `<table>/<prefix>/deletion_vector_<canonical uuid>.bin`;
  *  - `i` storage: `pathOrInlineDv` is the Z85 of the bitmap bytes
  *    themselves (zero-padded to a 4-byte multiple; `sizeInBytes`
  *    recovers the true length);
  *  - the bitmap is a RoaringBitmapArray in the "portable" format:
  *    a little-endian int32 magic 1681511377, a little-endian int64
  *    bitmap count, then each 32-bit RoaringBitmap in the public
  *    RoaringFormatSpec portable layout, index order — a set value
  *    is `(bitmapIndex << 32) | uint32`.
  *
  * Scale shape: descriptors live in the log (metadata); bitmap blobs
  * are bounded by `sizeInBytes` (KBs for millions of deletes thanks
  * to run/bitmap containers), so [[DeltaLog.readTable]] ships the
  * BLOBS to executors and explodes positions there — the driver
  * never materializes a position list.
  */
object DeltaDv {

  /** `add.deletionVector` descriptor (PROTOCOL.md schema). */
  final case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Long], sizeInBytes: Long, cardinality: Long) {
    /** Replay identity: two adds of one path with different DVs are
      * different table states; the protocol keys file actions by
      * (path, dvUniqueId). */
    def uniqueId: String =
      storageType + pathOrInlineDv + offset.map(o => s"@$o").getOrElse("")
  }

  private def fail(msg: String): Nothing =
    throw new graft.GraftAnalysisException(s"delta: deletion vector $msg")

  // ---------------------------------------------------------------
  // Z85 (ZeroMQ base85, the alphabet Delta's codec uses)
  // ---------------------------------------------------------------

  private val z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val z85Rev: Array[Int] = {
    val r = Array.fill(128)(-1)
    z85Alphabet.zipWithIndex.foreach { case (c, i) => r(c.toInt) = i }
    r
  }

  /** Z85-decode (length must be a multiple of 5). */
  private[graft] def z85Decode(s: String): Array[Byte] = {
    if (s.length % 5 != 0) fail(s"Z85 length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var acc = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val v = if (c < 128) z85Rev(c.toInt) else -1
        if (v < 0) fail(s"invalid Z85 character '$c'")
        acc = acc * 85 + v
        j += 1
      }
      if (acc > 0xFFFFFFFFL) fail("Z85 group overflows 32 bits")
      val o = i / 5 * 4
      out(o) = (acc >>> 24).toByte; out(o + 1) = (acc >>> 16).toByte
      out(o + 2) = (acc >>> 8).toByte; out(o + 3) = acc.toByte
      i += 5
    }
    out
  }

  /** Z85-encode (input zero-padded to a 4-byte multiple, per Delta's
    * codec; callers carry the true length out of band). */
  private[graft] def z85Encode(bytes: Array[Byte]): String = {
    val padded =
      if (bytes.length % 4 == 0) bytes
      else java.util.Arrays.copyOf(bytes, (bytes.length / 4 + 1) * 4)
    val sb = new StringBuilder(padded.length / 4 * 5)
    var i = 0
    while (i < padded.length) {
      var acc = 0L
      var j = 0
      while (j < 4) { acc = (acc << 8) | (padded(i + j) & 0xFFL); j += 1 }
      val grp = new Array[Char](5)
      var k = 4
      while (k >= 0) { grp(k) = z85Alphabet((acc % 85).toInt); acc /= 85; k -= 1 }
      sb.appendAll(grp)
      i += 4
    }
    sb.toString
  }

  // ---------------------------------------------------------------
  // Portable RoaringBitmapArray (read + fixture write)
  // ---------------------------------------------------------------

  private val MagicNumber = 1681511377
  private val SerialCookieNoRun = 12346
  private val SerialCookie = 12347
  private val NoOffsetThreshold = 4

  private final class Cursor(val b: Array[Byte]) {
    var p = 0
    def u8(): Int = { val v = b(p) & 0xFF; p += 1; v }
    def u16(): Int = { val v = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8); p += 2; v }
    def i32(): Int = { val v = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
      ((b(p + 2) & 0xFF) << 16) | ((b(p + 3) & 0xFF) << 24); p += 4; v }
    def i64(): Long = { val lo = i32() & 0xFFFFFFFFL; val hi = i32() & 0xFFFFFFFFL
      lo | (hi << 32) }
    def need(n: Int): Unit = if (p + n > b.length) fail("bitmap truncated")
  }

  /** Deserialize ONE portable 32-bit RoaringBitmap at the cursor,
    * appending `(base | uint32)` values. */
  private def readRoaring32(c: Cursor, base: Long, out: scala.collection.mutable.ArrayBuffer[Long]): Unit = {
    c.need(4)
    val cookie = c.i32()
    val (size, runBits): (Int, Array[Byte]) =
      if ((cookie & 0xFFFF) == SerialCookie) {
        val n = (cookie >>> 16) + 1
        val bs = new Array[Byte]((n + 7) / 8)
        c.need(bs.length)
        System.arraycopy(c.b, c.p, bs, 0, bs.length); c.p += bs.length
        (n, bs)
      } else if (cookie == SerialCookieNoRun) {
        c.need(4)
        (c.i32(), null)
      } else fail(f"bad RoaringBitmap cookie 0x$cookie%08x")
    if (size < 0 || size > 65536) fail(s"implausible container count $size")
    val keys = new Array[Int](size)
    val cards = new Array[Int](size)
    var i = 0
    c.need(size * 4)
    while (i < size) { keys(i) = c.u16(); cards(i) = c.u16() + 1; i += 1 }
    val hasOffsets = runBits == null || size >= NoOffsetThreshold
    if (hasOffsets) { c.need(size * 4); c.p += size * 4 } // sequential read: skip
    def isRun(i: Int): Boolean =
      runBits != null && (runBits(i / 8) & (1 << (i % 8))) != 0
    i = 0
    while (i < size) {
      val keyBase = base | (keys(i).toLong << 16)
      if (isRun(i)) {
        c.need(2)
        val nRuns = c.u16()
        var r = 0
        while (r < nRuns) {
          c.need(4)
          val start = c.u16(); val len = c.u16()
          var v = 0
          while (v <= len) { out += keyBase | (start + v); v += 1 }
          r += 1
        }
      } else if (cards(i) <= 4096) {
        c.need(cards(i) * 2)
        var v = 0
        while (v < cards(i)) { out += keyBase | c.u16(); v += 1 }
      } else {
        c.need(8192)
        var w = 0
        while (w < 1024) {
          var word = c.i64()
          val wordBase = keyBase | (w.toLong << 6)
          while (word != 0) {
            out += wordBase | java.lang.Long.numberOfTrailingZeros(word)
            word &= word - 1
          }
          w += 1
        }
      }
      i += 1
    }
  }

  /** Serialized RoaringBitmapArray bytes → sorted deleted positions.
    * Refuses (analysis error) on a bad magic, cookie, or truncation —
    * silently dropping a bitmap would resurrect deleted rows. */
  def positions(data: Array[Byte]): Array[Long] = {
    val c = new Cursor(data)
    c.need(12)
    if (c.i32() != MagicNumber) fail("bad RoaringBitmapArray magic")
    val n = c.i64()
    if (n < 0 || n > 0x7FFFFFFFL) fail(s"implausible bitmap count $n")
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0L
    while (i < n) { readRoaring32(c, i << 32, out); i += 1 }
    out.toArray
  }

  /** Fixture-side serializer (tests + gate packers; also pins the
    * reader by round-trip): positions → portable RoaringBitmapArray.
    * Container choice per 64Ki chunk: run when `useRuns` and runs
    * compress, else array (≤4096 values) or bitmap. */
  private[graft] def serialize(positions: Seq[Long], useRuns: Boolean = false): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = bos.write(v & 0xFF)
    def w16(v: Int): Unit = { w8(v); w8(v >>> 8) }
    def w32(v: Int): Unit = { w16(v); w16(v >>> 16) }
    def w64(v: Long): Unit = { w32(v.toInt); w32((v >>> 32).toInt) }
    require(positions.forall(_ >= 0), "negative position")
    val sorted = positions.distinct.sorted
    val nBitmaps = if (sorted.isEmpty) 0L else (sorted.last >>> 32) + 1
    w32(MagicNumber); w64(nBitmaps)
    (0L until nBitmaps).foreach { bi =>
      val vals = sorted.filter(v => (v >>> 32) == bi).map(v => (v & 0xFFFFFFFFL).toInt)
      val byKey = vals.groupBy(v => v >>> 16).toSeq.sortBy(_._1)
      // runs-per-container decision
      def runsOf(lows: Seq[Int]): Seq[(Int, Int)] = {
        val rs = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
        lows.foreach { v =>
          if (rs.nonEmpty && rs.last._1 + rs.last._2 + 1 == v)
            rs(rs.length - 1) = (rs.last._1, rs.last._2 + 1)
          else rs += ((v, 0))
        }
        rs.toSeq
      }
      val conts = byKey.map { case (k, vs) =>
        val lows = vs.map(_ & 0xFFFF)
        val runs = if (useRuns) runsOf(lows) else Seq.empty
        val asRun = useRuns && (2 + runs.size * 4) < math.min(lows.size * 2, 8192)
        (k, lows, runs, asRun)
      }
      val anyRun = conts.exists(_._4)
      val size = conts.size
      if (anyRun) {
        w32(SerialCookie | ((size - 1) << 16))
        val bits = new Array[Byte]((size + 7) / 8)
        conts.zipWithIndex.foreach { case ((_, _, _, r), i) =>
          if (r) bits(i / 8) = (bits(i / 8) | (1 << (i % 8))).toByte }
        bos.write(bits)
      } else w32(SerialCookieNoRun)
      if (!anyRun) w32(size)
      conts.foreach { case (k, lows, _, _) => w16(k); w16(lows.size - 1) }
      if (!anyRun || size >= NoOffsetThreshold) {
        // offset header: byte offsets of each container from the
        // start of THIS bitmap's serialization
        val headerLen = if (anyRun)
          4 + (size + 7) / 8 + size * 4 + size * 4
        else 4 + 4 + size * 4 + size * 4
        var off = headerLen
        conts.foreach { case (_, lows, runs, asRun) =>
          w32(off)
          off += (if (asRun) 2 + runs.size * 4
                  else if (lows.size <= 4096) lows.size * 2 else 8192)
        }
      }
      conts.foreach { case (_, lows, runs, asRun) =>
        if (asRun) {
          w16(runs.size)
          runs.foreach { case (s, l) => w16(s); w16(l) }
        } else if (lows.size <= 4096) lows.foreach(w16)
        else {
          val words = new Array[Long](1024)
          lows.foreach(v => words(v >>> 6) |= 1L << (v & 63))
          words.foreach(w64)
        }
      }
    }
    bos.toByteArray
  }

  // ---------------------------------------------------------------
  // Storage access
  // ---------------------------------------------------------------

  /** Resolve a `u`-storage descriptor to its DV file under the table
    * dir: strip the 20-char Z85 UUID off the tail (anything before it
    * is the random prefix directory). */
  private[graft] def uPath(tableDir: String, pathOrInlineDv: String): String = {
    if (pathOrInlineDv.length < 20) fail(s"'u' path too short: $pathOrInlineDv")
    val prefix = pathOrInlineDv.dropRight(20)
    val uuidBytes = z85Decode(pathOrInlineDv.takeRight(20))
    val bb = java.nio.ByteBuffer.wrap(uuidBytes)
    val uuid = new java.util.UUID(bb.getLong, bb.getLong)
    val dir = if (prefix.isEmpty) tableDir else s"$tableDir/$prefix"
    s"$dir/deletion_vector_$uuid.bin"
  }

  /** Load a descriptor's serialized-bitmap bytes. On-disk forms
    * verify the file's version byte, the length field against
    * `sizeInBytes`, and the trailing CRC-32 — a torn or corrupt DV
    * must refuse, not resurrect rows. */
  def load(tableDir: String, d: Descriptor): Array[Byte] = d.storageType match {
    case "i" =>
      val raw = z85Decode(d.pathOrInlineDv)
      if (d.sizeInBytes > raw.length) fail("inline sizeInBytes exceeds payload")
      java.util.Arrays.copyOf(raw, d.sizeInBytes.toInt)
    case "u" | "p" =>
      val path =
        if (d.storageType == "u") uPath(tableDir, d.pathOrInlineDv)
        else d.pathOrInlineDv.stripPrefix("file:")
      if (!TableIo.isFile(path)) fail(s"file missing: $path")
      val all = TableIo.readBytes(path)
      if (all.isEmpty || all(0) != 1) fail(s"unsupported DV file version in $path")
      val off = d.offset.getOrElse(1L).toInt
      if (off + 4 > all.length) fail(s"offset $off out of range in $path")
      val len = ((all(off) & 0xFF) << 24) | ((all(off + 1) & 0xFF) << 16) |
        ((all(off + 2) & 0xFF) << 8) | (all(off + 3) & 0xFF)
      if (len != d.sizeInBytes) fail(s"length $len != descriptor sizeInBytes ${d.sizeInBytes}")
      if (off + 8 + len > all.length) fail(s"DV at offset $off truncated in $path")
      val data = java.util.Arrays.copyOfRange(all, off + 4, off + 4 + len)
      val crcPos = off + 4 + len
      val stored = ((all(crcPos) & 0xFF) << 24) | ((all(crcPos + 1) & 0xFF) << 16) |
        ((all(crcPos + 2) & 0xFF) << 8) | (all(crcPos + 3) & 0xFF)
      val crc = new java.util.zip.CRC32
      crc.update(data)
      if (crc.getValue.toInt != stored) fail(s"CRC mismatch in $path")
      data
    case other => fail(s"unknown storageType '$other'")
  }

  /** Fixture-side DV-file writer: version byte + each DV's
    * (big-endian length, bitmap bytes, big-endian CRC-32); returns
    * the per-DV offsets aligned with `dvs`. */
  private[graft] def writeDvFile(dest: java.io.File, dvs: Seq[Array[Byte]]): Seq[Long] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(1)
    val offsets = dvs.map { data =>
      val off = bos.size().toLong
      def wbe(v: Int): Unit = {
        bos.write(v >>> 24); bos.write((v >>> 16) & 0xFF)
        bos.write((v >>> 8) & 0xFF); bos.write(v & 0xFF)
      }
      wbe(data.length)
      bos.write(data)
      val crc = new java.util.zip.CRC32
      crc.update(data)
      wbe(crc.getValue.toInt)
      off
    }
    java.nio.file.Files.write(dest.toPath, bos.toByteArray)
    offsets
  }
}
