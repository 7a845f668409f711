package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimal spec-legal HDF5 builder — fixture side only (gates +
  * Hdf5Spec), the [[Vorbis]] discipline: no HDF5 implementation
  * exists on this classpath or in the container, so the payloads the
  * [[Hdf5]] reader is gated on are built here from the same
  * PUBLISHED file-format spec, and the independence pins live in
  * Hdf5Spec (lookup3 published vectors, JDK zlib as the deflate
  * encoder, corruption ladders).
  *
  * Two complete vintages, cycled by the packer:
  *  - `v0`: superblock version 0, v1 object headers, v1 group
  *    machinery (B-tree `TREE` → `SNOD` → local `HEAP`) — the
  *    libhdf5-default layout;
  *  - `v2`: superblock version 2 (lookup3 checksum), v2 `OHDR`
  *    object headers with compact Link messages — the
  *    `libver=latest` layout.
  *
  * Each file: three root datasets (contiguous f32-LE, i64-LE,
  * i32-BE) and a subgroup `g` holding a CHUNKED f64 matrix with the
  * [shuffle, deflate, fletcher32] filter pipeline and edge chunks.
  */
object Hdf5Write {

  private val Undef = -1L

  private final class Out {
    val bos = new java.io.ByteArrayOutputStream()
    def addr: Long = bos.size().toLong
    def u8(v: Int): Unit = bos.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def u32(v: Long): Unit = { var i = 0; while (i < 4) { u8(((v >> (8 * i)) & 0xFF).toInt); i += 1 } }
    def u64(v: Long): Unit = { var i = 0; while (i < 8) { u8(((v >> (8 * i)) & 0xFF).toInt); i += 1 } }
    def raw(b: Array[Byte]): Unit = bos.write(b)
    def pad8(): Unit = while (bos.size() % 8 != 0) u8(0)
  }

  // ---------------------------------------------------------- messages

  private def dataspace1(dims: Seq[Long]): Array[Byte] = {
    val o = new Out
    o.u8(1); o.u8(dims.length); o.u8(0); o.u8(0); o.u32(0)
    dims.foreach(o.u64)
    o.pad8()
    o.bos.toByteArray
  }

  private def datatype(kind: String, size: Int, bigEndian: Boolean): Array[Byte] = {
    val o = new Out
    if (kind == "int") {
      o.u8(0x10) // version 1, class 0
      o.u8((if (bigEndian) 1 else 0) | 0x08) // order + signed
      o.u8(0); o.u8(0)
      o.u32(size.toLong)
      o.u16(0); o.u16(size * 8) // bit offset, precision
    } else {
      o.u8(0x11) // version 1, class 1 float
      o.u8(if (bigEndian) 1 else 0)
      o.u8(if (size == 4) 31 else 63) // sign location
      o.u8(0)
      o.u32(size.toLong)
      o.u16(0); o.u16(size * 8)
      if (size == 4) { o.u8(23); o.u8(8); o.u8(0); o.u8(23); o.u32(127L) }
      else { o.u8(52); o.u8(11); o.u8(0); o.u8(52); o.u32(1023L) }
    }
    o.pad8()
    o.bos.toByteArray
  }

  private def layoutContiguous(addr: Long, size: Long): Array[Byte] = {
    val o = new Out
    o.u8(3); o.u8(1); o.u64(addr); o.u64(size)
    o.pad8()
    o.bos.toByteArray
  }

  private def layoutChunked(btree: Long, chunkDims: Seq[Int], elemSize: Int): Array[Byte] = {
    val o = new Out
    o.u8(3); o.u8(2); o.u8(chunkDims.length + 1)
    o.u64(btree)
    chunkDims.foreach(d => o.u32(d.toLong))
    o.u32(elemSize.toLong)
    o.pad8()
    o.bos.toByteArray
  }

  /** Filter pipeline v1: [shuffle(elemSize), deflate(level), fletcher32]. */
  private def filterPipeline(elemSize: Int): Array[Byte] = {
    val o = new Out
    o.u8(1); o.u8(3); o.u16(0); o.u32(0)
    def filter(id: Int, client: Seq[Long]): Unit = {
      o.u16(id); o.u16(0) // empty name
      o.u16(if (id == 3) 1 else 0) // fletcher32: OPTIONAL flag per convention
      o.u16(client.length)
      client.foreach(o.u32)
      if (client.length % 2 == 1) o.u32(0L)
    }
    filter(2, Seq(elemSize.toLong)) // shuffle
    filter(1, Seq(6L)) // deflate, level 6
    filter(3, Seq.empty) // fletcher32
    o.pad8()
    o.bos.toByteArray
  }

  private def symbolTableMsg(btree: Long, heap: Long): Array[Byte] = {
    val o = new Out
    o.u64(btree); o.u64(heap)
    o.bos.toByteArray
  }

  private def linkInfoMsg(): Array[Byte] = {
    val o = new Out
    o.u8(0); o.u8(0) // version, flags (no creation order)
    o.u64(Undef); o.u64(Undef) // fractal heap, name index btree
    o.bos.toByteArray
  }

  private def linkMsg(name: String, target: Long): Array[Byte] = {
    val o = new Out
    val nb = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    o.u8(1); o.u8(0) // version, flags: width 1, hard link, no extras
    o.u8(nb.length)
    o.raw(nb)
    o.u64(target)
    o.bos.toByteArray
  }

  // ---------------------------------------------------------- headers

  /** v1 object header (prefix + 8-aligned messages). */
  private def writeV1Header(o: Out, msgs: Seq[(Int, Array[Byte])]): Long = {
    o.pad8()
    val at = o.addr
    val body = msgs.map { case (t, d) => 8 + d.length }.sum
    o.u8(1); o.u8(0)
    o.u16(msgs.length)
    o.u32(1L) // reference count
    o.u32(body.toLong)
    o.u32(0L) // pad to 8-align the first message
    msgs.foreach { case (t, d) =>
      o.u16(t); o.u16(d.length); o.u8(0); o.u8(0); o.u8(0); o.u8(0)
      o.raw(d)
    }
    at
  }

  /** v2 object header (OHDR, u16 chunk-0 size, lookup3 checksum). */
  private def writeV2Header(o: Out, msgs: Seq[(Int, Array[Byte])]): Long = {
    o.pad8()
    val at = o.addr
    val body = msgs.map { case (_, d) => 4 + d.length }.sum
    o.raw("OHDR".getBytes("US-ASCII"))
    o.u8(2); o.u8(0x01) // flags: chunk0 size width 2
    o.u16(body)
    msgs.foreach { case (t, d) =>
      o.u8(t); o.u16(d.length); o.u8(0)
      o.raw(d)
    }
    val block = o.bos.toByteArray
    o.u32(Hdf5.lookup3(block, at.toInt, (o.addr - at).toInt, 0) & 0xFFFFFFFFL)
    at
  }

  // ---------------------------------------------------------- v1 group

  /** Local heap + SNOD + B-tree for (name → header addr) links.
    * Returns (btreeAddr, heapAddr). */
  private def writeV1Group(o: Out, links: Seq[(String, Long)]): (Long, Long) = {
    val sorted = links.sortBy(_._1)
    // heap data segment: "" at 0, then each name
    val heapData = new Out
    heapData.u8(0) // the empty string at offset 0
    val offsets = sorted.map { case (n, _) =>
      val off = heapData.addr
      heapData.raw(n.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      heapData.u8(0)
      off
    }
    heapData.pad8()
    val dataBytes = heapData.bos.toByteArray
    o.pad8()
    val heapDataAddr = o.addr
    o.raw(dataBytes)
    o.pad8()
    val heapAddr = o.addr
    o.raw("HEAP".getBytes("US-ASCII"))
    o.u8(0); o.u8(0); o.u8(0); o.u8(0)
    o.u64(dataBytes.length.toLong)
    o.u64(Undef) // free list: none
    o.u64(heapDataAddr)
    // SNOD
    o.pad8()
    val snodAddr = o.addr
    o.raw("SNOD".getBytes("US-ASCII"))
    o.u8(1); o.u8(0)
    o.u16(sorted.length)
    sorted.zip(offsets).foreach { case ((_, target), off) =>
      o.u64(off); o.u64(target)
      o.u32(0L); o.u32(0L) // cache type, reserved
      (0 until 16).foreach(_ => o.u8(0)) // scratch
    }
    // B-tree leaf: one SNOD child
    o.pad8()
    val btreeAddr = o.addr
    o.raw("TREE".getBytes("US-ASCII"))
    o.u8(0); o.u8(0) // node type 0, level 0
    o.u16(1)
    o.u64(Undef); o.u64(Undef) // siblings
    o.u64(0L) // key 0: the empty string
    o.u64(snodAddr)
    o.u64(offsets.last) // key 1: the greatest name
    (btreeAddr, heapAddr)
  }

  // ---------------------------------------------------------- datasets

  private def encode(values: Seq[Double], kind: String, size: Int,
      bigEndian: Boolean): Array[Byte] = {
    val o = new Out
    values.foreach { v =>
      val bits: Long =
        if (kind == "float") {
          if (size == 4) java.lang.Float.floatToIntBits(v.toFloat).toLong & 0xFFFFFFFFL
          else java.lang.Double.doubleToLongBits(v)
        } else v.toLong
      if (bigEndian) {
        var i = size - 1
        while (i >= 0) { o.u8(((bits >> (8 * i)) & 0xFF).toInt); i -= 1 }
      } else {
        var i = 0
        while (i < size) { o.u8(((bits >> (8 * i)) & 0xFF).toInt); i += 1 }
      }
    }
    o.bos.toByteArray
  }

  /** Apply the fixture's write pipeline: shuffle → deflate (JDK
    * zlib, the independent encoder) → fletcher32 append. */
  private def filterChunk(plain: Array[Byte], elemSize: Int): Array[Byte] = {
    // shuffle: byte plane j holds byte j of every element
    val n = plain.length / elemSize
    val shuffled = new Array[Byte](plain.length)
    var j = 0
    while (j < elemSize) {
      var k = 0
      while (k < n) { shuffled(j * n + k) = plain(k * elemSize + j); k += 1 }
      j += 1
    }
    val deflater = new java.util.zip.Deflater(6, false) // zlib wrapper
    deflater.setInput(shuffled)
    deflater.finish()
    val buf = new Array[Byte](shuffled.length + 64)
    val m = deflater.deflate(buf)
    deflater.end()
    val compressed = java.util.Arrays.copyOfRange(buf, 0, m)
    val sum = Hdf5.fletcher32(compressed, 0, compressed.length)
    val o = new Out
    o.raw(compressed)
    o.u32(sum.toLong & 0xFFFFFFFFL)
    o.bos.toByteArray
  }

  /** Build one complete file. `v2` selects the modern vintage. */
  def build(id: Long, v2: Boolean): Array[Byte] = {
    val o = new Out
    // superblock placeholder (patched at the end)
    val sbSize = if (v2) 48 else 96
    (0 until sbSize).foreach(_ => o.u8(0))

    def f32Vals = (0 until 24).map(i => ((id + i) % 17 - 8) * 0.25)
    def i64Vals = (0 until 16).map(i => ((id + i) % 101 - 50).toDouble)
    def ibeVals = (0 until 8).map(i => ((id + i) % 19 - 9).toDouble)
    // 6×5 f64 matrix, chunks 4×4 → edge chunks on both axes
    val matDims = Seq(6L, 5L)
    val chunkDims = Seq(4, 4)
    def matVal(r: Int, c: Int): Double = ((id + 5 * r + c) % 23 - 11) * 0.25

    def contiguous(values: Seq[Double], kind: String, size: Int,
        bigEndian: Boolean): (Long, Long) = {
      o.pad8()
      val at = o.addr
      val bytes = encode(values, kind, size, bigEndian)
      o.raw(bytes)
      (at, bytes.length.toLong)
    }
    val (f32At, f32Sz) = contiguous(f32Vals, "float", 4, bigEndian = false)
    val (i64At, i64Sz) = contiguous(i64Vals, "int", 8, bigEndian = false)
    val (ibeAt, ibeSz) = contiguous(ibeVals, "int", 4, bigEndian = true)

    // chunked matrix: full-size chunks, clipped on read
    val chunkAddrs = for (r0 <- Seq(0, 4); c0 <- Seq(0, 4) if c0 < 5) yield {
      val plain = new Array[Double](16)
      var i = 0
      for (r <- 0 until 4; c <- 0 until 4) {
        plain(i) = if (r0 + r < 6 && c0 + c < 5) matVal(r0 + r, c0 + c) else 0.0
        i += 1
      }
      val filtered = filterChunk(encode(plain, "float", 8, bigEndian = false), 8)
      o.pad8()
      val at = o.addr
      o.raw(filtered)
      (r0.toLong, c0.toLong, at, filtered.length.toLong)
    }
    // chunk B-tree: one leaf, node type 1
    o.pad8()
    val matBtree = o.addr
    o.raw("TREE".getBytes("US-ASCII"))
    o.u8(1); o.u8(0)
    o.u16(chunkAddrs.length)
    o.u64(Undef); o.u64(Undef)
    chunkAddrs.foreach { case (r0, c0, at, sz) =>
      o.u32(sz); o.u32(0L) // chunk size, filter mask
      o.u64(r0); o.u64(c0); o.u64(0L) // offsets + element-size 0
      o.u64(at)
    }
    // trailing key (the +1th): all-max sentinels are conventional;
    // the reader never consults leaf keys beyond the entry count
    o.u32(0L); o.u32(0L); o.u64(0L); o.u64(0L); o.u64(0L)

    def header(msgs: Seq[(Int, Array[Byte])]): Long =
      if (v2) writeV2Header(o, msgs) else writeV1Header(o, msgs)

    val f32Hdr = header(Seq(
      0x0001 -> dataspace1(Seq(24L)),
      0x0003 -> datatype("float", 4, bigEndian = false),
      0x0008 -> layoutContiguous(f32At, f32Sz)))
    val i64Hdr = header(Seq(
      0x0001 -> dataspace1(Seq(16L)),
      0x0003 -> datatype("int", 8, bigEndian = false),
      0x0008 -> layoutContiguous(i64At, i64Sz)))
    val ibeHdr = header(Seq(
      0x0001 -> dataspace1(Seq(8L)),
      0x0003 -> datatype("int", 4, bigEndian = true),
      0x0008 -> layoutContiguous(ibeAt, ibeSz)))
    val matHdr = header(Seq(
      0x0001 -> dataspace1(matDims),
      0x0003 -> datatype("float", 8, bigEndian = false),
      0x000B -> filterPipeline(8),
      0x0008 -> layoutChunked(matBtree, chunkDims, 8)))

    // subgroup g = { mat }
    val gHdr =
      if (v2) writeV2Header(o, Seq(
        0x0002 -> linkInfoMsg(),
        0x0006 -> linkMsg("mat", matHdr)))
      else {
        val (bt, hp) = writeV1Group(o, Seq("mat" -> matHdr))
        writeV1Header(o, Seq(0x0011 -> symbolTableMsg(bt, hp)))
      }

    // root group = { f32, g, i64, ibe }
    val rootLinks = Seq("f32" -> f32Hdr, "g" -> gHdr, "i64" -> i64Hdr, "ibe" -> ibeHdr)
    val rootHdr =
      if (v2) writeV2Header(o,
        (0x0002 -> linkInfoMsg()) +: rootLinks.map { case (n, a) => 0x0006 -> linkMsg(n, a) })
      else {
        val (bt, hp) = writeV1Group(o, rootLinks)
        writeV1Header(o, Seq(0x0011 -> symbolTableMsg(bt, hp)))
      }

    // patch the superblock
    val bytes = o.bos.toByteArray
    val sig = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1A, '\n')
    System.arraycopy(sig, 0, bytes, 0, 8)
    def put8(at: Int, v: Int): Unit = bytes(at) = v.toByte
    def put64(at: Int, v: Long): Unit =
      (0 until 8).foreach(i => bytes(at + i) = ((v >> (8 * i)) & 0xFF).toByte)
    def put32(at: Int, v: Long): Unit =
      (0 until 4).foreach(i => bytes(at + i) = ((v >> (8 * i)) & 0xFF).toByte)
    if (v2) {
      put8(8, 2) // superblock version
      put8(9, 8); put8(10, 8) // sizes
      put8(11, 0) // flags
      put64(12, 0L) // base address
      put64(20, Undef) // extension
      put64(28, bytes.length.toLong) // EOF
      put64(36, rootHdr)
      put32(44, Hdf5.lookup3(bytes, 0, 44, 0).toLong & 0xFFFFFFFFL)
    } else {
      put8(8, 0) // superblock version
      put8(9, 0); put8(10, 0); put8(12, 0) // freespace/root/shared versions
      put8(13, 8); put8(14, 8) // sizes
      put8(16, 4); put8(18, 16) // leaf k = 4, internal k = 16 (u16 LE)
      put64(24, 0L) // base
      put64(32, Undef) // free space
      put64(40, bytes.length.toLong) // EOF
      put64(48, Undef) // driver info
      // root symbol table entry at 56
      put64(56, 0L) // link name offset
      put64(64, rootHdr)
      put32(72, 0L) // cache type 0: no scratch caching (header route)
    }
    bytes
  }

  /** Gate packer: one .h5 payload per document, vintage cycling by
    * id parity (even → v0 superblock + v1 headers + symbol-table
    * groups, odd → v2 superblock + OHDR + link messages). */
  def packDocsHdf5(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Partitioning.fanOut(df.where(col(idCol).isNotNull))
      .select(coalesce(col(idCol).cast("long"), lit(0L)))
      .as[Long]
      .mapPartitions(_.map(id => (id, build(id, v2 = id % 2 == 1))))
      .toDF("id", "payload")
  }
}
