package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HDF5 reader — the scientific/embedding container rung of the
  * tensor tier (round 15 continuation): .h5/.hdf5 is how a large
  * share of published embedding shards, feature tables, and
  * scientific corpora actually ship. Everything below is from the
  * PUBLISHED "HDF5 File Format Specification Version 3.0"
  * (support.hdfgroup.org) alone; the reference repo has no analogue
  * (`main.py` is row-JSON only).
  *
  * Supported surface (refuse-don't-guess on everything else):
  *  - superblock versions 0/1 (root symbol-table entry) and 2/3
  *    (root object header address + Jenkins lookup3 checksum,
  *    VERIFIED), signature at offset 0 or the spec's doubling
  *    offsets (512, 1024, …);
  *  - object headers v1 (16-byte prefix, 8-padded messages) and v2
  *    (`OHDR`, variable chunk-0 width, per-chunk lookup3 checksum
  *    VERIFIED, `OCHK` continuations), continuation messages walked
  *    with a depth cap;
  *  - groups: v1 symbol tables (symbol-table message → v1 B-tree
  *    (`TREE` node type 0) → `SNOD` entries → local heap (`HEAP`)
  *    names) and v2 compact Link messages (hard links only); DENSE
  *    link storage (fractal heap) and soft/external links are
  *    skipped per entry, never guessed at;
  *  - datasets: dataspace v1/v2 (rank ≤ 4), datatype classes
  *    fixed-point (1/2/4/8 bytes, both byte orders, signed or not)
  *    and IEEE float (the f32/f64 bit layouts verified field by
  *    field — a nonstandard float REFUSES rather than misreads),
  *    data layout v3 compact / contiguous / chunked (v1 B-tree node
  *    type 1 chunk index, edge-chunk clipping), filter pipeline
  *    v1/v2 with deflate (in-repo [[GzipCodec]] zlib decode), shuffle (byte
  *    de-interleave), and fletcher32 (the HDF5 big-endian-word
  *    variant, VERIFIED then stripped) — unknown filter ids refuse
  *    the dataset by omission;
  *  - values surface as doubles (exact for f32/f64 and for the
  *    integer widths a double holds losslessly; int64 values beyond
  *    2^53 would round — the gate plants values far inside the safe
  *    range, and real embedding/feature data is f32/f64).
  *
  * Scale shape: pure bytes→rows functions inside `flatMap` (the
  * safetensors/NPZ/GGUF seam) — a shard decodes where it lands, no
  * driver involvement. Caps: 64 datasets, 2^22 elements, 2^16
  * chunks, group depth 6. Hostile bytes yield nothing (never throw).
  *
  * Fixture honesty (the [[Vorbis]]/[[Brotli]] discipline): no HDF5
  * implementation exists on this classpath or in the container, so
  * gate payloads come from the in-repo spec-legal [[Hdf5Write]]
  * builder, and the INDEPENDENCE pins live in Hdf5Spec: the lookup3
  * checksum against the algorithm's published test vectors, the
  * fletcher32 word-fold against a hand-computed vector, both
  * superblock vintages and both group machineries cross-decoded,
  * and corruption/truncation refusal ladders.
  */
object Hdf5 {

  private[ops] val Undef = -1L // 0xFFFF… in every address field

  final case class Dtype(kind: String, size: Int, bigEndian: Boolean,
      signed: Boolean) {
    def label: String = kind match {
      case "int" => s"${if (signed) "int" else "uint"}${size * 8}${if (bigEndian) "be" else "le"}"
      case _ => s"float${size * 8}${if (bigEndian) "be" else "le"}"
    }
  }
  final case class Dataset(path: String, dtype: Dtype, dims: Seq[Long],
      values: Array[Double])

  // ------------------------------------------------------------ checksums

  /** Jenkins lookup3 `hashlittle` (the HDF5 metadata checksum),
    * from the published algorithm. */
  private[graft] def lookup3(b: Array[Byte], off: Int, len: Int, init: Int): Int = {
    def rot(x: Int, k: Int): Int = (x << k) | (x >>> (32 - k))
    var a = 0xdeadbeef + len + init
    var bb = a
    var c = a
    var p = off
    var n = len
    def k32(at: Int): Int = (b(at) & 0xFF) | ((b(at + 1) & 0xFF) << 8) |
      ((b(at + 2) & 0xFF) << 16) | ((b(at + 3) & 0xFF) << 24)
    while (n > 12) {
      a += k32(p); bb += k32(p + 4); c += k32(p + 8)
      // mix
      a -= c; a ^= rot(c, 4); c += bb
      bb -= a; bb ^= rot(a, 6); a += c
      c -= bb; c ^= rot(bb, 8); bb += a
      a -= c; a ^= rot(c, 16); c += bb
      bb -= a; bb ^= rot(a, 19); a += c
      c -= bb; c ^= rot(bb, 4); bb += a
      p += 12; n -= 12
    }
    // tail (little-endian byte gather); n == 0 returns c unmixed
    if (n > 0) {
      if (n > 8) {
        var i = n - 1
        while (i >= 8) { c += (b(p + i) & 0xFF) << (8 * (i - 8)); i -= 1 }
      }
      if (n > 4) {
        var i = math.min(n, 8) - 1
        while (i >= 4) { bb += (b(p + i) & 0xFF) << (8 * (i - 4)); i -= 1 }
      }
      var i = math.min(n, 4) - 1
      while (i >= 0) { a += (b(p + i) & 0xFF) << (8 * i); i -= 1 }
      // final
      c ^= bb; c -= rot(bb, 14)
      a ^= c; a -= rot(c, 11)
      bb ^= a; bb -= rot(a, 25)
      c ^= bb; c -= rot(bb, 16)
      a ^= c; a -= rot(c, 4)
      bb ^= a; bb -= rot(a, 14)
      c ^= bb; c -= rot(bb, 24)
    }
    c
  }

  /** HDF5's fletcher32 (H5_checksum_fletcher32): big-endian 16-bit
    * words, 360-word inner blocks, one odd trailing byte high. */
  private[graft] def fletcher32(b: Array[Byte], off: Int, len: Int): Int = {
    var sum1 = 0L
    var sum2 = 0L
    var p = off
    var words = len / 2
    while (words > 0) {
      var t = math.min(words, 360)
      words -= t
      while (t > 0) {
        sum1 += ((b(p) & 0xFFL) << 8) | (b(p + 1) & 0xFFL)
        sum2 += sum1
        p += 2; t -= 1
      }
      sum1 = (sum1 & 0xFFFF) + (sum1 >>> 16)
      sum2 = (sum2 & 0xFFFF) + (sum2 >>> 16)
    }
    if ((len & 1) == 1) {
      sum1 += (b(p) & 0xFFL) << 8
      sum2 += sum1
      sum1 = (sum1 & 0xFFFF) + (sum1 >>> 16)
      sum2 = (sum2 & 0xFFFF) + (sum2 >>> 16)
    }
    sum1 = (sum1 & 0xFFFF) + (sum1 >>> 16)
    sum2 = (sum2 & 0xFFFF) + (sum2 >>> 16)
    ((sum2 << 16) | sum1).toInt
  }

  // ------------------------------------------------------------ byte access

  private object Bad extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bad(): Nothing = throw Bad

  private final class B(val b: Array[Byte]) {
    def u8(p: Long): Int = {
      if (p < 0 || p >= b.length) bad(); b(p.toInt) & 0xFF
    }
    def u16(p: Long): Int = u8(p) | (u8(p + 1) << 8)
    def u32(p: Long): Long = (u16(p) | (u16(p + 2).toLong << 16)) & 0xFFFFFFFFL
    def i64(p: Long): Long = u32(p) | (u32(p + 4) << 32)
    def slice(p: Long, n: Long): Array[Byte] = {
      if (p < 0 || n < 0 || p + n > b.length) bad()
      java.util.Arrays.copyOfRange(b, p.toInt, (p + n).toInt)
    }
  }

  private val Signature = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1A, '\n')

  // ------------------------------------------------------------ messages

  private final case class Msg(tpe: Int, data: Array[Byte])

  /** Parse one object header (v1 or v2) into its message list,
    * following continuations. Checksums on v2 chunks VERIFY. */
  private def messages(f: B, addr: Long): Seq[Msg] = {
    val out = Seq.newBuilder[Msg]
    var conts = List.empty[(Long, Long)] // (address, length) to walk
    var walked = 0

    def v1Block(p0: Long, len: Long, first: Boolean): Unit = {
      // v1: message headers are u16 type, u16 size, u8 flags, 3 pad
      var p = p0
      val end = p0 + len
      while (p + 8 <= end) {
        val tpe = f.u16(p)
        val size = f.u16(p + 2)
        if (p + 8 + size > end) bad()
        val data = f.slice(p + 8, size)
        if (tpe == 0x0010) { // continuation: u64 offset, u64 length
          if (size < 16) bad()
          val cb = new B(data)
          conts = (cb.i64(0), cb.i64(8)) :: conts
        } else if (tpe != 0x0000) out += Msg(tpe, data)
        p += 8 + size
      }
    }

    val ver = f.u8(addr)
    if (ver == 1) {
      // v1 prefix: version, reserved, u16 nmsgs, u32 refcount,
      // u32 header size, 4 bytes pad → messages at addr+16
      val headerSize = f.u32(addr + 8)
      v1Block(addr + 16, headerSize, first = true)
      while (conts.nonEmpty && walked < 16) {
        val (ca, cl) = conts.head; conts = conts.tail; walked += 1
        v1Block(ca, cl, first = false)
      }
    } else if (f.u8(addr) == 'O' && f.u8(addr + 1) == 'H' &&
        f.u8(addr + 2) == 'D' && f.u8(addr + 3) == 'R') {
      if (f.u8(addr + 4) != 2) bad()
      val flags = f.u8(addr + 5)
      var p = addr + 6
      if ((flags & 0x20) != 0) p += 16 // four timestamps
      if ((flags & 0x10) != 0) p += 4 // attr phase change
      val szW = 1 << (flags & 0x03)
      val chunk0 = szW match {
        case 1 => f.u8(p).toLong
        case 2 => f.u16(p).toLong
        case 4 => f.u32(p)
        case _ => f.i64(p)
      }
      p += szW
      // the checksum covers from OHDR through the end of messages
      val total = (p - addr) + chunk0 + 4
      v2ChunkAt(addr, total, p, chunk0, flags)
      def v2ChunkAt(blockStart: Long, blockLen: Long, msgStart: Long,
          msgLen: Long, fl: Int): Unit = {
        val stored = f.u32(blockStart + blockLen - 4).toInt
        if (lookup3(f.b, blockStart.toInt, (blockLen - 4).toInt, 0) != stored) bad()
        val msgHead = if ((fl & 0x04) != 0) 6 else 4
        var q = msgStart
        val end = msgStart + msgLen
        while (q + msgHead <= end) {
          val tpe = f.u8(q)
          val size = f.u16(q + 1)
          if (q + msgHead + size > end) bad()
          val data = f.slice(q + msgHead, size)
          if (tpe == 0x0010) {
            if (size < 16) bad()
            val cb = new B(data)
            conts = (cb.i64(0), cb.i64(8)) :: conts
          } else if (tpe != 0x0000) out += Msg(tpe, data)
          q += msgHead + size
        }
      }
      while (conts.nonEmpty && walked < 16) {
        val (ca, cl) = conts.head; conts = conts.tail; walked += 1
        // OCHK block: signature + messages + checksum
        val stored = f.u32(ca + cl - 4).toInt
        if (!(f.u8(ca) == 'O' && f.u8(ca + 1) == 'C' && f.u8(ca + 2) == 'H' && f.u8(ca + 3) == 'K')) bad()
        if (lookup3(f.b, ca.toInt, (cl - 4).toInt, 0) != stored) bad()
        val msgHead = if ((flags & 0x04) != 0) 6 else 4
        var q = ca + 4
        val end = ca + cl - 4
        while (q + msgHead <= end) {
          val tpe = f.u8(q)
          val size = f.u16(q + 1)
          if (q + msgHead + size > end) bad()
          val data = f.slice(q + msgHead, size)
          if (tpe == 0x0010) {
            if (size < 16) bad()
            val cb = new B(data)
            conts = (cb.i64(0), cb.i64(8)) :: conts
          } else if (tpe != 0x0000) out += Msg(tpe, data)
          q += msgHead + size
        }
      }
    } else bad()
    out.result()
  }

  // ------------------------------------------------------------ message decode

  private def dataspaceDims(m: Array[Byte]): Seq[Long] = {
    val b = new B(m)
    b.u8(0) match {
      case 1 =>
        val rank = b.u8(1)
        if (rank > 4) bad()
        // v1: version, rank, flags, reserved ×5, dims
        (0 until rank).map(i => b.i64(8 + 8L * i))
      case 2 =>
        val rank = b.u8(1)
        if (rank > 4) bad()
        // v2: version, rank, flags, type, dims
        (0 until rank).map(i => b.i64(4 + 8L * i))
      case _ => bad()
    }
  }

  /** Datatype → our Dtype; None = a class/layout we refuse. */
  private def datatypeOf(m: Array[Byte]): Option[Dtype] = {
    val b = new B(m)
    val clsVer = b.u8(0)
    val cls = clsVer & 0x0F
    val bits0 = b.u8(1)
    val size = b.u32(4).toInt
    cls match {
      case 0 => // fixed-point: bit0 order, bit3 signed
        if (size != 1 && size != 2 && size != 4 && size != 8) return None
        // properties: u16 bit offset, u16 precision — must be the
        // full width at offset 0 (anything else is a packed layout
        // we will not guess at)
        if (b.u16(8) != 0 || b.u16(10) != size * 8) return None
        Some(Dtype("int", size, (bits0 & 1) != 0, (bits0 & 0x08) != 0))
      case 1 => // float: verify the exact IEEE layout
        if (size != 4 && size != 8) return None
        val sign = b.u8(2) // sign location (byte 2 of the bit field)
        val bitOff = b.u16(8); val prec = b.u16(10)
        val expLoc = b.u8(12); val expSz = b.u8(13)
        val manLoc = b.u8(14); val manSz = b.u8(15)
        val bias = b.u32(16)
        val ok =
          if (size == 4) bitOff == 0 && prec == 32 && sign == 31 &&
            expLoc == 23 && expSz == 8 && manLoc == 0 && manSz == 23 && bias == 127L
          else bitOff == 0 && prec == 64 && sign == 63 &&
            expLoc == 52 && expSz == 11 && manLoc == 0 && manSz == 52 && bias == 1023L
        if (!ok) return None
        Some(Dtype("float", size, (bits0 & 1) != 0, signed = true))
      case _ => None // strings, compounds, vlen, …: refuse by omission
    }
  }

  private final case class Layout(cls: Int, addr: Long, size: Long,
      compact: Array[Byte], chunkDims: Seq[Int], btree: Long)

  private def layoutOf(m: Array[Byte]): Layout = {
    val b = new B(m)
    if (b.u8(0) != 3) bad() // layout message v3 only
    b.u8(1) match {
      case 0 => // compact: u16 size, data
        val n = b.u16(2)
        Layout(0, Undef, n, b.slice(4, n), Seq.empty, Undef)
      case 1 => // contiguous: address, size
        Layout(1, b.i64(2), b.i64(10), Array.emptyByteArray, Seq.empty, Undef)
      case 2 => // chunked: u8 dimensionality (rank+1), btree addr, u32 dims
        val dim = b.u8(2)
        if (dim < 2 || dim > 5) bad()
        val bt = b.i64(3)
        val dims = (0 until dim).map(i => b.u32(11 + 4L * i).toInt)
        Layout(2, Undef, Undef, Array.emptyByteArray, dims, bt)
      case _ => bad()
    }
  }

  private final case class Filter(id: Int, clientData: Seq[Long])

  private def filtersOf(m: Array[Byte]): Seq[Filter] = {
    val b = new B(m)
    val out = Seq.newBuilder[Filter]
    b.u8(0) match {
      case 1 =>
        val n = b.u8(1)
        var p = 8L // version, nfilters, u16 + u32 reserved
        (0 until n).foreach { _ =>
          val id = b.u16(p)
          val nameLen = b.u16(p + 2)
          val nClient = b.u16(p + 6)
          p += 8 + nameLen
          val cd = (0 until nClient).map(i => b.u32(p + 4L * i))
          p += 4L * nClient
          if (nClient % 2 == 1) p += 4 // pad to multiple of 8
          out += Filter(id, cd)
        }
      case 2 =>
        val n = b.u8(1)
        var p = 2L
        (0 until n).foreach { _ =>
          val id = b.u16(p)
          p += 2
          val nameLen = if (id >= 256) { val v = b.u16(p); p += 2; v } else 0
          val flags = b.u16(p); p += 2
          val nClient = b.u16(p); p += 2
          p += nameLen
          val cd = (0 until nClient).map(i => b.u32(p + 4L * i))
          p += 4L * nClient
          out += Filter(id, cd)
          val _ = flags
        }
      case _ => bad()
    }
    out.result()
  }

  // ------------------------------------------------------------ groups

  /** (name, object header address) links of a group header. */
  private def linksOf(f: B, msgs: Seq[Msg]): Seq[(String, Long)] = {
    val out = Seq.newBuilder[(String, Long)]
    msgs.foreach { m =>
      m.tpe match {
        case 0x0011 => // symbol table: btree + heap
          val b = new B(m.data)
          out ++= symbolTableLinks(f, b.i64(0), b.i64(8))
        case 0x0006 => // link message
          val b = new B(m.data)
          if (b.u8(0) != 1) bad()
          val flags = b.u8(1)
          var p = 2L
          val ltype = if ((flags & 0x08) != 0) { val v = b.u8(p); p += 1; v } else 0
          if ((flags & 0x04) != 0) p += 8 // creation order
          if ((flags & 0x10) != 0) p += 1 // charset
          val lenW = 1 << (flags & 0x03)
          val nameLen = lenW match {
            case 1 => b.u8(p).toLong
            case 2 => b.u16(p).toLong
            case 4 => b.u32(p)
            case _ => b.i64(p)
          }
          p += lenW
          if (nameLen > 1024) bad()
          val name = new String(b.slice(p, nameLen),
            java.nio.charset.StandardCharsets.UTF_8)
          p += nameLen
          if (ltype == 0) out += ((name, b.i64(p))) // hard link
        // soft/external links: skipped, never guessed
        case 0x0002 => // link info: dense storage refuses the group
          val b = new B(m.data)
          val flags = b.u8(1)
          var p = 2L
          if ((flags & 0x01) != 0) p += 8
          val fheap = b.i64(p)
          if (fheap != Undef) bad() // dense (fractal heap) links
        case _ => ()
      }
    }
    out.result()
  }

  private def symbolTableLinks(f: B, btreeAddr: Long, heapAddr: Long): Seq[(String, Long)] = {
    // local heap: "HEAP", version, data segment address at +24
    if (!(f.u8(heapAddr) == 'H' && f.u8(heapAddr + 1) == 'E' &&
      f.u8(heapAddr + 2) == 'A' && f.u8(heapAddr + 3) == 'P')) bad()
    val heapData = f.i64(heapAddr + 24)
    def nameAt(off: Long): String = {
      var e = heapData + off
      val start = e
      while (f.u8(e) != 0 && e - start < 1024) e += 1
      new String(f.slice(start, e - start), java.nio.charset.StandardCharsets.UTF_8)
    }
    val out = Seq.newBuilder[(String, Long)]
    def walkNode(addr: Long, depth: Int): Unit = {
      if (depth > 8) bad()
      if (f.u8(addr) == 'T' && f.u8(addr + 1) == 'R' &&
        f.u8(addr + 2) == 'E' && f.u8(addr + 3) == 'E') {
        if (f.u8(addr + 4) != 0) bad() // node type 0 = group
        val level = f.u8(addr + 5)
        val n = f.u16(addr + 6)
        if (n > 4096) bad()
        // keys/children: key(len=8) child(8) … key; children at
        // addr + 24 + 8 + 16*i
        (0 until n).foreach { i =>
          val child = f.i64(addr + 24 + 8 + 16L * i)
          if (level == 0) walkSnod(child) else walkNode(child, depth + 1)
        }
      } else walkSnod(addr)
    }
    def walkSnod(addr: Long): Unit = {
      if (!(f.u8(addr) == 'S' && f.u8(addr + 1) == 'N' &&
        f.u8(addr + 2) == 'O' && f.u8(addr + 3) == 'D')) bad()
      val n = f.u16(addr + 6)
      if (n > 4096) bad()
      (0 until n).foreach { i =>
        val e = addr + 8 + 40L * i
        out += ((nameAt(f.i64(e)), f.i64(e + 8)))
      }
    }
    walkNode(btreeAddr, 0)
    out.result()
  }

  // ------------------------------------------------------------ data read

  private def applyFilters(chunk: Array[Byte], filters: Seq[Filter],
      mask: Long, elemSize: Int): Array[Byte] = {
    var data = chunk
    // pipeline order is application order on WRITE; reverse on read.
    // filter i of the pipeline is skipped when mask bit i is set.
    filters.zipWithIndex.reverse.foreach { case (flt, i) =>
      if ((mask & (1L << i)) == 0) {
        flt.id match {
          case 1 => // deflate (zlib wrapper)
            data = GzipCodec.unzlib(data).getOrElse(bad())
          case 2 => // shuffle: de-interleave byte planes
            val sz = flt.clientData.headOption.map(_.toInt).getOrElse(elemSize)
            if (sz > 1 && data.length % sz == 0) {
              val n = data.length / sz
              val outB = new Array[Byte](data.length)
              var j = 0
              while (j < sz) {
                var k = 0
                while (k < n) { outB(k * sz + j) = data(j * n + k); k += 1 }
                j += 1
              }
              data = outB
            }
          case 3 => // fletcher32: verify then strip the 4-byte trailer
            if (data.length < 4) bad()
            val stored = (data(data.length - 4) & 0xFFL) |
              ((data(data.length - 3) & 0xFFL) << 8) |
              ((data(data.length - 2) & 0xFFL) << 16) |
              ((data(data.length - 1) & 0xFFL) << 24)
            if ((fletcher32(data, 0, data.length - 4) & 0xFFFFFFFFL) != stored) bad()
            data = java.util.Arrays.copyOfRange(data, 0, data.length - 4)
          case _ => bad() // unknown filter: refuse
        }
      }
    }
    data
  }

  private def decodeValues(raw: Array[Byte], dt: Dtype, n: Int): Array[Double] = {
    if (raw.length < n.toLong * dt.size) bad()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val p = i * dt.size
      var v = 0L
      if (dt.bigEndian) {
        var j = 0
        while (j < dt.size) { v = (v << 8) | (raw(p + j) & 0xFFL); j += 1 }
      } else {
        var j = dt.size - 1
        while (j >= 0) { v = (v << 8) | (raw(p + j) & 0xFFL); j -= 1 }
      }
      out(i) =
        if (dt.kind == "float") {
          if (dt.size == 4) java.lang.Float.intBitsToFloat(v.toInt).toDouble
          else java.lang.Double.longBitsToDouble(v)
        } else if (dt.signed) {
          val shift = 64 - dt.size * 8
          ((v << shift) >> shift).toDouble
        } else v.toDouble
      i += 1
    }
    out
  }

  private def readDataset(f: B, path: String, msgs: Seq[Msg]): Option[Dataset] = {
    val dimsM = msgs.find(_.tpe == 0x0001).getOrElse(return None)
    val dtM = msgs.find(_.tpe == 0x0003).getOrElse(return None)
    val layM = msgs.find(_.tpe == 0x0008).getOrElse(return None)
    val dims = dataspaceDims(dimsM.data)
    val dt = datatypeOf(dtM.data).getOrElse(return None)
    val lay = layoutOf(layM.data)
    val filters = msgs.find(_.tpe == 0x000B).map(m => filtersOf(m.data))
      .getOrElse(Seq.empty)
    val n0 = dims.foldLeft(1L)(_ * _)
    if (n0 < 0 || n0 > (1L << 22)) bad()
    val n = n0.toInt
    lay.cls match {
      case 0 =>
        if (filters.nonEmpty) bad() // compact data is never filtered
        Some(Dataset(path, dt, dims, decodeValues(lay.compact, dt, n)))
      case 1 =>
        if (filters.nonEmpty) bad() // contiguous v3 layout is unfiltered
        if (lay.addr == Undef) return None // no data allocated
        Some(Dataset(path, dt, dims, decodeValues(f.slice(lay.addr, lay.size), dt, n)))
      case 2 =>
        val rank = dims.length
        if (lay.chunkDims.length != rank + 1) bad()
        if (lay.chunkDims.last != dt.size) bad()
        val chunkDims = lay.chunkDims.dropRight(1)
        val chunkElems = chunkDims.foldLeft(1L)(_ * _)
        if (chunkElems <= 0 || chunkElems > (1L << 20)) bad()
        val out = new Array[Double](n)
        var chunks = 0
        // copy the in-bounds region of a (possibly edge) chunk into
        // the row-major output — edge chunks are stored full-size
        // with padding past the dataset bounds, clipped here
        def place(offsets: Seq[Long], vals: Array[Double]): Unit = {
          def rec(d: Int, outIdx: Long, chIdx: Long): Unit = {
            if (d == rank) out(outIdx.toInt) = vals(chIdx.toInt)
            else {
              val lim = math.min(chunkDims(d).toLong, dims(d) - offsets(d))
              val outStride = (d + 1 until rank).foldLeft(1L)(_ * dims(_))
              val chStride = (d + 1 until rank).foldLeft(1L)((a, j) => a * chunkDims(j))
              var i = 0L
              while (i < lim) {
                rec(d + 1, outIdx + (offsets(d) + i) * outStride, chIdx + i * chStride)
                i += 1
              }
            }
          }
          rec(0, 0L, 0L)
        }
        def walk(addr: Long, depth: Int): Unit = {
          if (depth > 8) bad()
          if (!(f.u8(addr) == 'T' && f.u8(addr + 1) == 'R' &&
            f.u8(addr + 2) == 'E' && f.u8(addr + 3) == 'E')) bad()
          if (f.u8(addr + 4) != 1) bad() // node type 1 = raw data chunks
          val level = f.u8(addr + 5)
          val cnt = f.u16(addr + 6)
          if (cnt > 4096) bad()
          // key: u32 size, u32 mask, u64×(rank+1) offsets; then child
          val keyLen = 8 + 8L * (rank + 1)
          var p = addr + 24
          (0 until cnt).foreach { _ =>
            val size = f.u32(p)
            val mask = f.u32(p + 4)
            val offs = (0 until rank).map(i => f.i64(p + 8 + 8L * i))
            val child = f.i64(p + keyLen)
            if (level == 0) {
              chunks += 1
              if (chunks > (1 << 16)) bad()
              val raw = applyFilters(f.slice(child, size), filters, mask, dt.size)
              place(offs, decodeValues(raw, dt, chunkElems.toInt))
            } else walk(child, depth + 1)
            p += keyLen + 8
          }
        }
        if (lay.btree != Undef) walk(lay.btree, 0)
        Some(Dataset(path, dt, dims, out))
      case _ => bad()
    }
  }

  // ------------------------------------------------------------ file walk

  /** Parse a complete HDF5 file: every supported dataset reachable
    * from the root group (depth ≤ 6), path-sorted. None on anything
    * malformed or an unsupported superblock. */
  def parse(bytes: Array[Byte]): Option[Seq[Dataset]] =
    try {
      val f = new B(bytes)
      // signature at 0 or the doubling offsets
      var sig = -1L
      var cand = 0L
      while (sig < 0 && cand + 8 <= bytes.length) {
        if ((0 until 8).forall(i => bytes((cand + i).toInt) == Signature(i))) sig = cand
        else cand = if (cand == 0) 512 else cand * 2
      }
      if (sig < 0) return None
      val ver = f.u8(sig + 8)
      val rootAddr: Long = ver match {
        case 0 | 1 =>
          if (f.u8(sig + 13) != 8 || f.u8(sig + 14) != 8) bad() // offsets/lengths = 8
          // root symbol table entry: after 24 bytes (v0) of fields +
          // base/freespace/eof/driver addresses
          val entryAt = sig + (if (ver == 0) 24L else 28L) + 32L
          f.i64(entryAt + 8) // object header address
        case 2 | 3 =>
          if (f.u8(sig + 9) != 8 || f.u8(sig + 10) != 8) bad()
          val stored = f.u32(sig + 44).toInt
          if (lookup3(f.b, sig.toInt, 44, 0) != stored) bad()
          f.i64(sig + 36)
        case _ => bad()
      }
      val out = Seq.newBuilder[Dataset]
      var visited = Set.empty[Long]
      var count = 0
      def visit(prefix: String, addr: Long, depth: Int): Unit = {
        if (depth > 6 || visited.contains(addr)) return
        visited += addr
        val msgs = messages(f, addr)
        val isDataset = msgs.exists(_.tpe == 0x0008)
        if (isDataset) {
          count += 1
          if (count > 64) bad()
          readDataset(f, prefix, msgs).foreach(out += _)
        } else {
          linksOf(f, msgs).foreach { case (name, a) =>
            visit(s"$prefix/$name", a, depth + 1)
          }
        }
      }
      visit("", rootAddr, 0)
      Some(out.result().sortBy(_.path))
    } catch {
      case Bad | _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException => None
    }

  // ------------------------------------------------------------ spark seam

  /** One row per supported dataset: (id, path, dtype, n_values,
    * values). Hostile bytes emit nothing — the GGUF/safetensors
    * contract. Scan-local flatMap. */
  def decodeDatasets(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        parse(if (payload == null) Array.emptyByteArray else payload)
          .getOrElse(Seq.empty)
          .map(d => (id, d.path, d.dtype.label,
            d.dims.mkString("[", ",", "]"), d.values.length.toLong, d.values))
      }
      .toDF("id", "path", "dtype", "dims", "n_values", "values")
  }
}
