package graft.catalog

import java.nio.file.{Files, Path}
import scala.collection.mutable.ArrayBuffer

import graft.GraftAnalysisException

/** Minimal pure-Scala SQLite 3 file codec for the metadata catalog.
  *
  * The reference's entire control plane is five SQLite tables
  * (main.py:32-80) reached through `$PIPELINE_DB`; drop-in parity means
  * reading and writing that `.db` file. This container has no SQLite
  * JDBC driver (zero egress), so this implements the documented public
  * file format (https://www.sqlite.org/fileformat2.html) directly —
  * feasible and robust here because the catalog is control-plane-tiny
  * (KBs): the writer rebuilds the whole file per mutation (like a
  * checkpointed WAL would) instead of editing b-trees in place.
  *
  * Supported subset, deliberately scoped to the catalog workload:
  *  - table b-trees: leaf + one interior level (≈ tens of thousands of
  *    KB-sized rows per table — orders of magnitude above a control
  *    plane's needs; exceeding it is an explicit error, not corruption);
  *  - cell payload overflow chains (configs can exceed a 4 KiB page);
  *  - serial types NULL / integers / float64 / TEXT / BLOB;
  *  - reader skips index b-trees (`sqlite_autoindex_*`); the writer
  *    declares no PRIMARY KEY in the stored `CREATE TABLE` sql so real
  *    SQLite opening our file never expects an index we didn't build —
  *    the one declared deviation from the reference DDL (main.py:35),
  *    which its own reader/writer code never relies on.
  *
  * WAL note: SQLite checkpoints the WAL into the main file when the
  * last connection closes, so reading the main file sees the
  * reference's committed state.
  */
object SqliteFile {

  sealed trait SqlValue
  case object SNull extends SqlValue
  final case class SInt(v: Long) extends SqlValue
  final case class SReal(v: Double) extends SqlValue
  final case class SText(v: String) extends SqlValue
  final case class SBlob(v: Array[Byte]) extends SqlValue

  private val PageSize = 4096
  private val Magic = "SQLite format 3\u0000".getBytes("ISO-8859-1")

  // ------------------------------------------------------------ read

  /** All table-type b-trees: name → rows (column order = DDL order).
    * The implicit rowid is not materialized (catalog tables never
    * alias it: all reference PKs are TEXT, main.py:35-80).
    */
  def read(path: Path): Map[String, Seq[Seq[SqlValue]]] =
    readTables(path).map(t => t.name -> t.rows).toMap

  /** Same scan, keeping each table's sqlite_master CREATE SQL — the
    * only place a SQLite file records column names (data-plane readers
    * need them; the catalog knows its own layouts).
    */
  def readTables(path: Path): Seq[Table] = {
    val b = Files.readAllBytes(path)
    if (b.length < 100 || !b.slice(0, 16).sameElements(Magic))
      throw new GraftAnalysisException(s"$path is not a SQLite database")
    val declared = ((b(16) & 0xff) << 8) | (b(17) & 0xff)
    val pageSize = if (declared == 1) 65536 else declared
    val usable = pageSize - (b(20) & 0xff)
    val master = readBtree(b, pageSize, usable, 1)
    master.collect {
      case Seq(SText("table"), SText(name), _, rootV, sqlV, _*) =>
        val root = rootV match {
          case SInt(r) => r.toInt
          case other => throw new GraftAnalysisException(s"bad rootpage for $name: $other")
        }
        val sql = sqlV match {
          case SText(s) => s
          case _        => ""
        }
        Table(name, sql, readBtree(b, pageSize, usable, root))
    }
  }

  private def u16(b: Array[Byte], o: Int): Int = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) | ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** (value, bytes consumed) of a SQLite varint at `o`. */
  private def varint(b: Array[Byte], o: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val x = b(o + i)
      v = (v << 7) | (x & 0x7fL)
      if ((x & 0x80) == 0) return (v, i + 1)
      i += 1
    }
    ((v << 8) | (b(o + 8) & 0xffL), 9)
  }

  private def readBtree(b: Array[Byte], pageSize: Int, usable: Int, root: Int): Seq[Seq[SqlValue]] = {
    val rows = ArrayBuffer.empty[Seq[SqlValue]]
    def walk(pageNo: Int): Unit = {
      val base = (pageNo - 1) * pageSize
      val hdr = base + (if (pageNo == 1) 100 else 0)
      val ptype = b(hdr) & 0xff
      val ncells = u16(b, hdr + 3)
      ptype match {
        case 5 => // interior table page: children left-to-right, then rightmost
          (0 until ncells).foreach { i =>
            val cell = base + u16(b, hdr + 12 + 2 * i)
            walk(u32(b, cell).toInt)
          }
          walk(u32(b, hdr + 8).toInt)
        case 13 => // leaf table page
          (0 until ncells).foreach { i =>
            var p = base + u16(b, hdr + 8 + 2 * i)
            val (plen, n1) = varint(b, p); p += n1
            val (_, n2) = varint(b, p); p += n2 // rowid
            rows += decodeRecord(payloadBytes(b, p, plen.toInt, pageSize, usable))
          }
        case other =>
          throw new GraftAnalysisException(s"unsupported sqlite page type $other on page $pageNo")
      }
    }
    walk(root)
    rows.toSeq
  }

  /** Max payload stored locally in a table-leaf cell. */
  private def maxLocal(usable: Int): Int = usable - 35
  private def minLocal(usable: Int): Int = (usable - 12) * 32 / 255 - 23
  /** Bytes of an overflowing payload kept in the cell (fileformat2 §B-tree Pages). */
  private def localSize(plen: Int, usable: Int): Int = {
    val x = maxLocal(usable)
    if (plen <= x) plen
    else {
      val m = minLocal(usable)
      val k = m + (plen - m) % (usable - 4)
      if (k <= x) k else m
    }
  }

  private def payloadBytes(b: Array[Byte], at: Int, plen: Int, pageSize: Int, usable: Int): Array[Byte] = {
    val local = localSize(plen, usable)
    if (local == plen) return java.util.Arrays.copyOfRange(b, at, at + plen)
    val out = new Array[Byte](plen)
    System.arraycopy(b, at, out, 0, local)
    var filled = local
    var page = u32(b, at + local).toInt
    while (page != 0 && filled < plen) {
      val base = (page - 1) * pageSize
      val take = math.min(usable - 4, plen - filled)
      System.arraycopy(b, base + 4, out, filled, take)
      filled += take
      page = u32(b, base).toInt
    }
    if (filled != plen)
      throw new GraftAnalysisException(s"truncated sqlite overflow chain ($filled of $plen bytes)")
    out
  }

  private def decodeRecord(rec: Array[Byte]): Seq[SqlValue] = {
    val (hdrLen, n0) = varint(rec, 0)
    val types = ArrayBuffer.empty[Long]
    var p = n0
    while (p < hdrLen) {
      val (t, n) = varint(rec, p); types += t; p += n
    }
    var d = hdrLen.toInt
    types.toSeq.map { t =>
      def int(n: Int): SqlValue = {
        var v = if ((rec(d) & 0x80) != 0) -1L else 0L // sign-extend
        (0 until n).foreach(i => v = (v << 8) | (rec(d + i) & 0xffL))
        d += n
        SInt(v)
      }
      t match {
        case 0 => SNull
        case 1 => int(1)
        case 2 => int(2)
        case 3 => int(3)
        case 4 => int(4)
        case 5 => int(6)
        case 6 => int(8)
        case 7 =>
          var bits = 0L
          (0 until 8).foreach(i => bits = (bits << 8) | (rec(d + i) & 0xffL))
          d += 8
          SReal(java.lang.Double.longBitsToDouble(bits))
        case 8 => SInt(0L)
        case 9 => SInt(1L)
        case n if n >= 13 && n % 2 == 1 =>
          val len = ((n - 13) / 2).toInt
          val s = new String(rec, d, len, "UTF-8"); d += len
          SText(s)
        case n if n >= 12 && n % 2 == 0 =>
          val len = ((n - 12) / 2).toInt
          val v = java.util.Arrays.copyOfRange(rec, d, d + len); d += len
          SBlob(v)
        case other => throw new GraftAnalysisException(s"unsupported sqlite serial type $other")
      }
    }
  }

  // ----------------------------------------------------------- write

  final case class Table(name: String, createSql: String, rows: Seq[Seq[SqlValue]])

  /** Serialize a full database (rebuild-on-write). Tables get rowids
    * 1..n in row order.
    */
  def write(path: Path, tables: Seq[Table]): Unit = {
    val usable = PageSize // no reserved bytes
    // ---- encode all table rows to records, pack into leaves, count pages
    final case class Cell(head: Array[Byte], local: Array[Byte], overflow: Seq[Array[Byte]]) {
      def len: Int = head.length + local.length + (if (overflow.nonEmpty) 4 else 0)
    }
    def mkCells(rows: Seq[Seq[SqlValue]]): Seq[Cell] =
      rows.zipWithIndex.map { case (row, i) =>
        val rec = encodeRecord(row)
        val local = localSize(rec.length, usable)
        val head = varintBytes(rec.length.toLong) ++ varintBytes((i + 1).toLong)
        if (local == rec.length) Cell(head, rec, Nil)
        else {
          val chunks = rec.drop(local).grouped(usable - 4).toSeq
          Cell(head, rec.take(local), chunks)
        }
      }
    def packLeaves(cells: Seq[Cell]): Seq[Seq[Cell]] = {
      val leaves = ArrayBuffer.empty[Seq[Cell]]
      var cur = ArrayBuffer.empty[Cell]
      var used = 8 // leaf header
      cells.foreach { c =>
        val need = 2 + c.len
        if (8 + need > usable)
          throw new GraftAnalysisException("sqlite writer: single cell exceeds page capacity")
        if (cur.nonEmpty && used + need > usable) {
          leaves += cur.toSeq; cur = ArrayBuffer.empty[Cell]; used = 8
        }
        cur += c; used += need
      }
      leaves += cur.toSeq
      leaves.toSeq
    }

    val packed = tables.map(t => packLeaves(mkCells(t.rows)))
    // page layout: [1: master] [per table: root(+leaves) then overflow pages]
    var next = 2
    val roots = packed.map { leaves =>
      val root = next
      val interior = if (leaves.length > 1) 1 else 0
      val nOverflow = leaves.iterator.flatten.map(_.overflow.length).sum
      next += interior + leaves.length + nOverflow
      root
    }
    // interior page holds ≥ (usable-12)/15 ≈ 270 child cells at 4 KiB
    if (packed.exists(_.length > (usable - 12) / 15))
      throw new GraftAnalysisException("sqlite writer: table too large for one interior level")

    val masterRows = tables.zip(roots).map { case (t, root) =>
      Seq(SText("table"), SText(t.name), SText(t.name), SInt(root.toLong), SText(t.createSql))
    }
    val masterCells = mkCells(masterRows)
    if (100 + 8 + masterCells.map(2 + _.len).sum > PageSize)
      throw new GraftAnalysisException("sqlite writer: schema must fit page 1")

    val nPages = next - 1
    val out = new Array[Byte](nPages * PageSize)

    def writeLeaf(pageNo: Int, cells: Seq[Cell], hdrOff: Int, overflowPageOf: Cell => Int): Unit = {
      val base = (pageNo - 1) * PageSize
      val hdr = base + hdrOff
      out(hdr) = 13
      put16(out, hdr + 1, 0)
      put16(out, hdr + 3, cells.length)
      var content = PageSize
      cells.zipWithIndex.foreach { case (c, i) =>
        content -= c.len
        put16(out, hdr + 8 + 2 * i, content)
        var p = base + content
        System.arraycopy(c.head, 0, out, p, c.head.length); p += c.head.length
        System.arraycopy(c.local, 0, out, p, c.local.length); p += c.local.length
        if (c.overflow.nonEmpty) put32(out, p, overflowPageOf(c))
      }
      put16(out, hdr + 5, content)
      out(hdr + 7) = 0
    }

    // master on page 1 (b-tree header at offset 100)
    writeLeaf(1, masterCells, 100, _ => 0)

    tables.indices.foreach { ti =>
      val leaves = packed(ti)
      val root = roots(ti)
      val interior = if (leaves.length > 1) 1 else 0
      val leafPages = leaves.indices.map(i => root + interior + i)
      // overflow pages appended after this table's leaves
      var ovNext = root + interior + leaves.length
      val ovStart = scala.collection.mutable.Map.empty[Cell, Int]
      leaves.iterator.flatten.filter(_.overflow.nonEmpty).foreach { c =>
        ovStart(c) = ovNext
        c.overflow.zipWithIndex.foreach { case (chunk, ci) =>
          val page = ovNext; ovNext += 1
          val base = (page - 1) * PageSize
          put32(out, base, if (ci == c.overflow.length - 1) 0 else page + 1)
          System.arraycopy(chunk, 0, out, base + 4, chunk.length)
        }
      }
      leaves.zipWithIndex.foreach { case (cells, li) =>
        writeLeaf(leafPages(li), cells, 0, ovStart(_))
      }
      if (interior == 1) {
        // one interior level: cells point at all leaves but the last,
        // keyed by each leaf's max rowid; rightmost pointer = last leaf
        val base = (root - 1) * PageSize
        out(base) = 5
        put16(out, base + 1, 0)
        put16(out, base + 3, leaves.length - 1)
        put32(out, base + 8, leafPages.last)
        var content = PageSize
        var rowid = 0L
        leaves.init.zipWithIndex.foreach { case (cells, i) =>
          rowid += cells.length // max rowid in leaf i (rowids are 1..n in order)
          val cell = put32bytes(leafPages(i)) ++ varintBytes(rowid)
          content -= cell.length
          put16(out, base + 12 + 2 * i, content)
          System.arraycopy(cell, 0, out, base + content, cell.length)
        }
        rowid += leaves.last.length
        put16(out, base + 5, content)
        out(base + 7) = 0
      }
    }

    // ---- 100-byte database header
    System.arraycopy(Magic, 0, out, 0, 16)
    put16(out, 16, PageSize)
    out(18) = 1; out(19) = 1 // rollback-journal read/write version
    out(20) = 0 // reserved per page
    out(21) = 64; out(22) = 32; out(23) = 32
    put32(out, 24, 1) // change counter
    put32(out, 28, nPages)
    put32(out, 40, 1) // schema cookie
    put32(out, 44, 4) // schema format
    put32(out, 56, 1) // text encoding: UTF-8
    put32(out, 92, 1) // version-valid-for = change counter
    put32(out, 96, 3045000) // written-by version stamp

    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.write(tmp, out)
    Files.move(tmp, path, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def put16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = ((v >> 8) & 0xff).toByte; b(o + 1) = (v & 0xff).toByte
  }
  private def put32(b: Array[Byte], o: Int, v: Long): Unit = {
    b(o) = ((v >> 24) & 0xff).toByte; b(o + 1) = ((v >> 16) & 0xff).toByte
    b(o + 2) = ((v >> 8) & 0xff).toByte; b(o + 3) = (v & 0xff).toByte
  }
  private def put32bytes(v: Long): Array[Byte] = {
    val a = new Array[Byte](4); put32(a, 0, v); a
  }

  private def varintBytes(v0: Long): Array[Byte] = {
    require(v0 >= 0, "negative varint unsupported (rowids/lengths only)")
    if (v0 == 0) return Array(0.toByte)
    var v = v0
    val parts = ArrayBuffer.empty[Byte]
    while (v != 0) { parts += (v & 0x7f).toByte; v >>>= 7 }
    val a = parts.reverse.toArray
    (0 until a.length - 1).foreach(i => a(i) = (a(i) | 0x80).toByte)
    a
  }

  private def encodeRecord(row: Seq[SqlValue]): Array[Byte] = {
    val bodies = row.map {
      case SNull => (0L, Array.empty[Byte])
      case SInt(0) => (8L, Array.empty[Byte])
      case SInt(1) => (9L, Array.empty[Byte])
      case SInt(v) =>
        val n = intWidth(v)
        val a = new Array[Byte](n)
        (0 until n).foreach(i => a(i) = ((v >> (8 * (n - 1 - i))) & 0xff).toByte)
        (Seq(1, 2, 3, 4, 6, 8).indexOf(n) + 1L, a)
      case SReal(d) =>
        val bits = java.lang.Double.doubleToLongBits(d)
        val a = new Array[Byte](8)
        (0 until 8).foreach(i => a(i) = ((bits >> (8 * (7 - i))) & 0xff).toByte)
        (7L, a)
      case SText(s) =>
        val a = s.getBytes("UTF-8")
        (13L + 2L * a.length, a)
      case SBlob(a) => (12L + 2L * a.length, a)
    }
    val typeBytes = bodies.map(b => varintBytes(b._1))
    // header length varint counts itself: find the fixed point
    val n0 = typeBytes.map(_.length).sum
    var hdrLen = n0 + 1
    while (n0 + varintBytes(hdrLen.toLong).length != hdrLen)
      hdrLen = n0 + varintBytes(hdrLen.toLong).length
    varintBytes(hdrLen.toLong) ++ typeBytes.flatten ++ bodies.flatMap(_._2)
  }

  /** Smallest SQLite int width (1,2,3,4,6,8 bytes) holding v. */
  private def intWidth(v: Long): Int = {
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(if (v < 0) ~v else v) + 1 // incl. sign
    if (bits <= 8) 1 else if (bits <= 16) 2 else if (bits <= 24) 3
    else if (bits <= 32) 4 else if (bits <= 48) 6 else 8
  }
}
