package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parquet footer metadata, from the published format (the
  * parquet-format FileMetaData thrift, serialized with the Thrift
  * COMPACT protocol) — the layout-audit surface a 100 TB estate
  * reads constantly: row-group sizes drive scan parallelism, codec
  * and page offsets drive cost models, and a mis-sized row group is
  * invisible until someone reads the footers. Spark can SCAN
  * parquet but exposes none of this structure as data; this op
  * turns the footers themselves into rows.
  *
  * Two from-spec layers:
  *  - a GENERIC Thrift compact-protocol walker (field-delta headers,
  *    zigzag varints, length-prefixed binaries, size-prefixed lists,
  *    nested structs — every unknown field parses into the value
  *    tree and is simply not projected, so footer additions by newer
  *    writers cannot break the walk);
  *  - the FileMetaData projection (row groups → column chunks →
  *    ColumnMetaData) with the Type and CompressionCodec enums named
  *    exactly as the format defines them.
  *
  * The gate cross-pins this walk against DuckDB's independent
  * parquet reader (`parquet_metadata()`) over the same files —
  * every offset, size, codec, and path must agree byte-for-byte.
  *
  * Scale shape: footers are read by RANGED tail reads through the
  * Hadoop FS (last 1 MiB, extended exactly once if the footer is
  * longer) — a 10 GiB part file costs one megabyte of IO, and files
  * are the parallelism unit. Unparseable footers quarantine as
  * row_group = -1 rows.
  */
object ParquetMeta {

  // ------------------------------------------------------------------
  // Thrift compact protocol (generic)
  // ------------------------------------------------------------------

  sealed trait TVal
  final case class TBool(v: Boolean) extends TVal
  final case class TInt(v: Long) extends TVal
  final case class TDouble(v: Double) extends TVal
  final case class TBin(v: Array[Byte]) extends TVal
  final case class TList(v: Vector[TVal]) extends TVal
  final case class TStruct(fields: Map[Int, TVal]) extends TVal

  private object Refuse extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def refuse(): Nothing = throw Refuse

  private final class Reader(b: Array[Byte], var pos: Int) {
    def u8(): Int = {
      if (pos >= b.length) refuse()
      val v = b(pos) & 0xFF; pos += 1; v
    }
    def varint(): Long = {
      var v = 0L; var shift = 0
      while (shift <= 63) {
        val x = u8()
        v |= (x & 0x7FL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
      }
      refuse()
    }
    def zigzag(): Long = { val n = varint(); (n >>> 1) ^ -(n & 1) }
    def bytes(n: Int): Array[Byte] = {
      if (n < 0 || pos + n > b.length) refuse()
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; out
    }
  }

  /** One value of compact-type `t` (list-element context: booleans
    * arrive as the type nibble itself in field context, as a byte in
    * element context — both routed here via `boolByte`). */
  private def readValue(r: Reader, t: Int, boolByte: Boolean): TVal = t match {
    case 1 => if (boolByte) TBool(r.u8() == 1) else TBool(true)
    case 2 => if (boolByte) { r.u8(); TBool(false) } else TBool(false)
    case 3 => TInt(r.bytes(1)(0).toLong) // i8: one raw byte
    case 4 | 5 | 6 => TInt(r.zigzag())
    case 7 => // double: 8 bytes little-endian
      val x = r.bytes(8)
      var bits = 0L
      var i = 7
      while (i >= 0) { bits = (bits << 8) | (x(i) & 0xFFL); i -= 1 }
      TDouble(java.lang.Double.longBitsToDouble(bits))
    case 8 => TBin(r.bytes(r.varint().toInt))
    case 9 | 10 => // list / set
      val head = r.u8()
      val elemType = head & 0x0F
      val size0 = (head >> 4) & 0x0F
      val size = if (size0 == 15) r.varint().toInt else size0
      if (size < 0 || size > (1 << 24)) refuse()
      TList(Vector.fill(size)(readValue(r, elemType, boolByte = true)))
    case 11 => // map
      val size = r.varint().toInt
      if (size < 0 || size > (1 << 24)) refuse()
      if (size == 0) TList(Vector.empty)
      else {
        val kv = r.u8()
        val kt = (kv >> 4) & 0x0F; val vt = kv & 0x0F
        TList(Vector.fill(size)(TList(Vector(
          readValue(r, kt, boolByte = true), readValue(r, vt, boolByte = true)))))
      }
    case 12 => readStruct(r)
    case _ => refuse()
  }

  private def readStruct(r: Reader): TStruct = {
    var lastId = 0
    val fields = Map.newBuilder[Int, TVal]
    var guard = 0
    while (guard < (1 << 20)) {
      val head = r.u8()
      if (head == 0) return TStruct(fields.result())
      val t = head & 0x0F
      val delta = (head >> 4) & 0x0F
      val id = if (delta != 0) lastId + delta else r.zigzag().toInt
      lastId = id
      fields += ((id, readValue(r, t, boolByte = false)))
      guard += 1
    }
    refuse()
  }

  /** Parse a complete thrift-compact struct from `bytes`. */
  private[graft] def parseThrift(bytes: Array[Byte]): Option[TStruct] =
    try Some(readStruct(new Reader(bytes, 0))) catch { case Refuse => None }

  // ------------------------------------------------------------------
  // FileMetaData projection
  // ------------------------------------------------------------------

  private val TypeNames = Array("BOOLEAN", "INT32", "INT64", "INT96",
    "FLOAT", "DOUBLE", "BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY")
  private val CodecNames = Array("UNCOMPRESSED", "SNAPPY", "GZIP", "LZO",
    "BROTLI", "LZ4", "ZSTD", "LZ4_RAW")
  private val EncodingNames = Array("PLAIN", "UNKNOWN(1)", "PLAIN_DICTIONARY",
    "RLE", "BIT_PACKED", "DELTA_BINARY_PACKED", "DELTA_LENGTH_BYTE_ARRAY",
    "DELTA_BYTE_ARRAY", "RLE_DICTIONARY", "BYTE_STREAM_SPLIT")

  private def enumName(table: Array[String], v: Long): String =
    if (v >= 0 && v < table.length) table(v.toInt) else s"UNKNOWN($v)"

  final case class ChunkMeta(rowGroup: Int, rgNumRows: Long, rgBytes: Long,
      columnId: Int, fileOffset: Long, path: String, typeName: String,
      codec: String, numValues: Long, dictPageOffset: Long,
      dataPageOffset: Long, compressedSize: Long, uncompressedSize: Long,
      nullCount: Long, minValue: String, maxValue: String,
      encodings: String)

  /** Render a Statistics min/max binary by PHYSICAL type — the
    * zone-map values pruning keys on. Logical-type rendering
    * (timestamps, decimals) is deliberately NOT applied: these are
    * the raw order keys as stored. Types beyond the exact-render
    * set return null. */
  private def statValue(typeId: Long, b: Array[Byte]): String = typeId match {
    case 1 if b.length == 4 => // INT32 LE
      ((b(0) & 0xFF) | ((b(1) & 0xFF) << 8) | ((b(2) & 0xFF) << 16) |
        ((b(3) & 0xFF) << 24)).toString
    case 2 if b.length == 8 => // INT64 LE
      var v = 0L; var i = 7
      while (i >= 0) { v = (v << 8) | (b(i) & 0xFFL); i -= 1 }
      v.toString
    case 6 => new String(b, StandardCharsets.UTF_8) // BYTE_ARRAY (UTF8)
    case _ => null
  }

  private def i64(s: TStruct, id: Int): Option[Long] =
    s.fields.get(id).collect { case TInt(v) => v }
  private def list(s: TStruct, id: Int): Vector[TVal] =
    s.fields.get(id) match { case Some(TList(v)) => v; case _ => Vector.empty }

  /** Project the chunk rows out of a parsed FileMetaData. */
  private[graft] def chunksOf(meta: TStruct): Vector[ChunkMeta] =
    list(meta, 4).zipWithIndex.flatMap {
      case (rg: TStruct, rgId) =>
        val rgRows = i64(rg, 3).getOrElse(-1L)
        val rgBytes = i64(rg, 2).getOrElse(-1L)
        list(rg, 1).zipWithIndex.flatMap {
          case (cc: TStruct, colId) =>
            cc.fields.get(3) match {
              case Some(md: TStruct) =>
                val path = list(md, 3).collect {
                  case TBin(b) => new String(b, StandardCharsets.UTF_8)
                }.mkString(", ")
                val typeId = i64(md, 1).getOrElse(-1L)
                // Statistics (field 12): null_count = 3, and the
                // modern max_value/min_value = 5/6 (1/2 are the
                // deprecated ambiguous-ordering pair, not read)
                val stats = md.fields.get(12).collect { case s: TStruct => s }
                val bin = (id: Int) => stats.flatMap(_.fields.get(id))
                  .collect { case TBin(b) => b }
                // encodings (field 2): the per-chunk Encoding enum
                // list, rendered SORTED — list order is writer whim,
                // the set is the diagnostic fact
                val encs = list(md, 2).collect { case TInt(v) =>
                  enumName(EncodingNames, v) }.distinct.sorted.mkString(", ")
                Some(ChunkMeta(rgId, rgRows, rgBytes, colId,
                  i64(cc, 2).getOrElse(-1L), path,
                  enumName(TypeNames, typeId),
                  enumName(CodecNames, i64(md, 4).getOrElse(-1L)),
                  i64(md, 5).getOrElse(-1L), i64(md, 11).getOrElse(-1L),
                  i64(md, 9).getOrElse(-1L), i64(md, 7).getOrElse(-1L),
                  i64(md, 6).getOrElse(-1L),
                  stats.flatMap(i64(_, 3)).getOrElse(-1L),
                  bin(6).map(statValue(typeId, _)).orNull,
                  bin(5).map(statValue(typeId, _)).orNull,
                  encs))
              case _ => None
            }
          case _ => None
        }
      case _ => Vector.empty
    }

  /** Parse the footer out of a file TAIL (the last `tailLen` bytes of
    * a `fileLen`-byte file): PAR1 magic, footer length, thrift walk.
    * Returns None when the tail is too short for the footer — the
    * caller re-reads with the exact range. */
  private[graft] def footerFromTail(tail: Array[Byte]): Either[Long, TStruct] = {
    val n = tail.length
    if (n < 12 || tail(n - 4) != 'P' || tail(n - 3) != 'A' ||
        tail(n - 2) != 'R' || tail(n - 1) != '1') return Left(-1L)
    val len = (tail(n - 8) & 0xFFL) | ((tail(n - 7) & 0xFFL) << 8) |
      ((tail(n - 6) & 0xFFL) << 16) | ((tail(n - 5) & 0xFFL) << 24)
    if (len <= 0 || len > Int.MaxValue - 8) return Left(-1L)
    if (len + 8 > n) return Left(len) // need a longer tail
    val footer = java.util.Arrays.copyOfRange(tail, n - 8 - len.toInt, n - 8)
    parseThrift(footer) match {
      case Some(s) => Right(s)
      case None => Left(-1L)
    }
  }

  /** Top-level (column name, field_id) pairs of a parsed footer:
    * FileMetaData.schema (field 2) is the depth-first flattened
    * SchemaElement list — per element: name 4, num_children 5,
    * field_id 9. The root's immediate children are the table's
    * columns; nested subtrees are skipped by child counting. */
  private[graft] def topLevelFields(footer: TStruct): Seq[(String, Option[Long])] = {
    val els = list(footer, 2).collect { case s: TStruct => s }
    if (els.isEmpty) return Seq.empty
    def name(s: TStruct): String = s.fields.get(4) match {
      case Some(TBin(b)) => new String(b, java.nio.charset.StandardCharsets.UTF_8)
      case _ => ""
    }
    def children(s: TStruct): Int = i64(s, 5).getOrElse(0L).toInt
    def skip(at: Int): Int = { // index just past element at's subtree
      var j = at + 1
      var n = children(els(at))
      while (n > 0 && j < els.length) { j = skip(j); n -= 1 }
      j
    }
    val out = Seq.newBuilder[(String, Option[Long])]
    var i = 1
    var remaining = children(els.head)
    while (remaining > 0 && i < els.length) {
      out += ((name(els(i)), i64(els(i), 9)))
      i = skip(i)
      remaining -= 1
    }
    out.result()
  }

  /** Serialize/deserialize a top-level layout for the probe wire:
    * "L" + name\u0001id rows joined by \u0002 ("E"+path on error). */
  private def serLayout(s: TStruct): String =
    "L" + topLevelFields(s).map { case (n, id) =>
      n + "\u0001" + id.map(_.toString).getOrElse("")
    }.mkString("\u0002")

  private def deserLayout(body: String): Seq[(String, Option[Long])] =
    if (body.isEmpty) Seq.empty
    else body.split("\u0002", -1).toSeq.map { f =>
      val at = f.indexOf('\u0001')
      val n = f.substring(0, at)
      val idStr = f.substring(at + 1)
      (n, if (idStr.isEmpty) None else Some(idStr.toLong))
    }

  /** One serialized layout string ("L..." / "E"+path) per input path
    * — the distributed footer probe both layout surfaces ride:
    * executors read each file's footer tail (ranged, no data pages)
    * and serialize its (name, field_id) top-level layout. */
  private def probeLayouts(spark: org.apache.spark.sql.SparkSession,
      paths: Seq[String]): org.apache.spark.sql.Dataset[(String, String)] = {
    import spark.implicits._
    val confEntries = Warc.confEntriesOf(spark)
    spark.createDataset(paths)
      .mapPartitions { it =>
        val conf = Warc.confOf(confEntries)
        it.map { p =>
          try {
            val path = new org.apache.hadoop.fs.Path(p)
            val fs = path.getFileSystem(conf)
            val fileLen = fs.getFileStatus(path).getLen
            def readTail(tailLen: Long): Array[Byte] = {
              val n = math.min(fileLen, tailLen)
              Warc.readRange(conf, p, fileLen - n, n)
            }
            val parsed = footerFromTail(readTail(1L << 20)) match {
              case Right(s) => Some(s)
              case Left(len) if len > 0 && Warc.rangeReadable(len + 8) =>
                footerFromTail(readTail(len + 8)).toOption
              case _ => None
            }
            parsed match {
              case Some(s) => (p, serLayout(s))
              case None => (p, "E" + p)
            }
          } catch { case _: Exception => (p, "E" + p) }
        }
      }
  }

  /** DISTINCT top-level field layouts across `paths` — the Delta
    * id-mode column-mapping probe: only the DISTINCT layouts reach
    * the driver (the distinct runs on the cluster). An unreadable
    * footer surfaces as Left(path). */
  def distinctTopLevelLayouts(spark: org.apache.spark.sql.SparkSession,
      paths: Seq[String]): Either[String, Seq[Seq[(String, Option[Long])]]] = {
    import spark.implicits._
    val ser: Seq[String] = probeLayouts(spark, paths).map(_._2)
      .distinct().collect().toSeq
    ser.collectFirst { case s if s.startsWith("E") => s.substring(1) } match {
      case Some(bad) => Left(bad)
      case None => Right(ser.map(s => deserLayout(s.substring(1))))
    }
  }

  /** Per-path top-level layouts — the Iceberg field-id projection
    * probe, which needs to GROUP files by layout (one scan arm per
    * distinct layout). One row per path reaches the driver — the
    * same order of driver memory as the path list the caller already
    * holds; the probe itself stays distributed ranged tail reads.
    * Left(path) on the first unreadable footer. */
  def topLevelLayoutsByPath(spark: org.apache.spark.sql.SparkSession,
      paths: Seq[String]): Either[String, Seq[(String, Seq[(String, Option[Long])])]] = {
    val rows = probeLayouts(spark, paths).collect().toSeq
    rows.collectFirst { case (_, s) if s.startsWith("E") => s.substring(1) } match {
      case Some(bad) => Left(bad)
      case None => Right(rows.map { case (p, s) => (p, deserLayout(s.substring(1))) })
    }
  }
  /** Footer chunk rows per file — RANGED tail reads (1 MiB, extended
    * once when the footer is longer); unparseable files quarantine
    * as row_group = -1. Input: one row per path. */
  def meta(paths: DataFrame, pathCol: String): DataFrame = {
    val spark = paths.sparkSession
    import spark.implicits._
    val confEntries = Warc.confEntriesOf(spark)
    paths.select(col(pathCol).cast("string")).as[String]
      .mapPartitions { it =>
        val conf = Warc.confOf(confEntries)
        it.flatMap { p =>
          def quarantine = Seq((p, -1, -1L, -1L, -1, -1L, null: String,
            null: String, null: String, -1L, -1L, -1L, -1L, -1L,
            -1L, null: String, null: String, null: String))
          try {
            val path = new org.apache.hadoop.fs.Path(p)
            val fs = path.getFileSystem(conf)
            val fileLen = fs.getFileStatus(path).getLen
            def readTail(tailLen: Long): Array[Byte] = {
              val n = math.min(fileLen, tailLen)
              Warc.readRange(conf, p, fileLen - n, n)
            }
            val first = footerFromTail(readTail(1L << 20))
            val parsed = first match {
              case Right(s) => Some(s)
              case Left(len) if len > 0 && Warc.rangeReadable(len + 8) =>
                footerFromTail(readTail(len + 8)).toOption
              case _ => None
            }
            parsed match {
              case Some(s) =>
                val cs = chunksOf(s)
                if (cs.isEmpty) quarantine
                else cs.map(c => (p, c.rowGroup, c.rgNumRows, c.rgBytes,
                  c.columnId, c.fileOffset, c.path, c.typeName, c.codec,
                  c.numValues, c.dictPageOffset, c.dataPageOffset,
                  c.compressedSize, c.uncompressedSize,
                  c.nullCount, c.minValue, c.maxValue, c.encodings))
              case None => quarantine
            }
          } catch { case _: Exception => quarantine }
        }
      }
      .toDF("path", "row_group", "rg_num_rows", "rg_bytes", "column_id",
        "file_offset", "path_in_schema", "type", "compression", "num_values",
        "dictionary_page_offset", "data_page_offset", "total_compressed_size",
        "total_uncompressed_size", "null_count", "min_value", "max_value",
        "encodings")
  }
}
