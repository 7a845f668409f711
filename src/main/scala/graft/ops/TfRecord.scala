package graft.ops

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** TFRecord containers and the tf.train.Example payload, from the
  * public specifications — the canonical training-data shard format
  * of the TensorFlow estate (and the wire format tools like
  * ArrayRecord/DataFlow emit), re-implemented from spec like the rest
  * of the archive rung (avro/warc/tar/zip/...). Nothing is vendored:
  * the framing checksum is pinned against the JDK's own independent
  * `java.util.zip.CRC32C` in TfRecordSpec, and the protobuf wire walk
  * follows the published encoding rules.
  *
  * Framing (TensorFlow `tensorflow/core/lib/io/record_writer.h`,
  * public docs): each record is
  * {{{
  *   uint64 length           (little-endian)
  *   uint32 masked_crc32c(length bytes)
  *   byte   data[length]
  *   uint32 masked_crc32c(data)
  * }}}
  * where `masked_crc = ((crc >> 15) | (crc << 17)) + 0xa282ead8`
  * over CRC-32C (Castagnoli, reflected polynomial 0x82F63B78). Both
  * checksums are VERIFIED on read; any violation (or a truncated
  * tail) ends the walk with `clean = false` so callers can
  * quarantine — hostile bytes never throw (the archive-rung
  * contract).
  *
  * Payload (tf.train.Example, `tensorflow/core/example/example.proto`
  * + `feature.proto`, protobuf wire encoding): an Example is a
  * message holding a `Features` map<string, Feature>, each Feature a
  * oneof of BytesList / FloatList / Int64List. The decoder is a
  * from-spec protobuf walker: base-128 varints, the four live wire
  * types, unknown fields skipped by wire type, groups refused, and
  * BOTH encodings of the repeated scalar lists accepted (packed
  * length-delimited and unpacked per-element tags — the spec requires
  * parsers to accept either regardless of the declared packing).
  * Last-one-wins on duplicate oneof/map keys, per the spec's merge
  * rule.
  *
  * Scale shape: files are the parallelism unit (one binary row per
  * shard through the `binaryFile` seam, decoded in mapPartitions) —
  * the TFRecord ecosystem shards at ~100 MB–1 GB by convention, which
  * is exactly the seam's sweet spot. The writer frames row-by-row
  * with bounded state (one record buffered at a time).
  */
object TfRecord {

  // ------------------------------------------------------------------
  // CRC-32C (Castagnoli) + TFRecord masking
  // ------------------------------------------------------------------

  /** Reflected-table CRC-32C, polynomial 0x1EDC6F41 (reflected form
    * 0x82F63B78) — built from the polynomial, pinned against the
    * JDK's independent implementation in TfRecordSpec. */
  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var n = 0
    while (n < 256) {
      var c = n
      var k = 0
      while (k < 8) {
        c = if ((c & 1) != 0) 0x82F63B78 ^ (c >>> 1) else c >>> 1
        k += 1
      }
      t(n) = c
      n += 1
    }
    t
  }

  def crc32c(data: Array[Byte], off: Int, len: Int): Int = {
    var c = 0xFFFFFFFF
    var i = off
    val end = off + len
    while (i < end) {
      c = CrcTable((c ^ data(i)) & 0xFF) ^ (c >>> 8)
      i += 1
    }
    c ^ 0xFFFFFFFF
  }

  def crc32c(data: Array[Byte]): Int = crc32c(data, 0, data.length)

  /** TFRecord's mask: rotate right 15 then add the fixed constant —
    * applied so a CRC stored alongside the data it covers cannot be
    * mistaken for data by a CRC of itself. */
  def maskedCrc(data: Array[Byte], off: Int, len: Int): Int = {
    val c = crc32c(data, off, len)
    ((c >>> 15) | (c << 17)) + 0xa282ead8
  }

  def maskedCrc(data: Array[Byte]): Int = maskedCrc(data, 0, data.length)

  private def u32le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def u64le(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xFFL); i -= 1 }
    v
  }

  private def putU32le(out: java.io.OutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
    out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
  }

  private def putU64le(out: java.io.OutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((v >>> (8 * i)) & 0xFF).toInt); i += 1 }
  }

  // ------------------------------------------------------------------
  // Record framing
  // ------------------------------------------------------------------

  /** Walk a TFRecord shard: the records up to the first framing
    * violation, plus whether the walk consumed the whole file
    * cleanly. Both CRCs are verified per record; a record longer than
    * the remaining bytes (truncation) or above Int.MaxValue is a
    * violation, not a crash. */
  def recordsOf(payload: Array[Byte]): (Vector[Array[Byte]], Boolean) = {
    val out = Vector.newBuilder[Array[Byte]]
    var pos = 0
    val n = payload.length
    while (pos < n) {
      if (n - pos < 12) return (out.result(), false)
      val len = u64le(payload, pos)
      if (maskedCrc(payload, pos, 8) != u32le(payload, pos + 8))
        return (out.result(), false)
      if (len < 0 || len > Int.MaxValue.toLong || len > (n - pos - 16).toLong)
        return (out.result(), false)
      val dataOff = pos + 12
      val dlen = len.toInt
      if (maskedCrc(payload, dataOff, dlen) != u32le(payload, dataOff + dlen))
        return (out.result(), false)
      out += java.util.Arrays.copyOfRange(payload, dataOff, dataOff + dlen)
      pos = dataOff + dlen + 4
    }
    (out.result(), true)
  }

  /** Frame records onto an output stream, one record at a time —
    * genuinely bounded state (the current record only), so a shard
    * of any size streams without materializing. */
  def frameTo(records: Iterator[Array[Byte]], out: java.io.OutputStream): Unit =
    records.foreach { rec =>
      val lenBytes = new Array[Byte](8)
      var i = 0
      while (i < 8) { lenBytes(i) = ((rec.length.toLong >>> (8 * i)) & 0xFF).toByte; i += 1 }
      putU64le(out, rec.length.toLong)
      putU32le(out, maskedCrc(lenBytes))
      out.write(rec, 0, rec.length)
      putU32le(out, maskedCrc(rec))
    }

  /** [[frameTo]] into a byte array — for the gate packers, whose
    * shards are DataFrame payload cells and bounded by construction.
    * The file sink ([[writeShards]]) streams via [[frameTo]] instead:
    * a >2 GiB partition must not materialize as one array. */
  def frame(records: Iterator[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    frameTo(records, out)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Protobuf wire primitives
  // ------------------------------------------------------------------

  private object Refuse extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def refuse(): Nothing = throw Refuse

  /** Base-128 varint at `pos`; returns (value, bytes consumed).
    * Capped at the spec's 10 bytes; truncation refuses. */
  private def readVarint(b: Array[Byte], pos: Int, end: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var i = pos
    while (i < end && shift <= 63) {
      val x = b(i) & 0xFF
      v |= (x & 0x7FL) << shift
      i += 1
      if ((x & 0x80) == 0) return (v, i - pos)
      shift += 7
    }
    refuse()
  }

  private def writeVarint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7FL) != 0) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.write((v & 0x7F).toInt)
  }

  private def writeTag(out: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    writeVarint(out, ((field.toLong << 3) | wire.toLong))

  private def writeLenDelim(out: ByteArrayOutputStream, field: Int, body: Array[Byte]): Unit = {
    writeTag(out, field, 2)
    writeVarint(out, body.length.toLong)
    out.write(body, 0, body.length)
  }

  /** Skip an unknown field's value by wire type; groups (3/4) and
    * unknown wire types refuse — they cannot be skipped safely. */
  private def skipField(b: Array[Byte], pos: Int, end: Int, wire: Int): Int = wire match {
    case 0 => pos + readVarint(b, pos, end)._2
    case 1 => if (end - pos < 8) refuse() else pos + 8
    case 2 =>
      val (len, n) = readVarint(b, pos, end)
      if (len < 0 || len > (end - pos - n).toLong) refuse()
      pos + n + len.toInt
    case 5 => if (end - pos < 4) refuse() else pos + 4
    case _ => refuse()
  }

  // ------------------------------------------------------------------
  // tf.train.Example
  // ------------------------------------------------------------------

  sealed trait Feature
  final case class BytesFeature(values: Vector[Array[Byte]]) extends Feature
  final case class FloatFeature(values: Vector[Float]) extends Feature
  final case class Int64Feature(values: Vector[Long]) extends Feature

  /** Encode an Example. `packed` selects the repeated-scalar wire
    * form for Float/Int64 lists (both are spec-legal; the decoder
    * accepts either — cycling the flag in fixtures makes both paths
    * load-bearing). */
  def encodeExample(features: Seq[(String, Feature)], packed: Boolean = true): Array[Byte] = {
    val featuresMsg = new ByteArrayOutputStream()
    features.foreach { case (name, feat) =>
      val featMsg = new ByteArrayOutputStream()
      feat match {
        case BytesFeature(vs) =>
          val list = new ByteArrayOutputStream()
          vs.foreach(v => writeLenDelim(list, 1, v))
          writeLenDelim(featMsg, 1, list.toByteArray) // bytes_list = 1
        case FloatFeature(vs) =>
          val list = new ByteArrayOutputStream()
          if (packed) {
            val body = new ByteArrayOutputStream()
            vs.foreach { f =>
              val bits = java.lang.Float.floatToIntBits(f)
              putU32le(body, bits)
            }
            writeLenDelim(list, 1, body.toByteArray)
          } else vs.foreach { f =>
            writeTag(list, 1, 5)
            putU32le(list, java.lang.Float.floatToIntBits(f))
          }
          writeLenDelim(featMsg, 2, list.toByteArray) // float_list = 2
        case Int64Feature(vs) =>
          val list = new ByteArrayOutputStream()
          if (packed) {
            val body = new ByteArrayOutputStream()
            vs.foreach(writeVarint(body, _))
            writeLenDelim(list, 1, body.toByteArray)
          } else vs.foreach { v =>
            writeTag(list, 1, 0)
            writeVarint(list, v)
          }
          writeLenDelim(featMsg, 3, list.toByteArray) // int64_list = 3
      }
      // map<string, Feature> entry: key = 1, value = 2
      val entry = new ByteArrayOutputStream()
      writeLenDelim(entry, 1, name.getBytes(StandardCharsets.UTF_8))
      writeLenDelim(entry, 2, featMsg.toByteArray)
      writeLenDelim(featuresMsg, 1, entry.toByteArray)
    }
    val example = new ByteArrayOutputStream()
    writeLenDelim(example, 1, featuresMsg.toByteArray) // Example.features = 1
    example.toByteArray
  }

  /** Decode an Example to its (name, Feature) pairs in wire order —
    * None on any wire violation. Duplicate keys: last wins (the
    * protobuf map merge rule). */
  def decodeExample(bytes: Array[Byte]): Option[Vector[(String, Feature)]] =
    try {
      var order = Vector.empty[String]
      val byName = scala.collection.mutable.Map[String, Feature]()
      walkMessage(bytes, 0, bytes.length) { (field, body, off, len) =>
        if (field == 1) // Example.features
          walkMessage(body, off, off + len) { (f2, b2, o2, l2) =>
            if (f2 == 1) { // Features.feature map entry
              val (name, feat) = decodeEntry(b2, o2, o2 + l2)
              if (!byName.contains(name)) order :+= name
              byName(name) = feat
            }
          }
      }
      Some(order.map(n => (n, byName(n))))
    } catch { case Refuse => None }

  /** Walk one message's length-delimited fields, dispatching (field,
    * buffer, offset, len) for wire-type-2 fields and skipping
    * everything else by wire type. */
  private def walkMessage(b: Array[Byte], start: Int, end: Int)(
      onLenDelim: (Int, Array[Byte], Int, Int) => Unit): Unit = {
    var pos = start
    while (pos < end) {
      val (tag, n) = readVarint(b, pos, end)
      pos += n
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      if (field <= 0) refuse()
      if (wire == 2) {
        val (len, m) = readVarint(b, pos, end)
        if (len < 0 || len > (end - pos - m).toLong) refuse()
        onLenDelim(field, b, pos + m, len.toInt)
        pos += m + len.toInt
      } else pos = skipField(b, pos, end, wire)
    }
    if (pos != end) refuse()
  }

  /** One map entry: key = 1 (string), value = 2 (Feature). */
  private def decodeEntry(b: Array[Byte], start: Int, end: Int): (String, Feature) = {
    var name: String = null
    var feat: Feature = null
    walkMessage(b, start, end) { (field, body, off, len) =>
      if (field == 1)
        name = new String(body, off, len, StandardCharsets.UTF_8)
      else if (field == 2)
        feat = decodeFeature(body, off, off + len)
    }
    if (name == null || feat == null) refuse()
    (name, feat)
  }

  /** Feature oneof: bytes_list = 1, float_list = 2, int64_list = 3 —
    * last field wins (the oneof merge rule). */
  private def decodeFeature(b: Array[Byte], start: Int, end: Int): Feature = {
    var feat: Feature = null
    walkMessage(b, start, end) { (field, body, off, len) =>
      field match {
        case 1 => feat = BytesFeature(decodeBytesList(body, off, off + len))
        case 2 => feat = FloatFeature(decodeFloatList(body, off, off + len))
        case 3 => feat = Int64Feature(decodeInt64List(body, off, off + len))
        case _ => ()
      }
    }
    if (feat == null) refuse()
    feat
  }

  private def decodeBytesList(b: Array[Byte], start: Int, end: Int): Vector[Array[Byte]] = {
    val out = Vector.newBuilder[Array[Byte]]
    walkMessage(b, start, end) { (field, body, off, len) =>
      if (field == 1) out += java.util.Arrays.copyOfRange(body, off, off + len)
    }
    out.result()
  }

  /** Packed (length-delimited run of fixed32) AND unpacked (per-value
    * wire-type-5 tags) forms both accepted, interleaved — the spec's
    * rule for parsers of packed-declared fields. */
  private def decodeFloatList(b: Array[Byte], start: Int, end: Int): Vector[Float] = {
    val out = Vector.newBuilder[Float]
    var pos = start
    while (pos < end) {
      val (tag, n) = readVarint(b, pos, end)
      pos += n
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      if (field == 1 && wire == 2) {
        val (len, m) = readVarint(b, pos, end)
        if (len < 0 || len > (end - pos - m).toLong || len % 4 != 0) refuse()
        var o = pos + m
        val e = o + len.toInt
        while (o < e) {
          out += java.lang.Float.intBitsToFloat(u32le(b, o))
          o += 4
        }
        pos = e
      } else if (field == 1 && wire == 5) {
        if (end - pos < 4) refuse()
        out += java.lang.Float.intBitsToFloat(u32le(b, pos))
        pos += 4
      } else pos = skipField(b, pos, end, wire)
    }
    out.result()
  }

  private def decodeInt64List(b: Array[Byte], start: Int, end: Int): Vector[Long] = {
    val out = Vector.newBuilder[Long]
    var pos = start
    while (pos < end) {
      val (tag, n) = readVarint(b, pos, end)
      pos += n
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      if (field == 1 && wire == 2) {
        val (len, m) = readVarint(b, pos, end)
        if (len < 0 || len > (end - pos - m).toLong) refuse()
        var o = pos + m
        val e = o + len.toInt
        while (o < e) {
          val (v, k) = readVarint(b, o, e)
          out += v
          o += k
        }
        pos = e
      } else if (field == 1 && wire == 0) {
        val (v, k) = readVarint(b, pos, end)
        out += v
        pos += k
      } else pos = skipField(b, pos, end, wire)
    }
    out.result()
  }

  // ------------------------------------------------------------------
  // DataFrame surfaces
  // ------------------------------------------------------------------

  /** Source seam: one row per (record, feature) across the shard
    * frame — long format, because tf.train.Example has no schema to
    * pivot against (features vary per record by design). `kind` is
    * bytes/float/int64; `text` is the first bytes value decoded as
    * UTF-8 (null for the numeric kinds), `ints`/`floats` carry the
    * numeric lists. Framing violations and undecodable Examples
    * quarantine as rec_index = -1 rows — clean records BEFORE the
    * violation still surface (the walk is a prefix, not
    * all-or-nothing). */
  def rows(files: DataFrame, pathCol: String, contentCol: String): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col(pathCol).cast("string"), col(contentCol))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, payload) =>
        val (recs, clean) = recordsOf(if (payload == null) Array.emptyByteArray else payload)
        val good = recs.iterator.zipWithIndex.flatMap { case (rec, i) =>
          decodeExample(rec) match {
            case Some(feats) => feats.iterator.map { case (name, feat) =>
              feat match {
                case BytesFeature(vs) =>
                  val first = vs.headOption.orNull
                  val text = if (first == null) null else
                    try {
                      java.nio.charset.StandardCharsets.UTF_8.newDecoder()
                        .decode(java.nio.ByteBuffer.wrap(first)).toString
                    } catch { case _: java.nio.charset.CharacterCodingException => null }
                  (path, i, name, "bytes", text, null: Array[Long], null: Array[Float])
                case FloatFeature(vs) =>
                  (path, i, name, "float", null: String, null: Array[Long], vs.toArray)
                case Int64Feature(vs) =>
                  (path, i, name, "int64", null: String, vs.toArray, null: Array[Float])
              }
            }
            case None => Iterator.single(
              (path, -1, null: String, null: String, null: String,
                null: Array[Long], null: Array[Float]))
          }
        }
        val tail = if (clean) Iterator.empty else Iterator.single(
          (path, -1, null: String, null: String, null: String,
            null: Array[Long], null: Array[Float]))
        good ++ tail
      })
      .toDF("file_id", "rec_index", "feature", "kind", "text", "ints", "floats")
  }

  /** Sink: each row becomes one Example; string → BytesList (UTF-8),
    * integral → Int64List, float/double → FloatList, binary →
    * BytesList, arrays of those → multi-value lists; null columns are
    * omitted from the Example (the format's own null story). One
    * shard per partition, framed with bounded state. Unsupported
    * column types fail fast BEFORE the job launches. */
  def writeShards(df: DataFrame, dir: String): Unit = {
    import org.apache.spark.sql.types._
    val schema = df.schema
    schema.fields.foreach { f =>
      val ok = f.dataType match {
        case StringType | BinaryType | LongType | IntegerType | ShortType |
             ByteType | BooleanType | FloatType | DoubleType => true
        case ArrayType(et, _) => et match {
          case StringType | BinaryType | LongType | IntegerType |
               FloatType | DoubleType => true
          case _ => false
        }
        case _ => false
      }
      if (!ok) throw new graft.GraftAnalysisException(
        s"tfrecord sink: column '${f.name}' has unsupported type ${f.dataType.simpleString} " +
          "(supported: string/binary/integral/float/double and arrays of those)")
    }
    new java.io.File(dir).mkdirs()
    val base = new java.io.File(dir).getAbsolutePath
    val names = schema.fieldNames
    val types = schema.fields.map(_.dataType)
    df.foreachPartition { (rows: Iterator[Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      if (rows.hasNext) {
        val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(
          new java.io.File(base, f"part-$pid%05d.tfrecord")), 1 << 16)
        try frameTo(rows.map { r =>
          val feats = Vector.newBuilder[(String, Feature)]
          var i = 0
          while (i < names.length) {
            if (!r.isNullAt(i)) feats += ((names(i), featureOf(types(i), r, i)))
            i += 1
          }
          encodeExample(feats.result())
        }, out) finally out.close()
      }
    }
  }

  private def featureOf(dt: org.apache.spark.sql.types.DataType, r: Row, i: Int): Feature = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType => BytesFeature(Vector(r.getString(i).getBytes(StandardCharsets.UTF_8)))
      case BinaryType => BytesFeature(Vector(r.getAs[Array[Byte]](i)))
      case LongType => Int64Feature(Vector(r.getLong(i)))
      case IntegerType => Int64Feature(Vector(r.getInt(i).toLong))
      case ShortType => Int64Feature(Vector(r.getShort(i).toLong))
      case ByteType => Int64Feature(Vector(r.getByte(i).toLong))
      case BooleanType => Int64Feature(Vector(if (r.getBoolean(i)) 1L else 0L))
      case FloatType => FloatFeature(Vector(r.getFloat(i)))
      case DoubleType => FloatFeature(Vector(r.getDouble(i).toFloat))
      case ArrayType(et, _) =>
        val vs = r.getSeq[Any](i)
        et match {
          case StringType => BytesFeature(vs.iterator.map(v =>
            v.asInstanceOf[String].getBytes(StandardCharsets.UTF_8)).toVector)
          case BinaryType => BytesFeature(vs.iterator.map(_.asInstanceOf[Array[Byte]]).toVector)
          case LongType => Int64Feature(vs.iterator.map(_.asInstanceOf[Long]).toVector)
          case IntegerType => Int64Feature(vs.iterator.map(_.asInstanceOf[Int].toLong).toVector)
          case FloatType => FloatFeature(vs.iterator.map(_.asInstanceOf[Float]).toVector)
          case DoubleType => FloatFeature(vs.iterator.map(_.asInstanceOf[Double].toFloat).toVector)
          case other => throw new IllegalStateException(s"unreachable: $other")
        }
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
  }

  // ------------------------------------------------------------------
  // Gate packers (fixture seams — real shards, corpus-derived)
  // ------------------------------------------------------------------

  /** Gate packer: documents → `nFiles` TFRecord shards of Examples
    * with doc_id (Int64List), source/lang/text (BytesList). Even
    * shards write the packed repeated-scalar wire form, odd shards
    * the unpacked per-element form — both decoder paths are
    * load-bearing in the gate. */
  def packDocsTfr(df: DataFrame, idCol: String, sourceCol: String, langCol: String,
      textCol: String, nFiles: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), coalesce(col(sourceCol), lit("")),
        coalesce(col(langCol), lit("")), coalesce(col(textCol), lit("")))
      .as[(Long, String, String, String)]
      .groupByKey(r => java.lang.Math.floorMod(r._1, nFiles.toLong))
      .mapGroups { (fileId, rows) =>
        val packed = fileId % 2 == 0
        val framed = frame(rows.toSeq.sortBy(_._1).iterator.map {
          case (id, src, lang, text) =>
            encodeExample(Vector(
              "doc_id" -> Int64Feature(Vector(id)),
              "source" -> BytesFeature(Vector(src.getBytes(StandardCharsets.UTF_8))),
              "lang" -> BytesFeature(Vector(lang.getBytes(StandardCharsets.UTF_8))),
              "text" -> BytesFeature(Vector(text.getBytes(StandardCharsets.UTF_8)))),
              packed = packed)
        })
        (fileId, framed)
      }
      .toDF("file_id", "payload")
  }

  /** Gate packer: embeddings → TFRecord shards of (vec_id Int64List,
    * embedding FloatList) Examples, same packed/unpacked shard split. */
  def packVecsTfr(df: DataFrame, idCol: String, vecCol: String,
      nFiles: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .groupByKey(r => java.lang.Math.floorMod(r._1, nFiles.toLong))
      .mapGroups { (fileId, rows) =>
        val packed = fileId % 2 == 0
        val framed = frame(rows.toSeq.sortBy(_._1).iterator.map { case (id, vec) =>
          encodeExample(Vector(
            "vec_id" -> Int64Feature(Vector(id)),
            "embedding" -> FloatFeature(vec.toVector)), packed = packed)
        })
        (fileId, framed)
      }
      .toDF("file_id", "payload")
  }
}
