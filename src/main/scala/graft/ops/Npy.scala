package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** NPY / NPZ read/write — numpy's serialization (NEP-1 / the
  * `numpy.lib.format` spec), the OTHER embedding-shard wire format
  * beside [[Safetensors]]: `.npy` is magic `\\x93NUMPY` + version +
  * header length (2-byte LE in v1.0, 4-byte in v2.0+) + a Python
  * dict literal header (`descr`, `fortran_order`, `shape`) padded
  * for 16-byte data alignment + raw data; `.npz` is an
  * UNCOMPRESSED-or-deflated ZIP of `.npy` members — [[Zip]] already
  * speaks that.
  *
  * The header dict is parsed by a restricted literal reader (string
  * keys, `True`/`False`, int tuples — exactly the grammar the spec
  * requires writers to emit), never eval. `descr` from a fixed
  * table (`<f4`/`<f8`/`<i1..8`/`<u1..8`/`|b1`/`|u1`/`|i1`);
  * `fortran_order: True` is REFUSED (column-major transposition is
  * a consumer decision this reader won't silently make — declared);
  * values decode for `<f4` (the embedding dtype), other dtypes
  * surface metadata with null values. Data length must equal
  * elem size × shape product — the refuse-don't-guess stance.
  */
object Npy {

  final case class Header(descr: String, shape: Seq[Long], dataStart: Int)

  private val DtypeSize = Map(
    "<f4" -> 4, "<f8" -> 8, "<i1" -> 1, "<i2" -> 2, "<i4" -> 4, "<i8" -> 8,
    "<u1" -> 1, "<u2" -> 2, "<u4" -> 4, "<u8" -> 8,
    "|b1" -> 1, "|u1" -> 1, "|i1" -> 1)

  /** Restricted Python-dict-literal read for the three spec keys. */
  private def parseDict(s: String): Option[(String, Boolean, Seq[Long])] = {
    val t = s.trim
    if (!t.startsWith("{") || !t.endsWith("}")) return None
    def strVal(key: String): Option[String] = {
      val re = ("['\"]" + key + "['\"]\\s*:\\s*['\"]([^'\"]*)['\"]").r
      re.findFirstMatchIn(t).map(_.group(1))
    }
    def boolVal(key: String): Option[Boolean] = {
      val re = ("['\"]" + key + "['\"]\\s*:\\s*(True|False)").r
      re.findFirstMatchIn(t).map(_.group(1) == "True")
    }
    def tupleVal(key: String): Option[Seq[Long]] = {
      val re = ("['\"]" + key + "['\"]\\s*:\\s*\\(([^)]*)\\)").r
      re.findFirstMatchIn(t).map { m =>
        m.group(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { n =>
          if (!n.forall(_.isDigit)) return None
          n.toLong
        }
      }
    }
    for (d <- strVal("descr"); f <- boolVal("fortran_order"); sh <- tupleVal("shape"))
      yield (d, f, sh)
  }

  /** Parse one .npy payload's header; data geometry validated. */
  def parse(bytes: Array[Byte]): Option[Header] = {
    if (bytes.length < 10) return None
    if ((bytes(0) & 0xFF) != 0x93 || new String(bytes, 1, 5, "US-ASCII") != "NUMPY")
      return None
    val major = bytes(6) & 0xFF
    val (headerLen, headerAt) =
      if (major == 1) {
        ((bytes(8) & 0xFF) | ((bytes(9) & 0xFF) << 8), 10)
      } else if (major == 2 || major == 3) {
        if (bytes.length < 12) return None
        ((bytes(8) & 0xFF) | ((bytes(9) & 0xFF) << 8) |
          ((bytes(10) & 0xFF) << 16) | ((bytes(11) & 0xFF) << 24), 12)
      } else return None
    if (headerLen < 0 || headerAt + headerLen > bytes.length) return None
    val dict = new String(bytes, headerAt, headerLen,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val (descr, fortran, shape) = parseDict(dict) match {
      case Some(x) => x; case None => return None
    }
    if (fortran) return None // declared refusal
    val size = DtypeSize.get(descr) match { case Some(x) => x; case None => return None }
    val dataStart = headerAt + headerLen
    if (bytes.length - dataStart != shape.product * size) return None
    Some(Header(descr, shape, dataStart))
  }

  /** `<f4` values, little-endian. */
  def readF32(bytes: Array[Byte], h: Header): Array[Float] = {
    val n = ((bytes.length - h.dataStart) / 4)
    val out = new Array[Float](n)
    val buf = java.nio.ByteBuffer.wrap(bytes, h.dataStart, n * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) { out(i) = buf.getFloat(); i += 1 }
    out
  }

  /** Write one v1.0 .npy (spec-padded header, 16-byte alignment). */
  def writeF32(shape: Seq[Long], values: Array[Float]): Array[Byte] = {
    require(shape.product == values.length, "shape/value mismatch")
    val shapeStr = shape.length match {
      case 1 => s"(${shape.head},)"
      case _ => shape.mkString("(", ", ", ")")
    }
    val dict = s"{'descr': '<f4', 'fortran_order': False, 'shape': $shapeStr, }"
    // total header (magic..dict+padding+\n) must be a multiple of 16
    val base = 10 + dict.length + 1
    val pad = (16 - base % 16) % 16
    val header = dict + (" " * pad) + "\n"
    val out = java.nio.ByteBuffer.allocate(10 + header.length + values.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(0x93.toByte).put("NUMPY".getBytes("US-ASCII")).put(1.toByte).put(0.toByte)
    out.putShort(header.length.toShort)
    out.put(header.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    values.foreach(out.putFloat)
    out.array()
  }

  /** (id, name, descr, shape, values) rows per .npz payload — one
    * per member; hostile bytes emit nothing; a member that is not
    * valid .npy refuses the archive (geometry lies are not
    * survivable per-member). */
  def decodeNpz(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val entries = Zip.entries(
          if (payload == null) Array.emptyByteArray else payload)
        entries match {
          case Some(es) =>
            val parsed = es.map { e =>
              parse(e.data).map { h =>
                val values: Option[Seq[Float]] =
                  if (h.descr == "<f4") Some(readF32(e.data, h).toSeq) else None
                (id, e.name.stripSuffix(".npy"), h.descr, h.shape, values)
              }
            }
            if (parsed.exists(_.isEmpty)) Seq.empty else parsed.flatten
          case None => Seq.empty
        }
      }
      .toDF("id", "name", "descr", "shape", "values")
  }

  /** Shard an embedding table into .npz files (one v1.0 `<f4` .npy
    * member per vector; even file ids DEFLATE, odd store). */
  def packVecsNpz(df: DataFrame, idCol: String, vecCol: String,
      nFiles: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)),
        col(vecCol).cast("array<float>"))
      .as[(Long, Seq[Float])]
      .groupByKey(_._1 % nFiles)
      .mapGroups { (fid, it) =>
        val members = it.toSeq.sortBy(_._1).map { case (id, vec) =>
          s"vec_$id.npy" -> writeF32(Seq(vec.length.toLong), vec.toArray)
        }
        (fid, Zip.zipOf(members, deflate = fid % 2 == 0))
      }
      .toDF("file_id", "payload")
  }
}
