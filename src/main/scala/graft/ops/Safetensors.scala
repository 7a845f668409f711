package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** safetensors read/write — the ML-tensor wire format (model
  * weights, precomputed embedding shards ship in it), from the
  * published format description alone: an 8-byte little-endian
  * header length, a JSON header mapping tensor names to
  * `{dtype, shape, data_offsets}` (offsets relative to the byte
  * buffer AFTER the header) plus an optional `__metadata__` string
  * map, then the raw little-endian tensor bytes. The format exists
  * precisely because pickle-style formats can execute code — it is
  * the safe interchange an ML data engine should speak.
  *
  * Validation before any data is trusted (the refuse-don't-guess
  * stance): header length in bounds, JSON well-formed with the
  * documented schema, dtype from the published table, offsets
  * in-bounds and ascending within each tensor, and byte length ==
  * element size × shape product. Tensor VALUES decode for F32 (the
  * embedding dtype — the engine's vector currency); other dtypes
  * surface metadata with null values (declared).
  */
object Safetensors {

  final case class TensorInfo(name: String, dtype: String, shape: Seq[Long],
      begin: Long, end: Long)

  /** Element sizes per the published dtype table. */
  private val DtypeSize = Map(
    "F64" -> 8, "F32" -> 4, "F16" -> 2, "BF16" -> 2,
    "I64" -> 8, "I32" -> 4, "I16" -> 2, "I8" -> 1, "U8" -> 1, "BOOL" -> 1)

  /** Parse header + validate geometry. Returns (metadata, tensors in
    * header order, dataStart). */
  def parse(bytes: Array[Byte]): Option[(Map[String, String], Seq[TensorInfo], Long)] = {
    if (bytes.length < 8) return None
    var headerLen = 0L
    var i = 0
    while (i < 8) { headerLen |= (bytes(i) & 0xFFL) << (8 * i); i += 1 }
    if (headerLen <= 0 || headerLen > bytes.length - 8) return None
    val dataStart = 8 + headerLen
    val dataLen = bytes.length - dataStart
    val json = try {
      JsonMethods.parse(new String(bytes, 8, headerLen.toInt,
        java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Exception => return None }
    json match {
      case JObject(fields) =>
        var meta = Map.empty[String, String]
        val tensors = Seq.newBuilder[TensorInfo]
        fields.foreach {
          case ("__metadata__", JObject(ms)) =>
            ms.foreach {
              case (k, JString(v)) => meta += (k -> v)
              case _ => return None
            }
          case (name, t: JObject) =>
            val dtype = t \ "dtype" match {
              case JString(d) => d; case _ => return None
            }
            val size = DtypeSize.get(dtype) match {
              case Some(s) => s; case None => return None
            }
            val shape = t \ "shape" match {
              case JArray(ds) => ds.map {
                case JInt(n) if n >= 0 => n.toLong
                case _ => return None
              }
              case _ => return None
            }
            val (b, e) = t \ "data_offsets" match {
              case JArray(List(JInt(b0), JInt(e0))) => (b0.toLong, e0.toLong)
              case _ => return None
            }
            if (b < 0 || e < b || e > dataLen) return None
            if (e - b != shape.product * size) return None
            tensors += TensorInfo(name, dtype, shape, b, e)
          case _ => return None
        }
        Some((meta, tensors.result(), dataStart))
      case _ => None
    }
  }

  /** F32 values of one tensor, little-endian. */
  def readF32(bytes: Array[Byte], dataStart: Long, t: TensorInfo): Array[Float] = {
    val n = ((t.end - t.begin) / 4).toInt
    val out = new Array[Float](n)
    val buf = java.nio.ByteBuffer.wrap(bytes, (dataStart + t.begin).toInt,
      (t.end - t.begin).toInt).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) { out(i) = buf.getFloat(); i += 1 }
    out
  }

  /** (id, name, dtype, shape, values) rows — one per tensor, values
    * decoded for F32, null otherwise; hostile bytes emit nothing. */
  def decodeTensors(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        parse(if (payload == null) Array.emptyByteArray else payload) match {
          case Some((_, tensors, dataStart)) => tensors.map { t =>
            val values: Option[Seq[Float]] =
              if (t.dtype == "F32") Some(readF32(payload, dataStart, t).toSeq)
              else None
            (id, t.name, t.dtype, t.shape, values)
          }
          case None => Seq.empty
        }
      }
      .toDF("id", "name", "dtype", "shape", "values")
  }

  /** Shard an embedding table into .safetensors files: one F32
    * rank-1 tensor per vector named `vec_<id>`, offsets laid out in
    * id order, a `__metadata__` map carried. */
  def packVecs(df: DataFrame, idCol: String, vecCol: String,
      nFiles: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)),
        col(vecCol).cast("array<float>"))
      .as[(Long, Seq[Float])]
      .groupByKey(_._1 % nFiles)
      .mapGroups { (fid, it) =>
        val rows = it.toSeq.sortBy(_._1)
        var off = 0L
        val entries = rows.map { case (id, vec) =>
          val b = off; off += vec.length.toLong * 4
          (id, vec, b, off)
        }
        val headerFields: List[(String, JValue)] =
          ("__metadata__" -> (JObject("packer" -> JString("graft")): JValue)) ::
            entries.toList.map { case (id, vec, b, e) =>
              s"vec_$id" -> (JObject(
                "dtype" -> JString("F32"),
                "shape" -> JArray(List(JInt(vec.length))),
                "data_offsets" -> JArray(List(JInt(b), JInt(e)))): JValue)
            }
        val header = JsonMethods.compact(JsonMethods.render(JObject(headerFields)))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val out = java.nio.ByteBuffer.allocate(8 + header.length + off.toInt)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        out.putLong(header.length.toLong)
        out.put(header)
        entries.foreach { case (_, vec, _, _) =>
          vec.foreach(out.putFloat)
        }
        (fid, out.array())
      }
      .toDF("file_id", "payload")
  }
}
