package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GGUF metadata reader — the third tensor-container rung beside
  * [[Safetensors]] and [[Npy]]: the llama.cpp ecosystem's format,
  * and the one whose METADATA layer (architecture, tokenizer,
  * quantization, alignment) is what data/model tooling actually
  * inspects. From the published spec alone (ggml `docs/gguf.md`):
  *
  *  - `GGUF` magic, u32 version (2 and 3 accepted), u64 tensor
  *    count, u64 KV count — all little-endian;
  *  - KV pairs: length-prefixed UTF-8 key, u32 value type, value —
  *    the full type table (u8/i8/u16/i16/u32/i32/f32/bool/string/
  *    array/u64/i64/f64), arrays typed + counted and read
  *    recursively (nested arrays refused — the spec reserves but
  *    discourages them; declared);
  *  - tensor infos: name, u32 n_dims, u64 dims, u32 ggml type id,
  *    u64 offset RELATIVE to the data section, which is aligned to
  *    `general.alignment` (default 32) — offsets must honor that
  *    alignment or the file refuses;
  *  - tensor DATA is deliberately not dequantized (the quant block
  *    formats are a moving target; metadata is what curation needs)
  *    — except F32, the engine's vector currency, which decodes.
  *
  * Surfaces: one long-format row per KV (kind='kv': key, value_type,
  * value stringified) and per tensor (kind='tensor': name, dims,
  * ggml type id, offset). Bounds-checked reads throughout; caps on
  * counts/string lengths; never throws.
  */
object Gguf {

  final case class Kv(key: String, valueType: Int, value: String)
  final case class Tensor(name: String, dims: Seq[Long], ggmlType: Int, offset: Long)

  private val MaxCount = 1 << 20
  private val MaxStr = 1 << 20

  private final class R(b: Array[Byte]) {
    var pos = 0
    def ok(n: Int): Boolean = pos + n <= b.length
    def u8(): Int = { val v = b(pos) & 0xFF; pos += 1; v }
    def u32(): Long = {
      var v = 0L; var i = 0
      while (i < 4) { v |= (b(pos + i) & 0xFFL) << (8 * i); i += 1 }
      pos += 4; v
    }
    def u64(): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v |= (b(pos + i) & 0xFFL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def f32(): Float = java.lang.Float.intBitsToFloat(u32().toInt)
    def f64(): Double = java.lang.Double.longBitsToDouble(u64())
  }

  /** (kvs, tensors) — None on any framing violation. */
  def parse(bytes: Array[Byte]): Option[(Seq[Kv], Seq[Tensor])] = {
    val r = new R(bytes)
    if (!r.ok(4) || bytes(0) != 'G' || bytes(1) != 'G' || bytes(2) != 'U' || bytes(3) != 'F')
      return None
    r.pos = 4
    if (!r.ok(4)) return None
    val version = r.u32()
    if (version != 2 && version != 3) return None
    if (!r.ok(16)) return None
    val nTensors = r.u64()
    val nKv = r.u64()
    if (nTensors < 0 || nTensors > MaxCount || nKv < 0 || nKv > MaxCount) return None

    def str(): Option[String] = {
      if (!r.ok(8)) return None
      val len = r.u64()
      if (len < 0 || len > MaxStr) return None
      if (!r.ok(len.toInt)) return None
      val s = new String(bytes, r.pos, len.toInt, java.nio.charset.StandardCharsets.UTF_8)
      r.pos += len.toInt
      Some(s)
    }

    /** One scalar of `t` stringified; None on bounds/unknown. */
    def scalar(t: Int): Option[String] = t match {
      case 0 => if (r.ok(1)) Some(r.u8().toString) else None              // u8
      case 1 => if (r.ok(1)) Some(r.u8().toByte.toString) else None      // i8
      case 2 => if (r.ok(2)) { val v = r.u8() | (r.u8() << 8); Some(v.toString) } else None
      case 3 => if (r.ok(2)) { val v = (r.u8() | (r.u8() << 8)).toShort; Some(v.toString) } else None
      case 4 => if (r.ok(4)) Some(r.u32().toString) else None            // u32
      case 5 => if (r.ok(4)) Some(r.u32().toInt.toString) else None      // i32
      case 6 => if (r.ok(4)) Some(r.f32().toString) else None            // f32
      case 7 => if (r.ok(1)) Some((r.u8() != 0).toString) else None      // bool
      case 8 => str()                                                    // string
      case 10 => if (r.ok(8)) Some(java.lang.Long.toUnsignedString(r.u64())) else None
      case 11 => if (r.ok(8)) Some(r.u64().toString) else None           // i64
      case 12 => if (r.ok(8)) Some(r.f64().toString) else None           // f64
      case _ => None
    }

    def value(t: Int): Option[String] =
      if (t == 9) { // array: elem type + count + elems, joined [a,b,…]
        if (!r.ok(12)) return None
        val et = r.u32().toInt
        val n = r.u64()
        if (et == 9 || n < 0 || n > MaxCount) return None // nested arrays refused
        val parts = Seq.newBuilder[String]
        var i = 0L
        while (i < n) {
          scalar(et) match {
            case Some(v) => parts += v
            case None => return None
          }
          i += 1
        }
        Some(parts.result().mkString("[", ",", "]"))
      } else scalar(t)

    val kvs = Seq.newBuilder[Kv]
    var k = 0L
    var alignment = 32L
    while (k < nKv) {
      val key = str() match { case Some(s) => s; case None => return None }
      if (!r.ok(4)) return None
      val t = r.u32().toInt
      val v = value(t) match { case Some(s) => s; case None => return None }
      if (key == "general.alignment") {
        val a = try v.toLong catch { case _: Exception => return None }
        if (a <= 0 || (a & (a - 1)) != 0) return None // must be a power of two
        alignment = a
      }
      kvs += Kv(key, t, v)
      k += 1
    }

    val tensors = Seq.newBuilder[Tensor]
    var ti = 0L
    while (ti < nTensors) {
      val name = str() match { case Some(s) => s; case None => return None }
      if (!r.ok(4)) return None
      val nd = r.u32().toInt
      if (nd < 0 || nd > 8) return None
      val dims = Seq.newBuilder[Long]
      var d = 0
      while (d < nd) {
        if (!r.ok(8)) return None
        dims += r.u64(); d += 1
      }
      if (!r.ok(12)) return None
      val tt = r.u32().toInt
      val off = r.u64()
      if (off < 0 || off % alignment != 0) return None
      tensors += Tensor(name, dims.result(), tt, off)
      ti += 1
    }
    Some((kvs.result(), tensors.result()))
  }

  /** Minimal spec-valid GGUF per document: the common KV types
    * (string, u32, u64, bool, f32, i32-array), the alignment key,
    * and two tensor infos with 32-aligned offsets — all id-derived
    * so the oracle replays every row. */
  def packDocsGguf(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)))
      .as[Long]
      .map { id =>
        val bos = new java.io.ByteArrayOutputStream()
        def u8(v: Int): Unit = bos.write(v & 0xFF)
        def u32(v: Long): Unit = { var i = 0; while (i < 4) { u8(((v >> (8 * i)) & 0xFF).toInt); i += 1 } }
        def u64(v: Long): Unit = { var i = 0; while (i < 8) { u8(((v >> (8 * i)) & 0xFF).toInt); i += 1 } }
        def s(v: String): Unit = {
          val b = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          u64(b.length.toLong); bos.write(b)
        }
        bos.write("GGUF".getBytes("US-ASCII"))
        u32(3) // version
        u64(2) // tensors
        u64(6) // kvs
        s("general.name"); u32(8); s(s"doc $id")
        s("general.alignment"); u32(4); u32(32)
        s("planted.count"); u32(10); u64(id)
        s("planted.flag"); u32(7); u8(if (id % 2 == 0) 1 else 0)
        s("planted.ratio"); u32(6); u32(java.lang.Float.floatToIntBits((id % 4) * 0.25f) & 0xFFFFFFFFL)
        s("planted.langs"); u32(9); u32(5); u64(2); u32(id % 5); u32(id % 5 + 1)
        val d2 = id % 7 + 1
        s("tok_embd.weight"); u32(2); u64(64); u64(d2); u32(0); u64(0)
        s("blk.0.attn_q.weight"); u32(1); u64(32); u32(8); u64(256 * d2)
        (id, bos.toByteArray)
      }
      .toDF("id", "payload")
  }

  /** Long-format rows: kind='kv' (key, value_type, value) and
    * kind='tensor' (key=name, value_type=ggml type id, value=dims
    * "[a,b]", offset). Hostile bytes emit nothing. */
  def decodeMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        parse(if (payload == null) Array.emptyByteArray else payload) match {
          case Some((kvs, tensors)) =>
            kvs.map(kv => (id, "kv", kv.key, kv.valueType, kv.value, 0L)) ++
              tensors.map(t => (id, "tensor", t.name, t.ggmlType,
                t.dims.mkString("[", ",", "]"), t.offset))
          case None => Seq.empty
        }
      }
      .toDF("id", "kind", "key", "type_id", "value", "offset")
  }
}
