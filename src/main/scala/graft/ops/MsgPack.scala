package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MessagePack decoder, from the published spec (msgpack/spec.md) —
  * CBOR's sibling and the other binary-JSON wire format corpus
  * estates actually hold (Redis dumps, Fluentd logs, API caches).
  * Same contracts as [[Cbor]]: full type coverage, hostile bytes
  * refuse and never throw, documents flatten to (path, kind, value)
  * rows in wire order.
  *
  * Coverage: the fix forms (positive/negative fixint, fixstr,
  * fixarray, fixmap), all sized integer widths (uint8-64 including
  * the 64-bit-overflow BigInt edge, int8-64), str/bin 8/16/32,
  * array/map 16/32, float32/64, nil/booleans, and the ext family
  * (fixext1-16, ext8/16/32) surfaced as (type, hex). The
  * never-used 0xc1 byte refuses, as do truncation, oversized
  * lengths, and depth > 64.
  */
object MsgPack {

  sealed trait MVal
  final case class MInt(v: Long) extends MVal
  final case class MBig(v: BigInt) extends MVal // uint64 above Long.MaxValue
  final case class MStr(v: String) extends MVal
  final case class MBin(v: Array[Byte]) extends MVal
  final case class MArr(v: Vector[MVal]) extends MVal
  final case class MMap(v: Vector[(MVal, MVal)]) extends MVal
  final case class MBool(v: Boolean) extends MVal
  case object MNil extends MVal
  final case class MFloat(width: Int, v: Double) extends MVal
  final case class MExt(extType: Int, data: Array[Byte]) extends MVal

  private object Refuse extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def refuse(): Nothing = throw Refuse

  private final class Reader(b: Array[Byte]) {
    var pos = 0
    def u8(): Int = { if (pos >= b.length) refuse(); val v = b(pos) & 0xFF; pos += 1; v }
    def beN(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | u8(); i += 1 }
      v
    }
    def take(n: Long): Array[Byte] = {
      if (n < 0 || n > (1 << 24) || pos + n > b.length) refuse()
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n.toInt)
      pos += n.toInt; out
    }
    def atEnd: Boolean = pos >= b.length
  }

  private def str(r: Reader, len: Long): MVal = {
    val bytes = r.take(len)
    val dec = StandardCharsets.UTF_8.newDecoder()
    try MStr(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
    catch { case _: java.nio.charset.CharacterCodingException => refuse() }
  }

  private def arr(r: Reader, n: Long, depth: Int): MVal = {
    if (n > (1 << 20)) refuse()
    MArr(Vector.fill(n.toInt)(item(r, depth + 1)))
  }

  private def map(r: Reader, n: Long, depth: Int): MVal = {
    if (n > (1 << 20)) refuse()
    MMap(Vector.fill(n.toInt)((item(r, depth + 1), item(r, depth + 1))))
  }

  private def ext(r: Reader, len: Long): MVal = {
    val t = r.u8()
    MExt(t.toByte.toInt, r.take(len))
  }

  private def item(r: Reader, depth: Int): MVal = {
    if (depth > 64) refuse()
    val b = r.u8()
    b match {
      case x if x <= 0x7F => MInt(x.toLong)                 // positive fixint
      case x if x >= 0xE0 => MInt(x.toByte.toLong)          // negative fixint
      case x if (x & 0xF0) == 0x80 => map(r, (x & 0x0F).toLong, depth) // fixmap
      case x if (x & 0xF0) == 0x90 => arr(r, (x & 0x0F).toLong, depth) // fixarray
      case x if (x & 0xE0) == 0xA0 => str(r, (x & 0x1F).toLong)        // fixstr
      case 0xC0 => MNil
      case 0xC1 => refuse() // never used, per spec
      case 0xC2 => MBool(false)
      case 0xC3 => MBool(true)
      case 0xC4 => MBin(r.take(r.beN(1)))
      case 0xC5 => MBin(r.take(r.beN(2)))
      case 0xC6 => MBin(r.take(r.beN(4)))
      case 0xC7 => val len = r.beN(1); ext(r, len)
      case 0xC8 => val len = r.beN(2); ext(r, len)
      case 0xC9 => val len = r.beN(4); ext(r, len)
      case 0xCA => MFloat(32, java.lang.Float.intBitsToFloat(r.beN(4).toInt).toDouble)
      case 0xCB => MFloat(64, java.lang.Double.longBitsToDouble(r.beN(8)))
      case 0xCC => MInt(r.beN(1))
      case 0xCD => MInt(r.beN(2))
      case 0xCE => MInt(r.beN(4))
      case 0xCF =>
        val v = r.beN(8)
        if (v < 0) MBig((BigInt(v >>> 1) << 1) | (v & 1)) else MInt(v)
      case 0xD0 => MInt(r.beN(1).toByte.toLong)
      case 0xD1 => MInt(r.beN(2).toShort.toLong)
      case 0xD2 => MInt(r.beN(4).toInt.toLong)
      case 0xD3 => MInt(r.beN(8))
      case 0xD4 => ext(r, 1)
      case 0xD5 => ext(r, 2)
      case 0xD6 => ext(r, 4)
      case 0xD7 => ext(r, 8)
      case 0xD8 => ext(r, 16)
      case 0xD9 => str(r, r.beN(1))
      case 0xDA => str(r, r.beN(2))
      case 0xDB => str(r, r.beN(4))
      case 0xDC => arr(r, r.beN(2), depth)
      case 0xDD => arr(r, r.beN(4), depth)
      case 0xDE => map(r, r.beN(2), depth)
      case 0xDF => map(r, r.beN(4), depth)
      case _ => refuse()
    }
  }

  /** Decode one complete item; trailing bytes refuse. */
  def decode(bytes: Array[Byte]): Option[MVal] =
    try {
      val r = new Reader(bytes)
      val v = item(r, 0)
      if (!r.atEnd) refuse()
      Some(v)
    } catch { case Refuse => None }

  // ------------------------------------------------------------------
  // Flattening + DataFrame surface (the CBOR shape)
  // ------------------------------------------------------------------

  private def hex(b: Array[Byte]): String =
    b.iterator.map(x => f"${x & 0xFF}%02x").mkString

  private[graft] def flatten(v: MVal, path: String = "$"): Vector[(String, String, String)] =
    v match {
      case MInt(n) => Vector((path, if (n < 0) "int" else "uint", n.toString))
      case MBig(n) => Vector((path, "uint", n.toString))
      case MStr(s) => Vector((path, "str", s))
      case MBin(b) => Vector((path, "bin", hex(b)))
      case MBool(b) => Vector((path, "bool", b.toString))
      case MNil => Vector((path, "nil", "nil"))
      case MFloat(w, d) => Vector((path, s"f$w", d.toString))
      case MExt(t, b) => Vector((path, "ext", s"$t:${hex(b)}"))
      case MArr(vs) => ((path, "array", vs.size.toString)) +:
        vs.zipWithIndex.flatMap { case (c, i) => flatten(c, s"$path[$i]") }
      case MMap(kvs) => ((path, "map", kvs.size.toString)) +:
        kvs.flatMap { case (k, c) =>
          val key = k match {
            case MStr(s) => s
            case MInt(n) => n.toString
            case other => hex(encodeKeyless(other))
          }
          flatten(c, s"$path.$key")
        }
    }

  private def encodeKeyless(v: MVal): Array[Byte] = v match {
    case MBin(b) => b
    case other => other.toString.getBytes(StandardCharsets.UTF_8)
  }

  /** (id, path, kind, value) per document; undecodable payloads
    * quarantine as a single kind = null row. */
  def rows(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        Option(p).flatMap(decode) match {
          case Some(v) => flatten(v).map { case (path, kind, value) => (id, path, kind, value) }
          case None => Seq((id, null: String, null: String, null: String))
        }
      })
      .toDF("id", "path", "kind", "value")
  }

  // ------------------------------------------------------------------
  // Encoder (fixture side) + gate packer
  // ------------------------------------------------------------------

  /** Spec-legal encoder for the fixture subset, preferring the
    * smallest form (the spec's recommendation). */
  def encode(v: MVal): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { out.write(((v >>> (8 * i)) & 0xFF).toInt); i -= 1 }
    }
    def go(v: MVal): Unit = v match {
      case MInt(n) if n >= 0 && n <= 0x7F => out.write(n.toInt)
      case MInt(n) if n < 0 && n >= -32 => out.write((n & 0xFF).toInt)
      case MInt(n) if n >= 0 && n <= 0xFF => out.write(0xCC); be(n, 1)
      case MInt(n) if n >= 0 && n <= 0xFFFF => out.write(0xCD); be(n, 2)
      case MInt(n) if n >= 0 && n <= 0xFFFFFFFFL => out.write(0xCE); be(n, 4)
      case MInt(n) if n >= 0 => out.write(0xCF); be(n, 8)
      case MInt(n) if n >= Byte.MinValue => out.write(0xD0); be(n & 0xFF, 1)
      case MInt(n) if n >= Short.MinValue => out.write(0xD1); be(n & 0xFFFF, 2)
      case MInt(n) if n >= Int.MinValue => out.write(0xD2); be(n & 0xFFFFFFFFL, 4)
      case MInt(n) => out.write(0xD3); be(n, 8)
      case MBig(_) => throw new IllegalArgumentException("encoder: 64-bit ints only")
      case MStr(s) =>
        val b = s.getBytes(StandardCharsets.UTF_8)
        if (b.length <= 31) out.write(0xA0 | b.length)
        else if (b.length <= 0xFF) { out.write(0xD9); be(b.length.toLong, 1) }
        else { out.write(0xDA); be(b.length.toLong, 2) }
        out.write(b, 0, b.length)
      case MBin(b) =>
        if (b.length <= 0xFF) { out.write(0xC4); be(b.length.toLong, 1) }
        else { out.write(0xC5); be(b.length.toLong, 2) }
        out.write(b, 0, b.length)
      case MBool(b) => out.write(if (b) 0xC3 else 0xC2)
      case MNil => out.write(0xC0)
      case MFloat(32, d) => out.write(0xCA); be(java.lang.Float.floatToIntBits(d.toFloat) & 0xFFFFFFFFL, 4)
      case MFloat(_, d) => out.write(0xCB); be(java.lang.Double.doubleToLongBits(d), 8)
      case MExt(t, b) =>
        b.length match {
          case 1 => out.write(0xD4)
          case 2 => out.write(0xD5)
          case 4 => out.write(0xD6)
          case 8 => out.write(0xD7)
          case 16 => out.write(0xD8)
          case n => out.write(0xC7); be(n.toLong, 1)
        }
        out.write(t & 0xFF)
        out.write(b, 0, b.length)
      case MArr(vs) =>
        if (vs.size <= 15) out.write(0x90 | vs.size)
        else { out.write(0xDC); be(vs.size.toLong, 2) }
        vs.foreach(go)
      case MMap(kvs) =>
        if (kvs.size <= 15) out.write(0x80 | kvs.size)
        else { out.write(0xDE); be(kvs.size.toLong, 2) }
        kvs.foreach { case (k, c) => go(k); go(c) }
    }
    go(v)
    out.toByteArray
  }

  /** Gate packer: one MessagePack document per row from id
    * arithmetic — the long string on odd ids forces str8 beside
    * fixstr, the float width cycles, and a fixext4 covers the ext
    * family. */
  def packDocsMsgPack(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull).select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val t = if (id % 2 == 0) s"doc$id" else s"doc$id" + ("x" * 32)
        val f = if (id % 3 == 0) MFloat(32, 0.25) else MFloat(64, 2.5)
        val doc = MMap(Vector(
          MStr("i") -> MInt(id),
          MStr("n") -> MInt(-(id % 100) - 1),
          MStr("t") -> MStr(t),
          MStr("b") -> MBin(Array(((id % 256).toInt & 0xFF).toByte,
            (((id * 7) % 256).toInt & 0xFF).toByte)),
          MStr("f") -> f,
          MStr("a") -> MArr(Vector(MBool(true), MNil, MInt(id % 5))),
          MStr("e") -> MExt(7, Array(
            ((id % 256) & 0xFF).toByte, (((id * 3) % 256) & 0xFF).toByte,
            (((id * 5) % 256) & 0xFF).toByte, (((id * 11) % 256) & 0xFF).toByte))))
        (id, encode(doc))
      })
      .toDF("doc_id", "payload")
  }
}
