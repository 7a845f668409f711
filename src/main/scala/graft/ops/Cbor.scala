package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CBOR (RFC 8949) decoder — the binary JSON of the IoT/sensor and
  * COSE estates, and the third protocol family in this repo's wire
  * rung (beside Avro's schema'd binary and protobuf's tagged wire):
  * self-describing major-type items, definite AND indefinite
  * lengths, tags, and the three float widths including the half
  * precision format CBOR made famous. From the RFC only; hostile
  * bytes refuse, never throw.
  *
  * Coverage: all eight major types — unsigned/negative integers
  * (full 64-bit), byte/text strings (definite + indefinite chunked),
  * arrays/maps (definite + indefinite), tags (surfaced, content
  * decoded), and the type-7 simples (false/true/null/undefined) +
  * half/single/double floats. Refusals: reserved additional-info
  * values, mis-typed indefinite chunks, unterminated items, depth >
  * 64, stray break.
  *
  * The DataFrame surface flattens one document to (path, kind,
  * value) rows in wire order — the shape a schema-less corpus scan
  * wants. Scale: scan-local per-row decode, bounded by item caps.
  */
object Cbor {

  sealed trait CVal
  final case class CInt(v: Long) extends CVal            // uint/nint (nint as -1-n)
  final case class CBig(neg: Boolean, v: BigInt) extends CVal // 64-bit-overflow edge
  final case class CBytes(v: Array[Byte]) extends CVal
  final case class CText(v: String) extends CVal
  final case class CArray(v: Vector[CVal]) extends CVal
  final case class CMap(v: Vector[(CVal, CVal)]) extends CVal
  final case class CTag(tag: Long, content: CVal) extends CVal
  final case class CSimple(name: String) extends CVal     // false/true/null/undefined
  final case class CFloat(width: Int, v: Double) extends CVal // 16/32/64

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

  /** Half-precision bits → double (RFC 8949 appendix D). */
  private[graft] def halfToDouble(bits: Int): Double = {
    val sign = if ((bits & 0x8000) != 0) -1.0 else 1.0
    val exp = (bits >> 10) & 0x1F
    val mant = bits & 0x3FF
    if (exp == 0) sign * mant * math.pow(2, -24)
    else if (exp == 31) { if (mant == 0) sign * Double.PositiveInfinity else Double.NaN }
    else sign * (1024 + mant) * math.pow(2, exp - 25)
  }

  /** (length-or-value, isIndefinite) for an item head. */
  private def head(r: Reader, addl: Int): (Long, Boolean) = addl match {
    case n if n < 24 => (n.toLong, false)
    case 24 => (r.beN(1), false)
    case 25 => (r.beN(2), false)
    case 26 => (r.beN(4), false)
    case 27 => (r.beN(8), false)
    case 31 => (-1L, true)
    case _ => refuse() // 28-30 reserved
  }

  private val Break = CSimple("__break__")

  private def decodeItem(r: Reader, depth: Int, allowBreak: Boolean): CVal = {
    if (depth > 64) refuse()
    val ib = r.u8()
    val major = ib >> 5
    val addl = ib & 0x1F
    major match {
      case 0 =>
        val (v, ind) = head(r, addl); if (ind) refuse()
        if (v < 0) CBig(neg = false, (BigInt(v >>> 1) << 1) | (v & 1)) else CInt(v)
      case 1 =>
        val (v, ind) = head(r, addl); if (ind) refuse()
        if (v < 0) CBig(neg = true, -1 - ((BigInt(v >>> 1) << 1) | (v & 1)))
        else CInt(-1 - v)
      case 2 | 3 =>
        val (len, ind) = head(r, addl)
        val bytes: Array[Byte] =
          if (!ind) r.take(len)
          else {
            // indefinite: definite same-major chunks until break
            val buf = new java.io.ByteArrayOutputStream()
            var done = false
            while (!done) {
              val cb = r.u8()
              if (cb == 0xFF) done = true
              else {
                if ((cb >> 5) != major) refuse()
                val (clen, cind) = head(r, cb & 0x1F)
                if (cind) refuse()
                buf.write(r.take(clen))
              }
            }
            buf.toByteArray
          }
        if (major == 2) CBytes(bytes)
        else {
          // text must be valid UTF-8 (the RFC's validity rule)
          val dec = StandardCharsets.UTF_8.newDecoder()
          try CText(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
          catch { case _: java.nio.charset.CharacterCodingException => refuse() }
        }
      case 4 =>
        val (len, ind) = head(r, addl)
        if (!ind) {
          if (len > (1 << 20)) refuse()
          CArray(Vector.fill(len.toInt)(decodeItem(r, depth + 1, allowBreak = false)))
        } else {
          val out = Vector.newBuilder[CVal]
          var v = decodeItem(r, depth + 1, allowBreak = true)
          var n = 0
          while (v != Break) {
            out += v; n += 1; if (n > (1 << 20)) refuse()
            v = decodeItem(r, depth + 1, allowBreak = true)
          }
          CArray(out.result())
        }
      case 5 =>
        val (len, ind) = head(r, addl)
        if (!ind) {
          if (len > (1 << 20)) refuse()
          CMap(Vector.fill(len.toInt)((
            decodeItem(r, depth + 1, allowBreak = false),
            decodeItem(r, depth + 1, allowBreak = false))))
        } else {
          val out = Vector.newBuilder[(CVal, CVal)]
          var k = decodeItem(r, depth + 1, allowBreak = true)
          var n = 0
          while (k != Break) {
            out += ((k, decodeItem(r, depth + 1, allowBreak = false)))
            n += 1; if (n > (1 << 20)) refuse()
            k = decodeItem(r, depth + 1, allowBreak = true)
          }
          CMap(out.result())
        }
      case 6 =>
        val (tag, ind) = head(r, addl); if (ind) refuse()
        CTag(tag, decodeItem(r, depth + 1, allowBreak = false))
      case 7 => addl match {
        case 20 => CSimple("false")
        case 21 => CSimple("true")
        case 22 => CSimple("null")
        case 23 => CSimple("undefined")
        case 25 => CFloat(16, halfToDouble(r.beN(2).toInt))
        case 26 => CFloat(32, java.lang.Float.intBitsToFloat(r.beN(4).toInt).toDouble)
        case 27 => CFloat(64, java.lang.Double.longBitsToDouble(r.beN(8)))
        case 31 => if (allowBreak) Break else refuse()
        case _ => refuse() // other simples / reserved
      }
      case _ => refuse()
    }
  }

  /** Decode one complete CBOR item; trailing bytes refuse. */
  def decode(bytes: Array[Byte]): Option[CVal] =
    try {
      val r = new Reader(bytes)
      val v = decodeItem(r, 0, allowBreak = false)
      if (!r.atEnd) refuse()
      Some(v)
    } catch { case Refuse => None }

  // ------------------------------------------------------------------
  // Flattening + DataFrame surface
  // ------------------------------------------------------------------

  private def hex(b: Array[Byte]): String =
    b.iterator.map(x => f"${x & 0xFF}%02x").mkString

  /** (path, kind, value) rows in wire order; containers emit a size
    * row and then their children. */
  private[graft] def flatten(v: CVal, path: String = "$"): Vector[(String, String, String)] =
    v match {
      case CInt(n) => Vector((path, if (n < 0) "nint" else "uint", n.toString))
      case CBig(neg, n) => Vector((path, if (neg) "nint" else "uint", n.toString))
      case CBytes(b) => Vector((path, "bytes", hex(b)))
      case CText(s) => Vector((path, "text", s))
      case CSimple(s) => Vector((path, "simple", s))
      case CFloat(w, d) => Vector((path, s"f$w", d.toString))
      case CTag(t, c) => ((path, "tag", t.toString)) +: flatten(c, s"$path!")
      case CArray(vs) => ((path, "array", vs.size.toString)) +:
        vs.zipWithIndex.flatMap { case (c, i) => flatten(c, s"$path[$i]") }
      case CMap(kvs) => ((path, "map", kvs.size.toString)) +:
        kvs.flatMap { case (k, c) =>
          val key = k match {
            case CText(s) => s
            case CInt(n) => n.toString
            case other => hex(encodeKeyless(other))
          }
          flatten(c, s"$path.$key")
        }
    }

  /** Minimal stable spelling for non-text map keys in paths. */
  private def encodeKeyless(v: CVal): Array[Byte] = v match {
    case CBytes(b) => b
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
  // Encoder (fixture/writer side) + gate packer
  // ------------------------------------------------------------------

  private def writeHead(out: java.io.ByteArrayOutputStream, major: Int, v: Long): Unit = {
    def be(n: Int): Unit = { var i = n - 1; while (i >= 0) { out.write(((v >>> (8 * i)) & 0xFF).toInt); i -= 1 } }
    if (v >= 0 && v < 24) out.write((major << 5) | v.toInt)
    else if (v >= 0 && v < 256) { out.write((major << 5) | 24); be(1) }
    else if (v >= 0 && v < 65536) { out.write((major << 5) | 25); be(2) }
    else if (v >= 0 && v < (1L << 32)) { out.write((major << 5) | 26); be(4) }
    else { out.write((major << 5) | 27); be(8) }
  }

  /** Spec-legal encoder for the fixture subset (preferred
    * serialization, plus explicit indefinite modes for the gate). */
  def encode(v: CVal, indefiniteStrings: Boolean = false,
      indefiniteContainers: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def go(v: CVal): Unit = v match {
      case CInt(n) if n >= 0 => writeHead(out, 0, n)
      case CInt(n) => writeHead(out, 1, -1 - n)
      case CBig(_, _) => throw new IllegalArgumentException("encoder: 64-bit ints only")
      case CBytes(b) => writeHead(out, 2, b.length.toLong); out.write(b, 0, b.length)
      case CText(s) =>
        val b = s.getBytes(StandardCharsets.UTF_8)
        if (!indefiniteStrings || b.length < 2) {
          writeHead(out, 3, b.length.toLong); out.write(b, 0, b.length)
        } else { // two definite chunks inside an indefinite text
          out.write((3 << 5) | 31)
          val cut = b.length / 2
          writeHead(out, 3, cut.toLong); out.write(b, 0, cut)
          writeHead(out, 3, (b.length - cut).toLong); out.write(b, cut, b.length - cut)
          out.write(0xFF)
        }
      case CArray(vs) =>
        if (!indefiniteContainers) { writeHead(out, 4, vs.size.toLong); vs.foreach(go) }
        else { out.write((4 << 5) | 31); vs.foreach(go); out.write(0xFF) }
      case CMap(kvs) =>
        writeHead(out, 5, kvs.size.toLong)
        kvs.foreach { case (k, c) => go(k); go(c) }
      case CTag(t, c) => writeHead(out, 6, t); go(c)
      case CSimple("false") => out.write(0xF4)
      case CSimple("true") => out.write(0xF5)
      case CSimple("null") => out.write(0xF6)
      case CSimple("undefined") => out.write(0xF7)
      case CSimple(other) => throw new IllegalArgumentException(s"simple: $other")
      case CFloat(16, d) => out.write(0xF9); val h = doubleToHalfExact(d)
        out.write((h >> 8) & 0xFF); out.write(h & 0xFF)
      case CFloat(32, d) => out.write(0xFA)
        val bits = java.lang.Float.floatToIntBits(d.toFloat)
        var i = 3; while (i >= 0) { out.write((bits >>> (8 * i)) & 0xFF); i -= 1 }
      case CFloat(_, d) => out.write(0xFB)
        val bits = java.lang.Double.doubleToLongBits(d)
        var i = 7; while (i >= 0) { out.write(((bits >>> (8 * i)) & 0xFF).toInt); i -= 1 }
    }
    go(v)
    out.toByteArray
  }

  /** Exact half encoding for the dyadic fixture values; refuses
    * anything the 16-bit format cannot hold exactly. */
  private[graft] def doubleToHalfExact(d: Double): Int = {
    if (d == 0.0) return 0
    val neg = d < 0
    var m = math.abs(d)
    var e = 0
    while (m < 1.0) { m *= 2; e -= 1 }
    while (m >= 2.0) { m /= 2; e += 1 }
    val mant = (m - 1.0) * 1024
    require(mant == mant.floor && e >= -14 && e <= 15, s"not half-exact: $d")
    ((if (neg) 1 else 0) << 15) | ((e + 15) << 10) | mant.toInt
  }

  /** Gate packer: one CBOR document per row from id arithmetic —
    * definite and indefinite strings/arrays alternate by id parity,
    * the float width cycles by id%3, and a tagged item covers major
    * type 6. */
  def packDocsCbor(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull).select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val f = (id % 3) match {
          case 0 => CFloat(16, 1.5)
          case 1 => CFloat(32, 0.25)
          case _ => CFloat(64, 2.5)
        }
        val doc = CMap(Vector(
          CText("i") -> CInt(id),
          CText("n") -> CInt(-(id % 100) - 1),
          CText("t") -> CText(s"doc$id"),
          CText("b") -> CBytes(Array(((id % 256).toInt & 0xFF).toByte,
            (((id * 7) % 256).toInt & 0xFF).toByte)),
          CText("f") -> f,
          CText("a") -> CArray(Vector(CSimple("true"), CSimple("null"), CInt(id % 5))),
          CText("g") -> CTag(42, CText(s"t$id"))))
        (id, encode(doc, indefiniteStrings = id % 2 == 1,
          indefiniteContainers = id % 2 == 1))
      })
      .toDF("doc_id", "payload")
  }
}
