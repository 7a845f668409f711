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
  *  - tensor DATA dequantizes for the documented block formats:
  *    F32 (type 0), F16 (type 1, IEEE half), Q8_0 (type 8: 34-byte
  *    blocks of one fp16 scale + 32 int8 quants, value = d·q — the
  *    spec'd struct in ggml-common), the classic 4/5-bit quartet
  *    (round 14), and ALL SIX K-quant super-block formats (round
  *    15): Q4_K/Q6_K first, then Q2_K/Q3_K/Q5_K/Q8_K — the complete
  *    published super-block ladder, each layout from the ggml-common
  *    struct definitions. IQ-series (importance-matrix) formats stay
  *    declared out: their codebook tables are spec DATA this repo's
  *    refuse-don't-guess contract will not reconstruct from memory.
  *
  * Surfaces: one long-format row per KV (kind='kv': key, value_type,
  * value stringified) and per tensor (kind='tensor': name, dims,
  * ggml type id, offset); [[decodeTensorValues]] adds the decoded
  * float rows for supported types. Bounds-checked reads throughout;
  * caps on counts/string lengths; never throws.
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
  def parse(bytes: Array[Byte]): Option[(Seq[Kv], Seq[Tensor])] =
    parseFull(bytes).map { case (kvs, ts, _, _) => (kvs, ts) }

  /** [[parse]] plus the data-section geometry: (kvs, tensors,
    * dataStart, alignment). `dataStart` is the end of the tensor-info
    * region rounded UP to `general.alignment` — tensor offsets are
    * relative to it (spec: "tensor_data … padded to alignment"). */
  def parseFull(bytes: Array[Byte]): Option[(Seq[Kv], Seq[Tensor], Long, Long)] = {
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
    val dataStart = ((r.pos.toLong + alignment - 1) / alignment) * alignment
    Some((kvs.result(), tensors.result(), dataStart, alignment))
  }

  // ------------------------------------------------------------------
  // Tensor dequantization (stable formats only)
  // ------------------------------------------------------------------

  /** IEEE 754 binary16 → float32 (subnormals, infinities, NaN). */
  private[graft] def halfToFloat(h: Int): Float = {
    val sign = (h >> 15) & 1
    val exp = (h >> 10) & 0x1F
    val mant = h & 0x3FF
    val bits =
      if (exp == 0) {
        if (mant == 0) sign << 31
        else { // subnormal: normalize into float32
          var e = -1
          var m = mant
          while ((m & 0x400) == 0) { m <<= 1; e += 1 }
          (sign << 31) | ((127 - 15 - e) << 23) | ((m & 0x3FF) << 13)
        }
      } else if (exp == 0x1F) (sign << 31) | 0x7F800000 | (mant << 13)
      else (sign << 31) | ((exp - 15 + 127) << 23) | (mant << 13)
    java.lang.Float.intBitsToFloat(bits)
  }

  /** float32 → binary16 bits, round-to-nearest-even (the writer
    * half; exact for the gate's quarter-unit plants). */
  private[graft] def floatToHalf(f: Float): Int = {
    val bits = java.lang.Float.floatToIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val exp32 = (bits >> 23) & 0xFF
    val mant = bits & 0x7FFFFF
    if (exp32 == 0xFF) return sign | 0x7C00 | (if (mant != 0) 0x200 else 0) // inf/nan
    val e = exp32 - 127 + 15
    if (e >= 0x1F) sign | 0x7C00 // overflow -> inf
    else if (e <= 0) {
      if (e < -10) sign // underflows to signed zero
      else {
        // subnormal half: implicit bit restored, RNE on dropped bits
        val m24 = mant | 0x800000
        val shift = 14 - e // in [14, 24]
        val kept = m24 >>> shift
        val rem = m24 & ((1 << shift) - 1)
        val halfUnit = 1 << (shift - 1)
        sign | (kept + (if (rem > halfUnit || (rem == halfUnit && (kept & 1) == 1)) 1 else 0))
      }
    } else {
      // normal: 23 -> 10 mantissa bits, RNE; a mantissa carry rolls
      // into the exponent arithmetically ((e<<10) + 0x400 = (e+1)<<10)
      val kept = mant >>> 13
      val rem = mant & 0x1FFF
      val r = kept + (if (rem > 0x1000 || (rem == 0x1000 && (kept & 1) == 1)) 1 else 0)
      sign | ((e << 10) + r)
    }
  }

  /** Decode one tensor's data to row-major float32. Supported ggml
    * types: 0 = F32, 1 = F16, and the stable 32-wide block formats —
    * 2 = Q4_0 (fp16 d, packed nibbles, v = d·(q−8)), 3 = Q4_1 (+fp16
    * min, v = d·q + m), 6 = Q5_0 (u32 high-bit word, v = d·(q−16)),
    * 7 = Q5_1 (min + high bits, v = d·q + m), 8 = Q8_0 (fp16 d + 32
    * int8) — the formats real GGUF files overwhelmingly contain.
    * 12 = Q4_K / 14 = Q6_K / 10 = Q2_K / 11 = Q3_K / 13 = Q5_K /
    * 15 = Q8_K (256-wide super-blocks, round 15). None: unsupported
    * type (IQ formats: declared out), bounds violation, or a
    * block-format element count not a multiple of the block width. */
  def dequantize(bytes: Array[Byte], t: Tensor, dataStart: Long): Option[Array[Float]] = {
    val n0 = t.dims.foldLeft(1L)(_ * _)
    if (n0 < 0 || n0 > (1L << 24)) return None
    val n = n0.toInt
    val base = dataStart + t.offset
    if (base < 0 || base > bytes.length) return None
    def u16at(p: Long): Int = (bytes(p.toInt) & 0xFF) | ((bytes(p.toInt + 1) & 0xFF) << 8)
    t.ggmlType match {
      case 0 => // F32
        if (base + 4L * n > bytes.length) return None
        val out = new Array[Float](n)
        var i = 0
        while (i < n) {
          var v = 0
          var j = 0
          while (j < 4) { v |= (bytes(base.toInt + 4 * i + j) & 0xFF) << (8 * j); j += 1 }
          out(i) = java.lang.Float.intBitsToFloat(v)
          i += 1
        }
        Some(out)
      case 1 => // F16
        if (base + 2L * n > bytes.length) return None
        val out = new Array[Float](n)
        var i = 0
        while (i < n) { out(i) = halfToFloat(u16at(base + 2L * i)); i += 1 }
        Some(out)
      case 8 => // Q8_0: 34-byte blocks (fp16 d + int8 qs[32])
        if (n % 32 != 0) return None
        val blocks = n / 32
        if (base + 34L * blocks > bytes.length) return None
        val out = new Array[Float](n)
        var b = 0
        while (b < blocks) {
          val bp = base + 34L * b
          val d = halfToFloat(u16at(bp))
          var i = 0
          while (i < 32) {
            out(b * 32 + i) = d * bytes(bp.toInt + 2 + i) // int8 signed
            i += 1
          }
          b += 1
        }
        Some(out)
      case 2 => // Q4_0: 18-byte blocks (fp16 d + 16 packed nibbles); v = d·(q−8)
        if (n % 32 != 0) return None
        val blocks = n / 32
        if (base + 18L * blocks > bytes.length) return None
        val out = new Array[Float](n)
        var b = 0
        while (b < blocks) {
          val bp = (base + 18L * b).toInt
          val d = halfToFloat(u16at(bp))
          var j = 0
          while (j < 16) {
            // element j rides the LOW nibble of qs[j], element j+16
            // the HIGH nibble — the ggml split-half block layout
            val q = bytes(bp + 2 + j) & 0xFF
            out(b * 32 + j) = d * ((q & 0x0F) - 8)
            out(b * 32 + j + 16) = d * ((q >>> 4) - 8)
            j += 1
          }
          b += 1
        }
        Some(out)
      case 3 => // Q4_1: 20-byte blocks (fp16 d + fp16 m + nibbles); v = d·q + m
        if (n % 32 != 0) return None
        val blocks = n / 32
        if (base + 20L * blocks > bytes.length) return None
        val out = new Array[Float](n)
        var b = 0
        while (b < blocks) {
          val bp = (base + 20L * b).toInt
          val d = halfToFloat(u16at(bp))
          val m = halfToFloat(u16at(bp + 2))
          var j = 0
          while (j < 16) {
            val q = bytes(bp + 4 + j) & 0xFF
            out(b * 32 + j) = d * (q & 0x0F) + m
            out(b * 32 + j + 16) = d * (q >>> 4) + m
            j += 1
          }
          b += 1
        }
        Some(out)
      case 6 => // Q5_0: 22-byte blocks (fp16 d + u32 qh + nibbles); v = d·(q−16)
        if (n % 32 != 0) return None
        val blocks = n / 32
        if (base + 22L * blocks > bytes.length) return None
        val out = new Array[Float](n)
        var b = 0
        while (b < blocks) {
          val bp = (base + 22L * b).toInt
          val d = halfToFloat(u16at(bp))
          var qh = 0L
          var k = 0
          while (k < 4) { qh |= (bytes(bp + 2 + k) & 0xFFL) << (8 * k); k += 1 }
          var j = 0
          while (j < 16) {
            // qh bit j is element j's 5th bit; bit j+16 element j+16's
            val q = bytes(bp + 6 + j) & 0xFF
            val lo = (q & 0x0F) | ((((qh >>> j) & 1L) << 4).toInt)
            val hi = (q >>> 4) | ((((qh >>> (j + 16)) & 1L) << 4).toInt)
            out(b * 32 + j) = d * (lo - 16)
            out(b * 32 + j + 16) = d * (hi - 16)
            j += 1
          }
          b += 1
        }
        Some(out)
      case 7 => // Q5_1: 24-byte blocks (fp16 d + fp16 m + u32 qh + nibbles); v = d·q + m
        if (n % 32 != 0) return None
        val blocks = n / 32
        if (base + 24L * blocks > bytes.length) return None
        val out = new Array[Float](n)
        var b = 0
        while (b < blocks) {
          val bp = (base + 24L * b).toInt
          val d = halfToFloat(u16at(bp))
          val m = halfToFloat(u16at(bp + 2))
          var qh = 0L
          var k = 0
          while (k < 4) { qh |= (bytes(bp + 4 + k) & 0xFFL) << (8 * k); k += 1 }
          var j = 0
          while (j < 16) {
            val q = bytes(bp + 8 + j) & 0xFF
            val lo = (q & 0x0F) | ((((qh >>> j) & 1L) << 4).toInt)
            val hi = (q >>> 4) | ((((qh >>> (j + 16)) & 1L) << 4).toInt)
            out(b * 32 + j) = d * lo + m
            out(b * 32 + j + 16) = d * hi + m
            j += 1
          }
          b += 1
        }
        Some(out)
      case 12 => // Q4_K: 144-byte super-blocks of 256 (fp16 d + fp16 dmin
        // + 12 packed 6-bit scale/min bytes + 128 nibble bytes);
        // v = d·sc·q − dmin·m per 32-wide sub-block (round 15)
        if (n % 256 != 0) return None
        val blocks = n / 256
        if (base + 144L * blocks > bytes.length) return None
        val out = new Array[Float](n)
        var b = 0
        while (b < blocks) {
          val bp = (base + 144L * b).toInt
          val d = halfToFloat(u16at(bp))
          val dmin = halfToFloat(u16at(bp + 2))
          // the ggml 6-bit packing: bytes 0-3 carry sc0-3 (low 6) +
          // sc4-7's high 2 bits; bytes 4-7 m0-3 + m4-7's high bits;
          // bytes 8-11 the low nibbles of sc4-7 | m4-7
          def scaleMin(j: Int): (Int, Int) = {
            def q(k: Int): Int = bytes(bp + 4 + k) & 0xFF
            if (j < 4) (q(j) & 63, q(j + 4) & 63)
            else ((q(j + 4) & 0xF) | ((q(j - 4) >> 6) << 4),
              (q(j + 4) >> 4) | ((q(j) >> 6) << 4))
          }
          var c = 0
          while (c < 4) {
            val (sc1, m1) = scaleMin(2 * c)
            val (sc2, m2) = scaleMin(2 * c + 1)
            val d1 = d * sc1; val mm1 = dmin * m1
            val d2 = d * sc2; val mm2 = dmin * m2
            var l = 0
            while (l < 32) {
              val q = bytes(bp + 16 + 32 * c + l) & 0xFF
              out(b * 256 + 64 * c + l) = d1 * (q & 0xF) - mm1
              out(b * 256 + 64 * c + 32 + l) = d2 * (q >>> 4) - mm2
              l += 1
            }
            c += 1
          }
          b += 1
        }
        Some(out)
      case 14 => // Q6_K: 210-byte super-blocks (ql[128] low nibbles +
        // qh[64] 2-bit highs + 16 SIGNED int8 scales + fp16 d at the
        // END); v = d·scale·(q−32) per 16-wide scale group (round 15)
        if (n % 256 != 0) return None
        val blocks = n / 256
        if (base + 210L * blocks > bytes.length) return None
        val out = new Array[Float](n)
        var b = 0
        while (b < blocks) {
          val bp = (base + 210L * b).toInt
          val d = halfToFloat(u16at(bp + 208))
          var h = 0
          while (h < 2) {
            val qlp = bp + 64 * h
            val qhp = bp + 128 + 32 * h
            val scp = bp + 192 + 8 * h
            var l = 0
            while (l < 32) {
              val is = l / 16
              val hb = bytes(qhp + l) & 0xFF
              val q1 = ((bytes(qlp + l) & 0xF) | ((hb & 3) << 4)) - 32
              val q2 = ((bytes(qlp + 32 + l) & 0xF) | (((hb >> 2) & 3) << 4)) - 32
              val q3 = (((bytes(qlp + l) & 0xFF) >>> 4) | (((hb >> 4) & 3) << 4)) - 32
              val q4 = (((bytes(qlp + 32 + l) & 0xFF) >>> 4) | (((hb >> 6) & 3) << 4)) - 32
              val o = b * 256 + 128 * h
              out(o + l) = d * bytes(scp + is) * q1
              out(o + l + 32) = d * bytes(scp + is + 2) * q2
              out(o + l + 64) = d * bytes(scp + is + 4) * q3
              out(o + l + 96) = d * bytes(scp + is + 6) * q4
              l += 1
            }
            h += 1
          }
          b += 1
        }
        Some(out)
      case 10 => // Q2_K: 84-byte super-blocks (16 scale|min nibble
        // bytes + 64 2-bit quant bytes + fp16 d + fp16 dmin);
        // v = d·(sc&0xF)·q − dmin·(sc>>4) per 16-wide group, the
        // group index running in output order (round 15 continuation)
        if (n % 256 != 0) return None
        val blocks = n / 256
        if (base + 84L * blocks > bytes.length) return None
        val out = new Array[Float](n)
        var b = 0
        while (b < blocks) {
          val bp = (base + 84L * b).toInt
          val d = halfToFloat(u16at(bp + 80))
          val dmin = halfToFloat(u16at(bp + 82))
          var e = 0
          while (e < 256) {
            val sc = bytes(bp + (e >> 4)) & 0xFF
            val qb = bytes(bp + 16 + 32 * (e >> 7) + (e & 31)) & 0xFF
            val q = (qb >>> (2 * ((e & 127) >> 5))) & 3
            out(b * 256 + e) = d * (sc & 0xF) * q - dmin * (sc >>> 4)
            e += 1
          }
          b += 1
        }
        Some(out)
      case 11 => // Q3_K: 110-byte super-blocks (32 high-bit mask
        // bytes + 64 low-2-bit quant bytes + 12 packed 6-bit scales
        // + fp16 d); v = d·(sc−32)·(low2 − 4 + 4·hbit); the scale
        // words interleave per the ggml kmask unpack
        if (n % 256 != 0) return None
        val blocks = n / 256
        if (base + 110L * blocks > bytes.length) return None
        val out = new Array[Float](n)
        var b = 0
        while (b < blocks) {
          val bp = (base + 110L * b).toInt
          val d = halfToFloat(u16at(bp + 108))
          def s8(k: Int): Int = bytes(bp + 96 + k) & 0xFF
          val us = new Array[Int](16)
          var k = 0
          while (k < 4) {
            us(k) = (s8(k) & 0xF) | ((s8(8 + k) & 3) << 4)
            us(4 + k) = (s8(4 + k) & 0xF) | (((s8(8 + k) >> 2) & 3) << 4)
            us(8 + k) = (s8(k) >>> 4) | (((s8(8 + k) >> 4) & 3) << 4)
            us(12 + k) = (s8(4 + k) >>> 4) | (((s8(8 + k) >> 6) & 3) << 4)
            k += 1
          }
          var e = 0
          while (e < 256) {
            val qb = bytes(bp + 32 + 32 * (e >> 7) + (e & 31)) & 0xFF
            val low = (qb >>> (2 * ((e & 127) >> 5))) & 3
            val hb = (bytes(bp + (e & 31)) >>> (e >> 5)) & 1
            out(b * 256 + e) = d * (us(e >> 4) - 32) * (low - 4 + 4 * hb)
            e += 1
          }
          b += 1
        }
        Some(out)
      case 13 => // Q5_K: 176-byte super-blocks (fp16 d + fp16 dmin +
        // the Q4_K 6-bit scale/min packing + 32 high-bit bytes + 128
        // nibble bytes); v = d·sc·(nibble | hbit<<4) − dmin·m
        if (n % 256 != 0) return None
        val blocks = n / 256
        if (base + 176L * blocks > bytes.length) return None
        val out = new Array[Float](n)
        var b = 0
        while (b < blocks) {
          val bp = (base + 176L * b).toInt
          val d = halfToFloat(u16at(bp))
          val dmin = halfToFloat(u16at(bp + 2))
          def q(k: Int): Int = bytes(bp + 4 + k) & 0xFF
          def scaleMin(j: Int): (Int, Int) =
            if (j < 4) (q(j) & 63, q(j + 4) & 63)
            else ((q(j + 4) & 0xF) | ((q(j - 4) >> 6) << 4),
              (q(j + 4) >> 4) | ((q(j) >> 6) << 4))
          var jj = 0
          while (jj < 4) {
            val (sc1, m1) = scaleMin(2 * jj)
            val (sc2, m2) = scaleMin(2 * jj + 1)
            val d1 = d * sc1; val mm1 = dmin * m1
            val d2 = d * sc2; val mm2 = dmin * m2
            var l = 0
            while (l < 32) {
              val ql = bytes(bp + 48 + 32 * jj + l) & 0xFF
              val hb = bytes(bp + 16 + l) & 0xFF
              val q1 = (ql & 0xF) | (((hb >>> (2 * jj)) & 1) << 4)
              val q2 = (ql >>> 4) | (((hb >>> (2 * jj + 1)) & 1) << 4)
              out(b * 256 + 64 * jj + l) = d1 * q1 - mm1
              out(b * 256 + 64 * jj + 32 + l) = d2 * q2 - mm2
              l += 1
            }
            jj += 1
          }
          b += 1
        }
        Some(out)
      case 15 => // Q8_K: 292-byte super-blocks (f32 d + 256 int8 +
        // 16 int16 group sums — the sums are a dot-product aid,
        // redundant for dequantization); v = d·q
        if (n % 256 != 0) return None
        val blocks = n / 256
        if (base + 292L * blocks > bytes.length) return None
        val out = new Array[Float](n)
        var b = 0
        while (b < blocks) {
          val bp = (base + 292L * b).toInt
          var v = 0
          var j = 0
          while (j < 4) { v |= (bytes(bp + j) & 0xFF) << (8 * j); j += 1 }
          val d = java.lang.Float.intBitsToFloat(v)
          var e = 0
          while (e < 256) { out(b * 256 + e) = d * bytes(bp + 4 + e); e += 1 }
          b += 1
        }
        Some(out)
      case _ => None // unknown/legacy types: refuse, don't guess
    }
  }

  /** Spec-valid GGUF per document: the common KV types (string, u32,
    * u64, bool, f32, i32-array), the alignment key, four tensor
    * infos with 32-aligned offsets, and a REAL data section (round
    * 13): an F32 matrix, a Q8_0 block tensor (fp16 scale 0.5 exact,
    * int8 quants), an F16 vector, and (round 14) one block of the
    * classic 4/5-bit formats cycling Q4_0/Q4_1/Q5_0/Q5_1 by id —
    * every value quarter-unit id-derived (d = 0.5, m = 0.25, both
    * exact in binary16) so the oracle replays the dequantized floats
    * through the exact-IEEE floor(v·2³⁰) serialization. */
  def packDocsGguf(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)))
      .as[Long]
      .map { id =>
        val bos = new java.io.ByteArrayOutputStream()
        def u8(v: Int): Unit = bos.write(v & 0xFF)
        def u16(v: Int): Unit = { u8(v & 0xFF); u8((v >> 8) & 0xFF) }
        def u32(v: Long): Unit = { var i = 0; while (i < 4) { u8(((v >> (8 * i)) & 0xFF).toInt); i += 1 } }
        def u64(v: Long): Unit = { var i = 0; while (i < 8) { u8(((v >> (8 * i)) & 0xFF).toInt); i += 1 } }
        def s(v: String): Unit = {
          val b = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          u64(b.length.toLong); bos.write(b)
        }
        bos.write("GGUF".getBytes("US-ASCII"))
        u32(3) // version
        u64(5) // tensors
        u64(6) // kvs
        s("general.name"); u32(8); s(s"doc $id")
        s("general.alignment"); u32(4); u32(32)
        s("planted.count"); u32(10); u64(id)
        s("planted.flag"); u32(7); u8(if (id % 2 == 0) 1 else 0)
        s("planted.ratio"); u32(6); u32(java.lang.Float.floatToIntBits((id % 4) * 0.25f) & 0xFFFFFFFFL)
        s("planted.langs"); u32(9); u32(5); u64(2); u32(id % 5); u32(id % 5 + 1)
        val d2 = id % 7 + 1
        // the 4/5-bit block format cycles by id: Q4_0 / Q4_1 / Q5_0 / Q5_1
        val qt = (id % 4) match { case 0 => 2; case 1 => 3; case 2 => 6; case _ => 7 }
        // layout: F32 64*d2 floats at 0; Q8_0 one 32-wide block at
        // 256*d2 (34 bytes); F16 16 halves at 256*d2 + 64 (aligned);
        // one 4/5-bit block at 256*d2 + 96 (18–24 bytes)
        // the K-quant super-block cycles by id through ALL six
        // supported formats (round 15): Q4_K, Q6_K, Q2_K, Q3_K,
        // Q5_K, Q8_K
        val kt = (id % 6) match {
          case 0 => 12; case 1 => 14; case 2 => 10
          case 3 => 11; case 4 => 13; case _ => 15
        }
        s("tok_embd.weight"); u32(2); u64(64); u64(d2); u32(0); u64(0)
        s("blk.0.attn_q.weight"); u32(1); u64(32); u32(8); u64(256 * d2)
        s("output_norm.weight"); u32(1); u64(16); u32(1); u64(256 * d2 + 64)
        s("blk.0.ffn_up.weight"); u32(1); u64(32); u32(qt); u64(256 * d2 + 96)
        s("blk.0.ffn_down.weight"); u32(1); u64(256); u32(kt); u64(256 * d2 + 128)
        // data section: pad to general.alignment, then the tensors
        while (bos.size() % 32 != 0) u8(0)
        val dataStart = bos.size()
        var i = 0
        while (i < 64 * d2) {
          u32(java.lang.Float.floatToIntBits(((id + i) % 17 - 8) * 0.25f) & 0xFFFFFFFFL)
          i += 1
        }
        u16(floatToHalf(0.5f)) // Q8_0 scale d = 0.5, exact in binary16
        i = 0
        while (i < 32) { u8((((id + i) % 255) - 127).toInt & 0xFF); i += 1 }
        i = 0
        while (i < 30) { u8(0); i += 1 } // pad 34-byte block to the 64 boundary
        i = 0
        while (i < 16) { u16(floatToHalf((((id + i) % 9) - 4) * 0.25f)); i += 1 }
        // the 4/5-bit block: element j's quant q_j = (id+j) mod 16
        // (4-bit) or mod 32 (5-bit); ggml split-half nibble packing
        // (element j low nibble of qs[j], element j+16 high), the
        // 5th bits packed little-endian into the qh word
        u16(floatToHalf(0.5f)) // d = 0.5, exact
        if (qt == 3 || qt == 7) u16(floatToHalf(0.25f)) // m = 0.25, exact
        val qmod = if (qt == 2 || qt == 3) 16 else 32
        if (qt == 6 || qt == 7) {
          var qh = 0L
          i = 0
          while (i < 32) {
            if ((((id + i) % qmod) & 0x10) != 0) qh |= 1L << i
            i += 1
          }
          u32(qh)
        }
        i = 0
        while (i < 16) {
          val lo = ((id + i) % qmod).toInt & 0x0F
          val hi = ((id + i + 16) % qmod).toInt & 0x0F
          u8(lo | (hi << 4))
          i += 1
        }
        // the K-quant super-block at data offset 256*d2 + 128:
        // Q4_K plants 6-bit sub-block scales/mins sc_s = (id+5s)%64,
        // m_s = (3id+s)%64 and nibble quants q_e = (id+e)%16;
        // Q6_K plants signed scales ((id+k)%32)−16 and 6-bit quants
        // ((id+e)%64)−32 — d = 0.5 (and dmin = 0.25) exact in
        // binary16, so every dequantized value is an exact multiple
        // of 0.25 and the oracle replays floor(v·2³⁰) losslessly
        while (bos.size() - dataStart < 256 * d2 + 128) u8(0)
        // the Q4_K/Q5_K shared 12-byte 6-bit scale/min packing:
        // sc_s = (id+5s)%64, m_s = (3id+s)%64 per 32-wide sub-block
        def writeScaleMin12(): Unit = {
          val sc = Array.tabulate(8)(j => ((id + 5 * j) % 64).toInt)
          val mn = Array.tabulate(8)(j => ((id * 3 + j) % 64).toInt)
          var j = 0
          while (j < 4) { u8((sc(j) & 63) | ((sc(j + 4) >> 4) << 6)); j += 1 }
          j = 0
          while (j < 4) { u8((mn(j) & 63) | ((mn(j + 4) >> 4) << 6)); j += 1 }
          j = 0
          while (j < 4) { u8((sc(j + 4) & 0xF) | ((mn(j + 4) & 0xF) << 4)); j += 1 }
        }
        // the Q2_K/Q3_K shared 2-bit quant geometry: element
        // e = 128·half + 32·j + l lands in byte 32·half + l at bit 2j
        def write2BitQs(qOf: Int => Int): Unit = {
          var bq = 0
          while (bq < 64) {
            val half = bq / 32; val l = bq % 32
            var byteV = 0
            var j = 0
            while (j < 4) { byteV |= qOf(128 * half + 32 * j + l) << (2 * j); j += 1 }
            u8(byteV)
            bq += 1
          }
        }
        if (kt == 12) {
          u16(floatToHalf(0.5f)); u16(floatToHalf(0.25f))
          writeScaleMin12()
          var c = 0
          while (c < 4) {
            var l = 0
            while (l < 32) {
              val lo = ((id + 64 * c + l) % 16).toInt
              val hi = ((id + 64 * c + 32 + l) % 16).toInt
              u8(lo | (hi << 4))
              l += 1
            }
            c += 1
          }
        } else if (kt == 10) {
          // Q2_K plants sc_g = (id+g)%16 / m_g = (3id+g)%16 per
          // 16-wide group, quants q_e = (id+e)%4
          var g = 0
          while (g < 16) {
            u8((((id + g) % 16) | (((id * 3 + g) % 16) << 4)).toInt)
            g += 1
          }
          write2BitQs(e => ((id + e) % 4).toInt)
          u16(floatToHalf(0.5f)); u16(floatToHalf(0.25f))
        } else if (kt == 11) {
          // Q3_K plants us_g = (id+g)%64 scales and signed quants
          // q_e = ((id+e)%8)−4: code = q+4, high bit to hmask
          var l = 0
          while (l < 32) {
            var hv = 0
            var p = 0
            while (p < 8) { hv |= ((((id + 32 * p + l) % 8) >> 2) << p).toInt; p += 1 }
            u8(hv)
            l += 1
          }
          write2BitQs(e => (((id + e) % 8) & 3).toInt)
          def us(g: Int): Int = ((id + g) % 64).toInt
          var k = 0
          while (k < 4) { u8((us(k) & 0xF) | ((us(8 + k) & 0xF) << 4)); k += 1 }
          k = 0
          while (k < 4) { u8((us(4 + k) & 0xF) | ((us(12 + k) & 0xF) << 4)); k += 1 }
          k = 0
          while (k < 4) {
            u8(((us(k) >> 4) & 3) | (((us(4 + k) >> 4) & 3) << 2) |
              (((us(8 + k) >> 4) & 3) << 4) | (((us(12 + k) >> 4) & 3) << 6))
            k += 1
          }
          u16(floatToHalf(0.5f))
        } else if (kt == 13) {
          // Q5_K: the Q4_K scale/min plant with 5-bit quants
          // q_e = (id+e)%32, high bits in qh bit pairs per j-group
          u16(floatToHalf(0.5f)); u16(floatToHalf(0.25f))
          writeScaleMin12()
          var l = 0
          while (l < 32) {
            var hv = 0
            var jj = 0
            while (jj < 4) {
              if ((((id + 64 * jj + l) % 32) & 0x10) != 0) hv |= 1 << (2 * jj)
              if ((((id + 64 * jj + 32 + l) % 32) & 0x10) != 0) hv |= 1 << (2 * jj + 1)
              jj += 1
            }
            u8(hv)
            l += 1
          }
          var jj = 0
          while (jj < 4) {
            var l2 = 0
            while (l2 < 32) {
              val lo = ((id + 64 * jj + l2) % 32).toInt & 0xF
              val hi = ((id + 64 * jj + 32 + l2) % 32).toInt & 0xF
              u8(lo | (hi << 4))
              l2 += 1
            }
            jj += 1
          }
        } else if (kt == 15) {
          // Q8_K: f32 d = 0.5, q_e = ((id+e)%255)−127, real group sums
          u32(java.lang.Float.floatToIntBits(0.5f) & 0xFFFFFFFFL)
          var e = 0
          while (e < 256) { u8((((id + e) % 255) - 127).toInt & 0xFF); e += 1 }
          var g = 0
          while (g < 16) {
            var sum = 0
            var t = 0
            while (t < 16) { sum += (((id + 16 * g + t) % 255) - 127).toInt; t += 1 }
            u16(sum & 0xFFFF)
            g += 1
          }
        } else {
          def q6(e: Int): Int = ((id + e) % 64).toInt
          val ql = new Array[Int](128)
          val qh = new Array[Int](64)
          var h = 0
          while (h < 2) {
            var l = 0
            while (l < 32) {
              val q1 = q6(128 * h + l); val q2 = q6(128 * h + 32 + l)
              val q3 = q6(128 * h + 64 + l); val q4 = q6(128 * h + 96 + l)
              ql(64 * h + l) = (q1 & 0xF) | ((q3 & 0xF) << 4)
              ql(64 * h + 32 + l) = (q2 & 0xF) | ((q4 & 0xF) << 4)
              qh(32 * h + l) = ((q1 >> 4) & 3) | (((q2 >> 4) & 3) << 2) |
                (((q3 >> 4) & 3) << 4) | (((q4 >> 4) & 3) << 6)
              l += 1
            }
            h += 1
          }
          ql.foreach(u8); qh.foreach(u8)
          var k = 0
          while (k < 16) { u8((((id + k) % 32) - 16).toInt & 0xFF); k += 1 }
          u16(floatToHalf(0.5f))
        }
        (id, bos.toByteArray)
      }
      .toDF("id", "payload")
  }

  /** One row per DEQUANTIZABLE tensor: (id, name, type_id, n_values,
    * values float array, row-major). Unsupported types (K-quants) and
    * hostile bytes emit nothing — the refuse-don't-guess contract.
    * Scan-local flatMap, the safetensors/NPY seam shape. */
  def decodeTensorValues(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val bytes = if (payload == null) Array.emptyByteArray else payload
        parseFull(bytes) match {
          case Some((_, tensors, dataStart, _)) =>
            tensors.flatMap { t =>
              dequantize(bytes, t, dataStart).map(vs =>
                (id, t.name, t.ggmlType, vs.length.toLong, vs))
            }
          case None => Seq.empty
        }
      }
      .toDF("id", "name", "type_id", "n_values", "values")
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
