package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** netCDF classic reader (CDF-1/2/5) — the OTHER scientific
  * container beside [[Hdf5]] (netCDF-4 IS HDF5 and already reads
  * through that walk; this covers the classic format the older half
  * of published climate/sensor/feature corpora still ships).
  * Everything from the PUBLISHED "NetCDF Classic Format
  * Specification" alone; the reference repo has no analogue.
  *
  * Format (all multi-byte values BIG-endian):
  *  - magic `CDF` + version byte: 1 = classic (32-bit offsets),
  *    2 = 64-bit offsets, 5 = 64-bit data (CDF-5 widths);
  *  - `numrecs` (the record-dimension count; the STREAMING sentinel
  *    0xFFFFFFFF refuses — an unbounded record count cannot be
  *    decoded from a byte payload);
  *  - dimension list (tag 0x0A): name + length, length 0 marks THE
  *    record dimension (at most one);
  *  - global and per-variable attribute lists (tag 0x0C): parsed
  *    past, not surfaced (names/types validated, values skipped);
  *  - variable list (tag 0x0B): name, dimension ids, attributes,
  *    external type, vsize, begin offset (width per version);
  *  - data: fixed-size variables contiguous at `begin`; RECORD
  *    variables interleave per record — record r of variable v
  *    lives at `begin(v) + r · recsize` where recsize is the sum of
  *    all record variables' per-record sizes (the spec's padding
  *    rule: each per-record slab pads to 4; the SPECIAL CASE of
  *    exactly one record variable drops that padding).
  *
  * Types: byte/short/int/float/double (+ CDF-5's unsigned and
  * 64-bit widths); `char` variables are skipped (text payloads are
  * not numeric data — refusing by omission beats guessing an
  * encoding). Values surface as doubles, the [[Hdf5]] contract.
  *
  * Scale shape: pure bytes→rows in `flatMap`, caps (64 vars, 2^22
  * elements, rank ≤ 4), hostile bytes yield nothing.
  */
object Netcdf {

  final case class Var(name: String, typeName: String, dims: Seq[Long],
      values: Array[Double])

  private object Bad extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bad(): Nothing = throw Bad

  private final class B(val b: Array[Byte]) {
    var p = 0
    def u8(): Int = { if (p >= b.length) bad(); val v = b(p) & 0xFF; p += 1; v }
    def u32(): Long = {
      if (p + 4 > b.length) bad()
      val v = ((b(p) & 0xFFL) << 24) | ((b(p + 1) & 0xFFL) << 16) |
        ((b(p + 2) & 0xFFL) << 8) | (b(p + 3) & 0xFFL)
      p += 4; v
    }
    def i64(): Long = { val hi = u32(); (hi << 32) | u32() }
    def bytes(n: Int): Array[Byte] = {
      if (n < 0 || p + n > b.length) bad()
      val out = java.util.Arrays.copyOfRange(b, p, p + n); p += n; out
    }
    def skip(n: Long): Unit = {
      if (n < 0 || p + n > b.length) bad(); p += n.toInt
    }
  }

  private def pad4(n: Long): Long = (n + 3) & ~3L

  /** External type id → (label, byte size); None = char or unknown. */
  private def typeOf(t: Long, cdf5: Boolean): Option[(String, Int)] = t match {
    case 1 => Some(("byte", 1))
    case 2 => None // char: text, not numeric data
    case 3 => Some(("short", 2))
    case 4 => Some(("int", 4))
    case 5 => Some(("float", 4))
    case 6 => Some(("double", 8))
    case 7 if cdf5 => Some(("ubyte", 1))
    case 8 if cdf5 => Some(("ushort", 2))
    case 9 if cdf5 => Some(("uint", 4))
    case 10 if cdf5 => Some(("int64", 8))
    case 11 if cdf5 => Some(("uint64", 8))
    case _ => None
  }

  private def sizeOfType(t: Long): Long = t match {
    case 1 | 2 | 7 => 1L
    case 3 | 8 => 2L
    case 4 | 5 | 9 => 4L
    case 6 | 10 | 11 => 8L
    case _ => bad()
  }

  def parse(bytes: Array[Byte]): Option[Seq[Var]] =
    try {
      val r = new B(bytes)
      if (r.u8() != 'C' || r.u8() != 'D' || r.u8() != 'F') return None
      val version = r.u8()
      if (version != 1 && version != 2 && version != 5) return None
      val cdf5 = version == 5
      def size(): Long = if (cdf5) r.i64() else r.u32()
      def offset(): Long = if (version == 1) r.u32() else r.i64()
      val numrecs = size()
      // 0xFFFFFFFF is the STREAMING sentinel — an unbounded record
      // count; everything outside a sane bound refuses with it
      if (numrecs < 0 || numrecs > (1 << 20)) bad()
      def name(): String = {
        val n = size()
        if (n > 1024) bad()
        val s = new String(r.bytes(n.toInt), java.nio.charset.StandardCharsets.UTF_8)
        r.skip(pad4(n) - n)
        s
      }
      // dim_list
      val dimTag = size(); val dimCount = size()
      if (!(dimTag == 0x0A || (dimTag == 0 && dimCount == 0))) bad()
      if (dimCount > 1024) bad()
      val dims = (0L until dimCount).map { _ =>
        val nm = name(); val len = size()
        (nm, len)
      }
      def attList(): Unit = {
        val tag = size(); val count = size()
        if (!(tag == 0x0C || (tag == 0 && count == 0))) bad()
        if (count > 4096) bad()
        (0L until count).foreach { _ =>
          name()
          val t = size()
          val nelems = size()
          r.skip(pad4(nelems * sizeOfType(t)))
        }
      }
      attList() // global attributes
      // var_list
      val varTag = size(); val varCount = size()
      if (!(varTag == 0x0B || (varTag == 0 && varCount == 0))) bad()
      if (varCount > 64) bad()
      final case class RawVar(nm: String, dimIds: Seq[Int], tpe: Long,
        vsize: Long, begin: Long)
      val raws = (0L until varCount).map { _ =>
        val nm = name()
        val ndims = size()
        if (ndims > 4) bad()
        val dimIds = (0L until ndims).map { _ =>
          val id = size()
          if (id < 0 || id >= dimCount) bad()
          id.toInt
        }
        attList()
        val tpe = size()
        val vsize = size()
        val begin = offset()
        RawVar(nm, dimIds, tpe, vsize, begin)
      }
      // record geometry: recsize = Σ per-record slab sizes (padded),
      // except the single-record-variable special case
      val recVars = raws.filter(v => v.dimIds.headOption.exists(d => dims(d)._2 == 0L))
      val recSlab: Map[String, Long] = recVars.map { v =>
        val perRec = v.dimIds.drop(1).map(d => dims(d)._2).product * sizeOfType(v.tpe)
        v.nm -> perRec
      }.toMap
      val recsize =
        if (recVars.length == 1) recSlab(recVars.head.nm)
        else recVars.map(v => pad4(recSlab(v.nm))).sum
      val out = Seq.newBuilder[Var]
      raws.foreach { v =>
        typeOf(v.tpe, cdf5).foreach { case (label, width) =>
          val isRec = v.dimIds.headOption.exists(d => dims(d)._2 == 0L)
          val shape = v.dimIds.zipWithIndex.map { case (d, i) =>
            if (i == 0 && isRec) numrecs else dims(d)._2
          }
          val n0 = shape.product
          if (n0 < 0 || n0 > (1L << 22)) bad()
          val n = n0.toInt
          val vals = new Array[Double](n)
          def decodeAt(src: Long, at: Int, count: Int): Unit = {
            if (src < 0 || src + count.toLong * width > bytes.length) bad()
            var i = 0
            while (i < count) {
              var bits = 0L
              var j = 0
              val base = (src + i.toLong * width).toInt
              while (j < width) { bits = (bits << 8) | (bytes(base + j) & 0xFFL); j += 1 }
              vals(at + i) = v.tpe match {
                case 5 => java.lang.Float.intBitsToFloat(bits.toInt).toDouble
                case 6 => java.lang.Double.longBitsToDouble(bits)
                case 1 | 3 | 4 | 10 => // signed widths
                  val shift = 64 - width * 8
                  ((bits << shift) >> shift).toDouble
                case _ => bits.toDouble // unsigned (uint64 > 2^53 would
                // round; fixture values stay far inside the safe range)
              }
              i += 1
            }
          }
          if (!isRec) decodeAt(v.begin, 0, n)
          else {
            val perRecElems = if (numrecs == 0) 0 else n / numrecs.toInt
            var rec = 0
            while (rec < numrecs.toInt) {
              decodeAt(v.begin + rec * recsize, rec * perRecElems, perRecElems)
              rec += 1
            }
          }
          out += Var(v.nm, label, shape, vals)
        }
      }
      Some(out.result().sortBy(_.name))
    } catch {
      case Bad | _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException => None
    }

  /** One row per numeric variable: (id, name, dtype, dims, n_values,
    * values). Hostile bytes emit nothing. */
  def decodeVars(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        parse(if (payload == null) Array.emptyByteArray else payload)
          .getOrElse(Seq.empty)
          .map(v => (id, v.name, v.typeName,
            v.dims.mkString("[", ",", "]"), v.values.length.toLong, v.values))
      }
      .toDF("id", "name", "dtype", "dims", "n_values", "values")
  }

  // ------------------------------------------------------------ fixture writer

  /** Spec-legal classic-format builder (fixture side): version
    * cycles 1/2/5 by id%3; three fixed variables (float matrix,
    * int vector, double scalar-ish) + TWO record variables (so the
    * interleaved recsize stride with padding is load-bearing) + a
    * char variable that must be SKIPPED + global/var attributes
    * that must parse past. */
  def build(id: Long): Array[Byte] = {
    val version = (id % 3) match { case 0 => 1; case 1 => 2; case _ => 5 }
    val cdf5 = version == 5
    val numrecs = id % 4 + 2 // 2..5 records
    val title = s"graft netcdf $id".getBytes("US-ASCII")
    final case class V(nm: String, dimIds: Seq[Int], tpe: Int, perRec: Long,
      fixedSize: Long, attr: Boolean)
    val vars = Seq(
      V("fmat", Seq(1, 2), 5, 0L, 12 * 4L, attr = true), // 3×4 float
      V("ivec", Seq(3), 4, 0L, 6 * 4L, attr = false), // 6 int
      V("label", Seq(3), 2, 0L, 6L, attr = false), // 6 char: SKIPPED
      V("rtemp", Seq(0, 2), 5, 4 * 4L, 0L, attr = false), // rec × col float
      V("rcount", Seq(0), 4, 4L, 0L, attr = true)) // rec int

    def render(begins: String => Long): java.io.ByteArrayOutputStream = {
      val o = new java.io.ByteArrayOutputStream()
      def u8(v: Int): Unit = o.write(v & 0xFF)
      def u32(v: Long): Unit = { u8((v >> 24).toInt); u8((v >> 16).toInt); u8((v >> 8).toInt); u8(v.toInt) }
      def i64(v: Long): Unit = { u32(v >>> 32); u32(v & 0xFFFFFFFFL) }
      def size(v: Long): Unit = if (cdf5) i64(v) else u32(v)
      def offset(v: Long): Unit = if (version == 1) u32(v) else i64(v)
      def name(nm: String): Unit = {
        val b = nm.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        size(b.length.toLong); o.write(b)
        (0 until (pad4(b.length.toLong) - b.length).toInt).foreach(_ => u8(0))
      }
      u8('C'); u8('D'); u8('F'); u8(version)
      size(numrecs)
      size(0x0A); size(4) // dims: rec(0) row(1) col(2) len(3)
      name("rec"); size(0L)
      name("row"); size(3L)
      name("col"); size(4L)
      name("len"); size(6L)
      size(0x0C); size(1) // one global attribute, parsed past
      name("title"); size(2L)
      size(title.length.toLong); o.write(title)
      (0 until (pad4(title.length.toLong) - title.length).toInt).foreach(_ => u8(0))
      size(0x0B); size(vars.length.toLong)
      vars.foreach { v =>
        name(v.nm)
        size(v.dimIds.length.toLong)
        v.dimIds.foreach(d => size(d.toLong))
        if (v.attr) {
          size(0x0C); size(1)
          name("units"); size(2L)
          size(1L); o.write("u".getBytes("US-ASCII")); u8(0); u8(0); u8(0)
        } else { size(0L); size(0L) }
        size(v.tpe.toLong)
        size(if (v.perRec > 0) pad4(v.perRec) else pad4(v.fixedSize))
        offset(begins(v.nm))
      }
      o
    }

    // pass 1 measures the header (begin VALUES do not change widths)
    val headerEnd = render(_ => 0L).size().toLong
    val begins = scala.collection.mutable.Map.empty[String, Long]
    var cur = headerEnd
    vars.filter(_.perRec == 0L).foreach { v =>
      begins(v.nm) = cur
      cur += pad4(v.fixedSize)
    }
    vars.filter(_.perRec > 0L).foreach { v =>
      begins(v.nm) = cur
      cur += pad4(v.perRec) // record begins stride by recsize from here
    }
    // pass 2: the real header, then data
    val o = render(begins)
    def u8(v: Int): Unit = o.write(v & 0xFF)
    def u32(v: Long): Unit = { u8((v >> 24).toInt); u8((v >> 16).toInt); u8((v >> 8).toInt); u8(v.toInt) }
    def f32(v: Double): Unit = u32(java.lang.Float.floatToIntBits(v.toFloat).toLong & 0xFFFFFFFFL)
    def i32(v: Long): Unit = u32(v & 0xFFFFFFFFL)
    def padTo4(): Unit = while (o.size() % 4 != 0) u8(0)
    require(o.size().toLong == headerEnd, s"header relayout drift: ${o.size()} vs $headerEnd")
    // fixed variables, each padded to 4
    for (rr <- 0 until 3; c <- 0 until 4) f32(((id + 4 * rr + c) % 21 - 10) * 0.25)
    padTo4()
    (0 until 6).foreach(i => i32((id + i) % 61 - 30))
    padTo4()
    o.write(s"LBL$id!!".getBytes("US-ASCII").take(6)) // char data, skipped
    padTo4()
    // records: per record, each record variable\'s padded slab in order
    var rec = 0
    while (rec < numrecs) {
      (0 until 4).foreach(c => f32(((id + 7 * rec + c) % 19 - 9) * 0.25))
      padTo4()
      i32((id + rec) % 87 - 43)
      padTo4()
      rec += 1
    }
    o.toByteArray
  }

  /** Gate packer: one classic payload per document, version cycling
    * 1/2/5 by id%3. */
  def packDocsNetcdf(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Partitioning.fanOut(df.where(col(idCol).isNotNull))
      .select(coalesce(col(idCol).cast("long"), lit(0L)))
      .as[Long]
      .mapPartitions(_.map(id => (id, build(id))))
      .toDF("id", "payload")
  }
}
