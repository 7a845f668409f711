package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** AIFF / AIFF-C and Sun AU decoders — the two legacy PCM containers
  * beside RIFF/WAVE (round 15 continuation): Apple-ecosystem and
  * Unix-era scraped audio still ships as .aiff/.aifc/.au, and the
  * fingerprint/spectral/segment operators should take them through
  * the same [[AudioPcm.decodeAny]] dispatch as everything else.
  * From the published specs alone: "Audio Interchange File Format
  * AIFF-C" (Apple, 1991 draft — the de-facto normative text) and
  * the Sun/NeXT .au header layout; the G.711 expansions reuse the
  * in-repo spec tables ([[G711]]).
  *
  * AIFF: IFF `FORM` big-endian chunk walk, form types `AIFF` (PCM)
  * and `AIFC` (tagged compression — `NONE` big-endian PCM, `sowt`
  * little-endian PCM, `ulaw`/`ULAW`/`alaw`/`ALAW` G.711; anything
  * else refuses by name-of-omission). COMM carries channels, frame
  * count, sample size, and the sample rate as an 80-bit IEEE
  * extended float — decoded exactly for the integer rates audio
  * uses (mantissa shift, no floating point). SSND's offset field is
  * honored. 8-bit AIFF samples are SIGNED (the opposite of WAV's
  * unsigned-8 convention — a classic silent-corruption trap).
  *
  * AU: `.snd` magic, data offset, size (0xFFFFFFFF = to EOF),
  * encoding (1 μ-law, 2 int8, 3 int16 BE, 27 A-law), rate,
  * channels — all big-endian.
  *
  * Hostile-bytes contract as everywhere: bounds-checked, never
  * throws, None rather than a guess.
  */
object Aiff {

  private def u8(p: Array[Byte], i: Int): Int = p(i) & 0xFF
  private def be16(p: Array[Byte], i: Int): Int = (u8(p, i) << 8) | u8(p, i + 1)
  private def be32(p: Array[Byte], i: Int): Long =
    (u8(p, i).toLong << 24) | (u8(p, i + 1).toLong << 16) |
      (u8(p, i + 2).toLong << 8) | u8(p, i + 3).toLong
  private def tag(p: Array[Byte], i: Int): String =
    if (i + 4 <= p.length) new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    else ""

  def isAiff(p: Array[Byte]): Boolean =
    p != null && p.length >= 12 && tag(p, 0) == "FORM" &&
      (tag(p, 8) == "AIFF" || tag(p, 8) == "AIFC")

  /** 80-bit IEEE extended → integer sample rate; None for the
    * non-integer or out-of-range values no audio container uses. */
  private[graft] def extendedToRate(p: Array[Byte], i: Int): Option[Int] = {
    if (i + 10 > p.length) return None
    val se = be16(p, i)
    if ((se & 0x8000) != 0) return None // negative rate
    val exp = se & 0x7FFF
    var mant = 0L
    var k = 0
    while (k < 8) { mant = (mant << 8) | u8(p, i + 2 + k); k += 1 }
    if (exp == 0 && mant == 0L) return None
    val shift = exp - 16383 - 63
    if (shift > 0 || shift < -62) return None
    val r = mant >>> -shift
    // exact only: a fractional rate would have dropped bits
    if ((r << -shift) != mant) return None
    if (r <= 0 || r > 1000000L) None else Some(r.toInt)
  }

  def decode(p: Array[Byte]): Option[AudioPcm.Clip] = {
    try {
      if (!isAiff(p)) return None
      val aifc = tag(p, 8) == "AIFC"
      var channels = 0
      var frames = 0L
      var bits = 0
      var rate = 0
      var comp = "NONE"
      var sawComm = false
      var dataAt = -1L
      var dataLen = 0L
      var i = 12L
      while (i + 8 <= p.length) {
        val at = i.toInt
        val id = tag(p, at)
        val len = be32(p, at + 4)
        if (id == "COMM") {
          if (at + 8 + 18 > p.length) return None
          channels = be16(p, at + 8)
          frames = be32(p, at + 10)
          bits = be16(p, at + 14)
          rate = extendedToRate(p, at + 16).getOrElse(return None)
          if (aifc) {
            if (len < 22 || at + 8 + 22 > p.length) return None
            comp = tag(p, at + 26)
          }
          sawComm = true
        } else if (id == "SSND" && dataAt < 0) {
          if (at + 16 > p.length) return None
          val off = be32(p, at + 8)
          // blockSize at +12: informational
          dataAt = i + 16 + off
          dataLen = len - 8 - off
        }
        i += 8L + len + (len & 1L)
      }
      if (!sawComm || dataAt < 0 || channels < 1 || channels > 16 || rate <= 0)
        return None
      val avail = math.max(0L, math.min(dataLen, p.length - dataAt))
      val base = dataAt.toInt
      comp match {
        case "NONE" | "twos" =>
          if (bits == 16) {
            val n = (avail / 2).toInt
            if (n > AudioPcm.MaxSamples) return None
            val out = new Array[Int](n)
            var k = 0
            while (k < n) {
              val v = be16(p, base + 2 * k)
              out(k) = if (v >= 0x8000) v - 0x10000 else v
              k += 1
            }
            Some(AudioPcm.Clip(channels, rate, 16, out))
          } else if (bits == 8) {
            // AIFF 8-bit is SIGNED; scale to the 16-bit working depth
            val n = avail.toInt
            if (n > AudioPcm.MaxSamples) return None
            val out = new Array[Int](n)
            var k = 0
            while (k < n) { out(k) = p(base + k).toInt << 8; k += 1 }
            Some(AudioPcm.Clip(channels, rate, 8, out))
          } else None
        case "sowt" =>
          if (bits != 16) return None
          val n = (avail / 2).toInt
          if (n > AudioPcm.MaxSamples) return None
          val out = new Array[Int](n)
          var k = 0
          while (k < n) {
            val v = u8(p, base + 2 * k) | (u8(p, base + 2 * k + 1) << 8)
            out(k) = if (v >= 0x8000) v - 0x10000 else v
            k += 1
          }
          Some(AudioPcm.Clip(channels, rate, 16, out))
        case "ulaw" | "ULAW" | "alaw" | "ALAW" =>
          val n = avail.toInt
          if (n > AudioPcm.MaxSamples) return None
          val table = if (comp.equalsIgnoreCase("ulaw")) G711.MulawTable else G711.AlawTable
          val out = new Array[Int](n)
          var k = 0
          while (k < n) { out(k) = table(u8(p, base + k)); k += 1 }
          Some(AudioPcm.Clip(channels, rate, 16, out))
        case _ => None // fl32/fl64/ima4/…: refuse, never guess
      }
    } catch {
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ------------------------------------------------------------ builders

  private[graft] def rateToExtended(rate: Int): Array[Byte] = {
    // normalize: rate = mant(63-bit-normalized) * 2^(exp-16383-63)
    val hb = 63 - java.lang.Long.numberOfLeadingZeros(rate.toLong)
    val exp = 16383 + hb
    val mant = rate.toLong << (63 - hb)
    val out = new Array[Byte](10)
    out(0) = ((exp >> 8) & 0x7F).toByte
    out(1) = (exp & 0xFF).toByte
    var k = 0
    while (k < 8) { out(2 + k) = ((mant >>> (8 * (7 - k))) & 0xFF).toByte; k += 1 }
    out
  }

  /** Spec-legal AIFF/AIFC builder (fixture side). `comp` "" = plain
    * AIFF; else AIFC with the tag. `data` = the sound bytes. */
  private[graft] def build(channels: Int, rate: Int, bits: Int, comp: String,
      frames: Long, data: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = o.write(v & 0xFF)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def w32(v: Long): Unit = { w8((v >> 24).toInt); w8((v >> 16).toInt); w8((v >> 8).toInt); w8(v.toInt) }
    def wtag(s: String): Unit = o.write(s.getBytes("US-ASCII"))
    val aifc = comp.nonEmpty
    val commLen = if (aifc) 18 + 4 + 2 else 18 // + tag + empty pascal name (1+1 pad)
    wtag("FORM"); w32(0L) // patched
    wtag(if (aifc) "AIFC" else "AIFF")
    if (aifc) { wtag("FVER"); w32(4L); w32(0xA2805140L) } // the spec's timestamp
    wtag("COMM"); w32(commLen.toLong)
    w16(channels); w32(frames); w16(bits)
    o.write(rateToExtended(rate))
    if (aifc) { wtag(comp); w8(0); w8(0) } // pascal name "", padded even
    wtag("SSND"); w32(8L + data.length)
    w32(0L); w32(0L) // offset, blockSize
    o.write(data)
    if (data.length % 2 == 1) w8(0)
    val bytes = o.toByteArray
    val form = bytes.length - 8
    bytes(4) = ((form >> 24) & 0xFF).toByte
    bytes(5) = ((form >> 16) & 0xFF).toByte
    bytes(6) = ((form >> 8) & 0xFF).toByte
    bytes(7) = (form & 0xFF).toByte
    bytes
  }

  /** Gate packer: six container classes by id%6 — AIFF PCM16, AIFC
    * NONE PCM16, AIFC sowt (LE) PCM16, AIFF signed PCM8, AU int16
    * BE, AU μ-law — all with planted id-arithmetic samples so the
    * decoded values replay in pure SQL. */
  def packPlantedAiffAu(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Partitioning.fanOut(df.where(col(idCol).isNotNull))
      .select(coalesce(col(idCol).cast("long"), lit(0L)))
      .as[Long]
      .mapPartitions(_.map { id =>
        val n = (id % 50).toInt + 20
        def s16(i: Int): Int = (((id + i) % 401) - 200).toInt * 80
        def s8(i: Int): Int = (((id + i) % 241) - 120).toInt
        def be(vals: Seq[Int]): Array[Byte] = {
          val b = new Array[Byte](vals.length * 2)
          vals.zipWithIndex.foreach { case (v, i) =>
            b(2 * i) = ((v >> 8) & 0xFF).toByte; b(2 * i + 1) = (v & 0xFF).toByte
          }
          b
        }
        def le(vals: Seq[Int]): Array[Byte] = {
          val b = new Array[Byte](vals.length * 2)
          vals.zipWithIndex.foreach { case (v, i) =>
            b(2 * i) = (v & 0xFF).toByte; b(2 * i + 1) = ((v >> 8) & 0xFF).toByte
          }
          b
        }
        val payload = (id % 6) match {
          case 0 => build(1, 8000, 16, "", n.toLong, be((0 until n).map(s16)))
          case 1 => build(1, 11025, 16, "NONE", n.toLong, be((0 until n).map(s16)))
          case 2 => build(1, 16000, 16, "sowt", n.toLong, le((0 until n).map(s16)))
          case 3 => build(1, 22050, 8, "", n.toLong,
            (0 until n).map(i => s8(i).toByte).toArray)
          case 4 => AuSnd.build(3, 8000, 1, be((0 until n).map(s16)))
          case _ => AuSnd.build(1, 8000, 1,
            (0 until n).map(i => ((id + i) % 256).toInt.toByte).toArray)
        }
        (id, payload)
      })
      .toDF("id", "payload")
  }

  /** Decode rows through [[AudioPcm.decodeAny]]: (id, channels,
    * sample_rate, bits, n_samples, values). Refusals drop. */
  def decodeClipRows(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        AudioPcm.decodeAny(if (payload == null) Array.emptyByteArray else payload)
          .map(c => (id, c.channels, c.sampleRate, c.bitsPerSample,
            c.samples.length.toLong, c.samples.mkString(",")))
      }
      .toDF("id", "channels", "sample_rate", "bits", "n_samples", "values")
  }
}

/** Sun/NeXT .au: the 24-byte big-endian header + sample data. */
object AuSnd {

  def isAu(p: Array[Byte]): Boolean =
    p != null && p.length >= 24 && p(0) == '.' && p(1) == 's' && p(2) == 'n' && p(3) == 'd'

  def decode(p: Array[Byte]): Option[AudioPcm.Clip] = {
    try {
      if (!isAu(p)) return None
      def be32(i: Int): Long =
        ((p(i) & 0xFFL) << 24) | ((p(i + 1) & 0xFFL) << 16) |
          ((p(i + 2) & 0xFFL) << 8) | (p(i + 3) & 0xFFL)
      val off = be32(4)
      val declared = be32(8)
      val enc = be32(12)
      val rate = be32(16)
      val channels = be32(20)
      if (off < 24 || off > p.length) return None
      if (rate <= 0 || rate > 1000000 || channels < 1 || channels > 16) return None
      val avail =
        if (declared == 0xFFFFFFFFL) p.length - off
        else math.max(0L, math.min(declared, p.length - off))
      val base = off.toInt
      enc match {
        case 1 | 27 => // μ-law / A-law
          val n = avail.toInt
          if (n > AudioPcm.MaxSamples) return None
          val table = if (enc == 1) G711.MulawTable else G711.AlawTable
          val out = new Array[Int](n)
          var k = 0
          while (k < n) { out(k) = table(p(base + k) & 0xFF); k += 1 }
          Some(AudioPcm.Clip(channels.toInt, rate.toInt, 16, out))
        case 2 => // int8 PCM
          val n = avail.toInt
          if (n > AudioPcm.MaxSamples) return None
          val out = new Array[Int](n)
          var k = 0
          while (k < n) { out(k) = p(base + k).toInt << 8; k += 1 }
          Some(AudioPcm.Clip(channels.toInt, rate.toInt, 8, out))
        case 3 => // int16 BE PCM
          val n = (avail / 2).toInt
          if (n > AudioPcm.MaxSamples) return None
          val out = new Array[Int](n)
          var k = 0
          while (k < n) {
            val v = ((p(base + 2 * k) & 0xFF) << 8) | (p(base + 2 * k + 1) & 0xFF)
            out(k) = if (v >= 0x8000) v - 0x10000 else v
            k += 1
          }
          Some(AudioPcm.Clip(channels.toInt, rate.toInt, 16, out))
        case _ => None // floats, ADPCM variants: refuse
      }
    } catch {
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** Spec-legal .au builder (fixture side). */
  private[graft] def build(enc: Int, rate: Int, channels: Int,
      data: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      o.write(((v >> 24) & 0xFF).toInt); o.write(((v >> 16) & 0xFF).toInt)
      o.write(((v >> 8) & 0xFF).toInt); o.write((v & 0xFF).toInt)
    }
    o.write(".snd".getBytes("US-ASCII"))
    w32(24L); w32(data.length.toLong); w32(enc.toLong); w32(rate.toLong)
    w32(channels.toLong)
    o.write(data)
    o.toByteArray
  }
}
