package graft.ops

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXIF metadata over JPEG — the camera-metadata block (Exif 2.3 /
  * CIPA DC-008, a TIFF 6.0 IFD structure inside the JPEG APP1
  * segment) that a real image corpus must read for orientation and
  * MUST scrub for privacy: embedded GPS coordinates are PII the
  * same way phone numbers in text are, and a training-data pipeline
  * that ships them leaks photographer locations at corpus scale.
  *
  * Reader: walks JPEG segments to the `Exif\0\0` APP1, then the TIFF
  * block in either byte order (II/MM) honoring the value-or-offset
  * rule (values whose byte size ≤ 4 sit left-justified inside the
  * entry); IFD0 carries Make/Model/Orientation/DateTime and the
  * Exif / GPS sub-IFD pointers; the GPS IFD's RATIONAL
  * degree/minute/second triplets + N/S/E/W refs reduce to signed
  * decimal degrees. Hostile bytes never throw — a JPEG without a
  * parseable Exif block reports has_exif = false.
  *
  * Scrubber ([[stripGps]]): privacy tools REBUILD rather than patch
  * — removing a 12-byte IFD entry in place would shift every
  * absolute offset after it. A JPEG whose Exif has GPS gets a fresh
  * APP1 written by our own writer carrying the four safe IFD0 tags
  * (same byte order), everything else byte-identical; an Exif block
  * that does not parse is DROPPED whole (the privacy-safe default —
  * unparseable metadata cannot be proven GPS-free); a JPEG with no
  * GPS passes through byte-identical (idempotent no-op).
  *
  * Scale shape: scan-local per-row kernels (mapPartitions
  * decode/strip), no shuffle, bounded state per image.
  */
object Exif {

  final case class Meta(endian: String, orientation: Option[Int],
      make: Option[String], model: Option[String], datetime: Option[String],
      lat: Option[Double], lon: Option[Double])

  // ------------------------------------------------------------------
  // TIFF primitives
  // ------------------------------------------------------------------

  private def u16(p: Array[Byte], at: Int, le: Boolean): Int =
    if (le) (p(at) & 0xFF) | ((p(at + 1) & 0xFF) << 8)
    else ((p(at) & 0xFF) << 8) | (p(at + 1) & 0xFF)

  private def u32(p: Array[Byte], at: Int, le: Boolean): Long =
    if (le) (p(at) & 0xFFL) | ((p(at + 1) & 0xFFL) << 8) |
      ((p(at + 2) & 0xFFL) << 16) | ((p(at + 3) & 0xFFL) << 24)
    else ((p(at) & 0xFFL) << 24) | ((p(at + 1) & 0xFFL) << 16) |
      ((p(at + 2) & 0xFFL) << 8) | (p(at + 3) & 0xFFL)

  private val TypeSize = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 8, 7 -> 1)

  /** One parsed IFD entry: (tag, type, count, value area offset). */
  private final case class Entry(tag: Int, typ: Int, count: Long, valAt: Int)

  /** Parse the IFD at `off`: entries with the value-or-offset rule
    * resolved to an absolute offset into the TIFF block. */
  private def readIfd(t: Array[Byte], off: Long, le: Boolean): Option[Vector[Entry]] = {
    if (off < 8 || off + 2 > t.length) return None
    val n = u16(t, off.toInt, le)
    if (n < 0 || n > 4096 || off + 2 + 12L * n + 4 > t.length) return None
    val out = Vector.newBuilder[Entry]
    var e = 0
    while (e < n) {
      val at = off.toInt + 2 + 12 * e
      val tag = u16(t, at, le)
      val typ = u16(t, at + 2, le)
      val count = u32(t, at + 4, le)
      val size = TypeSize.get(typ) match {
        case Some(s) => s.toLong * count
        case None => return None
      }
      val valAt = if (size <= 4) at + 8 else {
        val o = u32(t, at + 8, le)
        if (o + size > t.length) return None
        o.toInt
      }
      out += Entry(tag, typ, count, valAt)
      e += 1
    }
    Some(out.result())
  }

  private def ascii(t: Array[Byte], e: Entry): Option[String] =
    if (e.typ != 2 || e.count <= 0) None
    else {
      var end = e.valAt + e.count.toInt
      // NUL-terminated by spec; tolerate a missing terminator
      while (end > e.valAt && (end > t.length || t(end - 1) == 0)) end -= 1
      Some(new String(t, e.valAt, end - e.valAt, StandardCharsets.US_ASCII))
    }

  private def shortOrLong(t: Array[Byte], e: Entry, le: Boolean): Option[Long] =
    e.typ match {
      case 3 => Some(u16(t, e.valAt, le).toLong)
      case 4 => Some(u32(t, e.valAt, le))
      case _ => None
    }

  /** RATIONAL triplet (deg, min, sec) → decimal degrees. */
  private def dms(t: Array[Byte], e: Entry, le: Boolean): Option[Double] =
    if (e.typ != 5 || e.count != 3) None
    else {
      var v = 0.0
      var i = 0
      val scale = Array(1.0, 60.0, 3600.0)
      while (i < 3) {
        val num = u32(t, e.valAt + 8 * i, le)
        val den = u32(t, e.valAt + 8 * i + 4, le)
        if (den == 0) return None
        v += num.toDouble / den.toDouble / scale(i)
        i += 1
      }
      Some(v)
    }

  /** Parse a TIFF-structured Exif block. */
  private[graft] def parseTiff(t: Array[Byte]): Option[Meta] = {
    if (t.length < 8) return None
    val le = t(0) == 'I' && t(1) == 'I'
    val be = t(0) == 'M' && t(1) == 'M'
    if (!le && !be) return None
    if (u16(t, 2, le) != 42) return None
    readIfd(t, u32(t, 4, le), le).map { ifd0 =>
      def find(es: Vector[Entry], tag: Int) = es.find(_.tag == tag)
      val orientation = find(ifd0, 0x0112).flatMap(shortOrLong(t, _, le)).map(_.toInt)
      val make = find(ifd0, 0x010F).flatMap(ascii(t, _))
      val model = find(ifd0, 0x0110).flatMap(ascii(t, _))
      val datetime = find(ifd0, 0x0132).flatMap(ascii(t, _))
      val gps = find(ifd0, 0x8825).flatMap(shortOrLong(t, _, le))
        .flatMap(readIfd(t, _, le))
      def coord(refTag: Int, valTag: Int, neg: String): Option[Double] = for {
        g <- gps
        r <- find(g, refTag).flatMap(ascii(t, _))
        v <- find(g, valTag).flatMap(dms(t, _, le))
      } yield if (r == neg) -v else v
      Meta(if (le) "II" else "MM", orientation, make, model, datetime,
        coord(0x0001, 0x0002, "S"), coord(0x0003, 0x0004, "W"))
    }
  }

  // ------------------------------------------------------------------
  // JPEG segment walk
  // ------------------------------------------------------------------

  /** The Exif TIFF block of a payload: the `Exif\0\0` APP1 of a
    * JPEG, or the `EXIF` chunk of a WebP container (RFC 9649 §2.3.4
    * — the chunk carries the TIFF block directly, though some
    * writers keep the JPEG-style `Exif\0\0` prefix, which is
    * stripped when present). */
  private[graft] def findExif(p: Array[Byte]): Option[Array[Byte]] = {
    if (p.length >= 20 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'W' && p(9) == 'E' && p(10) == 'B' && p(11) == 'P') {
      var i = 12
      while (i + 8 <= p.length) {
        val size = (p(i + 4) & 0xFF) | ((p(i + 5) & 0xFF) << 8) |
          ((p(i + 6) & 0xFF) << 16) | ((p(i + 7) & 0xFF) << 24)
        if (size < 0 || i + 8 + size > p.length) return None
        if (p(i) == 'E' && p(i + 1) == 'X' && p(i + 2) == 'I' && p(i + 3) == 'F') {
          val body = java.util.Arrays.copyOfRange(p, i + 8, i + 8 + size)
          return Some(
            if (body.length >= 6 && body(0) == 'E' && body(1) == 'x' && body(2) == 'i' &&
              body(3) == 'f' && body(4) == 0 && body(5) == 0)
              java.util.Arrays.copyOfRange(body, 6, body.length)
            else body)
        }
        i += 8 + size + (size & 1)
      }
      None
    } else exifSegment(p).map { case (at, len) =>
      java.util.Arrays.copyOfRange(p, at + 10, at + 2 + len)
    }
  }

  /** (segment start, declared length) of the Exif APP1 — the start
    * points at the FF E1 marker; length is the 2-byte field value. */
  private def exifSegment(p: Array[Byte]): Option[(Int, Int)] = {
    if (p.length < 4 || (p(0) & 0xFF) != 0xFF || (p(1) & 0xFF) != 0xD8) return None
    var pos = 2
    while (pos + 4 <= p.length) {
      if ((p(pos) & 0xFF) != 0xFF) return None
      val marker = p(pos + 1) & 0xFF
      if (marker == 0xDA || marker == 0xD9) return None // scan data / EOI: stop
      if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) { pos += 2 }
      else {
        val len = ((p(pos + 2) & 0xFF) << 8) | (p(pos + 3) & 0xFF)
        if (len < 2 || pos + 2 + len > p.length) return None
        if (marker == 0xE1 && len >= 8 &&
            p(pos + 4) == 'E' && p(pos + 5) == 'x' && p(pos + 6) == 'i' &&
            p(pos + 7) == 'f' && p(pos + 8) == 0 && p(pos + 9) == 0)
          return Some((pos, len))
        pos += 2 + len
      }
    }
    None
  }

  /** Decode (id, has_exif, endian, orientation, make, model,
    * datetime, has_gps, lat, lon) per image — scan-local, never
    * throws. */
  def decodeMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val meta = Option(payload).flatMap(findExif).flatMap(parseTiff)
        meta match {
          case Some(m) =>
            (id, true, m.endian, m.orientation.map(_.toLong), m.make.orNull,
              m.model.orNull, m.datetime.orNull, m.lat.isDefined || m.lon.isDefined,
              m.lat, m.lon)
          case None =>
            (id, false, null: String, None: Option[Long], null: String,
              null: String, null: String, false, None: Option[Double], None: Option[Double])
        }
      })
      .toDF("id", "has_exif", "endian", "orientation", "make", "model",
        "datetime", "has_gps", "lat", "lon")
  }

  // ------------------------------------------------------------------
  // Writer + GPS scrub
  // ------------------------------------------------------------------

  final case class GpsCoord(latRef: String, lat: Seq[(Long, Long)],
      lonRef: String, lon: Seq[(Long, Long)])

  /** Build an `Exif\0\0` APP1 segment (FF E1 included) with the four
    * safe IFD0 tags, an Exif sub-IFD (ExifVersion 0230), and
    * optionally a GPS IFD — both byte orders. */
  def exifApp1(le: Boolean, orientation: Int, make: String, model: String,
      datetime: String, gps: Option[GpsCoord]): Array[Byte] = {
    val t = new ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (le) { t.write(v & 0xFF); t.write((v >> 8) & 0xFF) }
      else { t.write((v >> 8) & 0xFF); t.write(v & 0xFF) }
    def w32(v: Long): Unit =
      if (le) { t.write((v & 0xFF).toInt); t.write(((v >> 8) & 0xFF).toInt)
                t.write(((v >> 16) & 0xFF).toInt); t.write(((v >> 24) & 0xFF).toInt) }
      else { t.write(((v >> 24) & 0xFF).toInt); t.write(((v >> 16) & 0xFF).toInt)
             t.write(((v >> 8) & 0xFF).toInt); t.write((v & 0xFF).toInt) }

    val makeB = (make + "\u0000").getBytes(StandardCharsets.US_ASCII)
    val modelB = (model + "\u0000").getBytes(StandardCharsets.US_ASCII)
    val dtB = (datetime + "\u0000").getBytes(StandardCharsets.US_ASCII)

    // layout: header(8) + ifd0 + exif sub-ifd + [gps ifd] + data area
    val n0 = 5 + (if (gps.isDefined) 1 else 0)
    val ifd0At = 8L
    val exifIfdAt = ifd0At + 2 + 12L * n0 + 4
    val gpsIfdAt = exifIfdAt + 2 + 12L * 1 + 4
    var dataAt = if (gps.isDefined) gpsIfdAt + 2 + 12L * 4 + 4 else gpsIfdAt
    def alloc(sz: Int): Long = { val o = dataAt; dataAt += sz; o }
    val makeAt = if (makeB.length > 4) alloc(makeB.length) else -1L
    val modelAt = if (modelB.length > 4) alloc(modelB.length) else -1L
    val dtAt = alloc(dtB.length)
    val latAt = gps.map(_ => alloc(24)).getOrElse(-1L)
    val lonAt = gps.map(_ => alloc(24)).getOrElse(-1L)

    // header
    t.write(if (le) 'I' else 'M'); t.write(if (le) 'I' else 'M')
    w16(42); w32(ifd0At)
    def asciiEntry(tag: Int, b: Array[Byte], at: Long): Unit = {
      w16(tag); w16(2); w32(b.length.toLong)
      if (b.length > 4) w32(at)
      else { var i = 0; while (i < 4) { t.write(if (i < b.length) b(i) else 0); i += 1 } }
    }
    // IFD0 (tags ascending, per spec)
    w16(n0)
    asciiEntry(0x010F, makeB, makeAt)
    asciiEntry(0x0110, modelB, modelAt)
    w16(0x0112); w16(3); w32(1L)
    // inline SHORT sits left-justified in the 4-byte value area
    w16(orientation); w16(0)
    asciiEntry(0x0132, dtB, dtAt)
    w16(0x8769); w16(4); w32(1L); w32(exifIfdAt)
    gps.foreach { _ => w16(0x8825); w16(4); w32(1L); w32(gpsIfdAt) }
    w32(0L) // next IFD

    // Exif sub-IFD: ExifVersion (UNDEFINED x4, inline)
    w16(1)
    w16(0x9000); w16(7); w32(4L)
    "0230".getBytes(StandardCharsets.US_ASCII).foreach(b => t.write(b & 0xFF))
    w32(0L)

    // GPS IFD
    gps.foreach { g =>
      w16(4)
      asciiEntry(0x0001, (g.latRef + "\u0000").getBytes(StandardCharsets.US_ASCII), -1L)
      w16(0x0002); w16(5); w32(3L); w32(latAt)
      asciiEntry(0x0003, (g.lonRef + "\u0000").getBytes(StandardCharsets.US_ASCII), -1L)
      w16(0x0004); w16(5); w32(3L); w32(lonAt)
      w32(0L)
    }

    // data area, in alloc order
    if (makeB.length > 4) t.write(makeB)
    if (modelB.length > 4) t.write(modelB)
    t.write(dtB)
    gps.foreach { g =>
      g.lat.foreach { case (n, d) => w32(n); w32(d) }
      g.lon.foreach { case (n, d) => w32(n); w32(d) }
    }

    val tiff = t.toByteArray
    val out = new ByteArrayOutputStream()
    out.write(0xFF); out.write(0xE1)
    val len = 2 + 6 + tiff.length
    out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
    out.write("Exif".getBytes(StandardCharsets.US_ASCII))
    out.write(0); out.write(0)
    out.write(tiff)
    out.toByteArray
  }

  /** Insert an APP1 right after SOI (the conventional position). */
  def insertApp1(jpeg: Array[Byte], app1: Array[Byte]): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xFF) == 0xFF && (jpeg(1) & 0xFF) == 0xD8,
      "not a JPEG")
    val out = new Array[Byte](jpeg.length + app1.length)
    out(0) = jpeg(0); out(1) = jpeg(1)
    System.arraycopy(app1, 0, out, 2, app1.length)
    System.arraycopy(jpeg, 2, out, 2 + app1.length, jpeg.length - 2)
    out
  }

  /** GPS scrub: no Exif or no GPS → byte-identical input; GPS → the
    * APP1 is REBUILT (same byte order, safe tags kept, GPS gone);
    * unparseable Exif → the APP1 is dropped whole (privacy-safe
    * default: unparseable metadata cannot be proven GPS-free). */
  def stripGps(jpeg: Array[Byte]): Array[Byte] =
    exifSegment(jpeg) match {
      case None => jpeg
      case Some((at, len)) =>
        val tiff = java.util.Arrays.copyOfRange(jpeg, at + 10, at + 2 + len)
        val replacement: Array[Byte] = parseTiff(tiff) match {
          case Some(m) if m.lat.isEmpty && m.lon.isEmpty => return jpeg
          case Some(m) =>
            val rebuilt = exifApp1(m.endian == "II", m.orientation.getOrElse(1),
              m.make.getOrElse(""), m.model.getOrElse(""),
              m.datetime.getOrElse(""), gps = None)
            // a hostile source whose ASCII entries overlap in the data
            // area (each individually in-bounds) can push the rebuilt
            // segment past the 16-bit APP1 length; emitting it would
            // wrap the length field into a corrupt JPEG — fall back to
            // the drop-whole-APP1 privacy-safe default instead
            if (rebuilt.length - 2 > 0xFFFF) Array.emptyByteArray else rebuilt
          case None => Array.emptyByteArray
        }
        val out = new ByteArrayOutputStream(jpeg.length)
        out.write(jpeg, 0, at)
        out.write(replacement, 0, replacement.length)
        out.write(jpeg, at + 2 + len, jpeg.length - at - 2 - len)
        out.toByteArray
    }

  /** Column-level scrub over (id, payload) rows: (id, payload) with
    * GPS-free bytes. */
  def stripGpsDf(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        (id, if (p == null) p else try stripGps(p) catch { case _: Exception => p })
      })
      .toDF("id", "payload")
  }

  // ------------------------------------------------------------------
  // Orientation application
  // ------------------------------------------------------------------

  /** Apply an EXIF orientation (1-8) to decoded pixels so the image
    * displays upright — the transform every image pipeline runs
    * right after reading the tag (and must run BEFORE pHash/dedup,
    * or the same photo shot in portrait and landscape hashes apart).
    * Dest-from-source maps, Exif 2.3 §4.6.4:
    * 1 identity · 2 mirror-H · 3 rotate 180 · 4 mirror-V ·
    * 5 transpose · 6 rotate 90 CW · 7 transverse · 8 rotate 270 CW.
    * Orientations 5-8 swap the output dimensions. Unknown values
    * pass through as orientation 1 (the spec's default). */
  def applyOrientation(img: PngCodec.Image, orientation: Int): PngCodec.Image = {
    if (orientation <= 1 || orientation > 8) return img
    val w = img.width; val h = img.height; val c = img.channels
    val swap = orientation >= 5
    val ow = if (swap) h else w
    val oh = if (swap) w else h
    val out = new Array[Byte](img.pixels.length)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        val (sx, sy) = orientation match {
          case 2 => (w - 1 - x, y)
          case 3 => (w - 1 - x, h - 1 - y)
          case 4 => (x, h - 1 - y)
          case 5 => (y, x)
          case 6 => (y, h - 1 - x)
          case 7 => (w - 1 - y, h - 1 - x)
          case _ => (w - 1 - y, x) // 8
        }
        var ch = 0
        while (ch < c) {
          out((y * ow + x) * c + ch) = img.pixels((sy * w + sx) * c + ch)
          ch += 1
        }
        x += 1
      }
      y += 1
    }
    PngCodec.Image(ow, oh, c, out)
  }

  // ------------------------------------------------------------------
  // Gate packer
  // ------------------------------------------------------------------

  /** Gate packer: one real JPEG per document (8×8 gray, id-derived
    * pixels through the repo's own encoder) with a planted Exif APP1
    * — byte order II/MM by id%2, GPS present unless id%3 == 0, all
    * fields from id arithmetic. */
  def packJpegExif(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull).select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val px = new Array[Byte](64)
        var i = 0
        while (i < 64) { px(i) = (((id * 31) + i * 7) % 256).toByte; i += 1 }
        val base = JpegEncoder.encode(PngCodec.Image(8, 8, 1, px))
        val gps = if (id % 3 == 0) None else Some(GpsCoord(
          latRef = if (id % 2 == 0) "N" else "S",
          lat = Seq((id % 90, 1L), (id % 60, 1L), (id % 6000, 100L)),
          lonRef = if (id % 4 < 2) "E" else "W",
          lon = Seq((id % 180, 1L), ((id * 7) % 60, 1L), ((id * 13) % 6000, 100L))))
        val dt = f"${2000 + id % 30}%04d:${id % 12 + 1}%02d:${id % 28 + 1}%02d " +
          f"${id % 24}%02d:${id % 60}%02d:${id % 60}%02d"
        val app1 = exifApp1(le = id % 2 == 0, orientation = (id % 8 + 1).toInt,
          make = s"Maker ${id % 5}", model = s"Model ${id % 3}",
          datetime = dt, gps = gps)
        (id, insertApp1(base, app1))
      })
      .toDF("doc_id", "payload")
  }

  /** WebP sibling of [[packJpegExif]]: the SAME planted Exif
    * arithmetic, but the TIFF block rides a WebP `EXIF` chunk behind
    * a VP8X extended header (exif flag set) next to a real VP8L
    * image — the container form phone/web writers emit. Every third
    * id keeps the JPEG-style `Exif\0\0` prefix inside the chunk (both
    * wire variants exist in the wild; the reader strips it). */
  def packWebpExif(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull).select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val gps = if (id % 3 == 0) None else Some(GpsCoord(
          latRef = if (id % 2 == 0) "N" else "S",
          lat = Seq((id % 90, 1L), (id % 60, 1L), (id % 6000, 100L)),
          lonRef = if (id % 4 < 2) "E" else "W",
          lon = Seq((id % 180, 1L), ((id * 7) % 60, 1L), ((id * 13) % 6000, 100L))))
        val dt = f"${2000 + id % 30}%04d:${id % 12 + 1}%02d:${id % 28 + 1}%02d " +
          f"${id % 24}%02d:${id % 60}%02d:${id % 60}%02d"
        val app1 = exifApp1(le = id % 2 == 0, orientation = (id % 8 + 1).toInt,
          make = s"Maker ${id % 5}", model = s"Model ${id % 3}",
          datetime = dt, gps = gps)
        val tiff = java.util.Arrays.copyOfRange(app1, 10, app1.length)
        val exifBody =
          if (id % 3 == 0) "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
          else tiff
        val green = Array.tabulate(64)(i => (((id * 31) + i * 7) % 256).toByte)
        val vp8l = WebpCodec.chunkBytes("VP8L", WebpCodec.encodeGreenPayload(8, 8, green))
        val vp8x = new Array[Byte](10)
        vp8x(0) = 0x08 // exif flag
        vp8x(4) = 7; vp8x(7) = 7 // 8x8 canvas, minus-one encoding
        val body = WebpCodec.chunkBytes("VP8X", vp8x) ++ vp8l ++
          WebpCodec.chunkBytes("EXIF", exifBody)
        val out = new java.io.ByteArrayOutputStream()
        out.write("RIFF".getBytes("US-ASCII"))
        val sz = 4 + body.length
        out.write(sz & 0xFF); out.write((sz >> 8) & 0xFF)
        out.write((sz >> 16) & 0xFF); out.write((sz >> 24) & 0xFF)
        out.write("WEBP".getBytes("US-ASCII"))
        out.write(body)
        (id, out.toByteArray)
      })
      .toDF("doc_id", "payload")
  }
}
