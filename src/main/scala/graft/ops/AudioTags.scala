package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Audio tag metadata (title / artist / album) — the curation-facing
  * metadata tier of the audio ladder: podcast/music corpora filter
  * and dedup on tags before any sample decode. Three containers,
  * each from its public spec:
  *
  *  - MP3: ID3v2.3 / v2.4 text frames (informal standard id3.org) —
  *    10-byte frame headers (v2.3 plain big-endian sizes, v2.4
  *    SYNCSAFE — the version changes the size arithmetic), text
  *    frames carrying an encoding byte (ISO-8859-1 / UTF-16-BOM /
  *    UTF-16BE / UTF-8), trailing NULs stripped, padding (zero id)
  *    ends the walk, unknown frames skipped by size; ID3v2.2's
  *    3-byte layout is refused, declared;
  *  - FLAC: the VORBIS_COMMENT metadata block (type 4) in the
  *    fLaC block walk — Xiph comment structure: LE vendor string,
  *    LE-counted `KEY=value` comments, keys case-insensitive;
  *  - Ogg Vorbis: the same Xiph structure in the `\x03vorbis`
  *    comment header (packet 2); located by marker scan and parsed
  *    bounds-checked — fragmented multi-page comment headers are
  *    out of scope (declared; real comment headers fit one page).
  *
  * Output: (format, title, artist, album), nulls where a tag is
  * absent; never throws.
  */
object AudioTags {

  final case class Tags(format: String, title: Option[String],
      artist: Option[String], album: Option[String])

  // ---- ID3v2 ----

  private def decodeText(enc: Int, b: Array[Byte], from: Int, until: Int): Option[String] = {
    if (until < from) return None
    val cs = enc match {
      case 0 => "ISO-8859-1"
      case 1 => "UTF-16"   // BOM-led
      case 2 => "UTF-16BE"
      case 3 => "UTF-8"
      case _ => return None
    }
    val s = new String(b, from, until - from, java.nio.charset.Charset.forName(cs))
    Some(s.replaceAll("\u0000+$", ""))
  }

  /** Text frames of an ID3v2.3/2.4 tag at the start of `p`. */
  private[graft] def id3TextFrames(p: Array[Byte]): Option[Map[String, String]] = {
    if (p.length < 10 || p(0) != 'I' || p(1) != 'D' || p(2) != '3') return None
    val major = p(3) & 0xFF
    if (major != 3 && major != 4) return None // v2.2 layout refused
    if (((p(6) | p(7) | p(8) | p(9)) & 0x80) != 0) return None
    val tagSize = ((p(6) & 0x7F) << 21) | ((p(7) & 0x7F) << 14) |
      ((p(8) & 0x7F) << 7) | (p(9) & 0x7F)
    val end = math.min(10L + tagSize, p.length.toLong).toInt
    var i = 10
    val out = Map.newBuilder[String, String]
    while (i + 10 <= end) {
      if (p(i) == 0) return Some(out.result()) // padding
      val id = new String(p, i, 4, "US-ASCII")
      if (!id.forall(c => (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9'))) return None
      val size =
        if (major == 4) {
          if (((p(i + 4) | p(i + 5) | p(i + 6) | p(i + 7)) & 0x80) != 0) return None
          ((p(i + 4) & 0x7F) << 21) | ((p(i + 5) & 0x7F) << 14) |
            ((p(i + 6) & 0x7F) << 7) | (p(i + 7) & 0x7F)
        } else {
          ((p(i + 4) & 0xFF) << 24) | ((p(i + 5) & 0xFF) << 16) |
            ((p(i + 6) & 0xFF) << 8) | (p(i + 7) & 0xFF)
        }
      if (size < 0 || i + 10 + size > end) return None
      if (id.startsWith("T") && size >= 1) {
        decodeText(p(i + 10) & 0xFF, p, i + 11, i + 10 + size)
          .foreach(v => out += (id -> v))
      }
      i += 10 + size
    }
    Some(out.result())
  }

  // ---- Xiph comment structure (FLAC block 4 / Ogg \x03vorbis) ----

  private def le32(p: Array[Byte], i: Int): Long =
    (p(i) & 0xFFL) | ((p(i + 1) & 0xFFL) << 8) |
      ((p(i + 2) & 0xFFL) << 16) | ((p(i + 3) & 0xFFL) << 24)

  /** Parse comments at `at` (vendor string first); bounds-checked. */
  private[graft] def xiphComments(p: Array[Byte], at: Int): Option[Map[String, String]] = {
    var i = at
    if (i + 4 > p.length) return None
    val vlen = le32(p, i); i += 4
    if (vlen < 0 || vlen > p.length - i) return None
    i += vlen.toInt
    if (i + 4 > p.length) return None
    val n = le32(p, i); i += 4
    if (n < 0 || n > (1 << 16)) return None
    val out = Map.newBuilder[String, String]
    var k = 0L
    while (k < n) {
      if (i + 4 > p.length) return None
      val clen = le32(p, i); i += 4
      if (clen < 0 || clen > p.length - i) return None
      val c = new String(p, i, clen.toInt, java.nio.charset.StandardCharsets.UTF_8)
      i += clen.toInt
      val eq = c.indexOf('=')
      if (eq > 0)
        out += (c.substring(0, eq).toUpperCase(java.util.Locale.ROOT) -> c.substring(eq + 1))
      k += 1
    }
    Some(out.result())
  }

  private def flacComments(p: Array[Byte]): Option[Map[String, String]] = {
    if (p.length < 8 || p(0) != 'f' || p(1) != 'L' || p(2) != 'a' || p(3) != 'C')
      return None
    var pos = 4
    var last = false
    while (!last && pos + 4 <= p.length) {
      val h = p(pos) & 0xFF
      last = (h & 0x80) != 0
      val tpe = h & 0x7F
      val len = ((p(pos + 1) & 0xFF) << 16) | ((p(pos + 2) & 0xFF) << 8) | (p(pos + 3) & 0xFF)
      if (pos + 4 + len > p.length) return None
      if (tpe == 4) return xiphComments(p, pos + 4)
      pos += 4 + len
    }
    Some(Map.empty) // valid FLAC, no comment block
  }

  private def oggComments(p: Array[Byte]): Option[Map[String, String]] = {
    // locate the comment-header marker — `\x03vorbis` (Vorbis I) or
    // `OpusTags` (RFC 7845 §5.2, round 14), both followed by the same
    // Xiph structure (single-page comment headers only — declared)
    val markers = Seq(
      Array[Byte](0x03, 'v', 'o', 'r', 'b', 'i', 's'),
      "OpusTags".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    var i = 0
    while (i < p.length) {
      markers.foreach { marker =>
        if (i + marker.length <= p.length) {
          var k = 0
          while (k < marker.length && p(i + k) == marker(k)) k += 1
          if (k == marker.length) return xiphComments(p, i + marker.length)
        }
      }
      i += 1
    }
    Some(Map.empty)
  }

  /** Sniff + extract. None only when the container itself is
    * unrecognized. */
  def tags(p: Array[Byte]): Option[Tags] = {
    if (p == null || p.length < 4) return None
    if (p(0) == 'I' && p(1) == 'D' && p(2) == '3') {
      id3TextFrames(p).map { fs =>
        Tags("mp3", fs.get("TIT2"), fs.get("TPE1"), fs.get("TALB"))
      }
    } else if (p(0) == 'f' && p(1) == 'L' && p(2) == 'a' && p(3) == 'C') {
      flacComments(p).map { cs =>
        Tags("flac", cs.get("TITLE"), cs.get("ARTIST"), cs.get("ALBUM"))
      }
    } else if (p(0) == 'O' && p(1) == 'g' && p(2) == 'g' && p(3) == 'S') {
      oggComments(p).map { cs =>
        Tags("ogg", cs.get("TITLE"), cs.get("ARTIST"), cs.get("ALBUM"))
      }
    } else None
  }

  /** (id, format, title, artist, album) rows — scan-local;
    * unrecognized payloads emit nulls with format null. */
  def decodeTags(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)), col(payloadCol))
      .as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        tags(payload) match {
          case Some(t) => (id, t.format, t.title.orNull, t.artist.orNull, t.album.orNull)
          case None => (id, null: String, null: String, null: String, null: String)
        }
      }
      .toDF("id", "format", "title", "artist", "album")
  }

  // ---- fixture packers ----

  private def syncsafe(v: Int): Array[Byte] =
    Array(((v >> 21) & 0x7F).toByte, ((v >> 14) & 0x7F).toByte,
      ((v >> 7) & 0x7F).toByte, (v & 0x7F).toByte)

  /** A REAL mp3 (one MPEG-1 Layer III frame) led by an ID3v2 tag:
    * v2.3 big-endian frame sizes for even ids (ISO-8859-1 text),
    * v2.4 syncsafe for odd (UTF-8 and UTF-16 text) — both size
    * arithmetics and three encodings load-bearing. */
  def packTagsMp3(id: Long, title: String, artist: String, album: String): Array[Byte] = {
    val v4 = (id / 2) % 2 == 1 // callers feed even ids: vary on id/2
    def frame(fid: String, text: String, enc: Int): Array[Byte] = {
      val data = enc match {
        case 0 => text.getBytes("ISO-8859-1")
        case 1 => text.getBytes("UTF-16") // JDK emits BOM + big-endian
        case _ => text.getBytes("UTF-8")
      }
      val size = data.length + 1
      val sizeBytes =
        if (v4) syncsafe(size)
        else Array((size >> 24).toByte, (size >> 16).toByte, (size >> 8).toByte, size.toByte)
      fid.getBytes("US-ASCII") ++ sizeBytes ++ Array[Byte](0, 0) ++
        Array(enc.toByte) ++ data
    }
    val enc = if (v4) { if ((id / 4) % 2 == 0) 3 else 1 } else 0
    val frames = frame("TIT2", title, enc) ++ frame("TPE1", artist, enc) ++
      frame("TALB", album, enc)
    val padded = frames ++ new Array[Byte](17) // padding ends the walk
    val header = Array[Byte]('I', 'D', '3', (if (v4) 4 else 3).toByte, 0, 0) ++
      syncsafe(padded.length)
    // one valid 417-byte MPEG-1 Layer III frame after the tag
    val mpeg = new Array[Byte](417)
    mpeg(0) = 0xFF.toByte; mpeg(1) = 0xFB.toByte; mpeg(2) = 0x90.toByte; mpeg(3) = 0xC0.toByte
    header ++ padded ++ mpeg
  }

  /** A minimal fLaC stream: STREAMINFO then a LAST vorbis-comment
    * block with the planted tags. */
  def packTagsFlac(title: String, artist: String, album: String): Array[Byte] = {
    def le(v: Int): Array[Byte] =
      Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val vendor = "graft".getBytes("UTF-8")
    val comments = Seq(s"Title=$title", s"artist=$artist", s"ALBUM=$album")
      .map(_.getBytes("UTF-8"))
    val body = le(vendor.length) ++ vendor ++ le(comments.length) ++
      comments.flatMap(c => le(c.length) ++ c)
    val streamInfo = new Array[Byte](34)
    // min/max block 4096; rate 44100 (20 bits), 2ch, 16bps, 0 samples
    streamInfo(0) = 0x10; streamInfo(1) = 0x00; streamInfo(2) = 0x10; streamInfo(3) = 0x00
    streamInfo(10) = 0x0A; streamInfo(11) = 0xC4.toByte; streamInfo(12) = 0x42
    val siBlock = Array[Byte](0x00, 0, 0, 34) ++ streamInfo
    val vcBlock = Array[Byte]((0x80 | 4).toByte,
      ((body.length >> 16) & 0xFF).toByte, ((body.length >> 8) & 0xFF).toByte,
      (body.length & 0xFF).toByte) ++ body
    "fLaC".getBytes("US-ASCII") ++ siBlock ++ vcBlock
  }
}
