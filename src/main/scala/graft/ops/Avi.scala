package graft.ops

/** From-spec AVI (RIFF) container codec for MOTION-JPEG video — the
  * demux half of the real frame-level video path: an MJPEG AVI is a
  * RIFF tree whose `movi` LIST carries one complete baseline JPEG per
  * `00dc`/`00db` chunk, so [[JpegCodec]] turns each chunk into real
  * pixels with no native library (the public-knowledge alternative to
  * H.264, which genuinely needs one — see [[Multimodal]] scaladoc).
  *
  * Format is public: the RIFF/AVI layout (hdrl→avih, strl→strh/strf
  * BITMAPINFOHEADER, movi chunk stream, idx1 index) is the documented
  * Microsoft "AVI RIFF File Reference"; MJPG is the conventional
  * fccHandler for per-frame JPEG.
  *
  * Contract mirrors the other codecs: [[demux]] never throws on
  * hostile bytes — malformed structure, lying sizes, and oversized
  * frame counts all return None; all reads are bounds-checked and the
  * frame table is capped. [[encode]] is deterministic (same frames →
  * same bytes) and writes a single-stream video-only file with idx1.
  */
object AviCodec {

  /** Refuse to track more than this many frame chunks (a hostile
    * header can claim 2^32; real curation thumbnail clips are tiny). */
  val MaxFrames: Int = 65536

  /** Hostile-input cap on LIST nesting (real AVIs are <= 3 deep). */
  val MaxListDepth: Int = 64

  /** Demuxed AVI: stream header facts + the byte range of every video
    * frame chunk (offset, length into the original payload), in
    * stream order. `handler` is the strh fccHandler (e.g. "MJPG").
    */
  final case class AviInfo(
      width: Int, height: Int, usPerFrame: Long, declaredFrames: Long,
      handler: String, frames: Vector[(Int, Int)]) {
    def durationMs: Long = usPerFrame * frames.length / 1000
  }

  private def le16(p: Array[Byte], o: Int): Int =
    (p(o) & 0xFF) | ((p(o + 1) & 0xFF) << 8)

  private def le32(p: Array[Byte], o: Int): Long =
    (p(o) & 0xFFL) | ((p(o + 1) & 0xFFL) << 8) |
      ((p(o + 2) & 0xFFL) << 16) | ((p(o + 3) & 0xFFL) << 24)

  private def fourcc(p: Array[Byte], o: Int): String =
    new String(p, o, 4, "US-ASCII")

  /** Parse an AVI payload into stream facts + frame chunk ranges.
    * None for anything that is not a well-formed single-video AVI
    * (wrong magic, truncated chunks, no movi list, frame cap blown).
    */
  def demux(p: Array[Byte]): Option[AviInfo] =
    try demuxInner(p)
    catch { case _: RuntimeException | _: ArrayIndexOutOfBoundsException => None }

  private def demuxInner(p: Array[Byte]): Option[AviInfo] = {
    if (p.length < 24) return None
    if (fourcc(p, 0) != "RIFF" || fourcc(p, 8) != "AVI ") return None
    val riffEnd = math.min(p.length.toLong, 8L + le32(p, 4))

    var width = 0
    var height = 0
    var usPerFrame = 0L
    var declaredFrames = 0L
    var handler: String = null
    val frames = Vector.newBuilder[(Int, Int)]
    var nFrames = 0

    // walk(start, end, depth): iterate sibling chunks; recurse into
    // LISTs. Depth is capped so a hostile payload of deeply nested
    // 12-byte LIST headers can't StackOverflowError past the
    // RuntimeException net in demux (real AVIs nest hdrl/strl/movi,
    // depth <= 3).
    def walk(start: Long, end: Long, depth: Int): Boolean = {
      if (depth > MaxListDepth) return false
      var pos = start
      while (pos + 8 <= end) {
        val id = fourcc(p, pos.toInt)
        val size = le32(p, pos.toInt + 4)
        val body = pos + 8
        if (body + size > end) return false // lying size: reject
        id match {
          case "LIST" =>
            if (size < 4) return false
            val listType = fourcc(p, body.toInt)
            // recurse into the structural lists; skip unknown ones
            if (listType == "hdrl" || listType == "strl" || listType == "movi") {
              if (!walk(body + 4, body + size, depth + 1)) return false
            }
          case "avih" =>
            if (size < 40) return false
            usPerFrame = le32(p, body.toInt)
            declaredFrames = le32(p, body.toInt + 16)
            width = le32(p, body.toInt + 32).toInt
            height = le32(p, body.toInt + 36).toInt
          case "strh" =>
            if (size < 8) return false
            if (fourcc(p, body.toInt) == "vids" && handler == null)
              handler = fourcc(p, body.toInt + 4)
          case _ =>
            // video frame chunks: ##dc (compressed) / ##db (uncompressed)
            if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
              (id.substring(2) == "dc" || id.substring(2) == "db")) {
              nFrames += 1
              if (nFrames > MaxFrames) return false
              frames += ((body.toInt, size.toInt))
            }
        }
        pos = body + size + (size & 1) // chunks are word-aligned
      }
      true
    }

    if (!walk(12, riffEnd, 0)) return None
    val fs = frames.result()
    if (width <= 0 || height <= 0 || fs.isEmpty || handler == null) None
    else Some(AviInfo(width, height, usPerFrame, declaredFrames, handler, fs))
  }

  /** Write a single-stream MJPEG AVI: each element of `frames` must
    * be one complete encoded JPEG (e.g. [[JpegEncoder.encode]]).
    */
  def encode(width: Int, height: Int, fps: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0, "avi encode: empty dimensions")
    require(fps > 0, s"avi encode: fps=$fps must be positive")
    require(frames.nonEmpty && frames.length <= MaxFrames,
      s"avi encode: need 1..$MaxFrames frames, got ${frames.length}")
    val out = new java.io.ByteArrayOutputStream()
    def le16w(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def le32w(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    def fcc(s: String): Unit = out.write(s.getBytes("US-ASCII"))

    val maxFrame = frames.map(_.length).max
    val usPerFrame = 1000000L / fps

    // avih: 56-byte MainAVIHeader
    def writeAvih(): Unit = {
      fcc("avih"); le32w(56)
      le32w(usPerFrame); le32w(maxFrame.toLong * fps); le32w(0)
      le32w(0x10) // AVIF_HASINDEX
      le32w(frames.length.toLong); le32w(0); le32w(1); le32w(maxFrame.toLong)
      le32w(width.toLong); le32w(height.toLong)
      le32w(0); le32w(0); le32w(0); le32w(0)
    }
    // strh: 56-byte AVIStreamHeader (vids/MJPG, rate=fps scale=1)
    def writeStrh(): Unit = {
      fcc("strh"); le32w(56)
      fcc("vids"); fcc("MJPG")
      le32w(0); le16w(0); le16w(0); le32w(0)
      le32w(1); le32w(fps.toLong) // dwScale, dwRate → fps
      le32w(0); le32w(frames.length.toLong); le32w(maxFrame.toLong)
      le32w(0xFFFFFFFFL) // dwQuality: default
      le32w(0)
      le16w(0); le16w(0); le16w(width); le16w(height) // rcFrame
    }
    // strf: 40-byte BITMAPINFOHEADER with biCompression='MJPG'
    def writeStrf(): Unit = {
      fcc("strf"); le32w(40)
      le32w(40); le32w(width.toLong); le32w(height.toLong)
      le16w(1); le16w(24)
      fcc("MJPG")
      le32w(width.toLong * height * 3); le32w(0); le32w(0); le32w(0); le32w(0)
    }

    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviBody = frames.map(f => 8 + f.length + (f.length & 1)).sum
    val moviSize = 4 + moviBody
    val idx1Size = frames.length * 16
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)

    fcc("RIFF"); le32w(riffSize.toLong); fcc("AVI ")
    fcc("LIST"); le32w(hdrlSize.toLong); fcc("hdrl")
    writeAvih()
    fcc("LIST"); le32w(strlSize.toLong); fcc("strl")
    writeStrh(); writeStrf()
    fcc("LIST"); le32w(moviSize.toLong); fcc("movi")
    // chunk offsets for idx1, measured from the 'movi' fourcc (the
    // convention every demuxer accepts)
    val offsets = new Array[Long](frames.length)
    var rel = 4L
    frames.zipWithIndex.foreach { case (f, i) =>
      offsets(i) = rel
      fcc("00dc"); le32w(f.length.toLong); out.write(f)
      if ((f.length & 1) == 1) out.write(0) // word alignment pad
      rel += 8 + f.length + (f.length & 1)
    }
    fcc("idx1"); le32w(idx1Size.toLong)
    frames.zipWithIndex.foreach { case (f, i) =>
      fcc("00dc"); le32w(0x10) // AVIIF_KEYFRAME
      le32w(offsets(i)); le32w(f.length.toLong)
    }
    out.toByteArray
  }
}
