package graft.ops

/** MP4 / ISO base media file format (ISO/IEC 14496-12) metadata
  * parser — the video leg of the real-codec trio (PNG/GIF pixels,
  * PCM samples, and now MP4 container metadata). Walks the box tree:
  * `ftyp` (brand check), `moov` → `mvhd` (timescale + duration, both
  * version 0 and 1 layouts) and `moov` → `trak` → `tkhd` (track
  * width/height as 16.16 fixed point, v0/v1 layouts). Returns the
  * movie duration and the first non-zero track dimensions — the
  * fields a curation pipeline filters and buckets on.
  *
  * Full video FRAME decode (H.264 et al.) genuinely needs a native
  * library and stays behind the documented stand-in seam
  * ([[Multimodal.frameSample]]); container metadata does not, so it
  * is implemented for real, with the same contracts as the other
  * codecs: never throws on hostile bytes (Long cursors, bounded
  * recursion, size-checked reads), refuses rather than guesses.
  */
object Mp4 {

  /** (major_brand, duration_ms, width, height); width/height None when
    * no video track declares them. */
  final case class Meta(brand: String, durationMs: Long, width: Option[Int], height: Option[Int])

  def parse(p: Array[Byte]): Option[Meta] = {
    def u8(i: Int): Int = p(i) & 0xFF
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def tag(i: Int): String =
      new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

    if (p.length < 16) return None
    // first box must be ftyp (the de-facto contract for .mp4 files)
    if (be32(0) < 16 || tag(4) != "ftyp") return None
    val brand = tag(8)

    var timescale = 0L; var duration = -1L
    var width: Option[Int] = None; var height: Option[Int] = None

    /** Walk boxes in [from, to); depth-bounded container recursion. */
    def walk(from: Long, to: Long, depth: Int): Boolean = {
      if (depth > 8) return false
      var i = from
      while (i + 8 <= to) {
        val at = i.toInt
        var size = be32(at)
        var header = 8L
        if (size == 1) {
          if (i + 16 > to) return false
          val large = be64(at + 8)
          if (large < 16) return false
          header = 16L
          // clamp: a hostile 2^63 size must not wrap the cursor
          size = math.min(large, to - i).toInt
        } else if (size == 0) {
          size = (to - i).toInt // box extends to end of enclosing scope
        }
        if (size < header || i + size > to) return false
        val body = i + header
        tag(at + 4) match {
          case "moov" | "trak" | "mdia" =>
            if (!walk(body, i + size, depth + 1)) return false
          case "mvhd" if body + 4 <= to =>
            val ver = u8(body.toInt)
            if (ver == 0 && body + 20 <= i + size) {
              timescale = be32(body.toInt + 12)
              duration = be32(body.toInt + 16)
            } else if (ver == 1 && body + 32 <= i + size) {
              timescale = be32(body.toInt + 20)
              duration = be64(body.toInt + 24)
            }
          case "tkhd" if body + 4 <= to =>
            val ver = u8(body.toInt)
            // width/height are the LAST 8 body bytes in both layouts
            // (v0 body = 84 bytes, v1 = 96), 16.16 fixed point
            val bodyLen = ver match { case 0 => 84L; case 1 => 96L; case _ => -1L }
            if (bodyLen > 0 && header + bodyLen <= size) {
              val wAt = (body + bodyLen - 8).toInt
              val w = be16(wAt); val h = be16(wAt + 4) // integer part of 16.16
              if (w > 0 && h > 0 && width.isEmpty) { width = Some(w); height = Some(h) }
            }
          case _ => () // mdat, free, udta, … — skip
        }
        i += size
      }
      true
    }

    if (!walk(0L, p.length.toLong, 0)) return None
    if (duration < 0) return None // no mvhd → not a playable movie
    val durMs = if (timescale > 0) duration * 1000L / timescale else 0L
    Some(Meta(brand, durMs, width, height))
  }
}
