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

  // ------------------------------------------------------------ sample tables

  /** One addressable media sample: absolute file offset/size, decode
    * time, and whether the sync-sample table marks it a keyframe. */
  final case class Sample(offset: Long, size: Long, timeMs: Long, keyframe: Boolean)

  /** The first VIDEO track's sample table, fully resolved. */
  final case class Track(codec: String, width: Int, height: Int,
      timescale: Long, samples: Vector[Sample])

  /** Resolve the first video track's sample table (ISO 14496-12 §8.5-
    * 8.7): `stsd` (codec 4cc + visual dims), `stts` (decode deltas),
    * `stsc` (chunk runs), `stsz` (sizes), `stco`/`co64` (chunk
    * offsets), `stss` (sync samples; ABSENT means every sample is a
    * sync sample, §8.6.2). This is the per-sample addressing a
    * frame-extraction pipeline needs — the codec payload bytes
    * themselves are handed to the per-format decoders (JPEG frames
    * decode fully; H.264/HEVC refuse by name). Never throws; `None`
    * on any table inconsistency (counts disagreeing, offsets out of
    * file, sample count over `maxSamples`). */
  def samples(p: Array[Byte], maxSamples: Int = 1 << 16): Option[Track] = {
    def u8(i: Int): Int = p(i) & 0xFF
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def tag(i: Int): String =
      new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (p.length < 16 || be32(0) < 16 || tag(4) != "ftyp") return None

    final case class Tables(var video: Boolean = false, var codec: String = "",
      var w: Int = 0, var h: Int = 0, var timescale: Long = 0,
      var trackId: Long = -1,
      var stts: Vector[(Long, Long)] = Vector.empty,
      var stsc: Vector[(Long, Long)] = Vector.empty,
      var stszUniform: Long = -1, var stsz: Vector[Long] = Vector.empty,
      var stco: Vector[Long] = Vector.empty,
      var stss: Option[Set[Long]] = None)

    var result: Option[Track] = None
    // FRAGMENTED MP4 (round 17): the video trak of an fMP4 has empty
    // sample tables — keep it (plus the mvex/trex defaults) so the
    // moof walk below can resolve the fragment runs instead
    var videoTables: Option[Tables] = None
    var trexDefaults = Map.empty[Long, (Long, Long, Long)] // id → (dur, size, flags)

    def resolve(t: Tables): Option[Track] = {
      if (!t.video || t.stco.isEmpty || t.stsc.isEmpty || t.stts.isEmpty) return None
      val count =
        if (t.stszUniform >= 0 && t.stsz.isEmpty) t.stts.map(_._1).sum
        else t.stsz.length.toLong
      if (count <= 0 || count > maxSamples) return None
      val n = count.toInt
      val sizes = if (t.stsz.nonEmpty) t.stsz else Vector.fill(n)(t.stszUniform)
      if (sizes.length != n) return None
      // per-sample decode times from the stts runs
      val times = new Array[Long](n)
      var si = 0; var tAcc = 0L
      for ((cnt, delta) <- t.stts; _ <- 0L until cnt) {
        if (si < n) { times(si) = tAcc; tAcc += delta; si += 1 }
      }
      if (si != n) return None
      // chunk map: samples-per-chunk per chunk index (1-based runs)
      val chunkCount = t.stco.length
      val spc = new Array[Long](chunkCount)
      var run = 0
      var c = 0
      while (c < chunkCount) {
        while (run + 1 < t.stsc.length && t.stsc(run + 1)._1 <= c + 1) run += 1
        spc(c) = t.stsc(run)._2
        c += 1
      }
      val out = Vector.newBuilder[Sample]
      var s = 0
      c = 0
      while (c < chunkCount && s < n) {
        var off = t.stco(c)
        var k = 0L
        while (k < spc(c) && s < n) {
          val sz = sizes(s)
          if (off < 0 || sz < 0 || off + sz > p.length) return None
          val key = t.stss.forall(_.contains(s + 1L))
          val ms = if (t.timescale > 0) times(s) * 1000L / t.timescale else times(s)
          out += Sample(off, sz, ms, key)
          off += sz
          s += 1; k += 1
        }
        c += 1
      }
      if (s != n) return None
      Some(Track(t.codec, t.w, t.h, t.timescale, out.result()))
    }

    def walk(from: Long, to: Long, depth: Int, t: Tables): Boolean = {
      if (depth > 10) return false
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
          size = math.min(large, to - i).toInt
        } else if (size == 0) size = (to - i).toInt
        if (size < header || i + size > to) return false
        val body = (i + header).toInt
        val end = i + size
        tag(at + 4) match {
          case "moov" =>
            if (!walk(body, end, depth + 1, t)) return false
          case "trak" =>
            val tt = Tables()
            if (!walk(body, end, depth + 1, tt)) return false
            if (result.isEmpty) result = resolve(tt)
            if (result.isEmpty && tt.video && videoTables.isEmpty) videoTables = Some(tt)
          case "mdia" | "minf" | "stbl" | "mvex" =>
            if (!walk(body, end, depth + 1, t)) return false
          case "tkhd" if body + 4 <= end =>
            val ver = u8(body)
            if (ver == 0 && body + 16 <= end) t.trackId = be32(body + 12)
            else if (ver == 1 && body + 24 <= end) t.trackId = be32(body + 20)
          case "trex" if body + 24 <= end =>
            trexDefaults += be32(body + 4) ->
              ((be32(body + 12), be32(body + 16), be32(body + 20)))
          case "mdhd" if body + 4 <= end =>
            val ver = u8(body)
            if (ver == 0 && body + 16 <= end) t.timescale = be32(body + 12)
            else if (ver == 1 && body + 24 <= end) t.timescale = be32(body + 20)
          case "hdlr" if body + 12 <= end =>
            if (tag(body + 8) == "vide") t.video = true
          case "stsd" if body + 16 <= end =>
            val entrySize = be32(body + 8)
            if (entrySize >= 16 && body + 8 + entrySize <= end) {
              t.codec = tag(body + 12)
              if (entrySize >= 36 && body + 44 <= end) {
                t.w = be16(body + 40); t.h = be16(body + 42)
              }
            }
          case "stts" if body + 8 <= end =>
            val cnt = be32(body + 4)
            if (cnt > 65536 || body + 8 + cnt * 8 > end) return false
            t.stts = Vector.tabulate(cnt.toInt)(k =>
              (be32(body + 8 + 8 * k), be32(body + 12 + 8 * k)))
          case "stsc" if body + 8 <= end =>
            val cnt = be32(body + 4)
            if (cnt > 65536 || body + 8 + cnt * 12 > end) return false
            t.stsc = Vector.tabulate(cnt.toInt)(k =>
              (be32(body + 8 + 12 * k), be32(body + 12 + 12 * k)))
          case "stsz" if body + 12 <= end =>
            val uniform = be32(body + 4)
            val cnt = be32(body + 8)
            if (uniform != 0) { t.stszUniform = uniform }
            else {
              if (cnt > 65536 || body + 12 + cnt * 4 > end) return false
              t.stsz = Vector.tabulate(cnt.toInt)(k => be32(body + 12 + 4 * k))
            }
          case "stco" if body + 8 <= end =>
            val cnt = be32(body + 4)
            if (cnt > 65536 || body + 8 + cnt * 4 > end) return false
            t.stco = Vector.tabulate(cnt.toInt)(k => be32(body + 8 + 4 * k))
          case "co64" if body + 8 <= end =>
            val cnt = be32(body + 4)
            if (cnt > 65536 || body + 8 + cnt * 8 > end) return false
            t.stco = Vector.tabulate(cnt.toInt)(k => be64(body + 8 + 8 * k))
          case "stss" if body + 8 <= end =>
            val cnt = be32(body + 4)
            if (cnt > 65536 || body + 8 + cnt * 4 > end) return false
            t.stss = Some(Vector.tabulate(cnt.toInt)(k => be32(body + 8 + 4 * k)).toSet)
          case _ => ()
        }
        i += size
      }
      true
    }

    /** FRAGMENTED-MP4 resolution (ISO 14496-12 §8.8): top-level `moof`
      * boxes carry `traf` → `tfhd` (per-fragment defaults; explicit
      * base-data-offset or the default-base-is-moof rule), `tfdt`
      * (base decode time), and `trun` runs (optional data offset,
      * first-sample-flags override, per-sample duration/size/flags/
      * cts per the flag bits). Keyframe = the sample_is_non_sync bit
      * (0x10000) CLEAR. Offsets run within a traf across its truns;
      * decode time continues across fragments when tfdt is absent. */
    def fragments(t: Tables): Option[Track] = {
      if (!t.video || t.trackId < 0) return None
      val (trexDur, trexSize, trexFlags) =
        trexDefaults.getOrElse(t.trackId, (0L, 0L, 0L))
      val out = Vector.newBuilder[Sample]
      var nOut = 0
      var runningDecode = 0L
      def ms(v: Long): Long = if (t.timescale > 0) v * 1000L / t.timescale else v

      def parseTraf(from: Long, to: Long, moofStart: Long): Boolean = {
        var defDur = trexDur; var defSize = trexSize; var defFlags = trexFlags
        var baseOffset = moofStart
        var trafTrackId = -1L
        var decode = -1L
        var cursor: Option[Long] = None
        var j = from
        var n = 0
        while (j + 8 <= to) {
          if ({ n += 1; n } > 4096) return false
          val at = j.toInt
          var size = be32(at); var header = 8L
          if (size == 1) {
            if (j + 16 > to) return false
            val large = be64(at + 8)
            if (large < 16) return false
            header = 16L
            size = math.min(large, to - j).toInt
          } else if (size == 0) size = (to - j).toInt
          if (size < header || j + size > to) return false
          val body = (j + header).toInt
          val end = j + size
          tag(at + 4) match {
            case "tfhd" if body + 8 <= end =>
              val flags = be32(body) & 0xFFFFFF
              trafTrackId = be32(body + 4)
              var k = body + 8L
              if ((flags & 0x01) != 0) { // base-data-offset
                if (k + 8 > end) return false
                baseOffset = be64(k.toInt); k += 8
              }
              if ((flags & 0x02) != 0) k += 4 // sample-description-index
              if ((flags & 0x08) != 0) {
                if (k + 4 > end) return false
                defDur = be32(k.toInt); k += 4
              }
              if ((flags & 0x10) != 0) {
                if (k + 4 > end) return false
                defSize = be32(k.toInt); k += 4
              }
              if ((flags & 0x20) != 0) {
                if (k + 4 > end) return false
                defFlags = be32(k.toInt); k += 4
              }
            // 0x20000 default-base-is-moof: base stays moofStart
            case "tfdt" if body + 8 <= end =>
              val ver = u8(body)
              decode = if (ver == 1) {
                if (body + 12 > end) return false
                be64(body + 4)
              } else be32(body + 4)
            case "trun" if body + 8 <= end =>
              val flags = be32(body) & 0xFFFFFF
              val cnt = be32(body + 4)
              if (cnt < 0 || nOut + cnt > maxSamples) return false
              var k = body + 8L
              var off = cursor.getOrElse(baseOffset)
              if ((flags & 0x01) != 0) { // data-offset (SIGNED, from base)
                if (k + 4 > end) return false
                off = baseOffset + be32(k.toInt).toInt // toInt: sign extend
                k += 4
              }
              var firstFlags = -1L
              if ((flags & 0x04) != 0) {
                if (k + 4 > end) return false
                firstFlags = be32(k.toInt); k += 4
              }
              var tDec = if (decode >= 0) decode else runningDecode
              val mine = trafTrackId == t.trackId
              var s = 0L
              while (s < cnt) {
                var dur = defDur
                var sz = defSize
                var fl = defFlags
                if ((flags & 0x100) != 0) {
                  if (k + 4 > end) return false
                  dur = be32(k.toInt); k += 4
                }
                if ((flags & 0x200) != 0) {
                  if (k + 4 > end) return false
                  sz = be32(k.toInt); k += 4
                }
                if ((flags & 0x400) != 0) {
                  if (k + 4 > end) return false
                  fl = be32(k.toInt); k += 4
                }
                if ((flags & 0x800) != 0) k += 4 // composition offset, unused
                if (s == 0 && firstFlags >= 0) fl = firstFlags
                if (mine) {
                  if (off < 0 || sz < 0 || off + sz > p.length) return false
                  out += Sample(off, sz, ms(tDec), (fl & 0x10000L) == 0)
                  nOut += 1
                }
                off += sz
                tDec += dur
                s += 1
              }
              if (mine) {
                cursor = Some(off)
                decode = tDec
                runningDecode = tDec
              }
            case _ => ()
          }
          j += size
        }
        true
      }

      // top-level scan for moof boxes
      var i = 0L
      while (i + 8 <= p.length) {
        val at = i.toInt
        var size = be32(at); var header = 8L
        if (size == 1) {
          if (i + 16 > p.length) return None
          val large = be64(at + 8)
          if (large < 16) return None
          header = 16L
          size = math.min(large, p.length - i).toInt
        } else if (size == 0) size = (p.length - i).toInt
        if (size < header || i + size > p.length) return None
        if (tag(at + 4) == "moof") {
          // children: mfhd (skipped) + trafs
          var j = i + header
          var n = 0
          while (j + 8 <= i + size) {
            if ({ n += 1; n } > 1024) return None
            val at2 = j.toInt
            var s2 = be32(at2); var h2 = 8L
            if (s2 == 1) {
              if (j + 16 > i + size) return None
              val large = be64(at2 + 8)
              if (large < 16) return None
              h2 = 16L
              s2 = math.min(large, i + size - j).toInt
            } else if (s2 == 0) s2 = (i + size - j).toInt
            if (s2 < h2 || j + s2 > i + size) return None
            if (tag(at2 + 4) == "traf" && !parseTraf(j + h2, j + s2, i)) return None
            j += s2
          }
        }
        i += size
      }
      val ss = out.result()
      if (ss.isEmpty) None
      else Some(Track(t.codec, t.w, t.h, t.timescale, ss))
    }

    try {
      if (!walk(0L, p.length.toLong, 0, Tables())) return None
      result.orElse(videoTables.flatMap(fragments))
    } catch {
      case _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException => None
    }
  }

  // ------------------------------------------------------------ fixture muxer

  /** Fixture/gate muxer: a spec-legal single-video-track MP4 whose
    * mdat carries the given frame payloads back-to-back, with full
    * sample tables — uniform stts at the given fps, one-chunk-per-
    * sample stsc/stco, explicit stsz, and an stss marking every
    * third sample a sync sample (so readers must actually consult
    * it). Codec 4cc `jpeg` = the QuickTime/ISO registration MJPEG
    * writers use. */
  private[graft] def mux(width: Int, height: Int, fps: Int,
      frames: Seq[Array[Byte]], codec: String = "jpeg"): Array[Byte] = {
    require(frames.nonEmpty && fps > 0)
    val bos = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be32(v: Long): Array[Byte] = Array((v >>> 24).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(t: String, payload: Array[Byte]): Array[Byte] =
      be32(8 + payload.length) ++ t.getBytes("US-ASCII") ++ payload
    def fullbox(t: String, payload: Array[Byte]): Array[Byte] =
      box(t, be32(0) ++ payload)
    val timescale = 1000L
    val delta = timescale / fps * 1L
    val n = frames.length
    val dur = delta * n
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0x200) ++
      "isomiso2mp41".getBytes("US-ASCII"))
    val mdatPayload = frames.flatten.toArray
    val mdatOff = ftyp.length + 8L
    val offsets = frames.scanLeft(mdatOff)((acc, f) => acc + f.length).init
    val mvhd = fullbox("mvhd", be32(0) ++ be32(0) ++ be32(timescale) ++ be32(dur) ++
      be32(0x00010000L) ++ be16(0x0100) ++ be16(0) ++ be32(0) ++ be32(0) ++
      be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0x00010000L) ++
      be32(0) ++ be32(0) ++ be32(0) ++ be32(0x40000000L) ++
      new Array[Byte](24) ++ be32(2))
    val tkhd = box("tkhd", be32(7) ++ // version 0, flags: enabled+in-movie+preview
      be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++ be32(dur) ++
      new Array[Byte](8) ++ be16(0) ++ be16(0) ++ be16(0) ++ be16(0) ++
      be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0x00010000L) ++
      be32(0) ++ be32(0) ++ be32(0) ++ be32(0x40000000L) ++
      be16(width) ++ be16(0) ++ be16(height) ++ be16(0))
    val mdhd = fullbox("mdhd", be32(0) ++ be32(0) ++ be32(timescale) ++ be32(dur) ++
      be16(0x55C4) ++ be16(0))
    val hdlr = fullbox("hdlr", be32(0) ++ "vide".getBytes("US-ASCII") ++
      new Array[Byte](12) ++ "v".getBytes("US-ASCII") ++ Array(0.toByte))
    val entry = be32(86) ++ codec.getBytes("US-ASCII") ++ new Array[Byte](6) ++
      be16(1) ++ be16(0) ++ be16(0) ++ new Array[Byte](12) ++
      be16(width) ++ be16(height) ++ be32(0x00480000L) ++ be32(0x00480000L) ++
      be32(0) ++ be16(1) ++ new Array[Byte](32) ++ be16(24) ++ be16(0xFFFF)
    val stsd = fullbox("stsd", be32(1) ++ entry)
    val stts = fullbox("stts", be32(1) ++ be32(n) ++ be32(delta))
    val stsc = fullbox("stsc", be32(1) ++ be32(1) ++ be32(1) ++ be32(1))
    val stsz = fullbox("stsz", be32(0) ++ be32(n) ++
      frames.toArray.flatMap(f => be32(f.length)))
    val stco = fullbox("stco", be32(offsets.length) ++
      offsets.toArray.flatMap(o => be32(o)))
    val syncs = (1 to n).filter(s => (s - 1) % 3 == 0)
    val stss = fullbox("stss", be32(syncs.length) ++ syncs.toArray.flatMap(s => be32(s)))
    val dref = fullbox("dref", be32(1) ++ box("url ", be32(1)))
    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco ++ stss)
    val minf = box("minf", fullbox("vmhd", be32(1) ++ be32(0)) ++
      box("dinf", dref) ++ stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    bos.write(ftyp)
    bos.write(box("mdat", mdatPayload))
    bos.write(moov)
    bos.toByteArray
  }

  /** FRAGMENTED fixture muxer (round 17): the same single-video-track
    * layout as [[mux]] but streaming-shaped — the moov's sample
    * tables are EMPTY (zero-entry stts/stsc/stsz/stco) and an
    * `mvex`/`trex` carries the defaults (duration = 1/fps, the
    * non-sync sample_flags), then one moof+mdat pair per
    * `framesPerFragment` frames: tfhd with default-base-is-moof,
    * tfdt with the fragment's base decode time, and a trun with an
    * explicit data offset, per-sample sizes, and per-sample flags
    * marking every third GLOBAL frame a sync sample. */
  private[graft] def muxFragmented(width: Int, height: Int, fps: Int,
      frames: Seq[Array[Byte]], framesPerFragment: Int = 2,
      codec: String = "jpeg"): Array[Byte] = {
    require(frames.nonEmpty && fps > 0 && framesPerFragment > 0)
    def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be32(v: Long): Array[Byte] = Array((v >>> 24).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(t: String, payload: Array[Byte]): Array[Byte] =
      be32(8 + payload.length) ++ t.getBytes("US-ASCII") ++ payload
    def fullbox(t: String, payload: Array[Byte]): Array[Byte] =
      box(t, be32(0) ++ payload)
    def fullboxF(t: String, flags: Long, payload: Array[Byte]): Array[Byte] =
      box(t, be32(flags) ++ payload)
    val timescale = 1000L
    val delta = timescale / fps
    val n = frames.length
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0x200) ++
      "isomiso5dash".getBytes("US-ASCII"))
    val mvhd = fullbox("mvhd", be32(0) ++ be32(0) ++ be32(timescale) ++ be32(0) ++
      be32(0x00010000L) ++ be16(0x0100) ++ be16(0) ++ be32(0) ++ be32(0) ++
      be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0x00010000L) ++
      be32(0) ++ be32(0) ++ be32(0) ++ be32(0x40000000L) ++
      new Array[Byte](24) ++ be32(2))
    val tkhd = box("tkhd", be32(7) ++
      be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++ be32(0) ++
      new Array[Byte](8) ++ be16(0) ++ be16(0) ++ be16(0) ++ be16(0) ++
      be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0x00010000L) ++
      be32(0) ++ be32(0) ++ be32(0) ++ be32(0x40000000L) ++
      be16(width) ++ be16(0) ++ be16(height) ++ be16(0))
    val mdhd = fullbox("mdhd", be32(0) ++ be32(0) ++ be32(timescale) ++ be32(0) ++
      be16(0x55C4) ++ be16(0))
    val hdlr = fullbox("hdlr", be32(0) ++ "vide".getBytes("US-ASCII") ++
      new Array[Byte](12) ++ "v".getBytes("US-ASCII") ++ Array(0.toByte))
    val entry = be32(86) ++ codec.getBytes("US-ASCII") ++ new Array[Byte](6) ++
      be16(1) ++ be16(0) ++ be16(0) ++ new Array[Byte](12) ++
      be16(width) ++ be16(height) ++ be32(0x00480000L) ++ be32(0x00480000L) ++
      be32(0) ++ be16(1) ++ new Array[Byte](32) ++ be16(24) ++ be16(0xFFFF)
    val stsd = fullbox("stsd", be32(1) ++ entry)
    val stblEmpty = box("stbl", stsd ++
      fullbox("stts", be32(0)) ++ fullbox("stsc", be32(0)) ++
      fullbox("stsz", be32(0) ++ be32(0)) ++ fullbox("stco", be32(0)))
    val dref = fullbox("dref", be32(1) ++ box("url ", be32(1)))
    val minf = box("minf", fullbox("vmhd", be32(1) ++ be32(0)) ++
      box("dinf", dref) ++ stblEmpty)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    // trex defaults: duration = delta, size 0, flags = non-sync
    val trex = fullbox("trex", be32(1) ++ be32(1) ++ be32(delta) ++
      be32(0) ++ be32(0x10000L))
    val moov = box("moov", mvhd ++ trak ++ box("mvex", trex))
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(ftyp); bos.write(moov)
    var seq = 1L
    var f0 = 0
    while (f0 < n) {
      val group = frames.slice(f0, math.min(n, f0 + framesPerFragment))
      val mfhd = fullbox("mfhd", be32(seq))
      val tfhd = fullboxF("tfhd", 0x20000L, be32(1)) // default-base-is-moof
      val tfdt = fullbox("tfdt", be32(f0 * delta))
      def trun(dataOffset: Long): Array[Byte] =
        fullboxF("trun", 0x01L | 0x200L | 0x400L, // data-offset + sizes + flags
          be32(group.length) ++ be32(dataOffset) ++
            group.zipWithIndex.toArray.flatMap { case (fr, k) =>
              be32(fr.length) ++
                be32(if ((f0 + k) % 3 == 0) 0L else 0x10000L)
            })
      def moof(dataOffset: Long): Array[Byte] =
        box("moof", mfhd ++ box("traf", tfhd ++ tfdt ++ trun(dataOffset)))
      val moofLen = moof(0L).length // offset field is fixed-width
      val bytes = moof(moofLen + 8L) // mdat payload starts after its header
      bos.write(bytes)
      bos.write(box("mdat", group.flatten.toArray))
      seq += 1
      f0 += framesPerFragment
    }
    bos.toByteArray
  }
}
