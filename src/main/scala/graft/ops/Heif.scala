package graft.ops

/** HEIF-family (ISO/IEC 23008-12 on ISO-BMFF) image METADATA reader
  * for the web's two rising still formats: AVIF (AV1 payload, AOM
  * spec) and HEIC (HEVC payload) — the curation surface (mime, item
  * structure, dimensions, orientation, alpha presence) without
  * decoding the video-codec payload, which refuses by name (an AV1 /
  * HEVC decoder is the MP3-class boundary: enormous spec DATA with
  * no in-environment pin).
  *
  * Parsed: `ftyp` brands, the `meta` box walk — `hdlr` (must be
  * `pict`), `pitm` primary item, `iinf`/`infe` items (v2/v3),
  * `iprp` = `ipco` ordered property pool + `ipma` per-item
  * associations (`ispe` spatial extents, `irot` rotation, `imir`
  * mirror, `pixi` bit depths), and `iref` `auxl` references +
  * `auxC` aux-type URNs for alpha detection.
  *
  * Dimension semantics: [[Meta.width]]/[[Meta.height]] are the
  * DISPLAYED dims — the primary item's `ispe` extents with its
  * `irot` applied (90/270 swap axes) — matching what libheif's
  * `heif_image_handle_get_width/height` reports; the raw coded
  * extents stay in [[Meta.codedWidth]]/[[Meta.codedHeight]],
  * matching what libavif's parse-only `decoder->image` reports.
  * Both libraries were used as reference pins: every container the
  * in-repo fixture builder writes was parsed by BOTH system
  * libraries (libheif.so.1, libavif.so.15) and the reported dims
  * agree with these fields (see HeifSpec digest pins).
  *
  * Hostile-bytes contract as everywhere in this package: bounds-
  * checked reads, box-count caps, never throws — `None` instead of
  * guessing.
  */
object Heif {

  /** `gridRows`/`gridCols` are 0 for plain single-image items; for a
    * `grid` primary (the tiled iPhone HEIC layout) they carry the
    * tile grid shape, `codec` the TILE items' codec, and the dims the
    * grid's OUTPUT canvas (ispe when present, else the ImageGrid
    * config) with the grid item's irot applied. */
  final case class Meta(brand: String, codec: String, primaryId: Int,
      itemCount: Int, width: Int, height: Int,
      codedWidth: Int, codedHeight: Int,
      rotationCcw: Int, mirrorAxis: Option[Int], hasAlpha: Boolean,
      gridRows: Int = 0, gridCols: Int = 0)

  private object Bad extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bad(): Nothing = throw Bad

  /** Major or compatible brands that mark a HEIF-family still image. */
  private val Brands = Set("avif", "avis", "heic", "heix", "heim", "heis",
    "hevc", "hevx", "mif1", "msf1", "miaf")

  def looksLike(p: Array[Byte]): Boolean =
    p.length >= 12 && p(4) == 'f' && p(5) == 't' && p(6) == 'y' && p(7) == 'p' &&
      Brands.contains(new String(p, 8, 4, java.nio.charset.StandardCharsets.US_ASCII))

  def parse(p: Array[Byte]): Option[Meta] =
    try {
      if (!looksLike(p)) return None
      @inline def u8(i: Int): Int = p(i) & 0xFF
      @inline def be16(i: Int): Int = { if (i + 2 > p.length) bad(); (u8(i) << 8) | u8(i + 1) }
      @inline def be32(i: Int): Long = {
        if (i + 4 > p.length) bad()
        (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      }
      def fourcc(i: Int): String = {
        if (i + 4 > p.length) bad()
        new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      }
      val brand = fourcc(8)

      // find the top-level meta box
      var metaFrom = -1; var metaTo = -1
      var i = 0
      var guard = 0
      while (i + 8 <= p.length && metaFrom < 0) {
        if ({ guard += 1; guard } > 64) bad()
        val size = be32(i)
        if (size < 8 || i + size > p.length) bad()
        if (fourcc(i + 4) == "meta") { metaFrom = i + 12; metaTo = i + size.toInt }
        i += size.toInt
      }
      if (metaFrom < 0) return None

      // walk meta children
      var handlerOk = false
      var primaryId = -1
      var items = Vector.empty[(Int, String)] // (id, type)
      var ipcoProps = Vector.empty[(String, Int)] // (type, payload offset)
      var ipmaAssoc = Map.empty[Int, Seq[Int]] // item id -> 1-based ipco indices
      var auxlRefs = Vector.empty[(Int, Seq[Int])] // (from item, to items)
      var dimgRefs = Vector.empty[(Int, Seq[Int])] // (grid item, tile items)
      var ilocRange: Option[(Int, Int)] = None // payload (from, to)
      var idatFrom = -1 // idat payload start (construction method 1)

      def walkIinf(from: Int, to: Int): Unit = {
        val version = u8(from)
        val countLen = if (version == 0) 2 else 4
        val count = if (version == 0) be16(from + 4) else be32(from + 4).toInt
        if (count < 0 || count > 4096) bad()
        var j = from + 4 + countLen
        var n = 0
        while (n < count && j + 8 <= to) {
          val sz = be32(j)
          if (sz < 8 || j + sz > to) bad()
          if (fourcc(j + 4) == "infe") {
            val v = u8(j + 8)
            if (v >= 2) {
              val id = if (v == 2) be16(j + 12) else be32(j + 12).toInt
              val typOff = if (v == 2) j + 16 else j + 18
              items :+= ((id, fourcc(typOff)))
            }
          }
          j += sz.toInt
          n += 1
        }
      }

      def walkIpco(from: Int, to: Int): Unit = {
        var j = from
        var n = 0
        while (j + 8 <= to) {
          if ({ n += 1; n } > 256) bad()
          val sz = be32(j)
          if (sz < 8 || j + sz > to) bad()
          ipcoProps :+= ((fourcc(j + 4), j + 8))
          j += sz.toInt
        }
      }

      def walkIpma(from: Int, to: Int): Unit = {
        val version = u8(from)
        val flags = ((u8(from + 1) << 16) | be16(from + 2)) & 0xFFFFFF
        val count = be32(from + 4).toInt
        if (count < 0 || count > 4096) bad()
        var j = from + 8
        var n = 0
        while (n < count && j < to) {
          val id = if (version == 0) { val v = be16(j); j += 2; v }
                   else { val v = be32(j).toInt; j += 4; v }
          val assocCount = u8(j); j += 1
          var ids = Vector.empty[Int]
          var a = 0
          while (a < assocCount) {
            if ((flags & 1) == 1) { ids :+= (be16(j) & 0x7FFF); j += 2 }
            else { ids :+= (u8(j) & 0x7F); j += 1 }
            a += 1
          }
          ipmaAssoc += id -> ids
          n += 1
        }
      }

      def walkIref(from: Int, to: Int): Unit = {
        val version = u8(from)
        var j = from + 4
        var n = 0
        while (j + 8 <= to) {
          if ({ n += 1; n } > 1024) bad()
          val sz = be32(j)
          if (sz < 8 || j + sz > to) bad()
          val refType = fourcc(j + 4)
          if (refType == "auxl" || refType == "dimg") {
            var k = j + 8
            val fromId = if (version == 0) { val v = be16(k); k += 2; v }
                         else { val v = be32(k).toInt; k += 4; v }
            val cnt = be16(k); k += 2
            if (cnt > 1024) bad()
            var toIds = Vector.empty[Int]
            var c = 0
            while (c < cnt) {
              toIds :+= (if (version == 0) { val v = be16(k); k += 2; v }
                         else { val v = be32(k).toInt; k += 4; v })
              c += 1
            }
            if (refType == "auxl") auxlRefs :+= ((fromId, toIds))
            else dimgRefs :+= ((fromId, toIds))
          }
          j += sz.toInt
        }
      }

      var j = metaFrom
      var boxes = 0
      while (j + 8 <= metaTo) {
        if ({ boxes += 1; boxes } > 64) bad()
        val sz = be32(j)
        if (sz < 8 || j + sz > metaTo) bad()
        fourcc(j + 4) match {
          case "hdlr" =>
            handlerOk = fourcc(j + 16) == "pict"
          case "pitm" =>
            val v = u8(j + 8)
            primaryId = if (v == 0) be16(j + 12) else be32(j + 12).toInt
          case "iinf" => walkIinf(j + 8, j + sz.toInt)
          case "iloc" => ilocRange = Some((j + 8, j + sz.toInt))
          case "idat" => idatFrom = j + 8
          case "iprp" =>
            var k = j + 8
            var m = 0
            while (k + 8 <= j + sz.toInt) {
              if ({ m += 1; m } > 8) bad()
              val s2 = be32(k)
              if (s2 < 8 || k + s2 > j + sz.toInt) bad()
              fourcc(k + 4) match {
                case "ipco" => walkIpco(k + 8, k + s2.toInt)
                case "ipma" => walkIpma(k + 8, k + s2.toInt)
                case _ => ()
              }
              k += s2.toInt
            }
          case "iref" => walkIref(j + 8, j + sz.toInt)
          case _ => ()
        }
        j += sz.toInt
      }

      if (!handlerOk || primaryId < 0 || items.isEmpty) return None
      val primaryType = items.find(_._1 == primaryId).map(_._2).getOrElse(return None)

      // resolve a given item's properties out of ipco via ipma
      def propsOf(itemId: Int): Seq[(String, Int)] =
        ipmaAssoc.getOrElse(itemId, Seq.empty).flatMap { idx1 =>
          if (idx1 >= 1 && idx1 <= ipcoProps.length) Some(ipcoProps(idx1 - 1)) else None
        }

      // the FIRST extent location of an item out of iloc:
      // (construction method, resolved offset). No `return` inside —
      // malformed shapes throw Bad (the nested-closure return trap).
      def ilocFirstExtent(itemId: Int): Option[(Int, Long)] =
        ilocRange.flatMap { case (from, to) =>
          val version = u8(from)
          if (version > 2) None
          else {
            val offsetSize = u8(from + 4) >> 4
            val lengthSize = u8(from + 4) & 15
            val baseOffsetSize = u8(from + 5) >> 4
            val indexSize = if (version >= 1) u8(from + 5) & 15 else 0
            def okSize(s: Int) = s == 0 || s == 4 || s == 8
            if (!okSize(offsetSize) || !okSize(lengthSize) ||
                !okSize(baseOffsetSize) || !okSize(indexSize)) None
            else {
              var j2 = from + 6
              val count = if (version < 2) { val v = be16(j2); j2 += 2; v }
                          else { val v = be32(j2).toInt; j2 += 4; v }
              if (count < 0 || count > 4096) bad()
              def readN(size: Int): Long = {
                var v = 0L; var b = 0
                while (b < size) { v = (v << 8) | u8(j2); j2 += 1; b += 1 }
                v
              }
              var found: Option[(Int, Long)] = None
              var n = 0
              while (n < count && found.isEmpty && j2 < to) {
                val id = if (version < 2) { val v = be16(j2); j2 += 2; v }
                         else { val v = be32(j2).toInt; j2 += 4; v }
                val method = if (version >= 1) { val v = be16(j2) & 15; j2 += 2; v } else 0
                j2 += 2 // data_reference_index
                val baseOffset = readN(baseOffsetSize)
                val extents = be16(j2); j2 += 2
                if (extents < 1 || extents > 1024) bad()
                var firstOff = 0L
                var e = 0
                while (e < extents) {
                  if (version >= 1 && indexSize > 0) readN(indexSize)
                  val off = readN(offsetSize)
                  readN(lengthSize)
                  if (e == 0) firstOff = off
                  e += 1
                }
                if (id == itemId) found = Some((method, baseOffset + firstOff))
                n += 1
              }
              found
            }
          }
        }

      // GRID primary (round 17 — the tiled iPhone HEIC layout): the
      // grid item's payload is the spec's ImageGrid struct — version,
      // flags (bit0 = 32-bit output fields), rows/cols minus one,
      // output width/height — located via iloc (construction method 0
      // = file offset, 1 = into idat); tiles arrive by `dimg`
      // reference in row-major order and must FILL the grid exactly.
      val isGrid = primaryType == "grid"
      var gridRows = 0; var gridCols = 0
      var gridW = 0; var gridH = 0
      var codecType = primaryType
      if (isGrid) {
        val tiles = dimgRefs.find(_._1 == primaryId).map(_._2).getOrElse(Vector.empty)
        if (tiles.isEmpty) return None
        val tileTypes = tiles.map(tid =>
          items.find(_._1 == tid).map(_._2).getOrElse(return None)).distinct
        if (tileTypes.size != 1) return None // heterogeneous tiles: refuse
        codecType = tileTypes.head
        val (method, off) = ilocFirstExtent(primaryId).getOrElse(return None)
        val g = method match {
          case 0 => off
          case 1 if idatFrom >= 0 => idatFrom + off
          case _ => return None
        }
        if (g < 0 || g + 8 > p.length) return None
        val gi = g.toInt
        if (u8(gi) != 0) return None // unknown ImageGrid version
        val fieldSize = if ((u8(gi + 1) & 1) == 1) 4 else 2
        gridRows = u8(gi + 2) + 1
        gridCols = u8(gi + 3) + 1
        if (tiles.length != gridRows * gridCols) return None
        gridW = if (fieldSize == 2) be16(gi + 4) else be32(gi + 4).toInt
        gridH = if (fieldSize == 2) be16(gi + 6) else be32(gi + 8).toInt
        if (gridW <= 0 || gridH <= 0) return None
      }

      val primProps = propsOf(primaryId)
      // the coded canvas: the primary's own ispe wins (what libheif
      // reports); a grid without one falls back to its ImageGrid
      // output dims
      val (cw, chh) = primProps.find(_._1 == "ispe") match {
        case Some(ispe) =>
          val a = be32(ispe._2 + 4).toInt
          val b = be32(ispe._2 + 8).toInt
          if (a <= 0 || b <= 0) return None
          (a, b)
        case None if isGrid => (gridW, gridH)
        case None => return None
      }
      val rot = primProps.find(_._1 == "irot").map(o => (u8(o._2) & 3) * 90).getOrElse(0)
      val mirror = primProps.find(_._1 == "imir").map(o => u8(o._2) & 1)
      val (w, h) = if (rot == 90 || rot == 270) (chh, cw) else (cw, chh)
      // alpha: any aux item referencing the primary whose auxC names an
      // alpha urn — the MIAF generic one or the AVC/HEVC auxid:1 forms
      // (the set the reference libheif matches)
      val hasAlpha = auxlRefs.exists { case (fromId, toIds) =>
        toIds.contains(primaryId) && propsOf(fromId).exists { case (t, off) =>
          t == "auxC" && {
            var e = off + 4
            while (e < p.length && p(e) != 0) e += 1
            val urn = new String(p, off + 4, e - (off + 4),
              java.nio.charset.StandardCharsets.US_ASCII)
            urn == "urn:mpeg:mpegB:cicp:systems:auxiliary:alpha" ||
              urn == "urn:mpeg:hevc:2015:auxid:1" ||
              urn == "urn:mpeg:avc:2015:auxid:1"
          }
        }
      }
      Some(Meta(brand, codecType, primaryId, items.length,
        w, h, cw, chh, rot, mirror, hasAlpha, gridRows, gridCols))
    } catch {
      case Bad | _: ArrayIndexOutOfBoundsException | _: StringIndexOutOfBoundsException => None
    }

  // ------------------------------------------------------------ fixture builder

  /** Fixture/gate builder: a spec-legal AVIF or HEIC container whose
    * meta box carries real structure (primary + optional alpha aux
    * item, ispe/irot/imir/pixi + codec config properties, ipma
    * associations, iloc extents into a placeholder mdat — the codec
    * payload itself is opaque garbage, which is exactly the
    * metadata-only contract). Containers from this builder were
    * cross-parsed by the system libheif AND libavif (see HeifSpec). */
  private[graft] def build(avif: Boolean, w: Int, h: Int, rotationCcw: Int,
      mirrorAxis: Option[Int], withAlpha: Boolean): Array[Byte] = {
    require(w >= 1 && h >= 1 && Set(0, 90, 180, 270)(rotationCcw))
    val bos = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be32(v: Int): Array[Byte] = Array((v >>> 24).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(t: String, payload: Array[Byte]): Array[Byte] =
      be32(8 + payload.length) ++ t.getBytes("US-ASCII") ++ payload
    def fullbox(t: String, version: Int, payload: Array[Byte]): Array[Byte] =
      box(t, be32(version << 24) ++ payload)
    val brand = if (avif) "avif" else "heic"
    val codec = if (avif) "av01" else "hvc1"
    val ftyp = box("ftyp", brand.getBytes("US-ASCII") ++ be32(0) ++
      (brand + "mif1miaf").getBytes("US-ASCII"))
    val hdlr = fullbox("hdlr", 0, be32(0) ++ "pict".getBytes("US-ASCII") ++
      new Array[Byte](12) ++ Array(0.toByte))
    val pitm = fullbox("pitm", 0, be16(1))
    def infe(id: Int, typ: String): Array[Byte] =
      fullbox("infe", 2, be16(id) ++ be16(0) ++ typ.getBytes("US-ASCII") ++ Array(0.toByte))
    val itemList = if (withAlpha) Seq(infe(1, codec), infe(2, codec)) else Seq(infe(1, codec))
    val iinf = fullbox("iinf", 0, be16(itemList.length) ++ itemList.flatten.toArray)
    val ispe = fullbox("ispe", 0, be32(w) ++ be32(h))
    val cfg = if (avif) box("av1C", Array(0x81, 0x00, 0x0c, 0x00).map(_.toByte))
      else box("hvcC", Array(1, 0x01, 0, 0, 0, 0x60, 0, 0, 0, 0, 0, 0x99, 0xF0,
        0x00, 0xFC, 0xFD, 0xF8, 0xF8, 0, 0, 0x0F, 0x03, 0).map(_.toByte))
    val pixi = fullbox("pixi", 0, Array(3, 8, 8, 8).map(_.toByte))
    // property pool order: 1 ispe, 2 cfg, 3 pixi, then optional irot,
    // imir, auxC
    var pool = Vector(ispe, cfg, pixi)
    var primAssoc = Vector(1, 2 | 0x80, 3) // cfg essential
    if (rotationCcw != 0) { pool :+= box("irot", Array((rotationCcw / 90).toByte)); primAssoc :+= pool.length }
    mirrorAxis.foreach { ax => pool :+= box("imir", Array((ax & 1).toByte)); primAssoc :+= pool.length }
    var alphaAssoc = Vector.empty[Int]
    if (withAlpha) {
      pool :+= fullbox("auxC",
        0, ("urn:mpeg:mpegB:cicp:systems:auxiliary:alpha" + "\u0000").getBytes("US-ASCII"))
      // the alpha aux shares the master's transform properties — a
      // conforming reader (libheif) drops an alpha image whose
      // DISPLAYED dims differ from the rotated master's
      alphaAssoc = primAssoc :+ pool.length
    }
    val ipco = box("ipco", pool.flatten.toArray)
    def entry(id: Int, assoc: Vector[Int]): Array[Byte] =
      be16(id) ++ Array(assoc.length.toByte) ++ assoc.map(_.toByte).toArray
    val ipmaEntries = if (withAlpha) entry(1, primAssoc) ++ entry(2, alphaAssoc)
      else entry(1, primAssoc)
    val ipma = fullbox("ipma", 0, be32(if (withAlpha) 2 else 1) ++ ipmaEntries)
    val iprp = box("iprp", ipco ++ ipma)
    val iref = if (withAlpha)
      fullbox("iref", 0, box("auxl", be16(2) ++ be16(1) ++ be16(1)))
    else Array.emptyByteArray
    val payload = new Array[Byte](16)
    def iloc(offset: Int): Array[Byte] = {
      val perItem = (id: Int) => be16(id) ++ be16(0) ++ be16(1) ++ be32(offset) ++ be32(8)
      val n = if (withAlpha) 2 else 1
      fullbox("iloc", 0, Array(0x44.toByte, 0.toByte) ++ be16(n) ++
        (1 to n).toArray.flatMap(perItem))
    }
    def assemble(off: Int): (Array[Byte], Int) = {
      val meta = fullbox("meta", 0, hdlr ++ pitm ++ iloc(off) ++ iinf ++ iprp ++ iref)
      (ftyp ++ meta ++ box("mdat", payload), ftyp.length + meta.length + 8)
    }
    val (_, off1) = assemble(0)
    val (out, off2) = assemble(off1)
    require(off1 == off2)
    bos.write(out)
    bos.toByteArray
  }

  /** Fixture builder for TILED (grid) containers — the iPhone HEIC
    * default layout: item 1 is the `grid` primary whose ImageGrid
    * payload lives in mdat (construction method 0) or idat (method 1),
    * items 2..n+1 the codec tiles referenced by `dimg` in row-major
    * order. `gridIspe` controls whether the grid item carries its own
    * ispe (real files do; absent exercises the config-dims fallback);
    * `wideFields` writes the 32-bit ImageGrid variant. */
  private[graft] def buildGrid(avif: Boolean, tileW: Int, tileH: Int,
      rows: Int, cols: Int, outW: Int, outH: Int,
      gridIspe: Boolean = true, inIdat: Boolean = false,
      rotationCcw: Int = 0, wideFields: Boolean = false): Array[Byte] = {
    require(rows >= 1 && cols >= 1 && tileW >= 1 && tileH >= 1 &&
      outW >= 1 && outH >= 1 && Set(0, 90, 180, 270)(rotationCcw))
    def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be32(v: Int): Array[Byte] = Array((v >>> 24).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(t: String, payload: Array[Byte]): Array[Byte] =
      be32(8 + payload.length) ++ t.getBytes("US-ASCII") ++ payload
    def fullbox(t: String, version: Int, payload: Array[Byte]): Array[Byte] =
      box(t, be32(version << 24) ++ payload)
    val n = rows * cols
    val brand = if (avif) "avif" else "heic"
    val codec = if (avif) "av01" else "hvc1"
    val ftyp = box("ftyp", brand.getBytes("US-ASCII") ++ be32(0) ++
      (brand + "mif1miaf").getBytes("US-ASCII"))
    val hdlr = fullbox("hdlr", 0, be32(0) ++ "pict".getBytes("US-ASCII") ++
      new Array[Byte](12) ++ Array(0.toByte))
    val pitm = fullbox("pitm", 0, be16(1))
    def infe(id: Int, typ: String): Array[Byte] =
      fullbox("infe", 2, be16(id) ++ be16(0) ++ typ.getBytes("US-ASCII") ++ Array(0.toByte))
    val itemList = infe(1, "grid") +: (2 to n + 1).map(infe(_, codec))
    val iinf = fullbox("iinf", 0, be16(itemList.length) ++ itemList.flatten.toArray)
    val tileIspe = fullbox("ispe", 0, be32(tileW) ++ be32(tileH))
    val cfg = if (avif) box("av1C", Array(0x81, 0x00, 0x0c, 0x00).map(_.toByte))
      else box("hvcC", Array(1, 0x01, 0, 0, 0, 0x60, 0, 0, 0, 0, 0, 0x99, 0xF0,
        0x00, 0xFC, 0xFD, 0xF8, 0xF8, 0, 0, 0x0F, 0x03, 0).map(_.toByte))
    val pixi = fullbox("pixi", 0, Array(3, 8, 8, 8).map(_.toByte))
    var pool = Vector(tileIspe, cfg, pixi)
    val tileAssoc = Vector(1, 2 | 0x80, 3)
    // libavif's strict mode requires pixi on the derived (grid) item
    // too, not just the coded tiles
    var gridAssoc = Vector(3)
    if (gridIspe) {
      pool :+= fullbox("ispe", 0, be32(outW) ++ be32(outH)); gridAssoc :+= pool.length
    }
    if (rotationCcw != 0) {
      pool :+= box("irot", Array((rotationCcw / 90).toByte)); gridAssoc :+= pool.length
    }
    val ipco = box("ipco", pool.flatten.toArray)
    def entry(id: Int, assoc: Vector[Int]): Array[Byte] =
      be16(id) ++ Array(assoc.length.toByte) ++ assoc.map(_.toByte).toArray
    val ipma = fullbox("ipma", 0, be32(n + 1) ++
      (entry(1, gridAssoc) ++ (2 to n + 1).toArray.flatMap(entry(_, tileAssoc))))
    val iprp = box("iprp", ipco ++ ipma)
    val iref = fullbox("iref", 0,
      box("dimg", be16(1) ++ be16(n) ++ (2 to n + 1).toArray.flatMap(be16)))
    val gridPayload: Array[Byte] =
      if (wideFields) Array(0.toByte, 1.toByte, (rows - 1).toByte, (cols - 1).toByte) ++
        be32(outW) ++ be32(outH)
      else Array(0.toByte, 0.toByte, (rows - 1).toByte, (cols - 1).toByte) ++
        be16(outW) ++ be16(outH)
    val tileBytes = new Array[Byte](8)
    val idat = if (inIdat) box("idat", gridPayload) else Array.emptyByteArray
    // iloc v1 (carries the construction method): offset/length 4 bytes,
    // no base offset, no extent index
    def iloc(mdatPayloadAt: Int): Array[Byte] = {
      def item(id: Int, method: Int, offset: Int, len: Int): Array[Byte] =
        be16(id) ++ be16(method) ++ be16(0) ++ be16(1) ++ be32(offset) ++ be32(len)
      val gridItem =
        if (inIdat) item(1, 1, 0, gridPayload.length)
        else item(1, 0, mdatPayloadAt, gridPayload.length)
      val gridInMdat = if (inIdat) 0 else gridPayload.length
      val tileItems = (0 until n).toArray.flatMap(i =>
        item(2 + i, 0, mdatPayloadAt + gridInMdat, tileBytes.length))
      fullbox("iloc", 1, Array(0x44.toByte, 0.toByte) ++ be16(n + 1) ++ gridItem ++ tileItems)
    }
    def assemble(off: Int): (Array[Byte], Int) = {
      val meta = fullbox("meta", 0,
        hdlr ++ pitm ++ iloc(off) ++ iinf ++ iprp ++ iref ++ idat)
      val mdatPayload = (if (inIdat) Array.emptyByteArray else gridPayload) ++ tileBytes
      (ftyp ++ meta ++ box("mdat", mdatPayload), ftyp.length + meta.length + 8)
    }
    val (_, off1) = assemble(0)
    val (out, off2) = assemble(off1)
    require(off1 == off2)
    out
  }
}
