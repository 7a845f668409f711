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

  final case class Meta(brand: String, codec: String, primaryId: Int,
      itemCount: Int, width: Int, height: Int,
      codedWidth: Int, codedHeight: Int,
      rotationCcw: Int, mirrorAxis: Option[Int], hasAlpha: Boolean)

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
          if (fourcc(j + 4) == "auxl") {
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
            auxlRefs :+= ((fromId, toIds))
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
      val primProps = propsOf(primaryId)
      val ispe = primProps.find(_._1 == "ispe").getOrElse(return None)
      val cw = be32(ispe._2 + 4).toInt
      val chh = be32(ispe._2 + 8).toInt
      if (cw <= 0 || chh <= 0) return None
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
      Some(Meta(brand, primaryType, primaryId, items.length,
        w, h, cw, chh, rot, mirror, hasAlpha))
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
}
