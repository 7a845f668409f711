package graft

import graft.ops.Pdf

/** From-spec PDF text extraction: packer round-trips (raw + Flate),
  * hand-assembled fixtures using constructs the packer never emits
  * (hex strings, octal escapes, TJ arrays, split content, comments,
  * damaged xref → scan fallback), and the hostile-bytes contract.
  */
class PdfSpec extends SparkSuite {

  test("packer round-trips text exactly, raw and FlateDecode") {
    for (flate <- Seq(false, true)) {
      val texts = Seq(
        "hello pdf world",
        "parens (nested (deep)) and \\ backslash",
        "newlines\nand\ttabs preserved",
        "non-ascii café — 中文 🙂",
        "")
      for (t <- texts) {
        val pdf = Pdf.pdfOf(t, flate)
        assert(Pdf.extractText(pdf).contains(t), s"flate=$flate text=$t")
      }
    }
  }

  test("meta reports version, object count, pages, and filter use") {
    val m = Pdf.meta(Pdf.pdfOf("x", flate = true))
    assert(m.contains(("1.4", 5, 1, true)))
    assert(Pdf.meta(Pdf.pdfOf("x", flate = false)).contains(("1.4", 5, 1, false)))
  }

  /** Hand-assembled two-page PDF with TJ arrays, hex strings, octal
    * escapes, a #xx name escape, comments, and split /Contents —
    * all layouts the packer never writes. */
  private val handAssembled: Array[Byte] = {
    val objs = scala.collection.mutable.ArrayBuffer[String]()
    objs += "<< /Type /Catalog /Pages 2 0 R >>"
    objs += "<< /Type /Pages /Kids [3 0 R 6 0 R] /Count 2 >>"
    objs += "<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>"
    val c1 = "BT % a comment\n [(Hel) -120 (lo)] TJ T* (wor\\154d) Tj ET" // \154 = l
    objs += s"<< /Length ${c1.length} >>\nstream\n$c1\nendstream"
    val c2 = " BT <48692121> Tj ET" // hex string "Hi!!"
    objs += s"<< /L#65ngth ${c2.length} >>\nstream\n$c2\nendstream" // #65 = e
    objs += "<< /Type /Page /Parent 2 0 R /Contents 7 0 R >>"
    val c3 = "BT (page two) Tj ET"
    objs += s"<< /Length 8 0 R >>\nstream\n$c3\nendstream" // indirect /Length
    objs += s"${c3.length}"
    val out = new StringBuilder("%PDF-1.7\n")
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    for ((o, i) <- objs.zipWithIndex) {
      offsets += out.length
      out.append(s"${i + 1} 0 obj\n").append(o).append("\nendobj\n")
    }
    val xrefAt = out.length
    out.append(s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n")
    for (off <- offsets) out.append(f"$off%010d 00000 n \n")
    out.append(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toString.getBytes("US-ASCII")
  }

  test("hand-assembled fixture: TJ, hex strings, octal, name escapes, split content, 2 pages") {
    val got = Pdf.extractText(handAssembled)
    // page 1: TJ joins "Hel"+"lo" (kern number ignored), T* newline,
    // octal \154 in "world"; second content part appends "Hi!!";
    // page break joins page two
    // Tj/TJ emit string bytes only — the layout space between the
    // two content parts is positioning, not text
    assert(got.contains("Hello\nworldHi!!\npage two"), got.toString)
    assert(Pdf.meta(handAssembled).contains(("1.7", 8, 2, false)))
  }

  /** classic-layout assembly of numbered objects (1-based). */
  private def assemble(objs: Seq[String]): Array[Byte] = {
    val out = new StringBuilder("%PDF-1.7\n")
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    for ((o, i) <- objs.zipWithIndex) {
      offsets += out.length
      out.append(s"${i + 1} 0 obj\n").append(o).append("\nendobj\n")
    }
    val xrefAt = out.length
    out.append(s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n")
    for (off <- offsets) out.append(f"$off%010d 00000 n \n")
    out.append(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toString.getBytes("ISO-8859-1")
  }

  test("/ToUnicode CMap: subset-font 2-byte codes replay as text (bfchar + both bfrange forms)") {
    // a Type0 subset font whose codes mean nothing without the CMap —
    // the post-2000 corpus shape; /Resources sits on the PAGES node
    // to prove attribute inheritance (§7.7.3.4)
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |2 beginbfchar
        |<0001> <0048>
        |<0002> <0065>
        |endbfchar
        |2 beginbfrange
        |<0010> <0012> <006C>
        |<0020> <0021> [<006F0020> <0077>]
        |endbfrange
        |endcmap
        |end""".stripMargin
    val content = "BT /F1 12 Tf <000100020010001000200021> Tj ET"
    val pdf = assemble(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 /Resources << /Font << /F1 5 0 R >> >> >>",
      "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
      s"<< /Length ${content.length} >>\nstream\n$content\nendstream",
      "<< /Type /Font /Subtype /Type0 /BaseFont /AAAAAA+Subset /ToUnicode 6 0 R >>",
      s"<< /Length ${cmap.length} >>\nstream\n$cmap\nendstream"))
    // 0001→H 0002→e 0010→l 0010→l (range step) 0020→"o " (array, 2
    // UTF-16 units) 0021→w
    assert(Pdf.extractText(pdf).contains("Hello w"), Pdf.extractText(pdf).toString)
  }

  test("/Encoding /Differences: glyph names decode, unknown names keep the byte") {
    // \351 = 0xE9 diffed to eacute; 'A' (65) deliberately remapped to
    // adieresis (Differences OVERRIDE, not just extend); \370 = 0xF8
    // diffed to an unknown glyph -> code byte kept raw, which the
    // final UTF-8 decode surfaces as U+FFFD (the transparent path's
    // long-standing behavior for non-ASCII bytes: visible, not
    // silently dropped)
    val content = "BT /F1 12 Tf (caf\\351 A\\370) Tj ET"
    val pdf = assemble(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> >>",
      s"<< /Length ${content.length} >>\nstream\n$content\nendstream",
      "<< /Type /Font /Subtype /Type1 /BaseFont /Custom " +
        "/Encoding << /Differences [233 /eacute 65 /adieresis 248 /glyph99999] >> >>"))
    val got = Pdf.extractText(pdf).get
    assert(got.contains("café ä"), got)
    assert(got.contains("ä�"), got)
  }

  test("named base encodings: WinAnsi quotes row and uniXXXX glyph names") {
    val content = "BT /F1 12 Tf (\\223hi\\224) Tj /F2 12 Tf (x) Tj ET"
    val pdf = assemble(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /Font << /F1 5 0 R /F2 6 0 R >> >> >>",
      s"<< /Length ${content.length} >>\nstream\n$content\nendstream",
      "<< /Type /Font /Subtype /TrueType /Encoding /WinAnsiEncoding >>",
      "<< /Type /Font /Subtype /Type1 " +
        "/Encoding << /Differences [120 /uni2603] >> >>"))
    val got = Pdf.extractText(pdf).get
    assert(got.contains("“hi”"), got) // cp1252 0x93/0x94
    assert(got.contains("☃"), got)         // algorithmic uniXXXX name
  }

  test("damaged xref falls back to the linear scan and still extracts") {
    val pdf = Pdf.pdfOf("salvaged text", flate = true)
    // wreck the startxref offset digits
    val s = new String(pdf, "ISO-8859-1")
    val at = s.lastIndexOf("startxref")
    val broken = pdf.clone()
    broken(at + 10) = '9'; broken(at + 11) = '9'; broken(at + 12) = '9'
    assert(Pdf.extractText(broken).contains("salvaged text"))
  }

  test("pdf SOURCE reads files from disk, quarantining the unparseable") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pdf").toFile
    def write(name: String, bytes: Array[Byte]): Unit = {
      val out = new java.io.FileOutputStream(new java.io.File(dir, name))
      out.write(bytes); out.close()
    }
    write("a.pdf", Pdf.pdfOf("doc a text", flate = true))
    write("b.pdf", Pdf.pdfOf("doc b text", flate = false))
    write("broken.pdf", "not really a pdf".getBytes)
    val read = graft.sources.SourceReader.read(spark,
      graft.spec.SourceSpec("papers", "pdf", graft.spec.Config.of(
        "path" -> s"${dir.getAbsolutePath}/*.pdf")))
    val rows = read.collect().map(r =>
      (r.getString(0).split('/').last, r.getBoolean(1), r.getString(6))).toSeq
    assert(rows.collect { case (n, true, t) => n -> t }.toMap ==
      Map("a.pdf" -> "doc a text", "b.pdf" -> "doc b text"))
    assert(rows.count(!_._2) == 1)
    dir.listFiles.foreach(_.delete()); dir.delete()
  }

  // ------------------------------------------------------------------
  // PDF 1.5: cross-reference streams + object streams
  // ------------------------------------------------------------------

  test("1.5 packer round-trips text exactly, Flate and raw content") {
    for (flate <- Seq(false, true)) {
      val texts = Seq(
        "hello modern pdf",
        "parens (nested (deep)) and \\ backslash",
        "non-ascii café — 中文 🙂",
        "")
      for (t <- texts) {
        val pdf = Pdf.pdfOf15(t, flate)
        assert(Pdf.extractText(pdf).contains(t), s"flate=$flate text=$t")
      }
    }
    // 7 objects (4 packed + content + ObjStm + xref stream), always
    // some Flate stream (the ObjStm/xref are compressed as in the wild)
    assert(Pdf.meta(Pdf.pdfOf15("x", flate = false)).contains(("1.5", 7, 1, true)))
    assert(Pdf.meta(Pdf.pdfOf15("x", flate = true)).contains(("1.5", 7, 1, true)))
  }

  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Hand-assembled 1.5 fixture using constructs the packer never
    * writes: UNFILTERED xref stream and ObjStm, W [1 2 1], /Index
    * with three subsections and a free entry, page tree split across
    * the ObjStm. */
  private val handAssembled15: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(ascii("%PDF-1.5\n"))
    val c = "BT (fifteen) Tj ET"
    val off4 = out.size()
    out.write(ascii(s"4 0 obj\n<< /Length ${c.length} >>\nstream\n$c\nendstream\nendobj\n"))
    val packed = Vector(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    val bodies = packed.map(_._2 + " ")
    val offs = bodies.scanLeft(0)(_ + _.length)
    val hdr = packed.zip(offs).map { case ((n, _), o) => s"$n $o" }.mkString("", "  ", " \n")
    val stmPlain = hdr + bodies.mkString
    val off5 = out.size()
    out.write(ascii(s"5 0 obj\n<< /Type /ObjStm /N 3 /First ${hdr.length} " +
      s"/Length ${stmPlain.length} >>\nstream\n$stmPlain\nendstream\nendobj\n"))
    val off6 = out.size()
    // entries in /Index order: [0 1] → obj 0 free; [1 3] → 1,2,3 in
    // ObjStm 5; [4 3] → 4,5,6 top-level. W [1 2 1], raw bytes.
    val entries = Seq(
      Seq(0, 0, 255), Seq(2, 5, 0), Seq(2, 5, 1), Seq(2, 5, 2),
      Seq(1, off4, 0), Seq(1, off5, 0), Seq(1, off6, 0))
    val data = entries.flatMap { case Seq(t, f2, f3) =>
      Seq(t.toByte, ((f2 >> 8) & 0xFF).toByte, (f2 & 0xFF).toByte, f3.toByte)
    }.toArray
    out.write(ascii(s"6 0 obj\n<< /Type /XRef /Size 7 /W [1 2 1] /Index [0 1 1 3 4 3] " +
      s"/Root 1 0 R /Length ${data.length} >>\nstream\n"))
    out.write(data)
    out.write(ascii(s"\nendstream\nendobj\nstartxref\n$off6\n%%EOF\n"))
    out.toByteArray
  }

  test("hand-assembled 1.5: unfiltered xref stream, W [1 2 1], /Index subsections, raw ObjStm") {
    assert(Pdf.extractText(handAssembled15).contains("fifteen"))
    assert(Pdf.meta(handAssembled15).contains(("1.5", 6, 1, false)))
  }

  /** TIFF horizontal predictor (/Predictor 2) on a Flate'd xref
    * stream — the other predictor family. */
  private val tiffPredictor15: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(ascii("%PDF-1.5\n"))
    val c = "BT (tiff rows) Tj ET"
    val offsets = scala.collection.mutable.Map[Int, Int]()
    def obj(n: Int, body: String): Unit = {
      offsets(n) = out.size()
      out.write(ascii(s"$n 0 obj\n$body\nendobj\n"))
    }
    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    obj(4, s"<< /Length ${c.length} >>\nstream\n$c\nendstream")
    val off5 = out.size()
    // W [1 2 1], rows for objects 0..5; TIFF predictor: byte[i] -=
    // byte[i - bpp] per row with bpp = colors = 1
    val raw = (Seq(Seq(0, 0, 255)) ++ (1 to 4).map(n => Seq(1, offsets(n), 0)) ++
      Seq(Seq(1, off5, 0))).map { case Seq(t, f2, f3) =>
      Array(t.toByte, ((f2 >> 8) & 0xFF).toByte, (f2 & 0xFF).toByte, f3.toByte)
    }
    val diffed = raw.flatMap { r =>
      r.indices.map(i => if (i == 0) r(0) else ((r(i) & 0xFF) - (r(i - 1) & 0xFF)).toByte)
    }.toArray
    val z = {
      val d = new java.util.zip.Deflater(6, false)
      d.setInput(diffed); d.finish()
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](512)
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      d.end(); bos.toByteArray
    }
    out.write(ascii(s"5 0 obj\n<< /Type /XRef /Size 6 /W [1 2 1] /Root 1 0 R " +
      s"/Filter /FlateDecode /DP << /Predictor 2 /Columns 4 >> /Length ${z.length} >>\nstream\n"))
    out.write(z)
    out.write(ascii(s"\nendstream\nendobj\nstartxref\n$off5\n%%EOF\n"))
    out.toByteArray
  }

  test("hand-assembled 1.5: TIFF /Predictor 2 via the /DP alias") {
    assert(Pdf.extractText(tiffPredictor15).contains("tiff rows"))
  }

  test("incremental update: /Prev chain of xref streams, newest section wins") {
    val orig = Pdf.pdfOf15("old body text", flate = true)
    val s = new String(orig, "ISO-8859-1")
    val sxAt = s.lastIndexOf("startxref")
    val origXref = s.substring(sxAt + 9).trim.takeWhile(_.isDigit).toInt
    val out = new java.io.ByteArrayOutputStream()
    out.write(orig)
    val c = "BT (updated body) Tj ET"
    val off4 = out.size()
    out.write(ascii(s"4 0 obj\n<< /Length ${c.length} >>\nstream\n$c\nendstream\nendobj\n"))
    val off8 = out.size()
    // unfiltered update xref stream: W [1 4 2], /Index [4 1 8 1]
    val rows = Seq(Seq(1, off4, 0), Seq(1, off8, 0))
    val data = rows.flatMap { case Seq(t, f2, f3) =>
      Seq(t.toByte, ((f2 >> 24) & 0xFF).toByte, ((f2 >> 16) & 0xFF).toByte,
        ((f2 >> 8) & 0xFF).toByte, (f2 & 0xFF).toByte,
        ((f3 >> 8) & 0xFF).toByte, (f3 & 0xFF).toByte)
    }.toArray
    out.write(ascii(s"8 0 obj\n<< /Type /XRef /Size 9 /W [1 4 2] /Index [4 1 8 1] " +
      s"/Root 1 0 R /Prev $origXref /Length ${data.length} >>\nstream\n"))
    out.write(data)
    out.write(ascii(s"\nendstream\nendobj\nstartxref\n$off8\n%%EOF\n"))
    val updated = out.toByteArray
    val got = Pdf.extractText(updated)
    assert(got.contains("updated body"), got.toString)
    assert(!got.exists(_.contains("old body")), got.toString)
    // 8 objects: 1,2,3,5 (ObjStm), 4 (new content), 6, 7, 8
    assert(Pdf.meta(updated).map(_._2).contains(8))
  }

  test("hybrid file: classic table marks ObjStm objects free, /XRefStm bridges them") {
    val out = new java.io.ByteArrayOutputStream()
    out.write(ascii("%PDF-1.5\n"))
    val c = "BT (hybrid) Tj ET"
    val off4 = out.size()
    out.write(ascii(s"4 0 obj\n<< /Length ${c.length} >>\nstream\n$c\nendstream\nendobj\n"))
    val packed = Vector(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    val bodies = packed.map(_._2 + " ")
    val offs = bodies.scanLeft(0)(_ + _.length)
    val hdr = packed.zip(offs).map { case ((n, _), o) => s"$n $o" }.mkString("", " ", "\n")
    val stmPlain = hdr + bodies.mkString
    val off5 = out.size()
    out.write(ascii(s"5 0 obj\n<< /Type /ObjStm /N 3 /First ${hdr.length} " +
      s"/Length ${stmPlain.length} >>\nstream\n$stmPlain\nendstream\nendobj\n"))
    val off6 = out.size()
    // the bridge xref stream covers ONLY the packed objects
    val data = Seq(Seq(2, 5, 0), Seq(2, 5, 1), Seq(2, 5, 2)).flatMap {
      case Seq(t, f2, f3) =>
        Seq(t.toByte, ((f2 >> 8) & 0xFF).toByte, (f2 & 0xFF).toByte, f3.toByte)
    }.toArray
    out.write(ascii(s"6 0 obj\n<< /Type /XRef /Size 7 /W [1 2 1] /Index [1 3] " +
      s"/Root 1 0 R /Length ${data.length} >>\nstream\n"))
    out.write(data)
    out.write(ascii("\nendstream\nendobj\n"))
    val tableAt = out.size()
    // classic table: 0 and the packed 1..3 free, 4..6 in use
    out.write(ascii("xref\n0 7\n"))
    out.write(ascii("0000000000 65535 f \n0000000000 00000 f \n0000000000 00000 f \n0000000000 00000 f \n"))
    for (o <- Seq(off4, off5, off6)) out.write(ascii(f"$o%010d 00000 n \n"))
    out.write(ascii(s"trailer\n<< /Size 7 /Root 1 0 R /XRefStm $off6 >>\nstartxref\n$tableAt\n%%EOF\n"))
    val pdf = out.toByteArray
    assert(Pdf.extractText(pdf).contains("hybrid"))
    assert(Pdf.meta(pdf).contains(("1.5", 6, 1, false)))
  }

  test("damaged xref on a 1.5 file: scan fallback expands the ObjStm and still extracts") {
    val pdf = Pdf.pdfOf15("salvage me from the objstm", flate = true)
    val s = new String(pdf, "ISO-8859-1")
    val at = s.lastIndexOf("startxref")
    val broken = pdf.clone()
    broken(at + 10) = '9'; broken(at + 11) = '9'; broken(at + 12) = '9'
    assert(Pdf.extractText(broken).contains("salvage me from the objstm"))
  }

  test("1.5 hostile bytes refuse, never throw") {
    val pdf = Pdf.pdfOf15("x", flate = true)
    for (cut <- Seq(5, 40, pdf.length / 2, pdf.length - 3))
      Pdf.extractText(pdf.take(cut)) // must not throw
    // corrupt the xref stream's zlib payload: xref walk refuses →
    // scan fallback still salvages via the ObjStm
    val s = new String(pdf, "ISO-8859-1")
    val xAt = s.indexOf("/Type /XRef")
    val sAt = s.indexOf("stream\n", xAt) + 8
    val bad = pdf.clone(); bad(sAt) = (bad(sAt) ^ 0x55).toByte
    Pdf.extractText(bad) // must not throw; salvage allowed either way
    val rnd = new scala.util.Random(15)
    for (_ <- 0 until 100) {
      val junk = pdf.clone()
      val i = rnd.nextInt(junk.length)
      junk(i) = (junk(i) ^ (1 + rnd.nextInt(255))).toByte
      Pdf.extractText(junk) // must not throw
    }
  }

  test("hostile bytes refuse, never throw") {
    assert(Pdf.extractText("not a pdf".getBytes).isEmpty)
    assert(Pdf.extractText(Array.emptyByteArray).isEmpty)
    val pdf = Pdf.pdfOf("x", flate = true)
    for (cut <- Seq(5, 50, pdf.length / 2))
      Pdf.extractText(pdf.take(cut)) // must not throw
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 200) {
      val junk = Array.fill[Byte](rnd.nextInt(600))(rnd.nextInt().toByte)
      Pdf.extractText(junk)
    }
    // corrupt the zlib stream: Adler mismatch → page refused → None
    val z = Pdf.pdfOf("y", flate = true)
    val si = new String(z, "ISO-8859-1").indexOf("stream\n") + 10
    val bad = z.clone(); bad(si) = (bad(si) ^ 0x55).toByte
    assert(Pdf.extractText(bad).isEmpty || !Pdf.extractText(bad).contains("y"))
  }
}
