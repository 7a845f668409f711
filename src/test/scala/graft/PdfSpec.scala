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
