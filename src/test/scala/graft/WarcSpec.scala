package graft

import graft.ops.{GzipCodec, Warc}
import org.apache.spark.sql.functions._

/** WARC framing (ISO 28500): the writer's member-per-record warc.gz
  * layout round-trips through the parser record-exact; version and
  * header-case tolerance, uncompressed input, multi-record member
  * shapes, and the malformed-file quarantine contract.
  */
class WarcSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Seq(
    (0L, "web", "alpha beta"),
    (1L, "web", "gamma <delta> &amp; epsilon"),
    (2L, "books", ""),
    (33L, "web", "same bucket as doc 1")
  ).toDF("doc_id", "source", "text")

  test("pack → records round-trips ids, uris, statuses, and body lengths") {
    val recs = Warc.records(
      Warc.packDocsWarcGz(docs, "doc_id", "source", "text"), "file_id", "payload")
    val rows = recs.collect().map(r => (r.getLong(0), r.getString(2), r.getString(4))).toSet
    // 4 responses + 3 distinct buckets (0, 1, 2; 33 % 32 = 1) of warcinfo
    assert(recs.count() == 7)
    assert(rows.count(_._2 == "warcinfo") == 3)
    assert(rows.contains((1L, "response", "https://example.com/doc/33")))
    // every response's Content-Length equals its body's real length
    val resp = recs.where($"warc_type" === "response")
      .select($"content_length", octet_length($"body").cast("long")).collect()
    assert(resp.forall(r => r.getLong(0) == r.getLong(1)))
    assert(recs.where($"rec_index" === -1).count() == 0)
  }

  test("responseText strips HTTP headers down to the exact planted page") {
    val txt = Warc.responseText(Warc.records(
      Warc.packDocsWarcGz(docs, "doc_id", "source", "text"), "file_id", "payload"))
    val byId = txt.collect().map(r => (r.getString(2), r.getString(4))).toMap
    assert(byId("https://example.com/doc/1") ==
      Warc.pageFor(1L, "web", "gamma <delta> &amp; epsilon"))
    assert(byId.size == 4)
    assert(txt.select("http_status").distinct().collect().map(_.getInt(0)).toSeq == Seq(200))
  }

  test("uncompressed WARC bytes parse identically to warc.gz") {
    val raw = Warc.warcinfoRecord(7L) ++ Warc.responseRecord(9L, "s", "body text")
    val df = Seq((7L, raw)).toDF("file_id", "payload")
    val recs = Warc.records(df, "file_id", "payload").orderBy("rec_index").collect()
    assert(recs.length == 2)
    assert(recs(0).getString(2) == "warcinfo" && recs(1).getString(2) == "response")
    assert(recs(1).getString(4) == "https://example.com/doc/9")
  }

  test("WARC/1.0 version line and case-insensitive headers are accepted") {
    val body = "x".getBytes("UTF-8")
    val rec = ("WARC/1.0\r\nwarc-type: metadata\r\nCONTENT-LENGTH: 1\r\n\r\n").getBytes("UTF-8") ++
      body ++ "\r\n\r\n".getBytes("UTF-8")
    val recs = Warc.records(Seq((1L, rec)).toDF("file_id", "payload"), "file_id", "payload").collect()
    assert(recs.length == 1 && recs(0).getString(2) == "metadata" && recs(0).getLong(7) == 1L)
  }

  test("malformed files quarantine as one rec_index = -1 row, never throw") {
    val truncated = Warc.responseRecord(1L, "s", "t").dropRight(3) // missing separator
    val badVersion = "HTTP/1.1 200\r\nA: b\r\n\r\n".getBytes("UTF-8")
    val badLength = "WARC/1.1\r\nWARC-Type: x\r\nContent-Length: 999\r\n\r\nshort\r\n\r\n".getBytes("UTF-8")
    val corruptGz = { // flip a CRC-32 trailer byte (bytes -8..-5)
      val z = GzipCodec.gzipStored(Warc.warcinfoRecord(0L))
      z(z.length - 6) = (z(z.length - 6) ^ 0xFF).toByte; z
    }
    val df = Seq((1L, truncated), (2L, badVersion), (3L, badLength), (4L, corruptGz))
      .toDF("file_id", "payload")
    val recs = Warc.records(df, "file_id", "payload")
    assert(recs.count() == 4)
    assert(recs.where($"rec_index" === -1).count() == 4)
  }

  test("warc SOURCE reads .warc.gz files from disk into the text surface") {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc").toFile
    val packed = Warc.packDocsWarcGz(docs, "doc_id", "source", "text", nFiles = 2).collect()
    packed.foreach { r =>
      val out = new java.io.FileOutputStream(new java.io.File(dir, s"part-${r.getLong(0)}.warc.gz"))
      out.write(r.getAs[Array[Byte]](1)); out.close()
    }
    val read = graft.sources.SourceReader.read(spark,
      graft.spec.SourceSpec("crawl", "warc", graft.spec.Config.of(
        "path" -> s"${dir.getAbsolutePath}/*.warc.gz")))
    assert(read.columns.toSeq ==
      Seq("path", "rec_index", "target_uri", "http_status", "text", "charset", "charset_src",
        "content_encoding", "payload_decoded"))
    assert(read.count() == 4)
    assert(read.where($"target_uri" === "https://example.com/doc/2")
      .select("text").as[String].head() == Warc.pageFor(2L, "books", ""))
    // records mode surfaces warcinfo rows too
    val recs = graft.sources.SourceReader.read(spark,
      graft.spec.SourceSpec("crawl", "warc", graft.spec.Config.of(
        "path" -> s"${dir.getAbsolutePath}/*.warc.gz", "records" -> true)))
    assert(recs.count() == 6) // 4 responses + 2 warcinfo
    dir.listFiles.foreach(_.delete()); dir.delete()
  }

  test("member-split scan: streamed index lands exactly on member boundaries; ranged reads reproduce the whole-file parse") {
    val many = (0L until 40L).map(i => (i, "web", s"document number $i " * 10))
      .toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-warcsplit").toFile
    Warc.packDocsWarcGz(many, "doc_id", "source", "text", nFiles = 2).collect().foreach { r =>
      val out = new java.io.FileOutputStream(new java.io.File(dir, s"part-${r.getLong(0)}.warc.gz"))
      out.write(r.getAs[Array[Byte]](1)); out.close()
    }
    val bytes = java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "part-0.warc.gz").toPath)
    // target 1 byte → every member its own range; contiguous cover
    val ranges = Warc.gzipMemberRanges(
      new java.io.ByteArrayInputStream(bytes), targetBytes = 1L).get
    assert(ranges.length == 21) // warcinfo + 20 docs, member per record
    assert(ranges.head._1 == 0L)
    assert(ranges.map(r => r._1 + r._2).last == bytes.length.toLong)
    assert(ranges.sliding(2).forall {
      case Seq((s1, l1), (s2, _)) => s1 + l1 == s2
      case _ => true
    })
    // boundaries are exact: every range decodes from-spec on its own
    ranges.foreach { case (off, len) =>
      assert(GzipCodec.gunzipMembers(
        java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt)).nonEmpty)
    }
    // coalescing: unbounded target → one range spanning the file
    assert(Warc.gzipMemberRanges(
      new java.io.ByteArrayInputStream(bytes), Long.MaxValue).get ==
      Vector((0L, bytes.length.toLong)))
    // distributed split scan == whole-file scan, record for record
    val paths = spark.read.format("binaryFile")
      .load(s"${dir.getAbsolutePath}/*.warc.gz").select("path")
    val split = Warc.splitRecords(paths, "path", targetBytes = 2048)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select($"warc_type", $"target_uri", $"record_id", md5($"body").as("d"))
      .collect().map(_.toSeq).toSet
    val whole = Warc.recordsByPath(
      spark.read.format("binaryFile").load(s"${dir.getAbsolutePath}/*.warc.gz")
        .select("path", "content"), "path", "content")
    assert(key(split) == key(whole))
    assert(split.where($"rec_index" === -1).count() == 0)
    // the small target really produced multiple ranges per file
    assert(split.select("path", "offset").distinct().count() > 2)
    // SOURCE split mode: text surface row-equal to the whole-file source
    val readSplit = graft.sources.SourceReader.read(spark,
      graft.spec.SourceSpec("crawl", "warc", graft.spec.Config.of(
        "path" -> s"${dir.getAbsolutePath}/*.warc.gz",
        "split" -> true, "split_target_bytes" -> 2048)))
    assert(readSplit.columns.toSeq ==
      Seq("path", "rec_index", "target_uri", "http_status", "text", "charset", "charset_src",
        "content_encoding", "payload_decoded"))
    val gotTexts = readSplit.select($"target_uri", $"text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val wantTexts = (0L until 40L)
      .map(i => (s"https://example.com/doc/$i",
        Warc.pageFor(i, "web", s"document number $i " * 10))).toSet
    assert(gotTexts == wantTexts)
    // a malformed file quarantines at the INDEX pass (offset = -1)
    val bad = new java.io.File(dir, "bad.warc.gz")
    val bout = new java.io.FileOutputStream(bad)
    bout.write(Array[Byte](0x1F, 0x8B.toByte, 8, 0, 1, 2, 3)); bout.close()
    val withBad = Warc.splitRecords(
      spark.read.format("binaryFile").load(s"${dir.getAbsolutePath}/*.warc.gz")
        .select("path"), "path", 2048)
    val q = withBad.where($"rec_index" === -1).collect()
    assert(q.length == 1 && q(0).getString(0).endsWith("bad.warc.gz") && q(0).getLong(1) == -1L)
    assert(withBad.where($"rec_index" =!= -1).count() == whole.count())
    dir.listFiles.foreach(_.delete()); dir.delete()
  }

  // ------------------------------------------------------------------
  // charset ladder
  // ------------------------------------------------------------------

  private def responseWith(body: Array[Byte], contentType: String): Array[Byte] = {
    val http = Warc.httpWith(body, contentType)
    ("WARC/1.1\r\nWARC-Type: response\r\nContent-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("UTF-8") ++ http ++
      "\r\n\r\n".getBytes("UTF-8")
  }

  private def decodeOne(body: Array[Byte], contentType: String): (String, String, String) = {
    val rec = responseWith(body, contentType)
    val row = Warc.responseText(Warc.records(
      Seq((1L, rec)).toDF("file_id", "payload"), "file_id", "payload")).collect()(0)
    (row.getString(4), row.getString(5), row.getString(6))
  }

  test("charset rung 1: Content-Type header charset wins, labels alias per WHATWG") {
    val s = "déjà vu café"
    assert(decodeOne(s.getBytes("UTF-8"), "text/html; charset=utf-8") ==
      ((s, "UTF-8", "header")))
    assert(decodeOne(s.getBytes("windows-1252"), "text/html; charset=Windows-1252") ==
      ((s, "windows-1252", "header")))
    // iso-8859-1 label means cp1252 in practice (WHATWG alias): a
    // 0x80 byte decodes to €, not a C1 control
    assert(decodeOne(Array(0x80.toByte), "text/plain; charset=ISO-8859-1") ==
      (("€", "windows-1252", "header")))
    // quoted parameter + trailing parameter forms
    assert(decodeOne(s.getBytes("UTF-8"), "text/html; charset=\"utf-8\"; boundary=x") ==
      ((s, "UTF-8", "header")))
  }

  test("charset rung 2: HTML meta sniff when the header is silent; both meta forms") {
    val a = "<html><head><meta charset='windows-1252'></head><body>café</body></html>"
    assert(decodeOne(a.getBytes("windows-1252"), "text/html") ==
      ((a, "windows-1252", "meta")))
    val b = "<html><head><meta http-equiv=\"Content-Type\" content=\"text/html; charset=iso-8859-1\"></head><body>naïve</body></html>"
    assert(decodeOne(b.getBytes("ISO-8859-1"), "text/html") ==
      ((b, "windows-1252", "meta")))
    // meta outside the 1024-byte prescan window is NOT honored: the
    // valid-utf8 rung picks it up instead
    val far = "<html><head>" + (" " * 1100) +
      "<meta charset='windows-1252'></head><body>plain ascii</body></html>"
    assert(decodeOne(far.getBytes("UTF-8"), "text/html")._3 == "valid-utf8")
  }

  test("charset rungs 3/4: strict UTF-8 validation, else cp1252 fallback") {
    val utf = "valid π☃ utf-8"
    assert(decodeOne(utf.getBytes("UTF-8"), "text/html") == ((utf, "UTF-8", "valid-utf8")))
    val legacy = "bare é and ½"
    assert(decodeOne(legacy.getBytes("windows-1252"), "text/html") ==
      ((legacy, "windows-1252", "fallback")))
    // unknown declared label falls through the ladder, not to an error
    assert(decodeOne(utf.getBytes("UTF-8"), "text/html; charset=shift_jis")._3 == "valid-utf8")
  }

  test("strictUtf8 rejects overlongs, surrogates, out-of-range, truncated tails") {
    def ok(bs: Int*) = Warc.strictUtf8(bs.map(_.toByte).toArray, 0, bs.length)
    assert(ok('a', 'b'))
    assert(ok(0xC3, 0xA9))                 // é
    assert(ok(0xF0, 0x9F, 0x99, 0x82))     // 🙂
    assert(!ok(0xC0, 0xAF))                // overlong '/'
    assert(!ok(0xE0, 0x80, 0x80))          // overlong NUL
    assert(!ok(0xED, 0xA0, 0x80))          // surrogate D800
    assert(!ok(0xF4, 0x90, 0x80, 0x80))    // > U+10FFFF
    assert(!ok(0xC3))                      // truncated tail
    assert(!ok(0xE9))                      // stray lead (the cp1252 é)
    assert(!ok(0x80))                      // stray continuation
    assert(!ok(0xF5, 0x80, 0x80, 0x80))    // lead out of range
  }

  test("packDocsWarcCharsets: all five rungs replay exactly through the ladder") {
    val five = Seq(
      (0L, "web", "plain and café"), (1L, "web", "text キ with non-ascii"),
      (2L, "web", "latin one"), (3L, "web", "valid utf8"), (4L, "web", "fallback row"))
      .toDF("doc_id", "source", "text")
    val txt = Warc.responseText(Warc.records(
      Warc.packDocsWarcCharsets(five, "doc_id", "source", "text"), "file_id", "payload"))
      .select(regexp_extract($"target_uri", "doc/(\\d+)$", 1).cast("long").as("doc_id"),
        $"charset", $"charset_src", $"text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    assert(txt(0L)._1 == "UTF-8" && txt(0L)._2 == "header")
    assert(txt(0L)._3 == Warc.pageFor(0L, "web", "plain and café"))
    assert(txt(1L) == (("windows-1252", "header",
      Warc.charsetPage(1L, 1, "text  with non-ascii"))))
    assert(txt(2L) == (("windows-1252", "meta", Warc.charsetPage(2L, 2, "latin one"))))
    assert(txt(3L) == (("UTF-8", "valid-utf8", Warc.charsetPage(3L, 3, "valid utf8"))))
    assert(txt(4L) == (("windows-1252", "fallback", Warc.charsetPage(4L, 4, "fallback row"))))
  }

  test("a single gzip member holding many records parses (the non-Common-Crawl shape)") {
    val stream = Warc.warcinfoRecord(5L) ++ Warc.responseRecord(10L, "s", "a") ++
      Warc.responseRecord(11L, "s", "b")
    val oneMember = GzipCodec.gzipStored(stream)
    val recs = Warc.records(Seq((5L, oneMember)).toDF("file_id", "payload"), "file_id", "payload")
    assert(recs.count() == 3)
    assert(recs.where($"warc_type" === "response").count() == 2)
  }

  // ---- HTTP payload ladder: chunked transfer + content encodings ----

  private def ascii(s: String) = s.getBytes("US-ASCII")

  test("dechunk: RFC 9112 framing, extensions, trailers, refusals") {
    val body = ascii("5\r\nhello\r\n6;ext=\"x\"\r\n world\r\n0\r\nX-T: ok\r\n\r\n")
    assert(Warc.dechunk(body, 0).map(new String(_, "US-ASCII")).contains("hello world"))
    // terminator without trailers, and without the final blank line (lenient)
    assert(Warc.dechunk(ascii("3\r\nabc\r\n0\r\n\r\n"), 0)
      .map(new String(_, "US-ASCII")).contains("abc"))
    assert(Warc.dechunk(ascii("3\r\nabc\r\n0\r\n"), 0)
      .map(new String(_, "US-ASCII")).contains("abc"))
    // hex sizes incl. uppercase
    assert(Warc.dechunk(ascii("A\r\n0123456789\r\n0\r\n\r\n"), 0)
      .map(new String(_, "US-ASCII")).contains("0123456789"))
    assert(Warc.dechunk(ascii("3\r\nabcd\r\n0\r\n\r\n"), 0).isEmpty) // size lies
    assert(Warc.dechunk(ascii("zz\r\nab\r\n0\r\n\r\n"), 0).isEmpty)  // non-hex
    assert(Warc.dechunk(ascii("5\r\nhel"), 0).isEmpty)               // truncated
    assert(Warc.dechunk(ascii("ffffffff1\r\nx\r\n0\r\n\r\n"), 0).isEmpty) // crafted size
  }

  test("contentDecode: gzip, zlib AND raw deflate (the server bug), zstd, refusals") {
    val data = ascii("payload bytes for the ladder ")
    def jdk(raw: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(6, raw)
      d.setInput(data); d.finish()
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      d.end(); bos.toByteArray
    }
    val gz = { val b = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(b); g.write(data); g.close(); b.toByteArray }
    assert(Warc.contentDecode("gzip", gz).map(_.toSeq).contains(data.toSeq))
    assert(Warc.contentDecode("X-GZIP", gz).map(_.toSeq).contains(data.toSeq))
    assert(Warc.contentDecode("deflate", jdk(raw = false)).map(_.toSeq).contains(data.toSeq))
    assert(Warc.contentDecode("deflate", jdk(raw = true)).map(_.toSeq).contains(data.toSeq))
    assert(Warc.contentDecode("identity", data).map(_.toSeq).contains(data.toSeq))
    // br: real streams decode (round 13), junk refuses
    assert(Warc.contentDecode("br", graft.ops.Brotli.encodeFlat(data)).map(_.toSeq).contains(data.toSeq))
    assert(Warc.contentDecode("br", graft.ops.Brotli.encodeRaw(data)).map(_.toSeq).contains(data.toSeq))
    assert(Warc.contentDecode("br", data).isEmpty) // not a brotli stream
    assert(Warc.contentDecode("gzip", data).isEmpty) // not a gzip stream
  }

  test("packWet: conversion records, Refers-To provenance, order, skip-undecodable") {
    // mix decodable and undecodable responses: ids 0..17 cycle the
    // six wire variants; the br class (id%6==5) itself cycles real
    // compressed (5), real uncompressed-framing (11), junk (17) —
    // only the junk one must be ABSENT from the WET
    val many = Seq.tabulate(18)(i => (i.toLong, "src", s"wet body $i"))
      .toDF("doc_id", "source", "text")
    val warc = Warc.packDocsWarcGzHttpEncoded(many, "doc_id", "source", "text", nFiles = 2)
    val wet = Warc.packWet(Warc.records(warc, "file_id", "payload")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(wet.keySet == Set(0L, 1L))
    val recs = Warc.records(wet.toSeq.toDF("file_id", "payload"), "file_id", "payload")
    assert(recs.where($"warc_type" === "warcinfo").count() == 2)
    val conv = recs.where($"warc_type" === "conversion")
      .select($"file_id", $"rec_index", $"target_uri", $"content_type", $"body")
      .collect()
    // 18 responses minus the one corrupt br (17); real br decode now
    assert(conv.length == 17)
    assert(conv.exists(_.getString(2).endsWith("/5")))
    assert(conv.exists(_.getString(2).endsWith("/11")))
    assert(!conv.exists(_.getString(2).endsWith("/17")))
    assert(conv.forall(_.getString(3) == "text/plain"))
    // body = extracted text of the page (title+p+div collapse per htmlExtract)
    val c0 = conv.find(_.getString(2).endsWith("/0")).get
    val want = many.where($"doc_id" === 0L)
      .select(graft.ops.TextAnalysis.htmlExtract(
        lit(Warc.pageFor(0L, "src", "wet body 0"))))
      .as[String].head()
    assert(new String(c0.getAs[Array[Byte]](4), "UTF-8") == want)
    // Refers-To links back to the SOURCE record id (parse raw header)
    val rawStream = GzipCodec.gunzip(wet(0L)).get
    val head = new String(rawStream, "ISO-8859-1")
    val refers = "WARC-Refers-To: <([^>]+)>".r.findAllMatchIn(head).map(_.group(1)).toSeq
    assert(refers.nonEmpty)
    assert(refers.forall(_.startsWith("urn:uuid:")))
    assert(refers.contains("urn:uuid:" + Warc.uuidFor("doc-0")))
    // conversion records keep source record order within the file
    val order = conv.filter(_.getLong(0) == 0L).sortBy(_.getInt(1)).map(_.getString(2)).toSeq
    assert(order == order.sortBy(_.split("/").last.toLong))
  }

  test("responseText payload ladder end-to-end: all six wire variants") {
    val docs = Seq.tabulate(18)(i => (i.toLong, "src", s"body text $i"))
      .toDF("doc_id", "source", "text")
    val packed = Warc.packDocsWarcGzHttpEncoded(docs, "doc_id", "source", "text", nFiles = 2)
    val out = Warc.responseText(Warc.records(packed, "file_id", "payload"))
      .select($"target_uri", $"text", $"content_encoding", $"payload_decoded")
      .collect().map(r => (r.getString(0).split("/").last.toLong,
        (r.getString(1), Option(r.getString(2)), r.getBoolean(3)))).toMap
    (0L until 18L).foreach { id =>
      val page = Warc.pageFor(id, "src", s"body text $id")
      val (text, enc, ok) = out(id)
      (id % 6) match {
        case 5 if (id / 6) % 3 == 2 => // junk under the br label: refuse
          assert(text == "" && enc.contains("br") && !ok, s"id=$id")
        case 5 => // real brotli (compressed at 5, raw framing at 11)
          assert(text == page && enc.contains("br") && ok, s"id=$id")
        case 4 => assert(text == page && enc.contains("deflate") && ok, s"id=$id")
        case 2 | 3 => assert(text == page && enc.contains("gzip") && ok, s"id=$id")
        case _ => assert(text == page && enc.isEmpty && ok, s"id=$id")
      }
    }
  }
}
