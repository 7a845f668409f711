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
    assert(read.columns.toSeq == Seq("path", "rec_index", "target_uri", "http_status", "text"))
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

  test("a single gzip member holding many records parses (the non-Common-Crawl shape)") {
    val stream = Warc.warcinfoRecord(5L) ++ Warc.responseRecord(10L, "s", "a") ++
      Warc.responseRecord(11L, "s", "b")
    val oneMember = GzipCodec.gzipStored(stream)
    val recs = Warc.records(Seq((5L, oneMember)).toDF("file_id", "payload"), "file_id", "payload")
    assert(recs.count() == 3)
    assert(recs.where($"warc_type" === "response").count() == 2)
  }
}
