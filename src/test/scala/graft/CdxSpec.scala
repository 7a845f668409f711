package graft

import graft.ops.{Cdx, GzipCodec, Warc}
import org.apache.spark.sql.functions._

/** CDX index generation: SURT key canonicalization, timestamps, and
  * the e2e contract that every indexed (offset, length) extent is a
  * self-contained, decodable member holding exactly its record —
  * the wayback ranged-read property. */
class CdxSpec extends SparkSuite {
  import spark.implicits._

  test("surt key: host reversal, www/port/fragment handling, query sort, lowercasing") {
    assert(Cdx.surtKey("https://example.com/doc/5") == "com,example)/doc/5")
    assert(Cdx.surtKey("http://WWW.Example.COM/A/B") == "com,example)/a/b")
    assert(Cdx.surtKey("https://sub.host.org:443/x") == "org,host,sub)/x")
    assert(Cdx.surtKey("http://host.org:80/x") == "org,host)/x")
    assert(Cdx.surtKey("http://host.org:8080/x") == "org,host:8080)/x")
    assert(Cdx.surtKey("https://a.b/p?z=1&a=2&m=3") == "b,a)/p?a=2&m=3&z=1")
    assert(Cdx.surtKey("https://a.b/p?z=1#frag") == "b,a)/p?z=1")
    assert(Cdx.surtKey("https://a.b") == "b,a)/")
    assert(Cdx.surtKey("https://a.b#only-frag") == "b,a)/")
    assert(Cdx.surtKey("not a url") == null)
    assert(Cdx.surtKey(null) == null)
    assert(Cdx.timestampOf("2026-01-01T00:00:00Z") == "20260101000000")
    assert(Cdx.timestampOf(null) == null)
  }

  test("index: every response indexed at a self-contained member extent; warcinfo excluded; quarantine") {
    val docs = (0L until 30L).map(i => (i, "web", s"payload for document $i"))
      .toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-cdx").toFile
    Warc.packDocsWarcGz(docs, "doc_id", "source", "text", nFiles = 3).collect().foreach { r =>
      val out = new java.io.FileOutputStream(new java.io.File(dir, s"part-${r.getLong(0)}.warc.gz"))
      out.write(r.getAs[Array[Byte]](1)); out.close()
    }
    val paths = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.gz").load(dir.getAbsolutePath).select("path")
    val idx = Cdx.index(paths, "path").collect()
    assert(idx.length == 30) // responses only — 3 warcinfo records excluded
    assert(idx.forall(_.getInt(4) == 200))
    assert(idx.forall(_.getString(3) == "text/html"))
    assert(idx.forall(_.getString(1) == "20260101000000"))
    val keys = idx.map(_.getString(0)).toSet
    assert(keys == (0L until 30L).map(i => s"com,example)/doc/$i").toSet)
    // digest = md5 of the HTTP payload (the page), not the whole record
    val want = docs.collect().map { r =>
      val page = Warc.pageFor(r.getLong(0), "web", r.getString(2))
      val md = java.security.MessageDigest.getInstance("MD5")
      s"com,example)/doc/${r.getLong(0)}" ->
        md.digest(page.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }.toMap
    idx.foreach { r => assert(r.getString(5) == want(r.getString(0))) }
    // the wayback property: each (offset, length) slice is its own
    // decodable member holding exactly the indexed record
    val fileBytes = dir.listFiles.filter(_.getName.endsWith(".warc.gz"))
      .map(f => f.getName -> java.nio.file.Files.readAllBytes(f.toPath)).toMap
    idx.foreach { r =>
      val (len, off, fn) = (r.getLong(6), r.getLong(7), r.getString(8))
      val slice = java.util.Arrays.copyOfRange(fileBytes(fn), off.toInt, (off + len).toInt)
      val members = GzipCodec.gunzipMembers(slice).get
      assert(members.length == 1)
      val uri = new String(members(0), "UTF-8")
        .split("\r\n").find(_.startsWith("WARC-Target-URI:")).get.split(": ")(1)
      assert(Cdx.surtKey(uri) == r.getString(0))
    }
    // offsets are disjoint and within the file
    idx.groupBy(_.getString(8)).foreach { case (fn, rows) =>
      val extents = rows.map(r => (r.getLong(7), r.getLong(7) + r.getLong(6))).sortBy(_._1)
      extents.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(e1 <= s2)
        case _ =>
      }
      assert(extents.last._2 <= fileBytes(fn).length)
    }
    // a broken file quarantines as one status = -1 row
    val bad = new java.io.FileOutputStream(new java.io.File(dir, "bad.warc.gz"))
    bad.write(Array[Byte](0x1F, 0x8B.toByte, 9)); bad.close()
    val withBad = Cdx.index(spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.gz").load(dir.getAbsolutePath).select("path"), "path")
    val q = withBad.where($"status" === -1).collect()
    assert(q.length == 1 && q(0).getString(8) == "bad.warc.gz" && q(0).getLong(7) == -1L)
    assert(withBad.where($"status" =!= -1).count() == 30)
    // the warc SOURCE cdx mode surfaces the same index
    val viaSource = graft.sources.SourceReader.read(spark,
      graft.spec.SourceSpec("idx", "warc", graft.spec.Config.of(
        "path" -> dir.getAbsolutePath, "cdx" -> true)))
    assert(viaSource.columns.toSeq == Seq("urlkey", "timestamp", "url", "mime",
      "status", "digest", "length", "offset", "filename"))
    assert(viaSource.where($"status" === 200).count() == 30)
    dir.listFiles.foreach(_.delete()); dir.delete()
  }
}
