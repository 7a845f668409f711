package graft

import graft.ops.{GzipCodec, Tar}
import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream, TarArchiveOutputStream}
import org.apache.spark.sql.functions._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** From-spec ustar parser/writer pinned against commons-compress
  * (the independent implementation on the Spark classpath) in both
  * directions, plus checksum/truncation refusal, GNU longnames, and
  * the Spark member seam with its quarantine contract.
  */
class TarSpec extends SparkSuite {
  import spark.implicits._

  private def ccWrite(members: Seq[(String, Array[Byte])], longMode: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val t = new TarArchiveOutputStream(bos)
    t.setLongFileMode(longMode)
    members.foreach { case (name, data) =>
      val e = new TarArchiveEntry(name)
      if (data != null) { e.setSize(data.length); t.putArchiveEntry(e); t.write(data) }
      else t.putArchiveEntry(e)
      t.closeArchiveEntry()
    }
    t.close()
    bos.toByteArray
  }

  private def ccRead(tar: Array[Byte]): Seq[(String, Array[Byte])] = {
    val in = new TarArchiveInputStream(new ByteArrayInputStream(tar))
    val out = Seq.newBuilder[(String, Array[Byte])]
    var e = in.getNextEntry
    while (e != null) {
      out += ((e.getName, in.readAllBytes()))
      e = in.getNextEntry
    }
    out.result()
  }

  private val files = Seq(
    "a.txt" -> "hello tar".getBytes("UTF-8"),
    "dir/" -> (null: Array[Byte]),
    "dir/b.bin" -> Array.tabulate[Byte](1000)(i => (i * 7).toByte),
    "dir/empty" -> Array.emptyByteArray,
    "exactly-one-block" -> Array.fill[Byte](512)(3)
  )

  test("commons-compress archives parse here, entry for entry") {
    val tar = ccWrite(files, TarArchiveOutputStream.LONGFILE_ERROR)
    val got = Tar.entries(tar).get
    assert(got.map(_.name) == files.map(_._1))
    for ((e, (_, data)) <- got.zip(files)) {
      if (data == null) assert(e.typeflag == '5' && e.size == 0)
      else assert(java.util.Arrays.equals(e.data, data), e.name)
    }
  }

  test("our archives parse in commons-compress, byte for byte") {
    val tar = Tar.tarOf(files)
    val got = ccRead(tar)
    assert(got.map(_._1) == files.map(_._1))
    for (((_, gotData), (_, data)) <- got.zip(files))
      assert(java.util.Arrays.equals(gotData, Option(data).getOrElse(Array.emptyByteArray)))
  }

  test("GNU longname entries ('L') apply to the following member") {
    val longName = "deep/" + ("x" * 120) + "/leaf.txt"
    val tar = ccWrite(Seq(longName -> "payload".getBytes), TarArchiveOutputStream.LONGFILE_GNU)
    val got = Tar.entries(tar).get
    assert(got.map(_.name) == Seq(longName))
    assert(new String(got.head.data, "UTF-8") == "payload")
  }

  test("refusal ladder: bad checksum, mid-stream garbage, truncation, base-256 sizes") {
    val tar = Tar.tarOf(files)
    val badSum = tar.clone(); badSum(148) = '7'
    assert(Tar.entries(badSum).isEmpty)
    val garbage = tar.clone(); garbage(tar.length - 1) = 1 // non-zero padding after terminator
    assert(Tar.entries(garbage).isEmpty)
    for (cut <- Seq(100, 512, 513, tar.length - 600))
      assert(Tar.entries(tar.take(cut)).isEmpty, s"accepted truncation at $cut")
    val b256 = tar.clone(); b256(124) = 0x80.toByte // GNU base-256 size marker
    assert(Tar.entries(b256).isEmpty)
    for (i <- 0 until 200) {
      val rnd = new scala.util.Random(i)
      Tar.entries(Array.fill[Byte](rnd.nextInt(2048))(rnd.nextInt().toByte)) // never throws
    }
  }

  test("tar SOURCE reads .tar.gz files from disk into the text surface") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tar").toFile
    val docs = Seq((0L, "alpha"), (1L, "beta")).toDF("doc_id", "text")
    Tar.packDocsTarGz(docs, "doc_id", "text", nFiles = 2).collect().foreach { r =>
      val out = new java.io.FileOutputStream(new java.io.File(dir, s"part-${r.getLong(0)}.tar.gz"))
      out.write(r.getAs[Array[Byte]](1)); out.close()
    }
    val read = graft.sources.SourceReader.read(spark,
      graft.spec.SourceSpec("corpus", "tar", graft.spec.Config.of(
        "path" -> s"${dir.getAbsolutePath}/*.tar.gz")))
    assert(read.columns.toSeq == Seq("file_id", "member_index", "name", "size", "text"))
    assert(read.count() == 2)
    assert(read.where($"name" === "doc/1.txt").select("text").as[String].head() == "beta")
    dir.listFiles.foreach(_.delete()); dir.delete()
  }

  test("jsonl SOURCE reads zstd- and gzip-compressed shards via the from-spec codecs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toFile
    def write(name: String, bytes: Array[Byte]): Unit = {
      val out = new java.io.FileOutputStream(new java.io.File(dir, name))
      out.write(bytes); out.close()
    }
    val shard1 = "{\"doc_id\": 1, \"text\": \"from zstd\"}\n{\"doc_id\": 2, \"text\": \"also zstd\"}\n"
    val shard2 = "{\"doc_id\": 3, \"text\": \"from gzip\"}\r\n"
    val ctx = new com.github.luben.zstd.ZstdCompressCtx()
    try write("a.jsonl.zst", ctx.setLevel(3).compress(shard1.getBytes("UTF-8"))) finally ctx.close()
    write("b.jsonl.gz", GzipCodec.gzipStored(shard2.getBytes("UTF-8")))
    write("c.jsonl", "{\"doc_id\": 4, \"text\": \"plain\"}\n".getBytes("UTF-8"))
    val bz = new java.io.ByteArrayOutputStream()
    val bzs = new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(bz, 1)
    bzs.write("{\"doc_id\": 5, \"text\": \"from bzip2\"}\n".getBytes("UTF-8")); bzs.close()
    write("d.jsonl.bz2", bz.toByteArray)
    val read = graft.sources.SourceReader.read(spark,
      graft.spec.SourceSpec("shards", "jsonl", graft.spec.Config.of(
        "path" -> s"${dir.getAbsolutePath}/*.jsonl*")))
    val rows = read.select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(rows == Map(1L -> "from zstd", 2L -> "also zstd", 3L -> "from gzip",
      4L -> "plain", 5L -> "from bzip2"))
    dir.listFiles.foreach(_.delete()); dir.delete()
  }

  test("tar.bz2 / tar.xz / tar.zst wrappers all sniff through the codec ladder") {
    val tar = Tar.tarOf(Seq("f.txt" -> "wrapped payload".getBytes("UTF-8")))
    val bz = { val b = new ByteArrayOutputStream()
      val z = new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(b, 5)
      z.write(tar); z.close(); b.toByteArray }
    val xzp = { val b = new ByteArrayOutputStream()
      val z = new org.tukaani.xz.XZOutputStream(b, new org.tukaani.xz.LZMA2Options(6))
      z.write(tar); z.close(); b.toByteArray }
    val zst = { val ctx = new com.github.luben.zstd.ZstdCompressCtx()
      try ctx.setLevel(3).compress(tar) finally ctx.close() }
    for ((name, wrapped) <- Seq("bz2" -> bz, "xz" -> xzp, "zst" -> zst, "plain" -> tar)) {
      val ms = Tar.members(Seq((name, wrapped)).toDF("file_id", "payload"), "file_id", "payload")
      val texts = Tar.memberText(ms).select("text").as[String].collect()
      assert(texts.toSeq == Seq("wrapped payload"), name)
    }
  }

  test("pack → members round-trips names, sizes, and bytes through tar.gz") {
    val docs = Seq((0L, "alpha"), (1L, "beta"), (33L, "gamma")).toDF("doc_id", "text")
    val ms = Tar.members(Tar.packDocsTarGz(docs, "doc_id", "text"), "file_id", "payload")
    // buckets 0 and 1: each leads with the doc/ dir entry
    assert(ms.count() == 5)
    assert(ms.where($"typeflag" === "5").count() == 2)
    val texts = Tar.memberText(ms).select("name", "text").as[(String, String)].collect().toMap
    assert(texts == Map("doc/0.txt" -> "alpha", "doc/1.txt" -> "beta", "doc/33.txt" -> "gamma"))
    // quarantine: corrupt gzip body
    val corrupt = Tar.packDocsTarGz(docs, "doc_id", "text").limit(1)
      .select($"file_id", expr("concat(substring(payload, 1, 40), X'00')").as("payload"))
    assert(Tar.members(corrupt, "file_id", "payload").where($"member_index" === -1).count() == 1)
    // even buckets now carry OUR from-spec gzip/Deflate wrapper — the
    // independent commons-compress stack must read them end to end
    val even = Tar.packDocsTarGz(docs, "doc_id", "text")
      .where($"file_id" % 2 === 0).select("payload").as[Array[Byte]].head()
    val tin = new TarArchiveInputStream(
      new org.apache.commons.compress.compressors.gzip.GzipCompressorInputStream(
        new java.io.ByteArrayInputStream(even)))
    val names = Iterator.continually(tin.getNextTarEntry).takeWhile(_ != null)
      .map(_.getName).toSeq
    assert(names == Seq("doc/", "doc/0.txt"))
  }
}
