package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.ops.TfRecord
import graft.ops.TfRecord.{BytesFeature, FloatFeature, Int64Feature}
import graft.spec.{Config, SourceSpec}
import graft.sources.SourceReader

/** TFRecord framing + tf.train.Example protobuf, pinned three ways:
  * the CRC against the JDK's independent CRC32C, the wire walk
  * against hand-laid-out protobuf bytes, and the Spark seam
  * end-to-end (sink shards → source rows). */
class TfRecordSpec extends SparkSuite {
  import spark.implicits._

  private def jdkCrc(data: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(data)
    c.getValue.toInt
  }

  test("crc32c matches the JDK's independent implementation") {
    val rnd = new scala.util.Random(12)
    val cases = Seq(Array.emptyByteArray, Array[Byte](0), Array[Byte](-1)) ++
      (1 to 20).map { i =>
        val b = new Array[Byte](rnd.nextInt(500) + 1); rnd.nextBytes(b); b
      }
    cases.foreach { b =>
      assert(TfRecord.crc32c(b) == jdkCrc(b), s"len=${b.length}")
    }
    // the classic check vector: "123456789" -> 0xE3069283
    assert(TfRecord.crc32c("123456789".getBytes(StandardCharsets.US_ASCII)) == 0xE3069283)
  }

  test("framing round-trips and verifies both CRCs") {
    val recs = Vector("a".getBytes, Array.emptyByteArray, ("x" * 1000).getBytes)
    val framed = TfRecord.frame(recs.iterator)
    val (back, clean) = TfRecord.recordsOf(framed)
    assert(clean && back.map(_.toSeq) == recs.map(_.toSeq))

    // frameTo is the streaming writer the file sink uses: identical
    // bytes, record-at-a-time (no whole-shard buffer)
    val streamed = new java.io.ByteArrayOutputStream()
    TfRecord.frameTo(recs.iterator, streamed)
    assert(streamed.toByteArray.toSeq == framed.toSeq)

    // flip a data byte: the record's data CRC fails; the clean
    // prefix before it still surfaces
    val tampered = framed.clone()
    tampered(12) = (tampered(12) ^ 1).toByte // first record's single data byte
    val (t1, c1) = TfRecord.recordsOf(tampered)
    assert(t1.isEmpty && !c1)

    // flip a byte of the THIRD record's data: first two survive
    val t2 = framed.clone()
    t2(t2.length - 10) = (t2(t2.length - 10) ^ 1).toByte
    val (recs2, clean2) = TfRecord.recordsOf(t2)
    assert(recs2.size == 2 && !clean2)

    // truncated tail after a clean record
    val (t3, c3) = TfRecord.recordsOf(framed.take(framed.length - 1))
    assert(t3.size == 2 && !c3)

    // corrupt length CRC
    val t4 = framed.clone(); t4(8) = (t4(8) ^ 1).toByte
    assert(TfRecord.recordsOf(t4) == ((Vector(), false)))

    // empty shard is clean
    assert(TfRecord.recordsOf(Array.emptyByteArray) == ((Vector(), true)))
  }

  test("Example round-trips in both wire forms, floats bit-exact") {
    val feats = Vector(
      "b" -> BytesFeature(Vector("hello".getBytes, Array.emptyByteArray)),
      "f" -> FloatFeature(Vector(1.5f, -0.0f, Float.MinPositiveValue, 3.14159f)),
      "i" -> Int64Feature(Vector(0L, -1L, Long.MaxValue, Long.MinValue, 42L)))
    for (packed <- Seq(true, false)) {
      val got = TfRecord.decodeExample(TfRecord.encodeExample(feats, packed)).get
      assert(got.map(_._1) == Vector("b", "f", "i"))
      val BytesFeature(bs) = got(0)._2
      assert(bs.map(_.toSeq) == Vector("hello".getBytes.toSeq, Seq()))
      assert(got(1)._2 == FloatFeature(Vector(1.5f, -0.0f, Float.MinPositiveValue, 3.14159f)))
      assert(got(2)._2 == Int64Feature(Vector(0L, -1L, Long.MaxValue, Long.MinValue, 42L)))
    }
  }

  test("hand-laid-out wire bytes decode per the protobuf spec") {
    // Example { features { feature { key: "id", value { int64_list { value: 300 } } } } }
    // laid out byte by byte: 300 = varint AC 02
    val int64List = Array[Byte](0x08, 0xAC.toByte, 0x02) // field 1 varint (unpacked)
    val feature = Array[Byte](0x1A, int64List.length.toByte) ++ int64List // int64_list = 3
    val key = "id".getBytes(StandardCharsets.UTF_8)
    val entry = Array[Byte](0x0A, key.length.toByte) ++ key ++
      Array[Byte](0x12, feature.length.toByte) ++ feature
    val features = Array[Byte](0x0A, entry.length.toByte) ++ entry
    val example = Array[Byte](0x0A, features.length.toByte) ++ features
    assert(TfRecord.decodeExample(example) ==
      Some(Vector("id" -> Int64Feature(Vector(300L)))))
  }

  test("unknown fields skip by wire type; duplicate keys last-win; hostile bytes refuse") {
    val base = TfRecord.encodeExample(Vector("k" -> Int64Feature(Vector(7L))))
    // append an unknown varint field (field 9, wire 0) and an unknown
    // fixed64 (field 10, wire 1) at Example level — both must skip
    val extra = base ++ Array[Byte](0x48, 0x05) ++
      Array[Byte](0x51, 1, 2, 3, 4, 5, 6, 7, 8)
    assert(TfRecord.decodeExample(extra) == Some(Vector("k" -> Int64Feature(Vector(7L)))))

    // duplicate map key: last wins (the protobuf map merge rule)
    val dup = TfRecord.encodeExample(Vector(
      "k" -> Int64Feature(Vector(1L)), "k" -> Int64Feature(Vector(2L))))
    assert(TfRecord.decodeExample(dup) == Some(Vector("k" -> Int64Feature(Vector(2L)))))

    // group wire type (3), truncated varint, over-length refuse to None
    assert(TfRecord.decodeExample(Array[Byte](0x0B)).isEmpty)
    assert(TfRecord.decodeExample(Array[Byte](0x0A, 0xFF.toByte)).isEmpty)
    assert(TfRecord.decodeExample(Array[Byte](0x0A, 0x7F, 0x00)).isEmpty)
    // fuzz: random bytes never throw
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(64)); rnd.nextBytes(b)
      TfRecord.decodeExample(b) // must not throw; None or a junk parse both fine
    }
  }

  test("Spark seam: tfrecord sink shards -> tfrecord source rows, all types") {
    val dir = java.nio.file.Files.createTempDirectory("tfr").toFile
    val df = Seq(
      (1L, "alpha", 1.5f, Seq(1.0f, 2.0f), Seq(10L, 20L)),
      (2L, "beta", -2.5f, Seq(3.0f), Seq(30L)))
      .toDF("id", "name", "score", "vec", "ids")
    graft.ops.TfRecord.writeShards(df.repartition(1), dir.getAbsolutePath)
    val read = SourceReader.read(spark, SourceSpec("t", "tfrecord", Config.of(
      "path" -> s"${dir.getAbsolutePath}/*.tfrecord")))
    assert(read.where($"rec_index" === -1).count() == 0)
    val byKind = read.groupBy("kind").count().as[(String, Long)].collect().toMap
    assert(byKind == Map("bytes" -> 2L, "int64" -> 4L, "float" -> 4L))
    val names = read.where($"feature" === "name").select("text").as[String].collect().sorted
    assert(names.toSeq == Seq("alpha", "beta"))
    val vecs = read.where($"feature" === "vec").select("floats")
      .as[Array[Float]].collect().map(_.toSeq).sortBy(_.head)
    assert(vecs.toSeq == Seq(Seq(1.0f, 2.0f), Seq(3.0f)))
    // unsupported column type fails BEFORE the job launches
    val bad = Seq((1L, Map("a" -> 1))).toDF("id", "m")
    val e = intercept[graft.GraftAnalysisException](
      graft.ops.TfRecord.writeShards(bad, dir.getAbsolutePath))
    assert(e.getMessage.contains("'m'"))
  }

  test("gate packers: both wire forms round-trip the corpus") {
    val docs = sf("documents")
    val packed = TfRecord.packDocsTfr(docs, "doc_id", "source", "lang", "text", nFiles = 4)
    val long = TfRecord.rows(packed, "file_id", "payload")
    assert(long.where($"rec_index" === -1).count() == 0)
    val ids = long.where($"feature" === "doc_id")
      .select(element_at($"ints", 1)).as[Long].collect().sorted
    val want = docs.where($"doc_id".isNotNull).select($"doc_id".cast("long"))
      .as[Long].collect().sorted
    assert(ids.toSeq == want.toSeq)
    // per-shard record order is id order (rec_index == rank in bucket)
    val seqs = long.where($"feature" === "doc_id")
      .select($"file_id", $"rec_index", element_at($"ints", 1).as("id"))
      .as[(String, Int, Long)].collect()
    seqs.groupBy(_._1).foreach { case (_, rows) =>
      val byIdx = rows.sortBy(_._2).map(_._3)
      assert(byIdx.toSeq == byIdx.sorted.toSeq)
    }
  }
}
