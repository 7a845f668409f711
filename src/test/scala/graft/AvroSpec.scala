package graft

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Avro

/** From-spec Avro object-container codec pinned BIDIRECTIONALLY
  * against the Apache Avro reference library (on the classpath as
  * Spark's own dependency, never linked by src/main): their writer
  * must parse here across every codec both speak, our writer must
  * parse there, plus hostile-bytes refusal and the Spark seams.
  */
class AvroSpec extends SparkSuite {
  import spark.implicits._

  private val recSchemaJson =
    """{"type":"record","name":"doc","fields":[
      {"name":"id","type":"long"},
      {"name":"name","type":"string"},
      {"name":"note","type":["null","string"]},
      {"name":"score","type":"double"},
      {"name":"flag","type":"boolean"},
      {"name":"payload","type":"bytes"},
      {"name":"small","type":"int"},
      {"name":"ratio","type":"float"},
      {"name":"tags","type":{"type":"array","items":"string"}},
      {"name":"counts","type":{"type":"map","values":"long"}}
    ]}""".replaceAll("\n\\s*", "")

  private def refRecord(schema: Schema, i: Int): GenericRecord = {
    val r = new GenericData.Record(schema)
    r.put("id", i.toLong * 1000)
    r.put("name", s"doc-$i")
    r.put("note", if (i % 3 == 0) null else s"note $i")
    r.put("score", i * 1.5)
    r.put("flag", i % 2 == 0)
    r.put("payload", ByteBuffer.wrap(Array.tabulate[Byte](i % 5 + 1)(j => (i + j).toByte)))
    r.put("small", i - 50)
    r.put("ratio", i * 0.25f)
    r.put("tags", Seq(s"t$i", "common").asJava)
    r.put("counts", Map(s"k$i" -> i.toLong, "z" -> 0L).asJava)
    r
  }

  private def refWrite(codec: CodecFactory, n: Int): Array[Byte] = {
    val schema = new Schema.Parser().parse(recSchemaJson)
    val bos = new ByteArrayOutputStream()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(codec)
    w.create(schema, bos)
    (0 until n).foreach(i => w.append(refRecord(schema, i)))
    w.close()
    bos.toByteArray
  }

  private def checkOurDecode(bytes: Array[Byte], n: Int, codecName: String): Unit = {
    val (h, rows) = Avro.readContainer(bytes).getOrElse(fail(s"decode failed for $codecName"))
    assert(h.codec == codecName)
    assert(rows.length == n)
    val r7 = rows(7).asInstanceOf[Row]
    assert(r7.getLong(0) == 7000L)
    assert(r7.getString(1) == "doc-7")
    assert(r7.getString(2) == "note 7")
    assert(r7.getDouble(3) == 10.5)
    assert(r7.getBoolean(4) == false)
    assert(r7.getAs[Array[Byte]](5).toSeq == Seq[Byte](7, 8, 9)) // i%5+1 = 3 bytes
    assert(r7.getInt(6) == -43)
    assert(r7.getFloat(7) == 1.75f)
    assert(r7.getSeq[String](8) == Seq("t7", "common"))
    assert(r7.getMap[String, Long](9) == Map("k7" -> 7L, "z" -> 0L))
    assert(rows(9).asInstanceOf[Row].isNullAt(2)) // i % 3 == 0 → null note
  }

  test("reference writer -> our reader, every codec both libraries speak") {
    val codecs = Seq(
      "null" -> CodecFactory.nullCodec(),
      "deflate" -> CodecFactory.deflateCodec(6),
      "snappy" -> CodecFactory.snappyCodec(),
      "bzip2" -> CodecFactory.bzip2Codec(),
      "xz" -> CodecFactory.xzCodec(6),
      "zstandard" -> CodecFactory.zstandardCodec(3))
    for ((name, c) <- codecs) checkOurDecode(refWrite(c, 60), 60, name)
  }

  test("our writer -> reference reader, every codec we emit") {
    for (codec <- Seq("null", "deflate", "snappy", "zstandard")) {
      val datums = (0 until 40).map(i => Row(i.toLong, s"n$i",
        if (i % 4 == 0) null else s"note$i"))
      val json = """{"type":"record","name":"t","fields":[
        {"name":"a","type":"long"},{"name":"b","type":"string"},
        {"name":"c","type":["null","string"]}]}""".replaceAll("\n\\s*", "")
      val bytes = Avro.writeContainer(json, codec, datums.iterator, syncSeed = "s1",
        blockRows = 16)
      val rd = new DataFileReader(new SeekableByteArrayInput(bytes),
        new GenericDatumReader[GenericRecord]())
      val got = rd.iterator().asScala.toVector
      rd.close()
      assert(got.length == 40, codec)
      assert(got(5).get("a") == 5L)
      assert(got(5).get("b").toString == "n5")
      assert(got(5).get("c").toString == "note5")
      assert(got(8).get("c") == null)
    }
  }

  test("round trip through our own writer+reader: nested, logical types, [T,null] unions") {
    val json = """{"type":"record","name":"n","fields":[
      {"name":"id","type":"long"},
      {"name":"when","type":{"type":"long","logicalType":"timestamp-micros"}},
      {"name":"day","type":{"type":"int","logicalType":"date"}},
      {"name":"inner","type":{"type":"record","name":"pt","fields":[
        {"name":"x","type":"double"},{"name":"y","type":["double","null"]}]}},
      {"name":"pts","type":{"type":"array","items":"pt"}}
    ]}""".replaceAll("\n\\s*", "")
    val ts = java.sql.Timestamp.from(java.time.Instant.parse("2024-05-06T07:08:09.123456Z"))
    val day = java.sql.Date.valueOf("2023-11-30")
    val rows = Seq(
      Row(1L, ts, day, Row(1.0, 2.0), Seq(Row(3.0, null), Row(4.0, 5.0))),
      Row(2L, ts, day, Row(0.5, null), Seq.empty[Row]))
    val bytes = Avro.writeContainer(json, "deflate", rows.iterator, "seed")
    val (h, got) = Avro.readContainer(bytes).get
    assert(h.codec == "deflate")
    assert(got == rows.toVector)
    // reference library agrees on the logical values
    val rd = new DataFileReader(new SeekableByteArrayInput(bytes),
      new GenericDatumReader[GenericRecord]())
    val first = rd.iterator().asScala.next()
    rd.close()
    assert(first.get("when") == 1714979289123456L)
    assert(first.get("day") == day.toLocalDate.toEpochDay.toInt)
  }

  test("general unions: reference writer -> our reader (memberN struct + promotions)") {
    val json = """{"type":"record","name":"u","fields":[
      {"name":"id","type":"long"},
      {"name":"u3","type":["string","long","null"]},
      {"name":"nums","type":["int","long"]},
      {"name":"fp","type":["null","float","double"]},
      {"name":"sb","type":["string","bytes"]}
    ]}""".replaceAll("\n\\s*", "")
    // spark-avro mapping on our side
    val st = Avro.parseSchema(json).flatMap(Avro.sparkSchema).get
    assert(st("u3").dataType == StructType(Seq(
      StructField("member0", StringType), StructField("member1", LongType))))
    assert(st("u3").nullable)
    assert(st("nums").dataType == LongType && !st("nums").nullable)
    assert(st("fp").dataType == DoubleType && st("fp").nullable)
    assert(st("sb").dataType.isInstanceOf[StructType] && !st("sb").nullable)
    // reference-written data decodes into that shape
    val schema = new Schema.Parser().parse(json)
    val bos = new ByteArrayOutputStream()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, bos)
    (0 until 12).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("id", i.toLong)
      r.put("u3", (i % 3) match {
        case 0 => s"s$i"; case 1 => java.lang.Long.valueOf(i * 10L); case _ => null })
      r.put("nums", if (i % 2 == 0) java.lang.Integer.valueOf(i) else java.lang.Long.valueOf(1L << 40))
      r.put("fp", (i % 3) match {
        case 0 => null; case 1 => java.lang.Float.valueOf(i * 0.5f); case _ => java.lang.Double.valueOf(i * 0.25) })
      r.put("sb", if (i % 2 == 0) s"str$i" else ByteBuffer.wrap(Array[Byte](i.toByte, 7)))
      w.append(r)
    }
    w.close()
    val (_, rows) = Avro.readContainer(bos.toByteArray).get
    assert(rows.length == 12)
    val r0 = rows(0).asInstanceOf[Row]
    assert(r0.getAs[Row](1) == Row("s0", null)) // string branch -> member0
    assert(r0.getLong(2) == 0L) // int widened
    assert(r0.isNullAt(3)) // null fp branch
    assert(r0.getAs[Row](4) == Row("str0", null))
    val r1 = rows(1).asInstanceOf[Row]
    assert(r1.getAs[Row](1) == Row(null, 10L)) // long branch -> member1
    assert(r1.getLong(2) == (1L << 40))
    assert(r1.getDouble(3) == 0.5) // float widened
    assert(r1.getAs[Row](4).getAs[Array[Byte]](1).toSeq == Seq[Byte](1, 7))
    val r2 = rows(2).asInstanceOf[Row]
    assert(r2.isNullAt(1)) // null union branch -> null struct
    assert(r2.getDouble(3) == 0.5)
  }

  test("general unions: our writer -> reference reader (wide-branch writer choice)") {
    val json = """{"type":"record","name":"u","fields":[
      {"name":"id","type":"long"},
      {"name":"u3","type":["string","long","null"]},
      {"name":"nums","type":["int","long"]}
    ]}""".replaceAll("\n\\s*", "")
    val datums = Seq(
      Row(0L, Row("a", null), 7L),
      Row(1L, Row(null, 42L), 1L << 40),
      Row(2L, null, 3L))
    val bytes = Avro.writeContainer(json, "deflate", datums.iterator, "s2")
    val rd = new DataFileReader(new SeekableByteArrayInput(bytes),
      new GenericDatumReader[GenericRecord]())
    val got = rd.iterator().asScala.toVector
    rd.close()
    assert(got(0).get("u3").toString == "a")
    assert(got(1).get("u3") == 42L)
    assert(got(2).get("u3") == null)
    // promoted union always writes the wide (long) branch
    assert(got(0).get("nums") == 7L && got(1).get("nums") == (1L << 40))
    // and our own reader round-trips the same bytes
    assert(Avro.readContainer(bytes).get._2 == datums.toVector)
  }

  test("single-branch unions surface the BARE type (spark-avro unwrap), wire index kept") {
    val json = """{"type":"record","name":"s1","fields":[
      {"name":"n","type":["int"]},
      {"name":"s","type":["string"]}
    ]}""".replaceAll("\n\\s*", "")
    // bare Spark surface: int stays INT (no numeric widening), not a
    // member0 struct, and not nullable (no null branch)
    val st = Avro.parseSchema(json).flatMap(Avro.sparkSchema).get
    assert(st("n").dataType == IntegerType && !st("n").nullable)
    assert(st("s").dataType == StringType && !st("s").nullable)
    // reference writer -> our reader: bare values
    val schema = new Schema.Parser().parse(json)
    val bos = new ByteArrayOutputStream()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, bos)
    (0 until 3).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("n", java.lang.Integer.valueOf(i))
      r.put("s", s"v$i")
      w.append(r)
    }
    w.close()
    val (_, rows) = Avro.readContainer(bos.toByteArray).get
    assert(rows == Vector(Row(0, "v0"), Row(1, "v1"), Row(2, "v2")))
    // our writer -> reference reader: the wire branch index survives
    val bytes = Avro.writeContainer(json, "null",
      Seq(Row(7, "x"), Row(8, "y")).iterator, "s8")
    val rd = new DataFileReader(new SeekableByteArrayInput(bytes),
      new GenericDatumReader[GenericRecord]())
    val got = rd.iterator().asScala.toVector
    rd.close()
    assert(got.map(r => (r.get("n"), r.get("s").toString)) == Vector((7, "x"), (8, "y")))
    assert(Avro.readContainer(bytes).get._2 == Vector(Row(7, "x"), Row(8, "y")))
  }

  test("schema subset refusals are total, not crashes") {
    // general unions now parse; the remaining refusals hold
    assert(Avro.parseSchema("""["null","string","long"]""").isDefined) // 3-branch: accepted (r13)
    assert(Avro.parseSchema("""["string","string"]""").isEmpty) // duplicate branches
    assert(Avro.parseSchema("""[["string","null"],"long"]""").isEmpty) // nested union
    assert(Avro.parseSchema("""["null"]""").isEmpty) // no expressible value
    assert(Avro.parseSchema("""{"type":"bytes","logicalType":"decimal","precision":9,"scale":2}""")
      .contains(Avro.ABytes)) // logical decimal reads as raw bytes (declared)
    assert(Avro.parseSchema("not json").isEmpty)
    assert(Avro.parseSchema("""{"type":"record","name":"r"}""").isEmpty) // no fields
  }

  test("hostile bytes: truncation, tamper, fuzz — never throws, returns None") {
    val good = refWrite(CodecFactory.deflateCodec(6), 30)
    assert(Avro.readContainer(good).isDefined)
    for (cut <- Seq(0, 3, 4, 20, good.length / 2, good.length - 1))
      assert(Avro.readContainer(good.take(cut)).isEmpty, s"cut=$cut")
    // flip a byte inside the first data block (after header) → codec or
    // sync failure, never an exception
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val b = good.clone()
      val i = rnd.nextInt(b.length)
      b(i) = (b(i) ^ (1 + rnd.nextInt(255))).toByte
      Avro.readContainer(b) // must not throw; value may be Some for header-metadata flips
    }
    (0 until 200).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(b)
      assert(Avro.readContainer(b).isEmpty)
    }
  }

  test("sync marker is verified per block") {
    val bytes = Avro.writeContainer(
      """{"type":"record","name":"t","fields":[{"name":"a","type":"long"}]}""",
      "null", (0 until 10).map(i => Row(i.toLong)).iterator, "seed", blockRows = 5)
    // last 16 bytes are the final block's sync — corrupt one byte
    val b = bytes.clone()
    b(b.length - 1) = (b(b.length - 1) ^ 0x55).toByte
    assert(Avro.readContainer(b).isEmpty)
  }

  test("Spark seam: writeShards -> avro source round trip, all three surfaces") {
    val dir = java.nio.file.Files.createTempDirectory("avrospec").toFile
    val df = spark.range(0, 200)
      .select(col("id"),
        concat(lit("row "), col("id")).as("txt"),
        when(col("id") % 5 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("opt"), col("id"))).as("opt"),
        (col("id") * 2.5).as("d"),
        array(col("id"), col("id") + 1).as("arr"))
      .repartition(4)
    Avro.writeShards(df, dir.getAbsolutePath, codec = "deflate")
    val files = dir.listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length == 4)
    // reference library reads our shards
    val rd = new DataFileReader(files(0),
      new GenericDatumReader[GenericRecord]())
    assert(rd.iterator().asScala.nonEmpty)
    rd.close()
    // our source reads them back, full fidelity
    val src = graft.spec.SourceSpec("a", "avro",
      graft.spec.Config.of("path" -> s"${dir.getAbsolutePath}/*.avro"))
    val back = graft.sources.SourceReader.read(spark, src)
    assert(back.schema.fieldNames.toSeq == Seq("id", "txt", "opt", "d", "arr"))
    val a = df.orderBy("id").collect().toSeq
    val b = back.orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("Spark seam: schema drift across shards fails naming the shard; corrupt shard honors skip_corrupt") {
    val dir = java.nio.file.Files.createTempDirectory("avrodrift").toFile
    val okBytes = Avro.writeContainer(
      """{"type":"record","name":"t","fields":[{"name":"a","type":"long"}]}""",
      "null", Seq(Row(1L), Row(2L)).iterator, "s")
    val driftBytes = Avro.writeContainer(
      """{"type":"record","name":"t","fields":[{"name":"a","type":"long"},{"name":"b","type":"string"}]}""",
      "null", Seq(Row(3L, "x")).iterator, "s")
    java.nio.file.Files.write(new java.io.File(dir, "a.avro").toPath, okBytes)
    java.nio.file.Files.write(new java.io.File(dir, "b.avro").toPath, driftBytes)
    val src = graft.spec.SourceSpec("a", "avro",
      graft.spec.Config.of("path" -> s"${dir.getAbsolutePath}/*.avro"))
    val e = intercept[org.apache.spark.SparkException] {
      graft.sources.SourceReader.read(spark, src).collect()
    }
    assert(e.getMessage.contains("b.avro") ||
      Option(e.getCause).exists(_.getMessage.contains("b.avro")))
    // corrupt (not drifted) shard: skip_corrupt=true quarantine-skips
    val dir2 = java.nio.file.Files.createTempDirectory("avrocorrupt").toFile
    java.nio.file.Files.write(new java.io.File(dir2, "a.avro").toPath, okBytes)
    java.nio.file.Files.write(new java.io.File(dir2, "z.avro").toPath,
      okBytes.take(okBytes.length - 3))
    val strictSrc = graft.spec.SourceSpec("a", "avro",
      graft.spec.Config.of("path" -> s"${dir2.getAbsolutePath}/*.avro"))
    intercept[org.apache.spark.SparkException] {
      graft.sources.SourceReader.read(spark, strictSrc).collect()
    }
    val lax = graft.spec.SourceSpec("a", "avro",
      graft.spec.Config.of("path" -> s"${dir2.getAbsolutePath}/*.avro",
        "skip_corrupt" -> true))
    assert(graft.sources.SourceReader.read(spark, lax).collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 2L))
  }

  test("avro sink spec op writes shards the source reads back") {
    val dir = java.nio.file.Files.createTempDirectory("avrosink").toFile
    val df = spark.range(0, 50).select(col("id"), concat(lit("v"), col("id")).as("v"))
    graft.sinks.SinkWriter.write(df,
      graft.spec.SinkSpec("out", "avro", graft.spec.Config.of(
        "path" -> dir.getAbsolutePath, "codec" -> "snappy", "n_files" -> 2)))
    val back = graft.sources.SourceReader.read(spark,
      graft.spec.SourceSpec("a", "avro",
        graft.spec.Config.of("path" -> s"${dir.getAbsolutePath}/*.avro")))
    assert(back.count() == 50)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("packDocsAvro/unpackDocsAvro: gate seam round-trips the documents table") {
    val docs = sf("documents")
    val packed = Avro.packDocsAvro(docs, "doc_id", "source", "lang", "text", nFiles = 8)
    val codecs = packed.select("codec").distinct().as[String].collect().sorted
    assert(codecs.toSeq == Seq("deflate", "null", "snappy", "zstandard"))
    val back = Avro.unpackDocsAvro(packed)
    val orig = docs.select(col("doc_id"), col("source"), col("lang"), col("text"))
      .orderBy("doc_id").collect().toSeq
    val got = back.select(col("doc_id"), col("source"), col("lang"), col("text"))
      .orderBy("doc_id").collect().toSeq
    assert(got == orig)
    // reference library reads every gate shard too
    packed.select("payload").as[Array[Byte]].collect().foreach { p =>
      val rd = new DataFileReader(new SeekableByteArrayInput(p),
        new GenericDatumReader[GenericRecord]())
      assert(rd.iterator().asScala.nonEmpty)
      rd.close()
    }
  }

  test("packDocsAvro: negative ids shard via floorMod, null ids drop — no crash") {
    val hostile = Seq(
      (java.lang.Long.valueOf(-5L), "s", "en", "neg"),
      (java.lang.Long.valueOf(3L), "s", "en", "pos"),
      (null.asInstanceOf[java.lang.Long], "s", "en", "null-id"))
      .toDF("doc_id", "source", "lang", "text")
    val packed = Avro.packDocsAvro(hostile, "doc_id", "source", "lang", "text", nFiles = 4)
    val back = Avro.unpackDocsAvro(packed)
    assert(back.select("text").as[String].collect().sorted.toSeq == Seq("neg", "pos"))
    // -5 floorMod 4 = 3, codec index floorMod keeps it in range
    assert(packed.where($"file_id" === 3L).count() == 1)
  }
}
