package graft

import org.apache.spark.sql.DataFrame
import graft.ops.Iceberg

/** Iceberg v1 metadata walk: version-hint → metadata json →
  * manifest-list → manifests → active parquet files, the path-prefix
  * remap (tables move), snapshot selection, and the refusal ladder
  * (format-version 2, missing snapshot, non-parquet data). */
class IcebergSpec extends SparkSuite {
  import spark.implicits._

  private def singleParquet(df: DataFrame, dest: java.io.File): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ice").toFile
    df.coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().find(f =>
      f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, dest.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def write(f: java.io.File, bytes: Array[Byte]): Unit =
    java.nio.file.Files.write(f.toPath, bytes)
  private def write(f: java.io.File, s: String): Unit =
    write(f, s.getBytes("UTF-8"))

  /** A table dir: data f0..f2.parquet (two rows each), metadata dir
    * with TWO snapshots — the old one holds only f0; the current one
    * holds f0 + f2 with f1 as a DELETED entry — behind a writer-side
    * location prefix that must remap. */
  private def fixture(): java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ice-tbl").toFile
    (0 to 2).foreach { i =>
      singleParquet(Seq((i * 10L, s"r${i}a"), (i * 10L + 1, s"r${i}b")).toDF("id", "s"),
        new java.io.File(dir, s"f$i.parquet"))
    }
    val meta = new java.io.File(dir, "metadata"); meta.mkdirs()
    val loc = "file:/warehouse/db/tbl" // the WRITER's location: must remap
    def p(rel: String) = s"$loc/$rel"
    // old snapshot 10: only f0
    write(new java.io.File(meta, "m-old.avro"), Iceberg.writeManifest(Seq(
      Iceberg.Entry(1, p("f0.parquet"), "PARQUET", 2L, 100L)), "old"))
    write(new java.io.File(meta, "ml-old.avro"), Iceberg.writeManifestList(Seq(
      (p("metadata/m-old.avro"), 1L)), "mlold"))
    // current snapshot 11: manifest A has f0 EXISTING + f1 DELETED,
    // manifest B adds f2
    write(new java.io.File(meta, "m-a.avro"), Iceberg.writeManifest(Seq(
      Iceberg.Entry(0, p("f0.parquet"), "PARQUET", 2L, 100L),
      Iceberg.Entry(2, p("f1.parquet"), "PARQUET", 2L, 100L)), "a"))
    write(new java.io.File(meta, "m-b.avro"), Iceberg.writeManifest(Seq(
      Iceberg.Entry(1, p("f2.parquet"), "PARQUET", 2L, 100L)), "b"))
    write(new java.io.File(meta, "ml-cur.avro"), Iceberg.writeManifestList(Seq(
      (p("metadata/m-a.avro"), 1L), (p("metadata/m-b.avro"), 1L)), "mlcur"))
    write(new java.io.File(meta, "v2.metadata.json"),
      s"""{"format-version":1,"table-uuid":"u","location":"$loc",
         |"current-snapshot-id":11,"snapshots":[
         |{"snapshot-id":10,"manifest-list":"${p("metadata/ml-old.avro")}"},
         |{"snapshot-id":11,"manifest-list":"${p("metadata/ml-cur.avro")}"}]}"""
        .stripMargin.replaceAll("\n", ""))
    write(new java.io.File(meta, "version-hint.text"), "2")
    dir
  }

  test("readTable: current snapshot via version-hint, deleted entries dropped, location remap") {
    val dir = fixture()
    val got = Iceberg.readTable(spark, dir.getAbsolutePath)
      .as[(Long, String)].collect().sorted.toSeq
    // f0 (existing) + f2 (added); f1 is a DELETED tombstone
    assert(got == Seq((0L, "r0a"), (1L, "r0b"), (20L, "r2a"), (21L, "r2b")))
    // single-scan contract, same as the delta reader
    val plan = Iceberg.readTable(spark, dir.getAbsolutePath)
      .queryExecution.sparkPlan.toString
    assert("FileScan".r.findAllIn(plan).length == 1)
  }

  test("readTable snapshot travel: an explicit id reads that snapshot; unknown ids refuse") {
    val dir = fixture()
    // snapshot 10 is the OLD state (f0 only); current is 11
    val old = Iceberg.readTable(spark, dir.getAbsolutePath, Some(10L))
      .as[(Long, String)].collect().sorted.toSeq
    assert(old == Seq((0L, "r0a"), (1L, "r0b")))
    val cur = Iceberg.readTable(spark, dir.getAbsolutePath, Some(11L))
      .as[(Long, String)].collect().sorted.toSeq
    assert(cur == Seq((0L, "r0a"), (1L, "r0b"), (20L, "r2a"), (21L, "r2b")))
    val e = intercept[graft.GraftAnalysisException] {
      Iceberg.readTable(spark, dir.getAbsolutePath, Some(99L))
    }
    assert(e.getMessage.contains("expired or unknown"))
  }

  test("readTable: stale version-hint falls back nowhere — the named metadata wins") {
    val dir = fixture()
    // point the hint at the OLD metadata (v1 naming the old snapshot)
    val meta = new java.io.File(dir, "metadata")
    val loc = "file:/warehouse/db/tbl"
    write(new java.io.File(meta, "v1.metadata.json"),
      s"""{"format-version":1,"location":"$loc","current-snapshot-id":10,
         |"snapshots":[{"snapshot-id":10,"manifest-list":"$loc/metadata/ml-old.avro"}]}"""
        .stripMargin.replaceAll("\n", ""))
    write(new java.io.File(meta, "version-hint.text"), "1")
    val got = Iceberg.readTable(spark, dir.getAbsolutePath)
      .as[(Long, String)].collect().sorted.toSeq
    assert(got == Seq((0L, "r0a"), (1L, "r0b"))) // old snapshot: f0 only
  }

  test("refusal ladder: format-version 3, missing current snapshot, junk manifest, non-parquet") {
    val dir = fixture()
    val meta = new java.io.File(dir, "metadata")
    def metaJson(body: String): Unit = {
      write(new java.io.File(meta, "v3.metadata.json"), body)
      write(new java.io.File(meta, "version-hint.text"), "3")
    }
    metaJson("""{"format-version":3,"location":"x","current-snapshot-id":11,"snapshots":[]}""")
    intercept[graft.GraftAnalysisException] { Iceberg.readTable(spark, dir.getAbsolutePath) }
    metaJson("""{"format-version":1,"location":"x","snapshots":[]}""")
    intercept[graft.GraftAnalysisException] { Iceberg.readTable(spark, dir.getAbsolutePath) }
    val loc = "file:/warehouse/db/tbl"
    write(new java.io.File(meta, "m-junk.avro"), "not avro at all".getBytes("UTF-8"))
    metaJson(s"""{"format-version":1,"location":"$loc","current-snapshot-id":7,""" +
      s""""snapshots":[{"snapshot-id":7,"manifest-list":"$loc/metadata/ml-junk.avro"}]}""")
    write(new java.io.File(meta, "ml-junk.avro"), Iceberg.writeManifestList(Seq(
      (s"$loc/metadata/m-junk.avro", 1L)), "j"))
    intercept[graft.GraftAnalysisException] { Iceberg.readTable(spark, dir.getAbsolutePath) }
    // ORC data file: refuse, never half-read
    write(new java.io.File(meta, "m-orc.avro"), Iceberg.writeManifest(Seq(
      Iceberg.Entry(1, s"$loc/f0.parquet", "ORC", 2L, 100L)), "orc"))
    write(new java.io.File(meta, "ml-orc.avro"), Iceberg.writeManifestList(Seq(
      (s"$loc/metadata/m-orc.avro", 1L)), "mlorc"))
    metaJson(s"""{"format-version":1,"location":"$loc","current-snapshot-id":8,""" +
      s""""snapshots":[{"snapshot-id":8,"manifest-list":"$loc/metadata/ml-orc.avro"}]}""")
    intercept[graft.GraftAnalysisException] { Iceberg.readTable(spark, dir.getAbsolutePath) }
  }

  test("manifestEntries/manifestListPaths: reference-library cross-read and hostile bytes") {
    val m = Iceberg.writeManifest(Seq(
      Iceberg.Entry(1, "a.parquet", "PARQUET", 3L, 10L),
      Iceberg.Entry(2, "b.parquet", "PARQUET", 4L, 11L)), "x")
    assert(Iceberg.manifestEntries(m).get.map(e => (e.status, e.path)) ==
      Seq((1, "a.parquet"), (2, "b.parquet")))
    // the reference Avro library reads the same bytes identically
    val rd = new org.apache.avro.file.DataFileReader(
      new org.apache.avro.file.SeekableByteArrayInput(m),
      new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    val refRows = new scala.collection.mutable.ArrayBuffer[(Int, String)]()
    while (rd.hasNext) { val r = rd.next()
      refRows += ((r.get("status").asInstanceOf[Int],
        r.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
          .get("file_path").toString)) }
    rd.close()
    assert(refRows.toSeq == Seq((1, "a.parquet"), (2, "b.parquet")))
    assert(Iceberg.manifestEntries("junk".getBytes("UTF-8")).isEmpty)
    assert(Iceberg.manifestListPaths("junk".getBytes("UTF-8")).isEmpty)
    // a schema without the entry shape is None, not a crash
    assert(Iceberg.manifestEntries(Iceberg.writeManifestList(Seq(("p", 1L)), "s")).isEmpty)
  }

  test("iceberg_manifest spec op dispatches to entriesDf") {
    import graft.spec._
    val packed = Iceberg.packDocsManifest(Seq(4L).toDF("doc_id"), "doc_id")
    val viaOp = graft.transforms.Transforms(packed,
      TransformSpec("im", "iceberg_manifest", Config.of()), Map.empty)
    assert(viaOp.columns.toSeq ==
      Seq("id", "status", "path", "format", "record_count", "file_size"))
    assert(viaOp.count() == 2L) // id 4: even → two entries
  }

  test("entriesDf gate surface replays planted arithmetic") {
    val packed = Iceberg.packDocsManifest(Seq(5L, 6L).toDF("doc_id"), "doc_id")
    val rows = Iceberg.entriesDf(packed, "id", "payload")
      .as[(Long, Int, String, String, Long, Long)].collect().toSet
    assert(rows == Set(
      (5L, 1, "data-5-0.parquet", "PARQUET", 6L, 4101L),
      (6L, 2, "data-6-0.parquet", "PARQUET", 7L, 4102L), // %3==0: deleted
      (6L, 0, "data-6-1.parquet", "PARQUET", 7L, 106L)))
  }

  // --- format-version 2: position deletes (round 15) ---

  /** A v2 table: data f0 (ids 0,1) + f1 (ids 10,11), one
    * position-delete parquet removing f0 row 0 and f1 row 1, split
    * across a data manifest and a delete manifest. */
  private def v2Fixture(eqDelete: Boolean = false): java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ice-v2").toFile
    val loc = dir.getAbsolutePath
    singleParquet(Seq((0L, "a"), (1L, "b")).toDF("id", "s"),
      new java.io.File(dir, "f0.parquet"))
    singleParquet(Seq((10L, "c"), (11L, "d")).toDF("id", "s"),
      new java.io.File(dir, "f1.parquet"))
    singleParquet(Seq((s"$loc/f0.parquet", 0L), (s"$loc/f1.parquet", 1L))
      .toDF("file_path", "pos"), new java.io.File(dir, "del.parquet"))
    val meta = new java.io.File(dir, "metadata"); meta.mkdirs()
    write(new java.io.File(meta, "m-data.avro"), Iceberg.writeManifestV2(Seq(
      Iceberg.Entry(1, s"$loc/f0.parquet", "PARQUET", 2L, 1L, content = 0),
      Iceberg.Entry(1, s"$loc/f1.parquet", "PARQUET", 2L, 1L, content = 0)), "d"))
    write(new java.io.File(meta, "m-del.avro"), Iceberg.writeManifestV2(Seq(
      Iceberg.Entry(1, s"$loc/del.parquet", "PARQUET", 2L, 1L,
        content = if (eqDelete) 2 else 1)), "x"))
    write(new java.io.File(meta, "ml.avro"), Iceberg.writeManifestListV2(Seq(
      (s"$loc/metadata/m-data.avro", 1L, 0), (s"$loc/metadata/m-del.avro", 1L, 1)), "ml"))
    write(new java.io.File(meta, "v1.metadata.json"),
      s"""{"format-version":2,"location":"$loc","current-snapshot-id":1,""" +
        s""""snapshots":[{"snapshot-id":1,"manifest-list":"$loc/metadata/ml.avro"}]}""")
    write(new java.io.File(meta, "version-hint.text"), "1")
    dir
  }

  test("v2 position deletes: delete rows anti-join the data scan by (file_path, pos)") {
    val got = Iceberg.readTable(spark, v2Fixture().getAbsolutePath)
      .select("id", "s").as[(Long, String)].collect().sorted.toSeq
    assert(got == Seq((1L, "b"), (10L, "c")))
  }

  test("v2 equality deletes without sequence numbers refuse by name") {
    val e = intercept[graft.GraftAnalysisException] {
      Iceberg.readTable(spark, v2Fixture(eqDelete = true).getAbsolutePath).collect()
    }
    assert(e.getMessage.contains("no data sequence number"))
  }

  // --- format-version 2: equality deletes (round 15 continuation) ---

  /** Two data generations around an equality delete on `s` (field id
    * 2): gen1 (seq 1, INHERITED from the manifest list row) has ids
    * 0..3 with s = a,b,null,d; the delete (seq 2) lists values
    * ("a", null) — null must match null; gen2 (seq 3) re-inserts
    * (10,"a") and (11,null), which must SURVIVE the older delete.
    * Optionally a position delete (removing gen2's row 0) composes. */
  private def eqFixture(posDelete: Boolean = false, eqIds: Seq[Int] = Seq(2),
      withSchema: Boolean = true): java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ice-eq").toFile
    val loc = dir.getAbsolutePath
    singleParquet(Seq((0L, Option("a")), (1L, Option("b")), (2L, Option.empty[String]),
      (3L, Option("d"))).toDF("id", "s"), new java.io.File(dir, "f0.parquet"))
    singleParquet(Seq((10L, Option("a")), (11L, Option.empty[String])).toDF("id", "s"),
      new java.io.File(dir, "f1.parquet"))
    singleParquet(Seq(Option("a"), Option.empty[String]).toDF("s"),
      new java.io.File(dir, "eq-del.parquet"))
    if (posDelete)
      singleParquet(Seq((s"$loc/f1.parquet", 0L)).toDF("file_path", "pos"),
        new java.io.File(dir, "pos-del.parquet"))
    val meta = new java.io.File(dir, "metadata"); meta.mkdirs()
    write(new java.io.File(meta, "m-g1.avro"), Iceberg.writeManifestSeq(Seq(
      Iceberg.Entry(1, s"$loc/f0.parquet", "PARQUET", 4L, 1L, content = 0,
        sequenceNumber = None)), "g1")) // null → inherits the list row's 1
    write(new java.io.File(meta, "m-g2.avro"), Iceberg.writeManifestSeq(Seq(
      Iceberg.Entry(1, s"$loc/f1.parquet", "PARQUET", 2L, 1L, content = 0,
        sequenceNumber = Some(3L))), "g2"))
    write(new java.io.File(meta, "m-del.avro"), Iceberg.writeManifestSeq(Seq(
      Iceberg.Entry(1, s"$loc/eq-del.parquet", "PARQUET", 2L, 1L, content = 2,
        sequenceNumber = Some(2L), equalityIds = eqIds)), "del"))
    val listRows = Seq(
      (s"$loc/metadata/m-g1.avro", 1L, 0, 1L),
      (s"$loc/metadata/m-g2.avro", 1L, 0, 3L),
      (s"$loc/metadata/m-del.avro", 1L, 1, 2L)) ++
      (if (posDelete) {
        write(new java.io.File(meta, "m-pdel.avro"), Iceberg.writeManifestSeq(Seq(
          Iceberg.Entry(1, s"$loc/pos-del.parquet", "PARQUET", 1L, 1L, content = 1,
            sequenceNumber = Some(4L))), "pdel"))
        Seq((s"$loc/metadata/m-pdel.avro", 1L, 1, 4L))
      } else Seq.empty)
    write(new java.io.File(meta, "ml.avro"), Iceberg.writeManifestListSeq(listRows, "ml"))
    val schemaJson = if (withSchema)
      s""""current-schema-id":0,"schemas":[{"type":"struct","schema-id":0,"fields":[
         |{"id":1,"name":"id","required":false,"type":"long"},
         |{"id":2,"name":"s","required":false,"type":"string"}]}],"""
        .stripMargin.replaceAll("\n", "")
    else ""
    write(new java.io.File(meta, "v1.metadata.json"),
      s"""{"format-version":2,"location":"$loc",$schemaJson"current-snapshot-id":1,""" +
        s""""snapshots":[{"snapshot-id":1,"manifest-list":"$loc/metadata/ml.avro"}]}""")
    write(new java.io.File(meta, "version-hint.text"), "1")
    dir
  }

  test("v2 equality deletes: null-safe value match, sequence scoping, inheritance") {
    val got = Iceberg.readTable(spark, eqFixture().getAbsolutePath)
      .select("id", "s").as[(Long, Option[String])].collect().sortBy(_._1).toSeq
    // gen1 loses (0,"a") and (2,null); gen2's (10,"a") and (11,null)
    // postdate the delete and survive
    assert(got == Seq((1L, Some("b")), (3L, Some("d")),
      (10L, Some("a")), (11L, None)))
  }

  test("v2 equality + position deletes compose in one snapshot") {
    val got = Iceberg.readTable(spark, eqFixture(posDelete = true).getAbsolutePath)
      .select("id", "s").as[(Long, Option[String])].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, Some("b")), (3L, Some("d")), (11L, None)))
  }

  test("v2 equality refusals: unknown field id, missing schema, missing delete column") {
    val e1 = intercept[graft.GraftAnalysisException] {
      Iceberg.readTable(spark, eqFixture(eqIds = Seq(9)).getAbsolutePath).collect()
    }
    assert(e1.getMessage.contains("not in the current schema"))
    val e2 = intercept[graft.GraftAnalysisException] {
      Iceberg.readTable(spark, eqFixture(withSchema = false).getAbsolutePath).collect()
    }
    assert(e2.getMessage.contains("not in the current schema"))
    // delete file lacking the named column
    val dir = eqFixture()
    singleParquet(Seq(Option("a")).toDF("wrong"), new java.io.File(dir, "eq-del.parquet"))
    val e3 = intercept[graft.GraftAnalysisException] {
      Iceberg.readTable(spark, dir.getAbsolutePath).collect()
    }
    assert(e3.getMessage.contains("lacks column"))
  }

  test("v2 delete file without the spec columns refuses") {
    val dir = v2Fixture()
    // overwrite the delete parquet with a wrong-schema file
    singleParquet(Seq(("x", 1L)).toDF("not_path", "n"),
      new java.io.File(dir, "del.parquet"))
    intercept[graft.GraftAnalysisException] {
      Iceberg.readTable(spark, dir.getAbsolutePath).collect()
    }
  }

  private def smallDocs = Seq(
    (1L, "web", 10L), (2L, "web", 20L), (3L, "book", 30L),
    (4L, "web", 40L), (5L, "book", 50L), (6L, "web", 60L),
    (7L, "book", 70L), (8L, "web", 80L))
    .toDF("doc_id", "source", "n_chars")

  test("field-id resolution: renamed generations read by id, added column null-fills") {
    val dir = graft.ops.TableFixtures.writeIcebergRenameTable(spark, smallDocs, "doc_id")
    val df = Iceberg.readTable(spark, dir)
    assert(df.columns.toSeq == Seq("doc_id", "source", "n_chars", "parity"))
    val got = df.as[(Long, String, Long, Option[String])].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == (1L to 8L))
    assert(got.forall { case (id, s, n, p) =>
      n == id * 10 && (if (id % 2 == 0) p.isEmpty else p.contains("odd")) &&
        s == (if (Seq(3L, 5L, 7L).contains(id)) "book" else "web")
    })
    // a NAME-based read of the same files would null generation A's
    // data columns — prove the stored names really differ
    val rawA = spark.read.parquet(s"$dir/genA-0.parquet")
    assert(rawA.columns.toSeq == Seq("id_v1", "src_v1", "chars_v1"))
  }

  test("field-id resolution: layout cap, required-field gap, duplicate ids refuse by name") {
    val dir = graft.ops.TableFixtures.writeIcebergRenameTable(spark, smallDocs, "doc_id")
    spark.conf.set("graft.iceberg.maxLayouts", "1")
    try {
      val e = intercept[graft.GraftAnalysisException] {
        Iceberg.readTable(spark, dir)
      }
      assert(e.getMessage.contains("distinct parquet field layouts"))
    } finally spark.conf.unset("graft.iceberg.maxLayouts")
    // parity required=true: generation A lacks it → refuse, don't fabricate
    val metaFile = new java.io.File(dir, "metadata/v1.metadata.json")
    val json = new String(java.nio.file.Files.readAllBytes(metaFile.toPath), "UTF-8")
    write(metaFile, json.replace(
      """{"id":4,"name":"parity","required":false""",
      """{"id":4,"name":"parity","required":true"""))
    val e2 = intercept[graft.GraftAnalysisException] {
      Iceberg.readTable(spark, dir)
    }
    assert(e2.getMessage.contains("required field 'parity'"))
    // duplicate field id inside one file layout
    write(metaFile, json)
    def fid(n: Long) = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("parquet.field.id", n).build()
    import org.apache.spark.sql.functions.col
    singleParquet(
      Seq((9L, "z")).toDF("a", "b")
        .select(col("a").as("x1", fid(1)), col("b").as("x2", fid(1))),
      new java.io.File(dir, "genA-0.parquet"))
    val e3 = intercept[graft.GraftAnalysisException] {
      Iceberg.readTable(spark, dir)
    }
    assert(e3.getMessage.contains("duplicate parquet field id 1"))
  }

  test("field-id resolution: files without any ids fall back to NAME matching") {
    val dir = graft.ops.TableFixtures.writeIcebergRenameTable(spark, smallDocs, "doc_id")
    // replace generation A with id-less files under the CURRENT names
    // (the spec's name-mapping fallback for imported files); parity
    // still null-fills there
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val data = smallDocs.select(col("doc_id"), col("source"), col("n_chars"))
    (0 to 1).foreach { k =>
      singleParquet(data.where(pmod(col("doc_id"), lit(4)) === 2 * k).sort("doc_id"),
        new java.io.File(dir, s"genA-$k.parquet"))
    }
    val got = Iceberg.readTable(spark, dir)
      .as[(Long, String, Long, Option[String])].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == (1L to 8L))
    assert(got.forall { case (id, _, n, p) =>
      n == id * 10 && (if (id % 2 == 0) p.isEmpty else p.contains("odd")) })
  }

  test("file-list cap: a snapshot past graft.iceberg.maxFiles refuses by name") {
    val dir = graft.ops.TableFixtures.writeIcebergV2Table(spark, smallDocs, "doc_id")
    spark.conf.set("graft.iceberg.maxFiles", "2")
    try {
      val e = intercept[graft.GraftAnalysisException] {
        Iceberg.readTable(spark, dir) // 4 bucket data files > 2
      }
      assert(e.getMessage.contains("more than 2 active data files"))
    } finally spark.conf.unset("graft.iceberg.maxFiles")
    assert(Iceberg.readTable(spark, dir).count() > 0)
  }

  test("partition pruning: only matching files reach the scan; result equals full-scan filter") {
    import org.apache.spark.sql.functions.col
    val dir = graft.ops.TableFixtures.writeIcebergPartTable(spark, smallDocs, "doc_id")
    val pred = col("bucket") === 1 || col("bucket") === 2
    val pruned = Iceberg.readTable(spark, dir, None, Some(pred))
    // PlanShape: out-of-range files never reach the scan
    val opened = pruned.inputFiles.map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    assert(opened == Set("part-1.parquet", "part-2.parquet"))
    val full = Iceberg.readTable(spark, dir).where(pred)
    assert(pruned.collect().map(_.toSeq).toSet == full.collect().map(_.toSeq).toSet)
    assert(pruned.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 5L, 6L))
  }

  test("partition pruning keeps everything when it cannot be sure") {
    import org.apache.spark.sql.functions.col
    val dir = graft.ops.TableFixtures.writeIcebergPartTable(spark, smallDocs, "doc_id")
    // a predicate over a NON-partition column: pruning skips, the row
    // filter still applies, all four files open
    val nonPart = Iceberg.readTable(spark, dir, None, Some(col("n_chars") >= 30L))
    assert(nonPart.inputFiles.length == 4)
    assert(nonPart.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(3L, 4L, 5L, 6L, 7L, 8L))
    // everything pruned: one schema-carrier file, zero rows
    val none = Iceberg.readTable(spark, dir, None, Some(col("bucket") === 99))
    assert(none.inputFiles.length == 1)
    assert(none.count() == 0)
    assert(none.columns.toSeq == Seq("doc_id", "source", "n_chars", "bucket"))
    // a non-identity transform is never pruned on
    val metaFile = new java.io.File(dir, "metadata/v1.metadata.json")
    val json = new String(java.nio.file.Files.readAllBytes(metaFile.toPath), "UTF-8")
    write(metaFile, json.replace("\"transform\":\"identity\"", "\"transform\":\"bucket[4]\""))
    val bucketed = Iceberg.readTable(spark, dir, None, Some(col("bucket") === 1))
    assert(bucketed.inputFiles.length == 4)
    assert(bucketed.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 5L))
  }

  // --- column-bounds file skipping (round 17) ---

  private def openedNames(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.inputFiles.map(p => p.substring(p.lastIndexOf('/') + 1)).toSet

  test("column-bounds skipping: a range predicate opens only overlapping files") {
    import org.apache.spark.sql.functions.col
    // ids 1..8, cuts (2,4,6) → q0={1,2} q1={3,4} q2={5,6} q3={7,8}
    val dir = graft.ops.TableFixtures.writeIcebergSkipTable(spark, smallDocs, "doc_id")
    val pred = col("doc_id") > 4L && col("doc_id") <= 6L
    val pruned = Iceberg.readTable(spark, dir, None, Some(pred))
    assert(openedNames(pruned) == Set("skip-q2.parquet"))
    assert(pruned.select("doc_id").as[Long].collect().sorted.toSeq == Seq(5L, 6L))
    val full = Iceberg.readTable(spark, dir).where(pred)
    assert(pruned.collect().map(_.toSeq).toSet == full.collect().map(_.toSeq).toSet)
    // a second bounded column composes: n_chars = 10·id
    val both = Iceberg.readTable(spark, dir, None,
      Some(col("n_chars") >= 30L && col("n_chars") <= 40L))
    assert(openedNames(both) == Set("skip-q1.parquet"))
    assert(both.select("doc_id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
  }

  test("column-bounds skipping stays conservative") {
    import org.apache.spark.sql.functions.col
    val dir = graft.ops.TableFixtures.writeIcebergSkipTable(spark, smallDocs, "doc_id")
    // no bounds recorded for source: every file opens, rows filter
    val noBounds = Iceberg.readTable(spark, dir, None, Some(col("source") === "book"))
    assert(noBounds.inputFiles.length == 4)
    assert(noBounds.select("doc_id").as[Long].collect().sorted.toSeq == Seq(3L, 5L, 7L))
    // mixed OR cannot split: keep all, exact rows
    val mixed = Iceberg.readTable(spark, dir, None,
      Some(col("doc_id") <= 2L || col("source") === "book"))
    assert(mixed.inputFiles.length == 4)
    assert(mixed.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 5L, 7L))
    // everything-pruned: one schema-carrier file, zero rows
    val none = Iceberg.readTable(spark, dir, None, Some(col("doc_id") > 99L))
    assert(none.inputFiles.length == 1 && none.count() == 0)
    // null_value_counts are real: IS NULL skips everything (no nulls),
    // IS NOT NULL keeps everything
    val isNull = Iceberg.readTable(spark, dir, None, Some(col("doc_id").isNull))
    assert(isNull.inputFiles.length == 1 && isNull.count() == 0)
    val notNull = Iceberg.readTable(spark, dir, None, Some(col("doc_id").isNotNull))
    assert(notNull.inputFiles.length == 4 && notNull.count() == 8)
  }

  test("partition pruning and bounds skipping compose per conjunct") {
    import org.apache.spark.sql.functions.col
    // the PART table has identity tuples but NO bounds: the bucket
    // conjunct prunes to one file-per-bucket, the n_chars conjunct
    // keeps (no bounds), rows re-filter
    val dir = graft.ops.TableFixtures.writeIcebergPartTable(spark, smallDocs, "doc_id")
    val composed = Iceberg.readTable(spark, dir, None,
      Some(col("bucket") === 1 && col("n_chars") <= 10L))
    assert(openedNames(composed) == Set("part-1.parquet"))
    assert(composed.select("doc_id").as[Long].collect().toSeq == Seq(1L))
    // the SKIP table: a mixed partition-shaped name is just a data
    // column here — bounds prune it
    val dir2 = graft.ops.TableFixtures.writeIcebergSkipTable(spark, smallDocs, "doc_id")
    val viaSrc = graft.sources.SourceReader.read(spark,
      graft.spec.SourceSpec("t", "iceberg", graft.spec.Config.of(
        "path" -> dir2, "partition_where" -> "doc_id > 4 AND doc_id <= 6")))
    assert(openedNames(viaSrc) == Set("skip-q2.parquet"))
    assert(viaSrc.select("doc_id").as[Long].collect().sorted.toSeq == Seq(5L, 6L))
  }

  test("timestamp travel: snapshot-log resolves; before-first and no-log refuse") {
    val dir = graft.ops.TableFixtures.writeIcebergV2Table(spark, smallDocs, "doc_id")
    // t=1500 → snapshot 0 (pre-delete: every id); t=2500 → snapshot 1
    // (id%7==0 gone: id 7 deleted)
    val at1500 = Iceberg.readTableAt(spark, dir, 1500L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(at1500 == (1L to 8L))
    val at2500 = Iceberg.readTableAt(spark, dir, 2500L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(at2500 == Seq(1L, 2L, 3L, 4L, 5L, 6L, 8L))
    val e = intercept[graft.GraftAnalysisException] {
      Iceberg.readTableAt(spark, dir, 500L)
    }
    assert(e.getMessage.contains("precedes the first logged snapshot"))
    val noLog = graft.ops.TableFixtures.writeIcebergRenameTable(spark, smallDocs, "doc_id")
    val e2 = intercept[graft.GraftAnalysisException] {
      Iceberg.readTableAt(spark, noLog, 1500L)
    }
    assert(e2.getMessage.contains("no snapshot-log"))
  }
}
