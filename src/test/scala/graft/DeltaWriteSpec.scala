package graft

import org.apache.spark.sql.functions._
import graft.ops.{DeltaLog, DeltaWrite}

/** The round-17 append writer: create + append roundtrip through the
  * repo's own reader, stats consumable by the data skipper, atomic
  * exclusive versioning, and the append-compat refusal ladder. */
class DeltaWriteSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Seq(
    (1L, "web", 10L), (2L, "web", 20L), (3L, "book", 30L),
    (4L, "web", 40L), (5L, "book", 50L), (6L, "web", 60L),
    (7L, "book", 70L), (8L, "web", 80L))
    .toDF("doc_id", "source", "n_chars")

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-dw").toFile.getAbsolutePath

  test("create + append roundtrip: two commits, reader replays both") {
    val dir = freshDir()
    val data = docs.withColumn("parity", pmod(col("doc_id"), lit(2)).cast("string"))
    assert(DeltaWrite.append(spark, data.where(col("parity") === "0"), dir, Seq("parity")) == 0L)
    assert(DeltaWrite.append(spark, data.where(col("parity") === "1"), dir, Seq("parity")) == 1L)
    val back = DeltaLog.readTable(spark, dir)
      .select("doc_id", "source", "n_chars", "parity")
      .as[(Long, String, String, String)].collect().sortBy(_._1).toSeq
    assert(back == (1L to 8L).map(i =>
      (i, if (Set(3L, 5L, 7L)(i)) "book" else "web", (i * 10).toString, (i % 2).toString)))
    // the log shape: v0 carries commitInfo + protocol + metaData + adds
    val v0 = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "_delta_log/00000000000000000000.json").toPath), "UTF-8")
    assert(v0.contains("\"protocol\"") && v0.contains("\"metaData\"") &&
      v0.contains("\"commitInfo\"") && v0.contains("\"stats\""))
    val v1 = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "_delta_log/00000000000000000001.json").toPath), "UTF-8")
    assert(!v1.contains("\"metaData\"") && v1.contains("\"add\""))
  }

  test("written stats feed the data skipper: pruned read opens fewer files") {
    val dir = freshDir()
    // two disjoint-range files per the range partitioner
    DeltaWrite.append(spark, docs.repartitionByRange(2, col("doc_id")), dir)
    val all = DeltaLog.readTable(spark, dir)
    assert(all.inputFiles.length == 2)
    val pruned = DeltaLog.readTable(spark, dir, None, Some(col("doc_id") <= 2L))
    assert(pruned.inputFiles.length == 1)
    assert(pruned.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // IS NULL prunes everything (real nullCount)
    val none = DeltaLog.readTable(spark, dir, None, Some(col("source").isNull))
    assert(none.inputFiles.length == 1 && none.count() == 0)
  }

  test("special and null partition values roundtrip through the dir layout") {
    val dir = freshDir()
    val data = Seq((1L, "a b:c"), (2L, null.asInstanceOf[String]), (3L, "plain"))
      .toDF("id", "k")
    DeltaWrite.append(spark, data, dir, Seq("k"))
    val back = DeltaLog.readTable(spark, dir).select("id", "k")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(back == Seq((1L, "a b:c"), (2L, null), (3L, "plain")))
  }

  test("append-compat refusal ladder") {
    val dir = freshDir()
    DeltaWrite.append(spark, docs, dir)
    // schema drift
    val e1 = intercept[GraftAnalysisException] {
      DeltaWrite.append(spark, docs.withColumn("extra", lit(1)), dir)
    }
    assert(e1.getMessage.contains("schema mismatch"))
    // partition mismatch
    val e2 = intercept[GraftAnalysisException] {
      DeltaWrite.append(spark, docs, dir, Seq("source"))
    }
    assert(e2.getMessage.contains("partition columns mismatch"))
    // empty input
    val e3 = intercept[GraftAnalysisException] {
      DeltaWrite.append(spark, docs.where(lit(false)), dir)
    }
    assert(e3.getMessage.contains("nothing to append"))
    // unknown partition column
    val e4 = intercept[GraftAnalysisException] {
      DeltaWrite.append(spark, docs, freshDir(), Seq("nope"))
    }
    assert(e4.getMessage.contains("not in the data"))
    // a later version planted by another writer: the append lands at
    // the NEXT contiguous version after it, never on top of it
    java.nio.file.Files.write(
      new java.io.File(dir, "_delta_log/00000000000000000001.json").toPath,
      """{"commitInfo":{"timestamp":1}}""".getBytes("UTF-8"))
    assert(DeltaWrite.append(spark, docs, dir) == 2L)
    // a malformed log refuses with the reason surfaced
    val badDir = freshDir()
    val badLog = new java.io.File(badDir, "_delta_log"); badLog.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(badLog, "00000000000000000000.json").toPath,
      "not json".getBytes("UTF-8"))
    val e5 = intercept[GraftAnalysisException] { DeltaWrite.append(spark, docs, badDir) }
    assert(e5.getMessage.contains("cannot append"))
  }

  test("appending through column mapping or table features refuses by name") {
    val cmDir = graft.ops.TableFixtures.writeDeltaCmTable(spark, docs, "doc_id")
    val e1 = intercept[GraftAnalysisException] {
      DeltaWrite.append(spark,
        docs.withColumn("parity", lit("even")), cmDir, Seq("parity"))
    }
    assert(e1.getMessage.contains("column mapping"))
    val dvDir = graft.ops.TableFixtures.writeDeltaDvTable(spark, docs, "doc_id")
    val e2 = intercept[GraftAnalysisException] {
      DeltaWrite.append(spark,
        docs.withColumn("bucket", lit("0")), dvDir, Seq("bucket"))
    }
    assert(e2.getMessage.contains("reader version 3") || e2.getMessage.contains("cannot append"))
  }

  test("prefix pruning (round 17): LIKE 'p%' and startsWith skip by string bounds") {
    val dir = freshDir()
    // two appends → one file holds only "web" values, one only "book"
    DeltaWrite.append(spark, docs.where(col("source") === "web").coalesce(1), dir)
    DeltaWrite.append(spark, docs.where(col("source") === "book").coalesce(1), dir)
    val all = DeltaLog.readTable(spark, dir)
    assert(all.inputFiles.length == 2)
    val like = DeltaLog.readTable(spark, dir, None,
      Some(org.apache.spark.sql.functions.expr("source LIKE 'w%'")))
    assert(like.inputFiles.length == 1)
    assert(like.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 4L, 6L, 8L))
    val sw = DeltaLog.readTable(spark, dir, None, Some(col("source").startsWith("bo")))
    assert(sw.inputFiles.length == 1)
    assert(sw.select("doc_id").as[Long].collect().sorted.toSeq == Seq(3L, 5L, 7L))
    // non-prefix LIKE patterns stay conservative (no pruning, exact rows)
    val mid = DeltaLog.readTable(spark, dir, None,
      Some(org.apache.spark.sql.functions.expr("source LIKE '%eb'")))
    assert(mid.inputFiles.length == 2)
    assert(mid.count() == 5)
    // no matching prefix anywhere: schema-carrier only
    val none = DeltaLog.readTable(spark, dir, None,
      Some(org.apache.spark.sql.functions.expr("source LIKE 'zz%'")))
    assert(none.inputFiles.length == 1 && none.count() == 0)
  }

  test("checkpoint writer: own checkpoint seeds the read, survives a vacuumed prefix") {
    val dir = freshDir()
    val data = docs.withColumn("parity", pmod(col("doc_id"), lit(2)).cast("string"))
    DeltaWrite.append(spark, data.where(col("parity") === "0"), dir, Seq("parity"))
    DeltaWrite.append(spark, data.where(col("parity") === "1"), dir, Seq("parity"))
    assert(DeltaWrite.writeCheckpoint(spark, dir) == 1L)
    // the read seeds from the checkpoint and equals the full table
    assert(DeltaLog.readTable(spark, dir).select("doc_id")
      .as[Long].collect().sorted.toSeq == (1L to 8L))
    // stats survive INTO the checkpoint: pruning works through it
    val pruned = DeltaLog.readTable(spark, dir, None,
      Some(col("parity") === "1" && col("doc_id") <= 3L))
    assert(pruned.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    // a vacuumed prefix (pre-checkpoint JSONs deleted) still reads
    new java.io.File(dir, "_delta_log/00000000000000000000.json").delete()
    new java.io.File(dir, "_delta_log/00000000000000000001.json").delete()
    assert(DeltaLog.readTable(spark, dir).count() == 8)
    // the fully-vacuumed log refuses BOTH a new checkpoint and an
    // append (appending would fork the table at version 0)
    val e0 = intercept[GraftAnalysisException] { DeltaWrite.writeCheckpoint(spark, dir) }
    assert(e0.getMessage.contains("no commits"))
    val eApp = intercept[GraftAnalysisException] {
      DeltaWrite.append(spark, data.where(col("parity") === "0"), dir, Seq("parity"))
    }
    assert(eApp.getMessage.contains("forking the table"))
    // a GAPPED history refuses a checkpoint by name
    val dir2 = freshDir()
    DeltaWrite.append(spark, data.where(col("parity") === "0"), dir2, Seq("parity"))
    DeltaWrite.append(spark, data.where(col("parity") === "1"), dir2, Seq("parity"))
    DeltaWrite.append(spark, docs.limit(1).withColumn("parity", lit("0")), dir2, Seq("parity"))
    new java.io.File(dir2, "_delta_log/00000000000000000001.json").delete()
    val e = intercept[GraftAnalysisException] { DeltaWrite.writeCheckpoint(spark, dir2) }
    assert(e.getMessage.contains("not contiguous"))
    // checkpointing a DV-bearing or v3 table refuses by name
    val dvDir = graft.ops.TableFixtures.writeDeltaDvTable(spark, docs, "doc_id")
    val e2 = intercept[GraftAnalysisException] { DeltaWrite.writeCheckpoint(spark, dvDir) }
    assert(e2.getMessage.contains("reader version 3") ||
      e2.getMessage.contains("deletion vectors"))
  }

  test("the delta sink spec surface writes a readable table") {
    val dir = freshDir() + "/tbl"
    graft.sinks.SinkWriter.write(docs,
      graft.spec.SinkSpec("out", "delta", graft.spec.Config.of("path" -> dir)))
    assert(DeltaLog.readTable(spark, dir).count() == 8)
    // second sink write APPENDS a new version
    graft.sinks.SinkWriter.write(docs,
      graft.spec.SinkSpec("out", "delta", graft.spec.Config.of("path" -> dir)))
    assert(DeltaLog.readTable(spark, dir).count() == 16)
    assert(DeltaLog.readTable(spark, dir, Some(0L)).count() == 8)
  }
}
