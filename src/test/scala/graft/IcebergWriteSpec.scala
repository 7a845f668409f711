package graft

import org.apache.spark.sql.functions._
import graft.ops.{Iceberg, IcebergWrite}

/** The round-17 Iceberg append writer: create + append roundtrip
  * through the repo's own reader, manifest bounds consumable by the
  * column-bounds skipper, snapshot travel across appends, atomic
  * exclusive metadata versioning, and the compat refusal ladder. */
class IcebergWriteSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Seq(
    (1L, "web", 10L), (2L, "web", 20L), (3L, "book", 30L),
    (4L, "web", 40L), (5L, "book", 50L), (6L, "web", 60L),
    (7L, "book", 70L), (8L, "web", 80L))
    .toDF("doc_id", "source", "n_chars")

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-ibw").toFile.getAbsolutePath

  test("create + append roundtrip across two snapshots; travel sees each state") {
    val dir = freshDir()
    assert(IcebergWrite.append(spark, docs.where(col("doc_id") % 2 === 0), dir) == 1L)
    assert(IcebergWrite.append(spark, docs.where(col("doc_id") % 2 === 1), dir) == 2L)
    val back = Iceberg.readTable(spark, dir).select("doc_id", "source", "n_chars")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(back == (1L to 8L).map(i =>
      (i, if (Set(3L, 5L, 7L)(i)) "book" else "web", i * 10)))
    // snapshot travel: snapshot 1 = the first append only
    assert(Iceberg.readTable(spark, dir, Some(1L)).select("doc_id")
      .as[Long].collect().sorted.toSeq == Seq(2L, 4L, 6L, 8L))
    // timestamp travel rides the written snapshot-log
    val atNow = Iceberg.readTableAt(spark, dir, System.currentTimeMillis() + 1000)
    assert(atNow.count() == 8)
  }

  test("written bounds feed the column-bounds skipper") {
    val dir = freshDir()
    IcebergWrite.append(spark, docs, dir, clusterBy = Seq("doc_id"), numFiles = 2)
    val all = Iceberg.readTable(spark, dir)
    assert(all.inputFiles.length == 2)
    val pruned = Iceberg.readTable(spark, dir, None, Some(col("doc_id") <= 2L))
    assert(pruned.inputFiles.length == 1)
    assert(pruned.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // IS NULL prunes everything (real null counts)
    val none = Iceberg.readTable(spark, dir, None, Some(col("source").isNull))
    assert(none.inputFiles.length == 1 && none.count() == 0)
  }

  test("append-compat refusal ladder") {
    val dir = freshDir()
    IcebergWrite.append(spark, docs, dir)
    val e1 = intercept[GraftAnalysisException] {
      IcebergWrite.append(spark, docs.withColumn("extra", lit(1)), dir)
    }
    assert(e1.getMessage.contains("schema mismatch"))
    val e2 = intercept[GraftAnalysisException] {
      IcebergWrite.append(spark, docs.where(lit(false)), dir)
    }
    assert(e2.getMessage.contains("nothing to append"))
    val e3 = intercept[GraftAnalysisException] {
      IcebergWrite.append(spark,
        docs.withColumn("bad", map(lit("k"), lit(1))), freshDir())
    }
    assert(e3.getMessage.contains("cannot record"))
    // appending around row-level deletes refuses
    val delDir = graft.ops.TableFixtures.writeIcebergV2Table(spark, docs, "doc_id")
    val e4 = intercept[GraftAnalysisException] {
      IcebergWrite.append(spark, docs, delDir)
    }
    assert(e4.getMessage.contains("delete manifests"))
  }

  test("incremental append scan: per-poll diff, identity empty, refusal ladder") {
    import org.apache.spark.sql.functions.col
    val dir = freshDir()
    IcebergWrite.append(spark, docs.where(col("doc_id") % 2 === 0), dir)
    IcebergWrite.append(spark, docs.where(col("doc_id") % 2 === 1), dir)
    // 1 → current = the second append
    assert(Iceberg.readAppendsBetween(spark, dir, 1L).select("doc_id")
      .as[Long].collect().sorted.toSeq == Seq(1L, 3L, 5L, 7L))
    // explicit to_snapshot and the spec surface agree
    val viaSrc = graft.sources.SourceReader.read(spark,
      graft.spec.SourceSpec("t", "iceberg", graft.spec.Config.of(
        "path" -> dir, "changes" -> true, "from_snapshot" -> 1L, "to_snapshot" -> 2L)))
    assert(viaSrc.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L, 5L, 7L))
    // identity diff: empty, table schema kept
    val same = Iceberg.readAppendsBetween(spark, dir, 2L, Some(2L))
    assert(same.count() == 0 &&
      same.columns.toSeq == Seq("doc_id", "source", "n_chars"))
    // unknown snapshot refuses by name
    val e1 = intercept[GraftAnalysisException] {
      Iceberg.readAppendsBetween(spark, dir, 99L)
    }
    assert(e1.getMessage.contains("snapshot 99"))
    // a table with delete manifests refuses (append-only by design)
    val delDir = graft.ops.TableFixtures.writeIcebergV2Table(spark, docs, "doc_id")
    val e2 = intercept[GraftAnalysisException] {
      Iceberg.readAppendsBetween(spark, delDir, 0L)
    }
    assert(e2.getMessage.contains("delete manifests"))
  }

  test("the iceberg sink spec surface writes a readable table") {
    val dir = freshDir() + "/tbl"
    graft.sinks.SinkWriter.write(docs,
      graft.spec.SinkSpec("out", "iceberg", graft.spec.Config.of(
        "path" -> dir, "cluster_by" -> Seq("doc_id"), "num_files" -> 2)))
    assert(Iceberg.readTable(spark, dir).count() == 8)
    // and the iceberg SOURCE (with pruning) reads it back
    val viaSrc = graft.sources.SourceReader.read(spark,
      graft.spec.SourceSpec("t", "iceberg", graft.spec.Config.of(
        "path" -> dir, "partition_where" -> "doc_id <= 2")))
    assert(viaSrc.inputFiles.length == 1)
    assert(viaSrc.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }
}
