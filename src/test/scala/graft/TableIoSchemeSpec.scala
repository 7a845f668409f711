package graft

import org.apache.spark.sql.functions._
import graft.ops.{DeltaLog, DeltaWrite, Iceberg, IcebergWrite, TableIo}

/** The round-18 Hadoop-FileSystem seam: every table-format METADATA
  * walk (log listings, commit/manifest reads, checkpoint probes) must
  * route through `org.apache.hadoop.fs.FileSystem`, so a table
  * addressed by a non-`file:` scheme behaves exactly like a local
  * one. `graftmock:` (a registered local-disk-backed scheme) is the
  * stand-in for `s3a://`/`hdfs://` this container cannot host: code
  * still on `java.io.File` sees an empty dir under it and fails. */
class TableIoSchemeSpec extends SparkSuite {
  import spark.implicits._

  private def withMockFs[A](body: => A): A = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftmock.impl", classOf[GraftMockFs].getName)
    body
  }

  private def docs = Seq(
    (1L, "web", 10L), (2L, "web", 20L), (3L, "book", 30L),
    (4L, "web", 40L), (5L, "book", 50L), (6L, "web", 60L))
    .toDF("doc_id", "source", "n_chars")
    .withColumn("parity", (col("doc_id") % 2).cast("string"))

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Long, String)] =
    df.select("doc_id", "source", "n_chars", "parity")
      .as[(Long, String, Long, String)].collect().sortBy(_._1).toSeq

  test("TableIo primitives list/read/exist through a non-file scheme") {
    withMockFs {
      val dir = java.nio.file.Files.createTempDirectory("graft-mockio").toFile
      java.nio.file.Files.write(new java.io.File(dir, "a.txt").toPath,
        "hello".getBytes("UTF-8"))
      val scheme = s"graftmock:${dir.getAbsolutePath}"
      assert(TableIo.list(scheme).map(_.name) == Seq("a.txt"))
      assert(TableIo.readString(s"$scheme/a.txt") == "hello")
      assert(TableIo.isFile(s"$scheme/a.txt"))
      assert(!TableIo.isFile(s"$scheme/missing.txt"))
      assert(TableIo.list(s"$scheme/nope").isEmpty)
      // the seam's premise: java.io.File CANNOT see this path
      assert(!new java.io.File(s"$scheme/a.txt").isFile)
    }
  }

  test("hasScheme separates URIs from POSIX paths") {
    assert(TableIo.hasScheme("s3a://bucket/key"))
    assert(TableIo.hasScheme("file:/tmp/x"))
    assert(TableIo.hasScheme("graftmock:/tmp/x"))
    assert(!TableIo.hasScheme("/tmp/x"))
    assert(!TableIo.hasScheme("relative/path"))
    assert(!TableIo.hasScheme("name:notapath"))
  }

  test("delta: read, travel, CDF, checkpoint seed, and skipping via the scheme") {
    withMockFs {
      val local = java.nio.file.Files.createTempDirectory("graft-mockdelta")
        .toFile.getAbsolutePath
      DeltaWrite.append(spark, docs.where(col("parity") === "0"), local, Seq("parity"))
      DeltaWrite.append(spark, docs.where(col("parity") === "1"), local, Seq("parity"))
      val scheme = s"graftmock:$local"
      // current read equals the local read (partition values from the log)
      assert(rowsOf(DeltaLog.readTable(spark, scheme)) ==
        rowsOf(DeltaLog.readTable(spark, local)))
      // version travel replays v0 only
      assert(DeltaLog.readTable(spark, scheme, Some(0L)).count() == 3L)
      // CDF across both commits
      val ch = DeltaLog.readChanges(spark, scheme, 0L, 1L)
      assert(ch.where(col("_change_type") === "insert").count() == 6L)
      // data skipping composes (partition conjunct prunes to one dir)
      val pruned = DeltaLog.readTable(spark, scheme, None,
        Some(col("parity") === "1"))
      assert(pruned.count() == 3L)
      assert(pruned.inputFiles.length <
        DeltaLog.readTable(spark, scheme).inputFiles.length)
      // checkpoint-seeded read through the scheme
      DeltaWrite.writeCheckpoint(spark, local)
      assert(rowsOf(DeltaLog.readTable(spark, scheme)) == rowsOf(docs))
    }
  }

  test("delta writer: append/overwrite/compact/checkpoint AT a scheme URI") {
    withMockFs {
      val local = java.nio.file.Files.createTempDirectory("graft-mockdw")
        .toFile.getAbsolutePath
      val scheme = s"graftmock:$local"
      // both commits written AT the scheme path (stage dir, renames,
      // stats aggregation, exclusive publish — all through the seam)
      DeltaWrite.append(spark, docs.where(col("parity") === "0"), scheme, Seq("parity"))
      DeltaWrite.append(spark, docs.where(col("parity") === "1"), scheme, Seq("parity"))
      assert(rowsOf(DeltaLog.readTable(spark, scheme)) == rowsOf(docs))
      // the same table resolves through the plain local path too
      assert(rowsOf(DeltaLog.readTable(spark, local)) == rowsOf(docs))
      // dynamic overwrite at the scheme path
      DeltaWrite.overwrite(spark,
        docs.where(col("parity") === "1").withColumn("n_chars", col("n_chars") + 7L),
        scheme, Seq("parity"), dynamic = true)
      assert(DeltaLog.readTable(spark, scheme)
        .where(col("parity") === "1").agg(sum("n_chars")).head().getLong(0) ==
        docs.where(col("parity") === "1")
          .agg(sum(col("n_chars") + 7L)).head().getLong(0))
      // compact + checkpoint at the scheme path; the read stays exact
      assert(DeltaWrite.compact(spark, scheme).nonEmpty)
      DeltaWrite.writeCheckpoint(spark, scheme)
      assert(DeltaLog.readTable(spark, scheme).count() == 6L)
      // no stage debris left behind
      assert(!TableIo.list(scheme).exists(_.name.startsWith(".graft-stage-")))
    }
  }

  test("iceberg writer: partitioned append AT a scheme URI") {
    withMockFs {
      val local = java.nio.file.Files.createTempDirectory("graft-mockiw")
        .toFile.getAbsolutePath
      val scheme = s"graftmock:$local"
      IcebergWrite.append(spark, docs.where(col("parity") === "0"), scheme,
        partitionBy = Seq("parity"))
      IcebergWrite.append(spark, docs.where(col("parity") === "1"), scheme,
        partitionBy = Seq("parity"))
      assert(rowsOf(Iceberg.readTable(spark, scheme)) == rowsOf(docs))
      // location remap: the same table reads through the local path
      assert(rowsOf(Iceberg.readTable(spark, local)) == rowsOf(docs))
      // partition pruning engages on the scheme-written table
      val pruned = Iceberg.readTable(spark, scheme, None,
        Some(col("parity") === "1"))
      assert(pruned.count() == 3L)
      assert(!TableIo.list(scheme).exists(_.name.startsWith(".graft-stage-")))
    }
  }

  test("iceberg: read, travel, incremental scan via the scheme") {
    withMockFs {
      val local = java.nio.file.Files.createTempDirectory("graft-mockib")
        .toFile.getAbsolutePath
      IcebergWrite.append(spark, docs.where(col("parity") === "0"), local)
      IcebergWrite.append(spark, docs.where(col("parity") === "1"), local)
      val scheme = s"graftmock:$local"
      assert(rowsOf(Iceberg.readTable(spark, scheme)) ==
        rowsOf(Iceberg.readTable(spark, local)))
      assert(Iceberg.readTable(spark, scheme, Some(1L)).count() == 3L)
      assert(Iceberg.readAppendsBetween(spark, scheme, 1L, None)
        .select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 5L))
    }
  }
}
