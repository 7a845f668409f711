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

  test("field ids carry forward from the prior schema (round 18)") {
    val dir = freshDir()
    IcebergWrite.append(spark, docs, dir)
    // simulate an externally-evolved table whose ids are NOT
    // positional: rewrite the schema's field ids 1,2,3 → 11,12,13
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val metaFile = new java.io.File(dir, "metadata/v1.metadata.json")
    val jv = JsonMethods.parse(new String(
      java.nio.file.Files.readAllBytes(metaFile.toPath), "UTF-8"))
    val rewritten = jv.transformField {
      case ("id", JInt(i)) if i >= 1 && i <= 3 => "id" -> JInt(i + 10)
    }
    java.nio.file.Files.write(metaFile.toPath,
      JsonMethods.pretty(JsonMethods.render(rewritten)).getBytes("UTF-8"))
    IcebergWrite.append(spark, docs, dir)
    val m2 = JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "metadata/v2.metadata.json").toPath), "UTF-8"))
    val ids = for {
      JArray(schemas) <- Seq(m2 \ "schemas"); s <- schemas
      JArray(fs) <- Seq(s \ "fields"); f <- fs; JInt(i) <- Seq(f \ "id")
    } yield i.toInt
    assert(ids.sorted == Seq(11, 12, 13))
    // the NEW manifest's bound keys resolve through the carried ids
    val entries = Iceberg.manifestEntries(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "metadata/m-00002.avro").toPath)).get
    assert(entries.flatMap(_.lowerBounds.keys).toSet.subsetOf(Set(11, 12, 13)))
    assert(entries.flatMap(_.lowerBounds.keys).nonEmpty)
    // and the read (with bounds pruning) still resolves correctly
    val pruned = Iceberg.readTable(spark, dir, None, Some(col("doc_id") <= 2L))
    assert(pruned.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 1L, 2L, 2L))
    // a prior schema with REQUIRED fields refuses (this writer cannot
    // prove incoming data satisfies the invariant)
    val reqDir = freshDir()
    IcebergWrite.append(spark, docs, reqDir)
    val reqFile = new java.io.File(reqDir, "metadata/v1.metadata.json")
    val reqJv = JsonMethods.parse(new String(
      java.nio.file.Files.readAllBytes(reqFile.toPath), "UTF-8")).transformField {
      case ("required", JBool(false)) => "required" -> JBool(true)
    }
    java.nio.file.Files.write(reqFile.toPath,
      JsonMethods.pretty(JsonMethods.render(reqJv)).getBytes("UTF-8"))
    val e = intercept[GraftAnalysisException] { IcebergWrite.append(spark, docs, reqDir) }
    assert(e.getMessage.contains("required"))
  }

  test("identity-partitioned write (round 18): tuples prune own-written tables") {
    val dir = freshDir()
    IcebergWrite.append(spark, docs, dir, partitionBy = Seq("source"))
    val all = Iceberg.readTable(spark, dir)
    assert(all.count() == 8)
    // partition columns stay IN the data files (Iceberg, not Hive)
    assert(all.select("source").as[String].collect().toSet == Set("web", "book"))
    val web = Iceberg.readTable(spark, dir, None, Some(col("source") === "web"))
    assert(web.inputFiles.length < all.inputFiles.length)
    assert(web.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 4L, 6L, 8L))
    // a second partitioned append carries the spec forward
    val more = Seq((9L, "web", 90L)).toDF("doc_id", "source", "n_chars")
    IcebergWrite.append(spark, more, dir, partitionBy = Seq("source"))
    val book = Iceberg.readTable(spark, dir, None, Some(col("source") === "book"))
    assert(book.select("doc_id").as[Long].collect().sorted.toSeq == Seq(3L, 5L, 7L))
    // compose: partition tuple + column bounds in one predicate
    val both = Iceberg.readTable(spark, dir, None,
      Some(col("source") === "web" && col("doc_id") >= 9L))
    assert(both.select("doc_id").as[Long].collect().toSeq == Seq(9L))
    // spec-mismatch refusals, both directions
    val e1 = intercept[GraftAnalysisException] {
      IcebergWrite.append(spark, more, dir) // unpartitioned into partitioned
    }
    assert(e1.getMessage.contains("partition spec mismatch"))
    val unpart = freshDir()
    IcebergWrite.append(spark, docs, unpart)
    val e2 = intercept[GraftAnalysisException] {
      IcebergWrite.append(spark, docs, unpart, partitionBy = Seq("source"))
    }
    assert(e2.getMessage.contains("partition spec mismatch"))
    // v1 partition-type gate refuses by name
    val e3 = intercept[GraftAnalysisException] {
      IcebergWrite.append(spark,
        docs.withColumn("d", to_date(lit("2026-01-01"))), freshDir(),
        partitionBy = Seq("d"))
    }
    assert(e3.getMessage.contains("identity partitioning"))
  }

  test("null partition values (round 18): absent tuple keys keep the file") {
    val dir = freshDir()
    val data = Seq((1L, "a"), (2L, null.asInstanceOf[String]), (3L, "b"))
      .toDF("id", "k")
    IcebergWrite.append(spark, data, dir, partitionBy = Seq("k"))
    val back = Iceberg.readTable(spark, dir).select("id", "k")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(back == Seq((1L, "a"), (2L, null), (3L, "b")))
    val a = Iceberg.readTable(spark, dir, None, Some(col("k") === "a"))
    assert(a.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("timestamp bounds (round 18): ts predicates skip own-written files") {
    val dir = freshDir()
    val data = docs.withColumn("ts",
      to_timestamp(concat(lit("2026-01-0"), col("doc_id"))))
    IcebergWrite.append(spark, data, dir, clusterBy = Seq("ts"), numFiles = 2)
    assert(Iceberg.readTable(spark, dir).inputFiles.length == 2)
    val pruned = Iceberg.readTable(spark, dir, None,
      Some(expr("ts BETWEEN TIMESTAMP '2026-01-01' AND TIMESTAMP '2026-01-02 12:00:00'")))
    assert(pruned.inputFiles.length == 1)
    assert(pruned.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("incremental scan composes with the pruning ladder (round 18)") {
    val dir = freshDir()
    IcebergWrite.append(spark, docs.where(col("doc_id") <= 4),
      dir, clusterBy = Seq("doc_id"), numFiles = 2)
    IcebergWrite.append(spark, docs.where(col("doc_id") > 4),
      dir, clusterBy = Seq("doc_id"), numFiles = 2)
    // the 1→2 diff adds two files; the predicate opens only one
    val incr = Iceberg.readAppendsBetween(spark, dir, 1L, Some(2L),
      Some(col("doc_id") >= 7L))
    assert(incr.inputFiles.length == 1)
    assert(incr.select("doc_id").as[Long].collect().sorted.toSeq == Seq(7L, 8L))
    // and the predicate is ROW-applied, not just file-applied
    val incr2 = Iceberg.readAppendsBetween(spark, dir, 1L, Some(2L),
      Some(col("doc_id") === 5L))
    assert(incr2.select("doc_id").as[Long].collect().toSeq == Seq(5L))
  }

  test("schema evolution (round 18): mergeSchema adds columns with fresh field ids") {
    val dir = freshDir()
    IcebergWrite.append(spark,
      docs.where(col("doc_id") % 2 === 0).select("doc_id", "source"), dir)
    // widening append without the flag refuses
    val e = intercept[graft.GraftAnalysisException] {
      IcebergWrite.append(spark, docs.where(col("doc_id") % 2 === 1), dir)
    }
    assert(e.getMessage.contains("mergeSchema"))
    IcebergWrite.append(spark, docs.where(col("doc_id") % 2 === 1), dir,
      mergeSchema = true)
    val out = Iceberg.readTable(spark, dir)
    assert(out.columns.toSet == Set("doc_id", "source", "n_chars"))
    assert(out.where(col("n_chars").isNull).select("doc_id")
      .as[Long].collect().sorted.toSeq == Seq(2L, 4L, 6L, 8L))
    assert(out.where(col("n_chars").isNotNull).count() == 4)
    // the metadata carries BOTH schema generations; the new column's
    // field id is fresh (above every prior id), old ids untouched
    val metaJson = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "metadata/v2.metadata.json").toPath), "UTF-8")
    val jv = org.json4s.jackson.JsonMethods.parse(metaJson)
    import org.json4s._
    val schemas = jv \ "schemas" match { case JArray(xs) => xs; case _ => Nil }
    assert(schemas.size == 2)
    val curId = jv \ "current-schema-id" match { case JInt(v) => v.toInt; case _ => -1 }
    val cur = schemas.find(s => (s \ "schema-id") == JInt(curId)).get
    val ids = (cur \ "fields" match { case JArray(fs) => fs; case _ => Nil })
      .map(f => ((f \ "name"), (f \ "id"))).collect {
        case (JString(n), JInt(i)) => n -> i.toInt }.toMap
    assert(ids("doc_id") == 1 && ids("source") == 2 && ids("n_chars") == 3)
    // a post-evolution plain append matches the evolved schema
    IcebergWrite.append(spark, docs.limit(2), dir)
    assert(Iceberg.readTable(spark, dir).count() == 10)
    // refusal ladder: retype and drop
    intercept[graft.GraftAnalysisException] {
      IcebergWrite.append(spark,
        docs.withColumn("n_chars", col("n_chars").cast("string")), dir,
        mergeSchema = true)
    }
    intercept[graft.GraftAnalysisException] {
      IcebergWrite.append(spark, docs.select("doc_id", "n_chars"), dir,
        mergeSchema = true)
    }
  }

  test("txn idempotence (round 18): a replayed epoch is a snapshot-summary no-op") {
    val dir = freshDir()
    assert(IcebergWrite.append(spark, docs, dir, txn = Some(("app", 0L))) == 1L)
    assert(Iceberg.readTable(spark, dir).count() == 8)
    // replay of the same (appId, epoch): no new snapshot, no new rows
    assert(IcebergWrite.append(spark, docs, dir, txn = Some(("app", 0L))) == 1L)
    assert(Iceberg.readTable(spark, dir).count() == 8)
    // the next epoch commits a new snapshot
    assert(IcebergWrite.append(spark, docs, dir, txn = Some(("app", 1L))) == 2L)
    assert(Iceberg.readTable(spark, dir).count() == 16)
    // a different app's epoch 0 is not deduped
    assert(IcebergWrite.append(spark, docs, dir, txn = Some(("other", 0L))) == 3L)
    assert(Iceberg.readTable(spark, dir).count() == 24)
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

  test("iceberg sink partition_by + txn (round 18): spec-surface parity") {
    val dir = freshDir() + "/tbl"
    val data = docs.withColumn("bucket", (col("doc_id") % 2))
    def sink(cfg: graft.spec.Config) =
      graft.sinks.SinkWriter.write(data, graft.spec.SinkSpec("out", "iceberg", cfg))
    sink(graft.spec.Config.of("path" -> dir, "partition_by" -> Seq("bucket"),
      "txn_app" -> "etl", "txn_version" -> 3))
    assert(Iceberg.readTable(spark, dir).count() == 8)
    // the replayed epoch is a no-op through the spec surface too
    sink(graft.spec.Config.of("path" -> dir, "partition_by" -> Seq("bucket"),
      "txn_app" -> "etl", "txn_version" -> 3))
    assert(Iceberg.readTable(spark, dir).count() == 8)
    // tuple pruning engages on the sink-written table
    val pruned = Iceberg.readTable(spark, dir, None, Some(col("bucket") === 1L))
    assert(pruned.count() == 4)
    assert(pruned.inputFiles.length < Iceberg.readTable(spark, dir).inputFiles.length)
  }
}
