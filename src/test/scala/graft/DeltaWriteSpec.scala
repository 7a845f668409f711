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
    assert(e5.getMessage.contains("cannot write"))
  }

  test("partitioned append keys stats per FILE, not per basename (round 18)") {
    val dir = freshDir()
    // ONE task writes both partition dirs, so Spark reuses the same
    // part name under each — the r17 basename keying collapsed these
    // and attached one file's stats to both adds. Disjoint id ranges
    // per partition make wrong attribution visible as lost rows.
    val data = Seq((5L, "a"), (20L, "a"), (30L, "a"),
      (40L, "b"), (70L, "b"), (90L, "b")).toDF("id", "p").repartition(1)
    DeltaWrite.append(spark, data, dir, Seq("p"))
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val v0 = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "_delta_log/00000000000000000000.json").toPath), "UTF-8")
    val statsOfAdds = v0.split("\n").toSeq.flatMap { line =>
      JsonMethods.parse(line) \ "add" match {
        case a: JObject => a \ "stats" match {
          case JString(s) => Some(s); case _ => None }
        case _ => None
      }
    }
    assert(statsOfAdds.length == 2 && statsOfAdds.distinct.length == 2)
    // and the skipper opens exactly the matching file, losing no rows
    val hi = DeltaLog.readTable(spark, dir, None, Some(col("id") >= 40L))
    assert(hi.inputFiles.length == 1)
    assert(hi.select("id").as[Long].collect().sorted.toSeq == Seq(40L, 70L, 90L))
    val lo = DeltaLog.readTable(spark, dir, None, Some(col("id") <= 30L))
    assert(lo.inputFiles.length == 1)
    assert(lo.select("id").as[Long].collect().sorted.toSeq == Seq(5L, 20L, 30L))
  }

  test("timestamp bounds (round 18): WHERE ts BETWEEN prunes own-written files") {
    val dir = freshDir()
    val data = docs.withColumn("ts",
      to_timestamp(concat(lit("2026-01-0"), col("doc_id"))))
    DeltaWrite.append(spark, data.repartitionByRange(2, col("ts")), dir)
    assert(DeltaLog.readTable(spark, dir).inputFiles.length == 2)
    val pruned = DeltaLog.readTable(spark, dir, None,
      Some(expr("ts BETWEEN TIMESTAMP '2026-01-01' AND TIMESTAMP '2026-01-02 12:00:00'")))
    assert(pruned.inputFiles.length == 1)
    assert(pruned.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    val late = DeltaLog.readTable(spark, dir, None,
      Some(col("ts") >= java.sql.Timestamp.valueOf("2026-01-07 00:00:00")))
    assert(late.inputFiles.length == 1)
    assert(late.select("doc_id").as[Long].collect().sorted.toSeq == Seq(7L, 8L))
  }

  test("cross-family literals never prune (round 18): coercion traps keep files") {
    // LIKE over a NUMERIC column: lexicographic reasoning over the
    // numeric bounds would prune the file holding 20 (lo 5 → "5" > "2")
    val dir = freshDir()
    DeltaWrite.append(spark,
      Seq((5L, "x"), (20L, "x"), (30L, "x")).toDF("n", "s").coalesce(1), dir)
    DeltaWrite.append(spark,
      Seq((40L, "x"), (70L, "x"), (90L, "x")).toDF("n", "s").coalesce(1), dir)
    val like = DeltaLog.readTable(spark, dir, None, Some(expr("n LIKE '2%'")))
    assert(like.inputFiles.length == 2) // conservative: no pruning on non-strings
    assert(like.select("n").as[Long].collect().toSeq == Seq(20L))
    // numeric literal over a STRING column: lexicographic hi "9" casts
    // to 9 < 10 — pruning would drop the matching "10" row
    val dir2 = freshDir()
    DeltaWrite.append(spark, Seq("10", "9").toDF("v").coalesce(1), dir2)
    DeltaWrite.append(spark, Seq("123").toDF("v").coalesce(1), dir2)
    val eq = DeltaLog.readTable(spark, dir2, None, Some(expr("v = 10")))
    assert(eq.inputFiles.length == 2)
    assert(eq.select("v").as[String].collect().toSeq == Seq("10"))
    // same-family WIDENING still prunes: an int literal against long
    // stats is order-preserving
    val w = DeltaLog.readTable(spark, dir, None, Some(col("n") >= 40))
    assert(w.inputFiles.length == 1)
    assert(w.select("n").as[Long].collect().sorted.toSeq == Seq(40L, 70L, 90L))
  }

  test("overwrite (round 18): dynamic replaces present partitions; CDF shows the swap") {
    val dir = freshDir()
    val d0 = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b")).toDF("id", "p")
    DeltaWrite.append(spark, d0, dir, Seq("p")) // v0
    val repl = Seq((5L, "a"), (6L, "a")).toDF("id", "p")
    assert(DeltaWrite.overwrite(spark, repl, dir, Seq("p"), dynamic = true) == 1L)
    assert(DeltaLog.readTable(spark, dir).select("id")
      .as[Long].collect().sorted.toSeq == Seq(3L, 4L, 5L, 6L))
    // time travel still sees the pre-replace state (tombstones, not deletes)
    assert(DeltaLog.readTable(spark, dir, Some(0L)).count() == 4)
    // CDF across the replace version: deletes for displaced rows,
    // inserts for the new — the synthesis the reader already had
    val ch = DeltaLog.readChanges(spark, dir, 1L, 1L)
      .select(col("id"), col("_change_type"))
      .as[(Long, String)].collect().sorted.toSeq
    assert(ch == Seq((1L, "delete"), (2L, "delete"), (5L, "insert"), (6L, "insert")))
    // full overwrite replaces EVERYTHING
    assert(DeltaWrite.overwrite(spark, d0, dir, Seq("p")) == 2L)
    assert(DeltaLog.readTable(spark, dir).select("id")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    // dynamic without partition columns refuses
    val e = intercept[GraftAnalysisException] {
      DeltaWrite.overwrite(spark, d0, freshDir(), Seq.empty, dynamic = true)
    }
    assert(e.getMessage.contains("dynamic partition overwrite"))
  }

  test("compact (round 18): fewer files, same rows, CDF-invisible, checkpointable") {
    val dir = freshDir()
    (1 to 4).foreach(i => DeltaWrite.append(spark,
      Seq((i.toLong, "x")).toDF("id", "s").coalesce(1), dir))
    assert(DeltaLog.readTable(spark, dir).inputFiles.length == 4)
    assert(DeltaWrite.compact(spark, dir) == Some(4L))
    val after = DeltaLog.readTable(spark, dir)
    assert(after.inputFiles.length == 1)
    assert(after.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    // dataChange=false: the change feed across the compaction is EMPTY
    assert(DeltaLog.readChanges(spark, dir, 4L, 4L).count() == 0)
    // time travel to the pre-compaction version still reads old files
    assert(DeltaLog.readTable(spark, dir, Some(3L)).count() == 4)
    // idempotent: nothing left to compact
    assert(DeltaWrite.compact(spark, dir) == None)
    // a checkpoint after compaction carries the remove TOMBSTONES —
    // vacuum the JSON prefix and the read still resolves correctly
    assert(DeltaWrite.writeCheckpoint(spark, dir) == 4L)
    (0 to 4).foreach(i => new java.io.File(dir, f"_delta_log/$i%020d.json").delete())
    assert(DeltaLog.readTable(spark, dir).select("id")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("vacuum (round 18): reclaims tombstoned files, never active ones") {
    val dir = freshDir()
    val data = docs.withColumn("parity", (col("doc_id") % 2).cast("string"))
    DeltaWrite.append(spark, data, dir, Seq("parity"))
    DeltaWrite.overwrite(spark,
      data.where(col("parity") === "1").withColumn("n_chars", col("n_chars") + 100L),
      dir, Seq("parity"), dynamic = true)
    def parquetCount: Int = graft.ops.TableIo.walkRel(dir)
      .count(r => r.endsWith(".parquet") && !r.startsWith("_delta_log/"))
    val before = parquetCount
    // default retention (7 days): tombstones are too fresh to delete
    assert(DeltaWrite.vacuum(spark, dir).isEmpty)
    assert(parquetCount == before)
    // retention 0: exactly the displaced odd-partition files go
    val deleted = DeltaWrite.vacuum(spark, dir, retentionMillis = 0L)
    assert(deleted.nonEmpty && deleted.forall(_.startsWith("parity=1/")))
    assert(parquetCount == before - deleted.size)
    // the current read is untouched
    assert(DeltaLog.readTable(spark, dir).count() == 8)
    assert(DeltaLog.readTable(spark, dir).where(col("parity") === "1")
      .select("n_chars").as[Long].collect().sorted.toSeq ==
      docs.where(col("doc_id") % 2 === 1)
        .select(col("n_chars") + 100L).as[Long].collect().sorted.toSeq)
    // time travel to v0 now fails at scan (the protocol's trade)
    intercept[Exception] {
      DeltaLog.readTable(spark, dir, Some(0L)).count()
    }
    // idempotent: nothing left to reclaim
    assert(DeltaWrite.vacuum(spark, dir, retentionMillis = 0L).isEmpty)
  }

  test("restore (round 18): rollback is a new commit; CDF shows the swap") {
    val dir = freshDir()
    val data = docs.withColumn("parity", (col("doc_id") % 2).cast("string"))
    DeltaWrite.append(spark, data, dir, Seq("parity")) // v0
    DeltaWrite.overwrite(spark,
      data.where(col("parity") === "1").withColumn("n_chars", col("n_chars") + 100L),
      dir, Seq("parity"), dynamic = true) // v1
    assert(DeltaWrite.restore(spark, dir, 0L) == 2L)
    // the table reads as v0 again
    assert(DeltaLog.readTable(spark, dir)
      .select("doc_id", "n_chars").as[(Long, Long)].collect().sorted.toSeq ==
      docs.select("doc_id", "n_chars").as[(Long, Long)].collect().sorted.toSeq)
    // the restore version's change feed: modified odds out, originals in
    val ch = DeltaLog.readChanges(spark, dir, 2L, 2L)
    assert(ch.where(col("_change_type") === "delete").count() == 4)
    assert(ch.where(col("_change_type") === "insert").count() == 4)
    // restoring to the state the table is already at commits nothing
    assert(DeltaWrite.restore(spark, dir, 2L) == 2L)
    assert(DeltaWrite.restore(spark, dir, 0L) == 2L) // same files as v0
    // in-between travel still works (history preserved)
    assert(DeltaLog.readTable(spark, dir, Some(1L))
      .where(col("parity") === "1").select("n_chars")
      .as[Long].collect().forall(_ > 100L))
    // a vacuumed target refuses by name
    DeltaWrite.vacuum(spark, dir, retentionMillis = 0L) // drops v1's odd files
    val e = intercept[graft.GraftAnalysisException] {
      DeltaWrite.restore(spark, dir, 1L)
    }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("z-order compaction (round 18): ANY named column prunes after the rewrite") {
    val dir = freshDir()
    // an independent 2-D grid: linear clustering on x can never
    // tighten y's per-file bounds; the z-curve tightens both
    val grid = spark.range(256).select(col("id"),
      (col("id") % 16).as("x"), (col("id") / 16).cast("long").as("y"))
    (0 to 3).foreach(k => DeltaWrite.append(spark,
      grid.where(col("id") % 4 === k).coalesce(1), dir))
    // before: every file spans all of x and y — nothing prunes
    val preX = DeltaLog.readTable(spark, dir, None, Some(col("x") < 4))
    assert(preX.inputFiles.length == 4)
    // target ≈ quarter of the data → ~4 z-range files (the quadrant
    // granularity the assertions below reason about)
    val total = graft.ops.TableIo.walkRel(dir)
      .filter(r => r.endsWith(".parquet") && !r.startsWith("_delta_log/"))
      .map(r => graft.ops.TableIo.size(s"$dir/$r")).sum
    val v = DeltaWrite.compact(spark, dir, targetBytes = math.max(total / 4, 1L),
      zOrderBy = Seq("x", "y"))
    assert(v.nonEmpty)
    val nAll = DeltaLog.readTable(spark, dir).inputFiles.length
    assert(nAll >= 3)
    // the non-leading dimension prunes now (the top z bit is y's: the
    // last z chunk lives entirely in y's upper half)
    val py = DeltaLog.readTable(spark, dir, None, Some(col("y") < 4))
    assert(py.inputFiles.length < nAll)
    // the z-curve's signature win — a corner query touches ~one chunk
    val corner = DeltaLog.readTable(spark, dir, None,
      Some(col("x") < 2 && col("y") < 2))
    assert(corner.inputFiles.length <= nAll - 2)
    assert(py.count() == 64 && corner.count() == 4)
    assert(DeltaLog.readTable(spark, dir).count() == 256)
    // still CDF-invisible (dataChange=false rewrite)
    assert(DeltaLog.readChanges(spark, dir, v.get, v.get).count() == 0)
    // z-order refusal ladder
    intercept[graft.GraftAnalysisException] {
      DeltaWrite.compact(spark, dir, zOrderBy = Seq("nope"))
    }
  }

  test("merge (round 18): upsert by key, file-targeted rewrite") {
    val dir = freshDir()
    // four files, one per quartile of doc_id — the merge source
    // touches only quartile 2's keys, so only THAT file may rewrite
    (0 to 3).foreach(q => DeltaWrite.append(spark,
      docs.where(col("doc_id") % 4 === q).coalesce(1), dir))
    val source = docs.where(col("doc_id") % 4 === 2) // ids 2, 6: update
      .withColumn("n_chars", col("n_chars") + 500L)
      .unionByName(Seq((100L, "new", 999L), (101L, "new", 998L))
        .toDF("doc_id", "source", "n_chars")) // insert
    val v = DeltaWrite.merge(spark, source, dir, Seq("doc_id"))
    assert(v == 4L)
    val out = DeltaLog.readTable(spark, dir)
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    assert(out.size == 10)
    assert(out(2L) == docs.where(col("doc_id") === 2)
      .select("n_chars").as[Long].head() + 500L)
    assert(out(100L) == 999L && out(101L) == 998L)
    assert(out(1L) == docs.where(col("doc_id") === 1)
      .select("n_chars").as[Long].head()) // untouched
    // file-targeting: the three unmatched quartile files SURVIVE in
    // the active set (their add actions were never tombstoned)
    val ch = DeltaLog.readChanges(spark, dir, 4L, 4L)
    assert(ch.where(col("_change_type") === "delete").count() == 2) // the rewritten file's rows
    assert(ch.where(col("_change_type") === "insert").count() == 4) // kept 0 + upserts 2 + new 2
    // refusal ladder: duplicate source keys, unknown key, partitioned
    intercept[graft.GraftAnalysisException] {
      DeltaWrite.merge(spark, source.unionByName(source), dir, Seq("doc_id"))
    }
    intercept[graft.GraftAnalysisException] {
      DeltaWrite.merge(spark, source, dir, Seq("nope"))
    }
    val pdir = freshDir()
    DeltaWrite.append(spark,
      docs.withColumn("parity", (col("doc_id") % 2).cast("string")),
      pdir, Seq("parity"))
    intercept[graft.GraftAnalysisException] {
      DeltaWrite.merge(spark,
        docs.withColumn("parity", (col("doc_id") % 2).cast("string")),
        pdir, Seq("doc_id"))
    }
    // insert-only merge (no matches): zero removes, pure append
    val v2 = DeltaWrite.merge(spark,
      Seq((200L, "new", 1L)).toDF("doc_id", "source", "n_chars"), dir, Seq("doc_id"))
    assert(v2 == 5L)
    assert(DeltaLog.readChanges(spark, dir, 5L, 5L)
      .where(col("_change_type") === "delete").count() == 0)
    assert(DeltaLog.readTable(spark, dir).count() == 11)
  }

  test("schema evolution (round 18): mergeSchema adds columns; old files null-fill") {
    val dir = freshDir()
    val v0 = docs.select("doc_id", "source") // narrow generation
    DeltaWrite.append(spark, v0.where(col("doc_id") % 2 === 0), dir)
    // widening append without the flag refuses
    val e = intercept[graft.GraftAnalysisException] {
      DeltaWrite.append(spark, docs.where(col("doc_id") % 2 === 1), dir)
    }
    assert(e.getMessage.contains("mergeSchema"))
    DeltaWrite.append(spark, docs.where(col("doc_id") % 2 === 1), dir,
      mergeSchema = true)
    val out = DeltaLog.readTable(spark, dir)
    // the AUTHORITATIVE schema is the merged one, and the
    // pre-evolution files' rows null-fill the new column — the
    // multi-path-footer-pinning trap this order exposes: the narrow
    // generation sorts FIRST in the scan path list
    assert(out.columns.toSet == Set("doc_id", "source", "n_chars"))
    assert(out.where(col("n_chars").isNull).select("doc_id")
      .as[Long].collect().sorted.toSeq == Seq(2L, 4L, 6L, 8L))
    assert(out.where(col("n_chars").isNotNull).count() == 4)
    // stats skipping still engages on the evolved column (bounds
    // exist only for the new generation; old files keep conservatively)
    val pruned = DeltaLog.readTable(spark, dir, None, Some(col("n_chars") > 0L))
    assert(pruned.count() == 4)
    // time travel to the narrow version serves the narrow schema
    assert(DeltaLog.readTable(spark, dir, Some(0L)).columns.toSet ==
      Set("doc_id", "source"))
    // a checkpoint freezes the merged schema; the read survives
    DeltaWrite.writeCheckpoint(spark, dir)
    assert(DeltaLog.readTable(spark, dir).where(col("n_chars").isNull).count() == 4)
    // refusal ladder: retype and drop
    intercept[graft.GraftAnalysisException] {
      DeltaWrite.append(spark,
        docs.withColumn("n_chars", col("n_chars").cast("string")), dir,
        mergeSchema = true)
    }
    intercept[graft.GraftAnalysisException] {
      DeltaWrite.append(spark, docs.select("doc_id", "n_chars"), dir,
        mergeSchema = true)
    }
  }

  test("txn idempotence (round 18): a replayed epoch is a no-op") {
    val dir = freshDir()
    assert(DeltaWrite.append(spark, docs, dir, Seq.empty, Some(("app", 0L))) == 0L)
    assert(DeltaLog.readTable(spark, dir).count() == 8)
    // replay of the same (appId, version): no new commit, no new rows
    assert(DeltaWrite.append(spark, docs, dir, Seq.empty, Some(("app", 0L))) == 0L)
    assert(DeltaLog.readTable(spark, dir).count() == 8)
    // the next epoch commits
    assert(DeltaWrite.append(spark, docs, dir, Seq.empty, Some(("app", 1L))) == 1L)
    assert(DeltaLog.readTable(spark, dir).count() == 16)
    // a DIFFERENT app's epoch 0 is not deduped
    assert(DeltaWrite.append(spark, docs, dir, Seq.empty, Some(("other", 0L))) == 2L)
    assert(DeltaLog.readTable(spark, dir).count() == 24)
  }

  test("checkpoint carries the real protocol and full metaData (round 18)") {
    val dir = freshDir()
    DeltaWrite.append(spark, docs, dir)
    DeltaWrite.writeCheckpoint(spark, dir)
    val cp = spark.read.parquet(
      dir + "/_delta_log/00000000000000000000.checkpoint.parquet")
    assert(cp.where(col("protocol").isNotNull)
      .select(col("protocol.minReaderVersion"), col("protocol.minWriterVersion"))
      .as[(Long, Long)].collect().toSeq == Seq((1L, 2L)))
    assert(cp.where(col("metaData").isNotNull)
      .select(col("metaData.format.provider")).as[String].collect().toSeq ==
      Seq("parquet"))
    // a table demanding writer version > 2 refuses instead of freezing
    // a downgraded protocol row
    val cmDir = graft.ops.TableFixtures.writeDeltaCmTable(spark, docs, "doc_id")
    val e = intercept[GraftAnalysisException] { DeltaWrite.writeCheckpoint(spark, cmDir) }
    assert(e.getMessage.contains("writer version"))
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

  test("delta sink modes + txn (round 18): spec-surface overwrite and idempotence") {
    val dir = freshDir() + "/tbl"
    val data = docs.withColumn("parity", (col("doc_id") % 2).cast("string"))
    def sink(cfg: graft.spec.Config, df: org.apache.spark.sql.DataFrame = data) =
      graft.sinks.SinkWriter.write(df, graft.spec.SinkSpec("out", "delta", cfg))
    sink(graft.spec.Config.of("path" -> dir, "partition_by" -> Seq("parity")))
    // whole-table overwrite via the spec
    sink(graft.spec.Config.of("path" -> dir, "partition_by" -> Seq("parity"),
      "mode" -> "overwrite"), data.where(col("parity") === "0"))
    assert(DeltaLog.readTable(spark, dir).count() == 4)
    // dynamic: only the present partition replaces
    sink(graft.spec.Config.of("path" -> dir, "partition_by" -> Seq("parity"),
      "mode" -> "overwrite_dynamic"),
      data.where(col("parity") === "0").withColumn("n_chars", col("n_chars") + 5L))
    assert(DeltaLog.readTable(spark, dir).agg(sum("n_chars")).head().getLong(0) ==
      docs.where(col("doc_id") % 2 === 0)
        .agg(sum(col("n_chars") + 5L)).head().getLong(0))
    // txn idempotence through the spec: the replayed epoch is a no-op
    sink(graft.spec.Config.of("path" -> dir, "partition_by" -> Seq("parity"),
      "txn_app" -> "etl", "txn_version" -> 7))
    val n = DeltaLog.readTable(spark, dir).count()
    sink(graft.spec.Config.of("path" -> dir, "partition_by" -> Seq("parity"),
      "txn_app" -> "etl", "txn_version" -> 7))
    assert(DeltaLog.readTable(spark, dir).count() == n)
    // refusal ladder: half a txn marker, txn on overwrite, unknown mode
    intercept[graft.GraftAnalysisException] {
      sink(graft.spec.Config.of("path" -> dir, "txn_app" -> "etl"))
    }
    intercept[graft.GraftAnalysisException] {
      sink(graft.spec.Config.of("path" -> dir, "mode" -> "overwrite",
        "txn_app" -> "etl", "txn_version" -> 8))
    }
    intercept[graft.GraftAnalysisException] {
      sink(graft.spec.Config.of("path" -> dir, "mode" -> "replace"))
    }
  }
}
