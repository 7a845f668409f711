package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.DeltaLog

/** Delta transaction-log replay: the distributed (version, line)
  * replay semantics, checkpoint seeding, and the single-scan
  * readTable contract — including checkpoint-vs-full-replay equality
  * on the same logical log, the multi-part checkpoint layout, and the
  * protocol/refusal ladder. */
class DeltaLogSpec extends SparkSuite {
  import spark.implicits._

  private def commitsDf(rows: (Long, String)*): DataFrame =
    rows.toDF("version", "content")

  private def active(rows: (Long, String)*): Map[String, (Long, Long, Int, String, Boolean)] =
    DeltaLog.activeFiles(commitsDf(rows: _*), "version", "content")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3),
        r.getString(4), r.getBoolean(5))))
      .toMap

  private val meta = """{"metaData":{"id":"t","schemaString":"{}","partitionColumns":["p"]}}"""
  private val proto = """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""

  test("distributed replay: add, remove, resurrect, last-add-wins, percent-decode") {
    val out = active(
      0L -> (meta + "\n" + proto + "\n" +
        """{"add":{"path":"a.parquet","partitionValues":{"p":"x"},"size":10,"modificationTime":1,"stats":"{\"numRecords\":3}"}}""" + "\n" +
        """{"add":{"path":"b%2Dq.parquet","partitionValues":{},"size":20,"modificationTime":2}}"""),
      1L -> """{"remove":{"path":"a.parquet","deletionTimestamp":9}}""",
      2L -> ("""{"add":{"path":"a.parquet","partitionValues":{"p":"y"},"size":11,"modificationTime":3}}""" + "\n" +
        """{"commitInfo":{"operation":"WRITE"}}"""))
    assert(out == Map(
      "a.parquet" -> ((11L, 3L, 1, "p=y", false)), // resurrected: the re-add wins
      "b-q.parquet" -> ((20L, 2L, 0, "", false)))) // %2D decoded; empty partitionValues
  }

  test("same-commit ordering: a remove after an add in one commit deletes; reverse resurrects") {
    val sameLineOrder = active(0L -> (meta + "\n" +
      """{"add":{"path":"f.parquet","partitionValues":{},"size":1,"modificationTime":0}}""" + "\n" +
      """{"remove":{"path":"f.parquet"}}"""))
    assert(sameLineOrder.isEmpty)
    val reverse = active(0L -> (meta + "\n" +
      """{"remove":{"path":"f.parquet"}}""" + "\n" +
      """{"add":{"path":"f.parquet","partitionValues":{},"size":2,"modificationTime":0}}"""))
    assert(reverse.keySet == Set("f.parquet"))
  }

  test("refusal ladder: malformed line, unsupported protocol, add missing size, no metaData → empty") {
    val good = """{"add":{"path":"f.parquet","partitionValues":{},"size":1,"modificationTime":0}}"""
    assert(active(0L -> (meta + "\n" + good + "\nnot json at all")).isEmpty)
    // v3+ (table features): refused
    assert(active(0L -> (meta + "\n" +
      """{"protocol":{"minReaderVersion":3}}""" + "\n" + good)).isEmpty)
    assert(active(0L -> (meta + "\n" + """{"add":{"path":"f.parquet"}}""")).isEmpty)
    assert(active(0L -> good).isEmpty) // no metaData anywhere
    assert(active(0L -> (meta + "\n" + good)).nonEmpty) // control
  }

  test("reader version 2: name and id column mapping read, unknown modes refuse (final metadata wins)") {
    val good = """{"add":{"path":"f.parquet","partitionValues":{},"size":1,"modificationTime":0}}"""
    val v2 = """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}"""
    val metaName = """{"metaData":{"id":"t","schemaString":"{}","partitionColumns":[],""" +
      """"configuration":{"delta.columnMapping.mode":"name"}}}"""
    val metaId = """{"metaData":{"id":"t","schemaString":"{}","partitionColumns":[],""" +
      """"configuration":{"delta.columnMapping.mode":"id"}}}"""
    val metaWeird = """{"metaData":{"id":"t","schemaString":"{}","partitionColumns":[],""" +
      """"configuration":{"delta.columnMapping.mode":"hash"}}}"""
    val metaNone = """{"metaData":{"id":"t","schemaString":"{}","partitionColumns":[],""" +
      """"configuration":{"delta.columnMapping.mode":"none","other":"x"}}}"""
    // v2, no mapping config at all: classically laid out → reads
    assert(active(0L -> (meta + "\n" + v2 + "\n" + good)).nonEmpty)
    // v2 with mode explicitly none → reads
    assert(active(0L -> (metaNone + "\n" + v2 + "\n" + good)).nonEmpty)
    // name mode: physical names map back to logical at the scan → reads
    assert(active(0L -> (metaName + "\n" + v2 + "\n" + good)).nonEmpty)
    // id mode: parquet-field-id resolution (round 15) → reads
    assert(active(0L -> (metaId + "\n" + v2 + "\n" + good)).nonEmpty)
    // an unknown future mode refuses
    assert(active(0L -> (metaWeird + "\n" + v2 + "\n" + good)).isEmpty)
    // the FINAL metadata decides: unknown then replaced by none → reads
    assert(active(
      0L -> (metaWeird + "\n" + v2 + "\n" + good),
      1L -> metaNone).nonEmpty)
    // and the reverse: upgraded into the unknown mapping later → refuse
    assert(active(
      0L -> (meta + "\n" + v2 + "\n" + good),
      1L -> metaWeird).isEmpty)
    // the named refusal reaches the driver-side surface
    assert(DeltaLog.snapshotOfE(Seq(
      0L -> (metaWeird + "\n" + v2 + "\n" + good))).left.exists(_.contains("column mapping mode 'hash'")))
  }

  test("reader version 3: supported readerFeatures read; unknown features refuse by name") {
    val good = """{"add":{"path":"f.parquet","partitionValues":{},"size":1,"modificationTime":0}}"""
    def proto(feats: String*) =
      s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        s""""readerFeatures":[${feats.map("\"" + _ + "\"").mkString(",")}],""" +
        s""""writerFeatures":["deletionVectors"]}}"""
    assert(active(0L -> (meta + "\n" + proto("deletionVectors") + "\n" + good)).nonEmpty)
    assert(active(0L -> (meta + "\n" + proto("deletionVectors", "columnMapping") + "\n" + good)).nonEmpty)
    assert(active(0L -> (meta + "\n" + proto("timestampNtz") + "\n" + good)).nonEmpty)
    assert(active(0L -> (meta + "\n" + proto("v2Checkpoint") + "\n" + good)).nonEmpty)
    assert(active(0L -> (meta + "\n" + proto("icebergCompatV2") + "\n" + good)).isEmpty)
    // v3 without a readerFeatures list: malformed → refuse
    assert(active(0L -> (meta + "\n" + """{"protocol":{"minReaderVersion":3}}""" + "\n" + good)).isEmpty)
    // the driver-side surface names the offending feature
    assert(DeltaLog.snapshotOfE(Seq(
      0L -> (meta + "\n" + proto("typeWidening") + "\n" + good)))
      .left.exists(_.contains("typeWidening")))
  }

  test("partition_json sorts keys; null-valued entries drop") {
    val out = active(0L -> (meta + "\n" +
      """{"add":{"path":"f.parquet","partitionValues":{"z":"1","a":"2","n":null},"size":1,"modificationTime":0}}"""))
    assert(out("f.parquet") == ((1L, 0L, 2, "a=2,z=1", false)))
  }

  test("percent-decode kernel and codegen expression: UTF-8 runs, malformed escapes, '+' literal") {
    import graft.expr.{PercentDecode, PercentDecodeKernel}
    assert(PercentDecodeKernel.decode("part%2D7.parquet") == "part-7.parquet")
    assert(PercentDecodeKernel.decode("no escapes") == "no escapes")
    assert(PercentDecodeKernel.decode("caf%C3%A9/f.parquet") == "café/f.parquet") // UTF-8 run
    assert(PercentDecodeKernel.decode("a+b%20c") == "a+b c") // '+' literal, not space
    assert(PercentDecodeKernel.decode("bad%GG%2") == "bad%GG%2") // malformed: verbatim
    assert(PercentDecodeKernel.decode("tail%") == "tail%")
    // through the codegen'd expression over a real (non-local) scan
    import org.apache.spark.sql.functions.col
    val out = spark.range(3)
      .select(org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("p%41"), col("id")).as("s"))
      .select(PercentDecode(col("s")).as("d"))
    assert(out.collect().map(_.getString(0)).sorted.toSeq == Seq("pA0", "pA1", "pA2"))
    assert(out.queryExecution.executedPlan.toString.contains("*(1)"),
      "percent_decode must ride whole-stage codegen")
  }

  test("activeFiles plan shape: distributed aggregation + one-row broadcast gate, nothing driver-side") {
    val df = commitsDf(
      0L -> (meta + "\n" +
        """{"add":{"path":"a.parquet","partitionValues":{},"size":1,"modificationTime":0}}"""),
      1L -> """{"add":{"path":"b.parquet","partitionValues":{},"size":2,"modificationTime":0}}""")
      .repartition(3)
    val out = DeltaLog.activeFiles(df, "version", "content")
    // constructing the DataFrame is LAZY — the old implementation
    // collect()ed the whole log at call time; the shape now is the
    // max_by replay aggregate with the validity gate riding as a
    // broadcast nested-loop side
    val plan = out.queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "validity gate must ride as a broadcast side:\n" + plan.take(1500))
    assert("max_by".r.findAllIn(plan).nonEmpty,
      "replay must be the last-action-per-path aggregation:\n" + plan.take(1500))
    assert(out.collect().map(_.getString(0)).sorted.toSeq == Seq("a.parquet", "b.parquet"))
  }

  // --- checkpoint-seeded replay (DataFrame surface) ---

  private def cpDf(adds: Seq[(String, String, Long, Long)], tombstones: Seq[String]): DataFrame = {
    val addRows = adds.toDF("path", "p", "size", "mod")
      .select(struct(col("path"),
        map(lit("p"), col("p")).as("partitionValues"),
        col("size"), col("mod").as("modificationTime")).as("add"))
    val metaRow = spark.sql(
      "SELECT named_struct('id','t','schemaString','{}','partitionColumns',array('p')) AS metaData")
    val protoRow = spark.sql("SELECT named_struct('minReaderVersion', CAST(1 AS BIGINT)) AS protocol")
    val tombRows = tombstones.toDF("path").select(struct(col("path")).as("remove"))
    addRows.unionByName(metaRow, allowMissingColumns = true)
      .unionByName(protoRow, allowMissingColumns = true)
      .unionByName(tombRows, allowMissingColumns = true)
  }

  test("checkpoint seed: adds active, tombstones inactive, later commits replay on top, stale commits ignored") {
    val cp = cpDf(Seq(("f0.parquet", "x", 100L, 10L), ("f1.parquet", "y", 101L, 11L)),
      tombstones = Seq("gone.parquet"))
    val commits = commitsDf(
      // at/below the checkpoint version: must be IGNORED even if contradictory
      2L -> """{"add":{"path":"stale.parquet","partitionValues":{},"size":1,"modificationTime":0}}""",
      3L -> ("""{"remove":{"path":"f1.parquet"}}""" + "\n" +
        """{"add":{"path":"f2.parquet","partitionValues":{"p":"y"},"size":102,"modificationTime":12}}"""),
      4L -> """{"add":{"path":"f3.parquet","partitionValues":{"p":"z"},"size":103,"modificationTime":13}}""")
    val out = DeltaLog.activeFilesFromCheckpoint(cp, commits, "version", "content", 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("f0.parquet" -> 100L, "f2.parquet" -> 102L, "f3.parquet" -> 103L))
  }

  test("checkpoint seed: a v3 protocol row in the checkpoint refuses; a bare v2 reads") {
    val v3 = cpDf(Seq(("f0.parquet", "x", 100L, 10L)), Seq.empty)
      .unionByName(
        spark.sql("SELECT named_struct('minReaderVersion', CAST(3 AS BIGINT)) AS protocol"),
        allowMissingColumns = true)
    assert(DeltaLog.activeFilesFromCheckpoint(v3, commitsDf(), "version", "content", 2L).isEmpty)
    val v2 = cpDf(Seq(("f0.parquet", "x", 100L, 10L)), Seq.empty)
      .unionByName(
        spark.sql("SELECT named_struct('minReaderVersion', CAST(2 AS BIGINT)) AS protocol"),
        allowMissingColumns = true)
    assert(!DeltaLog.activeFilesFromCheckpoint(v2, commitsDf(), "version", "content", 2L).isEmpty)
  }

  // --- readTable: on-disk fixtures ---

  /** Write df as a SINGLE parquet file at dest (Spark writes
    * directories; checkpoint/data-file fixtures need exact names). */
  private def singleParquet(df: DataFrame, dest: java.io.File): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-delta").toFile
    df.coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().find(f =>
      f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, dest.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def writeCommit(logDir: java.io.File, v: Long, lines: String*): Unit =
    java.nio.file.Files.write(
      new java.io.File(logDir, f"$v%020d.json").toPath,
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def addLine(path: String, p: String, size: Long): String =
    s"""{"add":{"path":"$path","partitionValues":{"p":"$p"},"size":$size,"modificationTime":0,"dataChange":true}}"""

  /** A table dir with data files f0..f3 (two rows each, id block per
    * file) and a fresh _delta_log dir; returns (tableDir, logDir). */
  private def tableFixture(): (java.io.File, java.io.File) = {
    val tableDir = java.nio.file.Files.createTempDirectory("graft-delta-tbl").toFile
    (0 to 3).foreach { i =>
      singleParquet(Seq((i * 10L, s"row${i}a"), (i * 10L + 1, s"row${i}b")).toDF("id", "s"),
        new java.io.File(tableDir, s"f$i.parquet"))
    }
    val logDir = new java.io.File(tableDir, "_delta_log")
    logDir.mkdirs()
    (tableDir, logDir)
  }

  private def readSorted(dir: java.io.File): Seq[(Long, String, String)] =
    DeltaLog.readTable(spark, dir.getAbsolutePath)
      .select("id", "s", "p").as[(Long, String, String)].collect().sorted.toSeq

  test("readTable without checkpoint: full JSON replay, partition values injected, one scan") {
    val (tableDir, logDir) = tableFixture()
    writeCommit(logDir, 0L, meta, proto, addLine("f0.parquet", "x", 100),
      addLine("f1.parquet", "y", 101))
    writeCommit(logDir, 1L, """{"remove":{"path":"f1.parquet"}}""",
      addLine("f2.parquet", "y", 102))
    writeCommit(logDir, 2L, addLine("f3.parquet", "z", 103))
    val df = DeltaLog.readTable(spark, tableDir.getAbsolutePath)
    assert(readSorted(tableDir) == Seq(
      (0L, "row0a", "x"), (1L, "row0b", "x"),
      (20L, "row2a", "y"), (21L, "row2b", "y"),
      (30L, "row3a", "z"), (31L, "row3b", "z")))
    // single-scan contract: one FileScan however many partition tuples
    assert("FileScan".r.findAllIn(df.queryExecution.sparkPlan.toString).length == 1)
  }

  /** Checkpoint parquet holding the state after commits 0..1 of the
    * fixture log: metaData + protocol + adds f0(x), f2(y) + a
    * tombstone for f1. */
  private def checkpointRows(): DataFrame =
    cpDf(Seq(("f0.parquet", "x", 100L, 0L), ("f2.parquet", "y", 102L, 0L)),
      tombstones = Seq("f1.parquet"))

  test("readTable with checkpoint: seeds from parquet, replays only the tail, equals full replay") {
    // full-replay table
    val (fullDir, fullLog) = tableFixture()
    writeCommit(fullLog, 0L, meta, proto, addLine("f0.parquet", "x", 100),
      addLine("f1.parquet", "y", 101))
    writeCommit(fullLog, 1L, """{"remove":{"path":"f1.parquet"}}""",
      addLine("f2.parquet", "y", 102))
    writeCommit(fullLog, 2L, addLine("f3.parquet", "z", 103))
    // checkpointed table: same logical log, commits 0..1 REPLACED by
    // the checkpoint (and deleted, as the protocol allows)
    val (cpDir, cpLog) = tableFixture()
    singleParquet(checkpointRows(), new java.io.File(cpLog, f"${1L}%020d.checkpoint.parquet"))
    java.nio.file.Files.write(new java.io.File(cpLog, "_last_checkpoint").toPath,
      """{"version":1,"size":5}""".getBytes("UTF-8"))
    writeCommit(cpLog, 2L, addLine("f3.parquet", "z", 103))
    assert(readSorted(cpDir) == readSorted(fullDir))
    // the checkpoint merge is capped: 3 active files > cap 2 refuses
    // by name (the distributed max_by path, not the JSON replay)
    spark.conf.set("graft.delta.maxFiles", "2")
    try {
      val e = intercept[graft.GraftAnalysisException] {
        DeltaLog.readTable(spark, cpDir.getAbsolutePath)
      }
      assert(e.getMessage.contains("more than 2 active files"))
    } finally spark.conf.unset("graft.delta.maxFiles")
  }

  test("readTable multi-part checkpoint: all parts load; a missing part refuses") {
    val (cpDir, cpLog) = tableFixture()
    val parts = checkpointRows()
    // part 1: the metaData/protocol/tombstone rows; part 2: the adds
    singleParquet(parts.where(col("add").isNull),
      new java.io.File(cpLog, f"${1L}%020d.checkpoint.${1}%010d.${2}%010d.parquet"))
    singleParquet(parts.where(col("add").isNotNull),
      new java.io.File(cpLog, f"${1L}%020d.checkpoint.${2}%010d.${2}%010d.parquet"))
    java.nio.file.Files.write(new java.io.File(cpLog, "_last_checkpoint").toPath,
      """{"version":1,"size":5,"parts":2}""".getBytes("UTF-8"))
    writeCommit(cpLog, 2L, addLine("f3.parquet", "z", 103))
    assert(readSorted(cpDir).map(_._1) == Seq(0L, 1L, 20L, 21L, 30L, 31L))
    // a missing part must refuse, not half-read
    new java.io.File(cpLog, f"${1L}%020d.checkpoint.${2}%010d.${2}%010d.parquet").delete()
    intercept[graft.GraftAnalysisException] {
      DeltaLog.readTable(spark, cpDir.getAbsolutePath)
    }
  }

  test("readTable refusals: reader-version-3 checkpoint, missing checkpoint file, malformed _last_checkpoint") {
    val (cpDir, cpLog) = tableFixture()
    val v3 = checkpointRows().unionByName(
      spark.sql("SELECT named_struct('minReaderVersion', CAST(3 AS BIGINT)) AS protocol"),
      allowMissingColumns = true)
    singleParquet(v3, new java.io.File(cpLog, f"${1L}%020d.checkpoint.parquet"))
    java.nio.file.Files.write(new java.io.File(cpLog, "_last_checkpoint").toPath,
      """{"version":1,"size":6}""".getBytes("UTF-8"))
    intercept[graft.GraftAnalysisException] { DeltaLog.readTable(spark, cpDir.getAbsolutePath) }

    val (d2, l2) = tableFixture()
    java.nio.file.Files.write(new java.io.File(l2, "_last_checkpoint").toPath,
      """{"version":7,"size":1}""".getBytes("UTF-8")) // names a checkpoint that isn't there
    intercept[graft.GraftAnalysisException] { DeltaLog.readTable(spark, d2.getAbsolutePath) }

    val (d3, l3) = tableFixture()
    java.nio.file.Files.write(new java.io.File(l3, "_last_checkpoint").toPath,
      "{not json".getBytes("UTF-8"))
    intercept[graft.GraftAnalysisException] { DeltaLog.readTable(spark, d3.getAbsolutePath) }
  }

  // --- v2 checkpoints (round 15) ---

  test("readTable v2 checkpoint: UUID-named file + sidecars equals the classic checkpoint read") {
    // classic baseline
    val (cDir, cLog) = tableFixture()
    singleParquet(checkpointRows(),
      new java.io.File(cLog, f"${1L}%020d.checkpoint.parquet"))
    java.nio.file.Files.write(new java.io.File(cLog, "_last_checkpoint").toPath,
      """{"version":1,"size":5}""".getBytes("UTF-8"))
    writeCommit(cLog, 2L, addLine("f3.parquet", "z", 103))

    // v2: checkpoint file holds metaData/protocol/checkpointMetadata/
    // sidecar rows; the add/remove rows live in TWO sidecar parquets
    val (vDir, vLog) = tableFixture()
    val sideDir = new java.io.File(vLog, "_sidecars"); sideDir.mkdirs()
    singleParquet(cpDf(Seq(("f0.parquet", "x", 100L, 0L)), tombstones = Seq.empty)
      .where(col("add").isNotNull),
      new java.io.File(sideDir, "s1.parquet"))
    singleParquet(cpDf(Seq(("f2.parquet", "y", 102L, 0L)), tombstones = Seq("f1.parquet"))
      .where(col("add").isNotNull || col("remove").isNotNull),
      new java.io.File(sideDir, "s2.parquet"))
    val cpTop = spark.sql(
      "SELECT named_struct('id','t','schemaString','{}','partitionColumns',array('p')) AS metaData")
      .unionByName(spark.sql(
        "SELECT named_struct('minReaderVersion', CAST(1 AS BIGINT)) AS protocol"),
        allowMissingColumns = true)
      .unionByName(spark.sql(
        "SELECT named_struct('version', CAST(1 AS BIGINT)) AS checkpointMetadata"),
        allowMissingColumns = true)
      .unionByName(spark.sql(
        "SELECT named_struct('path','s1.parquet','sizeInBytes',CAST(1 AS BIGINT)) AS sidecar")
        .unionByName(spark.sql(
          "SELECT named_struct('path','s2.parquet','sizeInBytes',CAST(1 AS BIGINT)) AS sidecar")),
        allowMissingColumns = true)
    singleParquet(cpTop, new java.io.File(vLog,
      f"${1L}%020d.checkpoint.3a1c0f2e-9d4b-4a7e-8f21-000000000001.parquet"))
    java.nio.file.Files.write(new java.io.File(vLog, "_last_checkpoint").toPath,
      """{"version":1,"size":7}""".getBytes("UTF-8"))
    writeCommit(vLog, 2L, addLine("f3.parquet", "z", 103))
    assert(readSorted(vDir) == readSorted(cDir))
    assert(readSorted(vDir) == Seq(
      (0L, "row0a", "x"), (1L, "row0b", "x"),
      (20L, "row2a", "y"), (21L, "row2b", "y"),
      (30L, "row3a", "z"), (31L, "row3b", "z")))
  }

  test("readTable v2 checkpoint, JSON flavor: action lines + sidecar references read") {
    val (vDir, vLog) = tableFixture()
    val sideDir = new java.io.File(vLog, "_sidecars"); sideDir.mkdirs()
    singleParquet(cpDf(Seq(("f0.parquet", "x", 100L, 0L), ("f2.parquet", "y", 102L, 0L)),
      tombstones = Seq("f1.parquet"))
      .where(col("add").isNotNull || col("remove").isNotNull),
      new java.io.File(sideDir, "sj.parquet"))
    java.nio.file.Files.write(new java.io.File(vLog,
      f"${1L}%020d.checkpoint.3a1c0f2e-9d4b-4a7e-8f21-00000000000a.json").toPath,
      (meta + "\n" + proto + "\n" +
        """{"checkpointMetadata":{"version":1}}""" + "\n" +
        """{"sidecar":{"path":"sj.parquet","sizeInBytes":1}}""")
        .getBytes("UTF-8"))
    java.nio.file.Files.write(new java.io.File(vLog, "_last_checkpoint").toPath,
      """{"version":1,"size":6}""".getBytes("UTF-8"))
    writeCommit(vLog, 2L, addLine("f3.parquet", "z", 103))
    assert(readSorted(vDir) == Seq(
      (0L, "row0a", "x"), (1L, "row0b", "x"),
      (20L, "row2a", "y"), (21L, "row2b", "y"),
      (30L, "row3a", "z"), (31L, "row3b", "z")))
  }

  test("readTable v2 checkpoint: a missing sidecar refuses by name") {
    val (vDir, vLog) = tableFixture()
    val cpTop = spark.sql(
      "SELECT named_struct('id','t','schemaString','{}','partitionColumns',array('p')) AS metaData")
      .unionByName(spark.sql(
        "SELECT named_struct('path','nowhere.parquet','sizeInBytes',CAST(1 AS BIGINT)) AS sidecar"),
        allowMissingColumns = true)
    singleParquet(cpTop, new java.io.File(vLog,
      f"${1L}%020d.checkpoint.3a1c0f2e-9d4b-4a7e-8f21-000000000002.parquet"))
    java.nio.file.Files.write(new java.io.File(vLog, "_last_checkpoint").toPath,
      """{"version":1,"size":2}""".getBytes("UTF-8"))
    val e = intercept[graft.GraftAnalysisException] {
      DeltaLog.readTable(spark, vDir.getAbsolutePath)
    }
    assert(e.getMessage.contains("sidecar missing"))
  }

  // --- deletion vectors (round 15) ---

  private val protoV3 =
    """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
      """"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}"""

  private def dvJson(d: graft.ops.DeltaDv.Descriptor): String = {
    val off = d.offset.map(o => s""","offset":$o""").getOrElse("")
    s""""deletionVector":{"storageType":"${d.storageType}","pathOrInlineDv":"${d.pathOrInlineDv}"""" +
      off + s""","sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}"""
  }

  test("readTable with deletion vectors equals the full-rewrite table (u, p, i storages)") {
    import graft.ops.DeltaDv
    val (tableDir, logDir) = tableFixture() // f0..f3, rows (10k, row{k}a), (10k+1, row{k}b)
    // f0: delete row 0 via a 'u'-storage file; f1: delete row 1 via
    // 'p'; f2: delete both rows inline; f3: no DV
    val uuid = java.util.UUID.randomUUID()
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits)
    val uEnc = DeltaDv.z85Encode(bb.array())
    val dv0 = DeltaDv.serialize(Seq(0L))
    val uOffs = DeltaDv.writeDvFile(
      new java.io.File(tableDir, s"deletion_vector_$uuid.bin"), Seq(dv0))
    val d0 = DeltaDv.Descriptor("u", uEnc, Some(uOffs(0)), dv0.length, 1)
    val dv1 = DeltaDv.serialize(Seq(1L))
    val pFile = new java.io.File(tableDir, "elsewhere.bin")
    val pOffs = DeltaDv.writeDvFile(pFile, Seq(dv1))
    val d1 = DeltaDv.Descriptor("p", pFile.getAbsolutePath, Some(pOffs(0)), dv1.length, 1)
    val dv2 = DeltaDv.serialize(Seq(0L, 1L))
    val d2 = DeltaDv.Descriptor("i", DeltaDv.z85Encode(dv2), None, dv2.length, 2)
    def addDv(path: String, d: DeltaDv.Descriptor): String =
      s"""{"add":{"path":"$path","partitionValues":{"p":"x"},"size":1,""" +
        s""""modificationTime":0,"dataChange":false,${dvJson(d)}}}"""
    writeCommit(logDir, 0L, meta, protoV3,
      addLine("f0.parquet", "x", 100), addLine("f1.parquet", "x", 101),
      addLine("f2.parquet", "x", 102), addLine("f3.parquet", "x", 103))
    // the protocol's DV-attach shape: add-with-dv plus remove of the
    // PREVIOUS (path, no-dv) state, add line FIRST to pin the
    // (path, dvId) keying against in-commit order
    writeCommit(logDir, 1L,
      addDv("f0.parquet", d0), """{"remove":{"path":"f0.parquet"}}""",
      addDv("f1.parquet", d1), """{"remove":{"path":"f1.parquet"}}""",
      addDv("f2.parquet", d2), """{"remove":{"path":"f2.parquet"}}""")
    assert(readSorted(tableDir) == Seq(
      (1L, "row0b", "x"), (10L, "row1a", "x"),
      (30L, "row3a", "x"), (31L, "row3b", "x")))
    // and the DV path equals a literal rewrite without the deleted rows
    val (rwDir, rwLog) = tableFixture()
    singleParquet(Seq((1L, "row0b")).toDF("id", "s"), new java.io.File(rwDir, "f0.parquet"))
    singleParquet(Seq((10L, "row1a")).toDF("id", "s"), new java.io.File(rwDir, "f1.parquet"))
    writeCommit(rwLog, 0L, meta, proto, addLine("f0.parquet", "x", 100),
      addLine("f1.parquet", "x", 101), addLine("f3.parquet", "x", 103))
    assert(readSorted(tableDir) == readSorted(rwDir))
  }

  test("deletion vectors refuse on CRC corruption instead of resurrecting rows") {
    import graft.ops.DeltaDv
    val (tableDir, logDir) = tableFixture()
    val dv = DeltaDv.serialize(Seq(0L))
    val f = new java.io.File(tableDir, "dv.bin")
    val offs = DeltaDv.writeDvFile(f, Seq(dv))
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    bytes(bytes.length - 1) = (bytes(bytes.length - 1) ^ 1).toByte
    java.nio.file.Files.write(f.toPath, bytes)
    val d = DeltaDv.Descriptor("p", f.getAbsolutePath, Some(offs(0)), dv.length, 1)
    writeCommit(logDir, 0L, meta, protoV3,
      s"""{"add":{"path":"f0.parquet","partitionValues":{"p":"x"},"size":1,""" +
        s""""modificationTime":0,${dvJson(d)}}}""")
    intercept[graft.GraftAnalysisException] { DeltaLog.readTable(spark, tableDir.getAbsolutePath) }
  }

  test("deletion vectors compose with column mapping: logical names out, deleted rows gone") {
    import graft.ops.DeltaDv
    val tableDir = java.nio.file.Files.createTempDirectory("graft-delta-dvcm").toFile
    singleParquet(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("col-1", "col-2"),
      new java.io.File(tableDir, "d0.parquet"))
    val dv = DeltaDv.serialize(Seq(1L)) // delete row 1 ("b")
    val d = DeltaDv.Descriptor("i", DeltaDv.z85Encode(dv), None, dv.length, 1)
    val logDir = new java.io.File(tableDir, "_delta_log"); logDir.mkdirs()
    def fld(name: String, phys: String, tpe: String) =
      s"""{\\"name\\":\\"$name\\",\\"type\\":\\"$tpe\\",\\"nullable\\":true,\\"metadata\\":""" +
        s"""{\\"delta.columnMapping.id\\":1,\\"delta.columnMapping.physicalName\\":\\"$phys\\"}}"""
    val schemaStr = s"""{\\"type\\":\\"struct\\",\\"fields\\":[""" +
      fld("id", "col-1", "long") + "," + fld("s", "col-2", "string") + "]}"
    writeCommit(logDir, 0L,
      s"""{"metaData":{"id":"t","schemaString":"$schemaStr","partitionColumns":[],""" +
        """"configuration":{"delta.columnMapping.mode":"name"}}}""",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors","columnMapping"],""" +
        """"writerFeatures":["deletionVectors","columnMapping"]}}""",
      s"""{"add":{"path":"d0.parquet","partitionValues":{},"size":1,""" +
        s""""modificationTime":0,${dvJson(d)}}}""")
    val df = DeltaLog.readTable(spark, tableDir.getAbsolutePath)
    assert(df.columns.toSeq == Seq("id", "s"))
    assert(df.as[(Long, String)].collect().sorted.toSeq == Seq((1L, "a"), (3L, "c")))
  }

  // --- column mapping, name mode (round 15) ---

  test("readTable column mapping name mode: physical parquet names map back to logical, partitions keyed physically") {
    val tableDir = java.nio.file.Files.createTempDirectory("graft-delta-cm").toFile
    // data files carry PHYSICAL column names (col-xxx), nested incl.
    singleParquet(
      Seq((1L, "a", ("n1", 10L)), (2L, "b", ("n2", 20L)))
        .toDF("col-id", "col-s", "col-st")
        .select(col("col-id"), col("col-s"),
          col("col-st").cast("struct<`col-n`:string,`col-v`:bigint>").as("col-st")),
      new java.io.File(tableDir, "d0.parquet"))
    val logDir = new java.io.File(tableDir, "_delta_log"); logDir.mkdirs()
    def fld(name: String, phys: String, tpe: String) =
      s"""{\\"name\\":\\"$name\\",\\"type\\":$tpe,\\"nullable\\":true,\\"metadata\\":""" +
        s"""{\\"delta.columnMapping.id\\":1,\\"delta.columnMapping.physicalName\\":\\"$phys\\"}}"""
    val nested = s"""{\\"type\\":\\"struct\\",\\"fields\\":[""" +
      fld("n", "col-n", "\\\"string\\\"") + "," + fld("v", "col-v", "\\\"long\\\"") + "]}"
    val schemaStr = s"""{\\"type\\":\\"struct\\",\\"fields\\":[""" +
      fld("id", "col-id", "\\\"long\\\"") + "," +
      fld("s", "col-s", "\\\"string\\\"") + "," +
      fld("st", "col-st", nested) + "," +
      fld("part", "col-part", "\\\"string\\\"") + "]}"
    val metaCm = s"""{"metaData":{"id":"t","schemaString":"$schemaStr",""" +
      """"partitionColumns":["part"],""" +
      """"configuration":{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"6"}}}"""
    writeCommit(logDir, 0L, metaCm,
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      // partitionValues keyed by the PHYSICAL partition column name
      """{"add":{"path":"d0.parquet","partitionValues":{"col-part":"pv"},"size":1,"modificationTime":0}}""")
    val df = DeltaLog.readTable(spark, tableDir.getAbsolutePath)
    assert(df.columns.toSeq == Seq("id", "s", "st", "part"))
    assert(df.select("st").schema.head.dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("n", "v"))
    val rows = df.select(col("id"), col("s"), col("st.n"), col("st.v"), col("part"))
      .as[(Long, String, String, Long, String)].collect().sorted.toSeq
    assert(rows == Seq((1L, "a", "n1", 10L, "pv"), (2L, "b", "n2", 20L, "pv")))
  }

  test("readTable time travel: each version replays exactly; the ladder refuses") {
    val (tableDir, logDir) = tableFixture()
    writeCommit(logDir, 0L, meta, proto, addLine("f0.parquet", "x", 100),
      addLine("f1.parquet", "y", 101))
    writeCommit(logDir, 1L, """{"remove":{"path":"f1.parquet"}}""",
      addLine("f2.parquet", "y", 102))
    writeCommit(logDir, 2L, addLine("f3.parquet", "z", 103))
    def at(v: Long): Seq[Long] =
      DeltaLog.readTable(spark, tableDir.getAbsolutePath, Some(v))
        .select("id").as[Long].collect().sorted.toSeq
    assert(at(0L) == Seq(0L, 1L, 10L, 11L)) // f0 + f1
    assert(at(1L) == Seq(0L, 1L, 20L, 21L)) // f1 removed, f2 added
    assert(at(2L) == Seq(0L, 1L, 20L, 21L, 30L, 31L))
    // current read unchanged
    assert(DeltaLog.readTable(spark, tableDir.getAbsolutePath)
      .select("id").as[Long].collect().sorted.toSeq == at(2L))
    // beyond the log / negative: refuse by name
    assert(intercept[graft.GraftAnalysisException] {
      DeltaLog.readTable(spark, tableDir.getAbsolutePath, Some(9L))
    }.getMessage.contains("not available"))
    assert(intercept[graft.GraftAnalysisException] {
      DeltaLog.readTable(spark, tableDir.getAbsolutePath, Some(-1L))
    }.getMessage.contains("negative"))
    // a vacuumed (non-contiguous) history refuses
    assert(new java.io.File(logDir, f"${0L}%020d.json").delete())
    assert(intercept[graft.GraftAnalysisException] {
      DeltaLog.readTable(spark, tableDir.getAbsolutePath, Some(2L))
    }.getMessage.contains("contiguous"))
  }

  test("readTable time travel with a checkpoint: seeds only when at or before the target") {
    val (tableDir, logDir) = tableFixture()
    writeCommit(logDir, 0L, meta, proto, addLine("f0.parquet", "x", 100),
      addLine("f1.parquet", "y", 101))
    writeCommit(logDir, 1L, """{"remove":{"path":"f1.parquet"}}""",
      addLine("f2.parquet", "y", 102))
    writeCommit(logDir, 2L, addLine("f3.parquet", "z", 103))
    // checkpoint at version 1
    checkpointRows().coalesce(1).write.mode("overwrite")
      .parquet(new java.io.File(logDir, "cp.tmp").getAbsolutePath)
    val part = new java.io.File(logDir, "cp.tmp").listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      new java.io.File(logDir, f"${1L}%020d.checkpoint.parquet").toPath)
    java.nio.file.Files.write(new java.io.File(logDir, "_last_checkpoint").toPath,
      """{"version":1,"size":3}""".getBytes("UTF-8"))
    def at(v: Long): Seq[Long] =
      DeltaLog.readTable(spark, tableDir.getAbsolutePath, Some(v))
        .select("id").as[Long].collect().sorted.toSeq
    // target 2: checkpoint(1) seeds + commit 2 replays
    assert(at(2L) == Seq(0L, 1L, 20L, 21L, 30L, 31L))
    // target 0: the version-1 checkpoint must NOT seed — pure JSON
    assert(at(0L) == Seq(0L, 1L, 10L, 11L))
  }

  test("readTable column mapping id mode: footer field ids resolve, stale physicalNames ignored") {
    import org.apache.spark.sql.types.MetadataBuilder
    def fid(n: Long) = new MetadataBuilder().putLong("parquet.field.id", n).build()
    val tableDir = java.nio.file.Files.createTempDirectory("graft-delta-cmid").toFile
    // files carry names (f1, f2) + field ids (1, 2); the metadata
    // physicalNames point at columns that do NOT exist
    singleParquet(
      Seq((1L, "a"), (2L, "b")).toDF("x", "y")
        .select(col("x").as("f1", fid(1)), col("y").as("f2", fid(2))),
      new java.io.File(tableDir, "d0.parquet"))
    val logDir = new java.io.File(tableDir, "_delta_log"); logDir.mkdirs()
    def fld(name: String, id: Int, phys: String, tpe: String) =
      s"""{\\"name\\":\\"$name\\",\\"type\\":\\"$tpe\\",\\"nullable\\":true,\\"metadata\\":""" +
        s"""{\\"delta.columnMapping.id\\":$id,\\"delta.columnMapping.physicalName\\":\\"$phys\\"}}"""
    def metaOf(fields: String) =
      s"""{"metaData":{"id":"t","schemaString":"{\\"type\\":\\"struct\\",\\"fields\\":[$fields]}",""" +
        """"partitionColumns":[],""" +
        """"configuration":{"delta.columnMapping.mode":"id","delta.columnMapping.maxColumnId":"2"}}}"""
    val v2 = """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}"""
    val add = """{"add":{"path":"d0.parquet","partitionValues":{},"size":1,"modificationTime":0}}"""
    writeCommit(logDir, 0L,
      metaOf(fld("id", 1, "col-stale-1", "long") + "," + fld("s", 2, "col-stale-2", "string")),
      v2, add)
    val df = DeltaLog.readTable(spark, tableDir.getAbsolutePath)
    assert(df.columns.toSeq == Seq("id", "s"))
    assert(df.as[(Long, String)].collect().sorted.toSeq == Seq((1L, "a"), (2L, "b")))
    // a field id absent from the footers refuses by name
    writeCommit(logDir, 1L,
      metaOf(fld("id", 1, "col-stale-1", "long") + "," + fld("s", 9, "col-stale-2", "string")))
    val e = intercept[graft.GraftAnalysisException] {
      DeltaLog.readTable(spark, tableDir.getAbsolutePath).collect()
    }
    assert(e.getMessage.contains("field id 9"))
    // heterogeneous layouts refuse: a second file with different ids
    singleParquet(
      Seq((3L, "c")).toDF("x", "y")
        .select(col("x").as("g1", fid(7)), col("y").as("g2", fid(8))),
      new java.io.File(tableDir, "d1.parquet"))
    writeCommit(logDir, 2L,
      metaOf(fld("id", 1, "col-stale-1", "long") + "," + fld("s", 2, "col-stale-2", "string")),
      """{"add":{"path":"d1.parquet","partitionValues":{},"size":1,"modificationTime":0}}""")
    val e2 = intercept[graft.GraftAnalysisException] {
      DeltaLog.readTable(spark, tableDir.getAbsolutePath).collect()
    }
    assert(e2.getMessage.contains("heterogeneous"))
  }

  test("timestamp travel: commitInfo timestamps resolve, clocks made monotonic, before-first refuses") {
    val tableDir = java.nio.file.Files.createTempDirectory("graft-delta-ts").toFile
    singleParquet(Seq((1L, "a"), (2L, "b")).toDF("id", "s"),
      new java.io.File(tableDir, "d0.parquet"))
    singleParquet(Seq((3L, "c")).toDF("id", "s"),
      new java.io.File(tableDir, "d1.parquet"))
    val logDir = new java.io.File(tableDir, "_delta_log"); logDir.mkdirs()
    def add(p: String) =
      s"""{"add":{"path":"$p","partitionValues":{},"size":1,"modificationTime":0}}"""
    // v0 stamped 2000; v1 stamped 1000 — a REGRESSED writer clock.
    // The monotonic rule clamps v1's effective timestamp to 2001.
    writeCommit(logDir, 0L,
      """{"commitInfo":{"timestamp":2000}}""",
      """{"metaData":{"id":"t","schemaString":"{}","partitionColumns":[]}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      add("d0.parquet"))
    writeCommit(logDir, 1L,
      """{"commitInfo":{"timestamp":1000}}""", add("d1.parquet"))
    def idsAt(ts: Long): Seq[Long] =
      DeltaLog.readTableAt(spark, tableDir.getAbsolutePath, ts)
        .select("id").as[Long].collect().sorted.toSeq
    assert(idsAt(2000L) == Seq(1L, 2L))       // v0
    assert(idsAt(2001L) == Seq(1L, 2L, 3L))   // v1 at its clamped ts
    assert(idsAt(5000L) == Seq(1L, 2L, 3L))
    val e = intercept[graft.GraftAnalysisException] {
      DeltaLog.readTableAt(spark, tableDir.getAbsolutePath, 1999L)
    }
    assert(e.getMessage.contains("precedes the first available commit"))
    // inCommitTimestamp beats the commitInfo wall clock when present
    writeCommit(logDir, 2L,
      """{"commitInfo":{"timestamp":9999,"inCommitTimestamp":3000}}""",
      """{"remove":{"path":"d1.parquet"}}""")
    assert(idsAt(2999L) == Seq(1L, 2L, 3L))   // still v1
    assert(idsAt(3000L) == Seq(1L, 2L))       // v2 by its in-commit ts
  }

  test("file-list cap: a table past graft.delta.maxFiles refuses by name (JSON replay path)") {
    val docs = Seq((1L, "web", 10L), (2L, "web", 20L), (3L, "book", 30L),
      (4L, "web", 40L)).toDF("doc_id", "source", "n_chars")
    // 4 bucket files, no checkpoint — the driver JSON replay path
    // (the checkpoint-merge cap is asserted in the checkpoint test)
    val dvDir = graft.ops.TableFixtures.writeDeltaDvTable(spark, docs, "doc_id")
    spark.conf.set("graft.delta.maxFiles", "2")
    try {
      val e = intercept[graft.GraftAnalysisException] {
        DeltaLog.readTable(spark, dvDir).collect()
      }
      assert(e.getMessage.contains("more than 2 active files"))
    } finally spark.conf.unset("graft.delta.maxFiles")
    // uncapped, the same table reads
    assert(DeltaLog.readTable(spark, dvDir).count() > 0)
  }

  test("change data feed: cdc shadows file actions, synthesis for plain commits, range ladder") {
    val docs = Seq((1L, "web", 10L), (2L, "web", 20L), (3L, "book", 30L),
      (4L, "web", 40L), (10L, "book", 100L)).toDF("doc_id", "source", "n_chars")
    val dir = graft.ops.TableFixtures.writeDeltaCdfTable(spark, docs, "doc_id")
    val all = DeltaLog.readChanges(spark, dir, 0L, 3L)
      .select("doc_id", "n_chars", "_change_type", "_commit_version", "_commit_timestamp")
      .as[(Long, Long, String, Long, Long)].collect().sortBy(r => (r._4, r._3, r._1)).toSeq
    val expected = Seq(
      (1L, 10L, "insert", 0L, 1000L), (2L, 20L, "insert", 0L, 1000L),
      (3L, 30L, "insert", 0L, 1000L), (4L, 40L, "insert", 0L, 1000L),
      (10L, 100L, "insert", 0L, 1000L),
      (10L, 100L, "update_preimage", 1L, 2000L),
      (10L, 1100L, "update_postimage", 1L, 2000L),
      (1L, 10L, "delete", 2L, 3000L), (3L, 30L, "delete", 2L, 3000L))
      .sortBy(r => (r._4, r._3, r._1))
    assert(all == expected)
    // a sub-range carries only its versions
    val v2only = DeltaLog.readChanges(spark, dir, 2L, 2L)
      .select("_change_type").as[String].collect().toSeq
    assert(v2only == Seq("delete", "delete"))
    // v3 alone (dataChange=false compaction) is CDF-invisible: an
    // EMPTY feed with the full CDF shape, not a refusal — a consumer
    // polling across an OPTIMIZE must keep working
    val v3only = DeltaLog.readChanges(spark, dir, 3L, 3L)
    assert(v3only.count() === 0L)
    assert(Seq("_change_type", "_commit_version", "_commit_timestamp")
      .forall(v3only.columns.contains))
    // ladder: empty range, negative start, missing version
    intercept[graft.GraftAnalysisException] { DeltaLog.readChanges(spark, dir, 2L, 1L) }
    intercept[graft.GraftAnalysisException] { DeltaLog.readChanges(spark, dir, -1L, 1L) }
    val e = intercept[graft.GraftAnalysisException] {
      DeltaLog.readChanges(spark, dir, 0L, 9L)
    }
    assert(e.getMessage.contains("version 4 is missing"))
  }

  test("delta/iceberg sources: timestamp_as_of rides the spec surface; both-set refuses") {
    val docs = Seq((1L, "web", 10L), (2L, "web", 20L), (3L, "book", 30L),
      (4L, "web", 40L), (5L, "book", 50L)).toDF("doc_id", "source", "n_chars")
    val dDir = graft.ops.TableFixtures.writeDeltaTtTable(spark, docs, "doc_id")
    def src(tpe: String, kvs: (String, Any)*) =
      graft.sources.SourceReader.read(spark,
        graft.spec.SourceSpec("t", tpe, graft.spec.Config.of(kvs: _*)))
    // t=1500 → version 0 (every row); current state lost doc_id 5
    assert(src("delta", "path" -> dDir, "timestamp_as_of" -> 1500L)
      .select("doc_id").as[Long].collect().sorted.toSeq == (1L to 5L))
    intercept[graft.GraftAnalysisException] {
      src("delta", "path" -> dDir, "timestamp_as_of" -> 1500L, "version_as_of" -> 0L)
    }
    val iDir = graft.ops.TableFixtures.writeIcebergV2Table(spark, docs, "doc_id")
    assert(src("iceberg", "path" -> iDir, "timestamp_as_of" -> 1500L)
      .select("doc_id").as[Long].collect().sorted.toSeq == (1L to 5L))
    intercept[graft.GraftAnalysisException] {
      src("iceberg", "path" -> iDir, "timestamp_as_of" -> 1500L, "snapshot_id" -> 0L)
    }
  }

  test("id mode refuses nested struct columns (only top-level fields resolve by id)") {
    import org.apache.spark.sql.types.MetadataBuilder
    def fid(n: Long) = new MetadataBuilder().putLong("parquet.field.id", n).build()
    val tableDir = java.nio.file.Files.createTempDirectory("graft-delta-cmid-st").toFile
    singleParquet(
      Seq((1L, "a")).toDF("x", "y")
        .select(col("x").as("f1", fid(1)),
          struct(col("y").as("inner")).as("f2", fid(2))),
      new java.io.File(tableDir, "d0.parquet"))
    val logDir = new java.io.File(tableDir, "_delta_log"); logDir.mkdirs()
    val schema =
      """{"type":"struct","fields":[""" +
        """{"name":"id","type":"long","nullable":true,"metadata":{"delta.columnMapping.id":1,"delta.columnMapping.physicalName":"f1"}},""" +
        """{"name":"s","type":{"type":"struct","fields":[{"name":"inner","type":"string","nullable":true,"metadata":{}}]},""" +
        """"nullable":true,"metadata":{"delta.columnMapping.id":2,"delta.columnMapping.physicalName":"f2"}}]}"""
    val escaped = schema.replace("\"", "\\\"")
    writeCommit(logDir, 0L,
      s"""{"metaData":{"id":"t","schemaString":"$escaped",""" +
        """"partitionColumns":[],""" +
        """"configuration":{"delta.columnMapping.mode":"id","delta.columnMapping.maxColumnId":"3"}}}""",
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      """{"add":{"path":"d0.parquet","partitionValues":{},"size":1,"modificationTime":0}}""")
    val e = intercept[graft.GraftAnalysisException] {
      DeltaLog.readTable(spark, tableDir.getAbsolutePath).collect()
    }
    assert(e.getMessage.contains("nested struct column 's'"))
  }

  // --- data skipping (round 17) ---

  private def skipDocs = Seq(
    (1L, "web", 10L), (2L, "web", 20L), (3L, "book", 30L),
    (4L, "web", 40L), (5L, "book", 50L), (6L, "web", 60L),
    (7L, "book", 70L), (8L, "web", 80L))
    .toDF("doc_id", "source", "n_chars")
  // cut = 8/2 = 4 → part-b0-lo {2,4}, part-b0-hi {6,8},
  //                 part-b1-lo {1,3}, part-b1-hi {5,7}

  private def openedNames(df: DataFrame): Set[String] =
    df.inputFiles.map(p => p.substring(p.lastIndexOf('/') + 1)).toSet

  test("data skipping: partition + stats conjuncts open exactly the matching file") {
    val dir = graft.ops.TableFixtures.writeDeltaPartTable(spark, skipDocs, "doc_id")
    val pred = col("bucket") === 1 && col("doc_id") <= 4
    val pruned = DeltaLog.readTable(spark, dir, None, Some(pred))
    assert(openedNames(pruned) == Set("part-b1-lo.parquet"))
    assert(pruned.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    // the optimization contract: equals the full-scan filter
    val full = DeltaLog.readTable(spark, dir).where(pred)
    assert(pruned.collect().map(_.toSeq).toSet == full.collect().map(_.toSeq).toSet)
    // stats-only conjunct: n_chars range reaches two files (one per bucket)
    val hi = DeltaLog.readTable(spark, dir, None, Some(col("n_chars") > 40L))
    assert(openedNames(hi) == Set("part-b0-hi.parquet", "part-b1-hi.parquet"))
    assert(hi.select("doc_id").as[Long].collect().sorted.toSeq == Seq(5L, 6L, 7L, 8L))
  }

  test("data skipping keeps files when it cannot be sure; exact skips stay exact") {
    val dir = graft.ops.TableFixtures.writeDeltaPartTable(spark, skipDocs, "doc_id")
    // a column WITHOUT recorded stats (source is in the schema but
    // the stats JSON carries no entry for it): every file opens, the
    // row filter still applies
    val noStats = DeltaLog.readTable(spark, dir, None, Some(col("source") === "book"))
    assert(noStats.inputFiles.length == 4)
    assert(noStats.select("doc_id").as[Long].collect().sorted.toSeq == Seq(3L, 5L, 7L))
    // a mixed OR conjunct cannot split: conservative keep, exact rows
    val mixed = DeltaLog.readTable(spark, dir, None,
      Some(col("bucket") === 1 || col("n_chars") > 1000L))
    assert(mixed.inputFiles.length == 4)
    assert(mixed.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 5L, 7L))
    // nondeterministic CONJUNCTS disable their own pruning (a
    // per-file coin is not a per-row coin) — the deterministic
    // conjunct beside them still prunes
    val ndOnly = DeltaLog.readTable(spark, dir, None,
      Some(org.apache.spark.sql.functions.expr("rand() >= 0.0")))
    assert(ndOnly.inputFiles.length == 4)
    val nd = DeltaLog.readTable(spark, dir, None,
      Some(org.apache.spark.sql.functions.expr("rand() >= 0.0 AND doc_id <= 4")))
    assert(openedNames(nd) == Set("part-b0-lo.parquet", "part-b1-lo.parquet"))
    assert(nd.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    // everything-pruned: one schema-carrier file, zero rows
    val none = DeltaLog.readTable(spark, dir, None, Some(col("n_chars") > 1000L))
    assert(none.inputFiles.length == 1)
    assert(none.count() == 0)
    // nullCount is real: IS NULL skips every file (no nulls recorded)
    val isNull = DeltaLog.readTable(spark, dir, None, Some(col("doc_id").isNull))
    assert(isNull.inputFiles.length == 1 && isNull.count() == 0)
    // IS NOT NULL keeps (nullCount < numRecords everywhere)
    val notNull = DeltaLog.readTable(spark, dir, None, Some(col("doc_id").isNotNull))
    assert(notNull.inputFiles.length == 4 && notNull.count() == 8)
  }

  test("data skipping through the checkpoint path: stats filter runs cluster-side") {
    val dir = graft.ops.TableFixtures.writeDeltaPartTable(spark, skipDocs, "doc_id")
    // rebuild version 0 as a CHECKPOINT: action rows with the same
    // stats strings, so the keep filter must run on the cluster-side
    // merge frame before the capped collect
    def stats(lo: Long, hi: Long): String =
      s"""{"numRecords":2,"minValues":{"doc_id":$lo,"n_chars":${lo * 10}},""" +
        s""""maxValues":{"doc_id":$hi,"n_chars":${hi * 10}},""" +
        s""""nullCount":{"doc_id":0,"n_chars":0}}"""
    val adds = Seq(
      ("part-b0-lo.parquet", "0", stats(2, 4)), ("part-b0-hi.parquet", "0", stats(6, 8)),
      ("part-b1-lo.parquet", "1", stats(1, 3)), ("part-b1-hi.parquet", "1", stats(5, 7)))
      .toDF("path", "bucket", "stats")
      .select(struct(col("path"),
        map(lit("bucket"), col("bucket")).as("partitionValues"),
        lit(1L).as("size"), lit(0L).as("modificationTime"), col("stats")).as("add"))
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("bucket", org.apache.spark.sql.types.StringType))).json
    val furniture = Seq(schemaJson).toDF("sj").select(
      struct(lit("x-delta-part").as("id"), col("sj").as("schemaString"),
        array(lit("bucket")).as("partitionColumns")).as("metaData"))
      .unionByName(
        spark.sql("SELECT named_struct('minReaderVersion', CAST(1 AS BIGINT)) AS protocol"),
        allowMissingColumns = true)
    val cp = adds.unionByName(furniture, allowMissingColumns = true)
    val logDir = new java.io.File(dir, "_delta_log")
    singleParquet(cp, new java.io.File(logDir, f"${0L}%020d.checkpoint.parquet"))
    java.nio.file.Files.write(new java.io.File(logDir, "_last_checkpoint").toPath,
      """{"version":0}""".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val pred = col("bucket") === 1 && col("doc_id") <= 4
    val pruned = DeltaLog.readTable(spark, dir, None, Some(pred))
    assert(openedNames(pruned) == Set("part-b1-lo.parquet"))
    assert(pruned.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    // everything-pruned on the checkpoint path: schema carrier survives
    val none = DeltaLog.readTable(spark, dir, None, Some(col("doc_id") > 99L))
    assert(none.inputFiles.length == 1 && none.count() == 0)
  }

  test("open-ended cdf: no end bound reads to latest; starting timestamp resolves forward") {
    val docs = Seq((1L, "web", 10L), (2L, "web", 20L), (3L, "book", 30L),
      (4L, "web", 40L), (5L, "book", 50L)).toDF("doc_id", "source", "n_chars")
    val dir = graft.ops.TableFixtures.writeDeltaCdfTable(spark, docs, "doc_id")
    // end = None ≡ end = latest (v3 contributes nothing)
    val tail = DeltaLog.readChanges(spark, dir, 2L, None)
    val bounded = DeltaLog.readChanges(spark, dir, 2L, 3L)
    assert(tail.collect().map(_.toSeq).toSet == bounded.collect().map(_.toSeq).toSet)
    assert(tail.select("_change_type").distinct().as[String].collect().toSeq == Seq("delete"))
    // starting timestamp 2500 → earliest commit at/after = v2 (ts 3000)
    val at = DeltaLog.readChangesAt(spark, dir, 2500L, None)
    assert(at.collect().map(_.toSeq).toSet == bounded.collect().map(_.toSeq).toSet)
    // a start timestamp past the last commit refuses by name
    val e = intercept[graft.GraftAnalysisException] {
      DeltaLog.readChangesAt(spark, dir, 99999L, None)
    }
    assert(e.getMessage.contains("after the last commit"))
    // the source spec surface: starting_timestamp + open end
    val viaSrc = graft.sources.SourceReader.read(spark,
      graft.spec.SourceSpec("t", "delta", graft.spec.Config.of(
        "path" -> dir, "changes" -> true, "starting_timestamp" -> 2500L)))
    assert(viaSrc.collect().map(_.toSeq).toSet == bounded.collect().map(_.toSeq).toSet)
    // ENDING timestamp 3500 → latest commit at/or-before = v2: the
    // window carries v0's inserts and v2's deletes (v1's cdc file is
    // EMPTY for this 5-doc fixture — no id%10==0 rows — which is
    // itself the cdc-shadows-file-actions contract at work)
    val endTs = graft.sources.SourceReader.read(spark,
      graft.spec.SourceSpec("t", "delta", graft.spec.Config.of(
        "path" -> dir, "changes" -> true,
        "starting_version" -> 0L, "ending_timestamp" -> 3500L)))
    assert(endTs.select("_commit_version").distinct()
      .as[Long].collect().sorted.toSeq == Seq(0L, 2L))
    // 2500 → v1: only the inserts remain in the window
    val endTs2 = graft.sources.SourceReader.read(spark,
      graft.spec.SourceSpec("t", "delta", graft.spec.Config.of(
        "path" -> dir, "changes" -> true,
        "starting_version" -> 0L, "ending_timestamp" -> 2500L)))
    assert(endTs2.select("_commit_version").distinct()
      .as[Long].collect().sorted.toSeq == Seq(0L))
    intercept[graft.GraftAnalysisException] {
      graft.sources.SourceReader.read(spark,
        graft.spec.SourceSpec("t", "delta", graft.spec.Config.of(
          "path" -> dir, "changes" -> true, "starting_version" -> 0L,
          "ending_version" -> 1L, "ending_timestamp" -> 2500L)))
    }
    intercept[graft.GraftAnalysisException] {
      graft.ops.DeltaLog.resolveEndTs(dir, 1L) // before the first commit
    }
    intercept[graft.GraftAnalysisException] {
      graft.sources.SourceReader.read(spark,
        graft.spec.SourceSpec("t", "delta", graft.spec.Config.of(
          "path" -> dir, "changes" -> true,
          "starting_version" -> 2L, "starting_timestamp" -> 2500L)))
    }
  }

  test("delta source partition_where prunes at the log replay") {
    val dir = graft.ops.TableFixtures.writeDeltaPartTable(spark, skipDocs, "doc_id")
    val viaSrc = graft.sources.SourceReader.read(spark,
      graft.spec.SourceSpec("t", "delta", graft.spec.Config.of(
        "path" -> dir, "partition_where" -> "bucket = 1 AND doc_id <= 4")))
    assert(openedNames(viaSrc) == Set("part-b1-lo.parquet"))
    assert(viaSrc.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }
}
