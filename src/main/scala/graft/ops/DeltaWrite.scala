package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

/** Delta Lake APPEND writer, scoped v1 (single-writer, append-only):
  * the transactional output path a curation pipeline wants — other
  * engines (and this repo's own [[DeltaLog]]) read the result as a
  * real Delta table, with per-file stats the data skipper can consume.
  * From the published Delta Transaction Log Protocol:
  *
  *  - data files are plain parquet (partition columns NOT in the
  *    files — they live in each add's `partitionValues`, laid out as
  *    Hive-style `key=value/` directories);
  *  - a commit is `_delta_log/<20-digit version>.json`, one action
  *    per line: `commitInfo` (timestamp), then for a CREATE the
  *    `protocol` (1, 2) and `metaData` (deterministic table id,
  *    schemaString = the Spark-JSON schema, partitionColumns), then
  *    one `add` per data file with `stats` JSON (numRecords,
  *    minValues, maxValues, nullCount);
  *  - add paths are RELATIVE and percent-encoded (RFC 3986);
  *  - atomicity = atomic file creation of the next contiguous
  *    version; a concurrent writer racing the same version loses at
  *    the filesystem move and refuses BY NAME — retries/conflict
  *    resolution are explicitly out of the v1 scope.
  *
  * Append-compat gate: appending to an existing table requires the
  * commit-JSON history to carry its metaData (checkpoint-only logs
  * refuse), the SAME schema (names + types) and partition columns,
  * no column mapping, and a reader-version ≤ 2 protocol — writing
  * through table features this writer doesn't implement could
  * silently violate their invariants.
  *
  * Scale shape: the data write is one distributed `df.write`
  * (partitioned layout included); per-file stats come from ONE
  * cluster-side aggregation over the just-written files grouped by
  * `_metadata.file_path` (bounded by the file count, which is the
  * writer's own output), and the log append is metadata-bounded
  * driver work like every commit protocol's.
  */
object DeltaWrite {

  private def refuse(msg: String): Nothing =
    throw new graft.GraftAnalysisException(s"delta write: $msg")

  /** RFC 3986 percent-encode for add paths: unreserved characters,
    * '/' (path separator) and '=' (partition dirs) stay literal. */
  private[graft] def percentEncode(s: String): String = {
    val ok = ((('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')).toSet
      ++ Set('-', '.', '_', '~', '/', '='))
    val sb = new StringBuilder
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
      val c = (b & 0xFF).toChar
      if (b >= 0 && ok(c)) sb.append(c)
      else sb.append(f"%%${b & 0xFF}%02X")
    }
    sb.toString
  }

  /** Stats JSON value for a min/max bound; None = this type's bounds
    * are not recorded (readers keep the file — conservative). Strings
    * above 256 chars are omitted rather than truncated: a truncated
    * MAX must be rounded UP to stay sound, and omission is the simpler
    * sound choice. */
  private def boundJson(dt: DataType, v: Any): Option[JValue] = (dt, v) match {
    case (_, null) => None
    case (ByteType | ShortType | IntegerType | LongType, n) =>
      Some(JLong(n.toString.toLong))
    case (StringType, s: String) if s.length <= 256 => Some(JString(s))
    case (BooleanType, b: Boolean) => Some(JBool(b))
    case (DateType, d: java.sql.Date) => Some(JString(d.toString))
    case (_: DecimalType, d: java.math.BigDecimal) => Some(JDecimal(BigDecimal(d)))
    case _ => None
  }

  /** Append `df` to the Delta table at `tableDir`, creating the table
    * (version 0) when no `_delta_log` exists. Returns the committed
    * version. */
  def append(spark: SparkSession, df: DataFrame, tableDir: String,
      partitionBy: Seq[String] = Seq.empty): Long = {
    val schema = df.schema
    partitionBy.foreach(c => if (!schema.fieldNames.contains(c))
      refuse(s"partition column '$c' is not in the data"))
    if (partitionBy.distinct.size != partitionBy.size)
      refuse("duplicate partition columns")
    if (schema.fields.length == partitionBy.size)
      refuse("a table needs at least one data column besides the partition columns")
    if (df.isEmpty) refuse("nothing to append (empty input); an empty commit " +
      "would be indistinguishable from a lost write")

    val logDir = new java.io.File(tableDir, "_delta_log")
    val existing: Seq[(Long, java.io.File)] =
      Option(logDir.listFiles()).getOrElse(Array.empty).toSeq
        .flatMap(f => DeltaLog.versionOf(f.getName).map(_ -> f)).sortBy(_._1)

    // a checkpoint with NO commit JSONs (fully vacuumed log) is still
    // a TABLE — silently starting over at version 0 would fork it
    if (existing.isEmpty && new java.io.File(logDir, "_last_checkpoint").isFile)
      refuse("the log has a checkpoint but no commit JSONs; this writer " +
        "resolves table state from the commit JSONs (v1 scope) and cannot " +
        "safely append — refusing beats forking the table at version 0")

    // append-compat gate against the existing table's metadata
    val version: Long = if (existing.isEmpty) 0L else {
      val commits = existing.map { case (v, f) =>
        v -> new String(java.nio.file.Files.readAllBytes(f.toPath),
          java.nio.charset.StandardCharsets.UTF_8)
      }
      val snap = DeltaLog.snapshotOfE(commits) match {
        case Right(s) => s
        case Left(r) => refuse(s"cannot append to this table: $r " +
          "(append v1 needs the commit JSONs to carry readable metaData)")
      }
      if (snap.minReaderVersion > 2)
        refuse("existing table uses reader version 3 (table features); " +
          "appending through features this writer does not implement could " +
          "violate their invariants")
      if (snap.configuration.getOrElse("delta.columnMapping.mode", "none") != "none")
        refuse("existing table uses column mapping; this writer emits plain names")
      if (snap.partitionColumns != partitionBy)
        refuse(s"partition columns mismatch: table has " +
          s"[${snap.partitionColumns.mkString(", ")}], append asked for " +
          s"[${partitionBy.mkString(", ")}]")
      val existingSchema = Option(snap.schemaJson).flatMap { js =>
        try DataType.fromJson(js) match {
          case st: StructType => Some(st); case _ => None
        } catch { case _: Exception => None }
      }.getOrElse(refuse("existing table has no readable schemaString"))
      val norm = (st: StructType) =>
        st.fields.map(f => (f.name, f.dataType)).toSeq.sortBy(_._1)
      if (norm(existingSchema) != norm(schema))
        refuse(s"schema mismatch: table is ${existingSchema.simpleString}, " +
          s"append carries ${schema.simpleString}; refusing beats silently " +
          "writing a diverged table")
      existing.last._1 + 1
    }

    // ONE distributed write into a temp dir; Hive-style partition
    // layout when partitioned
    val tmp = java.nio.file.Files.createTempDirectory("graft-delta-append").toFile
    val writer = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(tmp.getAbsolutePath)

    // move part files under the table dir, keeping the key=value dirs;
    // Spark's part names carry a fresh UUID, so no collision with any
    // prior commit's files
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    val parts = walk(tmp).filter(f =>
      f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    if (parts.isEmpty) refuse("the data write produced no files")
    val tmpPath = tmp.toPath
    final case class Moved(relPath: String, pv: Seq[(String, Option[String])],
        dest: java.io.File)
    val moved: Seq[Moved] = parts.map { p =>
      val rel = tmpPath.relativize(p.toPath).toString
      val dirs = rel.split('/').dropRight(1)
      val pv = dirs.toSeq.map { d =>
        val i = d.indexOf('=')
        if (i < 0) refuse(s"unexpected non-partition directory '$d' in the write output")
        val key = d.substring(0, i)
        val raw = d.substring(i + 1)
        // Hive's null-partition marker and %-escaping for specials
        key -> (if (raw == "__HIVE_DEFAULT_PARTITION__") None
                else Some(graft.expr.PercentDecodeKernel.decode(raw)))
      }
      val dest = new java.io.File(tableDir, rel)
      dest.getParentFile.mkdirs()
      java.nio.file.Files.move(p.toPath, dest.toPath)
      Moved(rel, pv, dest)
    }
    walk(tmp).foreach(_.delete()); tmp.delete()

    // per-file stats: one cluster aggregation over the written files,
    // grouped by the scan's file path — the stats the data skipper
    // ([[DeltaLog.readTable]]'s pruneWhere) consumes
    val pset = partitionBy.toSet
    val statsCols = schema.fields.toSeq.filterNot(f => pset(f.name))
      .filter(f => DeltaLog.statsComparable(f.dataType))
    val aggs: Seq[org.apache.spark.sql.Column] =
      count(lit(1)).as("__n") +: statsCols.flatMap { f =>
        Seq(min(col(s"`${f.name}`")).as(s"${f.name}__lo"),
          max(col(s"`${f.name}`")).as(s"${f.name}__hi"),
          sum(col(s"`${f.name}`").isNull.cast("long")).as(s"${f.name}__nc"))
      }
    val statRows = spark.read.parquet(moved.map(_.dest.getAbsolutePath): _*)
      .groupBy(col("_metadata.file_path").as("__fp"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    val statsByName: Map[String, Row] =
      statRows.map(r => r.getString(0).substring(r.getString(0).lastIndexOf('/') + 1) -> r).toMap

    def statsJson(fileName: String): Option[String] = statsByName.get(fileName).map { r =>
      // row layout: __fp(0), __n(1), then (lo, hi, nc) per stats column
      val mins = JObject(statsCols.zipWithIndex.flatMap { case (f, i) =>
        boundJson(f.dataType, r.get(2 + 3 * i)).map(f.name -> _) }.toList)
      val maxs = JObject(statsCols.zipWithIndex.flatMap { case (f, i) =>
        boundJson(f.dataType, r.get(3 + 3 * i)).map(f.name -> _) }.toList)
      val ncs = JObject(statsCols.zipWithIndex.map { case (f, i) =>
        f.name -> JLong(r.getLong(4 + 3 * i)) }.toList)
      JsonMethods.compact(JsonMethods.render(
        ("numRecords" -> r.getLong(1)) ~ ("minValues" -> mins) ~
          ("maxValues" -> maxs) ~ ("nullCount" -> ncs)))
    }

    val now = System.currentTimeMillis()
    val addLines = moved.map { m =>
      val pvJson = JObject(m.pv.map { case (k, v) =>
        k -> v.map(JString(_): JValue).getOrElse(JNull) }.toList)
      val base = ("path" -> percentEncode(m.relPath)) ~
        ("partitionValues" -> pvJson) ~
        ("size" -> m.dest.length()) ~
        ("modificationTime" -> now) ~ ("dataChange" -> true)
      JsonMethods.compact(JsonMethods.render("add" ->
        statsJson(m.dest.getName).map(s => base ~ ("stats" -> s)).getOrElse(base)))
    }
    val header: Seq[String] =
      JsonMethods.compact(JsonMethods.render("commitInfo" ->
        (("timestamp" -> now) ~ ("operation" -> "WRITE") ~
          ("operationParameters" -> JObject(Nil))))) +:
        (if (version == 0L) Seq(
          """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
          JsonMethods.compact(JsonMethods.render("metaData" ->
            (("id" -> java.util.UUID.nameUUIDFromBytes(
                s"graft-delta:$tableDir".getBytes(
                  java.nio.charset.StandardCharsets.UTF_8)).toString) ~
              ("format" -> (("provider" -> "parquet") ~
                ("options" -> JObject(Nil)))) ~
              ("schemaString" -> schema.json) ~
              ("partitionColumns" -> partitionBy.toList) ~
              ("configuration" -> JObject(Nil)) ~
              ("createdTime" -> now)))))
         else Seq.empty)

    // ATOMIC EXCLUSIVE publish: the content is written to a temp file,
    // then HARD-LINKED to the version name — link(2) is atomic and
    // FAILS when the target exists (a plain rename would silently
    // replace a racing writer's commit on POSIX). The loser refuses
    // by name.
    logDir.mkdirs()
    val commitTmp = java.io.File.createTempFile(s".graft-commit-$version-", ".tmp", logDir)
    java.nio.file.Files.write(commitTmp.toPath,
      (header ++ addLines).mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val target = new java.io.File(logDir, f"$version%020d.json")
    try java.nio.file.Files.createLink(target.toPath, commitTmp.toPath)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        commitTmp.delete()
        refuse(s"version $version already exists (concurrent writer?); " +
          "conflict resolution is out of the v1 append scope — retry against " +
          "the new table state")
    } finally commitTmp.delete()
    version
  }

  /** CHECKPOINT the table at its latest commit version (round 17,
    * completing the writer story — real writers checkpoint every ~10
    * commits so readers stop replaying the whole JSON history): the
    * driver replays the commit JSONs (log-bounded), writes ONE
    * checkpoint parquet of action rows — metaData + protocol + one
    * add per ACTIVE file with its stats string — and then
    * `_last_checkpoint`. The repo's own reader seeds from it
    * (cluster-side checkpoint merge) exactly as from any writer's.
    * v1 scope: classic single-part checkpoints, no remove tombstones
    * (VACUUM bookkeeping), protocol ≤ 2 (a table-features log needs
    * feature-aware checkpointing); refuses beyond. Returns the
    * checkpointed version. */
  def writeCheckpoint(spark: SparkSession, tableDir: String): Long = {
    val logDir = new java.io.File(tableDir, "_delta_log")
    val commits = Option(logDir.listFiles()).getOrElse(Array.empty).toSeq
      .flatMap(f => DeltaLog.versionOf(f.getName).map(_ -> f)).sortBy(_._1)
      .map { case (v, f) => v -> new String(
        java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8) }
    if (commits.isEmpty) refuse(s"no commits under $tableDir/_delta_log")
    if (commits.map(_._1) != (0L to commits.last._1))
      refuse("the commit history is not contiguous from version 0; " +
        "checkpointing a partial replay would freeze a wrong state")
    val snap = DeltaLog.snapshotOfE(commits) match {
      case Right(s) => s
      case Left(r) => refuse(s"cannot checkpoint: $r")
    }
    if (snap.minReaderVersion > 2)
      refuse("table uses reader version 3 (table features); feature-aware " +
        "checkpointing is out of the v1 scope")
    if (snap.files.exists(_.dv.isDefined))
      refuse("table carries deletion vectors; checkpointing them is out of " +
        "the v1 scope")
    val version = commits.last._1
    import org.apache.spark.sql.types._
    val addType = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType)))
    val metaType = StructType(Seq(
      StructField("id", StringType),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType))))
    val protoType = StructType(Seq(
      StructField("minReaderVersion", LongType),
      StructField("minWriterVersion", LongType)))
    val schema = StructType(Seq(
      StructField("add", addType), StructField("metaData", metaType),
      StructField("protocol", protoType)))
    val rows: Seq[Row] =
      Row(null, Row(snap.tableId, snap.schemaJson,
        snap.partitionColumns, snap.configuration), null) +:
      Row(null, null, Row(snap.minReaderVersion.toLong, 2L)) +:
      snap.files.sortBy(_.path).map(f =>
        Row(Row(f.path, f.partitionValues, f.size, f.modificationTime,
          false, f.stats.orNull), null, null))
    val df = spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    // one part, exact name (the Spark writer names parts itself)
    val tmp = java.nio.file.Files.createTempDirectory("graft-delta-cp").toFile
    df.coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
    val part = Option(tmp.listFiles()).getOrElse(Array.empty)
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(refuse("checkpoint parquet write produced no file"))
    val dest = new java.io.File(logDir, f"$version%020d.checkpoint.parquet")
    java.nio.file.Files.move(part.toPath, dest.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Option(tmp.listFiles()).getOrElse(Array.empty).foreach(_.delete()); tmp.delete()
    java.nio.file.Files.write(new java.io.File(logDir, "_last_checkpoint").toPath,
      s"""{"version":$version,"size":${rows.length}}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    version
  }
}
