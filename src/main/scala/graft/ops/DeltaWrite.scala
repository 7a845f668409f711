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
    * sound choice. Timestamps follow the stats convention every Delta
    * writer uses — ISO-8601 at MILLISECOND precision (the reader's
    * from_json default parse) — so a micros-carrying MAX must round
    * UP to the next millisecond to stay a true upper bound
    * (`roundUp`), while a MIN truncates down. */
  private def boundJson(dt: DataType, v: Any, roundUp: Boolean): Option[JValue] = (dt, v) match {
    case (_, null) => None
    case (ByteType | ShortType | IntegerType | LongType, n) =>
      Some(JLong(n.toString.toLong))
    case (StringType, s: String) if s.length <= 256 => Some(JString(s))
    case (BooleanType, b: Boolean) => Some(JBool(b))
    case (DateType, d: java.sql.Date) => Some(JString(d.toString))
    case (_: DecimalType, d: java.math.BigDecimal) => Some(JDecimal(BigDecimal(d)))
    case (TimestampType, t: java.sql.Timestamp) =>
      Some(JString(isoMillis(t.toInstant, roundUp) + "Z"))
    case (TimestampType, i: java.time.Instant) =>
      Some(JString(isoMillis(i, roundUp) + "Z"))
    case (TimestampNTZType, l: java.time.LocalDateTime) =>
      Some(JString(isoMillis(l.toInstant(java.time.ZoneOffset.UTC), roundUp)))
    case _ => None
  }

  private val msFmt = java.time.format.DateTimeFormatter
    .ofPattern("uuuu-MM-dd'T'HH:mm:ss.SSS")
    .withZone(java.time.ZoneOffset.UTC)
  private def isoMillis(i: java.time.Instant, roundUp: Boolean): String = {
    val subMs = i.getNano % 1000000
    val adj = if (roundUp && subMs != 0) i.plusNanos((1000000 - subMs).toLong) else i
    msFmt.format(adj)
  }

  /** Append `df` to the Delta table at `tableDir`, creating the table
    * (version 0) when no `_delta_log` exists. `txn = (appId, version)`
    * rides a `txn` action in the commit and makes the append
    * IDEMPOTENT per the protocol's application-transaction rule: when
    * the table has already recorded `appId` at a version ≥ this one,
    * the append is a NO-OP (returns the current table version) — the
    * restart/replay contract a streaming sink needs. Returns the
    * committed version.
    *
    * `mergeSchema = true` (round 18) permits SCHEMA EVOLUTION: new
    * nullable columns append to the table schema (same-name columns
    * must keep their types; dropping columns refuses) and the commit
    * carries the merged metaData — pre-evolution files read back with
    * the new columns null-filled, because the reader scans under the
    * log's authoritative schemaString. */
  def append(spark: SparkSession, df: DataFrame, tableDir: String,
      partitionBy: Seq[String] = Seq.empty,
      txn: Option[(String, Long)] = None,
      mergeSchema: Boolean = false): Long =
    write(spark, df, tableDir, partitionBy, overwriteMode = None, txn = txn,
      mergeSchema = mergeSchema)

  /** REPLACE write (round 18): the new data and `remove` tombstones
    * for the replaced files land in ONE commit, so readers never see
    * a half-replaced table and [[DeltaLog.readChanges]] synthesizes
    * the deletes+inserts across the version. `dynamic = false`
    * replaces the WHOLE table; `dynamic = true` replaces exactly the
    * partitions PRESENT in `df` (the re-curation pattern — refresh
    * this month's partition, leave the rest). Returns the committed
    * version. */
  def overwrite(spark: SparkSession, df: DataFrame, tableDir: String,
      partitionBy: Seq[String] = Seq.empty, dynamic: Boolean = false): Long = {
    if (dynamic && partitionBy.isEmpty)
      refuse("dynamic partition overwrite needs partition columns")
    write(spark, df, tableDir, partitionBy, overwriteMode = Some(dynamic),
      txn = None, mergeSchema = false)
  }

  /** One row of the staged-write publish: the table-relative path,
    * its Hive partition values, and the published file's identity. */
  private final case class Moved(relPath: String,
      pv: Seq[(String, Option[String])], destPath: String, name: String,
      size: Long)

  /** Stage `df` as data files under the table root, publish them
    * under commit-unique names, and build their fully-statted `add`
    * actions — the shared distributed-write core of [[write]] and
    * [[merge]]. */
  private def stageAdds(spark: SparkSession, df: DataFrame,
      tableDir: String, partitionBy: Seq[String], schema: StructType,
      now: Long, dataChange: Boolean): (Seq[Moved], Seq[String]) = {
    // ONE distributed write into a STAGE dir under the table root
    // (same filesystem as the destination whatever the scheme, so the
    // per-file publish below is a rename, never a copy); Hive-style
    // partition layout when partitioned. The dot-prefix keeps any
    // directory-globbing scan from seeing half-staged files.
    val stage = s"$tableDir/.graft-stage-${java.util.UUID.randomUUID()}"
    val writer = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(stage)

    // move part files under the table dir, keeping the key=value dirs;
    // Spark's part names carry a fresh UUID, so no collision with any
    // prior commit's files
    val parts = TableIo.walkRel(stage).filter { r =>
      val n = r.split('/').last
      n.startsWith("part-") && n.endsWith(".parquet")
    }
    if (parts.isEmpty) refuse("the data write produced no files")
    val moved: Seq[Moved] = parts.zipWithIndex.map { case (srcRel, idx) =>
      val dirs = srcRel.split('/').dropRight(1)
      val pv = dirs.toSeq.map { d =>
        val i = d.indexOf('=')
        if (i < 0) refuse(s"unexpected non-partition directory '$d' in the write output")
        val key = d.substring(0, i)
        val raw = d.substring(i + 1)
        // Hive's null-partition marker and %-escaping for specials
        key -> (if (raw == "__HIVE_DEFAULT_PARTITION__") None
                else Some(graft.expr.PercentDecodeKernel.decode(raw)))
      }
      // a partitioned Spark write reuses ONE task's part name under
      // every partition dir it writes (part-00000-<uuid>.c000.… under
      // each key=value/), so the basename alone cannot key the
      // per-file stats rows below — publish under a name unique
      // across the whole commit instead (ADVICE r17 #1)
      val base = srcRel.split('/').last
      val ext = base.dropWhile(_ != '.') // ".c000.snappy.parquet" etc.
      val name = f"part-$idx%05d-${java.util.UUID.randomUUID()}$ext"
      val rel = (dirs :+ name).mkString("/")
      val destPath = s"$tableDir/$rel"
      if (dirs.nonEmpty) TableIo.mkdirs(s"$tableDir/${dirs.mkString("/")}")
      TableIo.rename(s"$stage/$srcRel", destPath)
      Moved(rel, pv, destPath, name, TableIo.size(destPath))
    }
    TableIo.delete(stage, recursive = true)

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
    val statRows = spark.read.parquet(moved.map(_.destPath): _*)
      .groupBy(col("_metadata.file_path").as("__fp"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    // basenames are unique across the commit by construction (the
    // rename above); a missing or ambiguous lookup means the stats
    // would be attached to the WRONG file — the skipper would then
    // prune files whose rows match. Refuse, never guess.
    val statsByName: Map[String, Row] =
      statRows.map(r => r.getString(0).substring(r.getString(0).lastIndexOf('/') + 1) -> r).toMap
    if (statsByName.size != statRows.length)
      refuse("per-file stats rows collide by basename; cannot attribute stats safely")

    // a staged part with NO stats row must be genuinely EMPTY (a
    // shuffle partition that owned no rows — joins/unions produce
    // them); verify and DROP it rather than publish a zero-row file.
    // A non-empty file without a stats row is an attribution bug:
    // refuse, never guess.
    val (statted, empties) = moved.partition(m => statsByName.contains(m.name))
    empties.foreach { m =>
      if (spark.read.parquet(m.destPath).count() != 0L)
        refuse(s"no stats row for written file '${m.name}'; attaching none " +
          "(or a wrong one) would let the data skipper prune live rows")
      TableIo.delete(m.destPath)
    }
    if (statted.isEmpty) refuse("the data write produced only empty files")

    def statsJson(fileName: String): String = {
      val r = statsByName.getOrElse(fileName, refuse(
        s"no stats row for written file '$fileName'; attaching none (or a " +
          "wrong one) would let the data skipper prune live rows"))
      // row layout: __fp(0), __n(1), then (lo, hi, nc) per stats column
      val mins = JObject(statsCols.zipWithIndex.flatMap { case (f, i) =>
        boundJson(f.dataType, r.get(2 + 3 * i), roundUp = false).map(f.name -> _) }.toList)
      val maxs = JObject(statsCols.zipWithIndex.flatMap { case (f, i) =>
        boundJson(f.dataType, r.get(3 + 3 * i), roundUp = true).map(f.name -> _) }.toList)
      val ncs = JObject(statsCols.zipWithIndex.map { case (f, i) =>
        f.name -> JLong(r.getLong(4 + 3 * i)) }.toList)
      JsonMethods.compact(JsonMethods.render(
        ("numRecords" -> r.getLong(1)) ~ ("minValues" -> mins) ~
          ("maxValues" -> maxs) ~ ("nullCount" -> ncs)))
    }

    val addLines = statted.map { m =>
      val pvJson = JObject(m.pv.map { case (k, v) =>
        k -> v.map(JString(_): JValue).getOrElse(JNull) }.toList)
      val base = ("path" -> percentEncode(m.relPath)) ~
        ("partitionValues" -> pvJson) ~
        ("size" -> m.size) ~
        ("modificationTime" -> now) ~ ("dataChange" -> dataChange)
      JsonMethods.compact(JsonMethods.render("add" ->
        (base ~ ("stats" -> statsJson(m.name)))))
    }
    (statted, addLines)
  }

  /** The shared write core: `overwriteMode` None = append,
    * Some(dynamic) = overwrite. */
  private def write(spark: SparkSession, df: DataFrame, tableDir: String,
      partitionBy: Seq[String], overwriteMode: Option[Boolean],
      txn: Option[(String, Long)], mergeSchema: Boolean = false): Long = {
    val schema = df.schema
    partitionBy.foreach(c => if (!schema.fieldNames.contains(c))
      refuse(s"partition column '$c' is not in the data"))
    if (partitionBy.distinct.size != partitionBy.size)
      refuse("duplicate partition columns")
    if (schema.fields.length == partitionBy.size)
      refuse("a table needs at least one data column besides the partition columns")
    if (df.isEmpty) refuse("nothing to append (empty input); an empty commit " +
      "would be indistinguishable from a lost write")

    val logDir = s"$tableDir/_delta_log"
    val logEntries = TableIo.list(logDir)
    // set when THIS commit evolves the table schema (mergeSchema)
    var evolved: Option[StructType] = None
    val existing: Seq[(Long, String)] =
      logEntries.flatMap(e => DeltaLog.versionOf(e.name).map(_ -> e.name)).sortBy(_._1)

    // a checkpoint with NO commit JSONs (fully vacuumed log) is still
    // a TABLE — silently starting over at version 0 would fork it
    if (existing.isEmpty && logEntries.exists(_.name == "_last_checkpoint"))
      refuse("the log has a checkpoint but no commit JSONs; this writer " +
        "resolves table state from the commit JSONs (v1 scope) and cannot " +
        "safely append — refusing beats forking the table at version 0")

    // write-compat gate against the existing table's metadata
    val snapOpt: Option[DeltaLog.Snapshot] = if (existing.isEmpty) None else {
      val commits = existing.map { case (v, n) =>
        v -> TableIo.readString(s"$logDir/$n")
      }
      val snap = DeltaLog.snapshotOfE(commits) match {
        case Right(s) => s
        case Left(r) => refuse(s"cannot write to this table: $r " +
          "(the v1 writer needs the commit JSONs to carry readable metaData)")
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
      if (norm(existingSchema) != norm(schema)) {
        if (!mergeSchema)
          refuse(s"schema mismatch: table is ${existingSchema.simpleString}, " +
            s"the write carries ${schema.simpleString}; refusing beats silently " +
            "writing a diverged table (mergeSchema = true evolves by adding " +
            "columns)")
        // SCHEMA EVOLUTION (round 18): add-only — every existing
        // column must arrive with its existing type; new columns
        // append. Dropping or retyping silently loses data, so both
        // refuse.
        val exByName = existingSchema.fields.map(f => f.name -> f).toMap
        val dropped = existingSchema.fields.map(_.name)
          .filterNot(schema.fieldNames.contains)
        if (dropped.nonEmpty)
          refuse(s"mergeSchema cannot DROP columns (${dropped.mkString(", ")}); " +
            "a write missing them would silently null existing data")
        schema.fields.filter(f => exByName.contains(f.name)).foreach { f =>
          if (exByName(f.name).dataType != f.dataType)
            refuse(s"mergeSchema cannot RETYPE column '${f.name}' " +
              s"(${exByName(f.name).dataType.simpleString} -> " +
              s"${f.dataType.simpleString})")
        }
        val newFields = schema.fields.filterNot(f => exByName.contains(f.name))
          .map(_.copy(nullable = true))
        evolved = Some(StructType(existingSchema.fields ++ newFields))
      }
      Some(snap)
    }
    // application-transaction idempotence: an epoch the table already
    // recorded is a REPLAY — succeed without writing anything
    txn.foreach { case (appId, txnVer) =>
      if (snapOpt.exists(_.txns.get(appId).exists(_ >= txnVer)))
        return existing.last._1
    }
    val version: Long = snapOpt.map(_ => existing.last._1 + 1).getOrElse(0L)

    val now = System.currentTimeMillis()
    val (moved, addLines) = stageAdds(spark, df, tableDir, partitionBy,
      schema, now, dataChange = true)
    // REPLACE: `remove` tombstones for the displaced files ride the
    // SAME commit as the adds (one atomic version). A tombstone's
    // partition values normalize to present-keys-only (null values
    // serialize as JSON null and the replay drops them), so dynamic
    // matching compares like with like.
    val removed: Seq[DeltaLog.AddFile] = overwriteMode match {
      case None => Seq.empty
      case Some(false) => snapOpt.map(_.files).getOrElse(Seq.empty)
      case Some(true) =>
        val written: Set[Map[String, String]] =
          moved.map(_.pv.collect { case (k, Some(v)) => k -> v }.toMap).toSet
        snapOpt.map(_.files).getOrElse(Seq.empty)
          .filter(f => written(f.partitionValues))
    }
    val removeLines = removed.map { f =>
      JsonMethods.compact(JsonMethods.render("remove" ->
        (("path" -> percentEncode(f.path)) ~
          ("deletionTimestamp" -> now) ~ ("dataChange" -> true) ~
          ("extendedFileMetadata" -> true) ~
          ("partitionValues" -> JObject(f.partitionValues.toList.map {
            case (k, v) => k -> (JString(v): JValue) })) ~
          ("size" -> f.size))))
    }
    val header: Seq[String] =
      (JsonMethods.compact(JsonMethods.render("commitInfo" ->
        (("timestamp" -> now) ~ ("operation" -> "WRITE") ~
          ("operationParameters" -> JObject(List("mode" ->
            (JString(if (overwriteMode.isDefined) "Overwrite" else "Append"): JValue))))))) +:
        txn.toSeq.map { case (appId, txnVer) =>
          JsonMethods.compact(JsonMethods.render("txn" ->
            (("appId" -> appId) ~ ("version" -> txnVer) ~
              ("lastUpdated" -> now))))
        }) ++
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
         else evolved.toSeq.map { ev =>
          // the evolution commit carries the MERGED metaData — the
          // replay's last-metaData-wins rule makes it the table schema
          JsonMethods.compact(JsonMethods.render("metaData" ->
            (("id" -> snapOpt.get.tableId) ~
              ("format" -> (("provider" -> "parquet") ~
                ("options" -> JObject(Nil)))) ~
              ("schemaString" -> ev.json) ~
              ("partitionColumns" -> partitionBy.toList) ~
              ("configuration" -> JObject(snapOpt.get.configuration.toList.map {
                case (k, v) => k -> (JString(v): JValue) })))))
        })

    // EXCLUSIVE publish via [[TableIo.writeExclusive]] (locally the
    // atomic POSIX hard-link protocol; remotely create-no-overwrite).
    // The loser of a race refuses by name.
    TableIo.mkdirs(logDir)
    val bytes = (header ++ addLines ++ removeLines).mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (!TableIo.writeExclusive(s"$logDir/" + f"$version%020d.json", bytes))
      refuse(s"version $version already exists (concurrent writer?); " +
        "conflict resolution is out of the v1 append scope — retry against " +
        "the new table state")
    version
  }

  /** OPTIMIZE-style bin-packed COMPACTION (round 18): rewrite each
    * partition's small active files into fewer, larger ones and
    * commit the swap with `dataChange = false` adds + removes — the
    * protocol's marker for "same rows, different files", which
    * [[DeltaLog.readChanges]] (and every spec-conforming CDF reader)
    * skips, so the change feed across a compaction version is EMPTY.
    * Time travel to pre-compaction versions still works (tombstoned
    * files stay on disk). Files ≥ `targetBytes` — or alone in their
    * partition — are left untouched. Returns Some(committed version),
    * or None when no partition had anything to compact.
    *
    * Z-ORDERING (round 18): `zOrderBy` interleaves the bits of the
    * named columns' rank-scaled values into ONE clustering key and
    * range-partitions + sorts the rewrite on it — OPTIMIZE ZORDER BY:
    * every named column's per-file min/max bounds become tight
    * SIMULTANEOUSLY, so the round-17 stats skipper prunes on ANY of
    * them (linear clustering tightens only its leading column). With
    * `zOrderBy` set, EVERY active file of each partition is rewritten
    * (re-layout is the point, not just small-file cleanup). Numeric /
    * date / timestamp columns only (rank scaling needs a total order
    * with arithmetic); 1–4 columns (16 bits each in the 64-bit key).
    *
    * Scale shape: one distributed read+write per touched partition
    * tuple (parallel within the job), one stats aggregation per
    * rewrite (plus a min/max agg per rewrite for the z-scaling),
    * metadata-bounded driver work for the commit itself. */
  def compact(spark: SparkSession, tableDir: String,
      targetBytes: Long = 128L << 20,
      zOrderBy: Seq[String] = Seq.empty): Option[Long] = {
    if (targetBytes <= 0) refuse("targetBytes must be positive")
    val logDir = s"$tableDir/_delta_log"
    val existing: Seq[(Long, String)] =
      TableIo.list(logDir)
        .flatMap(e => DeltaLog.versionOf(e.name).map(_ -> e.name)).sortBy(_._1)
    if (existing.isEmpty) refuse(s"no commits under $tableDir/_delta_log")
    // compaction DELETES (tombstones) files based on the replayed
    // state — a partial history would compact against wrong state
    if (existing.map(_._1) != (0L to existing.last._1))
      refuse("the commit history is not contiguous from version 0; compacting " +
        "against a partial replay risks tombstoning live files")
    val commits = existing.map { case (v, n) =>
      v -> TableIo.readString(s"$logDir/$n")
    }
    val snap = DeltaLog.snapshotOfE(commits) match {
      case Right(s) => s
      case Left(r) => refuse(s"cannot compact this table: $r")
    }
    if (snap.minReaderVersion > 2)
      refuse("table uses reader version 3 (table features); compacting through " +
        "features this writer does not implement is out of the v1 scope")
    if (snap.configuration.getOrElse("delta.columnMapping.mode", "none") != "none")
      refuse("table uses column mapping; this writer rewrites plain names")
    if (snap.files.exists(_.dv.isDefined))
      refuse("table carries deletion vectors; rewriting DV'd files without " +
        "applying the vectors would resurrect deleted rows")
    val schema = Option(snap.schemaJson).flatMap { js =>
      try DataType.fromJson(js) match {
        case st: StructType => Some(st); case _ => None
      } catch { case _: Exception => None }
    }.getOrElse(refuse("table has no readable schemaString"))
    val pset = snap.partitionColumns.toSet

    zOrderBy.foreach { c =>
      if (pset(c)) refuse(s"z-order column '$c' is a partition column " +
        "(constant per file; clustering on it is meaningless)")
      if (!schema.fieldNames.contains(c))
        refuse(s"z-order column '$c' is not in the table schema")
    }
    if (zOrderBy.size > 4) refuse("z-order supports 1..4 columns (16 bits each)")

    // per-partition bins: every partition tuple with ≥2 sub-target
    // files gets ONE rewrite (the distributed write re-splits at
    // maxRecordsPerFile scale only if huge; small-file cleanup is the
    // point here). Z-ordering instead rewrites EVERY active file —
    // the re-layout is the point.
    val byPartition: Seq[(Map[String, String], Seq[DeltaLog.AddFile])] =
      snap.files.groupBy(_.partitionValues).toSeq
        .map { case (pv, fs) =>
          pv -> (if (zOrderBy.nonEmpty) fs else fs.filter(_.size < targetBytes)) }
        .filter(_._2.lengthCompare(if (zOrderBy.nonEmpty) 1 else 2) >= 0)
        .sortBy(_._2.map(_.path).min)
    if (byPartition.isEmpty) return None

    val statsCols = schema.fields.toSeq.filterNot(f => pset(f.name))
      .filter(f => DeltaLog.statsComparable(f.dataType))
    val aggs: Seq[org.apache.spark.sql.Column] =
      count(lit(1)).as("__n") +: statsCols.flatMap { f =>
        Seq(min(col(s"`${f.name}`")).as(s"${f.name}__lo"),
          max(col(s"`${f.name}`")).as(s"${f.name}__hi"),
          sum(col(s"`${f.name}`").isNull.cast("long")).as(s"${f.name}__nc"))
      }

    final case class Rewritten(relPath: String, pv: Map[String, String],
        destPath: String, size: Long, stats: String,
        removed: Seq[DeltaLog.AddFile])
    val rewrites: Seq[Rewritten] = byPartition.flatMap { case (pv, olds) =>
      val srcPaths = olds.map(f => s"$tableDir/${f.path}")
      val totalBytes = olds.map(_.size).sum
      val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
      val stage = s"$tableDir/.graft-stage-${java.util.UUID.randomUUID()}"
      val src = spark.read.parquet(srcPaths: _*)
      val shaped =
        if (zOrderBy.isEmpty) src.repartition(nOut)
        else src.withColumn("__graft_z", zValue(src, zOrderBy, schema))
          .repartitionByRange(math.max(nOut, 2), col("__graft_z"))
          .sortWithinPartitions("__graft_z")
          .drop("__graft_z")
      shaped.write.mode("overwrite").parquet(stage)
      val parts = TableIo.walkRel(stage)
        .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      if (parts.isEmpty) refuse("the compaction write produced no files")
      val moved = parts.zipWithIndex.map { case (p, idx) =>
        val ext = p.dropWhile(_ != '.')
        // flat layout: the log's add.partitionValues is the source of
        // truth, the reader never derives partitions from directories
        val name = f"part-c$idx%03d-${java.util.UUID.randomUUID()}$ext"
        TableIo.rename(s"$stage/$p", s"$tableDir/$name")
        name
      }
      TableIo.delete(stage, recursive = true)
      val statRowList = spark.read.parquet(moved.map(n => s"$tableDir/$n"): _*)
        .groupBy(col("_metadata.file_path").as("__fp"))
        .agg(aggs.head, aggs.tail: _*)
        .collect()
      val statRows: Map[String, Row] = statRowList
        .map(r => r.getString(0).substring(r.getString(0).lastIndexOf('/') + 1) -> r).toMap
      if (statRows.size != statRowList.length)
        refuse("per-file stats rows collide by basename; cannot attribute stats safely")
      moved.zipWithIndex.map { case (name, i) =>
        val r = statRows.getOrElse(name, refuse(
          s"no stats row for compacted file '$name'"))
        val mins = JObject(statsCols.zipWithIndex.flatMap { case (f, j) =>
          boundJson(f.dataType, r.get(2 + 3 * j), roundUp = false).map(f.name -> _) }.toList)
        val maxs = JObject(statsCols.zipWithIndex.flatMap { case (f, j) =>
          boundJson(f.dataType, r.get(3 + 3 * j), roundUp = true).map(f.name -> _) }.toList)
        val ncs = JObject(statsCols.zipWithIndex.map { case (f, j) =>
          f.name -> JLong(r.getLong(4 + 3 * j)) }.toList)
        val stats = JsonMethods.compact(JsonMethods.render(
          ("numRecords" -> r.getLong(1)) ~ ("minValues" -> mins) ~
            ("maxValues" -> maxs) ~ ("nullCount" -> ncs)))
        Rewritten(name, pv, s"$tableDir/$name", TableIo.size(s"$tableDir/$name"),
          stats, if (i == 0) olds else Seq.empty) // removes attached once per bin
      }
    }

    val now = System.currentTimeMillis()
    val addLines = rewrites.map { rw =>
      JsonMethods.compact(JsonMethods.render("add" ->
        (("path" -> percentEncode(rw.relPath)) ~
          ("partitionValues" -> JObject(rw.pv.toList.map {
            case (k, v) => k -> (JString(v): JValue) })) ~
          ("size" -> rw.size) ~
          ("modificationTime" -> now) ~ ("dataChange" -> false) ~
          ("stats" -> rw.stats))))
    }
    val removeLines = rewrites.flatMap(_.removed).map { f =>
      JsonMethods.compact(JsonMethods.render("remove" ->
        (("path" -> percentEncode(f.path)) ~
          ("deletionTimestamp" -> now) ~ ("dataChange" -> false) ~
          ("extendedFileMetadata" -> true) ~
          ("partitionValues" -> JObject(f.partitionValues.toList.map {
            case (k, v) => k -> (JString(v): JValue) })) ~
          ("size" -> f.size))))
    }
    val commitInfoLine = JsonMethods.compact(JsonMethods.render("commitInfo" ->
      (("timestamp" -> now) ~ ("operation" -> "OPTIMIZE") ~
        ("operationParameters" -> JObject(Nil)))))
    val version = existing.last._1 + 1
    TableIo.mkdirs(logDir)
    val bytes = ((commitInfoLine +: addLines) ++ removeLines).mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (!TableIo.writeExclusive(s"$logDir/" + f"$version%020d.json", bytes))
      refuse(s"version $version already exists (concurrent writer?); " +
        "conflict resolution is out of the v1 scope — retry against the " +
        "new table state")
    Some(version)
  }

  /** MERGE / UPSERT BY KEY (round 18): apply `source` to the table —
    * target rows whose `keys` match a source row are REPLACED by it,
    * source rows matching nothing are INSERTED, all in ONE commit.
    * File-targeted, the property that makes MERGE usable at 100 TB:
    * only the files that actually CONTAIN matched keys rewrite — the
    * matched-file discovery is a distributed semi-join of the scan
    * against the source keys, collecting only distinct FILE PATHS
    * (bounded by the table's file count), and the rewrite reads only
    * those files, anti-joins the keys out, unions the source, and
    * stages new files; untouched files keep their add actions.
    * Adds + removes carry `dataChange = true`, so the change feed
    * shows the rewritten files' rows as deletes + inserts (the
    * protocol's synthesis for cdc-less commits).
    *
    * Semantics: upsert by PRIMARY KEY — duplicate keys in `source`
    * refuse (which source row wins would be arbitrary); multiple
    * target rows under one key are all replaced by the one source
    * row. v1 scope: unpartitioned tables (partitioned merges need
    * the partition values re-derived per kept row), same schema, no
    * column mapping / DVs / reader-v3. Returns the committed
    * version. */
  def merge(spark: SparkSession, source: DataFrame, tableDir: String,
      keys: Seq[String]): Long = {
    if (keys.isEmpty) refuse("merge needs at least one key column")
    val schema = source.schema
    keys.foreach(k => if (!schema.fieldNames.contains(k))
      refuse(s"merge key '$k' is not in the source"))
    if (source.isEmpty) refuse("nothing to merge (empty source)")
    val logDir = s"$tableDir/_delta_log"
    val existing: Seq[(Long, String)] =
      TableIo.list(logDir)
        .flatMap(e => DeltaLog.versionOf(e.name).map(_ -> e.name)).sortBy(_._1)
    if (existing.isEmpty) refuse(s"no commits under $tableDir/_delta_log")
    if (existing.map(_._1) != (0L to existing.last._1))
      refuse("the commit history is not contiguous from version 0; merging " +
        "against a partial replay would tombstone wrong files")
    val commits = existing.map { case (v, n) =>
      v -> TableIo.readString(s"$logDir/$n") }
    val snap = DeltaLog.snapshotOfE(commits) match {
      case Right(s) => s
      case Left(r) => refuse(s"cannot merge into this table: $r")
    }
    if (snap.minReaderVersion > 2)
      refuse("existing table uses reader version 3 (table features); " +
        "out of the v1 scope")
    if (snap.configuration.getOrElse("delta.columnMapping.mode", "none") != "none")
      refuse("existing table uses column mapping; this writer emits plain names")
    if (snap.files.exists(_.dv.isDefined))
      refuse("table carries deletion vectors; rewriting DV'd files without " +
        "applying the vectors would resurrect deleted rows")
    if (snap.partitionColumns.nonEmpty)
      refuse("merge into a partitioned table is out of the v1 scope " +
        "(kept rows would need their partition values re-derived)")
    val tableSchema = Option(snap.schemaJson).flatMap { js =>
      try DataType.fromJson(js) match {
        case st: StructType => Some(st); case _ => None
      } catch { case _: Exception => None }
    }.getOrElse(refuse("existing table has no readable schemaString"))
    val norm = (st: StructType) =>
      st.fields.map(f => (f.name, f.dataType)).toSeq.sortBy(_._1)
    if (norm(tableSchema) != norm(schema))
      refuse(s"schema mismatch: table is ${tableSchema.simpleString}, " +
        s"the merge source carries ${schema.simpleString}")
    // duplicate source keys: which row wins would be arbitrary
    val keyCols = keys.map(k => col(s"`$k`"))
    val dupRow = source.groupBy(keyCols: _*).count().where(col("count") > 1)
    if (!dupRow.isEmpty)
      refuse("the merge source carries duplicate keys; which row wins " +
        "would be arbitrary — deduplicate upstream")

    // matched-file discovery: distributed semi-join, only FILE PATHS
    // reach the driver (bounded by the file count)
    val paths = snap.files.map(f => s"$tableDir/${f.path}")
    val scan = spark.read.schema(tableSchema).parquet(paths: _*)
    val srcKeys = source.select(keyCols: _*).distinct()
    val matchedFps: Seq[String] = scan
      .withColumn("__graft_fp", col("_metadata.file_path"))
      .join(srcKeys, keys, "left_semi")
      .select("__graft_fp").distinct()
      .collect().map(_.getString(0)).toSeq
    // map the scan spelling back to the log's table-relative path
    val relByForm: Map[String, String] = snap.files.flatMap(f =>
      keyForms(s"$tableDir/${f.path}").map(_ -> f.path)).toMap
    val matchedRel: Set[String] = matchedFps.map(fp => relByForm.getOrElse(fp,
      refuse(s"merge: matched scan path '$fp' did not resolve to a log path"))).toSet
    val removed = snap.files.filter(f => matchedRel(f.path))

    val now = System.currentTimeMillis()
    // rewrite = kept rows of the matched files + the whole source
    val newData = (if (removed.isEmpty) source else {
      // AQE converts this anti-join to broadcast when the distinct
      // source keys are small (the common upsert shape) and keeps
      // sort-merge for a giant source — no forced hint either way
      val kept = spark.read.schema(tableSchema)
        .parquet(removed.map(f => s"$tableDir/${f.path}"): _*)
        .join(srcKeys, keys, "left_anti")
      kept.unionByName(source)
    }).select(tableSchema.fieldNames.map(n => col(s"`$n`")): _*)
    val (_, addLines) = stageAdds(spark, newData, tableDir, Seq.empty,
      tableSchema, now, dataChange = true)
    val removeLines = removed.map { f =>
      JsonMethods.compact(JsonMethods.render("remove" ->
        (("path" -> percentEncode(f.path)) ~
          ("deletionTimestamp" -> now) ~ ("dataChange" -> true) ~
          ("extendedFileMetadata" -> true) ~
          ("partitionValues" -> JObject(Nil)) ~
          ("size" -> f.size))))
    }
    val commitInfoLine = JsonMethods.compact(JsonMethods.render("commitInfo" ->
      (("timestamp" -> now) ~ ("operation" -> "MERGE") ~
        ("operationParameters" -> JObject(List("keys" ->
          (JString(keys.mkString(",")): JValue)))))))
    val version = existing.last._1 + 1
    val bytes = ((commitInfoLine +: addLines) ++ removeLines).mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (!TableIo.writeExclusive(s"$logDir/" + f"$version%020d.json", bytes))
      refuse(s"version $version already exists (concurrent writer?); " +
        "conflict resolution is out of the v1 scope — retry against the " +
        "new table state")
    version
  }

  private def keyForms(p: String): Seq[String] = DeltaLog.keyForms(p)

  /** The 64-bit Z-curve key: each column rank-scales linearly into
    * 16 bits by its own min/max over the frame being rewritten, and
    * the bits interleave (bit b of column j lands at position
    * b·ncols + j) — a pure `functions._` expression tree (shifts,
    * masks, ors), fully whole-stage-codegen'd. NULLs scale to the
    * low end (they cluster together, which is what a skipper wants).
    * Linear scaling is the standard engineering trade vs true rank
    * (quantile) scaling: monotone, one agg instead of a sort, and
    * skewed distributions degrade clustering quality, not
    * correctness. */
  private def zValue(src: DataFrame, cols: Seq[String],
      schema: StructType): org.apache.spark.sql.Column = {
    val numeric: Seq[org.apache.spark.sql.Column] = cols.map { c =>
      schema.fields.find(_.name == c).get.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          col(s"`$c`").cast("double")
        case _: DecimalType => col(s"`$c`").cast("double")
        case DateType =>
          datediff(col(s"`$c`"), lit(java.sql.Date.valueOf("1970-01-01")))
            .cast("double")
        case TimestampType => unix_micros(col(s"`$c`")).cast("double")
        case other => refuse(s"z-order on ${other.simpleString} ('$c') is out " +
          "of the v1 scope (numeric/date/timestamp only — rank scaling needs " +
          "arithmetic on a total order)")
      }
    }
    val aggs = numeric.zipWithIndex.flatMap { case (e, i) =>
      Seq(min(e).as(s"__zlo$i"), max(e).as(s"__zhi$i")) }
    val r = src.agg(aggs.head, aggs.tail: _*).head()
    val scaled: Seq[org.apache.spark.sql.Column] = numeric.zipWithIndex.map {
      case (e, i) =>
        val lo = if (r.isNullAt(2 * i)) 0.0 else r.getDouble(2 * i)
        val hi = if (r.isNullAt(2 * i + 1)) 0.0 else r.getDouble(2 * i + 1)
        val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
        least(lit(65535L), greatest(lit(0L),
          floor((coalesce(e, lit(lo)) - lit(lo)) / lit(span) * 65535.0)
            .cast("long")))
    }
    val n = scaled.size
    (0 until 16).foldLeft(lit(0L)) { (acc, bit) =>
      scaled.zipWithIndex.foldLeft(acc) { case (a, (sc, j)) =>
        a.bitwiseOR(shiftleft(shiftright(sc, bit).bitwiseAND(lit(1L)),
          bit * n + j))
      }
    }
  }

  /** VACUUM (round 18): physically delete data files that are NOT in
    * the current active set and whose tombstone deletionTimestamp
    * (else the file's own mtime) is older than `retentionMillis` —
    * the storage-reclaim half of [[overwrite]]/[[compact]]'s
    * tombstones. Protocol-shaped guardrails: active files are never
    * touched whatever their age, `_delta_log/` and `_change_data/`
    * (CDC files, governed by their own retention) are never scanned,
    * dot-prefixed stage debris is skipped, and a non-contiguous
    * history refuses — a partial replay could call a LIVE file
    * unreferenced. After a vacuum, time travel to versions that
    * needed the deleted files correctly fails at scan time (the
    * protocol's documented trade). Returns the deleted
    * table-relative paths.
    *
    * Scale shape: one metadata-bounded log replay plus one recursive
    * listing of the table dir; deletes are issued per file from the
    * driver — at object-store scale the listing IS the cost, and it
    * is unavoidable for vacuum by definition. */
  def vacuum(spark: SparkSession, tableDir: String,
      retentionMillis: Long = 7L * 24 * 3600 * 1000): Seq[String] = {
    if (retentionMillis < 0) refuse("retention must be ≥ 0")
    val logDir = s"$tableDir/_delta_log"
    val existing: Seq[(Long, String)] =
      TableIo.list(logDir)
        .flatMap(e => DeltaLog.versionOf(e.name).map(_ -> e.name)).sortBy(_._1)
    if (existing.isEmpty) refuse(s"no commits under $tableDir/_delta_log")
    if (existing.map(_._1) != (0L to existing.last._1))
      refuse("the commit history is not contiguous from version 0; vacuuming " +
        "against a partial replay risks deleting live files")
    val commits = existing.map { case (v, n) =>
      v -> TableIo.readString(s"$logDir/$n") }
    val snap = DeltaLog.snapshotOfE(commits) match {
      case Right(s) => s
      case Left(r) => refuse(s"cannot vacuum this table: $r")
    }
    val active: Set[String] = snap.files.map(_.path).toSet
    val tombTs: Map[String, Long] = snap.tombstones
      .flatMap(t => t.deletionTimestamp.map(t.path -> _)).toMap
    val cutoff = System.currentTimeMillis() - retentionMillis
    val deleted = TableIo.walkRel(tableDir)
      .filter { rel =>
        rel.endsWith(".parquet") && !active.contains(rel) &&
          rel.split('/').forall(seg =>
            !seg.startsWith(".") && !seg.startsWith("_"))
      }
      .filter { rel =>
        tombTs.get(rel)
          .getOrElse(TableIo.lastModified(s"$tableDir/$rel")) <= cutoff
      }
      .sorted
    deleted.foreach(rel => TableIo.delete(s"$tableDir/$rel"))
    deleted
  }

  /** RESTORE (round 18): roll the table BACK to the state of
    * `version` as a NEW commit — re-`add` the files active then but
    * not now (original partitionValues/size/stats carried verbatim),
    * `remove` the files active now but not then, both with
    * `dataChange = true` so the change feed shows the rollback as
    * deletes + re-inserts (exactly Delta's RESTORE semantics). The
    * target's metaData rides the commit when its schema or partition
    * columns differ from the current ones. Re-added files must still
    * exist on disk — a vacuumed target refuses by name. History is
    * preserved: the restore is itself a version, and travel to the
    * in-between versions still works. Returns the committed version
    * (the current one when the table is already at the target
    * state). */
  def restore(spark: SparkSession, tableDir: String, version: Long): Long = {
    val logDir = s"$tableDir/_delta_log"
    val existing: Seq[(Long, String)] =
      TableIo.list(logDir)
        .flatMap(e => DeltaLog.versionOf(e.name).map(_ -> e.name)).sortBy(_._1)
    if (existing.isEmpty) refuse(s"no commits under $tableDir/_delta_log")
    if (existing.map(_._1) != (0L to existing.last._1))
      refuse("the commit history is not contiguous from version 0; restoring " +
        "against a partial replay would fabricate a wrong state")
    if (version < 0 || version > existing.last._1)
      refuse(s"version $version is not in the log (0..${existing.last._1})")
    val commits = existing.map { case (v, n) =>
      v -> TableIo.readString(s"$logDir/$n") }
    def snapOf(upTo: Long): DeltaLog.Snapshot =
      DeltaLog.snapshotOfE(commits.filter(_._1 <= upTo)) match {
        case Right(s) => s
        case Left(r) => refuse(s"cannot restore this table: $r")
      }
    val cur = snapOf(existing.last._1)
    val tgt = snapOf(version)
    if (cur.minReaderVersion > 2 || tgt.minReaderVersion > 2)
      refuse("table uses reader version 3 (table features); restoring through " +
        "features this writer does not implement is out of the v1 scope")
    if ((cur.files ++ tgt.files).exists(_.dv.isDefined))
      refuse("table carries deletion vectors; re-adding DV'd files without " +
        "their vectors would resurrect deleted rows — out of the v1 scope")
    val curByPath = cur.files.map(f => f.path -> f).toMap
    val tgtByPath = tgt.files.map(f => f.path -> f).toMap
    val readds = tgt.files.filterNot(f => curByPath.contains(f.path))
    val removes = cur.files.filterNot(f => tgtByPath.contains(f.path))
    if (readds.isEmpty && removes.isEmpty) return existing.last._1
    readds.find(f => !TableIo.isFile(s"$tableDir/${f.path}")).foreach(f =>
      refuse(s"cannot restore to version $version: data file '${f.path}' no " +
        "longer exists (vacuumed); the state is not reconstructible"))
    val now = System.currentTimeMillis()
    val addLines = readds.map { f =>
      JsonMethods.compact(JsonMethods.render("add" ->
        (("path" -> percentEncode(f.path)) ~
          ("partitionValues" -> JObject(f.partitionValues.toList.map {
            case (k, v) => k -> (JString(v): JValue) })) ~
          ("size" -> f.size) ~ ("modificationTime" -> f.modificationTime) ~
          ("dataChange" -> true) ~
          ("stats" -> f.stats.map(JString(_): JValue).getOrElse(JNothing)))))
    }
    val removeLines = removes.map { f =>
      JsonMethods.compact(JsonMethods.render("remove" ->
        (("path" -> percentEncode(f.path)) ~
          ("deletionTimestamp" -> now) ~ ("dataChange" -> true) ~
          ("extendedFileMetadata" -> true) ~
          ("partitionValues" -> JObject(f.partitionValues.toList.map {
            case (k, v) => k -> (JString(v): JValue) })) ~
          ("size" -> f.size))))
    }
    val metaLine: Seq[String] =
      if (cur.schemaJson == tgt.schemaJson &&
          cur.partitionColumns == tgt.partitionColumns) Seq.empty
      else Seq(JsonMethods.compact(JsonMethods.render("metaData" ->
        (("id" -> cur.tableId) ~
          ("format" -> (("provider" -> "parquet") ~ ("options" -> JObject(Nil)))) ~
          ("schemaString" -> tgt.schemaJson) ~
          ("partitionColumns" -> tgt.partitionColumns.toList) ~
          ("configuration" -> JObject(Nil))))))
    val commitInfoLine = JsonMethods.compact(JsonMethods.render("commitInfo" ->
      (("timestamp" -> now) ~ ("operation" -> "RESTORE") ~
        ("operationParameters" -> JObject(List("version" ->
          (JInt(version): JValue)))))))
    val next = existing.last._1 + 1
    val bytes = (((commitInfoLine +: metaLine) ++ addLines) ++ removeLines)
      .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (!TableIo.writeExclusive(s"$logDir/" + f"$next%020d.json", bytes))
      refuse(s"version $next already exists (concurrent writer?); " +
        "conflict resolution is out of the v1 scope — retry against the " +
        "new table state")
    next
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
    val logDir = s"$tableDir/_delta_log"
    val commits = TableIo.list(logDir)
      .flatMap(e => DeltaLog.versionOf(e.name).map(_ -> e.name)).sortBy(_._1)
      .map { case (v, n) => v -> TableIo.readString(s"$logDir/$n") }
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
    // the WRITER gate mirrors the reader one (ADVICE r17 #4): a table
    // demanding writer version >2 (column mapping = 5, DVs = 7, …)
    // carries invariants a later writer seeding from this checkpoint
    // would need to honor — freezing a downgraded protocol row would
    // silently waive them
    if (snap.minWriterVersion > 2)
      refuse(s"table demands writer version ${snap.minWriterVersion}; " +
        "checkpointing protocols above 2 is out of the v1 scope")
    if (snap.files.exists(_.dv.isDefined))
      refuse("table carries deletion vectors; checkpointing them is out of " +
        "the v1 scope")
    if (snap.tombstones.exists(_.dv.isDefined))
      refuse("table carries deletion-vector remove tombstones; checkpointing " +
        "them is out of the v1 scope")
    val version = commits.last._1
    import org.apache.spark.sql.types._
    val addType = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType)))
    // remove tombstones MUST survive the checkpoint until retention
    // expiry (protocol §Checkpoints) — dropping them would let a
    // concurrent reader replaying an older version resurrect files
    val removeType = StructType(Seq(
      StructField("path", StringType),
      StructField("deletionTimestamp", LongType),
      StructField("dataChange", BooleanType)))
    val metaType = StructType(Seq(
      StructField("id", StringType),
      StructField("format", StructType(Seq(
        StructField("provider", StringType),
        StructField("options", MapType(StringType, StringType))))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType))))
    val protoType = StructType(Seq(
      StructField("minReaderVersion", LongType),
      StructField("minWriterVersion", LongType)))
    val schema = StructType(Seq(
      StructField("add", addType), StructField("remove", removeType),
      StructField("metaData", metaType), StructField("protocol", protoType)))
    val rows: Seq[Row] =
      (Row(null, null, Row(snap.tableId,
        Row("parquet", Map.empty[String, String]), snap.schemaJson,
        snap.partitionColumns, snap.configuration), null) +:
      Row(null, null, null,
        Row(snap.minReaderVersion.toLong, snap.minWriterVersion.toLong)) +:
      snap.files.sortBy(_.path).map(f =>
        Row(Row(f.path, f.partitionValues, f.size, f.modificationTime,
          false, f.stats.orNull), null, null, null))) ++
      snap.tombstones.sortBy(_.path).map(t =>
        Row(null, Row(t.path, t.deletionTimestamp.map(Long.box).orNull, false),
          null, null))
    val df = spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    // one part, exact name (the Spark writer names parts itself)
    val stage = s"$tableDir/.graft-stage-${java.util.UUID.randomUUID()}"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = TableIo.walkRel(stage)
      .find(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .getOrElse(refuse("checkpoint parquet write produced no file"))
    val dest = s"$logDir/" + f"$version%020d.checkpoint.parquet"
    // re-checkpointing the same version is legal: displace, then move
    TableIo.delete(dest)
    TableIo.rename(s"$stage/$part", dest)
    TableIo.delete(stage, recursive = true)
    TableIo.writeBytes(s"$logDir/_last_checkpoint",
      s"""{"version":$version,"size":${rows.length}}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    version
  }
}
