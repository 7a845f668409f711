package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Delta Lake transaction-log reader — the TABLE-FORMAT rung of the
  * ingest tier: large corpus estates increasingly live as Delta
  * tables, and the part that needs format knowledge is not the data
  * (plain parquet) but the `_delta_log`: which files are CURRENT.
  * From the published Delta Transaction Log Protocol (PROTOCOL.md,
  * Linux Foundation):
  *
  *  - commits are `_delta_log/<20-digit version>.json`, one JSON
  *    action per line: `metaData` (table id, schemaString, partition
  *    columns — last one wins), `protocol`, `add` (path,
  *    partitionValues, size, modificationTime, dataChange, optional
  *    stats), `remove` (path), `commitInfo`/`txn`/`cdc` (ignored);
  *  - the snapshot is the log replay in version order: an `add` puts
  *    the file in the active set keyed by path, a `remove` deletes
  *    it, a later re-`add` resurrects it;
  *  - checkpoints: `_last_checkpoint` (JSON: version, size, optional
  *    parts) names a parquet snapshot of the replay state at that
  *    version — `<version>.checkpoint.parquet`, or for multi-part
  *    `<version>.checkpoint.<i of n>.parquet` (both zero-padded, i
  *    1-based). One action per row, same add/remove/metaData/protocol
  *    shapes as the JSON lines; `remove` rows are VACUUM tombstones,
  *    not active files. A snapshot = checkpoint state + replay of the
  *    JSON commits with version > checkpoint version;
  *  - file paths are RELATIVE to the table root and percent-encoded
  *    (RFC 3986 unreserved set) — decoded here; absolute URIs pass
  *    through;
  *  - protocol gate: `minReaderVersion` 1 and 2 always read; 3
  *    (table features) reads iff every `readerFeatures` entry is
  *    implemented here ([[supportedReaderFeatures]]: deletion
  *    vectors, column mapping) — anything else refuses BY NAME,
  *    since reading through an unknown semantics-changing feature
  *    silently returns wrong data. Column mapping reads in `name`
  *    mode (physical parquet names map back to logical ones at the
  *    scan, round 15); `id` mode refuses;
  *  - deletion vectors (round 15): an add's `deletionVector`
  *    descriptor names a bitmap of deleted ROW INDEXES
  *    ([[DeltaDv]]); [[readTable]] anti-joins those positions
  *    against the scan's `_metadata.row_index`, and replay keys
  *    file actions by (path, dv uniqueId) per the protocol.
  *
  * Scale shape, per surface:
  *  - [[activeFiles]] / [[activeFilesFromCheckpoint]] (the DataFrame
  *    replay): fully distributed — commit contents split to (version,
  *    line) rows, each line parsed by a codegen'd `from_json`
  *    projection, the last action per path selected by one `max_by`
  *    aggregation (paths shuffle, bodies and stats strings don't
  *    beyond their own row), and the whole-log validity gate (any
  *    malformed line / unsupported protocol / missing metaData →
  *    empty result) rides as a one-row broadcast side, so nothing
  *    ever `collect()`s — a degenerate million-commit log stays off
  *    the driver end to end.
  *  - [[readTable]]: the active FILE LIST must reach the driver by
  *    necessity (scan paths are driver-side strings), so the replay
  *    there is driver-side over the log JSON — bounded by the log,
  *    which is metadata (thousands of lines for petabyte tables) —
  *    and the checkpoint parquet contributes its add rows' (path,
  *    partitionValues, size, modificationTime, stats-presence) plus
  *    the metaData/protocol facts to that list — never the stats
  *    strings or schema bodies per file. The DATA scan is
  *    ONE parquet relation over all active files (never one union arm
  *    per partition tuple — a date×source table has 10³–10⁵ tuples
  *    and a union that wide dies in analysis); partition values
  *    arrive by joining the scan's `_metadata.file_path` against a
  *    small broadcast path→values manifest.
  */
object DeltaLog {

  final case class AddFile(path: String, partitionValues: Map[String, String],
      size: Long, modificationTime: Long, stats: Option[String],
      dv: Option[DeltaDv.Descriptor] = None)
  /** A `remove` tombstone still in the replayed state (checkpoints
    * must carry these until retention expiry — protocol §Checkpoints). */
  final case class RemoveFile(path: String, deletionTimestamp: Option[Long],
      dv: Option[DeltaDv.Descriptor] = None)
  final case class Snapshot(tableId: String, schemaJson: String,
      partitionColumns: Seq[String], files: Seq[AddFile],
      configuration: Map[String, String] = Map.empty,
      minReaderVersion: Int = 1,
      minWriterVersion: Int = 2,
      tombstones: Seq[RemoveFile] = Seq.empty,
      txns: Map[String, Long] = Map.empty)

  /** Reader features this reader actually implements; a v3 protocol
    * naming anything else refuses BY NAME (silently reading through
    * an unknown feature risks wrong data). `timestampNtz` only marks
    * the presence of TIMESTAMP_NTZ columns — Spark's parquet reader
    * handles the type natively, so reading through is correct;
    * `v2Checkpoint` (UUID-named checkpoints + sidecars) is read by
    * [[readTable]]'s checkpoint discovery. */
  private[graft] val supportedReaderFeatures: Set[String] =
    Set("deletionVectors", "columnMapping", "timestampNtz", "v2Checkpoint")

  private final case class Refuse(msg: String) extends RuntimeException(msg) {
    override def fillInStackTrace(): Throwable = this
  }
  private def refuse(msg: String): Nothing = throw Refuse(msg)

  private def percentDecode(s: String): String = graft.expr.PercentDecodeKernel.decode(s)

  /** Replay commits (version-ascending, line order within a commit)
    * into the current snapshot, optionally seeded with a checkpoint's
    * state. None on malformed JSON, an unsupported protocol, or a log
    * with no metaData (seed included). Driver-side — used by
    * [[readTable]], where the file list is needed as scan paths; the
    * DataFrame surfaces replay distributed instead. */
  def snapshotOf(commits: Seq[(Long, String)], seed: Option[Snapshot] = None): Option[Snapshot] =
    snapshotOfE(commits, seed).toOption

  /** [[snapshotOf]] with the refusal REASON on the left — readTable
    * surfaces it verbatim (the round-15 "refuse by name" contract). */
  def snapshotOfE(commits: Seq[(Long, String)],
      seed: Option[Snapshot] = None): Either[String, Snapshot] =
    try {
      var tableId: String = seed.map(_.tableId).orNull
      var schemaJson: String = seed.map(_.schemaJson).orNull
      var partitionCols: Seq[String] = seed.map(_.partitionColumns).getOrElse(Seq.empty)
      var config: Map[String, String] = seed.map(_.configuration).getOrElse(Map.empty)
      var maxReader: Int = seed.map(_.minReaderVersion).getOrElse(1)
      var maxWriter: Int = seed.map(_.minWriterVersion).getOrElse(2)
      var txns: Map[String, Long] = seed.map(_.txns).getOrElse(Map.empty)
      def keyOf(path: String, dv: Option[DeltaDv.Descriptor]): String =
        path + "\u0000" + dv.map(_.uniqueId).getOrElse("")
      def dvOf(a: JValue): Option[DeltaDv.Descriptor] = a \ "deletionVector" match {
        case d: JObject =>
          val st = d \ "storageType" match {
            case JString(s) => s; case _ => refuse("deletionVector missing storageType") }
          val pp = d \ "pathOrInlineDv" match {
            case JString(s) => s; case _ => refuse("deletionVector missing pathOrInlineDv") }
          val off = d \ "offset" match { case JInt(v) => Some(v.toLong); case _ => None }
          val sz = d \ "sizeInBytes" match {
            case JInt(v) => v.toLong; case _ => refuse("deletionVector missing sizeInBytes") }
          val card = d \ "cardinality" match {
            case JInt(v) => v.toLong; case _ => refuse("deletionVector missing cardinality") }
          Some(DeltaDv.Descriptor(st, pp, off, sz, card))
        case _ => None
      }
      val active = scala.collection.mutable.LinkedHashMap.empty[String, AddFile]
      val tombs = scala.collection.mutable.LinkedHashMap.empty[String, RemoveFile]
      seed.foreach(_.files.foreach(f => active(keyOf(f.path, f.dv)) = f))
      seed.foreach(_.tombstones.foreach(t => tombs(keyOf(t.path, t.dv)) = t))
      commits.sortBy(_._1).foreach { case (_, content) =>
        content.split("\n").iterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
          val jv = try JsonMethods.parse(line) catch {
            case _: Exception => refuse("malformed log line (not JSON)") }
          jv \ "protocol" match {
            case p: JObject =>
              p \ "minReaderVersion" match {
                case JInt(v) if v == 1 || v == 2 =>
                  maxReader = math.max(maxReader, v.toInt)
                case JInt(v) if v == 3 =>
                  // v3 = table features: read iff every named reader
                  // feature is one this reader implements
                  val feats = p \ "readerFeatures" match {
                    case JArray(xs) => xs.map {
                      case JString(s) => s
                      case _ => refuse("malformed readerFeatures") }
                    case _ => refuse("reader version 3 without readerFeatures")
                  }
                  val unsupported = feats.filterNot(supportedReaderFeatures)
                  if (unsupported.nonEmpty)
                    refuse(s"unsupported reader features: ${unsupported.sorted.mkString(", ")}")
                  maxReader = math.max(maxReader, 3)
                case _ => refuse("unsupported minReaderVersion (>3 or missing)")
              }
              p \ "minWriterVersion" match {
                case JInt(v) if v >= 1 && v <= 7 =>
                  maxWriter = math.max(maxWriter, v.toInt)
                case _ => ()
              }
            case _ => ()
          }
          jv \ "txn" match {
            case t: JObject =>
              (t \ "appId", t \ "version") match {
                case (JString(app), JInt(v)) => txns += app -> v.toLong
                case _ => ()
              }
            case _ => ()
          }
          jv \ "metaData" match {
            case m: JObject =>
              tableId = m \ "id" match {
                case JString(s) => s; case _ => refuse("metaData missing id") }
              schemaJson = m \ "schemaString" match { case JString(s) => s; case _ => null }
              partitionCols = m \ "partitionColumns" match {
                case JArray(xs) => xs.map {
                  case JString(s) => s; case _ => refuse("malformed partitionColumns") }
                case _ => Seq.empty
              }
              config = m \ "configuration" match {
                case JObject(fs) => fs.collect { case (k, JString(v)) => k -> v }.toMap
                case _ => Map.empty
              }
            case _ => ()
          }
          jv \ "add" match {
            case a: JObject =>
              val path = a \ "path" match {
                case JString(s) => percentDecode(s); case _ => refuse("add missing path") }
              val size = a \ "size" match {
                case JInt(v) => v.toLong; case _ => refuse("add missing size") }
              val mod = a \ "modificationTime" match { case JInt(v) => v.toLong; case _ => 0L }
              val pv = a \ "partitionValues" match {
                case JObject(fs) => fs.collect { case (k, JString(v)) => k -> v }.toMap
                case _ => Map.empty[String, String]
              }
              val stats = a \ "stats" match { case JString(s) => Some(s); case _ => None }
              val dv = dvOf(a)
              active(keyOf(path, dv)) = AddFile(path, pv, size, mod, stats, dv)
              tombs.remove(keyOf(path, dv)) // re-added: no longer a tombstone
            case _ => ()
          }
          jv \ "remove" match {
            case r: JObject =>
              val path = r \ "path" match {
                case JString(s) => percentDecode(s); case _ => refuse("remove missing path") }
              // file actions key by (path, dvUniqueId): attaching a DV
              // to a file commits remove(path, old dv) + add(path, new
              // dv), and that must replay right in either line order
              val dv = dvOf(r)
              active.remove(keyOf(path, dv))
              val delTs = r \ "deletionTimestamp" match {
                case JInt(v) => Some(v.toLong); case _ => None }
              tombs(keyOf(path, dv)) = RemoveFile(path, delTs, dv)
            case _ => ()
          }
        }
      }
      if (tableId == null) refuse("log has no metaData action") // not a delta log
      // column-mapping gate against the FINAL metadata: `name` mode
      // reads (readTable maps physical parquet names back to logical
      // ones) and `id` mode reads (round 15 continuation — readTable
      // resolves parquet field ids from the data files' own footers);
      // anything else refuses by name rather than mis-resolve columns
      val cm = config.getOrElse("delta.columnMapping.mode", "none")
      if (cm != "none" && cm != "name" && cm != "id")
        refuse(s"column mapping mode '$cm' unsupported")
      Right(Snapshot(tableId, schemaJson, partitionCols, active.values.toSeq,
        config, maxReader, maxWriter, tombs.values.toSeq, txns))
    } catch { case Refuse(m) => Left(m) }

  /** The `_delta_log` version of a commit file name, if it is one. */
  private[graft] def versionOf(name: String): Option[Long] = {
    val base = name.substring(name.lastIndexOf('/') + 1)
    if (base.length == 25 && base.endsWith(".json") &&
      base.take(20).forall(_.isDigit)) Some(base.take(20).toLong)
    else None
  }

  // ---------------------------------------------------------------
  // Distributed replay (the DataFrame surfaces)
  // ---------------------------------------------------------------

  private val dvType = StructType(Seq(
    StructField("storageType", StringType),
    StructField("pathOrInlineDv", StringType),
    StructField("offset", LongType),
    StructField("sizeInBytes", LongType),
    StructField("cardinality", LongType)))
  private val addType = StructType(Seq(
    StructField("path", StringType),
    StructField("partitionValues", MapType(StringType, StringType)),
    StructField("size", LongType),
    StructField("modificationTime", LongType),
    StructField("stats", StringType),
    StructField("deletionVector", dvType)))
  private val removeType = StructType(Seq(
    StructField("path", StringType),
    StructField("deletionVector", dvType)))
  private val metaType = StructType(Seq(
    StructField("id", StringType),
    StructField("schemaString", StringType),
    StructField("partitionColumns", ArrayType(StringType)),
    StructField("configuration", MapType(StringType, StringType))))
  private val protoType = StructType(Seq(
    StructField("minReaderVersion", LongType),
    StructField("readerFeatures", ArrayType(StringType))))
  private val actionType = StructType(Seq(
    StructField("add", addType), StructField("remove", removeType),
    StructField("metaData", metaType), StructField("protocol", protoType),
    StructField("__corrupt", StringType)))

  /** (version, content) commit rows → the long action stream
    * (__v, __ln, add, remove, metaData, protocol, __corrupt):
    * split to lines, posexplode for in-commit order, `from_json` per
    * line. A line that is not a JSON object parses to a null struct —
    * flagged corrupt (the protocol mandates one ACTION OBJECT per
    * line). All scan-local codegen'd projections. */
  private def parseCommits(df: DataFrame, versionCol: String, contentCol: String): DataFrame =
    df.select(col(versionCol).cast("long").as("__v"),
        posexplode(split(col(contentCol).cast("string"), "\n")).as(Seq("__ln", "__line")))
      .where(trim(col("__line")) =!= "")
      .select(col("__v"), col("__ln").cast("long").as("__ln"),
        from_json(col("__line"), actionType,
          Map("columnNameOfCorruptRecord" -> "__corrupt")).as("a"))
      .select(col("__v"), col("__ln"),
        col("a.add").as("add"), col("a.remove").as("remove"),
        col("a.metaData").as("metaData"), col("a.protocol").as("protocol"),
        (col("a").isNull || col("a.__corrupt").isNotNull).as("__corrupt"))

  /** Re-shape a checkpoint-parquet DataFrame (action structs, one per
    * row — possibly with extra columns/subfields real writers add) to
    * the canonical action stream at (version=checkpointVersion,
    * line=-1): every checkpoint action orders BELOW every
    * post-checkpoint commit line. Missing columns/subfields surface
    * as nulls; extra ones are ignored. */
  private def normalizeCheckpoint(df: DataFrame, checkpointVersion: Long): DataFrame = {
    val schema = df.schema
    def subCols(parent: String, t: StructType): Column = schema.find(_.name == parent) match {
      case Some(f) if f.dataType.isInstanceOf[StructType] =>
        val have = f.dataType.asInstanceOf[StructType].fieldNames.toSet
        val rebuilt = struct(t.fields.map { sf =>
          (if (have(sf.name)) col(s"$parent.${sf.name}").cast(sf.dataType)
           else lit(null).cast(sf.dataType)).as(sf.name)
        }.toIndexedSeq: _*)
        when(col(parent).isNotNull, rebuilt).otherwise(lit(null).cast(t)).as(parent)
      case _ => lit(null).cast(t).as(parent)
    }
    df.select(lit(checkpointVersion).as("__v"), lit(-1L).as("__ln"),
      subCols("add", addType), subCols("remove", removeType),
      subCols("metaData", metaType), subCols("protocol", protoType),
      lit(false).as("__corrupt"))
  }

  /** The distributed replay core over the canonical action stream.
    * Two aggregations, both over (version, line) rows:
    *  - the VALIDITY GATE (any corrupt line, any protocol other than
    *    reader-version 1, any add missing path/size, any remove
    *    missing path, any metaData missing id, or NO metaData at all
    *    → the whole log is refused) reduces to one 0/1-row DataFrame
    *    that rides as a broadcast cross-join side — refusal = empty
    *    output, with no eager driver job at plan time;
    *  - the REPLAY: explode each line's (add?, remove?) into ordered
    *    sub-actions, percent-decode the path, and take the last
    *    action per path with `max_by` over (version, line, sub) —
    *    active = paths whose last action is an add. */
  /** The descriptor's replay identity as a column ('' when no DV) —
    * mirrors [[DeltaDv.Descriptor.uniqueId]]. */
  private def dvUid(dv: Column): Column =
    coalesce(when(dv.isNotNull && dv("storageType").isNotNull,
      concat(dv("storageType"), dv("pathOrInlineDv"),
        coalesce(concat(lit("@"), dv("offset").cast(StringType)), lit("")))),
      lit(""))

  private def replay(actions: DataFrame): DataFrame = {
    // v3 protocols (table features) read iff every reader feature is
    // implemented here; the supported set rides as a literal array
    val supportedLit = array(supportedReaderFeatures.toSeq.sorted.map(lit): _*)
    val protoBad = col("protocol").isNotNull && (
      col("protocol.minReaderVersion").isNull ||
      col("protocol.minReaderVersion") > 3L ||
      (col("protocol.minReaderVersion") === 3L &&
        (col("protocol.readerFeatures").isNull ||
          size(array_except(col("protocol.readerFeatures"), supportedLit)) > 0)))
    val dvBad = (dv: Column) => dv.isNotNull && dv("storageType").isNotNull &&
      (dv("pathOrInlineDv").isNull || dv("sizeInBytes").isNull)
    val bad = col("__corrupt") || protoBad ||
      (col("add").isNotNull && (col("add.path").isNull || col("add.size").isNull)) ||
      dvBad(col("add.deletionVector")) || dvBad(col("remove.deletionVector")) ||
      (col("remove").isNotNull && col("remove.path").isNull) ||
      (col("metaData").isNotNull && col("metaData.id").isNull)
    // column-mapping gate against the FINAL metadata: none, name,
    // and id modes read; unknown modes refuse
    val gateOk = actions
      .agg(max(bad.cast("int")).as("__bad"),
        max(col("metaData").isNotNull.cast("int")).as("__meta"),
        max_by(element_at(col("metaData.configuration"), "delta.columnMapping.mode"),
          when(col("metaData").isNotNull, struct(col("__v"), col("__ln")))).as("__cm"))
      .where(coalesce(col("__bad"), lit(1)) === 0 && coalesce(col("__meta"), lit(0)) === 1 &&
        coalesce(col("__cm"), lit("none")).isin("none", "name", "id"))
      .select(lit(1).as("__gate"))
    val emptyPv = lit(null).cast(MapType(StringType, StringType))
    val acted = actions
      .where(col("add").isNotNull || col("remove").isNotNull)
      .select(col("__v"), col("__ln"),
        explode(filter(array(
          struct(lit(0).as("sub"), col("add").isNotNull.as("valid"),
            col("add.path").as("path"), lit(true).as("is_add"),
            col("add.size").as("size"), col("add.modificationTime").as("mod"),
            col("add.partitionValues").as("pv"), col("add.stats").isNotNull.as("has_stats"),
            dvUid(col("add.deletionVector")).as("dvuid")),
          struct(lit(1).as("sub"), col("remove").isNotNull.as("valid"),
            col("remove.path").as("path"), lit(false).as("is_add"),
            lit(null).cast(LongType).as("size"), lit(null).cast(LongType).as("mod"),
            emptyPv.as("pv"), lit(false).as("has_stats"),
            dvUid(col("remove.deletionVector")).as("dvuid"))
        ), x => x("valid"))).as("act"))
    // file actions key by (path, dv uniqueId) — attaching a DV to a
    // file commits remove(path, old dv) + add(path, new dv), and the
    // replay must hold either in-commit line order
    val last = acted
      .groupBy(graft.expr.PercentDecode(col("act.path")).as("path"),
        col("act.dvuid").as("__dvuid"))
      .agg(max_by(
        struct(col("act.is_add").as("is_add"), col("act.size").as("size"),
          col("act.mod").as("mod"), col("act.pv").as("pv"),
          col("act.has_stats").as("has_stats")),
        struct(col("__v"), col("__ln"), col("act.sub"))).as("last"))
      .where(col("last.is_add"))
    val pv = map_filter(coalesce(col("last.pv"), emptyPv), (_, v) => v.isNotNull)
    last.select(col("path"),
        col("last.size").as("size"),
        coalesce(col("last.mod"), lit(0L)).as("modification_time"),
        coalesce(size(pv), lit(0)).as("n_partition_values"),
        coalesce(array_join(
          transform(array_sort(map_entries(pv)),
            e => concat(e("key"), lit("="), e("value"))), ","), lit("")).as("partition_json"),
        col("last.has_stats").as("has_stats"))
      .crossJoin(broadcast(gateOk))
      .drop("__gate")
  }

  /** DataFrame surface: (version, content) commit rows → one row per
    * ACTIVE file (path, size, modification_time, n_partition_values,
    * partition_json, has_stats). Malformed logs emit nothing. Fully
    * distributed (see the object scaladoc's scale shape). */
  def activeFiles(df: DataFrame, versionCol: String, contentCol: String): DataFrame =
    replay(parseCommits(df, versionCol, contentCol))

  /** Checkpoint-seeded replay: `checkpoint` holds the action rows of
    * a checkpoint parquet (add/remove/metaData/protocol structs, one
    * action per row), `commits` the (version, content) JSON commits;
    * commit rows at or below `checkpointVersion` are ignored (the
    * checkpoint already contains their effect — and writers are
    * allowed to have deleted them). Same output surface and refusal
    * contract as [[activeFiles]], same distributed shape. */
  def activeFilesFromCheckpoint(checkpoint: DataFrame, commits: DataFrame,
      versionCol: String, contentCol: String, checkpointVersion: Long): DataFrame =
    replay(normalizeCheckpoint(checkpoint, checkpointVersion).unionByName(
      parseCommits(commits, versionCol, contentCol).where(col("__v") > checkpointVersion)))

  // ---------------------------------------------------------------
  // Table reading (driver-side log, single distributed data scan)
  // ---------------------------------------------------------------

  /** Checkpoint file names for `_last_checkpoint`'s (version, parts). */
  private[graft] def checkpointNames(version: Long, parts: Option[Int]): Seq[String] =
    parts match {
      case Some(n) => (1 to n).map(i => f"$version%020d.checkpoint.$i%010d.$n%010d.parquet")
      case None    => Seq(f"$version%020d.checkpoint.parquet")
    }

  /** JSON-flavor checkpoint content → the same canonical action
    * stream (parseCommits's output schema matches
    * normalizeCheckpoint's). */
  private def parseCommitsNorm(df: DataFrame): DataFrame =
    parseCommits(df, "version", "content")

  /** The checkpoint's NON-FILE facts (metaData, protocol, config) as
    * a zero-file seed Snapshot — the file rows never reach the driver
    * here; [[collectActiveAdds]] materializes the FINAL active list
    * (checkpoint + tail commits merged cluster-side) instead. */
  private def checkpointFurniture(norm: DataFrame): Snapshot = {
    val supportedLit = array(supportedReaderFeatures.toSeq.sorted.map(lit): _*)
    val badProto = norm.where(col("protocol").isNotNull &&
      (col("protocol.minReaderVersion").isNull ||
        col("protocol.minReaderVersion") > 3L ||
        (col("protocol.minReaderVersion") === 3L &&
          (col("protocol.readerFeatures").isNull ||
            size(array_except(col("protocol.readerFeatures"), supportedLit)) > 0))))
    if (!badProto.isEmpty)
      throw new graft.GraftAnalysisException(
        "delta: unsupported protocol in checkpoint (minReaderVersion > 3 or unknown reader features)")
    val readerV = norm.agg(max(col("protocol.minReaderVersion"))).head() match {
      case r if r.isNullAt(0) => 1
      case r => r.getLong(0).toInt
    }
    val meta = norm.where(col("metaData").isNotNull)
      .select(col("metaData.id"), col("metaData.schemaString"),
        col("metaData.partitionColumns"), col("metaData.configuration"))
      .collect()
    val m = if (meta.nonEmpty) meta.last else
      throw new graft.GraftAnalysisException("delta: checkpoint has no metaData action")
    if (m.isNullAt(0))
      throw new graft.GraftAnalysisException("delta: checkpoint metaData has no id")
    val pcols: Seq[String] =
      if (m.isNullAt(2)) Seq.empty else m.getSeq[String](2)
    val config: Map[String, String] =
      if (m.isNullAt(3)) Map.empty
      else m.getMap[String, String](3).toMap.filter(_._2 != null)
    // the v2/column-mapping decision happens in snapshotOf's FINAL
    // check — a later commit may replace the metadata either way
    Snapshot(m.getString(0), if (m.isNullAt(1)) null else m.getString(1), pcols,
      Seq.empty, config, readerV)
  }

  /** The [[readTable]] file-list cap: scan paths must exist as driver
    * strings, so the list is irreducibly driver-side — but it must
    * fail LOUDLY, by name, before exhausting driver memory on a
    * degenerate table. Override with `graft.delta.maxFiles`. */
  private def maxFilesOf(spark: SparkSession): Int =
    spark.conf.getOption("graft.delta.maxFiles").map(_.toInt).getOrElse(1000000)

  private def capFiles(spark: SparkSession, n: Int): Unit = {
    val cap = maxFilesOf(spark)
    if (n > cap)
      throw new graft.GraftAnalysisException(
        s"delta: table has more than $cap active files; the scan-path list " +
          "would exhaust driver memory — raise graft.delta.maxFiles to override")
  }

  /** Stats-comparable top-level types for file skipping: floats and
    * doubles are deliberately EXCLUDED (files containing NaN have
    * writer-dependent min/max conventions — pruning on them risks
    * dropping matching rows), as are binary and complex types. */
  private[graft] def statsComparable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType |
         DateType | TimestampType | TimestampNTZType | BooleanType => true
    case _: DecimalType => true
    case _ => false
  }

  /** DATA SKIPPING (round 17, mirroring the Iceberg manifest pruning):
    * compile the user predicate into a per-file KEEP filter over
    * (partitionValues map, add.stats JSON string) columns — usable on
    * whatever frame carries them (the cluster-side checkpoint merge or
    * the driver-bounded JSON-path manifest frame).
    *
    *  - PARTITION conjuncts (references ⊆ partition columns): each
    *    reference substitutes the file's own partition value — a
    *    per-file CONSTANT under Delta's semantics, so evaluation is
    *    exact, and a NULL result means every row of the file fails
    *    the row filter → prune;
    *  - remaining conjuncts go to the [[ZoneMap]] min/max skipper over
    *    the stats JSON parsed BY THE TABLE SCHEMA's types (no schema →
    *    no stats skipping — string-ordered comparisons of numeric
    *    stats would be wrong). Stats keys follow the log's convention:
    *    PHYSICAL column names under column mapping.
    *
    * Pruning is an optimization only — [[readTable]] re-applies the
    * predicate to the scanned rows — so unknowns keep the file. */
  private def skipFilter(pred: Column, pcols: Seq[String],
      physOf: Map[String, String], schema: Option[StructType]):
      (Column, Column) => Column = { (pvCol, statsCol) =>
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.Expression
    val predExpr = ZoneMap.normalize(ColumnBridge.convertedExpression(pred))
    val pcolSet = pcols.toSet
    val (partCs, dataCs) = ZoneMap.conjuncts(predExpr).partition { c =>
      val refs = ZoneMap.attrNames(c)
      refs.nonEmpty && refs.subsetOf(pcolSet) && !ZoneMap.unsafeForPruning(c)
    }
    val partKeep: Column = partCs.map { c =>
      val sub: Expression = c.transformUp {
        case a: UnresolvedAttribute if pcolSet(a.name) =>
          ColumnBridge.convertedExpression(pvCol.getItem(physOf.getOrElse(a.name, a.name)))
      }
      coalesce(ColumnBridge.column(sub), lit(false))
    }.foldLeft(lit(true))(_ && _)
    val statsFields: Seq[StructField] = schema
      .map(_.fields.toSeq.filter(f => !pcolSet(f.name) && statsComparable(f.dataType)))
      .getOrElse(Seq.empty)
    val statsKeep: Column =
      if (statsFields.isEmpty || dataCs.isEmpty) lit(true)
      else {
        val pn: Map[String, String] =
          statsFields.map(f => f.name -> physOf.getOrElse(f.name, f.name)).toMap
        val sSchema = StructType(Seq(
          StructField("numRecords", LongType),
          StructField("minValues",
            StructType(statsFields.map(f => StructField(pn(f.name), f.dataType)))),
          StructField("maxValues",
            StructType(statsFields.map(f => StructField(pn(f.name), f.dataType)))),
          StructField("nullCount",
            StructType(statsFields.map(f => StructField(pn(f.name), LongType))))))
        val st = from_json(statsCol, sSchema)
        val byName: Map[String, ZoneMap.ColStats] = statsFields.map(f =>
          f.name -> ZoneMap.ColStats(
            st("minValues")(pn(f.name)), st("maxValues")(pn(f.name)), f.dataType,
            Some(st("nullCount")(pn(f.name))), Some(st("numRecords")))).toMap
        dataCs.map(c => ZoneMap.mayMatch(c, byName.get)).foldLeft(lit(true))(_ && _)
      }
    partKeep && statsKeep
  }

  /** JSON-path pruning: the driver already holds the (log-bounded,
    * capped) add list — evaluate the keep filter through a small
    * DataFrame so Catalyst semantics match the cluster path exactly.
    * Everything-pruned keeps one schema-carrier file (the Iceberg
    * rule): the scan keeps the table's schema, the row filter then
    * yields zero rows. */
  private def pruneAddsDriver(spark: SparkSession, adds: Seq[AddFile],
      keep: (Column, Column) => Column): Seq[AddFile] = {
    if (adds.isEmpty) return adds
    val schema = StructType(Seq(
      StructField("__idx", IntegerType),
      StructField("__pv", MapType(StringType, StringType)),
      StructField("__stats", StringType)))
    val rows = adds.zipWithIndex.map { case (f, i) =>
      Row(i, f.partitionValues, f.stats.orNull)
    }
    val kept = spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      .where(keep(col("__pv"), col("__stats")))
      .select(col("__idx")).collect().map(_.getInt(0)).toSet
    val out = adds.zipWithIndex.collect { case (f, i) if kept(i) => f }
    if (out.nonEmpty) out else Seq(adds.minBy(_.path))
  }

  /** Distributed ACTIVE-file materialization for the checkpoint path
    * of [[readTable]]: the canonical action stream (checkpoint rows at
    * version ≤ every tail commit, plus the parsed tail) reduces to the
    * last action per (path, dv uniqueId) with ONE cluster-side max_by
    * — the same rule as [[replay]] — so the driver never holds the
    * checkpoint's add rows, only the FINAL active list, and that list
    * is capped via `limit(cap+1)` with a named refusal past it.
    * The data-skipping keep filter applies CLUSTER-SIDE here, before
    * the collect — stats strings still never reach the driver, and a
    * pruned list lands further under the cap.
    * Malformed checkpoint file rows refuse before the merge. */
  private def collectActiveAdds(spark: SparkSession, norm: DataFrame,
      keep: Option[(Column, Column) => Column] = None): Seq[AddFile] = {
    val dvBad = (dv: Column) => dv.isNotNull && dv("storageType").isNotNull &&
      (dv("pathOrInlineDv").isNull || dv("sizeInBytes").isNull)
    if (!norm.where(
        (col("add").isNotNull && (col("add.path").isNull || col("add.size").isNull)) ||
        dvBad(col("add.deletionVector")) || dvBad(col("remove.deletionVector")))
        .isEmpty)
      throw new graft.GraftAnalysisException(
        "delta: malformed add or deletionVector action in checkpoint")
    val emptyPv = lit(null).cast(MapType(StringType, StringType))
    val acted = norm
      .where(col("add").isNotNull || col("remove").isNotNull)
      .select(col("__v"), col("__ln"),
        explode(filter(array(
          struct(lit(0).as("sub"), col("add").isNotNull.as("valid"),
            col("add.path").as("path"), lit(true).as("is_add"),
            col("add.size").as("size"), col("add.modificationTime").as("mod"),
            col("add.partitionValues").as("pv"),
            col("add.stats").as("stats"),
            dvUid(col("add.deletionVector")).as("dvuid"),
            col("add.deletionVector").as("dv")),
          struct(lit(1).as("sub"), col("remove").isNotNull.as("valid"),
            col("remove.path").as("path"), lit(false).as("is_add"),
            lit(null).cast(LongType).as("size"), lit(null).cast(LongType).as("mod"),
            emptyPv.as("pv"), lit(null).cast(StringType).as("stats"),
            dvUid(col("remove.deletionVector")).as("dvuid"),
            lit(null).cast(dvType).as("dv"))
        ), x => x("valid"))).as("act"))
    val last = acted
      .groupBy(graft.expr.PercentDecode(col("act.path")).as("path"),
        col("act.dvuid").as("__dvuid"))
      .agg(max_by(
        struct(col("act.is_add").as("is_add"), col("act.size").as("size"),
          col("act.mod").as("mod"), col("act.pv").as("pv"),
          col("act.stats").as("stats"), col("act.dv").as("dv")),
        struct(col("__v"), col("__ln"), col("act.sub"))).as("last"))
      .where(col("last.is_add"))
      .select(col("path"), col("last.size"), col("last.mod"), col("last.pv"),
        col("last.stats").isNotNull.as("has_stats"), col("last.dv"),
        col("last.stats").as("__stats"))
    // the keep filter runs HERE, cluster-side, then the stats string
    // projects away — only (capped) paths + presence markers collect
    val filtered = keep match {
      case Some(k) => last.where(k(col("pv"), col("__stats"))).drop("__stats")
      case None => last.drop("__stats")
    }
    val cap = maxFilesOf(spark)
    val rows0 = filtered.limit(cap + 1).collect()
    // everything-pruned: keep one schema-carrier file (rows then
    // filter to zero) so the scan keeps the table's schema
    val rows = if (rows0.isEmpty && keep.isDefined)
      last.drop("__stats").orderBy(col("path")).limit(1).collect() else rows0
    capFiles(spark, rows.length)
    rows.toSeq.map { r =>
      val dv = if (r.isNullAt(5)) None else {
        val d = r.getStruct(5)
        if (d.isNullAt(0)) None // null storageType: no DV
        else Some(DeltaDv.Descriptor(d.getString(0), d.getString(1),
          if (d.isNullAt(2)) None else Some(d.getLong(2)),
          if (d.isNullAt(3)) 0L else d.getLong(3),
          if (d.isNullAt(4)) 0L else d.getLong(4)))
      }
      AddFile(r.getString(0),
        if (r.isNullAt(3)) Map.empty
        else r.getMap[String, String](3).toMap.filter(_._2 != null),
        r.getLong(1), if (r.isNullAt(2)) 0L else r.getLong(2),
        // presence marker only: stats strings stay off the driver
        if (r.getBoolean(4)) Some("") else None, dv)
    }
  }

  /** Spellings under which a file scan may report a local path in
    * `_metadata.file_path` (raw, `file:` single/triple-slash, each
    * also in percent-encoded form) — the broadcast manifest carries
    * one row per spelling so the join matches whichever the runtime
    * emits, with no format guessing baked in. Scheme'd paths with a
    * null authority get both legal spellings (`sch:/p` and
    * `sch:///p`); authority-carrying URIs pass through as-is. */
  private[ops] def keyForms(p: String): Seq[String] =
    if (TableIo.hasScheme(p)) {
      val i = p.indexOf(':')
      val (sch, rest) = (p.substring(0, i), p.substring(i + 1))
      if (rest.startsWith("//")) Seq(p)
      else Seq(s"$sch:$rest", s"$sch://$rest").distinct
    } else {
      val abs = new java.io.File(p).getAbsolutePath
      val enc = new java.io.File(abs).toURI.getRawPath
      Seq(abs, s"file:$abs", s"file://$abs", s"file:$enc", s"file://$enc").distinct
    }

  /** Read the CURRENT data of a classic (reader-version-1) Delta
    * table: seed from the `_last_checkpoint` checkpoint parquet when
    * present, replay the later `_delta_log` commit JSONs, then scan
    * ALL active parquet files as ONE relation, injecting each file's
    * partitionValues (which live in the LOG, not the files, per the
    * protocol) via a broadcast `_metadata.file_path` → values
    * manifest join — the plan holds one scan node however many
    * partition tuples the table has. Refuses (analysis error) on
    * unsupported protocol, a missing/incomplete checkpoint, or a
    * malformed log. */
  def readTable(spark: SparkSession, tableDir: String): DataFrame =
    readTable(spark, tableDir, None)

  /** CHANGE DATA FEED: the row-level changes committed in versions
    * `startVersion..endVersion`, as the Delta protocol defines them —
    * per version, EITHER the commit's `cdc` actions name parquet
    * files under `_change_data/` that carry the data columns plus the
    * writer's `_change_type` (insert / update_preimage /
    * update_postimage / delete), and those are authoritative, OR the
    * changes synthesize from the file actions: `add` rows with
    * dataChange are inserts, `remove` rows with dataChange are
    * deletes (the removed file's rows — still on disk until VACUUM).
    * Output = data columns + `_change_type`, `_commit_version`,
    * `_commit_timestamp` (the same monotonic commit timestamps as
    * timestamp travel), plus the log's partitionValues injected as
    * string columns (partition columns never live in the files).
    *
    * Scale shape: THREE scan relations total however long the range —
    * all cdc files, all insert files, all delete files — each joined
    * against a small broadcast (file key → version, timestamp,
    * partition values) manifest; a file re-added across versions
    * simply matches several manifest rows, which IS the CDF
    * semantics. Refuses on a bad range, a missing commit JSON in the
    * range (CDF needs the commit files themselves), an unsupported
    * protocol line, a cdc file without `_change_type`, or
    * deletion-vector file actions in a version without cdc files
    * (synthesis would misread DV deletes). */
  def readChanges(spark: SparkSession, tableDir: String,
      startVersion: Long, endVersion: Long): DataFrame =
    readChanges(spark, tableDir, startVersion, Some(endVersion))

  /** The version of the LAST commit JSON under `_delta_log`; refuses
    * when there is none. Open-ended CDF reads ("changes since X")
    * resolve their end bound here. */
  private def latestVersion(tableDir: String): Long = {
    val vs = TableIo.list(s"$tableDir/_delta_log").flatMap(e => versionOf(e.name))
    if (vs.isEmpty)
      throw new graft.GraftAnalysisException(
        s"delta: no commits under $tableDir/_delta_log")
    vs.max
  }

  /** OPEN-ENDED CDF (round 17): `endVersion = None` reads "changes
    * since `startVersion`" up to the log's current latest commit —
    * the incremental-consumer tail pattern. */
  def readChanges(spark: SparkSession, tableDir: String,
      startVersion: Long, endVersionOpt: Option[Long]): DataFrame = {
    val endVersion = endVersionOpt.getOrElse(latestVersion(tableDir))
    if (startVersion < 0)
      throw new graft.GraftAnalysisException(s"delta: start version $startVersion is negative")
    if (endVersion < startVersion)
      throw new graft.GraftAnalysisException(
        s"delta: change range $startVersion..$endVersion is empty")
    val logDir = s"$tableDir/_delta_log"
    val entries = TableIo.list(logDir)
    val byVersion: Map[Long, TableIo.Entry] =
      entries.flatMap(e => versionOf(e.name).map(_ -> e)).toMap
    (startVersion to endVersion).find(!byVersion.contains(_)).foreach(v =>
      throw new graft.GraftAnalysisException(
        s"delta: commit JSON for version $v is missing; the change feed needs " +
          "the commit files themselves (vacuumed or checkpoint-only history)"))
    // the same monotonic timestamps as timestamp travel, over the
    // FULL surviving history so both surfaces agree
    val tsByVersion: Map[Long, Long] = {
      var prev = Long.MinValue
      byVersion.toSeq.sortBy(_._1).map { case (v, e) =>
        val t0 = commitInfoTs(s"$logDir/${e.name}").getOrElse(e.mtime)
        val t = if (prev == Long.MinValue) t0 else math.max(t0, prev + 1)
        prev = t
        v -> t
      }.toMap
    }
    // kind: 0 cdc, 1 insert, 2 delete
    final case class Chg(version: Long, path: String, kind: Int,
        pv: Map[String, String])
    val changes = Seq.newBuilder[Chg]
    // dataChange=false actions (OPTIMIZE rewrites) are CDF-invisible
    // by the protocol; a range holding ONLY those yields an EMPTY
    // feed, not a refusal — an incremental consumer polling across a
    // compaction must keep working
    var sawRewriteOnly = false
    (startVersion to endVersion).foreach { v =>
      val content = TableIo.readString(s"$logDir/${byVersion(v).name}")
      val lines = content.split("\n").iterator.map(_.trim).filter(_.nonEmpty).map { line =>
        try JsonMethods.parse(line) catch {
          case _: Exception => throw new graft.GraftAnalysisException(
            s"delta: malformed log line in version $v") }
      }.toSeq
      lines.foreach { jv =>
        jv \ "protocol" match {
          case p: JObject =>
            p \ "minReaderVersion" match {
              case JInt(r) if r == 1 || r == 2 => ()
              case JInt(r) if r == 3 =>
                val feats = p \ "readerFeatures" match {
                  case JArray(xs) => xs.collect { case JString(s) => s }
                  case _ => Nil
                }
                val unsupported = feats.filterNot(supportedReaderFeatures)
                if (unsupported.nonEmpty)
                  throw new graft.GraftAnalysisException(
                    s"delta: unsupported reader features: ${unsupported.sorted.mkString(", ")}")
              case _ => throw new graft.GraftAnalysisException(
                s"delta: unsupported minReaderVersion in version $v")
            }
          case _ => ()
        }
      }
      def pvOf(a: JValue): Map[String, String] = a \ "partitionValues" match {
        case JObject(fs) => fs.collect { case (k, JString(s)) => k -> s }.toMap
        case _ => Map.empty
      }
      def pathOf(a: JValue, what: String): String = a \ "path" match {
        case JString(s) => percentDecode(s)
        case _ => throw new graft.GraftAnalysisException(
          s"delta: $what action without a path in version $v")
      }
      def dataChange(a: JValue): Boolean = a \ "dataChange" match {
        case JBool(b) => b
        case _ => true // the protocol's default reading for CDF purposes
      }
      val cdcs = lines.flatMap(jv => jv \ "cdc" match {
        case c: JObject => Some(Chg(v, pathOf(c, "cdc"), 0, pvOf(c)))
        case _ => None
      })
      if (cdcs.nonEmpty) changes ++= cdcs
      else lines.foreach { jv =>
        jv \ "add" match {
          case a: JObject if dataChange(a) =>
            if ((a \ "deletionVector").isInstanceOf[JObject])
              throw new graft.GraftAnalysisException(
                s"delta: version $v carries deletion-vector file actions and no " +
                  "cdc files; synthesizing its change feed would misread DV deletes")
            changes += Chg(v, pathOf(a, "add"), 1, pvOf(a))
          case _: JObject => sawRewriteOnly = true
          case _ => ()
        }
        jv \ "remove" match {
          case r: JObject if dataChange(r) =>
            if ((r \ "deletionVector").isInstanceOf[JObject])
              throw new graft.GraftAnalysisException(
                s"delta: version $v carries deletion-vector file actions and no " +
                  "cdc files; synthesizing its change feed would misread DV deletes")
            changes += Chg(v, pathOf(r, "remove"), 2, pvOf(r))
          case _: JObject => sawRewriteOnly = true
          case _ => ()
        }
      }
    }
    val all = changes.result()
    if (all.isEmpty && sawRewriteOnly)
      // only rewrites in range: a legitimate EMPTY feed with the full
      // CDF shape (data columns + the three change columns)
      return readTable(spark, tableDir).limit(0)
        .withColumn("_change_type", lit(null).cast(StringType))
        .withColumn("_commit_version", lit(null).cast(LongType))
        .withColumn("_commit_timestamp", lit(null).cast(LongType))
    if (all.isEmpty)
      throw new graft.GraftAnalysisException(
        s"delta: no data changes in versions $startVersion..$endVersion")
    val pkeys: Seq[String] = all.flatMap(_.pv.keys).distinct.sorted
    def resolve(p: String): String =
      if (TableIo.hasScheme(p) || p.startsWith("/"))
        (if (p.startsWith("file:")) p.stripPrefix("file:") else p)
      else s"$tableDir/$p"
    val arms = Seq(0, 1, 2).flatMap { kind =>
      val group = all.filter(_.kind == kind)
      if (group.isEmpty) None
      else {
        val mRows = group.flatMap { c =>
          keyForms(resolve(c.path)).map(k =>
            Row.fromSeq(k +: c.version +: tsByVersion(c.version) +:
              pkeys.map(c.pv.get(_).orNull)))
        }
        val mSchema = StructType(
          StructField("__graft_file_key", StringType) +:
            StructField("_commit_version", LongType) +:
            StructField("_commit_timestamp", LongType) +:
            pkeys.map(k => StructField(k, StringType)))
        val manifest = spark.createDataFrame(
          java.util.Arrays.asList(mRows: _*), mSchema)
        val scan0 = spark.read.parquet(group.map(c => resolve(c.path)).distinct: _*)
        if (kind == 0 && !scan0.columns.contains("_change_type"))
          throw new graft.GraftAnalysisException(
            "delta: cdc file lacks the _change_type column")
        val withType = kind match {
          case 0 => scan0
          case 1 => scan0.withColumn("_change_type", lit("insert"))
          case _ => scan0.withColumn("_change_type", lit("delete"))
        }
        // the keyForms drift guard: an unmatched scan path raises
        // instead of emitting NULL versions
        Some(withType
          .withColumn("__graft_file_key", col("_metadata.file_path"))
          .join(broadcast(manifest), Seq("__graft_file_key"), "left")
          .withColumn("_commit_version",
            when(col("_commit_version").isNotNull, col("_commit_version"))
              .otherwise(raise_error(concat(
                lit("delta: change-feed scan path did not match the manifest: "),
                col("__graft_file_key"))).cast("long")))
          .drop("__graft_file_key"))
      }
    }
    arms.reduce(_ unionByName _)
  }

  /** The surviving commits' MONOTONIC effective timestamps — the same
    * rule timestamp travel uses (commitInfo.inCommitTimestamp, else
    * commitInfo.timestamp, else file mtime; each at least its
    * predecessor's + 1 ms). */
  private def monotonicStamps(tableDir: String): Seq[(Long, Long)] = {
    val logDir = s"$tableDir/_delta_log"
    val commits = TableIo.list(logDir)
      .flatMap(e => versionOf(e.name).map(v => (v, e))).sortBy(_._1)
    var prev = Long.MinValue
    commits.map { case (v, e) =>
      val t0 = commitInfoTs(s"$logDir/${e.name}").getOrElse(e.mtime)
      val t = if (prev == Long.MinValue) t0 else math.max(t0, prev + 1)
      prev = t
      (v, t)
    }
  }

  /** CDF by STARTING TIMESTAMP (round 17): resolve the start bound to
    * the EARLIEST surviving commit whose effective monotonic timestamp
    * is ≥ the target — the protocol's startingTimestamp rule for
    * change feeds (the first commit at or after the instant) — then
    * read changes to `endVersionOpt` (None = latest). A timestamp past
    * the last commit refuses by name: there are no changes to serve,
    * and silently returning an empty feed would hide a mis-aimed
    * consumer. */
  def readChangesAt(spark: SparkSession, tableDir: String,
      startTsMillis: Long, endVersionOpt: Option[Long]): DataFrame =
    readChangesAt(spark, tableDir, startTsMillis, endVersionOpt, None)

  /** [[readChangesAt]] with an optional ENDING timestamp: the end
    * bound resolves to the LATEST commit at or before it (the
    * timestamp-travel rule); an end before the start refuses. An
    * explicit `endVersionOpt` and `endTsMillis` are mutually
    * exclusive at the source surface. */
  def readChangesAt(spark: SparkSession, tableDir: String,
      startTsMillis: Long, endVersionOpt: Option[Long],
      endTsMillis: Option[Long]): DataFrame = {
    val stamped = monotonicStamps(tableDir)
    if (stamped.isEmpty)
      throw new graft.GraftAnalysisException(
        s"delta: no commits under $tableDir/_delta_log")
    val start = stamped.find(_._2 >= startTsMillis).getOrElse(
      throw new graft.GraftAnalysisException(
        s"delta: starting timestamp $startTsMillis is after the last commit " +
          s"(version ${stamped.last._1} at ${stamped.last._2}); no changes exist at or after it"))._1
    val end = endTsMillis match {
      case None => endVersionOpt
      case Some(ts) => Some(resolveEndTs(tableDir, ts))
    }
    readChanges(spark, tableDir, start, end)
  }

  /** Resolve an ENDING timestamp to the latest commit at or before it
    * (the timestamp-travel rule); before-first refuses by name. */
  def resolveEndTs(tableDir: String, tsMillis: Long): Long = {
    val stamped = monotonicStamps(tableDir)
    if (stamped.isEmpty)
      throw new graft.GraftAnalysisException(
        s"delta: no commits under $tableDir/_delta_log")
    stamped.takeWhile(_._2 <= tsMillis).lastOption.getOrElse(
      throw new graft.GraftAnalysisException(
        s"delta: ending timestamp $tsMillis precedes the first commit " +
          s"(version ${stamped.head._1} at ${stamped.head._2})"))._1
  }

  /** The first commitInfo timestamp of a commit file: the in-commit
    * timestamp when present (that feature's precedence), else the
    * wall-clock `timestamp`. */
  private def commitInfoTs(path: String): Option[Long] = {
    val content = TableIo.readString(path)
    content.split("\n").iterator.map(_.trim).filter(_.nonEmpty).flatMap { line =>
      (try JsonMethods.parse(line) catch { case _: Exception => JNothing }) \ "commitInfo" match {
        case ci: JObject => ci \ "inCommitTimestamp" match {
          case JInt(v) => Some(v.toLong)
          case _ => ci \ "timestamp" match {
            case JInt(v) => Some(v.toLong); case _ => None }
        }
        case _ => None
      }
    }.nextOption()
  }

  /** TIMESTAMP TRAVEL: resolve a wall-clock instant to a version by
    * commit timestamps, then delegate to version travel. Per-version
    * timestamps come from `commitInfo.inCommitTimestamp` when present
    * (the in-commit-timestamps feature takes precedence by design),
    * else `commitInfo.timestamp`, else the commit file's filesystem
    * modification time — made MONOTONIC the way the reference reader
    * adjusts them (each version's effective timestamp is at least its
    * predecessor's + 1 ms; writer clocks can regress). The chosen
    * version is the LATEST with effective timestamp ≤ the target; a
    * target before the first surviving commit's timestamp refuses —
    * a vacuumed history cannot be timestamp-resolved, and the
    * version-travel path then enforces replay contiguity. */
  def readTableAt(spark: SparkSession, tableDir: String, tsMillis: Long): DataFrame =
    readTableAt(spark, tableDir, tsMillis, None)

  /** [[readTableAt]] with the data-skipping predicate threaded
    * through (see the filtered [[readTable]]). */
  def readTableAt(spark: SparkSession, tableDir: String, tsMillis: Long,
      pruneWhere: Option[Column]): DataFrame = {
    val logDir = s"$tableDir/_delta_log"
    val commits = TableIo.list(logDir)
      .flatMap(e => versionOf(e.name).map(v => (v, e))).sortBy(_._1)
    if (commits.isEmpty)
      throw new graft.GraftAnalysisException(s"delta: no commits under $tableDir/_delta_log")
    def tsOf(e: TableIo.Entry): Long =
      commitInfoTs(s"$logDir/${e.name}").getOrElse(e.mtime)
    var prev = Long.MinValue
    val stamped = commits.map { case (v, e) =>
      val t = if (prev == Long.MinValue) tsOf(e) else math.max(tsOf(e), prev + 1)
      prev = t
      (v, t)
    }
    if (tsMillis < stamped.head._2)
      throw new graft.GraftAnalysisException(
        s"delta: timestamp $tsMillis precedes the first available commit " +
          s"(version ${stamped.head._1} at ${stamped.head._2}); no replayable state existed")
    val version = stamped.takeWhile(_._2 <= tsMillis).last._1
    readTable(spark, tableDir, Some(version), pruneWhere)
  }

  /** TIME TRAVEL (round 15 continuation): read the table AS OF
    * `versionAsOf` — the checkpoint seeds only when its version is
    * ≤ the target, later commits are dropped, and the replay must
    * actually REACH the target: a requested version beyond the log
    * refuses by name, and a history truncated below the target
    * (vacuumed JSONs with no usable checkpoint) refuses rather than
    * silently replaying a partial state. */
  def readTable(spark: SparkSession, tableDir: String,
      versionAsOf: Option[Long]): DataFrame =
    readTable(spark, tableDir, versionAsOf, None)

  /** [[readTable]] with DATA SKIPPING (round 17): `pruneWhere` is a
    * predicate over the table's columns, applied BOTH file-level at
    * the log replay — partition conjuncts prune exactly against each
    * add's partitionValues, the rest min/max-skip against the
    * add-action `stats` JSON ([[skipFilter]]) — and to the scanned
    * rows, so the result equals `readTable(...).where(pruneWhere)`
    * while opening only files that may match. At 100 TB this is what
    * turns a date-filtered read of a partitioned table into opening
    * that date's files instead of all of them. */
  def readTable(spark: SparkSession, tableDir: String,
      versionAsOf: Option[Long], pruneWhere: Option[Column]): DataFrame = {
    val logDir = s"$tableDir/_delta_log"
    val files = TableIo.list(logDir)
    val lastCp: Option[(Long, Option[Int])] =
      files.find(_.name == "_last_checkpoint").map { _ =>
        val jv = try JsonMethods.parse(
            TableIo.readString(s"$logDir/_last_checkpoint"))
          catch { case _: Exception =>
            throw new graft.GraftAnalysisException("delta: malformed _last_checkpoint") }
        val v = jv \ "version" match {
          case JInt(x) => x.toLong
          case _ => throw new graft.GraftAnalysisException(
            "delta: _last_checkpoint missing version")
        }
        val parts = jv \ "parts" match { case JInt(x) => Some(x.toInt); case _ => None }
        (v, parts)
      }
      // a checkpoint BEYOND the target cannot seed a time travel
      .filter { case (v, _) => versionAsOf.forall(v <= _) }
    val seedNorm: Option[(Snapshot, DataFrame)] = lastCp.map { case (v, parts) =>
      val names = files.map(_.name).toSet
      val cpNames = checkpointNames(v, parts)
      val missing = cpNames.filterNot(names.contains)
      if (missing.isEmpty) {
        val norm = normalizeCheckpoint(
          spark.read.parquet(cpNames.map(n => s"$logDir/$n").toSeq: _*), 0L)
        (checkpointFurniture(norm), norm)
      } else if (parts.isEmpty) {
        // V2 (UUID-named) checkpoint: <version>.checkpoint.<uuid>
        // .parquet, whose `sidecar` actions name parquet files under
        // _delta_log/_sidecars/ carrying the add/remove rows
        val prefix = f"$v%020d.checkpoint."
        def uuidNamed(ext: String) = files.filter(f => f.name.startsWith(prefix) &&
          f.name.endsWith(ext) &&
          !f.name.matches(""".*\.checkpoint\.\d{10}\.\d{10}\.parquet"""))
        val v2p = uuidNamed(".parquet")
        val v2j = uuidNamed(".json")
        if (v2p.length + v2j.length != 1)
          throw new graft.GraftAnalysisException(
            s"delta: _last_checkpoint names version $v but ${missing.head} is missing")
        // the top file carries metaData/protocol/checkpointMetadata
        // plus `sidecar` actions; sidecars are parquet under
        // _delta_log/_sidecars/ holding the add/remove rows
        val (topNorm, sidecars: Seq[String]) =
          if (v2p.nonEmpty) {
            val cpDf = spark.read.parquet(s"$logDir/${v2p.head.name}")
            val sc =
              if (!cpDf.columns.contains("sidecar")) Seq.empty[String]
              else cpDf.select(col("sidecar.path"))
                .where(col("sidecar.path").isNotNull)
                .collect().map(_.getString(0)).toSeq
            (normalizeCheckpoint(cpDf, 0L), sc)
          } else {
            // JSON flavor: one action object per line — the same
            // canonical stream parseCommits produces; sidecar lines
            // parse to all-null action structs and drop out
            val content = TableIo.readString(s"$logDir/${v2j.head.name}")
            val sc = content.split("\n").iterator.map(_.trim).filter(_.nonEmpty).flatMap { l =>
              (try JsonMethods.parse(l) catch { case _: Exception => JNothing }) \ "sidecar" \ "path" match {
                case JString(s) => Some(s)
                case _ => None
              }
            }.toSeq
            import spark.implicits._
            (parseCommitsNorm(Seq((0L, content)).toDF("version", "content")), sc)
          }
        val sidecarPaths = sidecars.map { p =>
          if (TableIo.hasScheme(p) || p.startsWith("/"))
            (if (p.startsWith("file:")) p.stripPrefix("file:") else p)
          else s"$logDir/_sidecars/$p"
        }
        sidecarPaths.find(p => !TableIo.isFile(p)).foreach(p =>
          throw new graft.GraftAnalysisException(s"delta: checkpoint sidecar missing: $p"))
        // sidecar schemas differ from the checkpoint's (add/remove
        // only) — normalize each to the canonical action stream, THEN
        // union; a single multi-path parquet read would pin one
        // file's schema and silently null the rest
        val norm = (topNorm +:
          sidecarPaths.map(p => normalizeCheckpoint(spark.read.parquet(p), 0L)))
          .reduce(_ unionByName _)
        (checkpointFurniture(norm), norm)
      } else
        throw new graft.GraftAnalysisException(
          s"delta: _last_checkpoint names version $v but ${missing.head} is missing")
    }
    val cpVersion = lastCp.map(_._1).getOrElse(-1L)
    // select versions BEFORE fetching bytes: on a remote FS the
    // checkpoint-covered prefix must cost zero reads
    val commits = files
      .flatMap(f => versionOf(f.name).map(v => (v, f.name)))
      .filter(_._1 > cpVersion)
      .filter(c => versionAsOf.forall(c._1 <= _))
      .sortBy(_._1)
      .map { case (v, n) => v -> TableIo.readString(s"$logDir/$n") }
    versionAsOf.foreach { v =>
      // the replay must actually REACH the requested version, from a
      // usable base: silently serving a neighboring version is the
      // time-travel analogue of misreading a column
      if (v < 0) throw new graft.GraftAnalysisException(s"delta: version $v is negative")
      val reached = math.max(cpVersion, commits.lastOption.map(_._1).getOrElse(-1L))
      if (reached != v)
        throw new graft.GraftAnalysisException(
          s"delta: version $v is not available (nearest replayable state: " +
            (if (reached < 0) "none" else s"version $reached") + ")")
      val expectFrom = if (seedNorm.isDefined) cpVersion + 1 else 0L
      if (commits.map(_._1) != (expectFrom to v))
        throw new graft.GraftAnalysisException(
          s"delta: the commit history from version $expectFrom to $v is not " +
            "contiguous (vacuumed or partially copied log); refusing beats " +
            "replaying a partial state")
    }
    if (commits.isEmpty && seedNorm.isEmpty)
      throw new graft.GraftAnalysisException(s"delta: no commits under $tableDir/_delta_log")
    val snapBase = snapshotOfE(commits, seedNorm.map(_._1)) match {
      case Right(s) => s
      case Left(reason) => throw new graft.GraftAnalysisException(
        s"delta: $reason (log at $tableDir/_delta_log)")
    }
    // column-mapping facts and the (tolerantly parsed) table schema
    // are needed BEFORE the file list materializes: data skipping
    // keys stats by physical name and parses them by schema type
    val cmMode0 = snapBase.configuration.getOrElse("delta.columnMapping.mode", "none")
    val logicalSchema: Option[StructType] =
      if (cmMode0 == "none") None
      else DataType.fromJson(Option(snapBase.schemaJson).getOrElse(
          throw new graft.GraftAnalysisException(
            "delta: column mapping without a schemaString"))) match {
        case st: StructType => Some(st)
        case _ => throw new graft.GraftAnalysisException(
          "delta: schemaString is not a struct")
      }
    def physicalName(f: StructField): String =
      if (f.metadata.contains("delta.columnMapping.physicalName"))
        f.metadata.getString("delta.columnMapping.physicalName")
      else f.name
    // mode none: parse the schema TOLERANTLY for stats typing only
    // (fixtures and minimal writers carry schemaString "{}")
    val statsSchema: Option[StructType] = logicalSchema.orElse(
      Option(snapBase.schemaJson).flatMap { js =>
        try DataType.fromJson(js) match {
          case st: StructType if st.fields.nonEmpty => Some(st)
          case _ => None
        } catch { case _: Exception => None }
      })
    val physOfAll: Map[String, String] = statsSchema
      .map(_.fields.map(f => f.name -> physicalName(f)).toMap)
      .getOrElse(Map.empty)
    val keep: Option[(Column, Column) => Column] = pruneWhere.map(p =>
      skipFilter(p, snapBase.partitionColumns, physOfAll, statsSchema))
    // the FILE list: with a checkpoint, merged cluster-side (the
    // checkpoint action rows + the parsed tail reduce by one max_by)
    // so the driver only ever holds the capped FINAL active list;
    // without one, the driver JSON replay is bounded by the log text
    // already in memory — capped all the same. Sorted for a
    // deterministic scan-path order.
    val activeAdds: Seq[AddFile] = (seedNorm match {
      case Some((_, norm)) =>
        import spark.implicits._
        val tail = parseCommitsNorm(
          spark.createDataset(commits).toDF("version", "content"))
        collectActiveAdds(spark, norm.unionByName(tail), keep)
      case None =>
        capFiles(spark, snapBase.files.size)
        keep match {
          case Some(k) => pruneAddsDriver(spark, snapBase.files, k)
          case None => snapBase.files
        }
    }).sortBy(f => (f.path, f.dv.map(_.uniqueId).getOrElse("")))
    val snap = snapBase.copy(files = activeAdds)
    if (snap.files.isEmpty)
      throw new graft.GraftAnalysisException(s"delta: table at $tableDir has no active files")
    val resolved = snap.files.map { f =>
      val p = if (f.path.contains("://") || f.path.startsWith("/")) f.path
              else s"$tableDir/${f.path}"
      f -> p
    }
    // column mapping: in `name` mode the log's schemaString carries
    // each field's physical parquet name in metadata — the scan
    // reads physical names and the final select maps them back to
    // logical ones (nested fields rename positionally via struct
    // cast). In `id` mode (round 15 continuation) the spec says
    // resolve by parquet FIELD ID: the data files' own footers are
    // probed (distributed ranged tail reads, distinct layouts only
    // reaching the driver) and each logical field's
    // delta.columnMapping.id looks up its parquet column name there;
    // heterogeneous per-file layouts refuse — a single shared scan
    // cannot re-project per file, and silently merging by name is
    // exactly the bug id mode exists to prevent.
    val cmMode = cmMode0 // declared above (data skipping needs it early)
    // id mode: parquet name per logical DATA field via footer field
    // ids (partition columns never live in the files — they keep the
    // physicalName metadata route either way)
    lazy val idModeName: StructField => String = {
      val layouts = ParquetMeta.distinctTopLevelLayouts(
        spark, resolved.map(_._2)) match {
        case Left(bad) => throw new graft.GraftAnalysisException(
          s"delta: id-mode column mapping but the parquet footer of '$bad' is unreadable")
        case Right(ls) => ls
      }
      if (layouts.size != 1)
        throw new graft.GraftAnalysisException(
          "delta: id-mode column mapping over heterogeneous parquet field-id " +
            "layouts; refusing beats silently misreading columns")
      val byId: Map[Long, String] = layouts.head
        .collect { case (n, Some(id)) => id -> n }
        .groupBy(_._1).map {
          case (id, vs) if vs.map(_._2).distinct.size == 1 => id -> vs.head._2
          case (id, _) => throw new graft.GraftAnalysisException(
            s"delta: duplicate parquet field id $id in the data files")
        }
      f => {
        if (!f.metadata.contains("delta.columnMapping.id"))
          throw new graft.GraftAnalysisException(
            s"delta: id-mode column mapping but field '${f.name}' has no column id")
        val id = f.metadata.getLong("delta.columnMapping.id")
        byId.getOrElse(id, throw new graft.GraftAnalysisException(
          s"delta: field id $id ('${f.name}') not present in the data files' footers"))
      }
    }
    def scanName(f: StructField): String =
      if (cmMode == "id") idModeName(f) else physicalName(f)

    // The log's schemaString is the AUTHORITY over the scan schema
    // (protocol §Schema): without it, a multi-path parquet read pins
    // ONE file's footer schema — a table whose files predate a schema
    // evolution would silently drop the newer columns (or serve the
    // wrong generation's width, depending on which file the reader
    // samples). Applying it also null-fills evolved-in columns for
    // pre-evolution files, exactly the protocol's read semantics.
    // Column-mapping modes keep the footer path: their scan works in
    // PHYSICAL names and maps back to logical below.
    val pcolsSet = snap.partitionColumns.toSet
    val base = (cmMode, statsSchema) match {
      case ("none", Some(st)) if st.fields.nonEmpty =>
        val dataSchema = StructType(
          st.fields.filterNot(f => pcolsSet(f.name)))
        spark.read.schema(dataSchema).parquet(resolved.map(_._2): _*)
      case _ => spark.read.parquet(resolved.map(_._2): _*)
    }
    val needDv = resolved.exists(_._1.dv.isDefined)
    val pcols = snap.partitionColumns
    var cur: DataFrame = base
    if (needDv || pcols.nonEmpty)
      cur = cur.withColumn("__graft_file_key", col("_metadata.file_path"))
    if (needDv) {
      // DV blobs (bounded metadata, KBs each) ship to executors and
      // explode to (file key, deleted row index) there — the driver
      // never materializes a position list. The anti-join is a
      // broadcast hash join on (file key, parquet row index).
      val blobRows = resolved.collect { case (f, p) if f.dv.isDefined =>
        (DeltaDv.load(tableDir, f.dv.get), p)
      }.flatMap { case (blob, p) => keyForms(p).map(k => Row(k, blob)) }
      val blobDf = spark.createDataFrame(
        java.util.Arrays.asList(blobRows: _*),
        StructType(Seq(StructField("__graft_dv_key", StringType),
          StructField("__graft_dv_blob", BinaryType))))
      val posUdf = udf((b: Array[Byte]) => DeltaDv.positions(b))
      val posDf = blobDf.select(col("__graft_dv_key"),
        explode(posUdf(col("__graft_dv_blob"))).as("__graft_dv_pos"))
      cur = cur.withColumn("__graft_row_idx", col("_metadata.row_index"))
        .join(broadcast(posDf),
          col("__graft_file_key") === col("__graft_dv_key") &&
            col("__graft_row_idx") === col("__graft_dv_pos"), "left_anti")
        .drop("__graft_row_idx")
    }
    if (pcols.nonEmpty) {
      // partitionValues in the log key by PHYSICAL name under column
      // mapping; metaData.partitionColumns stay logical
      val physOf: Map[String, String] = logicalSchema
        .map(st => st.fields.map(f => f.name -> physicalName(f)).toMap)
        .getOrElse(Map.empty)
      val rows = resolved.flatMap { case (f, p) =>
        keyForms(p).map(k =>
          Row.fromSeq(k +: (true +: pcols.map { c =>
            val key = physOf.getOrElse(c, c)
            f.partitionValues.get(key).orElse(f.partitionValues.get(c)).orNull
          })))
      }
      val mSchema = StructType(
        StructField("__graft_file_key", StringType) +:
          StructField("__graft_matched", BooleanType) +:
          pcols.map(c => StructField(c, StringType)))
      val manifest = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), mSchema)
      // A left join guards against key-form drift: if the runtime
      // reports a file_path spelling keyForms doesn't cover, the row
      // goes unmatched — raise rather than silently NULL the
      // partition columns (the check rides the partition columns
      // themselves, so it survives exactly as long as they are read).
      val joined = cur.join(broadcast(manifest), Seq("__graft_file_key"), "left")
      cur = pcols.foldLeft(joined) { (df, c) =>
        df.withColumn(c,
          when(col("__graft_matched").isNotNull, col(c))
            .otherwise(raise_error(concat(
              lit("delta: scan file path did not match the partition manifest: "),
              col("__graft_file_key")))))
      }.drop("__graft_matched")
    }
    if (needDv || pcols.nonEmpty) cur = cur.drop("__graft_file_key")
    val out = logicalSchema match {
      case None => cur
      case Some(st) =>
        val pset = pcols.toSet
        // id mode resolves only TOP-LEVEL columns by parquet field id;
        // nested struct fields would still rename positionally through
        // the cast below, and a file whose nested field order differs
        // from the logical schema (types permitting) would silently
        // swap values — the exact misread id mode exists to prevent.
        // Refuse by name instead.
        if (cmMode == "id") {
          def hasStruct(dt: DataType): Boolean = dt match {
            case _: StructType => true
            case a: ArrayType => hasStruct(a.elementType)
            case m: MapType => hasStruct(m.keyType) || hasStruct(m.valueType)
            case _ => false
          }
          st.fields.toSeq.filterNot(f => pset(f.name)).find(f => hasStruct(f.dataType))
            .foreach(f => throw new graft.GraftAnalysisException(
              s"delta: id-mode column mapping with nested struct column '${f.name}' " +
                "is unsupported (nested fields would rename positionally, not by id); " +
                "refusing beats silently swapping nested values"))
        }
        val dataCols = st.fields.toSeq.filterNot(f => pset(f.name)).map { f =>
          col(s"`${scanName(f)}`").cast(f.dataType).as(f.name)
        }
        // partition columns keep the mode-none contract: injected
        // from the log as strings, appended after the data columns
        cur.select(dataCols ++ pcols.map(c => col(s"`$c`")): _*)
    }
    // pruning is the optimization; the ROW filter is the semantics
    pruneWhere.map(out.where).getOrElse(out)
  }
}
