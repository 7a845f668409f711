package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
  *  - file paths are RELATIVE to the table root and percent-encoded
  *    (RFC 3986 unreserved set) — decoded here; absolute URIs pass
  *    through;
  *  - protocol gate: `minReaderVersion` 1 only (the classic format).
  *    Higher reader versions signal features that CHANGE READ
  *    SEMANTICS (column mapping, deletion vectors) — reading through
  *    them without honoring them silently returns wrong data, so the
  *    snapshot REFUSES, the quarantine contract (checkpoints are a
  *    read optimization the protocol lets a reader skip only when it
  *    reads every commit; we require the full JSON commit chain and
  *    refuse `_last_checkpoint`-truncated logs — declared).
  *
  * Scale shape: the log is small-by-construction metadata (thousands
  * of JSON lines for petabyte tables) — parsing is driver-trivial;
  * the OUTPUT (active file list) is what feeds a distributed
  * `spark.read.parquet` over the data. The DataFrame surface
  * ([[activeFiles]]) keeps the replay an aggregation over (version,
  * line) rows so even degenerate million-commit logs stay off the
  * driver until the bounded final set.
  */
object DeltaLog {

  final case class AddFile(path: String, partitionValues: Map[String, String],
      size: Long, modificationTime: Long, stats: Option[String])
  final case class Snapshot(tableId: String, schemaJson: String,
      partitionColumns: Seq[String], files: Seq[AddFile])

  private object Refuse extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def refuse(): Nothing = throw Refuse

  private def percentDecode(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new java.lang.StringBuilder(s.length)
    val bytes = new java.io.ByteArrayOutputStream()
    var i = 0
    def flush(): Unit = if (bytes.size() > 0) {
      sb.append(new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
      bytes.reset()
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val h = Character.digit(s.charAt(i + 1), 16)
        val l = Character.digit(s.charAt(i + 2), 16)
        if (h >= 0 && l >= 0) { bytes.write((h << 4) | l); i += 3 }
        else { flush(); sb.append(c); i += 1 }
      } else { flush(); sb.append(c); i += 1 }
    }
    flush()
    sb.toString
  }

  /** Replay commits (version-ascending, line order within a commit)
    * into the current snapshot. None on malformed JSON, an
    * unsupported protocol, or a log with no metaData. */
  def snapshotOf(commits: Seq[(Long, String)]): Option[Snapshot] =
    try {
      var tableId: String = null
      var schemaJson: String = null
      var partitionCols: Seq[String] = Seq.empty
      val active = scala.collection.mutable.LinkedHashMap.empty[String, AddFile]
      commits.sortBy(_._1).foreach { case (_, content) =>
        content.split("\n").iterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
          val jv = try JsonMethods.parse(line) catch { case _: Exception => refuse() }
          jv \ "protocol" match {
            case p: JObject =>
              p \ "minReaderVersion" match {
                case JInt(v) if v == 1 => ()
                case _ => refuse() // column mapping / DVs etc.: wrong-data risk
              }
            case _ => ()
          }
          jv \ "metaData" match {
            case m: JObject =>
              tableId = m \ "id" match { case JString(s) => s; case _ => refuse() }
              schemaJson = m \ "schemaString" match { case JString(s) => s; case _ => null }
              partitionCols = m \ "partitionColumns" match {
                case JArray(xs) => xs.map { case JString(s) => s; case _ => refuse() }
                case _ => Seq.empty
              }
            case _ => ()
          }
          jv \ "add" match {
            case a: JObject =>
              val path = a \ "path" match { case JString(s) => percentDecode(s); case _ => refuse() }
              val size = a \ "size" match { case JInt(v) => v.toLong; case _ => refuse() }
              val mod = a \ "modificationTime" match { case JInt(v) => v.toLong; case _ => 0L }
              val pv = a \ "partitionValues" match {
                case JObject(fs) => fs.collect { case (k, JString(v)) => k -> v }.toMap
                case _ => Map.empty[String, String]
              }
              val stats = a \ "stats" match { case JString(s) => Some(s); case _ => None }
              active(path) = AddFile(path, pv, size, mod, stats)
            case _ => ()
          }
          jv \ "remove" match {
            case r: JObject =>
              val path = r \ "path" match { case JString(s) => percentDecode(s); case _ => refuse() }
              active.remove(path)
            case _ => ()
          }
        }
      }
      if (tableId == null) refuse() // no metaData anywhere: not a delta log
      Some(Snapshot(tableId, schemaJson, partitionCols, active.values.toSeq))
    } catch { case Refuse => None }

  /** The `_delta_log` version of a commit file name, if it is one. */
  private[graft] def versionOf(name: String): Option[Long] = {
    val base = name.substring(name.lastIndexOf('/') + 1)
    if (base.length == 25 && base.endsWith(".json") &&
      base.take(20).forall(_.isDigit)) Some(base.take(20).toLong)
    else None
  }

  /** DataFrame surface: (version, content) commit rows → one row per
    * ACTIVE file (path, size, modification_time, n_partition_values,
    * partition_json, has_stats). Malformed logs emit nothing. */
  def activeFiles(df: DataFrame, versionCol: String, contentCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val commits = df.select(col(versionCol).cast("long"), col(contentCol).cast("string"))
      .as[(Long, String)]
      .collect() // the log is bounded metadata; see scaladoc
      .toSeq
    snapshotOf(commits) match {
      case Some(snap) =>
        val rows = snap.files.map { f =>
          val pj = f.partitionValues.toSeq.sortBy(_._1)
            .map { case (k, v) => s"$k=$v" }.mkString(",")
          (f.path, f.size, f.modificationTime, f.partitionValues.size, pj, f.stats.isDefined)
        }
        rows.toDF("path", "size", "modification_time", "n_partition_values",
          "partition_json", "has_stats")
      case None =>
        Seq.empty[(String, Long, Long, Int, String, Boolean)]
          .toDF("path", "size", "modification_time", "n_partition_values",
            "partition_json", "has_stats")
    }
  }

  /** Read the CURRENT data of a classic (reader-version-1) Delta
    * table: replay the `_delta_log` commit JSONs, then scan the active parquet
    * files, injecting each file's partitionValues as literal columns
    * (grouped by distinct partition tuple — one union arm per tuple,
    * which AQE coalesces; partition values live in the LOG, not the
    * files, per the protocol). Refuses (analysis error) on
    * unsupported protocol or a checkpoint-truncated log. */
  def readTable(spark: SparkSession, tableDir: String): DataFrame = {
    val dir = new java.io.File(tableDir, "_delta_log")
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
    if (files.exists(_.getName == "_last_checkpoint"))
      throw new graft.GraftAnalysisException(
        "delta: checkpoint-truncated logs unsupported (full JSON commit chain required)")
    val commits = files.toSeq
      .flatMap(f => versionOf(f.getName).map(v =>
        v -> new String(java.nio.file.Files.readAllBytes(f.toPath),
          java.nio.charset.StandardCharsets.UTF_8)))
      .sortBy(_._1)
    if (commits.isEmpty)
      throw new graft.GraftAnalysisException(s"delta: no commits under $tableDir/_delta_log")
    val snap = snapshotOf(commits).getOrElse(
      throw new graft.GraftAnalysisException(
        s"delta: unreadable log at $tableDir (unsupported protocol or malformed action)"))
    if (snap.files.isEmpty)
      throw new graft.GraftAnalysisException(s"delta: table at $tableDir has no active files")
    val arms = snap.files.groupBy(_.partitionValues).toSeq.map { case (pv, fs) =>
      val paths = fs.map(f =>
        if (f.path.contains("://") || f.path.startsWith("/")) f.path
        else s"$tableDir/${f.path}")
      val base = spark.read.parquet(paths: _*)
      snap.partitionColumns.foldLeft(base) { (d, c) =>
        d.withColumn(c, lit(pv.getOrElse(c, null: String)))
      }
    }
    arms.reduce(_.unionByName(_))
  }
}
