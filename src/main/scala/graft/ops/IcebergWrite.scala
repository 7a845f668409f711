package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Apache Iceberg APPEND writer, scoped v1 (single-writer,
  * append-only) — the second half of the round-17 table-format write
  * story beside [[DeltaWrite]], built on the in-repo from-spec Avro
  * writers the fixture builders already use. From the published
  * Iceberg Table Spec:
  *
  *  - data files are plain parquet holding EVERY column (no Hive
  *    partition-dir column dropping — v1 writes the unpartitioned
  *    layout; `clusterBy` range-clusters files on the given columns
  *    so their recorded bounds become disjoint and the bounds
  *    skipper prunes effectively, the Spark-idiomatic substitute for
  *    identity partitioning at this scope);
  *  - each snapshot's manifest (Avro) lists its data files with
  *    per-column `lower_bounds`/`upper_bounds` +
  *    `null_value_counts`/`value_counts` (Appendix D single-value
  *    serialization) — exactly what [[Iceberg.readTable]]'s
  *    column-bounds skipping consumes;
  *  - an APPEND commit = new manifest + a manifest list carrying ALL
  *    live manifests (previous snapshot's + the new one) + a new
  *    `vN.metadata.json` with the snapshot appended and
  *    `current-snapshot-id`/`snapshot-log` advanced;
  *  - commit atomicity = exclusive creation of the next metadata
  *    version (hard link, the [[DeltaWrite]] trick — POSIX rename
  *    would silently replace a racing writer's commit); the
  *    version-hint update follows the win. Conflict resolution is
  *    out of the v1 scope, by name.
  *
  * Append-compat gate: format-version ≤ 2, same schema (names +
  * types), no delete manifests in the current snapshot (appending
  * around row-level deletes this writer cannot re-sequence could
  * resurrect deleted rows — refuse rather than risk it).
  *
  * Scale shape: one distributed `df.write` (plus the optional
  * repartitionByRange), one cluster-side per-file stats aggregation;
  * the manifest/metadata walk is metadata-bounded driver work.
  */
object IcebergWrite {

  private def refuse(msg: String): Nothing =
    throw new graft.GraftAnalysisException(s"iceberg write: $msg")

  /** Iceberg type string for a Spark type; None = this writer cannot
    * record the column in the schema (refuse — silently dropping a
    * column is data loss). */
  private def icebergTypeOf(dt: DataType): Option[String] = dt match {
    case IntegerType | ShortType | ByteType => Some("int")
    case LongType => Some("long")
    case FloatType => Some("float")
    case DoubleType => Some("double")
    case StringType => Some("string")
    case BooleanType => Some("boolean")
    case DateType => Some("date")
    case TimestampType => Some("timestamptz")
    case TimestampNTZType => Some("timestamp")
    case BinaryType => Some("binary")
    case d: DecimalType => Some(s"decimal(${d.precision},${d.scale})")
    case _ => None
  }

  /** Appendix D single-value encode for the bound types the reader's
    * [[Iceberg.decodeBound]] compares; None = bounds not recorded for
    * this type (floats/doubles deliberately — NaN). */
  private def encodeBound(dt: DataType, v: Any): Option[Array[Byte]] = (dt, v) match {
    case (_, null) => None
    case (IntegerType | ShortType | ByteType, n) =>
      Some(java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(n.toString.toInt).array())
    case (LongType, n: java.lang.Long) => Some(Iceberg.encodeBoundLong(n))
    case (StringType, s: String) if s.length <= 256 =>
      Some(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    case (BooleanType, b: java.lang.Boolean) =>
      Some(Array[Byte](if (b) 1 else 0))
    case (DateType, d: java.sql.Date) =>
      Some(java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(d.toLocalDate.toEpochDay.toInt).array())
    case _ => None
  }

  /** Append `df` to the Iceberg table at `tableDir`, creating it when
    * no metadata exists. `clusterBy` range-partitions the write on the
    * given columns (disjoint per-file bounds → prunable). Returns the
    * committed snapshot id. */
  def append(spark: SparkSession, df: DataFrame, tableDir: String,
      clusterBy: Seq[String] = Seq.empty, numFiles: Int = 0): Long = {
    val schema = df.schema
    if (schema.fields.isEmpty) refuse("empty schema")
    clusterBy.foreach(c => if (!schema.fieldNames.contains(c))
      refuse(s"cluster column '$c' is not in the data"))
    schema.fields.foreach(f => if (icebergTypeOf(f.dataType).isEmpty)
      refuse(s"column '${f.name}' has type ${f.dataType.simpleString}, which this " +
        "writer cannot record in an Iceberg schema; refusing beats dropping it"))
    if (df.isEmpty) refuse("nothing to append (empty input)")

    val metaDir = new java.io.File(tableDir, "metadata")
    val existingMeta: Option[(Int, String)] = // (version N of vN.metadata.json, content)
      Option(metaDir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.matches("""v\d+\.metadata\.json"""))
        .map(f => f.getName.stripPrefix("v").stripSuffix(".metadata.json").toInt -> f)
        .sortBy(_._1).lastOption
        .map { case (v, f) => v -> new String(
          java.nio.file.Files.readAllBytes(f.toPath),
          java.nio.charset.StandardCharsets.UTF_8) }

    import org.json4s._
    import org.json4s.jackson.JsonMethods
    // prior state: snapshots to carry forward + compat gate
    final case class Prior(metaVersion: Int, snapshots: Seq[JValue],
        currentManifests: Seq[(String, Long, Int)], snapshotLog: Seq[JValue],
        maxSnapshotId: Long)
    val prior: Option[Prior] = existingMeta.map { case (mv, content) =>
      val meta = Iceberg.parseMetadata(content).getOrElse(
        refuse("existing metadata is unreadable; cannot append"))
      if (meta.formatVersion > 2) refuse(s"format-version ${meta.formatVersion} unsupported")
      // schema compat (names + types as sets)
      val existingFields = meta.schemaFields.map(f => (f.name, f.tpe)).sorted
      val newFields = schema.fields.map(f =>
        (f.name, icebergTypeOf(f.dataType).get)).toSeq.sorted
      if (existingFields.nonEmpty && existingFields != newFields)
        refuse(s"schema mismatch: table has ${existingFields.mkString(",")}, " +
          s"append carries ${newFields.mkString(",")}")
      val jv = JsonMethods.parse(content)
      val snaps = jv \ "snapshots" match { case JArray(xs) => xs; case _ => Nil }
      val slog = jv \ "snapshot-log" match { case JArray(xs) => xs; case _ => Nil }
      val curManifests: Seq[(String, Long, Int)] = meta.currentSnapshotId match {
        case None => Seq.empty
        case Some(cur) =>
          val snap = meta.snapshots.find(_.id == cur).getOrElse(
            refuse("current snapshot missing from the snapshots list"))
          val ml = snap.manifestList.getOrElse(
            refuse("current snapshot has no manifest list; cannot carry it forward"))
          val f = new java.io.File(Iceberg.resolvePath(tableDir, meta.location, ml))
          if (!f.isFile) refuse(s"manifest list missing: ${f.getName}")
          val entries = Iceberg.manifestListEntries(
            java.nio.file.Files.readAllBytes(f.toPath)).getOrElse(
            refuse("unreadable current manifest list"))
          if (entries.exists(_._2 == 1))
            refuse("current snapshot carries delete manifests; appending around " +
              "row-level deletes this writer cannot re-sequence risks resurrecting " +
              "deleted rows — out of the v1 scope")
          entries.map { case (p, c, _) =>
            val mf = new java.io.File(Iceberg.resolvePath(tableDir, meta.location, p))
            (p, mf.length(), c)
          }
      }
      Prior(mv, snaps, curManifests, slog, meta.snapshots.map(_.id).foldLeft(0L)(math.max))
    }

    // ONE distributed data write (range-clustered when asked)
    val tmp = java.nio.file.Files.createTempDirectory("graft-iceberg-append").toFile
    val shaped0 =
      if (clusterBy.isEmpty) df
      else {
        val n = if (numFiles > 0) numFiles else spark.sparkContext.defaultParallelism
        df.repartitionByRange(n, clusterBy.map(c => col(s"`$c`")): _*)
      }
    shaped0.write.mode("overwrite").parquet(tmp.getAbsolutePath)
    val parts = Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).toSeq
    if (parts.isEmpty) refuse("the data write produced no files")
    val dataDir = new java.io.File(tableDir, "data"); dataDir.mkdirs()
    val moved: Seq[java.io.File] = parts.map { p =>
      val dest = new java.io.File(dataDir, p.getName)
      java.nio.file.Files.move(p.toPath, dest.toPath)
      dest
    }
    Option(tmp.listFiles()).getOrElse(Array.empty).foreach(_.delete()); tmp.delete()

    // per-file stats: one cluster aggregation, bounds for every
    // comparable column (the skipper's food)
    val statsCols = schema.fields.toSeq.filter(_.dataType match {
      case IntegerType | ShortType | ByteType | LongType | StringType |
           BooleanType | DateType => true
      case _ => false
    })
    val aggs: Seq[org.apache.spark.sql.Column] =
      count(lit(1)).as("__n") +: statsCols.flatMap { f =>
        Seq(min(col(s"`${f.name}`")).as(s"${f.name}__lo"),
          max(col(s"`${f.name}`")).as(s"${f.name}__hi"),
          sum(col(s"`${f.name}`").isNull.cast("long")).as(s"${f.name}__nc"))
      }
    val statRows: Map[String, Row] = spark.read.parquet(moved.map(_.getAbsolutePath): _*)
      .groupBy(col("_metadata.file_path").as("__fp"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => r.getString(0).substring(r.getString(0).lastIndexOf('/') + 1) -> r).toMap

    val fieldId: Map[String, Int] =
      schema.fields.zipWithIndex.map { case (f, i) => f.name -> (i + 1) }.toMap
    val entries: Seq[Iceberg.Entry] = moved.map { f =>
      val r = statRows.getOrElse(f.getName, refuse(s"no stats row for ${f.getName}"))
      val lo = Map.newBuilder[Int, Array[Byte]]
      val hi = Map.newBuilder[Int, Array[Byte]]
      val nc = Map.newBuilder[Int, Long]
      val vc = Map.newBuilder[Int, Long]
      statsCols.zipWithIndex.foreach { case (sf, i) =>
        val id = fieldId(sf.name)
        encodeBound(sf.dataType, r.get(2 + 3 * i)).foreach(b => lo += id -> b)
        encodeBound(sf.dataType, r.get(3 + 3 * i)).foreach(b => hi += id -> b)
        nc += id -> r.getLong(4 + 3 * i)
        vc += id -> r.getLong(1)
      }
      Iceberg.Entry(1, s"$tableDir/data/${f.getName}", "PARQUET",
        r.getLong(1), f.length(),
        lowerBounds = lo.result(), upperBounds = hi.result(),
        nullCounts = nc.result(), valueCounts = vc.result())
    }

    val snapshotId = prior.map(_.maxSnapshotId + 1).getOrElse(1L)
    val metaVersion = prior.map(_.metaVersion + 1).getOrElse(1)
    val manifestName = f"m-$snapshotId%05d.avro"
    val manifest = Iceberg.writeManifestBounds(entries, s"graft-ib-w-$snapshotId")
    metaDir.mkdirs()
    java.nio.file.Files.write(new java.io.File(metaDir, manifestName).toPath, manifest)
    val allManifests: Seq[(String, Long, Int)] =
      prior.map(_.currentManifests).getOrElse(Seq.empty) :+
        ((s"$tableDir/metadata/$manifestName", manifest.length.toLong, 0))
    val mlName = f"snap-$snapshotId%05d.avro"
    val ml = Iceberg.writeManifestListV2(allManifests.map { case (p, l, c) => (p, l, c) },
      s"graft-ib-ml-$snapshotId")
    java.nio.file.Files.write(new java.io.File(metaDir, mlName).toPath, ml)

    // the new metadata document
    import org.json4s.JsonDSL._
    val now = System.currentTimeMillis()
    val schemaJson: JValue =
      ("type" -> "struct") ~ ("schema-id" -> 0) ~
        ("fields" -> schema.fields.toList.map(f =>
          ("id" -> fieldId(f.name)) ~ ("name" -> f.name) ~
            ("required" -> false) ~ ("type" -> icebergTypeOf(f.dataType).get)))
    val newSnap: JValue =
      ("snapshot-id" -> snapshotId) ~ ("timestamp-ms" -> now) ~
        ("manifest-list" -> s"$tableDir/metadata/$mlName") ~
        ("summary" -> (("operation" -> "append"): JObject))
    val metaJson = JsonMethods.pretty(JsonMethods.render(
      ("format-version" -> 2) ~
        ("table-uuid" -> java.util.UUID.nameUUIDFromBytes(
          s"graft-iceberg:$tableDir".getBytes(
            java.nio.charset.StandardCharsets.UTF_8)).toString) ~
        ("location" -> tableDir) ~
        ("last-updated-ms" -> now) ~
        ("current-schema-id" -> 0) ~
        ("schemas" -> List(schemaJson)) ~
        ("default-spec-id" -> 0) ~
        ("partition-specs" -> List(("spec-id" -> 0) ~
          ("fields" -> List.empty[JValue]))) ~
        ("current-snapshot-id" -> snapshotId) ~
        ("snapshots" -> (prior.map(_.snapshots).getOrElse(Nil) :+ newSnap)) ~
        ("snapshot-log" -> (prior.map(_.snapshotLog).getOrElse(Nil) :+
          ((("timestamp-ms" -> now) ~ ("snapshot-id" -> snapshotId)): JValue)))))

    // ATOMIC EXCLUSIVE publish of vN.metadata.json (hard link); the
    // version hint follows the win
    val metaTmp = java.io.File.createTempFile(s".graft-ib-meta-$metaVersion-", ".tmp", metaDir)
    java.nio.file.Files.write(metaTmp.toPath,
      metaJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val target = new java.io.File(metaDir, s"v$metaVersion.metadata.json")
    try java.nio.file.Files.createLink(target.toPath, metaTmp.toPath)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        metaTmp.delete()
        refuse(s"metadata version $metaVersion already exists (concurrent " +
          "writer?); conflict resolution is out of the v1 append scope")
    } finally metaTmp.delete()
    java.nio.file.Files.write(new java.io.File(metaDir, "version-hint.text").toPath,
      metaVersion.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    snapshotId
  }
}
