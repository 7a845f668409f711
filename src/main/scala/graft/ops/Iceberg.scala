package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Apache Iceberg v1/v2 table-metadata reader — the SECOND table
  * format of the ingest tier (round 14; v2 position deletes round
  * 15), built entirely on pieces already in the repo: the metadata
  * walk is JSON (json4s), the manifest-list and manifest files are
  * Avro object containers read by the in-repo from-spec [[Avro]]
  * codec. From the published Iceberg Table Spec (apache/iceberg,
  * format/spec.md):
  *
  *  - `metadata/version-hint.text` names the current metadata
  *    version N → `metadata/vN.metadata.json` (fallback: the
  *    lexicographically last `*.metadata.json`);
  *  - the metadata JSON carries `format-version` (1 and 2 read —
  *    v2's position deletes anti-join during the scan, round 15;
  *    v3+ refuses), `location`, `current-snapshot-id`, and
  *    `snapshots`, each with a `manifest-list` Avro path (or the
  *    older inline `manifests` array);
  *  - the manifest list has one row per manifest (`manifest_path`;
  *    v2 adds `content`: 0 data, 1 deletes);
  *  - v2 delete manifests list POSITION-delete parquet files —
  *    spec columns (`file_path`, `pos`) — whose rows anti-join the
  *    data scan, and EQUALITY-delete files (content=2, round 15
  *    continuation) whose rows anti-join on the columns named by
  *    `equality_ids` (schema field ids → names via the metadata's
  *    current schema), null-safe and scoped by data sequence
  *    number (a delete at sequence N only reaches data sequences
  *    strictly below N — the Flink-writer upsert pattern);
  *  - each manifest has one `manifest_entry` row per data file:
  *    `status` (0 EXISTING / 1 ADDED / 2 DELETED — deleted entries
  *    are bookkeeping, never data) and a nested `data_file` record
  *    (`file_path`, `file_format`, `record_count`,
  *    `file_size_in_bytes`);
  *  - file paths are absolute URIs under the table `location`;
  *    [[readTable]] remaps the location prefix onto the local table
  *    dir (tables move; the metadata keeps the writer's paths).
  *
  * Scale shape: metadata is bounded (a manifest list row per
  * manifest, an entry per data file — thousands of rows for petabyte
  * tables), so the walk is driver-side exactly like [[DeltaLog]]'s
  * file-list path, and the DATA scan is one parquet relation over
  * all active files. The [[entriesDf]] gate surface decodes manifest
  * payloads scan-locally (flatMap, no shuffle).
  */
object Iceberg {

  final case class Entry(status: Int, path: String, format: String,
      recordCount: Long, fileSizeBytes: Long, content: Int = 0,
      sequenceNumber: Option[Long] = None, equalityIds: Seq[Int] = Seq.empty,
      partition: Map[String, Any] = Map.empty,
      lowerBounds: Map[Int, Array[Byte]] = Map.empty,
      upperBounds: Map[Int, Array[Byte]] = Map.empty,
      nullCounts: Map[Int, Long] = Map.empty,
      valueCounts: Map[Int, Long] = Map.empty)
  final case class Snapshot(id: Long, manifestList: Option[String], manifests: Seq[String])
  /** One top-level field of the current schema: `tpe` is the Iceberg
    * type string for primitives ("long", "string", "decimal(9,2)" …)
    * and the container tag ("struct"/"list"/"map") for complex ones. */
  final case class SchemaField(id: Int, name: String, tpe: String, required: Boolean)
  final case class TableMeta(formatVersion: Int, location: Option[String],
      currentSnapshotId: Option[Long], snapshots: Seq[Snapshot],
      fieldNames: Map[Int, String] = Map.empty,
      schemaFields: Seq[SchemaField] = Seq.empty,
      snapshotLog: Seq[(Long, Long)] = Seq.empty,
      identityPartitionNames: Set[String] = Set.empty)

  /** Parse a vN.metadata.json document. None outside the supported
    * subset (or malformed JSON). */
  def parseMetadata(json: String): Option[TableMeta] =
    try {
      val jv = JsonMethods.parse(json)
      val fv = jv \ "format-version" match { case JInt(v) => v.toInt; case _ => return None }
      val loc = jv \ "location" match { case JString(s) => Some(s); case _ => None }
      val cur = jv \ "current-snapshot-id" match {
        case JInt(v) if v >= 0 => Some(v.toLong)
        case _ => None // -1 or absent: no current snapshot
      }
      val snaps = jv \ "snapshots" match {
        case JArray(xs) => xs.flatMap { s =>
          s \ "snapshot-id" match {
            case JInt(id) =>
              val ml = s \ "manifest-list" match { case JString(p) => Some(p); case _ => None }
              val ms = s \ "manifests" match {
                case JArray(ps) => ps.collect { case JString(p) => p }
                case _ => Seq.empty
              }
              Some(Snapshot(id.toLong, ml, ms))
            case _ => None
          }
        }
        case _ => Seq.empty
      }
      // current schema's ORDERED top-level fields — column projection
      // resolves by field id, equality deletes name their columns by
      // field id. `schemas` + current-schema-id is the modern layout;
      // the legacy single `schema` key is the v1 fallback.
      val schemaFields: Seq[SchemaField] = {
        val schemas = jv \ "schemas" match { case JArray(xs) => xs; case _ => Nil }
        val curId = jv \ "current-schema-id" match { case JInt(v) => Some(v.toInt); case _ => None }
        val chosen = curId.flatMap { id =>
          schemas.find(s => s \ "schema-id" match {
            case JInt(v) => v.toInt == id; case _ => false })
        }.orElse(schemas.lastOption)
          .orElse(jv \ "schema" match { case o: JObject => Some(o): Option[JValue]; case _ => None })
        chosen.map { s =>
          s \ "fields" match {
            case JArray(fs) => fs.flatMap { f =>
              (f \ "id", f \ "name") match {
                case (JInt(i), JString(n)) =>
                  val tpe = f \ "type" match {
                    case JString(t) => t
                    case o: JObject => o \ "type" match {
                      case JString(t) => t; case _ => "unknown" }
                    case _ => "unknown"
                  }
                  val req = f \ "required" match {
                    case JBool(b) => b; case _ => false }
                  Some(SchemaField(i.toInt, n, tpe, req))
                case _ => None
              }
            }
            case _ => Seq.empty[SchemaField]
          }
        }.getOrElse(Seq.empty)
      }
      // snapshot-log: (timestamp-ms, snapshot-id) history rows — the
      // timestamp-travel index
      val snapLog: Seq[(Long, Long)] = jv \ "snapshot-log" match {
        case JArray(xs) => xs.flatMap { e =>
          (e \ "timestamp-ms", e \ "snapshot-id") match {
            case (JInt(ts), JInt(id)) => Some((ts.toLong, id.toLong))
            case _ => None
          }
        }
        case _ => Seq.empty
      }
      // partition-spec fields with an IDENTITY transform — the only
      // transform whose exact tuple values equal the source column,
      // making entry-level pruning sound. A name seen with a
      // non-identity transform in ANY spec is excluded.
      val identityNames: Set[String] = {
        val specs: Seq[JValue] = (jv \ "partition-specs" match {
          case JArray(xs) => xs; case _ => Nil
        }) ++ (jv \ "partition-spec" match {
          case a: JArray => Seq(JObject(List("fields" -> a))): Seq[JValue]
          case _ => Nil
        })
        val pairs = specs.flatMap { s =>
          s \ "fields" match { case JArray(fs) => fs; case _ => Nil }
        }.flatMap { f =>
          (f \ "name", f \ "transform") match {
            case (JString(n), JString(t)) => Some(n -> t)
            case _ => None
          }
        }
        val nonId = pairs.collect { case (n, t) if t != "identity" => n }.toSet
        pairs.collect { case (n, "identity") => n }.toSet -- nonId
      }
      Some(TableMeta(fv, loc, cur, snaps,
        schemaFields.map(f => f.id -> f.name).toMap, schemaFields, snapLog,
        identityNames))
    } catch { case _: Exception => None }

  private def recordOf(schemaJson: String): Option[Avro.ARecord] =
    Avro.parseSchema(schemaJson).collect { case r: Avro.ARecord => r }

  private def asLong(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case _ => None
  }

  /** manifest-list container → manifest paths, row order. None on a
    * non-Avro payload or a schema without `manifest_path`. */
  def manifestListPaths(bytes: Array[Byte]): Option[Seq[String]] =
    manifestListEntries(bytes).map(_.map(_._1))

  /** manifest-list container → (manifest path, content, sequence
    * number) rows — `content` is the v2 manifest kind (0 data, 1
    * deletes), `sequence_number` the v2 data sequence ADDED entries
    * inherit; both absent in v1 lists → (0, None). */
  def manifestListEntries(bytes: Array[Byte]): Option[Seq[(String, Int, Option[Long])]] =
    Avro.readContainer(bytes).flatMap { case (h, rows) =>
      recordOf(h.schemaJson).flatMap { rec =>
        val names = rec.fields.map(_._1)
        val ci = names.indexOf("content")
        val qi = names.indexOf("sequence_number")
        names.indexOf("manifest_path") match {
          case -1 => None
          case i => Some(rows.collect {
            case r: Row if !r.isNullAt(i) =>
              val content =
                if (ci < 0 || r.isNullAt(ci)) 0
                else asLong(r.get(ci)).map(_.toInt).getOrElse(0)
              val seq =
                if (qi < 0 || r.isNullAt(qi)) None else asLong(r.get(qi))
              (r.get(i).toString, content, seq)
          })
        }
      }
    }

  /** manifest container → entries (status + the data_file core
    * fields). None on a non-Avro payload or a schema missing the
    * manifest_entry shape; rows with nulls in required fields drop
    * (quarantine, not crash). */
  def manifestEntries(bytes: Array[Byte]): Option[Seq[Entry]] =
    Avro.readContainer(bytes).flatMap { case (h, rows) =>
      recordOf(h.schemaJson).flatMap { rec =>
        val names = rec.fields.map(_._1)
        val si = names.indexOf("status")
        val di = names.indexOf("data_file")
        if (si < 0 || di < 0) return None
        val dfRec = rec.fields(di)._2 match {
          case d: Avro.ARecord => d
          case Avro.AUnion(d: Avro.ARecord, _) => d
          case _ => return None
        }
        val dn = dfRec.fields.map(_._1)
        val (pi, fi, rci, fsi) = (dn.indexOf("file_path"), dn.indexOf("file_format"),
          dn.indexOf("record_count"), dn.indexOf("file_size_in_bytes"))
        val ci = dn.indexOf("content") // v2: 0 data, 1 position deletes, 2 equality
        val eqi = dn.indexOf("equality_ids") // v2: field ids of the equality columns
        val sqi = names.indexOf("sequence_number") // v2 entry-level data sequence
        // the spec's partition tuple: a record of partition field
        // values (possibly behind a null union) — field names from
        // the schema, primitive values kept, anything else dropped
        // (an un-decoded key just makes the file unprunable, never
        // wrong)
        val pti = dn.indexOf("partition")
        val partNames: Seq[String] =
          if (pti < 0) Seq.empty
          else dfRec.fields(pti)._2 match {
            case r: Avro.ARecord => r.fields.map(_._1)
            case Avro.AUnion(r: Avro.ARecord, _) => r.fields.map(_._1)
            case _ => Seq.empty
          }
        def partitionOf(df: Row): Map[String, Any] =
          if (pti < 0 || partNames.isEmpty || df.isNullAt(pti)) Map.empty
          else df.get(pti) match {
            case r: Row => partNames.zipWithIndex.collect {
              case (n, i) if i < r.length && !r.isNullAt(i) &&
                  (r.get(i) match {
                    case _: Long | _: Int | _: String | _: Double |
                         _: Float | _: Boolean => true
                    case _ => false
                  }) => n -> r.get(i)
            }.toMap
            case _ => Map.empty
          }
        // the spec's per-column maps (column id → value): real
        // manifests serialize them as the k/v-array convention
        // (array<record{key:int, value:…}>), string-keyed Avro maps
        // tolerated too; undecodable shapes just leave the file
        // un-prunable, never wrong
        val lbi = dn.indexOf("lower_bounds")
        val ubi = dn.indexOf("upper_bounds")
        val nci = dn.indexOf("null_value_counts")
        val vci = dn.indexOf("value_counts")
        def intKeyed[A](df: Row, idx: Int)(conv: Any => Option[A]): Map[Int, A] =
          if (idx < 0 || df.isNullAt(idx)) Map.empty
          else df.get(idx) match {
            case kvs: scala.collection.Seq[_] => kvs.iterator.flatMap {
              case r: Row if r.length >= 2 && !r.isNullAt(0) && !r.isNullAt(1) =>
                for (k <- asLong(r.get(0)); v <- conv(r.get(1))) yield k.toInt -> v
              case _ => None
            }.toMap
            case m: scala.collection.Map[_, _] => m.iterator.flatMap { case (k, v) =>
              for (ki <- scala.util.Try(k.toString.trim.toInt).toOption;
                   vv <- conv(v)) yield ki -> vv
            }.toMap
            case _ => Map.empty
          }
        val asBytes: Any => Option[Array[Byte]] = {
          case b: Array[Byte] => Some(b)
          case _ => None
        }
        if (pi < 0 || fi < 0 || rci < 0 || fsi < 0) return None
        Some(rows.flatMap {
          case r: Row if !r.isNullAt(si) && !r.isNullAt(di) =>
            val df = r.getAs[Row](di)
            for {
              status <- asLong(r.get(si))
              path <- Option(if (df.isNullAt(pi)) null else df.get(pi).toString)
              fmt <- Option(if (df.isNullAt(fi)) null else df.get(fi).toString)
              rc <- if (df.isNullAt(rci)) None else asLong(df.get(rci))
              fs <- if (df.isNullAt(fsi)) None else asLong(df.get(fsi))
            } yield Entry(status.toInt, path, fmt, rc, fs,
              if (ci < 0 || df.isNullAt(ci)) 0
              else asLong(df.get(ci)).map(_.toInt).getOrElse(0),
              if (sqi < 0 || r.isNullAt(sqi)) None else asLong(r.get(sqi)),
              if (eqi < 0 || df.isNullAt(eqi)) Seq.empty
              else df.get(eqi) match {
                case s: scala.collection.Seq[_] =>
                  s.flatMap(x => asLong(x).map(_.toInt)).toSeq
                case _ => Seq.empty
              },
              partitionOf(df),
              intKeyed(df, lbi)(asBytes), intKeyed(df, ubi)(asBytes),
              intKeyed(df, nci)(asLong), intKeyed(df, vci)(asLong))
          case _ => None
        })
      }
    }

  /** Gate surface: (id, manifest-avro payload) → one row per entry
    * (id, status, path, format, record_count, file_size). Scan-local
    * flatMap; hostile payloads emit nothing. */
  def entriesDf(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        manifestEntries(if (payload == null) Array.emptyByteArray else payload)
          .getOrElse(Seq.empty)
          .map(e => (id, e.status, e.path, e.format, e.recordCount, e.fileSizeBytes))
      }
      .toDF("id", "status", "path", "format", "record_count", "file_size")
  }

  /** The v1 manifest_entry schema the gate packer writes — spec field
    * names, reduced to the required core (extra optional fields are
    * reader-tolerated, not writer-required). */
  private val manifestSchemaJson: String =
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |{"name":"file_path","type":"string"},
      |{"name":"file_format","type":"string"},
      |{"name":"record_count","type":"long"},
      |{"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin.replaceAll("\n", "")

  private val manifestListSchemaJson: String =
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"partition_spec_id","type":"int"}]}""".stripMargin.replaceAll("\n", "")

  /** Write one manifest container for `entries`. */
  def writeManifest(entries: Seq[Entry], syncSeed: String): Array[Byte] =
    Avro.writeContainer(manifestSchemaJson, "deflate",
      entries.iterator.map(e =>
        Row(e.status, Row(e.path, e.format, e.recordCount, e.fileSizeBytes))),
      syncSeed)

  /** Write a manifest-list container naming `paths`. */
  def writeManifestList(paths: Seq[(String, Long)], syncSeed: String): Array[Byte] =
    Avro.writeContainer(manifestListSchemaJson, "deflate",
      paths.iterator.map { case (p, len) => Row(p, len, 0) }, syncSeed)

  /** v2 fixture schemas: data_file gains `content` (0 data, 1
    * position deletes, 2 equality deletes), the manifest list gains
    * the manifest-kind `content`. */
  private val manifestSchemaV2Json: String =
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |{"name":"content","type":"int"},
      |{"name":"file_path","type":"string"},
      |{"name":"file_format","type":"string"},
      |{"name":"record_count","type":"long"},
      |{"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin.replaceAll("\n", "")

  private val manifestListSchemaV2Json: String =
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"partition_spec_id","type":"int"},
      |{"name":"content","type":"int"}]}""".stripMargin.replaceAll("\n", "")

  /** Write one v2 manifest container (entry content carried). */
  def writeManifestV2(entries: Seq[Entry], syncSeed: String): Array[Byte] =
    Avro.writeContainer(manifestSchemaV2Json, "deflate",
      entries.iterator.map(e =>
        Row(e.status, Row(e.content, e.path, e.format, e.recordCount, e.fileSizeBytes))),
      syncSeed)

  /** Write a v2 manifest-list container: (path, length, content). */
  def writeManifestListV2(paths: Seq[(String, Long, Int)], syncSeed: String): Array[Byte] =
    Avro.writeContainer(manifestListSchemaV2Json, "deflate",
      paths.iterator.map { case (p, len, c) => Row(p, len, 0, c) }, syncSeed)

  /** Sequence-carrying fixture schemas (equality-delete tables):
    * nullable entry-level `sequence_number` (exercises the
    * inheritance rule when null), `equality_ids` int array on the
    * data_file, `sequence_number` on the manifest-list row. */
  private val manifestSchemaSeqJson: String =
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"sequence_number","type":["null","long"],"default":null},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |{"name":"content","type":"int"},
      |{"name":"file_path","type":"string"},
      |{"name":"file_format","type":"string"},
      |{"name":"record_count","type":"long"},
      |{"name":"file_size_in_bytes","type":"long"},
      |{"name":"equality_ids","type":{"type":"array","items":"int"}}]}}]}"""
      .stripMargin.replaceAll("\n", "")

  private val manifestListSchemaSeqJson: String =
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"partition_spec_id","type":"int"},
      |{"name":"content","type":"int"},
      |{"name":"sequence_number","type":"long"}]}""".stripMargin.replaceAll("\n", "")

  /** Write a sequence-carrying manifest container; a None
    * sequenceNumber writes the null union branch (inheritance). */
  def writeManifestSeq(entries: Seq[Entry], syncSeed: String): Array[Byte] =
    Avro.writeContainer(manifestSchemaSeqJson, "deflate",
      entries.iterator.map(e =>
        Row(e.status, e.sequenceNumber.map(Long.box).orNull,
          Row(e.content, e.path, e.format, e.recordCount, e.fileSizeBytes,
            e.equalityIds))),
      syncSeed)

  /** Write a sequence-carrying manifest list: (path, length, content,
    * sequence number). */
  def writeManifestListSeq(paths: Seq[(String, Long, Int, Long)],
      syncSeed: String): Array[Byte] =
    Avro.writeContainer(manifestListSchemaSeqJson, "deflate",
      paths.iterator.map { case (p, len, c, sq) => Row(p, len, 0, c, sq) }, syncSeed)

  /** Write a manifest whose entries carry the spec's PARTITION tuple:
    * `partFields` names the partition record's (field, avro primitive
    * type) columns; each entry's values come from [[Entry.partition]]
    * (absent → the null union branch). */
  def writeManifestPart(entries: Seq[Entry], partFields: Seq[(String, String)],
      syncSeed: String): Array[Byte] = {
    val partSchema = partFields.map { case (n, t) =>
      s"""{"name":"$n","type":["null","$t"],"default":null}""" }.mkString(",")
    val schema =
      s"""{"type":"record","name":"manifest_entry","fields":[
         |{"name":"status","type":"int"},
         |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
         |{"name":"file_path","type":"string"},
         |{"name":"file_format","type":"string"},
         |{"name":"partition","type":{"type":"record","name":"r102","fields":[
         |$partSchema]}},
         |{"name":"record_count","type":"long"},
         |{"name":"file_size_in_bytes","type":"long"}]}}]}"""
        .stripMargin.replaceAll("\n", "")
    Avro.writeContainer(schema, "deflate",
      entries.iterator.map { e =>
        val pv = Row.fromSeq(partFields.map { case (n, _) =>
          e.partition.get(n).map {
            case i: Int => Long.box(i.toLong)
            case v => v.asInstanceOf[AnyRef]
          }.orNull
        })
        Row(e.status, Row(e.path, e.format, pv, e.recordCount, e.fileSizeBytes))
      }, syncSeed)
  }

  /** Gate packer: one manifest payload per document, entries from id
    * arithmetic — data-<id>-0.parquet DELETED when id%3==0 else ADDED
    * (record_count id%100+1, size id+4096), plus an EXISTING
    * data-<id>-1.parquet on even ids (record_count 7, size id+100). */
  def packDocsManifest(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)))
      .as[Long]
      .map { id =>
        val e0 = Entry(if (id % 3 == 0) 2 else 1, s"data-$id-0.parquet", "PARQUET",
          id % 100 + 1, id + 4096)
        val es = if (id % 2 == 0)
          Seq(e0, Entry(0, s"data-$id-1.parquet", "PARQUET", 7L, id + 100)) else Seq(e0)
        (id, writeManifest(es, s"m$id"))
      }
      .toDF("id", "payload")
  }

  /** Appendix D single-value encode for LONG bounds (the fixture
    * writer's needs; [[decodeBound]] is the general reader). */
  def encodeBoundLong(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()

  /** Fixture schema carrying the spec's per-column stats maps in the
    * k/v-array convention real manifests use: lower/upper bounds
    * (column id → Appendix D bytes), null_value_counts and
    * value_counts (column id → long). */
  private val manifestSchemaBoundsJson: String =
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |{"name":"file_path","type":"string"},
      |{"name":"file_format","type":"string"},
      |{"name":"record_count","type":"long"},
      |{"name":"file_size_in_bytes","type":"long"},
      |{"name":"lower_bounds","type":["null",{"type":"array","items":
      |{"type":"record","name":"k126","fields":[{"name":"key","type":"int"},
      |{"name":"value","type":"bytes"}]}}],"default":null},
      |{"name":"upper_bounds","type":["null",{"type":"array","items":"k126"}],"default":null},
      |{"name":"null_value_counts","type":["null",{"type":"array","items":
      |{"type":"record","name":"k121","fields":[{"name":"key","type":"int"},
      |{"name":"value","type":"long"}]}}],"default":null},
      |{"name":"value_counts","type":["null",{"type":"array","items":"k121"}],"default":null}]}}]}"""
      .stripMargin.replaceAll("\n", "")

  /** Write a manifest whose entries carry column bounds + counts from
    * [[Entry.lowerBounds]]/[[Entry.upperBounds]]/[[Entry.nullCounts]]/
    * [[Entry.valueCounts]] (empty map → the null union branch). */
  def writeManifestBounds(entries: Seq[Entry], syncSeed: String): Array[Byte] = {
    def kv[A](m: Map[Int, A]): Any =
      if (m.isEmpty) null
      else m.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }
    Avro.writeContainer(manifestSchemaBoundsJson, "deflate",
      entries.iterator.map(e =>
        Row(e.status, Row(e.path, e.format, e.recordCount, e.fileSizeBytes,
          kv(e.lowerBounds), kv(e.upperBounds), kv(e.nullCounts), kv(e.valueCounts)))),
      syncSeed)
  }

  /** Write a manifest whose entries carry BOTH the spec's partition
    * tuple (identity transforms, as [[writeManifestPart]]) and the
    * per-column bounds/counts maps (as [[writeManifestBounds]]) —
    * the shape [[IcebergWrite]] emits so manifest partition pruning
    * AND column-bounds skipping both engage on own-written tables. */
  def writeManifestPartBounds(entries: Seq[Entry],
      partFields: Seq[(String, String)], syncSeed: String): Array[Byte] = {
    val partSchema = partFields.map { case (n, t) =>
      s"""{"name":"$n","type":["null","$t"],"default":null}""" }.mkString(",")
    val schema =
      s"""{"type":"record","name":"manifest_entry","fields":[
         |{"name":"status","type":"int"},
         |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
         |{"name":"file_path","type":"string"},
         |{"name":"file_format","type":"string"},
         |{"name":"partition","type":{"type":"record","name":"r102","fields":[
         |$partSchema]}},
         |{"name":"record_count","type":"long"},
         |{"name":"file_size_in_bytes","type":"long"},
         |{"name":"lower_bounds","type":["null",{"type":"array","items":
         |{"type":"record","name":"k126","fields":[{"name":"key","type":"int"},
         |{"name":"value","type":"bytes"}]}}],"default":null},
         |{"name":"upper_bounds","type":["null",{"type":"array","items":"k126"}],"default":null},
         |{"name":"null_value_counts","type":["null",{"type":"array","items":
         |{"type":"record","name":"k121","fields":[{"name":"key","type":"int"},
         |{"name":"value","type":"long"}]}}],"default":null},
         |{"name":"value_counts","type":["null",{"type":"array","items":"k121"}],"default":null}]}}]}"""
        .stripMargin.replaceAll("\n", "")
    def kv[A](m: Map[Int, A]): Any =
      if (m.isEmpty) null
      else m.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }
    Avro.writeContainer(schema, "deflate",
      entries.iterator.map { e =>
        val pv = Row.fromSeq(partFields.map { case (n, t) =>
          e.partition.get(n).map {
            case i: Int if t == "long" => Long.box(i.toLong)
            case v => v.asInstanceOf[AnyRef]
          }.orNull
        })
        Row(e.status, Row(e.path, e.format, pv, e.recordCount, e.fileSizeBytes,
          kv(e.lowerBounds), kv(e.upperBounds), kv(e.nullCounts), kv(e.valueCounts)))
      }, syncSeed)
  }

  private def refuse(msg: String): Nothing =
    throw new graft.GraftAnalysisException(s"iceberg: $msg")

  /** Spark type for an Iceberg primitive type string; None for types
    * this reader cannot cast / null-fill (complex containers, fixed,
    * unknown) — those pass through uncast when present and refuse by
    * name when a null fill would be needed. */
  private[graft] def sparkTypeOf(t: String): Option[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    t match {
      case "boolean" => Some(BooleanType)
      case "int" => Some(IntegerType)
      case "long" => Some(LongType)
      case "float" => Some(FloatType)
      case "double" => Some(DoubleType)
      case "date" => Some(DateType)
      case "string" | "uuid" => Some(StringType)
      case "binary" => Some(BinaryType)
      case "timestamp" => Some(TimestampNTZType)
      case "timestamptz" => Some(TimestampType)
      case s if s.startsWith("decimal(") && s.endsWith(")") =>
        s.substring(8, s.length - 1).split(",") match {
          case Array(p, sc) =>
            try Some(DecimalType(p.trim.toInt, sc.trim.toInt))
            catch { case _: NumberFormatException => None }
          case _ => None
        }
      case _ => None
    }
  }

  /** MANIFEST-LEVEL PARTITION PRUNING: evaluate `pred` — a predicate
    * over IDENTITY-transform partition field names — against each
    * active entry's exact partition tuple, and keep only matching
    * files. The tuples form one driver-bounded DataFrame row per file
    * (the active list is already capped), so Catalyst evaluates the
    * predicate with full Spark semantics; at 100 TB this is what
    * turns a date-filtered read into opening only that date's files
    * instead of scanning everything and filtering rows.
    *
    * Pruning is strictly an OPTIMIZATION — [[readTable]] re-applies
    * the predicate to the scanned rows — so every uncertainty keeps
    * the file: non-identity transforms are never pruned on (their
    * tuple values differ from the source column), entries without a
    * decodable tuple or with type-inconsistent values stay, and a
    * predicate the tuple columns cannot resolve (data-column
    * references) skips pruning entirely. If everything prunes, one
    * file is kept so the result keeps the table's schema (the row
    * predicate then yields zero rows). */
  private def prunedActive(spark: SparkSession, active: Seq[Entry],
      identityNames: Set[String], pred: Column): Seq[Entry] = {
    import org.apache.spark.sql.types._
    def typeOf(v: Any): DataType = v match {
      case _: Long => LongType
      case _: Int => IntegerType
      case _: String => StringType
      case _: Double => DoubleType
      case _: Float => FloatType
      case _: Boolean => BooleanType
      case _ => NullType
    }
    val keys: Seq[String] = active.flatMap(_.partition.keys).distinct
      .filter(identityNames).sorted
    if (keys.isEmpty) return active
    val colTypes: Map[String, DataType] = keys.map { k =>
      k -> active.flatMap(_.partition.get(k)).headOption
        .map(typeOf).getOrElse(NullType)
    }.toMap
    // an entry is prunable iff it carries at least one of the keyed
    // fields and every keyed value matches the column's type; its
    // absent keys are null (identity: the rows carry null there too,
    // so a null-pruned file had no matches). Entries with no tuple at
    // all — or a different spec's fields — are kept unconditionally.
    val (prunable, kept0) = active.partition(e =>
      e.partition.keys.exists(colTypes.contains) &&
        e.partition.view.filterKeys(colTypes.contains).forall {
          case (k, v) => typeOf(v) == colTypes(k)
        })
    if (prunable.isEmpty) return active
    val schema = StructType(StructField("__graft_idx", IntegerType) +:
      keys.map(k => StructField(k, colTypes(k))))
    val rows = prunable.zipWithIndex.map { case (e, i) =>
      Row.fromSeq(i +: keys.map(k => e.partition.get(k).orNull))
    }
    val keptIdx: Set[Int] =
      try {
        spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
          .where(pred).select(col("__graft_idx"))
          .collect().map(_.getInt(0)).toSet
      } catch {
        // the predicate references columns the tuple cannot resolve:
        // not a partition predicate — skip pruning, the row filter
        // still applies
        case _: org.apache.spark.sql.AnalysisException => return active
      }
    val out = kept0 ++ prunable.zipWithIndex.collect {
      case (e, i) if keptIdx(i) => e }
    if (out.nonEmpty) out
    else Seq(active.minBy(_.path)) // schema carrier; rows filter to zero
  }

  /** Iceberg spec Appendix D "single-value binary serialization"
    * decode for the bound types this pruner compares: ints/longs/
    * dates/timestamps little-endian, strings UTF-8, decimals
    * big-endian unscaled. Floats/doubles are deliberately NOT
    * compared (NaN-carrying files have writer-dependent bounds —
    * the same exclusion as the Delta stats skipper); binary/uuid/
    * fixed have no useful ordering here. None = not comparable →
    * the file keeps. */
  private[graft] def decodeBound(tpe: String, bytes: Array[Byte]): Option[Any] = {
    def le(n: Int): Option[java.nio.ByteBuffer] =
      if (bytes.length < n) None
      else Some(java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN))
    tpe match {
      case "boolean" => bytes.headOption.map(_ != 0)
      case "int" => le(4).map(_.getInt: java.lang.Integer)
      case "long" => le(8).map(_.getLong: java.lang.Long)
      case "date" => le(4).map(b => java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(b.getInt.toLong)))
      case "timestamptz" => le(8).map { b =>
        val us = b.getLong
        java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
          Math.floorMod(us, 1000000L) * 1000L)
      }
      case "timestamp" => le(8).map { b =>
        val us = b.getLong
        java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
          (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
      }
      case "string" => Some(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
      case s if s.startsWith("decimal(") && s.endsWith(")") =>
        s.substring(8, s.length - 1).split(",") match {
          case Array(_, sc) =>
            try Some(new java.math.BigDecimal(
              new java.math.BigInteger(bytes), sc.trim.toInt))
            catch { case _: Exception => None }
          case _ => None
        }
      case _ => None
    }
  }

  /** COLUMN-BOUNDS FILE SKIPPING (round 17): evaluate the non-
    * partition conjuncts of the read predicate against each active
    * entry's `lower_bounds`/`upper_bounds` (+ `null_value_counts`/
    * `value_counts`) through the shared [[ZoneMap]] min/max rule —
    * the manifest-level pruning the Iceberg spec records those maps
    * FOR. A `WHERE ts BETWEEN …` over an unpartitioned 100 TB table
    * opens only the files whose recorded ranges overlap.
    *
    * Conservative like everything in this layer: entries without
    * decodable bounds keep, unsupported conjunct shapes keep,
    * truncated string bounds are sound because lo ≤ true-min /
    * hi ≥ true-max is all the rule uses. May return empty — the
    * caller applies the schema-carrier rule after ALL pruning. */
  private def boundsPruned(spark: SparkSession, active: Seq[Entry],
      fields: Seq[SchemaField],
      conjuncts: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Seq[Entry] = {
    if (conjuncts.isEmpty || active.isEmpty) return active
    val refd = conjuncts.flatMap(ZoneMap.attrNames).toSet
    val cols: Seq[(SchemaField, org.apache.spark.sql.types.DataType)] =
      fields.filter(f => refd(f.name))
        .flatMap(f => sparkTypeOf(f.tpe).map(f -> _))
        .filter { case (f, _) => decodableBoundType(f.tpe) }
    if (cols.isEmpty) return active
    import org.apache.spark.sql.types.{StructType, StructField, IntegerType, LongType}
    val schema = StructType(StructField("__graft_idx", IntegerType) +:
      cols.flatMap { case (f, dt) => Seq(
        StructField(s"${f.name}__lo", dt), StructField(s"${f.name}__hi", dt),
        StructField(s"${f.name}__nc", LongType), StructField(s"${f.name}__vc", LongType))
      })
    val rows = active.zipWithIndex.map { case (e, i) =>
      Row.fromSeq(i +: cols.flatMap { case (f, _) => Seq(
        e.lowerBounds.get(f.id).flatMap(decodeBound(f.tpe, _)).orNull,
        e.upperBounds.get(f.id).flatMap(decodeBound(f.tpe, _)).orNull,
        e.nullCounts.get(f.id).map(Long.box).orNull,
        e.valueCounts.get(f.id).map(Long.box).orNull)
      })
    }
    val statsOf: String => Option[ZoneMap.ColStats] = name =>
      cols.find(_._1.name == name).map { case (f, dt) =>
        ZoneMap.ColStats(col(s"`${f.name}__lo`"), col(s"`${f.name}__hi`"), dt,
          Some(col(s"`${f.name}__nc`")), Some(col(s"`${f.name}__vc`")))
      }
    val keep = conjuncts.map(c => ZoneMap.mayMatch(c, statsOf)).reduce(_ && _)
    val keptIdx: Set[Int] =
      try spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
        .where(keep).select(col("__graft_idx"))
        .collect().map(_.getInt(0)).toSet
      catch {
        // incomparable coercions etc.: not a pruning predicate — keep
        case _: org.apache.spark.sql.AnalysisException => return active
      }
    active.zipWithIndex.collect { case (e, i) if keptIdx(i) => e }
  }

  /** Bound types [[decodeBound]] can order; floats/doubles excluded
    * (NaN), containers/binary/uuid have no comparison here. */
  private def decodableBoundType(tpe: String): Boolean = tpe match {
    case "boolean" | "int" | "long" | "date" | "timestamp" | "timestamptz" |
         "string" => true
    case s => s.startsWith("decimal(")
  }

  /** FIELD-ID data scan — the Iceberg spec's column-resolution rule.
    * Active files are grouped by their parquet footers' top-level
    * layout (a distributed ranged tail-read probe, [[ParquetMeta
    * .topLevelLayoutsByPath]]), and each DISTINCT layout becomes one
    * scan arm projecting the current schema BY FIELD ID: renamed
    * columns resolve regardless of their stored name, columns added
    * after a file was written null-fill (refusing for `required`
    * fields and for types with no null representation here), and
    * stored columns dropped from the schema are simply not projected.
    * Files written WITHOUT any field ids resolve by NAME (the spec's
    * name-mapping fallback for imported files).
    *
    * Scale shape: the arm count is the number of distinct layouts —
    * schema-evolution GENERATIONS, not files (a petabyte table that
    * renamed a column twice has three) — and each arm is one parquet
    * relation, so pushdown and pruning hold per arm. A table
    * exceeding `graft.iceberg.maxLayouts` (default 32) distinct
    * layouts refuses by name rather than build a degenerate union. */
  private def fieldIdScan(spark: SparkSession, paths: Seq[String],
      fields: Seq[SchemaField], withMetaCols: Boolean): DataFrame = {
    val byPath = ParquetMeta.topLevelLayoutsByPath(spark, paths) match {
      case Left(bad) => refuse(s"unreadable parquet footer: $bad")
      case Right(m) => m
    }
    val groups = byPath.groupBy(_._2).toSeq
      .map { case (layout, pairs) => (layout, pairs.map(_._1)) }
      .sortBy(_._2.min)
    val maxLayouts = spark.conf.getOption("graft.iceberg.maxLayouts")
      .map(_.toInt).getOrElse(32)
    if (groups.size > maxLayouts)
      refuse(s"${groups.size} distinct parquet field layouts across the data " +
        s"files exceed the cap ($maxLayouts); a union that wide suggests a " +
        "corrupted table — raise graft.iceberg.maxLayouts to override")
    val arms = groups.map { case (layout, armPaths) =>
      val hasIds = layout.exists(_._2.isDefined)
      val nameById: Map[Long, String] =
        if (!hasIds) Map.empty
        else layout.collect { case (n, Some(id)) => id -> n }
          .groupBy(_._1).map {
            case (id, vs) if vs.map(_._2).distinct.size == 1 => id -> vs.head._2
            case (id, _) =>
              refuse(s"duplicate parquet field id $id within one file layout")
          }
      val namesInFile = layout.map(_._1).toSet
      val arm = spark.read.parquet(armPaths: _*)
      val cols = fields.map { f =>
        val resolved: Option[String] =
          if (hasIds) nameById.get(f.id.toLong)
          else Some(f.name).filter(namesInFile)
        resolved match {
          case Some(pq) => sparkTypeOf(f.tpe) match {
            case Some(dt) => col(s"`$pq`").cast(dt).as(f.name)
            case None => col(s"`$pq`").as(f.name)
          }
          case None if f.required =>
            refuse(s"required field '${f.name}' (id ${f.id}) is missing from " +
              "a data file layout; refusing beats fabricating nulls for a " +
              "required column")
          case None =>
            val dt = sparkTypeOf(f.tpe).getOrElse(refuse(
              s"field '${f.name}' (id ${f.id}) is missing from a data file " +
                s"layout and its type '${f.tpe}' has no null representation here"))
            lit(null).cast(dt).as(f.name)
        }
      }
      val metaCols =
        if (withMetaCols)
          Seq(col("_metadata.file_path").as("__graft_file_key"),
            col("_metadata.row_index").as("__graft_row_idx"))
        else Seq.empty
      arm.select(cols ++ metaCols: _*)
    }
    arms.reduce(_ unionByName _)
  }

  /** Resolve a metadata-recorded path against the local table dir:
    * the writer-side `location` prefix remaps onto `tableDir` (tables
    * move), `file:` scheme strips, absolute paths pass through,
    * relative paths resolve under the table dir. */
  private[graft] def resolvePath(tableDir: String, location: Option[String], p: String): String = {
    val raw = p.stripPrefix("file:")
    val loc = location.map(_.stripPrefix("file:")).filter(_.nonEmpty)
    loc match {
      case Some(l) if raw == l || raw.startsWith(l + "/") =>
        tableDir + raw.substring(l.length)
      case _ if raw.startsWith("/") => raw
      // a scheme-carrying absolute URI outside the recorded location
      // passes through (the table references another store)
      case _ if TableIo.hasScheme(raw) => raw
      case _ => s"$tableDir/$raw"
    }
  }

  /** Read the CURRENT snapshot's data of a format-version 1 or 2
    * Iceberg table: version-hint → metadata JSON → manifest list →
    * manifests → active (non-DELETED) parquet files, scanned as ONE
    * relation. v2 (round 15): delete manifests (`content=1` in the
    * manifest list) contribute POSITION-delete parquet files
    * (`file_path`, `pos` per the spec) which anti-join against the
    * data scan's (`_metadata.file_path`, `_metadata.row_index`) —
    * sequence-number pruning is unnecessary THERE under path-exact
    * matching: writers never reuse data file paths, so a position
    * delete can only ever hit the file generation it was written
    * against. EQUALITY deletes (content=2) anti-join on the
    * `equality_ids` columns with null-safe equality AND the spec's
    * sequence scoping (data sequence < delete sequence — value
    * matching alone would kill rows re-inserted after the delete),
    * data sequences attached per the inheritance rule (entry-level,
    * else the manifest-list row's for ADDED entries) via a broadcast
    * key manifest that RAISES on any unmatched scan path. Refuses
    * (analysis error) on format-version ≥3, a missing current
    * snapshot, unreadable Avro, a non-parquet data file, unknown
    * equality field ids, or missing sequence numbers when equality
    * deletes are present. */
  def readTable(spark: SparkSession, tableDir: String): DataFrame =
    readTable(spark, tableDir, None)

  /** SNAPSHOT TRAVEL (round 15 continuation): read AS OF a snapshot
    * id from the metadata's `snapshots` list; an id the metadata
    * does not carry (expired or never existed) refuses by name. */
  /** TIMESTAMP TRAVEL: read AS OF a wall-clock instant using the
    * metadata's `snapshot-log` (timestamp-ms → snapshot-id history).
    * The spec's rule: the LATEST logged snapshot whose timestamp is
    * ≤ the target; a target before the first logged snapshot refuses
    * (no table state existed then), and a metadata without a
    * snapshot-log refuses by name rather than guess. */
  def readTableAt(spark: SparkSession, tableDir: String, tsMillis: Long): DataFrame =
    readTableAt(spark, tableDir, tsMillis, None)

  /** [[readTableAt]] with the partition-pruning predicate threaded
    * through (see the filtered [[readTable]]). */
  def readTableAt(spark: SparkSession, tableDir: String, tsMillis: Long,
      partitionFilter: Option[Column]): DataFrame = {
    val meta = currentMeta(tableDir)
    if (meta.snapshotLog.isEmpty)
      refuse("metadata carries no snapshot-log; timestamp travel needs the " +
        "(timestamp-ms, snapshot-id) history")
    val sorted = meta.snapshotLog.sortBy(_._1)
    val chosen = sorted.takeWhile(_._1 <= tsMillis).lastOption.getOrElse(
      refuse(s"timestamp $tsMillis precedes the first logged snapshot " +
        s"(${sorted.head._1}); no table state existed then"))
    readTable(spark, tableDir, Some(chosen._2), partitionFilter)
  }

  /** Discover and parse the CURRENT metadata JSON of a table dir:
    * version-hint.text → vN.metadata.json, falling back to the
    * lexicographically last `*.metadata.json`. Refuses on a missing
    * or malformed metadata or an unsupported format-version. */
  private def currentMeta(tableDir: String): TableMeta = {
    val metaDir = s"$tableDir/metadata"
    val names = TableIo.list(metaDir).map(_.name)
    val metaName = names.find(_ == "version-hint.text").flatMap { h =>
      val n = TableIo.readString(s"$metaDir/$h").trim
      names.find(_ == s"v$n.metadata.json")
    }.orElse(names.filter(_.endsWith(".metadata.json")).sorted.lastOption)
      .getOrElse(refuse(s"no metadata json under $tableDir/metadata"))
    val meta = parseMetadata(TableIo.readString(s"$metaDir/$metaName"))
      .getOrElse(refuse(s"malformed metadata $metaName"))
    if (meta.formatVersion != 1 && meta.formatVersion != 2)
      refuse(s"format-version ${meta.formatVersion} unsupported (unknown read semantics; " +
        "refusing beats silently wrong data)")
    meta
  }

  def readTable(spark: SparkSession, tableDir: String,
      snapshotId: Option[Long]): DataFrame =
    readTable(spark, tableDir, snapshotId, None)

  /** INCREMENTAL APPEND SCAN (round 17 — the Iceberg analogue of the
    * Delta change feed's insert tail): the rows of data files that are
    * ACTIVE in `toSnapshot` (default: current) but not in
    * `fromSnapshot` — exactly what an incremental consumer reads per
    * poll. Append-only semantics by design: if either snapshot carries
    * delete manifests, or a file ACTIVE in `from` is gone in `to`
    * (a rewrite/compaction — its rows would double-count), refuse by
    * name rather than fabricate a change stream. Identity `from == to`
    * yields an empty frame with the table schema. File identity is the
    * manifest path (writers never reuse data-file paths). */
  def readAppendsBetween(spark: SparkSession, tableDir: String,
      fromSnapshot: Long, toSnapshot: Option[Long] = None,
      where: Option[Column] = None): DataFrame = {
    val meta = currentMeta(tableDir)
    def activeOf(id: Long): Seq[Entry] = {
      val snap = meta.snapshots.find(_.id == id).getOrElse(refuse(
        s"snapshot $id is not in this metadata's snapshots (expired or unknown); " +
          s"known ids: ${meta.snapshots.map(_.id).mkString(",")}"))
      val ml = snap.manifestList match {
        case Some(p) =>
          val mlPath = resolvePath(tableDir, meta.location, p)
          if (!TableIo.isFile(mlPath)) refuse(s"manifest list missing: $mlPath")
          manifestListEntries(TableIo.readBytes(mlPath)).getOrElse(
            refuse(s"unreadable manifest list $mlPath"))
        case None if snap.manifests.nonEmpty => snap.manifests.map(p => (p, 0, None))
        case None => refuse(s"snapshot $id has neither manifest-list nor manifests")
      }
      if (ml.exists(_._2 == 1))
        refuse(s"snapshot $id carries delete manifests; the incremental append " +
          "scan is append-only by design — row-level deletes need a change-feed " +
          "semantics this surface does not fabricate")
      ml.filter(_._2 == 0).flatMap { case (mp, _, _) =>
        val mPath = resolvePath(tableDir, meta.location, mp)
        if (!TableIo.isFile(mPath)) refuse(s"manifest missing: $mPath")
        manifestEntries(TableIo.readBytes(mPath)).getOrElse(
          refuse(s"unreadable manifest $mPath"))
      }.filter(_.status != 2)
    }
    val to = toSnapshot.orElse(meta.currentSnapshotId).getOrElse(
      refuse("no current snapshot"))
    val fromActive = activeOf(fromSnapshot).map(_.path).toSet
    val toActive = activeOf(to)
    val gone = fromActive -- toActive.map(_.path).toSet
    if (gone.nonEmpty)
      refuse(s"${gone.size} file(s) active in snapshot $fromSnapshot are gone in " +
        s"$to (rewrite/compaction between them); an append-only diff would " +
        "misattribute their rows — refusing beats a wrong change stream")
    val added = toActive.filterNot(e => fromActive(e.path))
    added.find(!_.format.equalsIgnoreCase("parquet")).foreach(e =>
      refuse(s"data file format ${e.format} unsupported (parquet only)"))
    if (added.isEmpty) {
      // identity diff: empty frame with the TABLE's schema (the full
      // read supplies it — limit(0) keeps the plan trivial)
      return readTable(spark, tableDir, Some(to)).limit(0)
    }
    // round 18: a CDC-style poll over a filtered view composes with
    // the same pruning ladder as the full read — partition tuples +
    // column bounds decide which APPENDED files even open; the row
    // filter below re-applies the predicate either way
    val kept = where match {
      case None => added
      case Some(p) =>
        val pruned = pruneEntries(spark, meta, added, p)
        if (pruned.nonEmpty) pruned
        else Seq(added.minBy(_.path)) // schema carrier; rows filter to zero
    }
    val paths = kept.map(e => resolvePath(tableDir, meta.location, e.path))
    val base =
      if (meta.schemaFields.nonEmpty)
        fieldIdScan(spark, paths, meta.schemaFields, withMetaCols = false)
      else spark.read.parquet(paths: _*)
    where.map(base.where).getOrElse(base)
  }

  /** The PRUNING LADDER shared by [[readTable]] and
    * [[readAppendsBetween]]: split the predicate into top-level
    * conjuncts — pure identity-partition conjuncts prune exactly
    * against the manifest tuples ([[prunedActive]]), the rest
    * min/max-skip against the manifests' column bounds
    * ([[boundsPruned]]); unsafe conjuncts (nondeterministic,
    * subqueries) prune nothing. May return empty — callers decide the
    * schema-carrier rule. Pruning is an OPTIMIZATION only: callers
    * re-apply the whole predicate to the scanned rows. */
  private def pruneEntries(spark: SparkSession, meta: TableMeta,
      activeAll: Seq[Entry], pred: Column): Seq[Entry] = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.And
    val cs = ZoneMap.conjuncts(ZoneMap.normalize(ColumnBridge.convertedExpression(pred)))
    val (partCs, rest) = cs.partition { c =>
      val refs = ZoneMap.attrNames(c)
      refs.nonEmpty && refs.subsetOf(meta.identityPartitionNames) &&
        !ZoneMap.unsafeForPruning(c)
    }
    val afterPart =
      if (partCs.isEmpty) activeAll
      else prunedActive(spark, activeAll, meta.identityPartitionNames,
        ColumnBridge.column(partCs.reduce(And)))
    boundsPruned(spark, afterPart, meta.schemaFields,
      rest.filterNot(ZoneMap.unsafeForPruning))
  }

  /** [[readTable]] with MANIFEST-LEVEL PARTITION PRUNING: `pred` is a
    * predicate over identity-transform partition field names. It is
    * applied BOTH at the manifest walk (only matching files reach the
    * scan — see [[prunedActive]] for the conservative-keep rules) and
    * to the scanned rows, so the result equals
    * `readTable(...).where(pred)` while opening only the matching
    * partition's files. */
  def readTable(spark: SparkSession, tableDir: String,
      snapshotId: Option[Long], partitionFilter: Option[Column]): DataFrame = {
    val meta = currentMeta(tableDir)
    val cur = snapshotId.getOrElse(
      meta.currentSnapshotId.getOrElse(refuse("no current snapshot")))
    val snap = meta.snapshots.find(_.id == cur).getOrElse(refuse(
      if (snapshotId.isDefined)
        s"snapshot $cur is not in this metadata's snapshots (expired or unknown); " +
          s"known ids: ${meta.snapshots.map(_.id).mkString(",")}"
      else s"current snapshot $cur not in snapshots"))
    val manifestList: Seq[(String, Int, Option[Long])] = snap.manifestList match {
      case Some(ml) =>
        val mlPath = resolvePath(tableDir, meta.location, ml)
        if (!TableIo.isFile(mlPath)) refuse(s"manifest list missing: $mlPath")
        manifestListEntries(TableIo.readBytes(mlPath)).getOrElse(
          refuse(s"unreadable manifest list $mlPath"))
      case None if snap.manifests.nonEmpty => snap.manifests.map(p => (p, 0, None))
      case None => refuse(s"snapshot $cur has neither manifest-list nor manifests")
    }
    // entries carry their data sequence number: explicit at the entry
    // level, else INHERITED from the manifest-list row for ADDED
    // entries (the spec's inheritance rule — EXISTING entries must be
    // explicit because they predate their current manifest).
    def entriesOf(ms: Seq[(String, Option[Long])]): Seq[Entry] = ms.flatMap { case (mp, mseq) =>
      val mPath = resolvePath(tableDir, meta.location, mp)
      if (!TableIo.isFile(mPath)) refuse(s"manifest missing: $mPath")
      manifestEntries(TableIo.readBytes(mPath)).getOrElse(
        refuse(s"unreadable manifest $mPath"))
        .map(e => if (e.sequenceNumber.isEmpty && e.status == 1)
          e.copy(sequenceNumber = mseq) else e)
    }
    val dataManifests = manifestList.filter(_._2 == 0)
    val deleteManifests = manifestList.filter(_._2 == 1)
    manifestList.find(m => m._2 != 0 && m._2 != 1).foreach { case (p, c, _) =>
      refuse(s"manifest content $c unsupported in $p") }
    val activeAll = entriesOf(dataManifests.map(m => (m._1, m._3))).filter(_.status != 2)
    if (activeAll.isEmpty) refuse(s"snapshot $cur has no active data files")
    // the scan-path list is irreducibly driver-side; past the cap it
    // must fail LOUDLY, by name, not OOM the driver
    val maxFiles = spark.conf.getOption("graft.iceberg.maxFiles")
      .map(_.toInt).getOrElse(1000000)
    if (activeAll.size > maxFiles)
      refuse(s"snapshot $cur has more than $maxFiles active data files; the " +
        "scan-path list would exhaust driver memory — raise " +
        "graft.iceberg.maxFiles to override")
    // pruning ladder: split the predicate into top-level conjuncts —
    // pure identity-partition conjuncts prune exactly against the
    // manifest tuples, the rest min/max-skip against the manifests'
    // column bounds; unsafe conjuncts (nondeterministic, subqueries)
    // prune nothing. The row filter below re-applies the whole
    // predicate either way.
    val active = partitionFilter match {
      case None => activeAll
      case Some(p) =>
        val afterBounds = pruneEntries(spark, meta, activeAll, p)
        if (afterBounds.nonEmpty) afterBounds
        else Seq(activeAll.minBy(_.path)) // schema carrier; rows filter to zero
    }
    active.find(_.content != 0).foreach(e =>
      refuse(s"delete file ${e.path} listed in a data manifest"))
    val deletes = entriesOf(deleteManifests.map(m => (m._1, m._3))).filter(_.status != 2)
    deletes.find(d => d.content != 1 && d.content != 2).foreach(e =>
      refuse(s"non-delete file ${e.path} (content ${e.content}) in a delete manifest"))
    val posDeletes = deletes.filter(_.content == 1)
    val eqDeletes = deletes.filter(_.content == 2)
    (active ++ deletes).find(!_.format.equalsIgnoreCase("parquet")).foreach(e =>
      refuse(s"data file format ${e.format} unsupported (parquet only)"))
    val activePaths = active.map(e => resolvePath(tableDir, meta.location, e.path))
    // metadata WITH a schema: the spec's field-id column resolution
    // (renames, adds, drops read correctly across file generations).
    // Legacy metadata without one (no schema to project onto) keeps
    // the single name-based relation.
    val needMetaCols = deletes.nonEmpty
    val base: DataFrame =
      if (meta.schemaFields.nonEmpty)
        fieldIdScan(spark, activePaths, meta.schemaFields, needMetaCols)
      else {
        val b = spark.read.parquet(activePaths: _*)
        if (needMetaCols)
          b.withColumn("__graft_file_key", col("_metadata.file_path"))
            .withColumn("__graft_row_idx", col("_metadata.row_index"))
        else b
      }
    // pruning is the optimization; the ROW filter is the semantics
    def rowFilter(df: DataFrame): DataFrame =
      partitionFilter.map(df.where).getOrElse(df)
    if (deletes.isEmpty) return rowFilter(base)

    import org.apache.spark.sql.types.{StructType, StructField, StringType, LongType}
    def localKeyRows(es: Seq[Entry])(value: Entry => Any): Seq[Row] = es.flatMap { e =>
      DeltaLog.keyForms(resolvePath(tableDir, meta.location, e.path))
        .map(k => Row(k, value(e)))
    }
    var scan = base

    if (posDeletes.nonEmpty) {
      // delete rows name their target by the WRITER's file_path
      // spelling; translate through a broadcast (writer path → local
      // scan key) manifest, then anti-join on (file key, row index).
      // The delete-file scan itself is distributed — position counts
      // never reach the driver.
      val transRows = active.flatMap { e =>
        DeltaLog.keyForms(resolvePath(tableDir, meta.location, e.path))
          .map(k => Row(e.path, k))
      }
      val transDf = spark.createDataFrame(
        java.util.Arrays.asList(transRows: _*),
        StructType(Seq(StructField("__graft_writer_path", StringType),
          StructField("__graft_local_key", StringType))))
      val delDf = spark.read.parquet(
        posDeletes.map(e => resolvePath(tableDir, meta.location, e.path)): _*)
      if (!delDf.columns.contains("file_path") || !delDf.columns.contains("pos"))
        refuse("position-delete file lacks the spec's (file_path, pos) columns")
      val translated = delDf
        .join(broadcast(transDf), col("file_path") === col("__graft_writer_path"))
        .select(col("__graft_local_key"), col("pos").cast("long").as("__graft_del_pos"))
      scan = scan
        .join(translated,
          col("__graft_file_key") === col("__graft_local_key") &&
            col("__graft_row_idx") === col("__graft_del_pos"), "left_anti")
    }

    if (eqDeletes.nonEmpty) {
      // Equality deletes are SEQUENCE-SCOPED: a delete at data
      // sequence N kills matching rows only in data files with
      // sequence < N — rows (re-)written after the delete survive.
      // Everyone therefore needs a sequence number; refusing beats
      // silently deleting resurrected rows or resurrecting deleted
      // ones.
      eqDeletes.find(_.sequenceNumber.isEmpty).foreach(e =>
        refuse(s"equality delete ${e.path} has no data sequence number"))
      active.find(_.sequenceNumber.isEmpty).foreach(e =>
        refuse(s"data file ${e.path} has no data sequence number " +
          "(required to scope equality deletes)"))
      eqDeletes.find(_.equalityIds.isEmpty).foreach(e =>
        refuse(s"equality delete ${e.path} lists no equality_ids"))
      // attach each data row's file sequence via a broadcast (local
      // scan key → sequence) manifest; an unmatched key-form RAISES
      // rather than silently mis-scoping (the DeltaLog guard idiom)
      val seqDf = spark.createDataFrame(
        java.util.Arrays.asList(localKeyRows(active)(_.sequenceNumber.get): _*),
        StructType(Seq(StructField("__graft_file_key", StringType),
          StructField("__graft_seq_m", LongType))))
      scan = scan.join(broadcast(seqDf), Seq("__graft_file_key"), "left")
        .withColumn("__graft_data_seq",
          when(col("__graft_seq_m").isNotNull, col("__graft_seq_m"))
            .otherwise(raise_error(concat(
              lit("iceberg: scan file path did not match the sequence manifest: "),
              col("__graft_file_key"))).cast("long")))
        .drop("__graft_seq_m")
      // one anti-join per distinct equality-id set (real tables carry
      // one — the writer's key columns)
      eqDeletes.groupBy(_.equalityIds).toSeq.sortBy(_._1.mkString(",")).foreach {
        case (ids, files) =>
          val eqCols = ids.map(id => meta.fieldNames.getOrElse(id,
            refuse(s"equality field id $id is not in the current schema " +
              s"(known ids: ${meta.fieldNames.keys.toSeq.sorted.mkString(",")})")))
          val delDf = spark.read.parquet(
            files.map(e => resolvePath(tableDir, meta.location, e.path)): _*)
          eqCols.find(c => !delDf.columns.contains(c)).foreach(c =>
            refuse(s"equality delete file lacks column '$c' named by its equality_ids"))
          val delSeqDf = spark.createDataFrame(
            java.util.Arrays.asList(localKeyRows(files)(_.sequenceNumber.get): _*),
            StructType(Seq(StructField("__graft_dk", StringType),
              StructField("__graft_del_seq", LongType))))
          val delRows = delDf
            .withColumn("__graft_dk", col("_metadata.file_path"))
            .join(broadcast(delSeqDf), Seq("__graft_dk"), "left")
            .withColumn("__graft_del_seq",
              when(col("__graft_del_seq").isNotNull, col("__graft_del_seq"))
                .otherwise(raise_error(concat(
                  lit("iceberg: delete file path did not match the sequence manifest: "),
                  col("__graft_dk"))).cast("long")))
            .select(col("__graft_del_seq") +:
              eqCols.map(c => col(s"`$c`").as(s"__graft_eq_$c")): _*)
          // spec equality semantics: null equals null (<=>), and the
          // delete only reaches STRICTLY OLDER data sequences
          val cond = eqCols.map(c => col(s"`$c`") <=> col(s"__graft_eq_$c"))
            .reduce(_ && _) && col("__graft_data_seq") < col("__graft_del_seq")
          scan = scan.join(delRows, cond, "left_anti")
      }
      scan = scan.drop("__graft_data_seq")
    }
    rowFilter(scan.drop("__graft_file_key", "__graft_row_idx"))
  }
}
