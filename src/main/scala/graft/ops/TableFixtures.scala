package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** On-disk table-format fixtures for the x_delta_dv / x_delta_cm /
  * x_iceberg_v2 gates: each builds a REAL table layout (data parquet
  * + transaction metadata) from the `documents` scan so the gate
  * exercises the full reader path — log replay, deletion-vector
  * anti-join, physical→logical renames — and the DuckDB oracle
  * replays the survivor set from id arithmetic.
  *
  * Layout shared by all three: four data files, bucket k =
  * `doc_id % 4`, rows sorted by doc_id within a file — so a row's
  * position inside its file is its rank among same-bucket ids, and a
  * planted delete rule (`doc_id % 7 == 0`) translates to exact row
  * indexes. The builders derive positions from the ACTUAL ids (one
  * bounded fixture-side collect of (bucket, id)), not from assumed
  * density, so any documents vintage works.
  *
  * Everything deterministic: fixed UUIDs, fixed file names, sorted
  * writes — gate hashes are stable across runs and scale factors.
  */
object TableFixtures {

  /** Write df (already filtered/sorted) as ONE parquet file at dest. */
  private def singleParquet(df: DataFrame, dest: java.io.File): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-onefile").toFile
    df.coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().find(f =>
      f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException("no parquet part written"))
    java.nio.file.Files.move(part.toPath, dest.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    tmp.listFiles().foreach(_.delete()); tmp.delete()
  }

  /** Per-bucket sorted ids (one bounded collect — fixture packing,
    * not operator work) → deleted POSITIONS per bucket under the
    * `id % 7 == 0` rule. */
  private def deletedPositions(docs: DataFrame, idCol: String,
      buckets: Int): Map[Int, Seq[Long]] = {
    val ids = docs.select(col(idCol).cast("long")).na.drop()
      .collect().map(_.getLong(0)).sorted
    (0 until buckets).map { k =>
      val inBucket = ids.filter(id => (id % buckets) == k)
      k -> inBucket.zipWithIndex.collect {
        case (id, pos) if id % 7 == 0 => pos.toLong
      }.toSeq
    }.toMap
  }

  private def writeBucketFiles(docs: DataFrame, idCol: String, dir: java.io.File,
      buckets: Int, name: Int => String,
      project: DataFrame => DataFrame = identity): Unit =
    (0 until buckets).foreach { k =>
      singleParquet(
        project(docs.where(pmod(col(idCol), lit(buckets)) === k).sort(idCol)),
        new java.io.File(dir, name(k)))
    }

  // ---------------------------------------------------------------
  // Delta: deletion vectors
  // ---------------------------------------------------------------

  /** Build a Delta table at a fresh dir: 4 bucket files partitioned
    * by `bucket`, protocol v3 + deletionVectors, and `id%7==0` rows
    * deleted via DVs on buckets 0 ('u' storage), 1 ('p'), 2 ('i') —
    * bucket 3 keeps all rows. Returns the table dir. */
  def writeDeltaDvTable(spark: SparkSession, docs: DataFrame, idCol: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-delta-dv").toFile
    val data = docs.select(col(idCol).cast("long").as("doc_id"),
      col("source"), col("n_chars"))
    writeBucketFiles(data, "doc_id", dir, 4, k => s"bucket-$k.parquet")
    val dels = deletedPositions(data, "doc_id", 4)
    // bucket 0: 'u' storage under a fixed UUID at the table root
    val uuid = java.util.UUID.nameUUIDFromBytes(
      "graft-x-delta-dv-0".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits)
    val dv0 = DeltaDv.serialize(dels(0))
    val uOff = DeltaDv.writeDvFile(
      new java.io.File(dir, s"deletion_vector_$uuid.bin"), Seq(dv0)).head
    val desc0 = DeltaDv.Descriptor("u", DeltaDv.z85Encode(bb.array()),
      Some(uOff), dv0.length, dels(0).size)
    // bucket 1: 'p' storage (absolute path), run-containers exercised
    val dv1 = DeltaDv.serialize(dels(1), useRuns = true)
    val pFile = new java.io.File(dir, "dv-bucket1.bin")
    val pOff = DeltaDv.writeDvFile(pFile, Seq(dv1)).head
    val desc1 = DeltaDv.Descriptor("p", pFile.getAbsolutePath,
      Some(pOff), dv1.length, dels(1).size)
    // bucket 2: inline
    val dv2 = DeltaDv.serialize(dels(2))
    val desc2 = DeltaDv.Descriptor("i", DeltaDv.z85Encode(dv2), None,
      dv2.length, dels(2).size)
    def dvJson(d: DeltaDv.Descriptor): String =
      s""","deletionVector":{"storageType":"${d.storageType}",""" +
        s""""pathOrInlineDv":"${d.pathOrInlineDv}"""" +
        d.offset.map(o => s""","offset":$o""").getOrElse("") +
        s""","sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}"""
    val descs = Map(0 -> desc0, 1 -> desc1, 2 -> desc2)
    val adds = (0 to 3).map { k =>
      s"""{"add":{"path":"bucket-$k.parquet","partitionValues":{"bucket":"$k"},""" +
        s""""size":1,"modificationTime":0,"dataChange":true""" +
        descs.get(k).map(dvJson).getOrElse("") + "}}"
    }
    val logDir = new java.io.File(dir, "_delta_log"); logDir.mkdirs()
    val lines = Seq(
      """{"metaData":{"id":"x-delta-dv","schemaString":"{}","partitionColumns":["bucket"]}}""",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""") ++ adds
    java.nio.file.Files.write(new java.io.File(logDir, f"${0L}%020d.json").toPath,
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    dir.getAbsolutePath
  }

  // ---------------------------------------------------------------
  // Delta: column mapping (name mode)
  // ---------------------------------------------------------------

  /** Build a name-mode column-mapped Delta table: data files carry
    * PHYSICAL names (col-1..col-3), the log's schemaString maps them
    * to logical (doc_id, source, n_chars), partition column `lang`
    * keyed physically (col-4) in partitionValues. */
  def writeDeltaCmTable(spark: SparkSession, docs: DataFrame, idCol: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-delta-cm").toFile
    val data = docs.select(col(idCol).cast("long").as("doc_id"),
      col("source"), col("n_chars"))
    writeBucketFiles(data, "doc_id", dir, 2, k => s"cm-$k.parquet",
      df => df.select(col("doc_id").as("col-1"), col("source").as("col-2"),
        col("n_chars").as("col-3")))
    def fld(name: String, id: Int, phys: String, tpe: String) =
      s"""{\\"name\\":\\"$name\\",\\"type\\":\\"$tpe\\",\\"nullable\\":true,\\"metadata\\":""" +
        s"""{\\"delta.columnMapping.id\\":$id,\\"delta.columnMapping.physicalName\\":\\"$phys\\"}}"""
    val schemaStr = s"""{\\"type\\":\\"struct\\",\\"fields\\":[""" +
      fld("doc_id", 1, "col-1", "long") + "," +
      fld("source", 2, "col-2", "string") + "," +
      fld("n_chars", 3, "col-3", "long") + "," +
      fld("parity", 4, "col-4", "string") + "]}"
    val logDir = new java.io.File(dir, "_delta_log"); logDir.mkdirs()
    val lines = Seq(
      s"""{"metaData":{"id":"x-delta-cm","schemaString":"$schemaStr",""" +
        """"partitionColumns":["parity"],""" +
        """"configuration":{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"4"}}}""",
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      """{"add":{"path":"cm-0.parquet","partitionValues":{"col-4":"even"},"size":1,"modificationTime":0,"dataChange":true}}""",
      """{"add":{"path":"cm-1.parquet","partitionValues":{"col-4":"odd"},"size":1,"modificationTime":0,"dataChange":true}}""")
    java.nio.file.Files.write(new java.io.File(logDir, f"${0L}%020d.json").toPath,
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    dir.getAbsolutePath
  }

  /** Build a two-version Delta table for the TIME-TRAVEL gate:
    * version 0 adds both parity buckets (every document); version 1
    * rewrites bucket 0 without the `doc_id % 5 == 0` rows. Reading
    * AS OF 0 must return every row — a reader that silently serves
    * the latest state loses the %5 rows and hash-mismatches. */
  def writeDeltaTtTable(spark: SparkSession, docs: DataFrame, idCol: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-delta-tt").toFile
    val data = docs.select(col(idCol).cast("long").as("doc_id"),
      col("source"), col("n_chars"))
    writeBucketFiles(data, "doc_id", dir, 2, k => s"tt-$k.parquet")
    singleParquet(
      data.where(pmod(col("doc_id"), lit(2)) === 0 && col("doc_id") % 5 =!= 0)
        .sort("doc_id"),
      new java.io.File(dir, "tt-0b.parquet"))
    val logDir = new java.io.File(dir, "_delta_log"); logDir.mkdirs()
    def add(p: String) =
      s"""{"add":{"path":"$p","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}"""
    java.nio.file.Files.write(new java.io.File(logDir, f"${0L}%020d.json").toPath,
      (Seq("""{"commitInfo":{"timestamp":1000,"operation":"WRITE"}}""",
        """{"metaData":{"id":"x-delta-tt","schemaString":"{}","partitionColumns":[]}}""",
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        add("tt-0.parquet"), add("tt-1.parquet")).mkString("\n"))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(new java.io.File(logDir, f"${1L}%020d.json").toPath,
      (Seq("""{"commitInfo":{"timestamp":2000,"operation":"DELETE"}}""",
        """{"remove":{"path":"tt-0.parquet","dataChange":true}}""",
        add("tt-0b.parquet")).mkString("\n"))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    dir.getAbsolutePath
  }

  /** Build a four-version Delta table for the CHANGE-DATA-FEED gate:
    *  - v0 (ts 1000): adds both parity buckets — every doc an insert;
    *  - v1 (ts 2000): a CDC commit — `_change_data/cdc-1.parquet`
    *    carries update_preimage/update_postimage rows for
    *    `doc_id % 10 == 0` (postimage n_chars + 1000); the commit
    *    ALSO rewrites bucket 0 with dataChange=true add/remove, which
    *    the cdc files must SHADOW (a reader synthesizing from the
    *    file actions here would fabricate inserts/deletes);
    *  - v2 (ts 3000): removes bucket 1 with dataChange — its rows
    *    are deletes;
    *  - v3 (ts 4000): compacts bucket 0b → 0c with dataChange=FALSE
    *    on both actions — contributes NOTHING to the feed. */
  def writeDeltaCdfTable(spark: SparkSession, docs: DataFrame, idCol: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-delta-cdf").toFile
    val data = docs.select(col(idCol).cast("long").as("doc_id"),
      col("source"), col("n_chars"))
    writeBucketFiles(data, "doc_id", dir, 2, k => s"cdf-$k.parquet")
    val rewritten0 = data.where(pmod(col("doc_id"), lit(2)) === 0)
      .withColumn("n_chars", when(col("doc_id") % 10 === 0,
        col("n_chars") + 1000).otherwise(col("n_chars")))
      .sort("doc_id")
    singleParquet(rewritten0, new java.io.File(dir, "cdf-0b.parquet"))
    singleParquet(rewritten0, new java.io.File(dir, "cdf-0c.parquet"))
    val upd = data.where(col("doc_id") % 10 === 0)
    val cdc = upd.withColumn("_change_type", lit("update_preimage"))
      .unionByName(upd.withColumn("n_chars", col("n_chars") + 1000)
        .withColumn("_change_type", lit("update_postimage")))
    val cdDir = new java.io.File(dir, "_change_data"); cdDir.mkdirs()
    singleParquet(cdc.sort("_change_type", "doc_id"),
      new java.io.File(cdDir, "cdc-1.parquet"))
    val logDir = new java.io.File(dir, "_delta_log"); logDir.mkdirs()
    def add(p: String, dc: Boolean) =
      s"""{"add":{"path":"$p","partitionValues":{},"size":1,"modificationTime":0,"dataChange":$dc}}"""
    def remove(p: String, dc: Boolean) =
      s"""{"remove":{"path":"$p","dataChange":$dc}}"""
    def commit(v: Long, lines: Seq[String]): Unit =
      java.nio.file.Files.write(new java.io.File(logDir, f"$v%020d.json").toPath,
        lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    commit(0L, Seq(
      """{"commitInfo":{"timestamp":1000,"operation":"WRITE"}}""",
      """{"metaData":{"id":"x-delta-cdf","schemaString":"{}","partitionColumns":[],""" +
        """"configuration":{"delta.enableChangeDataFeed":"true"}}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
      add("cdf-0.parquet", dc = true), add("cdf-1.parquet", dc = true)))
    commit(1L, Seq(
      """{"commitInfo":{"timestamp":2000,"operation":"UPDATE"}}""",
      """{"cdc":{"path":"_change_data/cdc-1.parquet","partitionValues":{},"size":1,"dataChange":false}}""",
      remove("cdf-0.parquet", dc = true), add("cdf-0b.parquet", dc = true)))
    commit(2L, Seq(
      """{"commitInfo":{"timestamp":3000,"operation":"DELETE"}}""",
      remove("cdf-1.parquet", dc = true)))
    commit(3L, Seq(
      """{"commitInfo":{"timestamp":4000,"operation":"OPTIMIZE"}}""",
      remove("cdf-0b.parquet", dc = false), add("cdf-0c.parquet", dc = false)))
    dir.getAbsolutePath
  }

  /** Build a Delta table with ID-mode column mapping: the parquet
    * files carry field ids 1..3 under column names (f1, f2, f3) that
    * DELIBERATELY differ from the metadata physicalNames
    * (col-stale-N) — a reader resolving by physical name instead of
    * field id finds no such columns and fails loudly; only footer
    * field-id resolution reads this table. Partition column `parity`
    * keeps the physicalName route (partition values never live in
    * the files). */
  def writeDeltaCmIdTable(spark: SparkSession, docs: DataFrame, idCol: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-delta-cmid").toFile
    val data = docs.select(col(idCol).cast("long").as("doc_id"),
      col("source"), col("n_chars"))
    def fid(n: Long) = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("parquet.field.id", n).build()
    writeBucketFiles(data, "doc_id", dir, 2, k => s"cmid-$k.parquet",
      df => df.select(col("doc_id").as("f1", fid(1)),
        col("source").as("f2", fid(2)), col("n_chars").as("f3", fid(3))))
    def fld(name: String, id: Int, phys: String, tpe: String) =
      s"""{\\"name\\":\\"$name\\",\\"type\\":\\"$tpe\\",\\"nullable\\":true,\\"metadata\\":""" +
        s"""{\\"delta.columnMapping.id\\":$id,\\"delta.columnMapping.physicalName\\":\\"$phys\\"}}"""
    val schemaStr = s"""{\\"type\\":\\"struct\\",\\"fields\\":[""" +
      fld("doc_id", 1, "col-stale-1", "long") + "," +
      fld("source", 2, "col-stale-2", "string") + "," +
      fld("n_chars", 3, "col-stale-3", "long") + "," +
      fld("parity", 4, "col-4", "string") + "]}"
    val logDir = new java.io.File(dir, "_delta_log"); logDir.mkdirs()
    val lines = Seq(
      s"""{"metaData":{"id":"x-delta-cm-id","schemaString":"$schemaStr",""" +
        """"partitionColumns":["parity"],""" +
        """"configuration":{"delta.columnMapping.mode":"id","delta.columnMapping.maxColumnId":"4"}}}""",
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      """{"add":{"path":"cmid-0.parquet","partitionValues":{"col-4":"even"},"size":1,"modificationTime":0,"dataChange":true}}""",
      """{"add":{"path":"cmid-1.parquet","partitionValues":{"col-4":"odd"},"size":1,"modificationTime":0,"dataChange":true}}""")
    java.nio.file.Files.write(new java.io.File(logDir, f"${0L}%020d.json").toPath,
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    dir.getAbsolutePath
  }

  /** Build a PARTITIONED Delta table with REAL per-file stats for the
    * data-skipping gate: partition column `bucket` = doc_id % 2 (in
    * partitionValues only — the Delta convention keeps partition
    * columns out of the files), and within each partition TWO files
    * split at `cut` = max(doc_id)/2 (part-b<k>-lo = ids ≤ cut,
    * part-b<k>-hi = ids > cut). Every add action carries a stats JSON
    * with the file's true numRecords / minValues / maxValues /
    * nullCount for doc_id and n_chars, plus a real schemaString — so
    * a `bucket = 1 AND doc_id <= cut` read must open exactly ONE of
    * the four files. */
  def writeDeltaPartTable(spark: SparkSession, docs: DataFrame, idCol: String): String = {
    import org.json4s._
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val dir = java.nio.file.Files.createTempDirectory("graft-delta-part").toFile
    val data = docs.select(col(idCol).cast("long").as("doc_id"),
      col("source"), col("n_chars").cast("long").as("n_chars"))
      .where(col("doc_id").isNotNull)
    val cut = data.agg(max(col("doc_id"))).head().getLong(0) / 2
    val splits: Seq[(String, String, org.apache.spark.sql.Column)] = Seq(
      ("part-b0-lo.parquet", "0", pmod(col("doc_id"), lit(2)) === 0 && col("doc_id") <= cut),
      ("part-b0-hi.parquet", "0", pmod(col("doc_id"), lit(2)) === 0 && col("doc_id") > cut),
      ("part-b1-lo.parquet", "1", pmod(col("doc_id"), lit(2)) === 1 && col("doc_id") <= cut),
      ("part-b1-hi.parquet", "1", pmod(col("doc_id"), lit(2)) === 1 && col("doc_id") > cut))
    val adds: Seq[String] = splits.flatMap { case (name, bucket, pred) =>
      val part = data.where(pred).sort("doc_id")
      if (part.isEmpty) None else Some {
      singleParquet(part, new java.io.File(dir, name))
      val st = part.agg(count(lit(1)), min("doc_id"), max("doc_id"),
        min("n_chars"), max("n_chars"),
        sum(col("n_chars").isNull.cast("long"))).head()
      val statsJson = JsonMethods.compact(JsonMethods.render(
        ("numRecords" -> st.getLong(0)) ~
          ("minValues" -> (("doc_id" -> st.getLong(1)) ~ ("n_chars" -> st.getLong(3)))) ~
          ("maxValues" -> (("doc_id" -> st.getLong(2)) ~ ("n_chars" -> st.getLong(4)))) ~
          ("nullCount" -> (("doc_id" -> 0L) ~ ("n_chars" -> st.getLong(5))))))
      JsonMethods.compact(JsonMethods.render(
        ("add" -> (("path" -> name) ~
          ("partitionValues" -> Map("bucket" -> bucket)) ~
          ("size" -> new java.io.File(dir, name).length()) ~
          ("modificationTime" -> 0L) ~ ("dataChange" -> true) ~
          ("stats" -> statsJson)))))
      }
    }
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("bucket", org.apache.spark.sql.types.StringType))).json
    val metaLine = JsonMethods.compact(JsonMethods.render(
      ("metaData" -> (("id" -> "x-delta-part") ~
        ("schemaString" -> schemaJson) ~
        ("partitionColumns" -> List("bucket"))))))
    val logDir = new java.io.File(dir, "_delta_log"); logDir.mkdirs()
    java.nio.file.Files.write(new java.io.File(logDir, f"${0L}%020d.json").toPath,
      ((metaLine +: """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""" +: adds)
        .mkString("\n")).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    dir.getAbsolutePath
  }

  // ---------------------------------------------------------------
  // Iceberg: format-version 2 with position deletes
  // ---------------------------------------------------------------

  /** Build a v2 Iceberg table: 4 bucket data files, one
    * position-delete parquet covering the `id%7==0` rows of EVERY
    * bucket, a data manifest + a delete manifest (both written by
    * the in-repo from-spec Avro codec), a v2 manifest list carrying
    * the manifest-kind `content`, metadata JSON and version hint. */
  def writeIcebergV2Table(spark: SparkSession, docs: DataFrame, idCol: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-iceberg-v2").toFile
    val loc = dir.getAbsolutePath
    val data = docs.select(col(idCol).cast("long").as("doc_id"),
      col("source"), col("n_chars"))
    writeBucketFiles(data, "doc_id", dir, 4, k => s"data-$k.parquet")
    val dels = deletedPositions(data, "doc_id", 4)
    // the delete file names its targets by the WRITER's path spelling
    // (the same absolute path the manifests record)
    import spark.implicits._
    val delRows = (0 to 3).flatMap(k => dels(k).map(p => (s"$loc/data-$k.parquet", p)))
    singleParquet(delRows.toDF("file_path", "pos").sort("file_path", "pos"),
      new java.io.File(dir, "pos-deletes.parquet"))
    val metaDir = new java.io.File(dir, "metadata"); metaDir.mkdirs()
    def fsize(name: String): Long = new java.io.File(dir, name).length()
    val dataEntries = (0 to 3).map(k => Iceberg.Entry(1, s"$loc/data-$k.parquet",
      "PARQUET", 0L, fsize(s"data-$k.parquet"), content = 0))
    val delEntries = Seq(Iceberg.Entry(1, s"$loc/pos-deletes.parquet",
      "PARQUET", delRows.size.toLong, fsize("pos-deletes.parquet"), content = 1))
    val mData = Iceberg.writeManifestV2(dataEntries, "x-ib2-data")
    val mDel = Iceberg.writeManifestV2(delEntries, "x-ib2-del")
    java.nio.file.Files.write(new java.io.File(metaDir, "m-data.avro").toPath, mData)
    java.nio.file.Files.write(new java.io.File(metaDir, "m-del.avro").toPath, mDel)
    val ml = Iceberg.writeManifestListV2(Seq(
      (s"$loc/metadata/m-data.avro", mData.length.toLong, 0),
      (s"$loc/metadata/m-del.avro", mDel.length.toLong, 1)), "x-ib2-ml")
    java.nio.file.Files.write(new java.io.File(metaDir, "snap-1.avro").toPath, ml)
    // snapshot 0: the PRE-DELETE state (data manifest only) — the
    // snapshot-travel gate reads it by id
    val ml0 = Iceberg.writeManifestListV2(Seq(
      (s"$loc/metadata/m-data.avro", mData.length.toLong, 0)), "x-ib2-ml0")
    java.nio.file.Files.write(new java.io.File(metaDir, "snap-0.avro").toPath, ml0)
    val metaJson =
      s"""{"format-version":2,"table-uuid":"x-iceberg-v2","location":"$loc",
         |"current-snapshot-id":1,"snapshots":[
         |{"snapshot-id":0,"manifest-list":"$loc/metadata/snap-0.avro"},
         |{"snapshot-id":1,"manifest-list":"$loc/metadata/snap-1.avro"}],
         |"snapshot-log":[{"timestamp-ms":1000,"snapshot-id":0},
         |{"timestamp-ms":2000,"snapshot-id":1}]}""".stripMargin
    java.nio.file.Files.write(new java.io.File(metaDir, "v1.metadata.json").toPath,
      metaJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(new java.io.File(metaDir, "version-hint.text").toPath,
      "1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    dir.getAbsolutePath
  }

  /** Build a v2 Iceberg table exercising FIELD-ID column resolution
    * across schema evolution:
    *
    *  - generation A (even ids, two files): written BEFORE a rename —
    *    parquet columns (id_v1, src_v1, chars_v1) under field ids
    *    1..3, and NO parity column (added to the schema later);
    *  - generation B (odd ids, two files): the post-rename names
    *    (doc_id, source, n_chars) plus parity='odd', ids 1..4.
    *
    * Current schema: doc_id(1), source(2), n_chars(3), parity(4). A
    * name-based reader null-fills generation A's data columns (their
    * stored names are not in the schema) and hash-mismatches; only
    * the spec's field-id resolution reads both generations — gen A
    * rows carry parity NULL (column added after they were written). */
  def writeIcebergRenameTable(spark: SparkSession, docs: DataFrame, idCol: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-iceberg-ren").toFile
    val loc = dir.getAbsolutePath
    val data = docs.select(col(idCol).cast("long").as("doc_id"),
      col("source"), col("n_chars"))
    def fid(n: Long) = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("parquet.field.id", n).build()
    (0 to 1).foreach { k =>
      singleParquet(
        data.where(pmod(col("doc_id"), lit(4)) === 2 * k).sort("doc_id")
          .select(col("doc_id").as("id_v1", fid(1)),
            col("source").as("src_v1", fid(2)),
            col("n_chars").as("chars_v1", fid(3))),
        new java.io.File(dir, s"genA-$k.parquet"))
      singleParquet(
        data.where(pmod(col("doc_id"), lit(4)) === 2 * k + 1).sort("doc_id")
          .select(col("doc_id").as("doc_id", fid(1)),
            col("source").as("source", fid(2)),
            col("n_chars").as("n_chars", fid(3)),
            lit("odd").as("parity", fid(4))),
        new java.io.File(dir, s"genB-$k.parquet"))
    }
    val metaDir = new java.io.File(dir, "metadata"); metaDir.mkdirs()
    def fsize(name: String): Long = new java.io.File(dir, name).length()
    val names = Seq("genA-0", "genA-1", "genB-0", "genB-1").map(_ + ".parquet")
    val m = Iceberg.writeManifest(
      names.map(n => Iceberg.Entry(1, s"$loc/$n", "PARQUET", 0L, fsize(n))), "x-ib-ren")
    java.nio.file.Files.write(new java.io.File(metaDir, "m-ren.avro").toPath, m)
    val ml = Iceberg.writeManifestList(
      Seq((s"$loc/metadata/m-ren.avro", m.length.toLong)), "x-ib-ren-ml")
    java.nio.file.Files.write(new java.io.File(metaDir, "snap-1.avro").toPath, ml)
    val metaJson =
      s"""{"format-version":2,"table-uuid":"x-iceberg-ren","location":"$loc",
         |"current-schema-id":0,"schemas":[{"type":"struct","schema-id":0,"fields":[
         |{"id":1,"name":"doc_id","required":false,"type":"long"},
         |{"id":2,"name":"source","required":false,"type":"string"},
         |{"id":3,"name":"n_chars","required":false,"type":"long"},
         |{"id":4,"name":"parity","required":false,"type":"string"}]}],
         |"current-snapshot-id":1,"snapshots":[
         |{"snapshot-id":1,"manifest-list":"$loc/metadata/snap-1.avro"}]}""".stripMargin
    java.nio.file.Files.write(new java.io.File(metaDir, "v1.metadata.json").toPath,
      metaJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(new java.io.File(metaDir, "version-hint.text").toPath,
      "1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    dir.getAbsolutePath
  }

  /** Build a v2 PARTITIONED Iceberg table for the pruning gate:
    * identity partition column `bucket` = doc_id % 4, four data files
    * (the bucket column stored in the files as identity partitioning
    * does), each manifest entry carrying its EXACT partition tuple
    * ({bucket: k}), and the metadata carrying the identity
    * partition-spec plus the four-field schema (ids 1..4). */
  def writeIcebergPartTable(spark: SparkSession, docs: DataFrame, idCol: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-iceberg-part").toFile
    val loc = dir.getAbsolutePath
    val data = docs.select(col(idCol).cast("long").as("doc_id"),
      col("source"), col("n_chars"),
      pmod(col(idCol).cast("long"), lit(4)).as("bucket"))
    def fid(n: Long) = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("parquet.field.id", n).build()
    (0 to 3).foreach { k =>
      singleParquet(
        data.where(col("bucket") === k).sort("doc_id")
          .select(col("doc_id").as("doc_id", fid(1)),
            col("source").as("source", fid(2)),
            col("n_chars").as("n_chars", fid(3)),
            col("bucket").as("bucket", fid(4))),
        new java.io.File(dir, s"part-$k.parquet"))
    }
    val metaDir = new java.io.File(dir, "metadata"); metaDir.mkdirs()
    def fsize(name: String): Long = new java.io.File(dir, name).length()
    val entries = (0 to 3).map(k => Iceberg.Entry(1, s"$loc/part-$k.parquet",
      "PARQUET", 0L, fsize(s"part-$k.parquet"),
      partition = Map("bucket" -> k.toLong)))
    val m = Iceberg.writeManifestPart(entries, Seq("bucket" -> "long"), "x-ib-part")
    java.nio.file.Files.write(new java.io.File(metaDir, "m-part.avro").toPath, m)
    val ml = Iceberg.writeManifestList(
      Seq((s"$loc/metadata/m-part.avro", m.length.toLong)), "x-ib-part-ml")
    java.nio.file.Files.write(new java.io.File(metaDir, "snap-1.avro").toPath, ml)
    val metaJson =
      s"""{"format-version":2,"table-uuid":"x-iceberg-part","location":"$loc",
         |"current-schema-id":0,"schemas":[{"type":"struct","schema-id":0,"fields":[
         |{"id":1,"name":"doc_id","required":false,"type":"long"},
         |{"id":2,"name":"source","required":false,"type":"string"},
         |{"id":3,"name":"n_chars","required":false,"type":"long"},
         |{"id":4,"name":"bucket","required":false,"type":"long"}]}],
         |"default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[
         |{"name":"bucket","transform":"identity","source-id":4,"field-id":1000}]}],
         |"current-snapshot-id":1,"snapshots":[
         |{"snapshot-id":1,"manifest-list":"$loc/metadata/snap-1.avro"}]}""".stripMargin
    java.nio.file.Files.write(new java.io.File(metaDir, "v1.metadata.json").toPath,
      metaJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(new java.io.File(metaDir, "version-hint.text").toPath,
      "1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    dir.getAbsolutePath
  }

  /** Build an UNPARTITIONED Iceberg table for the column-bounds
    * skipping gate: four data files split by contiguous doc_id
    * quartiles (cuts at max/4, max/2, 3·max/4), each manifest entry
    * carrying REAL `lower_bounds`/`upper_bounds` (Appendix D
    * little-endian longs) plus `null_value_counts`/`value_counts`
    * for doc_id (field 1) and n_chars (field 3). A doc_id range
    * predicate must open only the overlapping quartile files. */
  def writeIcebergSkipTable(spark: SparkSession, docs: DataFrame, idCol: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-iceberg-skip").toFile
    val loc = dir.getAbsolutePath
    val data = docs.select(col(idCol).cast("long").as("doc_id"),
      col("source"), col("n_chars").cast("long").as("n_chars"))
      .where(col("doc_id").isNotNull)
    val maxId = data.agg(max(col("doc_id"))).head().getLong(0)
    val cuts = Seq(maxId / 4, maxId / 2, 3 * maxId / 4)
    val ranges: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      ("skip-q0.parquet", col("doc_id") <= cuts(0)),
      ("skip-q1.parquet", col("doc_id") > cuts(0) && col("doc_id") <= cuts(1)),
      ("skip-q2.parquet", col("doc_id") > cuts(1) && col("doc_id") <= cuts(2)),
      ("skip-q3.parquet", col("doc_id") > cuts(2)))
    val entries: Seq[Iceberg.Entry] = ranges.flatMap { case (name, pred) =>
      val part = data.where(pred).sort("doc_id")
      if (part.isEmpty) None else Some {
        singleParquet(part, new java.io.File(dir, name))
        val st = part.agg(count(lit(1)), min("doc_id"), max("doc_id"),
          min("n_chars"), max("n_chars"),
          sum(col("n_chars").isNull.cast("long")),
          count(col("n_chars"))).head()
        Iceberg.Entry(1, s"$loc/$name", "PARQUET", st.getLong(0),
          new java.io.File(dir, name).length(),
          lowerBounds = Map(
            1 -> Iceberg.encodeBoundLong(st.getLong(1)),
            3 -> Iceberg.encodeBoundLong(st.getLong(3))),
          upperBounds = Map(
            1 -> Iceberg.encodeBoundLong(st.getLong(2)),
            3 -> Iceberg.encodeBoundLong(st.getLong(4))),
          nullCounts = Map(1 -> 0L, 3 -> st.getLong(5)),
          valueCounts = Map(1 -> st.getLong(0), 3 -> st.getLong(0)))
      }
    }
    val metaDir = new java.io.File(dir, "metadata"); metaDir.mkdirs()
    val m = Iceberg.writeManifestBounds(entries, "x-ib-skip")
    java.nio.file.Files.write(new java.io.File(metaDir, "m-skip.avro").toPath, m)
    val ml = Iceberg.writeManifestList(
      Seq((s"$loc/metadata/m-skip.avro", m.length.toLong)), "x-ib-skip-ml")
    java.nio.file.Files.write(new java.io.File(metaDir, "snap-1.avro").toPath, ml)
    val metaJson =
      s"""{"format-version":2,"table-uuid":"x-iceberg-skip","location":"$loc",
         |"current-schema-id":0,"schemas":[{"type":"struct","schema-id":0,"fields":[
         |{"id":1,"name":"doc_id","required":false,"type":"long"},
         |{"id":2,"name":"source","required":false,"type":"string"},
         |{"id":3,"name":"n_chars","required":false,"type":"long"}]}],
         |"current-snapshot-id":1,"snapshots":[
         |{"snapshot-id":1,"manifest-list":"$loc/metadata/snap-1.avro"}]}""".stripMargin
    java.nio.file.Files.write(new java.io.File(metaDir, "v1.metadata.json").toPath,
      metaJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(new java.io.File(metaDir, "version-hint.text").toPath,
      "1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    dir.getAbsolutePath
  }

  /** Build a v2 Iceberg table whose current snapshot carries an
    * EQUALITY delete between two data generations:
    *
    *  - generation 1 (data sequence 1, INHERITED — the entries write
    *    a null sequence_number and the manifest-list row carries 1):
    *    the EVEN doc_ids in two bucket files;
    *  - an equality delete (sequence 2) on `equality_ids = [1]`
    *    (field id 1 = doc_id) listing EVERY corpus id with
    *    `id % 3 == 0` — even ones match generation 1, odd ones match
    *    nothing yet;
    *  - generation 2 (sequence 3, explicit entry-level): the ODD
    *    doc_ids — written AFTER the delete, so its `%3==0` rows must
    *    SURVIVE. A reader that ignores sequence scoping deletes them
    *    and hash-mismatches.
    *
    * Survivors: even ids with id%3 != 0, plus all odd ids. */
  def writeIcebergEqTable(spark: SparkSession, docs: DataFrame, idCol: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-iceberg-eq").toFile
    val loc = dir.getAbsolutePath
    val data = docs.select(col(idCol).cast("long").as("doc_id"),
      col("source"), col("n_chars"))
    val gen1 = data.where(col("doc_id") % 2 === 0)
    val gen2 = data.where(col("doc_id") % 2 === 1)
    (0 to 1).foreach { k =>
      singleParquet(gen1.where(pmod(col("doc_id"), lit(4)) === 2 * k).sort("doc_id"),
        new java.io.File(dir, s"gen1-$k.parquet"))
      singleParquet(gen2.where(pmod(col("doc_id"), lit(4)) === 2 * k + 1).sort("doc_id"),
        new java.io.File(dir, s"gen2-$k.parquet"))
    }
    singleParquet(data.where(col("doc_id") % 3 === 0)
      .select(col("doc_id")).sort("doc_id"),
      new java.io.File(dir, "eq-del.parquet"))
    val metaDir = new java.io.File(dir, "metadata"); metaDir.mkdirs()
    def fsize(name: String): Long = new java.io.File(dir, name).length()
    def dataEntry(name: String, seq: Option[Long]) = Iceberg.Entry(1,
      s"$loc/$name", "PARQUET", 0L, fsize(name), content = 0, sequenceNumber = seq)
    // generation 1: null entry sequence → ADDED entries inherit the
    // manifest-list row's sequence (1)
    val mGen1 = Iceberg.writeManifestSeq(
      (0 to 1).map(k => dataEntry(s"gen1-$k.parquet", None)), "x-ib-eq-g1")
    val mGen2 = Iceberg.writeManifestSeq(
      (0 to 1).map(k => dataEntry(s"gen2-$k.parquet", Some(3L))), "x-ib-eq-g2")
    val mDel = Iceberg.writeManifestSeq(Seq(Iceberg.Entry(1,
      s"$loc/eq-del.parquet", "PARQUET", 0L, fsize("eq-del.parquet"),
      content = 2, sequenceNumber = Some(2L), equalityIds = Seq(1))), "x-ib-eq-del")
    java.nio.file.Files.write(new java.io.File(metaDir, "m-gen1.avro").toPath, mGen1)
    java.nio.file.Files.write(new java.io.File(metaDir, "m-gen2.avro").toPath, mGen2)
    java.nio.file.Files.write(new java.io.File(metaDir, "m-del.avro").toPath, mDel)
    val ml = Iceberg.writeManifestListSeq(Seq(
      (s"$loc/metadata/m-gen1.avro", mGen1.length.toLong, 0, 1L),
      (s"$loc/metadata/m-gen2.avro", mGen2.length.toLong, 0, 3L),
      (s"$loc/metadata/m-del.avro", mDel.length.toLong, 1, 2L)), "x-ib-eq-ml")
    java.nio.file.Files.write(new java.io.File(metaDir, "snap-1.avro").toPath, ml)
    val metaJson =
      s"""{"format-version":2,"table-uuid":"x-iceberg-eq","location":"$loc",
         |"current-schema-id":0,"schemas":[{"type":"struct","schema-id":0,"fields":[
         |{"id":1,"name":"doc_id","required":false,"type":"long"},
         |{"id":2,"name":"source","required":false,"type":"string"},
         |{"id":3,"name":"n_chars","required":false,"type":"long"}]}],
         |"current-snapshot-id":1,"snapshots":[
         |{"snapshot-id":1,"manifest-list":"$loc/metadata/snap-1.avro"}]}""".stripMargin
    java.nio.file.Files.write(new java.io.File(metaDir, "v1.metadata.json").toPath,
      metaJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(new java.io.File(metaDir, "version-hint.text").toPath,
      "1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    dir.getAbsolutePath
  }
}
