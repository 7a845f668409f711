package graft.ops

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Hadoop-FileSystem seam for the table-format METADATA layer
  * (round 18).
  *
  * The DATA path (parquet scans, `df.write`) always went through
  * Spark→Hadoop and understands any registered scheme; this object
  * routes the remaining driver-side metadata traffic — `_delta_log`
  * and `metadata/` listings, commit-JSON / manifest-Avro byte reads,
  * existence probes — through the same `org.apache.hadoop.fs
  * .FileSystem` API, so a Delta or Iceberg table at `s3a://…`,
  * `hdfs://…`, or any other registered scheme is listable and
  * readable by this layer exactly like a local one. Paths WITHOUT a
  * scheme keep resolving through the local filesystem (Hadoop's
  * `file:` default), byte-identical with the previous
  * `java.io.File` behavior.
  *
  * Driver-side metadata volumes are bounded by construction (log
  * JSONs, Avro manifests, checkpoint headers — KBs to low MBs), so
  * whole-file byte reads are the right shape here; data bytes never
  * flow through this object.
  */
object TableIo {

  /** One listing entry: `name` is the final path component; callers
    * build child paths as `s"$dir/$name"`, preserving the caller's
    * own scheme spelling. */
  final case class Entry(name: String, size: Long, mtime: Long,
      isDir: Boolean)

  /** `true` when `p` carries a URI scheme (`s3a://…`, `file:/…`,
    * `hdfs://nn/…`). A bare `C:`-less POSIX path has none. Broader
    * than a `"://"` probe: null-authority URIs spell `scheme:/path`
    * with a single slash. */
  def hasScheme(p: String): Boolean =
    p.matches("^[A-Za-z][A-Za-z0-9+.-]*:/.*")

  private def conf(): Configuration =
    SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  private def fsOf(p: String): (FileSystem, Path) = {
    val path = new Path(p)
    (path.getFileSystem(conf()), path)
  }

  /** List a directory's immediate children; an absent or non-dir
    * path lists empty (matching `File.listFiles()`'s null → empty
    * convention at the previous call sites). */
  def list(dir: String): Seq[Entry] = {
    val (fs, path) = fsOf(dir)
    try fs.listStatus(path).toSeq.map(st =>
      Entry(st.getPath.getName, st.getLen, st.getModificationTime, st.isDirectory))
    catch { case _: java.io.FileNotFoundException => Seq.empty }
  }

  def exists(p: String): Boolean = {
    val (fs, path) = fsOf(p)
    fs.exists(path)
  }

  def isFile(p: String): Boolean = {
    val (fs, path) = fsOf(p)
    try fs.getFileStatus(path).isFile
    catch { case _: java.io.FileNotFoundException => false }
  }

  def lastModified(p: String): Long = {
    val (fs, path) = fsOf(p)
    try fs.getFileStatus(path).getModificationTime
    catch { case _: java.io.FileNotFoundException => 0L }
  }

  /** Whole-file byte read — metadata-bounded callers only. */
  def readBytes(p: String): Array[Byte] = {
    val (fs, path) = fsOf(p)
    val in = fs.open(path)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  def readString(p: String): String =
    new String(readBytes(p), java.nio.charset.StandardCharsets.UTF_8)

  def size(p: String): Long = {
    val (fs, path) = fsOf(p)
    fs.getFileStatus(path).getLen
  }

  /** Recursive listing as paths RELATIVE to `dir` (forward-slash
    * separated) — the writer-side stage-dir walk. */
  def walkRel(dir: String): Seq[String] = {
    def go(d: String, prefix: String): Seq[String] =
      list(d).flatMap { e =>
        val rel = if (prefix.isEmpty) e.name else s"$prefix/${e.name}"
        if (e.isDir) go(s"$d/${e.name}", rel) else Seq(rel)
      }
    go(dir, "")
  }

  /** Plain overwriting write (non-exclusive metadata like
    * `_last_checkpoint` / `version-hint.text`). */
  def writeBytes(p: String, bytes: Array[Byte]): Unit = {
    val (fs, path) = fsOf(p)
    val out = fs.create(path, true)
    try out.write(bytes) finally out.close()
  }

  def mkdirs(p: String): Unit = {
    val (fs, path) = fsOf(p)
    fs.mkdirs(path)
    ()
  }

  def delete(p: String, recursive: Boolean = false): Unit = {
    val (fs, path) = fsOf(p)
    fs.delete(path, recursive)
    ()
  }

  /** Move `src` to `dst` (same filesystem). Refuses when the
    * destination already exists — Hadoop's local rename REPLACES
    * silently (POSIX rename), which is never what a table writer
    * wants. */
  def rename(src: String, dst: String): Unit = {
    val (fs, s) = fsOf(src)
    val d = new Path(dst)
    if (fs.exists(d))
      throw new graft.GraftAnalysisException(s"io: rename target exists: $dst")
    if (!fs.rename(s, d))
      throw new graft.GraftAnalysisException(s"io: rename $src -> $dst failed")
  }

  /** PUBLISH a fully-written metadata file at `path`, failing (false)
    * when the target already exists — the exclusive-commit primitive
    * both table writers' optimistic concurrency rides on.
    *
    * Scheme-less local paths keep the POSIX hard-link protocol
    * (write a temp sibling, `createLink` to the target): the target
    * appears ATOMICALLY with full content and link-if-exists loses
    * the race cleanly. Scheme'd stores get `create(overwrite=false)`
    * — HDFS checks-and-creates atomically; object stores without a
    * put-if-absent primitive reduce to a single-writer assumption,
    * the standard posture absent an external commit coordinator. */
  def writeExclusive(path: String, bytes: Array[Byte]): Boolean =
    if (!hasScheme(path)) {
      val target = new java.io.File(path)
      Option(target.getParentFile).foreach(_.mkdirs())
      val tmp = java.io.File.createTempFile(
        s".graft-pub-", ".tmp", target.getParentFile)
      try {
        java.nio.file.Files.write(tmp.toPath, bytes)
        try { java.nio.file.Files.createLink(target.toPath, tmp.toPath); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } finally tmp.delete()
    } else {
      val (fs, p) = fsOf(path)
      try {
        val out = fs.create(p, false)
        try out.write(bytes) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException => if (fs.exists(p)) false else throw e
      }
    }
}
