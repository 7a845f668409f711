package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FSDataInputStream, Path, PathFilter}
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager.CancellableFSDataOutputStream

/** Checkpoint file manager for LOCAL (`file:`) checkpoint dirs that
  * performs every operation through `java.nio` — no Hadoop local
  * filesystem, therefore no `Shell.execCommand` chmod fork per file
  * create (see [[graft.util.NoForkRawLocalFileSystem]] for the fork
  * mechanics; thread dumps showed the default FileContext-based
  * manager spending ~200 ms per state-store commit in `forkAndExec`
  * on hosts without libhadoop.so). Installed per-session via
  * `spark.sql.streaming.checkpointFileManagerClass` by
  * [[Streaming.startMemorySink]] — the gate/replay surface whose
  * checkpoints are tmp-dir local by construction. Durable production
  * checkpoints (hdfs://, s3a://) keep Spark's default managers.
  *
  * Semantics mirror Spark's `FileSystemBasedCheckpointFileManager`:
  * `createAtomic` writes a hidden temp file and commits it with an
  * atomic rename on close; a rename that loses a same-target race with
  * `overwriteIfPossible = false` deletes the temp file and carries on
  * (the caller committed the same content — the state-store contract).
  */
class NioCheckpointFileManager(root: Path, hadoopConf: Configuration)
    extends CheckpointFileManager {

  require(Option(root.toUri.getScheme).forall(_ == "file"),
    s"NioCheckpointFileManager only handles local paths, got $root")

  private def nio(p: Path): java.nio.file.Path = Paths.get(p.toUri.getPath)

  override def createAtomic(
      path: Path, overwriteIfPossible: Boolean): CancellableFSDataOutputStream = {
    val target = nio(path)
    Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(
      s".${path.getName}.${java.util.UUID.randomUUID}.tmp")
    val os = new java.io.BufferedOutputStream(
      Files.newOutputStream(tmp,
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE), 32 * 1024)
    new CancellableFSDataOutputStream(os) {
      @volatile private var terminated = false
      override def close(): Unit = synchronized {
        if (!terminated) {
          terminated = true
          super.close() // flushes the buffered stream
          try {
            if (overwriteIfPossible) {
              Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
                StandardCopyOption.REPLACE_EXISTING)
            } else if (Files.exists(target)) {
              // same-batch racer already committed this file
              Files.deleteIfExists(tmp)
            } else {
              try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
              catch {
                case _: java.nio.file.FileAlreadyExistsException =>
                  Files.deleteIfExists(tmp)
              }
            }
            ()
          } catch {
            case e: java.io.IOException =>
              Files.deleteIfExists(tmp); throw e
          }
        }
      }
      override def cancel(): Unit = synchronized {
        if (!terminated) {
          terminated = true
          try super.close() catch { case _: java.io.IOException => () }
          Files.deleteIfExists(tmp)
          ()
        }
      }
    }
  }

  override def open(path: Path): FSDataInputStream = {
    val ch = java.nio.channels.FileChannel.open(
      nio(path), java.nio.file.StandardOpenOption.READ)
    // FSDataInputStream needs Seekable + PositionedReadable
    new FSDataInputStream(new java.io.InputStream
        with org.apache.hadoop.fs.Seekable
        with org.apache.hadoop.fs.PositionedReadable {
      private val one = java.nio.ByteBuffer.allocate(1)
      override def read(): Int = {
        one.clear()
        if (ch.read(one) <= 0) -1 else one.get(0) & 0xff
      }
      override def read(b: Array[Byte], off: Int, len: Int): Int =
        ch.read(java.nio.ByteBuffer.wrap(b, off, len))
      override def seek(pos: Long): Unit = { ch.position(pos); () }
      override def getPos: Long = ch.position()
      override def seekToNewSource(targetPos: Long): Boolean = false
      override def read(position: Long, buffer: Array[Byte], offset: Int, length: Int): Int =
        ch.read(java.nio.ByteBuffer.wrap(buffer, offset, length), position)
      override def readFully(position: Long, buffer: Array[Byte], offset: Int, length: Int): Unit = {
        var done = 0
        while (done < length) {
          val n = ch.read(java.nio.ByteBuffer.wrap(buffer, offset + done, length - done),
            position + done)
          if (n < 0) throw new java.io.EOFException(s"EOF at ${position + done} in $path")
          done += n
        }
      }
      override def readFully(position: Long, buffer: Array[Byte]): Unit =
        readFully(position, buffer, 0, buffer.length)
      override def close(): Unit = ch.close()
    })
  }

  override def list(path: Path, filter: PathFilter): Array[FileStatus] = {
    val dir = nio(path)
    if (!Files.isDirectory(dir)) {
      if (!Files.exists(dir)) throw new java.io.FileNotFoundException(dir.toString)
      else Array(status(dir)).filter(st => filter.accept(st.getPath))
    } else {
      val out = Vector.newBuilder[FileStatus]
      val s = Files.list(dir)
      try s.forEach { p => val st = status(p); if (filter.accept(st.getPath)) out += st }
      finally s.close()
      out.result().toArray
    }
  }

  private def status(p: java.nio.file.Path): FileStatus = {
    val attrs = Files.readAttributes(p, classOf[java.nio.file.attribute.BasicFileAttributes])
    new FileStatus(attrs.size(), attrs.isDirectory, 1, 33554432L,
      attrs.lastModifiedTime().toMillis, new Path(p.toUri))
  }

  override def mkdirs(path: Path): Unit = { Files.createDirectories(nio(path)); () }

  override def exists(path: Path): Boolean = Files.exists(nio(path))

  override def delete(path: Path): Unit = {
    def rm(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
        val s = Files.list(p)
        try s.forEach(rm(_)) finally s.close()
      }
      Files.deleteIfExists(p)
      ()
    }
    try rm(nio(path)) catch { case _: java.io.FileNotFoundException => () }
  }

  override def isLocal: Boolean = true

  override def createCheckpointDirectory(): Path = {
    Files.createDirectories(nio(root))
    root
  }
}
