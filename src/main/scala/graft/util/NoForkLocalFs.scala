package graft.util

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystems that never shell out for permission bits.
  *
  * On hosts without the native Hadoop library (this sandbox — the
  * "NativeCodeLoader: using builtin-java classes" warning),
  * `RawLocalFileSystem` falls back to `Shell.execCommand` — a
  * fork/exec of `/bin/chmod` — for EVERY file create and mkdir with a
  * permission (`RawLocalFileSystem$LocalFSFileOutputStream.<init>` →
  * `setPermission`). Forking from a multi-GB JVM costs milliseconds a
  * call and serializes across threads; a streaming micro-batch doing
  * ~34 checkpoint-file creates paid ~200 ms per state-store commit in
  * thread dumps (jw_3: `forkAndExec` under `ChecksumFs.createInternal`).
  *
  * The fix is to set the bits in-process: `java.nio`'s
  * `setPosixFilePermissions` is a single `fchmodat` syscall. Behavior
  * is otherwise IDENTICAL to the stock LocalFileSystem (checksums,
  * rename semantics, listing) — this changes only how chmod happens,
  * so it is safe to install session-wide via `fs.file.impl`. On a
  * real cluster with libhadoop.so the stock classes never fork and
  * this class is equivalent.
  */
class NoForkRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit =
    try {
      java.nio.file.Files.setPosixFilePermissions(
        pathToFile(p).toPath, NoForkLocalFs.toPosix(permission.toShort))
      ()
    } catch {
      // non-POSIX store or races: fall back to the stock (fork) path
      case _: UnsupportedOperationException | _: SecurityException =>
        super.setPermission(p, permission)
    }
}

/** Drop-in `fs.file.impl`: the stock checksum wrapper over the
  * no-fork raw filesystem. */
class NoForkLocalFileSystem extends LocalFileSystem(new NoForkRawLocalFileSystem)

object NoForkLocalFs {
  import java.nio.file.attribute.PosixFilePermission._
  private val bits = Array(
    OTHERS_EXECUTE, OTHERS_WRITE, OTHERS_READ,
    GROUP_EXECUTE, GROUP_WRITE, GROUP_READ,
    OWNER_EXECUTE, OWNER_WRITE, OWNER_READ)

  def toPosix(mode: Short): java.util.Set[java.nio.file.attribute.PosixFilePermission] = {
    val s = new java.util.HashSet[java.nio.file.attribute.PosixFilePermission]()
    var i = 0
    while (i < 9) {
      if ((mode & (1 << i)) != 0) s.add(bits(i))
      i += 1
    }
    s
  }
}
