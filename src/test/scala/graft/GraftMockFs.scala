package graft

/** A registered-but-not-`file:` Hadoop filesystem backed by the local
  * disk: `graftmock:/x/y` serves the bytes of local `/x/y`. Existing
  * purely to prove the table-format metadata layer goes through
  * `org.apache.hadoop.fs.FileSystem` (TableIo) rather than
  * `java.io.File` — a `java.io.File("graftmock:/…")` walk can only
  * see an empty directory, so any surface that still bypasses the
  * seam fails loudly under this scheme. */
class GraftMockFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftmock"
  override def getUri: java.net.URI = java.net.URI.create("graftmock:///")
}
