package graft.catalog

/** Test access to the package-private CREATE TABLE parser. */
object SqliteDataTestBridge {
  def colNames(sql: String): Seq[String] = SqliteData.columnNames(sql)
}
