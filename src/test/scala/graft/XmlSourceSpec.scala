package graft

import graft.spec.{Config, SourceSpec}
import org.apache.spark.sql.functions._

/** The `xml` SOURCE: record-per-element reads with an explicit
  * all-string config schema — nesting, namespace prefixes, missing
  * fields, entity round-trips, malformed-file quarantine, and the
  * config refusal ladder. */
class XmlSourceSpec extends SparkSuite {
  import spark.implicits._

  private def readXml(dir: String, tag: String = "doc",
      fields: Seq[String] = Seq("id", "name")) =
    graft.sources.SourceReader.read(spark, SourceSpec("t", "xml",
      Config.of("path" -> dir, "record_tag" -> tag, "fields" -> fields)))

  private def write(dir: java.io.File, name: String, content: String): Unit = {
    val out = new java.io.FileOutputStream(new java.io.File(dir, name))
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  test("records at any depth, prefixed names, missing fields null, entities") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xmlsrc-spec").toFile
    write(dir, "a.xml",
      """<?xml version="1.0"?>
        |<catalog><group>
        |  <doc><id>1</id><name>alpha &amp; beta</name></doc>
        |</group>
        |<ns:doc xmlns:ns="u"><ns:id>2</ns:id></ns:doc>
        |</catalog>""".stripMargin)
    val rows = readXml(s"${dir.getAbsolutePath}/*.xml")
      .select("seq", "id", "name").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(rows.toSeq == Seq((0, "1", "alpha & beta"), (1, "2", null)))
    dir.listFiles.foreach(_.delete()); dir.delete()
  }

  test("malformed file quarantines as seq = -1; good files still read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xmlsrc-bad").toFile
    write(dir, "good.xml", "<r><doc><id>7</id></doc></r>")
    write(dir, "bad.xml", "<r><doc><id>8</id></r></doc>")
    val rows = readXml(s"${dir.getAbsolutePath}/*.xml", fields = Seq("id"))
      .select("path", "seq", "id").collect()
      .map(r => (r.getString(0).split("/").last, r.getInt(1), r.getString(2))).toSet
    assert(rows == Set(("good.xml", 0, "7"), ("bad.xml", -1, null)))
    dir.listFiles.foreach(_.delete()); dir.delete()
  }

  test("config refusals: empty fields, shadowed columns") {
    intercept[GraftAnalysisException](readXml("/tmp/none", fields = Seq.empty))
    intercept[GraftAnalysisException](readXml("/tmp/none", fields = Seq("path")))
  }
}
