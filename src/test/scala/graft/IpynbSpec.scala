package graft

import graft.ops.Ipynb
import org.apache.spark.sql.functions._

/** Jupyter notebook extraction: both source forms, language
  * metadata, nbformat-3 refusal, hand-written real-shape fixture,
  * packer round-trip, and the disk source. */
class IpynbSpec extends SparkSuite {
  import spark.implicits._

  test("real-shape notebook: array and string sources, language, outputs ignored") {
    val nb =
      """{
        | "cells": [
        |  {"cell_type": "markdown", "metadata": {}, "source": ["# Title\n", "intro"]},
        |  {"cell_type": "code", "execution_count": 2, "metadata": {},
        |   "outputs": [{"output_type": "stream", "text": ["noise\n"]}],
        |   "source": ["import os\n", "print(1)"]},
        |  {"cell_type": "code", "metadata": {}, "source": "x = \"quoted\" + 'single'"},
        |  {"cell_type": "raw", "metadata": {}}
        | ],
        | "metadata": {"language_info": {"name": "python", "version": "3.11"}},
        | "nbformat": 4, "nbformat_minor": 5
        |}""".stripMargin
    val (lang, cells) = Ipynb.cells(nb.getBytes("UTF-8")).get
    assert(lang == "python")
    assert(cells == Seq(
      ("markdown", "# Title\nintro"),
      ("code", "import os\nprint(1)"),
      ("code", "x = \"quoted\" + 'single'"),
      ("raw", "")))
  }

  test("refusals: no cells, malformed JSON, non-string source parts") {
    assert(Ipynb.cells("""{"nbformat": 4}""".getBytes("UTF-8")).isEmpty)
    assert(Ipynb.cells("""{"cells": [{"source": ["x"]}]}""".getBytes("UTF-8")).isEmpty) // no cell_type
    assert(Ipynb.cells("""{"cells": [{"cell_type": "code", "source": [1]}]}""".getBytes("UTF-8")).isEmpty)
    assert(Ipynb.cells("not json".getBytes("UTF-8")).isEmpty)
    assert(Ipynb.cells("[1,2]".getBytes("UTF-8")).isEmpty)
    // v3 malformations refuse too: non-array worksheets, bad level
    assert(Ipynb.cells("""{"worksheets": 5, "nbformat": 3}""".getBytes("UTF-8")).isEmpty)
    assert(Ipynb.cells(
      """{"worksheets":[{"cells":[{"cell_type":"heading","level":9,"source":["x"]}]}]}"""
        .getBytes("UTF-8")).isEmpty)
  }

  test("nbformat 3: worksheets concatenate, input->source, heading->markdown, language") {
    // empty worksheets list is a VALID empty v3 notebook now
    assert(Ipynb.cells("""{"worksheets": [], "nbformat": 3}""".getBytes("UTF-8"))
      .contains((null, Seq.empty)))
    val v3 =
      """{"metadata": {"name": "t"}, "nbformat": 3, "nbformat_minor": 0,
        | "worksheets": [
        |  {"cells": [
        |    {"cell_type": "heading", "level": 2, "source": ["Title"]},
        |    {"cell_type": "code", "language": "python",
        |     "input": ["x = 1\n", "y = 2"], "outputs": [], "prompt_number": 3},
        |    {"cell_type": "markdown", "source": ["prose"]}]},
        |  {"cells": [
        |    {"cell_type": "heading", "source": ["Deep"]},
        |    {"cell_type": "raw", "source": ["raw text"]}]}
        | ]}""".stripMargin
    val Some((lang, cs)) = Ipynb.cells(v3.getBytes("UTF-8"))
    assert(lang == "python") // from the first code cell
    assert(cs == Seq(
      ("markdown", "## Title"), // heading level 2
      ("code", "x = 1\ny = 2"), // input joined verbatim
      ("markdown", "prose"),
      ("markdown", "# Deep"), // missing level defaults to 1
      ("raw", "raw text"))) // worksheets concatenated in order
    // notebook-level metadata.language wins over cell language
    val v3b = """{"metadata": {"language": "julia"}, "worksheets":
      |[{"cells": [{"cell_type": "code", "language": "python", "input": "z"}]}]}"""
      .stripMargin
    assert(Ipynb.cells(v3b.getBytes("UTF-8")).contains(("julia", Seq(("code", "z")))))
  }

  test("packer round-trip: alternating types, unicode, quotes, empty text") {
    val docs = Seq((1L, "line \"one\"\nzweite Zeile π\nthird"), (2L, ""))
      .toDF("doc_id", "text")
    val got = Ipynb.decodeCells(Ipynb.packTextIpynb(docs, "doc_id", "text"), "id", "payload")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3), r.getString(4)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      (1L, 0, "code", "python", "line \"one\""),
      (1L, 1, "markdown", "python", "zweite Zeile π"),
      (1L, 2, "code", "python", "third"),
      (2L, 0, "code", "python", "")))
  }

  test("ipynb SOURCE reads from disk; junk quarantines as seq = -1") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ipynb").toFile
    val p = Ipynb.packTextIpynb(Seq((1L, "nb text")).toDF("doc_id", "text"),
      "doc_id", "text").collect()(0).getAs[Array[Byte]](1)
    def put(name: String, b: Array[Byte]): Unit = {
      val out = new java.io.FileOutputStream(new java.io.File(dir, name))
      try out.write(b) finally out.close()
    }
    put("a.ipynb", p); put("bad.ipynb", "{broken".getBytes("UTF-8"))
    val rows = graft.sources.SourceReader.read(spark,
      graft.spec.SourceSpec("t", "ipynb", graft.spec.Config.of(
        "path" -> s"${dir.getAbsolutePath}/*.ipynb")))
      .collect().map(r => (r.getString(0).split("/").last, r.getInt(1),
        Option(r.getString(4)).orNull)).toSet
    assert(rows == Set(("a.ipynb", 0, "nb text"), ("bad.ipynb", -1, null)))
    dir.listFiles.foreach(_.delete()); dir.delete()
  }
}
