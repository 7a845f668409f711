package graft

import java.nio.file.Files

import graft.catalog.{FileMetaStore, MetaStore}
import graft.compile.PipelineCompiler
import graft.run.PipelineRunner
import graft.spec._

/** End-to-end: spec → compile → run → sinks → run registry, mirroring
  * the reference's service tests (test_data_pipeline.py:53-96).
  */
class PipelineSpecE2E extends SparkSuite {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft").toString

  test("inline source -> filter -> json sink, with run stats (ref :72-79)") {
    val out = tmp() + "/out"
    val spec = PipelineSpec(
      name = "inline_filter",
      sources = Seq(SourceSpec("src", "inline", Config.of(
        "data" -> (0 until 10).map(i => Map("v" -> i.toString, "keep" -> (i % 2 == 0).toString))))),
      transforms = Seq(TransformSpec("f", "filter",
        Config.of("field" -> "keep", "op" -> "eq", "value" -> "true"))),
      sinks = Seq(SinkSpec("j", "json", Config.of("path" -> out))))
    val res = PipelineRunner.run(spark, spec)
    assert(res.status == "success")
    assert(res.rowsRead == 10)
    assert(res.rowsWritten == 5)
    assert(spark.read.json(out).count() == 5)
  }

  test("crawl ingest end-to-end: warc.gz files -> html_extract -> fix_encoding -> exact dedup -> parquet") {
    import org.apache.spark.sql.functions._
    // stage a mini crawl: pages with markup + planted mojibake, one
    // duplicated document, sharded into real .warc.gz files on disk
    val crawlDir = new java.io.File(tmp())
    val pages = Seq(
      (0L, "s", "<p>clean alpha</p>"),
      (1L, "s", "<p>" + graft.expr.MojibakeKernel.garble("café beta — fine") + "</p>"),
      (2L, "s", "<p>clean alpha</p>"), // exact dup of 0 after extraction
      (3L, "s", "<div>gamma</div><script>drop()</script>")
    ).toDF("doc_id", "source", "text")
    graft.ops.Warc.packDocsWarcGz(pages, "doc_id", "source", "text", nFiles = 2)
      .collect().foreach { r =>
        val f = new java.io.FileOutputStream(new java.io.File(crawlDir, s"c-${r.getLong(0)}.warc.gz"))
        f.write(r.getAs[Array[Byte]](1)); f.close()
      }
    val out = tmp() + "/corpus"
    val spec = PipelineSpec(
      name = "crawl_ingest",
      sources = Seq(SourceSpec("crawl", "warc", Config.of(
        "path" -> s"${crawlDir.getAbsolutePath}/*.warc.gz"))),
      transforms = Seq(
        TransformSpec("extract", "html_extract", Config.of("field" -> "text", "out_field" -> "clean"), Nil, 0),
        TransformSpec("fix", "fix_encoding", Config.of("field" -> "clean"), Nil, 1),
        // drop the per-doc "Doc N" title line the warc page template
        // plants, so true content duplicates hash together
        TransformSpec("body", "sql", Config.of("query" ->
          "SELECT *, regexp_replace(clean, '^Doc [0-9]+', '') AS body FROM _input"), Nil, 2),
        TransformSpec("dedup", "deduplicate", Config.of("keys" -> Seq("body")), Nil, 3)),
      sinks = Seq(SinkSpec("p", "parquet", Config.of("path" -> out))))
    val res = PipelineRunner.run(spark, spec)
    assert(res.status == "success", res.toString)
    val got = spark.read.parquet(out)
    // the packer's page template wraps each text in Doc headers; the
    // doc body div carries our page, so `clean` contains the
    // extracted page text — markup gone, mojibake repaired, dup gone
    val cleans = got.select("body").as[String].collect()
    assert(cleans.length == 3, cleans.mkString("|")) // 4 pages, one duplicate collapsed
    assert(cleans.exists(_.contains("café beta — fine")))
    assert(cleans.forall(c => !c.contains("<") && !c.contains("drop()")))
  }

  test("warc and tar SINKS write real archives the matching sources read back") {
    val docs = Seq((0L, "alpha text"), (1L, "beta text"), (33L, "gamma text"))
      .toDF("doc_id", "text")
    for (kind <- Seq("warc", "tar")) {
      val dir = tmp() + s"/$kind-out"
      val res = PipelineRunner.run(spark, PipelineSpec(
        name = s"export_$kind",
        sources = Seq(SourceSpec("d", "inline", Config.of("data" ->
          Seq(Map("doc_id" -> 0, "text" -> "alpha text"),
            Map("doc_id" -> 1, "text" -> "beta text"),
            Map("doc_id" -> 33, "text" -> "gamma text"))))),
        transforms = Nil,
        sinks = Seq(SinkSpec("a", kind, Config.of("path" -> dir, "n_files" -> 4)))))
      assert(res.status == "success", res.toString)
      val files = new java.io.File(dir).listFiles()
      assert(files.nonEmpty && files.forall(_.getName.endsWith(s"$kind.gz")))
      val back = graft.sources.SourceReader.read(spark,
        SourceSpec("back", kind, Config.of("path" -> s"$dir/*")))
      val texts = (if (kind == "warc") back.select("text") else back.select("text"))
        .as[String].collect().toSet
      if (kind == "tar") assert(texts == Set("alpha text", "beta text", "gamma text"))
      else assert(texts.exists(_.contains("alpha text")) && back.count() == 3)
    }
  }

  test("source-level where is applied lazily and pushed to the scan") {
    val src = SourceSpec("docs", "parquet", Config.of(
      "path" -> "/root/testdata/sf0.001/documents.parquet", "where" -> "doc_id % 4 = 0"))
    val df = graft.sources.SourceReader.read(spark, src)
    assert(df.select("doc_id").as[Long].collect().forall(_ % 4 == 0))
    // the predicate reaches the parquet reader, not a post-scan filter only
    assert(df.queryExecution.executedPlan.toString.contains("PushedFilters: ["))
  }

  test("csv source types everything as string (reference main.py:118-123)") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(dir, "in.csv"), "name,score\nAlice,90\nBob,80\n")
    val df = graft.sources.SourceReader.read(spark,
      SourceSpec("c", "csv", Config.of("path" -> s"$dir/in.csv")))
    assert(df.schema.fields.forall(_.dataType == org.apache.spark.sql.types.StringType))
    assert(df.count() == 2)
  }

  test("multi-source union + join-against-context (reference main.py:437-443,251-263)") {
    val spec = PipelineSpec(
      name = "join_ctx",
      sources = Seq(
        SourceSpec("orders", "parquet", Config.of("path" -> "/root/testdata/sf0.001/orders.parquet")),
        SourceSpec("customer", "parquet", Config.of("path" -> "/root/testdata/sf0.001/customer.parquet"))),
      transforms = Seq(
        // drop the unioned-in customer rows (no o_orderkey), then join
        TransformSpec("only_orders", "filter", Config.of("field" -> "o_orderkey", "op" -> "notnull"), Nil, 0),
        TransformSpec("j", "join", Config.of(
          "right" -> "customer", "left_key" -> "o_custkey", "right_key" -> "c_custkey",
          "broadcast" -> true), Nil, 1)),
      sinks = Nil)
    val df = PipelineCompiler.compile(spark, spec).df
    assert(df.columns.contains("r_c_name"))
    assert(df.count() == sf("orders").count())
  }

  test("metastore save/load/list + run registry") {
    val store = new FileMetaStore(Files.createTempDirectory("graftmeta"))
    val spec = PipelineSpec("p", "desc",
      Seq(SourceSpec("s", "inline", Config.of("data" -> Seq(Map("x" -> 1))))),
      Nil, Seq(SinkSpec("o", "stdout")))
    val id = store.save(spec)
    assert(store.load(id).name == "p")
    assert(store.list().map(_._1).contains(id))
    val res = PipelineRunner.run(spark, spec, id, Some(store))
    assert(res.status == "success")
    val runs = store.runs(id)
    assert(runs.size == 1 && runs.head.status == "success" && runs.head.rowsRead == 1)
  }

  test("failed run is recorded, not thrown (reference main.py:467-474)") {
    val store = new FileMetaStore(Files.createTempDirectory("graftmeta2"))
    val spec = PipelineSpec("bad", "",
      Seq(SourceSpec("s", "parquet", Config.of("path" -> "/nonexistent/path"))),
      Nil, Seq(SinkSpec("o", "stdout")))
    val res = PipelineRunner.run(spark, spec, "badid", Some(store))
    assert(res.status == "failed")
    assert(res.error.isDefined)
    assert(store.runs("badid").head.status == "failed")
  }

  test("validation rejects bad specs at compile time (SURVEY §3.3)") {
    val bad = PipelineSpec("b", "",
      Seq(SourceSpec("s", "inline", Config.of("data" -> Seq(Map("x" -> 1))))),
      Seq(TransformSpec("j", "join", Config.of("right" -> "ghost")),
        TransformSpec("c", "contamination",
          Config.of("against" -> "phantom", "id_field" -> "doc_id"))),
      Seq(SinkSpec("o", "teleport")))
    val e = intercept[GraftAnalysisException](PipelineCompiler.validate(bad))
    assert(e.getMessage.contains("ghost"))
    assert(e.getMessage.contains("teleport"))
    assert(e.getMessage.contains("phantom")) // dangling contamination target, same contract as join
  }

  test("validate report: reference shape on empty, mixed-type, csv, and broken sources") {
    import graft.run.SchemaValidate
    val dir = tmp()

    // empty dataset → the reference's exact empty shape (main.py:488)
    Files.writeString(java.nio.file.Paths.get(dir, "empty.json"), "[]")
    assert(SchemaValidate.report(spark,
      SourceSpec("e", "json", Config.of("path" -> s"$dir/empty.json")))
      == """{"valid": true, "schema": {}, "rows": 0, "warning": "Empty dataset"}""")

    // mixed-type json: per-field UNION of observed row types, not the
    // engine's coerced column type; ragged keys observed only where present
    Files.writeString(java.nio.file.Paths.get(dir, "mixed.json"),
      """[{"a": 1, "b": "x", "c": true},
         |{"a": "one", "b": null, "d": [1]},
         |{"a": 2.5, "b": "y"}]""".stripMargin)
    assert(SchemaValidate.report(spark,
      SourceSpec("m", "json", Config.of("path" -> s"$dir/mixed.json")))
      == """{"valid": true, "rows": 3, "schema": {"a": ["float", "int", "str"], """ +
        """"b": ["NoneType", "str"], "c": ["bool"], "d": ["list"]}""" + "}")

    // jsonl mode observes types line-by-line (distributed path)
    Files.writeString(java.nio.file.Paths.get(dir, "rows.jsonl"),
      "{\"v\": 1}\n{\"v\": \"two\"}\n")
    assert(SchemaValidate.report(spark,
      SourceSpec("l", "json", Config.of("path" -> s"$dir/rows.jsonl", "lines" -> true)))
      == """{"valid": true, "rows": 2, "schema": {"v": ["int", "str"]}}""")

    // csv: DictReader parity — every present cell is a str, missing
    // cells observe NoneType
    Files.writeString(java.nio.file.Paths.get(dir, "in.csv"), "name,score\nAlice,90\nBob,\n")
    assert(SchemaValidate.report(spark,
      SourceSpec("c", "csv", Config.of("path" -> s"$dir/in.csv")))
      == """{"valid": true, "rows": 2, "schema": {"name": ["str"], "score": ["NoneType", "str"]}}""")

    // inline mixed rows through the same reporter
    val inline = SourceSpec("i", "inline", Config.of("data" -> Seq(
      Map("k" -> 1), Map("k" -> "one", "extra" -> 2))))
    assert(SchemaValidate.report(spark, inline)
      == """{"valid": true, "rows": 2, "schema": {"extra": ["int"], "k": ["int", "str"]}}""")

    // unreadable source → valid: false + error (reference main.py:485-486)
    val bad = SchemaValidate.report(spark,
      SourceSpec("x", "csv", Config.of("path" -> s"$dir/nope.csv")))
    assert(bad.startsWith("""{"valid": false, "error": """))
  }

  test("capstone: LLM training-data curation pipeline end to end (profile → quality filter → dedup → split)") {
    val out = tmp() + "/curated"
    val spec = PipelineSpec(
      name = "curate",
      sources = Seq(SourceSpec("docs", "parquet",
        Config.of("path" -> "/root/testdata/sf0.001/documents.parquet"))),
      transforms = Seq(
        TransformSpec("p", "text_profile", Config.of(), Nil, 0),
        TransformSpec("q", "filter",
          Config.of("field" -> "token_count", "op" -> "ge", "value" -> 20), Nil, 1),
        TransformSpec("d", "dedup_exact",
          Config.of("text_field" -> "text", "tie_break" -> "doc_id"), Nil, 2),
        TransformSpec("s", "split",
          Config.of("key" -> "doc_id", "mod" -> 100, "train_below" -> 80, "val_below" -> 90), Nil, 3)),
      sinks = Seq(SinkSpec("out", "parquet",
        Config.of("path" -> out, "partition_by" -> Seq("split")))))
    val res = PipelineRunner.run(spark, spec)
    assert(res.status == "success")
    val curated = spark.read.parquet(out)
    val n = curated.count()
    assert(n > 0 && n <= res.rowsRead)
    // quality gate applied
    assert(curated.agg(org.apache.spark.sql.functions.min($"token_count")).as[Long].head() >= 20)
    // content-exact dedup: every fingerprint unique after curation
    assert(curated.groupBy("fingerprint").count()
      .agg(org.apache.spark.sql.functions.max($"count")).as[Long].head() == 1L)
    // split is exhaustive, deterministic, and roughly proportioned
    val splits = curated.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(splits.keySet.subsetOf(Set("train", "val", "test")))
    assert(splits.getOrElse("train", 0L) > splits.getOrElse("test", 0L))
    // partition pruning works on the sink layout
    assert(spark.read.parquet(out).where($"split" === "train").count() == splits("train"))

    // audit pipeline: eval slice vs training corpus, contamination report
    val planted = Seq(
      Map("doc_id" -> 9001, "text" -> "the quick brown fox jumps over the lazy dog today"),
      Map("doc_id" -> 9002, "text" -> "an entirely novel evaluation prompt nothing shares"))
    val auditOut = tmp() + "/audit"
    val audit = PipelineSpec(
      name = "audit",
      sources = Seq(
        SourceSpec("eval", "inline", Config.of("data" -> planted)),
        SourceSpec("train", "inline", Config.of("data" -> Seq(
          Map("doc_id" -> 1, "text" -> "the quick brown fox jumps over the lazy dog today"),
          Map("doc_id" -> 2, "text" -> "unrelated training material about oceans"))))),
      transforms = Seq(
        // all sources union into the main stream (reference main.py:437-443):
        // restrict it to the eval slice before the cross check
        TransformSpec("only_eval", "filter",
          Config.of("field" -> "doc_id", "op" -> "ge", "value" -> 9000), Nil, 0),
        TransformSpec("c", "contamination",
          Config.of("against" -> "train", "id_field" -> "doc_id", "threshold" -> 0.5), Nil, 1)),
      sinks = Seq(SinkSpec("j", "json", Config.of("path" -> auditOut))))
    val ares = PipelineRunner.run(spark, audit)
    assert(ares.status == "success", ares.error)
    val leaks = spark.read.json(auditOut)
    assert(leaks.count() == 1)
    assert(leaks.select("left_id").as[Long].head() == 9001L)
    assert(leaks.select("jaccard").as[Double].head() == 1.0)
  }

  test("round-6 spec ops: ngram decontamination, quality signals, ppx, pca, clustered sink") {
    // decontamination: train stream vs benchmark source, exact 3-grams
    val decon = PipelineSpec(
      name = "decon",
      sources = Seq(
        SourceSpec("train", "inline", Config.of("data" -> Seq(
          Map("doc_id" -> 1, "text" -> "alpha beta gamma delta epsilon"),
          Map("doc_id" -> 2, "text" -> "one two three four five")))),
        SourceSpec("bench", "inline", Config.of("data" -> Seq(
          Map("doc_id" -> 90, "text" -> "zz alpha beta gamma yy"))))),
      transforms = Seq(
        TransformSpec("only_train", "filter",
          Config.of("field" -> "doc_id", "op" -> "lt", "value" -> 10), Nil, 0),
        TransformSpec("c", "contamination_ngram",
          Config.of("against" -> "bench", "id_field" -> "doc_id", "n" -> 3), Nil, 1)),
      sinks = Seq(SinkSpec("out", "stdout")))
    val flagged = PipelineCompiler.compile(spark, decon).df
      .where($"contaminated").select("doc_id").as[Long].collect().toSet
    assert(flagged == Set(1L))
    // unknown `against` is a compile-time error
    assertThrows[GraftAnalysisException](PipelineCompiler.validate(decon.copy(
      transforms = decon.transforms.map(t =>
        if (t.name == "c") t.copy(config = Config.of("against" -> "nope", "id_field" -> "doc_id"))
        else t))))

    // quality signals + ppx in one chain over a single source
    val q = PipelineSpec(
      name = "quality",
      sources = Seq(SourceSpec("docs", "inline", Config.of("data" -> Seq(
        Map("doc_id" -> 1, "text" -> "spam spam spam spam"),
        Map("doc_id" -> 2, "text" -> "assorted words differ here"))))),
      transforms = Seq(
        TransformSpec("r", "text_repetition", Config.of(), Nil, 0),
        TransformSpec("p", "text_unigram_ppx", Config.of("id_field" -> "doc_id"), Nil, 1)),
      sinks = Seq(SinkSpec("out", "stdout")))
    val scored = PipelineCompiler.compile(spark, q).df
    assert(scored.columns.toSet == Set("doc_id", "n_tokens", "avg_nll"))
    assert(scored.count() == 2)

    // pca_whiten: dim required, appends the projection column
    val vecs = (0 until 20).map(i => Map("vec_id" -> i,
      "embedding" -> Seq(i.toDouble, 2.0 * i, i.toDouble + 1)))
    val pca = PipelineSpec(
      name = "pca",
      sources = Seq(SourceSpec("e", "inline", Config.of("data" -> vecs))),
      transforms = Seq(TransformSpec("w", "pca_whiten",
        Config.of("dim" -> 3, "k" -> 2), Nil, 0)),
      sinks = Seq(SinkSpec("out", "stdout")))
    val projected = PipelineCompiler.compile(spark, pca).df
    assert(projected.select("pca").head().getSeq[Double](0).length == 2)
    assertThrows[GraftAnalysisException](
      graft.transforms.Transforms(PipelineCompiler.compile(spark, pca).ctx("e"),
        TransformSpec("w", "pca_whiten", Config.of(), Nil, 0), Map.empty))

    // clustered parquet sink via spec
    val out = tmp() + "/clustered"
    val lay = PipelineSpec(
      name = "layout",
      sources = Seq(SourceSpec("e", "inline", Config.of("data" -> vecs.map(m =>
        Map("vec_id" -> m("vec_id")))))),
      transforms = Nil,
      sinks = Seq(SinkSpec("p", "parquet", Config.of(
        "path" -> out, "cluster_by" -> Seq("vec_id"), "num_files" -> 4))))
    assert(PipelineRunner.run(spark, lay).status == "success")
    val ranges = graft.ops.Layout.fileKeyRanges(spark, out, "vec_id")
      .orderBy("min_key").collect()
    assert(ranges.length > 1)
    ranges.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("max_key") <= b.getAs[Long]("min_key"))
    }
  }

  test("text source/sink: line roundtrip, whole-file mode, single-column contract") {
    import graft.sinks.SinkWriter
    import graft.sources.SourceReader
    val dir = tmp() + "/t"
    SinkWriter.write(Seq("alpha", "beta").toDF("value"),
      SinkSpec("t", "text", Config.of("path" -> dir)))
    val back = SourceReader.read(spark, SourceSpec("t", "text", Config.of("path" -> dir)))
    assert(back.as[String].collect().sorted.toSeq == Seq("alpha", "beta"))
    val whole = SourceReader.read(spark, SourceSpec("t", "text",
      Config.of("path" -> dir, "whole_file" -> true, "with_path" -> true)))
    assert(whole.columns.toSet == Set("value", "path"))
    assert(whole.count() >= 1) // one row per file
    // exactly one string column, or it's an analysis error
    assertThrows[GraftAnalysisException](SinkWriter.write(
      Seq((1, "x")).toDF("a", "b"),
      SinkSpec("t2", "text", Config.of("path" -> (tmp() + "/u")))))
  }

  test("compressed corpus roundtrip: gzip text and zstd parquet read back transparently") {
    import graft.sinks.SinkWriter
    import graft.sources.SourceReader
    // LLM corpora arrive as .jsonl.gz / .zst — the codec passthrough
    // on sinks plus Spark's transparent codec handling on sources
    // must round-trip without any spec change on the read side
    val dir = java.nio.file.Files.createTempDirectory("graftgz").toString
    val lines = Seq("alpha doc", "beta doc", "gamma doc").toDF("value")
    SinkWriter.write(lines, SinkSpec("out", "text",
      Config.of("path" -> s"$dir/txt", "compression" -> "gzip")))
    assert(new java.io.File(s"$dir/txt").listFiles().exists(_.getName.endsWith(".txt.gz")))
    val back = SourceReader.read(spark, SourceSpec("in", "text",
      Config.of("path" -> s"$dir/txt")))
    assert(back.as[String].collect().toSet == Set("alpha doc", "beta doc", "gamma doc"))

    val docs = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    SinkWriter.write(docs, SinkSpec("out", "parquet",
      Config.of("path" -> s"$dir/pq", "compression" -> "zstd")))
    assert(new java.io.File(s"$dir/pq").listFiles().exists(_.getName.contains(".zstd.")))
    val backPq = SourceReader.read(spark, SourceSpec("in", "parquet",
      Config.of("path" -> s"$dir/pq")))
    assert(backPq.orderBy("doc_id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "x"), (2L, "y")))
  }

  test("per-stage observed rows land in the run result and the run registry") {
    val store = new graft.catalog.FileMetaStore(java.nio.file.Paths.get(tmp()))
    val spec = PipelineSpec(
      name = "staged",
      sources = Seq(SourceSpec("s", "inline", Config.of("data" ->
        (1 to 10).map(i => Map("x" -> i))))),
      transforms = Seq(
        TransformSpec("keep_big", "filter",
          Config.of("field" -> "x", "op" -> "gt", "value" -> 4), Nil, 0),
        TransformSpec("top3", "limit", Config.of("n" -> 3), Nil, 1)),
      sinks = Seq(SinkSpec("out", "json", Config.of("path" -> (tmp() + "/o")))))
    val res = PipelineRunner.run(spark, spec, "pid-1", Some(store))
    assert(res.status == "success")
    assert(res.stageRows == Map("keep_big" -> 6L, "top3" -> 3L))
    val recorded = store.runs("pid-1").head
    assert(recorded.stageRows == Map("keep_big" -> 6L, "top3" -> 3L))
  }

  test("near-dup index lifecycle through pipelines: build sink, then check transform") {
    val ixPath = tmp() + "/ndix"
    val corpusRows = Seq(
      Map("doc_id" -> 1, "text" -> "the quick brown fox jumps over the lazy dog today"),
      Map("doc_id" -> 2, "text" -> "completely different content about spark engines here"))
    val build = PipelineSpec(
      name = "ingest",
      sources = Seq(SourceSpec("corpus", "inline", Config.of("data" -> corpusRows))),
      transforms = Nil,
      sinks = Seq(SinkSpec("ix", "neardup_index",
        Config.of("path" -> ixPath, "id_field" -> "doc_id"))))
    assert(PipelineRunner.run(spark, build).status == "success")

    val check = PipelineSpec(
      name = "batch_check",
      sources = Seq(
        SourceSpec("batch", "inline", Config.of("data" -> Seq(
          Map("doc_id" -> 10, "text" -> "the quick brown fox jumps over the lazy dog today"),
          Map("doc_id" -> 11, "text" -> "entirely novel ingest content matching nothing")))),
        SourceSpec("corpus", "inline", Config.of("data" -> corpusRows))),
      transforms = Seq(
        TransformSpec("only_batch", "filter",
          Config.of("field" -> "doc_id", "op" -> "ge", "value" -> 10), Nil, 0),
        TransformSpec("c", "dedup_index_check", Config.of(
          "against" -> "corpus", "index_path" -> ixPath, "id_field" -> "doc_id",
          "threshold" -> 0.5), Nil, 1)),
      sinks = Seq(SinkSpec("out", "stdout")))
    val pairs = PipelineCompiler.compile(spark, check).df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq((10L, 1L, 1.0))) // exact dup found via the stored index
  }

  test("flagship entry returns rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSet == Set("l_returnflag", "cnt", "sum_price"))
  }
}
