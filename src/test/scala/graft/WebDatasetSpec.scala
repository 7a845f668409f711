package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.ops.{Tar, WebDataset}
import graft.spec.{Config, SourceSpec}
import graft.sources.SourceReader

/** WebDataset convention layer: the first-dot key rule, the
  * streaming adjacency grouping, and the Spark seam over real tar
  * shards. */
class WebDatasetSpec extends SparkSuite {
  import spark.implicits._

  test("splitKey: first dot of the BASENAME, dots in dirs don't split") {
    assert(WebDataset.splitKey("0001.jpg") == Some(("0001", "jpg")))
    assert(WebDataset.splitKey("0001.seg.png") == Some(("0001", "seg.png")))
    assert(WebDataset.splitKey("dir/a.b/0001.txt") == Some(("dir/a.b/0001", "txt")))
    assert(WebDataset.splitKey("dir.v2/0001.meta.json") == Some(("dir.v2/0001", "meta.json")))
    assert(WebDataset.splitKey("noext").isEmpty)
    assert(WebDataset.splitKey(".hidden").isEmpty)  // dotfile: dot at 0
    assert(WebDataset.splitKey("dir/.hidden").isEmpty)
  }

  test("adjacency grouping: contiguous parts join, separated same-key splits, non-files skip") {
    def e(name: String, flag: Char, data: String = "") =
      Tar.Entry(name, flag, data.length.toLong, 420, 0L, "", data.getBytes)
    val entries = Seq(
      e("a.txt", '0', "A"), e("a.json", '0', "{}"),      // sample a, 2 parts
      e("sub/", '5'),                                      // dir: skipped
      e("b.txt", '0', "B"),                                // sample b
      e("a.cls", '0', "9"),                                // NOT adjacent to a: new sample
      e("README", '0', "meta"))                            // extensionless: skipped
    val got = WebDataset.samplesOf(entries).map { case (k, parts) =>
      (k, parts.map { case (p, d) => (p, new String(d, StandardCharsets.UTF_8)) })
    }
    assert(got == Vector(
      ("a", Map("txt" -> "A", "json" -> "{}")),
      ("b", Map("txt" -> "B")),
      ("a", Map("cls" -> "9"))))
  }

  test("Spark seam: packed shards -> samples, malformed shard quarantines") {
    val docs = sf("documents")
    val packed = WebDataset.packDocsWds(docs, "doc_id", "source", "lang", "text", nFiles = 4)
    val samples = WebDataset.samples(packed, "file_id", "payload")
    assert(samples.where($"sample_index" === -1).count() == 0)
    val n = docs.where($"doc_id".isNotNull).count()
    assert(samples.count() == n)
    // every sample has exactly the two convention parts
    assert(samples
      .where(array_join(sort_array(map_keys($"parts")), ",") =!= "meta.json,txt")
      .count() == 0)
    // text bytes replay
    val got = samples.select(
      regexp_extract($"key", "doc(\\d+)", 1).cast("long").as("id"),
      decode(element_at($"parts", "txt"), "UTF-8").as("t"))
      .as[(Long, String)].collect().toMap
    val want = docs.select($"doc_id".cast("long"), coalesce($"text", lit("")))
      .as[(Long, String)].collect().toMap
    assert(got == want)

    // hostile shard: junk bytes quarantine as sample_index = -1
    val bad = Seq((99L, "not a tar at all".getBytes)).toDF("file_id", "payload")
    val q = WebDataset.samples(bad, "file_id", "payload").collect()
    assert(q.length == 1 && q(0).getInt(1) == -1)
  }

  test("webdataset source reads shards from disk") {
    val dir = java.nio.file.Files.createTempDirectory("wds").toFile
    val tar = Tar.tarOf(Seq(
      ("s1.txt", "one".getBytes), ("s1.meta.json", "{\"k\":1}".getBytes),
      ("s2.txt", "two".getBytes)))
    val out = new java.io.FileOutputStream(new java.io.File(dir, "shard-0.tar"))
    try out.write(tar) finally out.close()
    val read = SourceReader.read(spark, SourceSpec("w", "webdataset", Config.of(
      "path" -> s"${dir.getAbsolutePath}/*.tar")))
    val rows = read.orderBy("sample_index")
      .select($"sample_index", $"key", map_keys($"parts"))
      .as[(Int, String, Seq[String])].collect()
    assert(rows.map(r => (r._1, r._2, r._3.sorted)).toSeq ==
      Seq((0, "s1", Seq("meta.json", "txt")), (1, "s2", Seq("txt"))))
  }
}
