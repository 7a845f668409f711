package graft

import graft.ops.{Brotli, DecodeAny, GzipCodec, Pdf, Zip}

/** Sniff-dispatched universal decode: chain composition, the
  * re-sniff loop on nested wrappers, zip member recursion, the
  * depth cap, and the refusal ladder. */
class DecodeAnySpec extends SparkSuite {
  import spark.implicits._

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close(); bos.toByteArray
  }

  private val text = "plain prose payload, long enough to sniff confidently"
  private val tb = text.getBytes("UTF-8")

  test("terminal formats: text, pdf, media, unknown") {
    assert(DecodeAny.decodeOne(tb) == (List("text"), true, Some(text)))
    val (c1, ok1, t1) = DecodeAny.decodeOne(Pdf.pdfOf(text, flate = false))
    assert(c1 == List("pdf") && ok1 && t1.contains(text))
    val png = graft.ops.PngCodec.encode(graft.ops.PngCodec.Image(1, 1, 1, Array(7.toByte)))
    assert(DecodeAny.decodeOne(png) == (List("png"), true, None))
    assert(DecodeAny.decodeOne(Array[Byte](1, 2, 3)) == (List("unknown"), false, None))
    assert(DecodeAny.decodeOne(null) == (List("unknown"), false, None))
  }

  test("wrappers re-sniff and chain; corrupt inner bytes fail at their rung") {
    assert(DecodeAny.decodeOne(gz(tb)) == (List("gzip", "text"), true, Some(text)))
    assert(DecodeAny.decodeOne(gz(gz(tb))) ==
      (List("gzip", "gzip", "text"), true, Some(text)))
    assert(DecodeAny.decodeOne(gz(Pdf.pdfOf(text, flate = true)))._1 ==
      List("gzip", "pdf"))
    // truncated inner gzip: outer decodes, inner refuses mid-chain
    val badInner = gz(tb).dropRight(3)
    val (chain, ok, t) = DecodeAny.decodeOne(gz(badInner))
    assert(chain == List("gzip", "gzip") && !ok && t.isEmpty)
  }

  test("depth cap: wrappers past 4 deep refuse instead of recursing forever") {
    var p = tb
    (0 until 5).foreach(_ => p = gz(p))
    val (chain, ok, _) = DecodeAny.decodeOne(p)
    assert(!ok && chain.length == 4 && chain.forall(_ == "gzip"))
  }

  test("tar: member recursion through the gzip rung (tar.gz, the corpus shipping format)") {
    val tar = graft.ops.Tar.tarOf(Seq(
      "a.txt" -> "alpha member".getBytes("UTF-8"),
      "b/inner.gz" -> gz("beta member".getBytes("UTF-8"))))
    assert(DecodeAny.decodeOne(tar) ==
      (List("tar"), true, Some("alpha member\nbeta member")))
    val (chain, ok, t) = DecodeAny.decodeOne(gz(tar))
    assert(chain == List("gzip", "tar") && ok && t.contains("alpha member\nbeta member"))
  }

  test("zip: member recursion, directory skip, text join in member order") {
    val z = Zip.zipOf(Seq(
      "d/" -> Array.emptyByteArray,
      "a.txt" -> "first member".getBytes("UTF-8"),
      "b.gz" -> gz("second member".getBytes("UTF-8")),
      "img.png" -> graft.ops.PngCodec.encode(graft.ops.PngCodec.Image(1, 1, 1, Array(1.toByte)))))
    val (chain, ok, t) = DecodeAny.decodeOne(z)
    assert(chain == List("zip") && ok)
    assert(t.contains("first member\nsecond member"))
  }

  test("brotli is declared un-sniffable (no magic) — stays on the labeled path") {
    // RFC 7932 streams carry no signature; a random brotli payload
    // must NOT be claimed as any format (the WARC ladder routes br by
    // its Content-Encoding label instead)
    val br = Brotli.encodeFlat(Array.tabulate[Byte](64)(i => (i * 37).toByte))
    val (chain, ok, _) = DecodeAny.decodeOne(br)
    assert(!ok || chain != List("text"), s"brotli misclaimed: $chain")
  }

  test("Spark seam + spec op") {
    import graft.spec._
    val df = Seq((1L, gz(tb)), (2L, tb)).toDF("doc_id", "payload")
    val out = DecodeAny.decode(df, "doc_id", "payload").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    assert(out == Set((1L, "gzip>text", true), (2L, "text", true)))
    val viaOp = graft.transforms.Transforms(df,
      TransformSpec("da", "decode_any", Config.of("id_field" -> "doc_id")), Map.empty)
    assert(viaOp.columns.toSeq == Seq("id", "chain", "ok", "text"))
  }
}
