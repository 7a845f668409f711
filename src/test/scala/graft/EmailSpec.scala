package graft

import graft.ops.Email
import org.apache.spark.sql.functions._

/** Email/mbox: quoted-printable, RFC 2047 encoded-words (B+Q,
  * adjacency rule), header unfolding, multipart walk with part
  * preference, mboxrd quoting, transfer-encoding refusals, and the
  * packer round-trip + disk source. */
class EmailSpec extends SparkSuite {
  import spark.implicits._

  private def qp(s: String) = new String(
    Email.decodeQuotedPrintable(s.getBytes("ISO-8859-1")), "ISO-8859-1")

  test("quoted-printable: hex escapes, soft breaks, lenient stray '='") {
    assert(qp("a=20b") == "a b")
    assert(qp("caf=C3=A9") == "cafÃ©") // raw bytes; charset applies later
    assert(qp("long=\nline") == "longline")      // soft break LF
    assert(qp("long=\r\nline") == "longline")    // soft break CRLF
    assert(qp("odd = sign") == "odd = sign")     // lenient
  }

  test("RFC 2047: B and Q forms, charset, adjacency whitespace removal") {
    assert(Email.decodeEncodedWords("=?utf-8?B?U8O8YmplY3Q=?=") == "Sübject")
    assert(Email.decodeEncodedWords("=?utf-8?Q?S=C3=BCbject_1?=") == "Sübject 1")
    assert(Email.decodeEncodedWords("=?iso-8859-1?Q?caf=E9?=") == "café")
    // whitespace between ADJACENT encoded words vanishes; around text stays
    assert(Email.decodeEncodedWords("=?utf-8?Q?a?= =?utf-8?Q?b?=") == "ab")
    assert(Email.decodeEncodedWords("x =?utf-8?Q?a?= y") == "x a y")
    assert(Email.decodeEncodedWords("plain header") == "plain header")
  }

  test("message parse: folded headers, multipart plain-over-html, html fallback") {
    val msg =
      ("Subject: folded\r\n over two lines\r\n" +
        "Content-Type: multipart/alternative;\r\n boundary=\"bb\"\r\n" +
        "\r\npreamble\r\n--bb\r\n" +
        "Content-Type: text/html\r\n\r\n<p>rich</p>\r\n" +
        "--bb\r\nContent-Type: text/plain\r\n\r\nplain wins\r\n" +
        "--bb--\r\nepilogue").getBytes("UTF-8")
    val m = Email.parseMessage(msg).get
    assert(m.subject == "folded over two lines")
    assert(m.text == "plain wins" && !m.bodyIsHtml)
    val htmlOnly =
      ("Content-Type: multipart/mixed; boundary=bb\r\n\r\n" +
        "--bb\r\nContent-Type: text/html\r\n\r\n<p>only</p>\r\n--bb--\r\n").getBytes("UTF-8")
    val h = Email.parseMessage(htmlOnly).get
    assert(h.bodyIsHtml && h.text == "<p>only</p>")
  }

  test("refusals: unknown transfer encoding, missing boundary, bad base64") {
    assert(Email.parseMessage(
      "Content-Transfer-Encoding: uuencode\r\n\r\nbody".getBytes("UTF-8")).isEmpty)
    assert(Email.parseMessage(
      "Content-Type: multipart/mixed\r\n\r\nbody".getBytes("UTF-8")).isEmpty)
    assert(Email.parseMessage(
      "Content-Transfer-Encoding: base64\r\n\r\n!!!not-base64!!!".getBytes("UTF-8")).isEmpty)
  }

  test("mboxrd: splitting, From-quoting, separator blank line is framing") {
    val mbox =
      ("From a@b Thu Jan  1 00:00:00 2026\n" +
        "Subject: one\n\nbody line\n>From quoted here\n>>From deeper\n\n" +
        "From c@d Thu Jan  1 00:00:00 2026\n" +
        "Subject: two\n\nsecond\n\n").getBytes("UTF-8")
    val msgs = Email.splitMboxPublic(mbox)
    assert(msgs.size == 2)
    val m1 = Email.parseMessage(msgs(0)).get
    assert(m1.subject == "one")
    assert(m1.text == "body line\nFrom quoted here\n>From deeper")
    assert(Email.parseMessage(msgs(1)).get.text == "second")
  }

  test("packer round-trip: all body encodings, From-lines in text, empty text") {
    val docs = Seq(
      (0L, "From the start\nplain body"), // id%5==0 → multipart; From-quote path
      (1L, "base64 body π"),
      (2L, "seven bit\nwith lines"),
      (3L, "qp body = tricky"),
      (6L, "")).toDF("doc_id", "text")
    val got = Email.messages(
      Email.packDocsMbox(docs, "doc_id", "text"), "file_id", "payload")
      .select(regexp_extract(col("message_id"), "m(\\d+)@", 1).cast("long"),
        col("subject"), col("text"), col("body_is_html"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getBoolean(3)))).toMap
    assert(got(0L) == (("Subject 0", "From the start\nplain body", false)))
    assert(got(1L) == (("Sübject 1", "base64 body π", false)))
    assert(got(2L) == (("Sübject 2", "seven bit\nwith lines", false)))
    assert(got(3L) == (("Plain subject 3", "qp body = tricky", false)))
    assert(got(6L) == (("Sübject 6", "", false))) // 6 % 4 = 2 → Q form
  }

  test("mbox SOURCE reads from disk") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mbox").toFile
    val p = Email.packDocsMbox(Seq((1L, "disk message")).toDF("doc_id", "text"),
      "doc_id", "text", nFiles = 1).collect()(0).getAs[Array[Byte]](1)
    val out = new java.io.FileOutputStream(new java.io.File(dir, "a.mbox"))
    try out.write(p) finally out.close()
    val read = graft.sources.SourceReader.read(spark,
      graft.spec.SourceSpec("t", "mbox", graft.spec.Config.of(
        "path" -> s"${dir.getAbsolutePath}/*.mbox")))
      .select("text").as[String].head()
    assert(read == "disk message")
    dir.listFiles.foreach(_.delete()); dir.delete()
  }
}
