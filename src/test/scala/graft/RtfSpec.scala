package graft

import graft.ops.Rtf

/** RTF: escapes, unicode fallbacks, destination skipping, codepage
  * rungs, the builder round trip, refusal ladder. */
class RtfSpec extends SparkSuite {
  import spark.implicits._

  private def x(s: String): Option[String] =
    Rtf.extract(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))

  test("plain text, par/tab/line, structural escapes, special-char words") {
    assert(x("{\\rtf1 hello world}").contains("hello world"))
    assert(x("{\\rtf1 a\\par b\\tab c\\line d}").contains("a\nb\tc\nd"))
    assert(x("{\\rtf1 \\{x\\} \\\\y}").contains("{x} \\y"))
    assert(x("{\\rtf1 a\\emdash b\\rquote c}").contains("a\u2014b\u2019c"))
    // raw newlines in the source are NOT text
    assert(x("{\\rtf1 a\r\nb}").contains("ab"))
  }

  test("unicode: \\uN with \\uc fallbacks, negative scalars, surrogate pairs") {
    assert(x("{\\rtf1\\uc1 \\u252?ber}").contains("über"))
    // uc2: two fallback chars skipped
    assert(x("{\\rtf1\\uc2 \\u945ab!}").contains("\u03b1!"))
    // negative = scalar - 65536 (the 16-bit signed convention);
    // the pair (0xD83D, 0xDE00) = U+1F600
    assert(x("{\\rtf1\\uc1 \\u-10179?\\u-8704?}").contains(
      new String(Character.toChars(0x1F600))))
    // \'hh fallbacks also count as ONE skipped char
    assert(x("{\\rtf1\\uc1 \\u252\\'fcx}").contains("üx"))
    // \u-1 is a LEGAL parameter (U+FFFF after the +65536 wrap), not
    // the missing-parameter sentinel; a bare \u with no digits refuses
    assert(x("{\\rtf1\\uc1 \\u-1?x}").contains("\uFFFFx"))
    assert(x("{\\rtf1\\uc1 \\u ab}").isEmpty)
  }

  test("codepage: \\'hh through ansicpg1252 default and 1251; unsupported refuses") {
    assert(x("{\\rtf1 caf\\'e9}").contains("café"))
    assert(x("{\\rtf1\\ansicpg1251 \\'c0\\'c1}").contains("\u0410\u0411"))
    assert(x("{\\rtf1\\ansicpg437 x}").isEmpty)
  }

  test("destinations skip whole: fonttbl, info, {\\*\\...}, nested groups") {
    val doc = "{\\rtf1{\\fonttbl{\\f0 Arial;}}{\\info{\\title secret}}" +
      "{\\*\\generator Acme 1.0;}visible{\\b bold} text}"
    assert(x(doc).contains("visiblebold text"))
  }

  test("\\bin skips raw bytes") {
    val payload = "{\\rtf1 a\\bin4 \u0000\u0001\u0002\u0003b}"
    assert(x(payload).contains("ab"))
  }

  test("refusals: not rtf, unbalanced groups, truncated escapes") {
    assert(x("plain text").isEmpty)
    assert(x("{\\rtf1 unclosed").isEmpty)
    assert(x("{\\rtf1 bad\\'f").isEmpty)
    assert(Rtf.extract(Array.emptyByteArray).isEmpty)
    // fuzz: never throw
    val good = Rtf.build(3L, "héllo wörld\nsecond ligne")
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val m = good.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Rtf.extract(m) // must not throw
    }
  }

  test("builder round trip: both escape rungs, controls, destinations") {
    val texts = Seq(
      "plain ascii",
      "accents: café über naïve",
      "greek α β γ and \u4e2d\u6587",
      "emoji " + new String(Character.toChars(0x1F600)),
      "braces {x} and back\\slash",
      "lines\none\n\ttabbed",
      "ctrl\rchar")
    for (t <- texts; id <- Seq(2L, 3L)) { // even → \uN, odd → \'hh rung
      val got = Rtf.extract(Rtf.build(id, t))
      assert(got.contains(t), s"id=$id text=$t got=$got")
    }
  }

  test("Spark seam + spec op") {
    val df = Seq((1L, "alpha"), (2L, "béta")).toDF("doc_id", "text")
    val packed = Rtf.packTextRtf(df, "doc_id", "text")
    val rows = Rtf.extractText(packed, "id", "payload")
      .select($"id", $"decoded", $"text").as[(Long, Boolean, String)]
      .collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, true, "alpha"), (2L, true, "béta")))
    import graft.spec._
    val viaOp = graft.transforms.Transforms(packed,
      TransformSpec("t", "rtf_extract",
        Config.of("id_field" -> "id", "payload_field" -> "payload")), Map.empty)
    assert(viaOp.count() == 2)
  }
}
