package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.expr.{UnicodeNormalize, UnicodeNormalizeKernel}

/** UAX #15 normalization: known vectors per form, the ASCII
  * zero-allocation fast path, idempotence, and the Column surface. */
class UnicodeNormalizeSpec extends SparkSuite {
  import spark.implicits._

  private def k(s: String, form: String): String =
    UnicodeNormalizeKernel.normalize(UTF8String.fromString(s), form).toString

  test("NFC composes combining sequences and singletons") {
    assert(k("Café", "NFC") == "Café")
    assert(k("Å", "NFC") == "Å")
    // the Angstrom SIGN is a canonical singleton -> Å (U+00C5)
    assert(k("Å", "NFC") == "Å")
    // already-NFC text is untouched
    assert(k("Café Å", "NFC") == "Café Å")
  }

  test("NFD decomposes; NFKC/NFKD fold compatibility variants") {
    assert(k("é", "NFD") == "é")
    assert(k("ﬁle ①", "NFKC") == "file 1")
    assert(k("Ｆｕｌｌ", "NFKC") == "Full")
    assert(k("x² ½", "NFKC") == "x2 1⁄2")
    assert(k("㎞ and №", "NFKC") == "km and No")
    // NFKD leaves the fraction decomposed AND splits é
    assert(k("½é", "NFKD") == "1⁄2é")
    // NFC does NOT touch compatibility characters
    assert(k("ﬁ", "NFC") == "ﬁ")
  }

  test("ASCII fast path returns the same object, all forms idempotent") {
    val ascii = UTF8String.fromString("plain ascii only")
    assert(UnicodeNormalizeKernel.normalize(ascii, "NFKC") eq ascii)
    for (f <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val once = k("Café Å ﬁ Ｆ", f)
      assert(k(once, f) == once, f)
    }
  }

  test("Column surface: codegen'd expression, null passthrough, bad form refused") {
    val df = Seq((1L, "Café"), (2L, null)).toDF("id", "t")
    val got = df.select($"id", UnicodeNormalize($"t", "NFC").as("n"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "Café"), (2L, null)))
    intercept[IllegalArgumentException](UnicodeNormalize($"t", "nfc"))
    // spec-op registration: bad form is an analysis error
    val e = intercept[graft.GraftAnalysisException] {
      graft.transforms.Transforms(df,
        graft.spec.TransformSpec("n", "normalize_unicode",
          graft.spec.Config.of("field" -> "t", "form" -> "NFKX")), Map.empty)
    }
    assert(e.getMessage.contains("NFKX"))
  }
}
