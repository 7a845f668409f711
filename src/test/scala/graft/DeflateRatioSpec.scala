package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.expr.DeflateRatioKernel
import graft.ops.TextAnalysis

/** Compression-ratio signal: determinism, bounds, the entropy
  * ordering, the empty convention, and the Column surface. */
class DeflateRatioSpec extends SparkSuite {
  import spark.implicits._

  private def r(s: String): Double = DeflateRatioKernel.ratio(UTF8String.fromString(s))

  test("deterministic, bounded, empty = 1.0") {
    val s = "some prose with enough length to compress " * 5
    assert(r(s) == r(s)) // bit-identical across calls
    assert(r(s) > 0.0 && r(s) < 1.0)
    assert(r("") == 1.0)
    // a short string can EXCEED 1.0 (header overhead) — that's the
    // honest signal, not an error
    assert(r("ab") > 0.5)
  }

  test("entropy ordering: repetitive < prose < printable noise") {
    val repetitive = "spam " * 200
    val prose = "The quick brown fox jumps over the lazy dog and keeps going. " * 16
    val noise = {
      val b = new StringBuilder
      var st = 12345L
      (1 to 1000).foreach { _ =>
        st ^= st << 13; st ^= st >>> 7; st ^= st << 17
        b.append((33 + java.lang.Math.floorMod(st, 94L)).toChar)
      }
      b.toString
    }
    assert(r(repetitive) < 0.1, s"repetitive=${r(repetitive)}")
    assert(r(prose) < r(noise))
    assert(r(repetitive) < r(prose))
    assert(r(noise) > 0.6, s"noise=${r(noise)}")
  }

  test("Column surface + spec op: null passthrough, configured fields") {
    val df = Seq((1L, "xyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxy"), (2L, null)).toDF("id", "t")
    val got = df.select($"id", TextAnalysis.compressionRatio($"t").as("r"))
      .as[(Long, Option[Double])].collect().sortBy(_._1)
    assert(got(0)._2.exists(v => v > 0 && v < 1) && got(1)._2.isEmpty)
    val viaOp = graft.transforms.Transforms(df,
      graft.spec.TransformSpec("c", "compression_ratio",
        graft.spec.Config.of("field" -> "t", "out_field" -> "cr")), Map.empty)
    assert(viaOp.columns.contains("cr"))
  }
}
