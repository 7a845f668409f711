package graft

import graft.ops.Cbor
import graft.ops.Cbor._

/** CBOR decoder pinned against the RFC 8949 Appendix A example
  * table, plus the refusal ladder and the encoder round trip. */
class CborSpec extends SparkSuite {
  import spark.implicits._

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("RFC 8949 Appendix A vectors: integers, strings, containers") {
    assert(Cbor.decode(hex("00")) == Some(CInt(0)))
    assert(Cbor.decode(hex("17")) == Some(CInt(23)))
    assert(Cbor.decode(hex("1818")) == Some(CInt(24)))
    assert(Cbor.decode(hex("1a000f4240")) == Some(CInt(1000000)))
    assert(Cbor.decode(hex("1b000000e8d4a51000")) == Some(CInt(1000000000000L)))
    assert(Cbor.decode(hex("20")) == Some(CInt(-1)))
    assert(Cbor.decode(hex("3903e7")) == Some(CInt(-1000)))
    // 18446744073709551615 (uint64 max) -> CBig
    assert(Cbor.decode(hex("1bffffffffffffffff")) ==
      Some(CBig(neg = false, BigInt("18446744073709551615"))))
    assert(Cbor.decode(hex("6449455446")) == Some(CText("IETF")))
    assert(Cbor.decode(hex("4401020304")).get.asInstanceOf[CBytes].v.toSeq ==
      Seq[Byte](1, 2, 3, 4))
    assert(Cbor.decode(hex("8301820203820405")) ==
      Some(CArray(Vector(CInt(1), CArray(Vector(CInt(2), CInt(3))),
        CArray(Vector(CInt(4), CInt(5)))))))
    assert(Cbor.decode(hex("a26161016162820203")) ==
      Some(CMap(Vector(CText("a") -> CInt(1),
        CText("b") -> CArray(Vector(CInt(2), CInt(3)))))))
    // indefinite text "strea" + "ming"
    assert(Cbor.decode(hex("7f657374726561646d696e67ff")) == Some(CText("streaming")))
    // indefinite array [_ 1, [2, 3]]
    assert(Cbor.decode(hex("9f01820203ff")) ==
      Some(CArray(Vector(CInt(1), CArray(Vector(CInt(2), CInt(3)))))))
  }

  test("RFC 8949 Appendix A vectors: floats, simples, tags") {
    assert(Cbor.decode(hex("f90001")) ==
      Some(CFloat(16, 5.960464477539063e-8)))
    assert(Cbor.decode(hex("f93c00")) == Some(CFloat(16, 1.0)))
    assert(Cbor.decode(hex("f97bff")) == Some(CFloat(16, 65504.0)))
    assert(Cbor.decode(hex("f9c400")) == Some(CFloat(16, -4.0)))
    assert(Cbor.decode(hex("fa47c35000")) == Some(CFloat(32, 100000.0)))
    assert(Cbor.decode(hex("fb3ff199999999999a")) == Some(CFloat(64, 1.1)))
    assert(Cbor.decode(hex("f4")) == Some(CSimple("false")))
    assert(Cbor.decode(hex("f5")) == Some(CSimple("true")))
    assert(Cbor.decode(hex("f6")) == Some(CSimple("null")))
    assert(Cbor.decode(hex("f7")) == Some(CSimple("undefined")))
    // tag 1 (epoch) around 1363896240
    assert(Cbor.decode(hex("c11a514b67b0")) == Some(CTag(1, CInt(1363896240))))
  }

  test("refusal ladder: reserved info, truncation, stray break, bad UTF-8, trailing bytes") {
    assert(Cbor.decode(hex("1c")).isEmpty)      // reserved additional info
    assert(Cbor.decode(hex("1a0001")).isEmpty)  // truncated length
    assert(Cbor.decode(hex("ff")).isEmpty)      // stray break
    assert(Cbor.decode(hex("62c328")).isEmpty)  // invalid UTF-8 in text
    assert(Cbor.decode(hex("0001")).isEmpty)    // trailing bytes
    assert(Cbor.decode(hex("9f01")).isEmpty)    // unterminated indefinite array
    assert(Cbor.decode(hex("7f4161ff")).isEmpty) // bytes chunk inside indefinite TEXT
    assert(Cbor.decode(Array.emptyByteArray).isEmpty)
    val rnd = new scala.util.Random(9)
    (1 to 300).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(48)); rnd.nextBytes(b)
      Cbor.decode(b) // never throws
    }
  }

  test("encoder round trip + exact half encoding + packer seam") {
    assert(Cbor.doubleToHalfExact(1.5) == 0x3E00)
    assert(Cbor.doubleToHalfExact(1.0) == 0x3C00)
    assert(Cbor.doubleToHalfExact(-4.0) == 0xC400)
    intercept[IllegalArgumentException](Cbor.doubleToHalfExact(1.1))
    val doc = CMap(Vector(CText("k") -> CArray(Vector(CInt(7), CText("hello world")))))
    for (ind <- Seq(false, true))
      assert(Cbor.decode(Cbor.encode(doc, ind, ind)) == Some(doc))
    // packer docs decode and flatten over the corpus
    val packed = Cbor.packDocsCbor(sf("documents"), "doc_id")
    val rows = Cbor.rows(packed, "doc_id", "payload")
    assert(rows.where($"kind".isNull).count() == 0)
    val one = rows.where($"id" === 7L).select($"path", $"kind", $"value")
      .as[(String, String, String)].collect().toSeq
    assert(one.contains(("$.i", "uint", "7")))
    assert(one.contains(("$.t", "text", "doc7")))   // id 7: indefinite path
    assert(one.contains(("$.g", "tag", "42")))
    assert(one.contains(("$.g!", "text", "t7")))
  }
}
