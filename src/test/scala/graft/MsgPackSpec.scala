package graft

import graft.ops.MsgPack
import graft.ops.MsgPack._

/** MessagePack decoder against the spec's canonical encodings, the
  * refusal ladder, and the encoder round trip. */
class MsgPackSpec extends SparkSuite {
  import spark.implicits._

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("canonical encodings decode: fix forms, sized widths, floats") {
    assert(MsgPack.decode(hex("07")) == Some(MInt(7)))
    assert(MsgPack.decode(hex("ff")) == Some(MInt(-1)))
    assert(MsgPack.decode(hex("e0")) == Some(MInt(-32)))
    assert(MsgPack.decode(hex("cc80")) == Some(MInt(128)))
    assert(MsgPack.decode(hex("cd0100")) == Some(MInt(256)))
    assert(MsgPack.decode(hex("ce00010000")) == Some(MInt(65536)))
    assert(MsgPack.decode(hex("cf7fffffffffffffff")) == Some(MInt(Long.MaxValue)))
    assert(MsgPack.decode(hex("cfffffffffffffffff")) ==
      Some(MBig(BigInt("18446744073709551615"))))
    assert(MsgPack.decode(hex("d0ff")) == Some(MInt(-1)))
    assert(MsgPack.decode(hex("d1ff00")) == Some(MInt(-256)))
    assert(MsgPack.decode(hex("a3616263")) == Some(MStr("abc")))
    assert(MsgPack.decode(hex("d903616263")) == Some(MStr("abc")))
    assert(MsgPack.decode(hex("920102")) == Some(MArr(Vector(MInt(1), MInt(2)))))
    assert(MsgPack.decode(hex("81a16101")) ==
      Some(MMap(Vector(MStr("a") -> MInt(1)))))
    assert(MsgPack.decode(hex("c0")) == Some(MNil))
    assert(MsgPack.decode(hex("c3")) == Some(MBool(true)))
    assert(MsgPack.decode(hex("cb3ff8000000000000")) == Some(MFloat(64, 1.5)))
    assert(MsgPack.decode(hex("ca3e800000")) == Some(MFloat(32, 0.25)))
    assert(MsgPack.decode(hex("c403010203")).get.asInstanceOf[MBin].v.toSeq ==
      Seq[Byte](1, 2, 3))
    // fixext4 with type 7
    val e = MsgPack.decode(hex("d607deadbeef")).get.asInstanceOf[MExt]
    assert(e.extType == 7 && e.data.toSeq == hex("deadbeef").toSeq)
  }

  test("refusals: 0xc1, truncation, trailing bytes, bad UTF-8, never throws") {
    assert(MsgPack.decode(hex("c1")).isEmpty)
    assert(MsgPack.decode(hex("cd01")).isEmpty)
    assert(MsgPack.decode(hex("0708")).isEmpty)
    assert(MsgPack.decode(hex("a2c328")).isEmpty)
    assert(MsgPack.decode(hex("92c0")).isEmpty) // array missing an element
    assert(MsgPack.decode(Array.emptyByteArray).isEmpty)
    val rnd = new scala.util.Random(4)
    (1 to 300).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(48)); rnd.nextBytes(b)
      MsgPack.decode(b)
    }
  }

  test("encoder round trip prefers the smallest form; packer seam") {
    val doc = MMap(Vector(
      MStr("k") -> MArr(Vector(MInt(300), MInt(-300), MStr("x" * 40), MNil)),
      MStr("e") -> MExt(3, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))))
    // MExt/MBin carry Array[Byte] (reference equality) — compare the
    // flattened forms, which hex the bytes
    assert(MsgPack.decode(MsgPack.encode(doc)).map(MsgPack.flatten(_)) ==
      Some(MsgPack.flatten(doc)))
    // smallest-form choices
    assert(MsgPack.encode(MInt(7)).toSeq == hex("07").toSeq)
    assert(MsgPack.encode(MInt(-1)).toSeq == hex("ff").toSeq)
    assert(MsgPack.encode(MInt(128)).toSeq == hex("cc80").toSeq)
    assert(MsgPack.encode(MStr("abc")).toSeq == hex("a3616263").toSeq)
    val packed = MsgPack.packDocsMsgPack(sf("documents"), "doc_id")
    val rows = MsgPack.rows(packed, "doc_id", "payload")
    assert(rows.where($"kind".isNull).count() == 0)
    val one = rows.where($"id" === 3L)
      .select($"path", $"kind", $"value").as[(String, String, String)].collect().toSeq
    assert(one.contains(("$.i", "uint", "3")))
    assert(one.contains(("$.t", "str", "doc3" + "x" * 32))) // odd id: str8 path
    assert(one.contains(("$.f", "f32", "0.25")))
  }
}
