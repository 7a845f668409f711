package graft

import graft.ops.Gguf
import org.apache.spark.sql.functions._

/** GGUF metadata: a hand-assembled byte fixture independent of the
  * packer, the full KV type table, alignment enforcement, the
  * refusal ladder, and the Spark surface round-trip. */
class GgufSpec extends SparkSuite {
  import spark.implicits._

  private class W {
    val bos = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = bos.write(v & 0xFF)
    def u32(v: Long): Unit = (0 until 4).foreach(i => u8(((v >> (8 * i)) & 0xFF).toInt))
    def u64(v: Long): Unit = (0 until 8).foreach(i => u8(((v >> (8 * i)) & 0xFF).toInt))
    def s(v: String): Unit = { val b = v.getBytes("UTF-8"); u64(b.length.toLong); bos.write(b) }
    def bytes: Array[Byte] = bos.toByteArray
  }

  private def handFile(version: Long = 3)(body: W => Unit): Array[Byte] = {
    val w = new W
    w.bos.write("GGUF".getBytes("US-ASCII"))
    w.u32(version)
    body(w)
    w.bytes
  }

  test("hand fixture: every scalar type, string array, f64, negatives") {
    val f = handFile() { w =>
      w.u64(1); w.u64(6)
      w.s("a.i16"); w.u32(3); w.u8(0xFE); w.u8(0xFF)        // -2
      w.s("a.i32"); w.u32(5); w.u32(0xFFFFFFFFL)            // -1
      w.s("a.f64"); w.u32(12); w.u64(java.lang.Double.doubleToLongBits(2.5))
      w.s("a.strs"); w.u32(9); w.u32(8); w.u64(2); w.s("en"); w.s("fr")
      w.s("a.u64max"); w.u32(10); w.u64(-1L)                 // 2^64-1 unsigned
      w.s("a.i64"); w.u32(11); w.u64(-7L)
      w.s("t"); w.u32(2); w.u64(3); w.u64(4); w.u32(0); w.u64(0)
    }
    val (kvs, tensors) = Gguf.parse(f).get
    assert(kvs.map(k => (k.key, k.value)) == Seq(
      ("a.i16", "-2"), ("a.i32", "-1"), ("a.f64", "2.5"),
      ("a.strs", "[en,fr]"), ("a.u64max", "18446744073709551615"),
      ("a.i64", "-7")))
    assert(tensors == Seq(Gguf.Tensor("t", Seq(3L, 4L), 0, 0L)))
  }

  test("alignment: custom power of two enforced on tensor offsets") {
    def file(align: Long, offset: Long) = handFile() { w =>
      w.u64(1); w.u64(1)
      w.s("general.alignment"); w.u32(4); w.u32(align)
      w.s("t"); w.u32(1); w.u64(2); w.u32(0); w.u64(offset)
    }
    assert(Gguf.parse(file(64, 128)).nonEmpty)
    assert(Gguf.parse(file(64, 96)).isEmpty)  // not 64-aligned
    assert(Gguf.parse(file(48, 96)).isEmpty)  // alignment not a power of two
  }

  test("refusal ladder: magic, version, truncation, nested arrays, unknown type") {
    assert(Gguf.parse("GGML????".getBytes("US-ASCII")).isEmpty)
    assert(Gguf.parse(handFile(version = 1) { w => w.u64(0); w.u64(0) }).isEmpty)
    assert(Gguf.parse(handFile() { w => w.u64(0); w.u64(1); w.s("k"); w.u32(8) }).isEmpty)
    assert(Gguf.parse(handFile() { w =>
      w.u64(0); w.u64(1); w.s("k"); w.u32(9); w.u32(9); w.u64(0)
    }).isEmpty) // nested array
    assert(Gguf.parse(handFile() { w =>
      w.u64(0); w.u64(1); w.s("k"); w.u32(99); w.u32(0)
    }).isEmpty)
    assert(Gguf.parse(Array.emptyByteArray).isEmpty)
  }

  test("packer round-trip via the Spark surface") {
    val rows = Gguf.decodeMeta(
      Gguf.packDocsGguf(Seq(3L, 10L).toDF("doc_id"), "doc_id"), "id", "payload")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(4)))
    assert(rows.count(_._1 == 3L) == 11) // 6 kvs + 5 tensor infos
    assert(rows.contains((3L, "kv", "planted.ratio", "0.75")))
    assert(rows.contains((10L, "kv", "planted.flag", "true")))
    assert(rows.contains((10L, "tensor", "tok_embd.weight", "[64,4]")))
    assert(rows.contains((10L, "tensor", "output_norm.weight", "[16]")))
  }

  test("binary16 codec: exact values, subnormals, specials, RNE, JDK cross-pin") {
    // exact quarter-units round-trip bit-for-bit
    Seq(0.0f, 0.25f, -0.5f, 1.0f, 2.25f, -8.75f, 1024f, 65504f).foreach { v =>
      assert(Gguf.halfToFloat(Gguf.floatToHalf(v)) == v, s"$v")
    }
    // canonical bit patterns
    assert(Gguf.floatToHalf(1.0f) == 0x3C00)
    assert(Gguf.floatToHalf(-2.0f) == 0xC000)
    assert(Gguf.floatToHalf(0.5f) == 0x3800)
    assert(Gguf.halfToFloat(0x7C00) == Float.PositiveInfinity)
    assert(Gguf.halfToFloat(0xFC00) == Float.NegativeInfinity)
    assert(java.lang.Float.isNaN(Gguf.halfToFloat(0x7E00)))
    // subnormal half: 0x0001 = 2^-24
    assert(Gguf.halfToFloat(0x0001) == math.pow(2, -24).toFloat)
    assert(Gguf.floatToHalf(math.pow(2, -24).toFloat) == 0x0001)
    // overflow -> inf; underflow -> signed zero
    assert(Gguf.floatToHalf(1e6f) == 0x7C00)
    assert(Gguf.floatToHalf(-1e-8f) == 0x8000)
    // exhaustive involution cross-pinned against Java's own float
    // widening of halves via Float.parseFloat? no JDK half API on 17 —
    // instead: every finite half value round-trips through our pair
    (0 until 0x10000).foreach { h =>
      val exp = (h >> 10) & 0x1F
      if (exp != 0x1F) { // finite
        val f = Gguf.halfToFloat(h)
        assert(Gguf.floatToHalf(f) == h, f"bits 0x$h%04x")
      }
    }
  }

  test("dequantize: F32, F16, Q8_0 values; K-quant and bounds refusals") {
    val packed = Gguf.packDocsGguf(Seq(5L).toDF("doc_id"), "doc_id")
      .collect().head.getAs[Array[Byte]]("payload")
    val Some((_, tensors, dataStart, align)) = Gguf.parseFull(packed)
    assert(align == 32 && dataStart % 32 == 0 && tensors.length == 5)
    val f32 = Gguf.dequantize(packed, tensors(0), dataStart).get
    assert(f32.length == 64 * (5 % 7 + 1))
    (0 until f32.length).foreach(i =>
      assert(f32(i) == ((5 + i) % 17 - 8) * 0.25f, s"f32[$i]"))
    val q8 = Gguf.dequantize(packed, tensors(1), dataStart).get
    assert(q8.length == 32)
    (0 until 32).foreach(i =>
      assert(q8(i) == 0.5f * (((5 + i) % 255) - 127), s"q8[$i]"))
    val f16 = Gguf.dequantize(packed, tensors(2), dataStart).get
    assert(f16.length == 16)
    (0 until 16).foreach(i =>
      assert(f16(i) == (((5 + i) % 9) - 4) * 0.25f, s"f16[$i]"))
    // an unsupported IQ type refuses; a K-quant with a
    // non-multiple-of-256 count refuses; truncation refuses;
    // non-multiple-of-32 Q8_0 refuses
    assert(Gguf.dequantize(packed, tensors(0).copy(ggmlType = 16), dataStart).isEmpty)
    assert(Gguf.dequantize(packed, tensors(0).copy(ggmlType = 12), dataStart).isEmpty)
    // truncate INTO the F16 tensor (the Q4 block now trails it)
    assert(Gguf.dequantize(
      packed.take((dataStart + 256 * 6 + 96 - 8).toInt), tensors(2), dataStart).isEmpty)
    assert(Gguf.dequantize(packed, tensors(1).copy(dims = Seq(31L)), dataStart).isEmpty)
    // Spark surface: five rows, name/type/count as planted
    // (id 5 → Q4_1 up-proj, Q8_K down-proj)
    val rows = Gguf.decodeTensorValues(
      Seq((5L, packed)).toDF("id", "payload"), "id", "payload")
      .select($"id", $"name", $"type_id", $"n_values")
      .as[(Long, String, Int, Long)].collect().toSet
    assert(rows == Set((5L, "tok_embd.weight", 0, 384L),
      (5L, "blk.0.attn_q.weight", 8, 32L), (5L, "output_norm.weight", 1, 16L),
      (5L, "blk.0.ffn_up.weight", 3, 32L),
      (5L, "blk.0.ffn_down.weight", 15, 256L)))
  }

  test("dequantize Q2_K/Q3_K/Q5_K/Q8_K super-blocks: the remaining K-quant ladder") {
    def downProj(id: Long): (Array[Byte], Gguf.Tensor, Long) = {
      val p = Gguf.packDocsGguf(Seq(id).toDF("doc_id"), "doc_id")
        .collect().head.getAs[Array[Byte]]("payload")
      val Some((_, ts, ds, _)) = Gguf.parseFull(p)
      (p, ts.find(_.name == "blk.0.ffn_down.weight").get, ds)
    }
    // id 2 → Q2_K: v = 0.5·sc·q − 0.25·m per 16-wide group
    val (p2, t2, ds2) = downProj(2L)
    assert(t2.ggmlType == 10)
    val v2 = Gguf.dequantize(p2, t2, ds2).get
    (0 until 256).foreach { e =>
      val g = e / 16
      val sc = (2 + g) % 16; val m = (2 * 3 + g) % 16; val q = (2 + e) % 4
      assert(v2(e) == 0.5f * sc * q - 0.25f * m, s"q2k[$e]")
    }
    // id 3 → Q3_K: v = 0.5·(us−32)·q, q ∈ [−4,3] via the hmask bit
    val (p3, t3, ds3) = downProj(3L)
    assert(t3.ggmlType == 11)
    val v3 = Gguf.dequantize(p3, t3, ds3).get
    (0 until 256).foreach { e =>
      val us = (3 + e / 16) % 64
      val q = ((3 + e) % 8) - 4
      assert(v3(e) == 0.5f * (us - 32) * q, s"q3k[$e]")
    }
    // id 4 → Q5_K: the Q4_K scale/min plant at 5-bit quant range
    val (p5, t5, ds5) = downProj(4L)
    assert(t5.ggmlType == 13)
    val v5 = Gguf.dequantize(p5, t5, ds5).get
    (0 until 256).foreach { e =>
      val s = e / 32
      val sc = (4 + 5 * s) % 64; val m = (4 * 3 + s) % 64; val q = (4 + e) % 32
      assert(v5(e) == 0.5f * sc * q - 0.25f * m, s"q5k[$e]")
    }
    // id 5 → Q8_K: plain 0.5·q int8 values behind the f32 scale
    val (p8, t8, ds8) = downProj(5L)
    assert(t8.ggmlType == 15)
    val v8 = Gguf.dequantize(p8, t8, ds8).get
    (0 until 256).foreach { e =>
      assert(v8(e) == 0.5f * (((5 + e) % 255) - 127), s"q8k[$e]")
    }
    // truncation refuses each
    Seq((p2, t2, ds2), (p3, t3, ds3), (p5, t5, ds5), (p8, t8, ds8)).foreach {
      case (p, t, ds) => assert(Gguf.dequantize(p.take(p.length - 2), t, ds).isEmpty)
    }
  }

  test("dequantize Q4_K/Q6_K super-blocks: 6-bit scale/min packing, signed scales, 2-bit highs") {
    // id 0 → Q4_K, id 1 → Q6_K
    val p0 = Gguf.packDocsGguf(Seq(0L).toDF("doc_id"), "doc_id")
      .collect().head.getAs[Array[Byte]]("payload")
    val Some((_, ts0, ds0, _)) = Gguf.parseFull(p0)
    val t0 = ts0.find(_.name == "blk.0.ffn_down.weight").get
    assert(t0.ggmlType == 12 && t0.dims == Seq(256L))
    val v0 = Gguf.dequantize(p0, t0, ds0).get
    assert(v0.length == 256)
    (0 until 256).foreach { e =>
      val s = e / 32
      val sc = (0 + 5 * s) % 64; val m = (0 * 3 + s) % 64; val q = (0 + e) % 16
      assert(v0(e) == 0.5f * sc * q - 0.25f * m, s"q4k[$e]")
    }
    val p1 = Gguf.packDocsGguf(Seq(1L).toDF("doc_id"), "doc_id")
      .collect().head.getAs[Array[Byte]]("payload")
    val Some((_, ts1, ds1, _)) = Gguf.parseFull(p1)
    val t1 = ts1.find(_.name == "blk.0.ffn_down.weight").get
    assert(t1.ggmlType == 14)
    val v1 = Gguf.dequantize(p1, t1, ds1).get
    (0 until 256).foreach { e =>
      val k = 8 * (e / 128) + 2 * ((e % 128) / 32) + ((e % 32) / 16)
      val sc = ((1 + k) % 32) - 16
      val q = ((1 + e) % 64) - 32
      assert(v1(e) == 0.5f * sc * q, s"q6k[$e]")
    }
    // truncation refuses both
    assert(Gguf.dequantize(p0.take(p0.length - 2), t0, ds0).isEmpty)
    assert(Gguf.dequantize(p1.take(p1.length - 2), t1, ds1).isEmpty)
  }

  test("dequantize Q4_0/Q4_1/Q5_0/Q5_1: exact values, nibble split-halves, qh bits, truncation") {
    // ids 0..3 cycle the four formats; quants are (id+j) mod 16 / mod 32
    (0L to 3L).foreach { id =>
      val packed = Gguf.packDocsGguf(Seq(id).toDF("doc_id"), "doc_id")
        .collect().head.getAs[Array[Byte]]("payload")
      val Some((_, tensors, dataStart, _)) = Gguf.parseFull(packed)
      val t = tensors.find(_.name == "blk.0.ffn_up.weight").get
      val expectedType = id match { case 0 => 2; case 1 => 3; case 2 => 6; case _ => 7 }
      assert(t.ggmlType == expectedType)
      val vs = Gguf.dequantize(packed, t, dataStart).get
      assert(vs.length == 32)
      (0 until 32).foreach { j =>
        val expected = id match {
          case 0 => 0.5f * ((id + j) % 16 - 8)          // Q4_0: d·(q−8)
          case 1 => 0.5f * ((id + j) % 16) + 0.25f      // Q4_1: d·q + m
          case 2 => 0.5f * ((id + j) % 32 - 16)         // Q5_0: d·(q−16), 5th bit via qh
          case _ => 0.5f * ((id + j) % 32) + 0.25f      // Q5_1: d·q + m
        }
        assert(vs(j) == expected, s"id=$id type=$expectedType v[$j]=${vs(j)} != $expected")
      }
      // truncation INTO the up-proj block refuses (the K-quant block
      // now trails it, so cut inside the block itself);
      // a non-multiple-of-32 count refuses
      val d2 = (id % 7 + 1).toInt
      assert(Gguf.dequantize(
        packed.take((dataStart + 256 * d2 + 96 + 4).toInt), t, dataStart).isEmpty)
      assert(Gguf.dequantize(packed, t.copy(dims = Seq(33L)), dataStart).isEmpty)
    }
    // Q5 high bits genuinely exercise BOTH halves of the qh word: an
    // id-2 block spans quants 2..33 (mod 32) — elements 14..29 have
    // the 5th bit set, which straddles the j<16 and j≥16 lanes
    val p2 = Gguf.packDocsGguf(Seq(2L).toDF("doc_id"), "doc_id")
      .collect().head.getAs[Array[Byte]]("payload")
    val Some((_, ts2, ds2, _)) = Gguf.parseFull(p2)
    val v2 = Gguf.dequantize(p2, ts2.find(_.name == "blk.0.ffn_up.weight").get, ds2).get
    assert((0 until 32).count(j => (2 + j) % 32 >= 16) == 16 &&
      v2(14) == 0.5f * 0 && v2(29) == 0.5f * 15)
  }
}
