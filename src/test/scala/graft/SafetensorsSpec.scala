package graft

import graft.ops.Safetensors
import org.apache.spark.sql.functions._

/** safetensors: a hand-assembled byte-level fixture (independent of
  * the packer), geometry validation ladder, F32 value decode, and
  * the packer round-trip. */
class SafetensorsSpec extends SparkSuite {
  import spark.implicits._

  /** Hand-build a file with raw byte twiddling — no packer code. */
  private def handFile(headerJson: String, data: Array[Byte]): Array[Byte] = {
    val h = headerJson.getBytes("UTF-8")
    val out = java.nio.ByteBuffer.allocate(8 + h.length + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.putLong(h.length.toLong); out.put(h); out.put(data)
    out.array()
  }

  private def f32(vs: Float*): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(vs.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vs.foreach(b.putFloat); b.array()
  }

  test("hand fixture: header order, metadata, shapes, F32 values") {
    val file = handFile(
      """{"__metadata__":{"k":"v"},
        |"a":{"dtype":"F32","shape":[2],"data_offsets":[0,8]},
        |"b":{"dtype":"I64","shape":[1,2],"data_offsets":[8,24]},
        |"scalar":{"dtype":"F32","shape":[],"data_offsets":[24,28]}}""".stripMargin,
      f32(1.5f, -2.25f) ++ Array.fill[Byte](16)(7) ++ f32(9.0f))
    val (meta, tensors, dataStart) = Safetensors.parse(file).get
    assert(meta == Map("k" -> "v"))
    assert(tensors.map(_.name) == Seq("a", "b", "scalar"))
    assert(tensors(1).dtype == "I64" && tensors(1).shape == Seq(1L, 2L))
    assert(Safetensors.readF32(file, dataStart, tensors(0)).toSeq == Seq(1.5f, -2.25f))
    assert(Safetensors.readF32(file, dataStart, tensors(2)).toSeq == Seq(9.0f))
  }

  test("validation ladder: lengths, offsets, dtypes, shapes") {
    def bad(json: String, dataLen: Int): Boolean =
      Safetensors.parse(handFile(json, Array.fill[Byte](dataLen)(0))).isEmpty
    assert(bad("""{"a":{"dtype":"F32","shape":[2],"data_offsets":[0,4]}}""", 8)) // len != 2*4
    assert(bad("""{"a":{"dtype":"F32","shape":[2],"data_offsets":[0,8]}}""", 4)) // out of bounds
    assert(bad("""{"a":{"dtype":"Q4","shape":[2],"data_offsets":[0,8]}}""", 8))  // unknown dtype
    assert(bad("""{"a":{"dtype":"F32","shape":[-1],"data_offsets":[0,8]}}""", 8))
    assert(bad("""{"a":{"dtype":"F32","shape":[2],"data_offsets":[8,0]}}""", 8)) // end < begin
    assert(bad("""["not","an","object"]""", 0))
    assert(Safetensors.parse("short".getBytes("UTF-8")).isEmpty)
    assert(Safetensors.parse(Array[Byte](-1, -1, -1, -1, -1, -1, -1, 127)).isEmpty)
  }

  test("packer round-trip through the Spark surface") {
    val vecs = Seq(
      (0L, Seq(0.5f, 1.5f, -3.25f)),
      (8L, Seq(2.0f, 4.0f, 8.0f)),
      (3L, Seq(7.0f))).toDF("vec_id", "embedding")
    val rows = Safetensors.decodeTensors(
      Safetensors.packVecs(vecs, "vec_id", "embedding"), "file_id", "payload")
      .collect().map(r => (r.getString(1), r.getString(2),
        r.getSeq[Long](3), r.getSeq[Float](4))).sortBy(_._1)
    assert(rows.toSeq == Seq(
      ("vec_0", "F32", Seq(3L), Seq(0.5f, 1.5f, -3.25f)),
      ("vec_3", "F32", Seq(1L), Seq(7.0f)),
      ("vec_8", "F32", Seq(3L), Seq(2.0f, 4.0f, 8.0f))))
    // id 0 and 8 share file 0 with contiguous offsets
    val raw = Safetensors.packVecs(vecs, "vec_id", "embedding").collect()
      .find(_.getLong(0) == 0L).get.getAs[Array[Byte]](1)
    val (_, ts, _) = Safetensors.parse(raw).get
    assert(ts.map(t => (t.name, t.begin, t.end)) == Seq(
      ("vec_0", 0L, 12L), ("vec_8", 12L, 24L)))
  }
}
