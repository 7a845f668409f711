package graft

import graft.ops.Npy
import org.apache.spark.sql.functions._

/** NPY/NPZ: hand-assembled v1 and v2 headers (independent of the
  * writer), the spec's alignment rule, dict-literal parsing, the
  * refusal ladder (fortran order, geometry lies), and the npz
  * round-trip through both ZIP modes. */
class NpySpec extends SparkSuite {
  import spark.implicits._

  private def handNpy(version: Int, dict: String, data: Array[Byte]): Array[Byte] = {
    val d = dict.getBytes("ISO-8859-1")
    val lenBytes = if (version == 1) 2 else 4
    val out = java.nio.ByteBuffer.allocate(8 + lenBytes + d.length + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(0x93.toByte).put("NUMPY".getBytes("US-ASCII"))
      .put(version.toByte).put(0.toByte)
    if (version == 1) out.putShort(d.length.toShort) else out.putInt(d.length)
    out.put(d).put(data)
    out.array()
  }

  private def f32le(vs: Float*): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(vs.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vs.foreach(b.putFloat); b.array()
  }

  test("hand v1 and v2 headers parse; 2-D shapes; f8 metadata-only") {
    val v1 = handNpy(1, "{'descr': '<f4', 'fortran_order': False, 'shape': (3,), }",
      f32le(1f, 2f, 3f))
    val h1 = Npy.parse(v1).get
    assert(h1.descr == "<f4" && h1.shape == Seq(3L))
    assert(Npy.readF32(v1, h1).toSeq == Seq(1f, 2f, 3f))
    val v2 = handNpy(2, "{'descr': '<f8', 'fortran_order': False, 'shape': (2, 2), }",
      new Array[Byte](32))
    assert(Npy.parse(v2).get.shape == Seq(2L, 2L))
  }

  test("refusals: fortran order, geometry lies, bad magic, bad dtype") {
    assert(Npy.parse(handNpy(1,
      "{'descr': '<f4', 'fortran_order': True, 'shape': (2,), }", f32le(1f, 2f))).isEmpty)
    assert(Npy.parse(handNpy(1,
      "{'descr': '<f4', 'fortran_order': False, 'shape': (3,), }", f32le(1f, 2f))).isEmpty)
    assert(Npy.parse(handNpy(1,
      "{'descr': '<c8', 'fortran_order': False, 'shape': (1,), }", new Array[Byte](8))).isEmpty)
    assert(Npy.parse("not numpy at all".getBytes("US-ASCII")).isEmpty)
    assert(Npy.parse(Array.emptyByteArray).isEmpty)
  }

  test("writer emits the spec's 16-byte-aligned v1 header; scalar-free tuple form") {
    val b = Npy.writeF32(Seq(2L), Array(5f, 6f))
    assert((10 + (((b(8) & 0xFF) | ((b(9) & 0xFF) << 8)))) % 16 == 0)
    val h = Npy.parse(b).get
    assert(h.dataStart % 16 == 0)
    assert(Npy.readF32(b, h).toSeq == Seq(5f, 6f))
    val dict = new String(b, 10, h.dataStart - 10, "ISO-8859-1")
    assert(dict.contains("'shape': (2,)")) // 1-tuple needs the trailing comma
  }

  test("npz round-trip via the Spark surface, both zip modes") {
    val vecs = Seq((0L, Seq(1.5f, 2.5f)), (1L, Seq(-4f))).toDF("vec_id", "embedding")
    val rows = Npy.decodeNpz(Npy.packVecsNpz(vecs, "vec_id", "embedding"),
      "file_id", "payload")
      .collect().map(r => (r.getString(1), r.getSeq[Float](4))).sortBy(_._1)
    assert(rows.toSeq == Seq(("vec_0", Seq(1.5f, 2.5f)), ("vec_1", Seq(-4f))))
  }
}
