package graft

import graft.ops.Mat5

/** MAT v5: both endiannesses, compressed elements, down-packed
  * storage, small data elements, skip ladder, refusals. */
class Mat5Spec extends SparkSuite {
  import spark.implicits._

  private def checkFile(be: Boolean, compress: Boolean): Unit = {
    val a = Mat5.buildMatrix("A", 6, 9, Seq(2, 3),
      Seq(1.25, -2.0, 0.75, 3.0, -0.25, 11.0), be)
    val b = Mat5.buildMatrix("bb", 10, 3, Seq(4, 1), Seq(-7, 0, 150, -150), be)
    val f = Mat5.buildFile(Seq(a, b), be, compress)
    val vars = Mat5.parse(f).get
    assert(vars.map(_.name) == Seq("A", "bb"), s"be=$be compress=$compress")
    val va = vars.head
    assert(va.className == "double" && va.dims == Seq(2L, 3L))
    assert(va.values.toSeq == Seq(1.25, -2.0, 0.75, 3.0, -0.25, 11.0))
    val vb = vars(1)
    assert(vb.className == "int16" && vb.values.toSeq == Seq(-7.0, 0.0, 150.0, -150.0))
  }

  test("little/big endian × plain/compressed all decode") {
    for (be <- Seq(false, true); compress <- Seq(false, true))
      checkFile(be, compress)
  }

  test("compressed elements survive incompressible payloads (deflate loops to finished)") {
    // a large pseudo-random int16 matrix whose deflated form EXCEEDS
    // the raw size: a single-deflate builder would truncate the
    // miCOMPRESSED stream and the parse would refuse
    val rng = new scala.util.Random(42)
    val n = 4096
    val vals = Seq.fill(n)((rng.nextInt(65536) - 32768).toDouble)
    val m = Mat5.buildMatrix("R", 10, 3, Seq(n, 1), vals, be = false)
    val vars = Mat5.parse(Mat5.buildFile(Seq(m), be = false, compress = true)).get
    assert(vars.head.values.toSeq == vals)
  }

  test("down-packed storage: a double-class matrix stored as int8 decodes by storage type") {
    val m = Mat5.buildMatrix("d", 6, 1, Seq(3, 1), Seq(-5, 0, 7), be = false)
    val vars = Mat5.parse(Mat5.buildFile(Seq(m), be = false, compress = false)).get
    assert(vars.head.className == "double")
    assert(vars.head.values.toSeq == Seq(-5.0, 0.0, 7.0))
  }

  test("long names use the full element form; short names the small data element") {
    val longName = "a_rather_long_variable_name"
    val m = Mat5.buildMatrix(longName, 6, 9, Seq(1, 1), Seq(2.5), be = false)
    val vars = Mat5.parse(Mat5.buildFile(Seq(m), be = false, compress = false)).get
    assert(vars.head.name == longName)
  }

  test("refusals and skips: bad magic, bad version, truncation, corrupt zlib") {
    assert(Mat5.parse("not a mat file".getBytes("US-ASCII")).isEmpty)
    assert(Mat5.parse(Array.emptyByteArray).isEmpty)
    val m = Mat5.buildMatrix("A", 6, 9, Seq(1, 1), Seq(1.0), be = false)
    val good = Mat5.buildFile(Seq(m), be = false, compress = true)
    val badVer = good.clone(); badVer(124) = 9
    assert(Mat5.parse(badVer).isEmpty)
    (129 until good.length by 17).foreach(n =>
      assert(Mat5.parse(good.take(n)).isEmpty, s"truncated $n"))
    // corrupt the zlib stream: refuse, never guess
    val corrupt = good.clone()
    corrupt(good.length - 12) = (corrupt(good.length - 12) ^ 0x55).toByte
    assert(Mat5.parse(corrupt).isEmpty)
  }

  test("Spark seam + spec op") {
    val packed = Mat5.packDocsMat(Seq(1L, 2L).toDF("doc_id"), "doc_id")
    val rows = Mat5.decodeVars(packed, "id", "payload")
      .select($"id", $"name", $"class", $"n_values")
      .as[(Long, String, String, Long)].collect().toSet
    assert(rows == Set(
      (1L, "A", "double", 12L), (1L, "b", "int16", 5L), (1L, "c", "single", 6L),
      (2L, "A", "double", 12L), (2L, "b", "int16", 5L), (2L, "c", "single", 6L)))
    import graft.spec._
    val viaOp = graft.transforms.Transforms(packed,
      TransformSpec("t", "mat_vars",
        Config.of("id_field" -> "id", "payload_field" -> "payload")), Map.empty)
    assert(viaOp.count() == 6)
  }
}
