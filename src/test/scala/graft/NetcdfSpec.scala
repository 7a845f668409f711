package graft

import graft.ops.Netcdf

/** netCDF classic: all three version widths, record interleave,
  * char skip, attribute walk, refusal ladder. */
class NetcdfSpec extends SparkSuite {
  import spark.implicits._

  private def check(id: Long): Unit = {
    val numrecs = (id % 4 + 2).toInt
    val vars = Netcdf.parse(Netcdf.build(id)).get
    assert(vars.map(_.name) == Seq("fmat", "ivec", "rcount", "rtemp"),
      s"id=$id (char variable must be skipped)")
    val byName = vars.map(v => v.name -> v).toMap
    val fmat = byName("fmat")
    assert(fmat.typeName == "float" && fmat.dims == Seq(3L, 4L))
    (0 until 12).foreach(i =>
      assert(fmat.values(i) == ((id + i) % 21 - 10) * 0.25, s"fmat[$i] id=$id"))
    val ivec = byName("ivec")
    assert(ivec.typeName == "int" && ivec.dims == Seq(6L))
    (0 until 6).foreach(i =>
      assert(ivec.values(i) == ((id + i) % 61 - 30).toDouble, s"ivec[$i]"))
    val rtemp = byName("rtemp")
    assert(rtemp.dims == Seq(numrecs.toLong, 4L))
    for (rec <- 0 until numrecs; c <- 0 until 4)
      assert(rtemp.values(4 * rec + c) == ((id + 7 * rec + c) % 19 - 9) * 0.25,
        s"rtemp[$rec,$c] id=$id")
    val rcount = byName("rcount")
    assert(rcount.dims == Seq(numrecs.toLong))
    (0 until numrecs).foreach(rec =>
      assert(rcount.values(rec) == ((id + rec) % 87 - 43).toDouble, s"rcount[$rec]"))
  }

  test("CDF-1, CDF-2, CDF-5 widths all decode with interleaved records") {
    // id%3 selects the version; cover each with varying record counts
    Seq(0L, 1L, 2L, 3L, 4L, 5L, 10L, 101L).foreach(check)
  }

  test("refusals: bad magic, bad version, STREAMING numrecs, truncation") {
    assert(Netcdf.parse("not netcdf".getBytes("US-ASCII")).isEmpty)
    assert(Netcdf.parse(Array.emptyByteArray).isEmpty)
    val good = Netcdf.build(7L)
    val badVer = good.clone(); badVer(3) = 4
    assert(Netcdf.parse(badVer).isEmpty)
    // STREAMING sentinel numrecs (CDF-1/2 layout: u32 at offset 4)
    val v1 = Netcdf.build(6L) // id%3==0 → version 1
    val streaming = v1.clone()
    (4 until 8).foreach(i => streaming(i) = 0xFF.toByte)
    assert(Netcdf.parse(streaming).isEmpty)
    (1 until good.length by 53).foreach(n =>
      assert(Netcdf.parse(good.take(n)).isEmpty, s"truncated at $n"))
  }

  test("Spark seam + spec op: hostile drops, variables replay") {
    val packed = Netcdf.packDocsNetcdf(Seq(3L, 8L).toDF("doc_id"), "doc_id")
    val rows = Netcdf.decodeVars(packed, "id", "payload")
      .select($"id", $"name", $"n_values")
      .as[(Long, String, Long)].collect().toSet
    assert(rows == Set(
      (3L, "fmat", 12L), (3L, "ivec", 6L), (3L, "rtemp", 4L * (3 % 4 + 2)),
      (3L, "rcount", (3 % 4 + 2).toLong),
      (8L, "fmat", 12L), (8L, "ivec", 6L), (8L, "rtemp", 4L * (8 % 4 + 2)),
      (8L, "rcount", (8 % 4 + 2).toLong)))
    assert(Netcdf.decodeVars(
      Seq((1L, Array[Byte](1, 2))).toDF("id", "payload"), "id", "payload").count() == 0)
    import graft.spec._
    val viaOp = graft.transforms.Transforms(packed,
      TransformSpec("t", "netcdf_vars",
        Config.of("id_field" -> "id", "payload_field" -> "payload")), Map.empty)
    assert(viaOp.count() == 8)
  }
}
