package graft

import graft.ops.{Hdf5, Hdf5Write}

/** HDF5: checksum algorithms against their PUBLISHED vectors, both
  * superblock/object-header vintages, both group machineries, the
  * chunked+filtered read path, and the refusal ladder. */
class Hdf5Spec extends SparkSuite {
  import spark.implicits._

  test("lookup3 matches the algorithm's published test vectors") {
    // from lookup3.c's own driver: hashlittle("", 0) = 0xdeadbeef,
    // hashlittle("", 0xdeadbeef) = 0xbd5b7dde,
    // hashlittle("Four score and seven years ago", 0) = 0x17770551,
    // hashlittle("Four score and seven years ago", 1) = 0xcd628161
    def h(s: String, init: Int): Int = {
      val b = s.getBytes("US-ASCII")
      Hdf5.lookup3(b, 0, b.length, init)
    }
    assert(h("", 0) == 0xdeadbeef)
    assert(h("", 0xdeadbeef) == 0xbd5b7dde.toInt)
    assert(h("Four score and seven years ago", 0) == 0x17770551)
    assert(h("Four score and seven years ago", 1) == 0xcd628161.toInt)
  }

  test("fletcher32 matches hand-computed word folds") {
    // "ab" → one big-endian word 0x6162: sum1 = sum2 = 0x6162
    assert(Hdf5.fletcher32("ab".getBytes("US-ASCII"), 0, 2) == 0x61626162)
    // "abcd": sum1 = 0x6162 + 0x6364 = 0xC4C6;
    //         sum2 = 0x6162 + 0xC4C6 = 0x12628 → fold 0x2629
    assert(Hdf5.fletcher32("abcd".getBytes("US-ASCII"), 0, 4) == 0x2629C4C6)
    // odd tail byte goes HIGH: "abc" → words 0x6162, 0x6300
    // sum1 = 0xC462; sum2 = 0x6162 + 0xC462 = 0x125C4 → 0x25C5
    assert(Hdf5.fletcher32("abc".getBytes("US-ASCII"), 0, 3) == 0x25C5C462)
  }

  private def expect(id: Long): Map[String, (String, String, Seq[Double])] = Map(
    "/f32" -> (("float32le", "[24]",
      (0 until 24).map(i => ((id + i) % 17 - 8) * 0.25))),
    "/g/mat" -> (("float64le", "[6,5]",
      (0 until 30).map(i => ((id + i) % 23 - 11) * 0.25))),
    "/i64" -> (("int64le", "[16]",
      (0 until 16).map(i => ((id + i) % 101 - 50).toDouble))),
    "/ibe" -> (("int32be", "[8]",
      (0 until 8).map(i => ((id + i) % 19 - 9).toDouble))))

  private def check(id: Long, v2: Boolean): Unit = {
    val sets = Hdf5.parse(Hdf5Write.build(id, v2)).get
    assert(sets.map(_.path) == Seq("/f32", "/g/mat", "/i64", "/ibe"),
      s"paths for id=$id v2=$v2")
    sets.foreach { d =>
      val (dtype, dims, vals) = expect(id)(d.path)
      assert(d.dtype.label == dtype, s"${d.path} dtype")
      assert(d.dims.mkString("[", ",", "]") == dims, s"${d.path} dims")
      assert(d.values.toSeq == vals, s"${d.path} values id=$id v2=$v2")
    }
  }

  test("v0 vintage: superblock v0, v1 headers, TREE/SNOD/HEAP groups, chunked+filtered matrix") {
    Seq(0L, 6L, 17L, 100L).foreach(check(_, v2 = false))
  }

  test("v2 vintage: superblock v2 (lookup3), OHDR headers, link messages") {
    Seq(1L, 7L, 23L, 101L).foreach(check(_, v2 = true))
  }

  test("corruption refuses: superblock checksum, OHDR checksum, fletcher32 chunk, truncation") {
    val v2 = Hdf5Write.build(3L, v2 = true)
    // flip a byte inside the superblock checksum span
    val sb = v2.clone(); sb(30) = (sb(30) ^ 0x01).toByte
    assert(Hdf5.parse(sb).isEmpty)
    // flip a byte after the superblock: lands in data or a
    // checksummed header — either the values change (caught by the
    // gate hash) or a checksum refuses; assert no THROW either way
    val v0 = Hdf5Write.build(4L, v2 = false)
    (50 until v0.length by 97).foreach { i =>
      val m = v0.clone(); m(i) = (m(i) ^ 0x40).toByte
      Hdf5.parse(m) // must not throw
    }
    (1 until v2.length by 61).foreach { n =>
      assert(Hdf5.parse(v2.take(n)).isEmpty || n >= v2.length)
    }
    // not an HDF5 file at all
    assert(Hdf5.parse("parquet".getBytes("US-ASCII")).isEmpty)
    assert(Hdf5.parse(Array.emptyByteArray).isEmpty)
  }

  test("OHDR corruption refuses via the chunk checksum") {
    val v2 = Hdf5Write.build(9L, v2 = true)
    // find the first OHDR and flip a message byte inside it
    val at = (0 until v2.length - 4).indexWhere(i =>
      v2(i) == 'O' && v2(i + 1) == 'H' && v2(i + 2) == 'D' && v2(i + 3) == 'R')
    assert(at > 0)
    val m = v2.clone(); m(at + 9) = (m(at + 9) ^ 0x10).toByte
    assert(Hdf5.parse(m).isEmpty)
  }

  test("fletcher32 filter corruption drops the dataset, not the file") {
    // flip one byte of a filtered chunk (between the chunk B-tree
    // and the first header): the matrix read refuses via Bad →
    // parse None (chunk walk is part of dataset read)
    val v0 = Hdf5Write.build(8L, v2 = false)
    // locate the deflate stream: first zlib header 0x78 after the
    // contiguous sections; flip a byte right after it
    val zAt = (200 until v0.length - 1).find(i =>
      (v0(i) & 0xFF) == 0x78 && ((v0(i + 1) & 0xFF) == 0x9C || (v0(i + 1) & 0xFF) == 0xDA))
      .getOrElse(fail("no zlib header found"))
    val m = v0.clone(); m(zAt + 2) = (m(zAt + 2) ^ 0x01).toByte
    assert(Hdf5.parse(m).isEmpty)
  }

  test("Spark seam + spec op: hostile payloads drop, datasets replay") {
    val packed = Hdf5Write.packDocsHdf5(Seq(2L, 5L).toDF("doc_id"), "doc_id")
    val rows = Hdf5.decodeDatasets(packed, "id", "payload")
      .select($"id", $"path", $"dtype", $"n_values")
      .as[(Long, String, String, Long)].collect().toSet
    assert(rows == Set(
      (2L, "/f32", "float32le", 24L), (2L, "/g/mat", "float64le", 30L),
      (2L, "/i64", "int64le", 16L), (2L, "/ibe", "int32be", 8L),
      (5L, "/f32", "float32le", 24L), (5L, "/g/mat", "float64le", 30L),
      (5L, "/i64", "int64le", 16L), (5L, "/ibe", "int32be", 8L)))
    val hostile = Hdf5.decodeDatasets(
      Seq((1L, Array[Byte](1, 2, 3)), (2L, Array.emptyByteArray))
        .toDF("id", "payload"), "id", "payload")
    assert(hostile.count() == 0)
    // spec-op dispatch
    import graft.spec._
    val viaOp = graft.transforms.Transforms(packed,
      TransformSpec("t", "hdf5_datasets",
        Config.of("id_field" -> "id", "payload_field" -> "payload")), Map.empty)
    assert(viaOp.count() == 8)
  }
}
