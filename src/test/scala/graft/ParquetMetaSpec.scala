package graft

import org.apache.spark.sql.functions._

import graft.ops.ParquetMeta
import graft.ops.ParquetMeta._

/** Parquet footer walk: the generic thrift-compact reader on
  * hand-laid-out bytes, real Spark-written footers cross-checked
  * against Spark's own reader, and the quarantine seam. */
class ParquetMetaSpec extends SparkSuite {
  import spark.implicits._

  test("thrift compact: hand-laid-out struct decodes (deltas, long form, nesting)") {
    // struct { 1: i32 = 300 (zigzag 600); 2: binary "ab";
    //          3: list<i64> [1, -1]; 18: struct { 1: i64 = 5 } } stop
    val bytes = Array[Byte](
      0x15, 0xD8.toByte, 0x04,            // field +1, type 5 (i32), zigzag(300)=600
      0x18, 2, 'a', 'b',                   // field +1, type 8 (binary), len 2
      0x19, 0x26,                          // field +1, type 9 (list), size 2 elem 6
      0x02, 0x01,                          // zigzag(1)=2, zigzag(-1)=1
      0xFC.toByte,                         // field +15 -> id 18, type 12 (struct)
      0x16, 0x0A,                          // field +1, type 6 (i64), zigzag(5)=10
      0x00,                                // inner stop
      0x00)                                // outer stop
    val s = ParquetMeta.parseThrift(bytes).get
    assert(s.fields(1) == TInt(300))
    assert(s.fields(2).asInstanceOf[TBin].v.toSeq == "ab".getBytes.toSeq)
    assert(s.fields(3) == TList(Vector(TInt(1), TInt(-1))))
    assert(s.fields(18).asInstanceOf[TStruct].fields(1) == TInt(5))
    // truncation and junk refuse, never throw
    assert(ParquetMeta.parseThrift(bytes.take(3)).isEmpty)
    assert(ParquetMeta.parseThrift(Array[Byte](0x19, 0xFF.toByte)).isEmpty)
  }

  test("real footers agree with Spark's own reader") {
    val paths = Seq("documents", "embeddings", "lineitem")
      .map(t => s"/root/testdata/sf0.001/$t.parquet").toDF("path")
    val m = ParquetMeta.meta(paths, "path")
    assert(m.where($"row_group" === -1).count() == 0)
    // per file: sum of row-group rows over one column == table count
    for (t <- Seq("documents", "embeddings", "lineitem")) {
      val rows = m.where($"path".endsWith(s"$t.parquet") && $"column_id" === 0)
        .agg(sum($"rg_num_rows")).as[Long].collect().head
      assert(rows == sf(t).count(), t)
    }
    // the nested-list leaf path uses the parquet repetition spelling
    val embPath = m.where($"path".endsWith("embeddings.parquet") &&
      $"path_in_schema".contains("element")).select($"path_in_schema")
      .distinct().as[String].collect()
    assert(embPath.toSeq == Seq("embedding, list, element"))
    // types and codecs carry format-spec names
    val types = m.select($"type").distinct().as[String].collect().toSet
    assert(types.subsetOf(Set("BOOLEAN", "INT32", "INT64", "INT96",
      "FLOAT", "DOUBLE", "BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY")))
    // encodings render sorted with the format-spec enum names; every
    // Spark-written chunk declares at least RLE (definition levels)
    val encs = m.select($"encodings").distinct().as[String].collect()
    assert(encs.nonEmpty && encs.forall(_.split(", ").contains("RLE")))
    assert(encs.forall(e => e.split(", ").toSeq == e.split(", ").toSeq.sorted))
  }

  test("zone-map stats agree with Spark's own aggregates") {
    val paths = Seq(s"/root/testdata/sf0.001/orders.parquet").toDF("path")
    val m = ParquetMeta.meta(paths, "path")
    val stats = m.where($"path_in_schema" === "o_orderkey")
      .select($"null_count", $"min_value", $"max_value")
      .as[(Long, String, String)].collect()
    val (lo, hi) = sf("orders").agg(min($"o_orderkey"), max($"o_orderkey"))
      .as[(Long, Long)].collect().head
    // single row group at this SF: chunk stats ARE the table stats
    assert(stats.toSeq == Seq((0L, lo.toString, hi.toString)))
    // string stats decode as UTF-8
    val st = m.where($"path_in_schema" === "o_orderstatus")
      .select($"min_value").as[String].collect().head
    assert(st.nonEmpty && st.forall(_.isLetter))
  }

  test("hostile files quarantine as row_group = -1") {
    val dir = java.nio.file.Files.createTempDirectory("pqm").toFile
    def write(name: String, bytes: Array[Byte]): String = {
      val f = new java.io.File(dir, name)
      val o = new java.io.FileOutputStream(f)
      try o.write(bytes) finally o.close()
      f.getAbsolutePath
    }
    val junk = write("junk.parquet", "PAR1 not really a parquet file".getBytes)
    val tiny = write("tiny.parquet", "PAR1".getBytes)
    // magic ok but footer length insane
    val bad = write("bad.parquet",
      "PAR1".getBytes ++ Array[Byte](-1, -1, -1, 0x7F) ++ "PAR1".getBytes)
    val got = ParquetMeta.meta(Seq(junk, tiny, bad).toDF("path"), "path")
      .select($"path", $"row_group").as[(String, Int)].collect()
    assert(got.length == 3 && got.forall(_._2 == -1))
  }
}
