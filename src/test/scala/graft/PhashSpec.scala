package graft

import org.apache.spark.sql.functions._
import graft.ops.{JpegCodec, JpegEncoder, Multimodal, Phash, PngCodec}

/** DCT perceptual hash: the gate's class-separation guarantee, the
  * robustness property that makes pHash a near-dup tool (stable under
  * noise and JPEG recompression, far for unrelated images), resample
  * exactness, codec dispatch, and the distributed operators.
  */
class PhashSpec extends SparkSuite {
  import spark.implicits._

  private def classImage(c: Int): PngCodec.Image = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"phash_class_$c".getBytes("UTF-8"))
    val px = new Array[Byte](32 * 32)
    for (y <- 0 until 32; x <- 0 until 32) {
      val bitIdx = (y / 8) * 4 + (x / 8)
      val bit = (md(bitIdx / 8) >> (bitIdx % 8)) & 1
      px(y * 32 + x) = if (bit == 1) 228.toByte else 28.toByte
    }
    PngCodec.Image(32, 32, 1, px)
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("gate guarantee: all 10 planted classes are pairwise > 3 bits apart") {
    val hashes = (0 until 10).map(c => Phash.phash64(classImage(c)))
    assert(hashes.distinct.length == 10, "two class images hash identically")
    for (i <- 0 until 10; j <- i + 1 until 10) {
      val d = hamming(hashes(i), hashes(j))
      assert(d > 3, s"classes $i and $j only $d bits apart — gate banding would pair them")
    }
  }

  test("robustness: noise and JPEG recompression stay near relative to cross-class") {
    // Note: the blocky synthetic classes are pHash's WORST case for
    // absolute stability — most DCT coefficients sit near zero, so
    // the median threshold lives in a dense cloud and light noise
    // flips a few near-median bits. The property that matters for
    // near-dup banding is RELATIVE: perturbed copies stay strictly
    // closer than any other class.
    val base = classImage(0)
    val h0 = Phash.phash64(base)
    val others = (1 until 10).map(c => Phash.phash64(classImage(c)))
    val minCross = others.map(hamming(h0, _)).min
    // light deterministic noise: +-2 on every 17th pixel
    val noisy = base.pixels.clone()
    for (i <- noisy.indices by 17)
      noisy(i) = math.max(0, math.min(255, (noisy(i) & 0xFF) + (if (i % 2 == 0) 2 else -2))).toByte
    val dNoisy = hamming(h0, Phash.phash64(PngCodec.Image(32, 32, 1, noisy)))
    assert(dNoisy <= 8 && dNoisy < minCross,
      s"noise moved the hash $dNoisy bits (min cross-class $minCross)")
    // full JPEG round trip through our own encoder+decoder
    val recompressed = JpegCodec.decode(JpegEncoder.encode(base, quality = 90)).get
    val dJpeg = hamming(h0, Phash.phash64(recompressed))
    assert(dJpeg <= 8 && dJpeg < minCross,
      s"JPEG recompression moved the hash $dJpeg bits (min cross-class $minCross)")
  }

  test("resample: constant image is constant; 64x64 box means are exact") {
    val flat = PngCodec.Image(17, 13, 1, Array.fill(17 * 13)(100.toByte))
    val plane = Phash.resampleToN(Phash.lumaPlane(flat), 17, 13)
    assert(plane.forall(v => math.abs(v - 100.0) < 1e-9))
    // 64x64 → 32x32: each target cell is the exact mean of a 2x2 quad
    val src = Array.tabulate(64 * 64)(i => (i * 7) % 256)
    val out = Phash.resampleToN(src, 64, 64)
    for (ty <- 0 until 32; tx <- 0 until 32) {
      val quad = Seq(
        src(2 * ty * 64 + 2 * tx), src(2 * ty * 64 + 2 * tx + 1),
        src((2 * ty + 1) * 64 + 2 * tx), src((2 * ty + 1) * 64 + 2 * tx + 1))
      assert(math.abs(out(ty * 32 + tx) - quad.sum / 4.0) < 1e-9)
    }
  }

  test("phashDf dispatches PNG and JPEG payloads; junk yields no rows") {
    val png = PngCodec.encode(classImage(1))
    val jpeg = JpegEncoder.encode(classImage(1), quality = 95)
    val junk = "not an image".getBytes("UTF-8")
    val df = Seq((1L, png), (2L, jpeg), (3L, junk)).toDF("id", "p")
      .select(col("id"), struct(col("p").as("payload"), lit("x").as("mime")).as("media"))
    val out = Phash.phashDf(df, "id", "media")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("phash")).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(hamming(out(1L), out(2L)) <= 3, "PNG vs JPEG of one image drifted")
  }

  test("phashDf takes WebP (round 15): RGBA luma equals the mapped-grey hash exactly") {
    // a green-channel VP8L decodes to RGBA (0, g, 0, 255); its BT.601
    // luma plane is (587·g)/1000 — so the hash must EQUAL the hash of
    // the 1-channel image holding exactly those mapped values
    val img = classImage(3)
    require(img.channels == 1)
    val webp = graft.ops.WebpCodec.encodeGreen(img.width, img.height, img.pixels)
    val df = Seq((2L, webp)).toDF("id", "p")
      .select(col("id"), struct(col("p").as("payload"), lit("x").as("mime")).as("media"))
    val out = Phash.phashDf(df, "id", "media")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("phash")).toMap
    assert(out.keySet == Set(2L))
    val mapped = img.pixels.map(b => ((587 * (b & 0xFF)) / 1000).toByte)
    val expected = Phash.phash64(PngCodec.Image(img.width, img.height, 1, mapped))
    assert(out(2L) == expected, "WebP RGBA luma path diverged from the mapped-grey plane")
  }

  test("imageNearDups pairs planted classes and nothing else") {
    val docs = (0L until 40L).toDF("doc_id")
    val packed = Multimodal.packClassPng(docs, "doc_id", classes = 10)
    val pairs = graft.ops.Phash.imageNearDups(packed, "id", "media")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number]("hamming").longValue))
    // 10 classes × C(4,2) same-class pairs, all hamming 0
    assert(pairs.length == 10 * 6)
    assert(pairs.forall(_._3 == 0L))
    assert(pairs.forall { case (a, b, _) => a % 10 == b % 10 && a < b })
  }

  test("imageDedupGroups: one row per image, group = class minimum") {
    val docs = (0L until 40L).toDF("doc_id")
    val packed = Multimodal.packClassPng(docs, "doc_id", classes = 10)
    val groups = graft.ops.Phash.imageDedupGroups(packed, "id", "media")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups.size == 40, "linear contract: one output row per image")
    (0L until 40L).foreach(id =>
      assert(groups(id) == id % 10, s"image $id grouped as ${groups(id)}"))
  }
}
