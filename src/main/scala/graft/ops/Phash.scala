package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual image hash (the classic DCT pHash, public algorithm —
  * Zauner 2010 "Implementation and Benchmarking of Perceptual Image
  * Hash Functions" and the pHash.org reference): grayscale → 32×32
  * area-average resample → 2D DCT-II → top-left 8×8 low-frequency
  * block → 64-bit signature, bit k set iff coefficient k exceeds the
  * median. Near-identical images (recompression, slight noise, small
  * edits) land within a few Hamming bits; unrelated images are ~32
  * bits apart — which makes IMAGE near-dup dedup the same banded
  * problem as [[Dedup.simhashNearDups]], and that is exactly how
  * [[imageNearDups]] runs it (64 bits, pigeonhole bands).
  *
  * Determinism: all math is integer or double with a
  * [[StrictMath]]-built DCT table, so the same payload hashes
  * identically on any JVM/platform.
  */
object Phash {

  private val N = 32 // resample + DCT size
  private val K = 8  // low-frequency block kept

  /** Orthonormal DCT-II basis for N=32, built once with StrictMath
    * (bit-identical on every platform). c(u,x) = s(u)·cos((2x+1)uπ/2N).
    */
  private lazy val Basis: Array[Array[Double]] = {
    val b = Array.ofDim[Double](N, N)
    var u = 0
    while (u < N) {
      val s = if (u == 0) StrictMath.sqrt(1.0 / N) else StrictMath.sqrt(2.0 / N)
      var x = 0
      while (x < N) {
        b(u)(x) = s * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / (2.0 * N))
        x += 1
      }
      u += 1
    }
    b
  }

  /** Integer BT.601 luma plane of a decoded image (1 or 3 channels). */
  private[graft] def lumaPlane(img: PngCodec.Image): Array[Int] = {
    val n = img.width * img.height
    val out = new Array[Int](n)
    var i = 0
    if (img.channels == 1) {
      while (i < n) { out(i) = img.pixels(i) & 0xFF; i += 1 }
    } else if (img.channels == 3) {
      while (i < n) {
        val r = img.pixels(i * 3) & 0xFF
        val g = img.pixels(i * 3 + 1) & 0xFF
        val b = img.pixels(i * 3 + 2) & 0xFF
        out(i) = (299 * r + 587 * g + 114 * b) / 1000
        i += 1
      }
    } else if (img.channels == 4) {
      // RGBA (the WebP decode shape): BT.601 over RGB, alpha ignored
      while (i < n) {
        val r = img.pixels(i * 4) & 0xFF
        val g = img.pixels(i * 4 + 1) & 0xFF
        val b = img.pixels(i * 4 + 2) & 0xFF
        out(i) = (299 * r + 587 * g + 114 * b) / 1000
        i += 1
      }
    } else {
      // anything wider: take the first channel of each pixel group
      while (i < n) { out(i) = img.pixels(i * img.channels) & 0xFF; i += 1 }
    }
    out
  }

  /** Exact area-average resample of a gray plane to N×N: target cell
    * (tx, ty) integrates the source rectangle it covers, fractional
    * edge rows/columns weighted by coverage. Deterministic double
    * arithmetic; handles any source dims ≥ 1.
    */
  private[graft] def resampleToN(src: Array[Int], w: Int, h: Int): Array[Double] = {
    val out = new Array[Double](N * N)
    val sx = w.toDouble / N
    val sy = h.toDouble / N
    var ty = 0
    while (ty < N) {
      val y0 = ty * sy
      val y1 = (ty + 1) * sy
      var tx = 0
      while (tx < N) {
        val x0 = tx * sx
        val x1 = (tx + 1) * sx
        var acc = 0.0
        var area = 0.0
        var yy = math.floor(y0).toInt
        while (yy < h && yy.toDouble < y1) {
          val wy = math.min(y1, yy + 1.0) - math.max(y0, yy.toDouble)
          var xx = math.floor(x0).toInt
          while (xx < w && xx.toDouble < x1) {
            val wx = math.min(x1, xx + 1.0) - math.max(x0, xx.toDouble)
            acc += src(yy * w + xx) * wx * wy
            area += wx * wy
            xx += 1
          }
          yy += 1
        }
        out(ty * N + tx) = if (area > 0) acc / area else 0.0
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** 64-bit pHash of a decoded image. */
  def phash64(img: PngCodec.Image): Long = {
    val plane = resampleToN(lumaPlane(img), img.width, img.height)
    // separable 2D DCT-II, keeping only the K×K low-frequency corner
    val rows = Array.ofDim[Double](N, K) // row-transformed, first K cols
    var y = 0
    while (y < N) {
      var v = 0
      while (v < K) {
        var s = 0.0
        var x = 0
        val bv = Basis(v)
        while (x < N) { s += plane(y * N + x) * bv(x); x += 1 }
        rows(y)(v) = s
        v += 1
      }
      y += 1
    }
    val coef = new Array[Double](K * K)
    var u = 0
    while (u < K) {
      val bu = Basis(u)
      var v = 0
      while (v < K) {
        var s = 0.0
        var yy = 0
        while (yy < N) { s += rows(yy)(v) * bu(yy); yy += 1 }
        coef(u * K + v) = s
        v += 1
      }
      u += 1
    }
    val sorted = coef.clone()
    java.util.Arrays.sort(sorted)
    val median = (sorted(K * K / 2 - 1) + sorted(K * K / 2)) / 2.0
    var bits = 0L
    var k = 0
    while (k < K * K) {
      if (coef(k) > median) bits |= (1L << k)
      k += 1
    }
    bits
  }

  /** Sniff-and-decode an image payload (PNG / GIF / JPEG / WebP
    * magic) with the from-spec codecs; None for anything else or any
    * decline.
    */
  private[graft] def decodeAny(p: Array[Byte]): Option[PngCodec.Image] = {
    if (p.length < 4) None
    else if ((p(0) & 0xFF) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G')
      PngCodec.decode(p)
    else if (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8')
      GifCodec.decode(p)
    else if ((p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8)
      JpegCodec.decode(p)
    else if (p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'E' && p(10) == 'B' && p(11) == 'P')
      WebpCodec.decode(p)
    else if ((p(0) == 'I' && p(1) == 'I' && (p(2) & 0xFF) == 0x2A && p(3) == 0) ||
      (p(0) == 'M' && p(1) == 'M' && p(2) == 0 && (p(3) & 0xFF) == 0x2A))
      TiffCodec.decode(p)
    else None
  }

  /** Distributed pHash: (id, width, height, phash) per decodable
    * image payload; undecodable rows produce no output. Pure
    * mapPartitions projection — scan-local at any scale.
    */
  def phashDf(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(mediaCol + ".payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          decodeAny(payload).map(img =>
            (id, img.width, img.height, phash64(img)))
        }
      }
      .toDF("id", "width", "height", "phash")
  }

  /** Image near-duplicate pairs: pHash signatures through the
    * [[Dedup.simhashNearDups]] pigeonhole banding (identical-signature
    * collapse, ≥1 exact band match for Hamming ≤ bands−1, exact
    * popcount verify). Output (a_id, b_id, hamming).
    */
  def imageNearDups(df: DataFrame, idCol: String, mediaCol: String,
      maxDist: Int = 3, bands: Int = 4, maxBucketSize: Int = 0): DataFrame = {
    val sig = phashDf(df, idCol, mediaCol)
      .select(col("id").as(idCol), col("phash").as("simhash"))
    Dedup.simhashNearDups(sig, idCol, maxDist = maxDist, bits = 64,
      bands = bands, maxBucketSize = maxBucketSize)
  }

  /** The SCALE surface of image dedup: (id, group_id) assignments
    * instead of member pairs — pHash signatures through
    * [[Dedup.simhashDedupGroups]] (rep-level pairs contracted by
    * connected components, members mapped through their signature).
    * One output row per decodable image, linear at any duplication
    * density, where [[imageNearDups]]'s pair contract is O(Σ group²).
    * `group_id` = minimum id reachable via the ≤`maxDist` Hamming
    * relation on pHash signatures.
    */
  def imageDedupGroups(df: DataFrame, idCol: String, mediaCol: String,
      maxDist: Int = 3, bands: Int = 4, maxBucketSize: Int = 0): DataFrame = {
    val sig = phashDf(df, idCol, mediaCol)
      .select(col("id").as(idCol), col("phash").as("simhash"))
    Dedup.simhashDedupGroups(sig, idCol, maxDist = maxDist, bits = 64,
      bands = bands, maxBucketSize = maxBucketSize)
  }
}
