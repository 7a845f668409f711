package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic driver-local Lloyd's k-means over a BOUNDED training
  * sample — the codebook/quantizer trainer for the PQ and IVF tiers.
  *
  * Why not spark.ml KMeans on the full corpus:
  *  - **Scale.** Nobody clusters 100 TB to learn a 16×16 codebook.
  *    Standard practice (FAISS faiss/Clustering.cpp caps training at
  *    `max_points_per_centroid`) trains on a bounded sample — a few
  *    hundred vectors per centroid is plenty. A full-corpus fit costs
  *    `maxIter` cluster-wide passes PER SUBSPACE; the sample costs one
  *    bounded top-k scan, after which all m subspace fits run on
  *    kilobytes of driver memory in microseconds.
  *  - **Determinism.** spark.ml's seeded init samples per input
  *    partition, so the fitted centers change whenever the file-split
  *    layout does (different core count, different
  *    maxPartitionBytes) — a recall gate can flip without a code
  *    change. Here the sample is an order-statistic of a content hash
  *    (bottom-k by xxhash64), the init is the specified java.util
  *    .Random LCG over that sorted sample, and Lloyd's itself is
  *    sequential — bit-identical on any cluster layout.
  *
  * The sample bound is a documented knob (`sampleSize`): recall is
  * governed by how well centroids cover the data distribution, and a
  * hash-uniform sample of ~4k points per 16 centroids estimates cell
  * means to well under quantization error. Callers needing sharper
  * cells on huge corpora raise it; the cost stays one top-k scan.
  */
object Kmeans {

  /** Bottom-`n`-by-hash sample of a vector column, as driver arrays.
    *
    * Deterministic under any partitioning: rank = xxhash64 of the
    * hash column values themselves (content, not position), and the
    * plan is TakeOrderedAndProject — per-partition bounded heaps, a
    * single driver merge, never a full sort shuffle. At 100 TB this
    * reads the scan once and ships back `n` rows.
    *
    * Driver cost is n×dim doubles (boxed `Seq` during collect, a few
    * × that transiently) — NOT dim-independent kilobytes. Callers
    * pass `n` through [[cappedSampleSize]] so a high-dim vector
    * column cannot blow the driver heap / spark.driver.maxResultSize
    * with the row-count default.
    */
  def sampleVectors(df: DataFrame, hashCols: Seq[Column], vec: Column, n: Int): Array[Array[Double]] =
    df.select(xxhash64(hashCols: _*).as("__h"), vec.as("__v"))
      .orderBy(col("__h"))
      .limit(n)
      .collect()
      .map(_.getSeq[Double](1).toArray)

  /** Bound a requested sample size by a driver-memory budget expressed
    * in primitive doubles (default 4M ≈ 32 MB raw): the sample costs
    * n×dim doubles on the driver, so the row-count knob alone is not a
    * memory bound when dim is large. The budget floor of 1024 rows
    * keeps enough points for any k ≤ 256 fit (FAISS-style guidance is
    * a few hundred points per centroid); the result never exceeds
    * `requested`.
    */
  def cappedSampleSize(requested: Int, dim: Int, maxDoubles: Long = 4L << 20): Int =
    math.min(requested, math.max(1024, (maxDoubles / math.max(1, dim)).toInt))

  /** kmeans++ init + Lloyd's, best of `restarts` seeded attempts (the
    * fit with the lowest total inertia wins — ties keep the earlier
    * attempt). Restarts are nearly free here: each runs over the
    * driver-local sample, so 4 restarts cost microseconds where one
    * extra cluster-wide pass of the old formulation cost a full scan.
    *
    * `points` must arrive in a deterministic order (callers sort by
    * content hash). Assignment ties break to the lowest centroid
    * index; an emptied cluster is re-seeded to the point farthest from
    * its current centroid (lowest index on ties) — every choice is
    * total, so the fit is reproducible anywhere.
    *
    * `spherical = true` renormalizes each centroid to unit L2 after
    * every update (classic spherical k-means): on unit-norm inputs,
    * euclidean assignment ≡ cosine assignment, and downstream `dot`
    * against the returned centroids IS cosine — assignment and probe
    * can never disagree about cell nearness.
    */
  def fit(points: Array[Array[Double]], k: Int, seed: Long,
      maxIter: Int = 10, spherical: Boolean = false, restarts: Int = 4): Array[Array[Double]] = {
    val rs = math.max(1, restarts)
    // Restarts are independent (each seeded r-distinctly), so they run
    // in PARALLEL on the driver; the winner is then picked by a SERIAL
    // scan with the same strict-< tie-break as the old sequential
    // loop, so the chosen centroids are bit-identical — this is a
    // wall-clock change only. (Training samples are bounded by
    // construction, so this is driver-local CPU, not cluster work.)
    val cands = new Array[Array[Array[Double]]](rs)
    val inertias = new Array[Double](rs)
    def runOne(r: Int): Unit = {
      val cand = fitOnce(points, k, seed + 1000003L * r, maxIter, spherical)
      var s = 0.0; var i = 0
      while (i < points.length) {
        var bd = Double.MaxValue; var j = 0
        while (j < k) {
          var d = 0.0; var t = 0
          val p = points(i); val c = cand(j)
          while (t < p.length) { val x = p(t) - c(t); d += x * x; t += 1 }
          if (d < bd) bd = d
          j += 1
        }
        s += bd; i += 1
      }
      cands(r) = cand; inertias(r) = s
    }
    if (rs > 1 && points.length * k > 4096)
      java.util.stream.IntStream.range(0, rs).parallel().forEach(runOne(_))
    else { var r = 0; while (r < rs) { runOne(r); r += 1 } }
    var best: Array[Array[Double]] = null
    var bestInertia = Double.MaxValue
    var r = 0
    while (r < rs) {
      if (inertias(r) < bestInertia) { bestInertia = inertias(r); best = cands(r) }
      r += 1
    }
    best
  }

  private def fitOnce(points: Array[Array[Double]], k: Int, seed: Long,
      maxIter: Int, spherical: Boolean): Array[Array[Double]] = {
    require(points.nonEmpty, "kmeans: empty training sample")
    val n = points.length
    val dim = points(0).length
    val rng = new java.util.Random(seed)

    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    def renorm(c: Array[Double]): Array[Double] = {
      var s = 0.0; var i = 0
      while (i < dim) { s += c(i) * c(i); i += 1 }
      val nrm = math.sqrt(s)
      if (nrm > 0) { i = 0; while (i < dim) { c(i) /= nrm; i += 1 } }
      c
    }
    def isZero(c: Array[Double]): Boolean = {
      var i = 0
      while (i < dim && c(i) == 0.0) i += 1
      i == dim
    }

    // kmeans++ seeding: D²-weighted draws from the hash-ordered sample
    val centers = Array.ofDim[Array[Double]](k)
    centers(0) = points(rng.nextInt(n)).clone()
    val minD2 = points.map(p => d2(p, centers(0)))
    var c = 1
    while (c < k) {
      val total = minD2.sum
      val pick =
        if (total <= 0) rng.nextInt(n) // degenerate: all mass on chosen points
        else {
          val r = rng.nextDouble() * total
          var acc = 0.0; var i = 0; var chosen = n - 1
          while (i < n && chosen == n - 1) {
            acc += minD2(i)
            if (acc >= r) chosen = i
            i += 1
          }
          chosen
        }
      centers(c) = points(pick).clone()
      var i = 0
      while (i < n) {
        val d = d2(points(i), centers(c))
        if (d < minD2(i)) minD2(i) = d
        i += 1
      }
      c += 1
    }
    if (spherical) centers.foreach(renorm)

    // Lloyd's iterations
    val assign = new Array[Int](n)
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      moved = false
      var i = 0
      while (i < n) {
        var best = 0; var bestD = d2(points(i), centers(0))
        var j = 1
        while (j < k) {
          val d = d2(points(i), centers(j))
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        if (assign(i) != best || iter == 0) { assign(i) = best; moved = true }
        i += 1
      }
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      i = 0
      while (i < n) {
        val a = assign(i); val p = points(i)
        counts(a) += 1
        var t = 0
        while (t < dim) { sums(a)(t) += p(t); t += 1 }
        i += 1
      }
      var j = 0
      while (j < k) {
        val needReseed =
          if (counts(j) == 0) true
          else {
            var t = 0
            while (t < dim) { sums(j)(t) /= counts(j); t += 1 }
            // spherical: an all-zero mean (antipodal cell, or a cell of
            // zero vectors) cannot be renormalized — a zero centroid
            // would make downstream cosine ranking 0/0 = NaN, so it
            // takes the re-seed path like an emptied cell
            if (spherical && isZero(sums(j))) true
            else { centers(j) = if (spherical) renorm(sums(j)) else sums(j); false }
          }
        if (needReseed) {
          // re-seed to the point farthest from its assigned centroid
          // (deterministic: lowest index on ties), then REASSIGN that
          // point to j — so when several cells re-seed in the same
          // update, the next farthest-point computation sees the
          // previous choice at distance 0 and cannot pick it again
          // (duplicate centroids otherwise)
          var far = 0; var farD = -1.0; var i2 = 0
          while (i2 < n) {
            val d = d2(points(i2), centers(assign(i2)))
            if (d > farD) { farD = d; far = i2 }
            i2 += 1
          }
          centers(j) = {
            val cl = points(far).clone()
            if (spherical) renorm(cl) else cl
          }
          assign(far) = j
        }
        j += 1
      }
      iter += 1
    }
    centers
  }
}
