package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Kmeans

/** Driver-local Lloyd's trainer: the degenerate-input contracts the
  * ADVICE items pinned (zero-norm spherical centroids, cascading
  * empty-cluster re-seeds, driver-memory-bounded sampling). Pure JVM —
  * no SparkSession.
  */
class KmeansSpec extends AnyFunSuite {

  test("spherical fit never returns a zero-norm centroid (antipodal cell)") {
    // 5 + 5 exactly antipodal unit vectors, one cluster: the cell mean
    // is the zero vector, which cannot be renormalized — the fix
    // re-seeds to a data point instead of keeping (0,0), which would
    // make every downstream cosine 0/0 = NaN
    val points = Array.fill(5)(Array(1.0, 0.0)) ++ Array.fill(5)(Array(-1.0, 0.0))
    val centers = Kmeans.fit(points, k = 1, seed = 1L, maxIter = 5, spherical = true)
    val n = math.sqrt(centers(0).map(x => x * x).sum)
    assert(math.abs(n - 1.0) < 1e-12, s"zero/unnormalized centroid survived: norm=$n")
  }

  test("fitted centroids are pairwise distinct on distinct-point data") {
    // k near n on well-spread data: any same-update double re-seed in
    // the old formulation duplicated a centroid; the fix reassigns the
    // chosen point between re-seeds so cascades pick distinct points
    val rnd = new scala.util.Random(3)
    val points = Array.fill(24)(Array.fill(4)(rnd.nextDouble() * 10))
    for (seed <- 0L until 4L) {
      val centers = Kmeans.fit(points, k = 12, seed = seed, maxIter = 10)
      val distinct = centers.map(_.toSeq).toSet
      assert(distinct.size == 12, s"duplicate centroids at seed $seed")
    }
  }

  test("cappedSampleSize bounds driver memory by n×dim, floors at 1024, never inflates") {
    assert(Kmeans.cappedSampleSize(65536, 64) == 65536) // 4M-double budget exactly
    assert(Kmeans.cappedSampleSize(65536, 1024) == 4096) // high dim shrinks rows
    assert(Kmeans.cappedSampleSize(65536, 1000000) == 1024) // floor keeps k<=256 fittable
    assert(Kmeans.cappedSampleSize(500, 64) == 500) // request below cap passes through
    assert(Kmeans.cappedSampleSize(500, 1000000) == 500) // floor never inflates a request
  }

  test("fit is deterministic and restart selection is by inertia") {
    val rnd = new scala.util.Random(11)
    val points = Array.fill(60)(Array.fill(3)(rnd.nextDouble()))
    val a = Kmeans.fit(points, k = 4, seed = 42L)
    val b = Kmeans.fit(points, k = 4, seed = 42L)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    // more restarts can only improve (or keep) the best inertia
    def inertia(cs: Array[Array[Double]]): Double = points.map { p =>
      cs.map(c => c.zip(p).map { case (x, y) => (x - y) * (x - y) }.sum).min
    }.sum
    val one = Kmeans.fit(points, k = 4, seed = 42L, restarts = 1)
    val four = Kmeans.fit(points, k = 4, seed = 42L, restarts = 4)
    assert(inertia(four) <= inertia(one) + 1e-12)
  }
}
