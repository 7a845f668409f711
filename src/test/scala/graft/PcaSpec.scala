package graft

import org.apache.spark.sql.functions._

import graft.ops.Pca

/** PCA / whitening: recovery of planted low-rank structure,
  * orthonormal components, whitened variances, layout robustness.
  */
class PcaSpec extends SparkSuite {
  import spark.implicits._

  private val dim = 16
  private val rank = 3

  /** 400 vectors in a planted 3-dim subspace of R^16 plus small noise:
    * deterministic LCG, no test-time randomness.
    */
  private def planted = {
    val rnd = new scala.util.Random(7)
    val basis = Array.fill(rank, dim)(rnd.nextGaussian())
    val rows = (0 until 400).map { i =>
      val coef = Array.fill(rank)(rnd.nextGaussian() * (rank + 1))
      val v = Array.tabulate(dim) { j =>
        var s = 0.01 * rnd.nextGaussian() // noise floor
        var r = 0
        while (r < rank) { s += coef(r) * basis(r)(j); r += 1 }
        s
      }
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("planted rank-3 structure: top-3 variance explained, sharp spectral drop") {
    val m = Pca.fit(planted, "embedding", dim, k = dim)
    assert(m.varianceExplained(rank) > 0.999)
    assert(m.eigenvalues(rank - 1) > 100 * m.eigenvalues(rank)) // spectrum cliff
    assert(m.eigenvalues.sliding(2).forall(w => w(0) >= w(1) - 1e-12))
  }

  test("components are orthonormal; projection matches manual centering") {
    val m = Pca.fit(planted, "embedding", dim, k = 5)
    for (i <- 0 until 5; j <- i until 5) {
      val d = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-9, s"W$i . W$j = $d")
    }
    val row = planted.where(col("vec_id") === 7L).head().getSeq[Double](1).toArray
    val got = m.project(planted, "embedding", "proj")
      .where(col("vec_id") === 7L).select("proj").head().getSeq[Double](0)
    val want = m.components.map(w =>
      w.indices.map(t => (row(t) - m.mean(t)) * w(t)).sum)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-9) }
  }

  test("whitened coordinates have unit variance on informative directions") {
    val m = Pca.fit(planted, "embedding", dim, k = rank)
    val proj = m.project(planted, "embedding", "w", whiten = true)
    val vars = (0 until rank).map { j =>
      proj.agg(var_pop(element_at(col("w"), j + 1))).head().getDouble(0)
    }
    vars.foreach(v => assert(math.abs(v - 1.0) < 1e-6, s"whitened var $v"))
  }

  test("fit is stable under repartitioning (distributed-sum order)") {
    val one = Pca.fit(planted.repartition(1), "embedding", dim, k = 4)
    val many = Pca.fit(planted.repartition(7), "embedding", dim, k = 4)
    one.mean.zip(many.mean).foreach { case (a, b) => assert(math.abs(a - b) < 1e-8) }
    one.eigenvalues.zip(many.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6) }
    for (j <- 0 until 4)
      one.components(j).zip(many.components(j)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-5) }
  }

  test("degenerate directions whiten to zero, not infinity") {
    // rank-1 data: only one non-zero eigenvalue
    val df = (0 until 50).map(i => (i.toLong, Seq(i.toDouble, 2.0 * i, 0.0)))
      .toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding", 3, k = 3)
    val proj = m.project(df, "embedding", "w", whiten = true)
    val last = proj.agg(max(abs(element_at(col("w"), 3)))).head().getDouble(0)
    assert(last == 0.0)
  }
}
