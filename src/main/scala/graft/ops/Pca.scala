package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA / whitening for embedding columns — the dimensionality-reduction
  * tier of the embedding stack. Standard corpus practice ahead of ANN
  * and near-dup search (FAISS's PCAMatrix / OPQ pre-transforms):
  * project 64–1024-dim embeddings onto the top-k principal directions,
  * optionally whiten, and every downstream byte (LSH planes, PQ codes,
  * IVF cells) buys more recall per bit.
  *
  * Scale design (the spark.ml RowMatrix.computeCovariance shape,
  * re-expressed):
  *  - **One distributed pass.** Each partition folds its rows into
  *    (count, Σx, upper-triangular Σxxᵀ) — d(d+1)/2 + d doubles of
  *    task-local state, independent of row count. This is the genuine
  *    per-partition-imperative case `mapPartitions` exists for: a
  *    Catalyst expression would materialize a d²-element array per ROW
  *    and aggregate those, shuffling d² values per input row instead
  *    of per partition.
  *  - **Tiny result, driver finish.** One small row per partition
  *    comes back (kilobytes at any corpus size); the driver combines
  *    them IN PARTITION ORDER (deterministic for a fixed layout),
  *    forms the covariance, and runs cyclic Jacobi eigendecomposition
  *    on the d×d matrix — microseconds for embedding-sized d, no
  *    cluster iteration, bit-deterministic.
  *  - **Projection is codegen'd.** Each output coordinate is one
  *    [[graft.expr.VecDot]] kernel against a literal component vector
  *    minus a precomputed scalar (dot(v,w) − dot(mean,w) ≡
  *    dot(v−mean, w)) — scan-speed, no UDF, no shuffle, and the
  *    centering never builds a per-row centered array.
  *
  * Eigenvector conventions (so results are reproducible and
  * comparable across runs): eigenpairs sorted by eigenvalue
  * descending (ties: original index order), each component's sign
  * fixed so its largest-|coordinate| entry is positive (ties: the
  * earliest such index).
  */
object Pca {

  /** Fitted model. `eigenvalues` are ALL d variances, descending;
    * `components` the top-k unit eigenvectors (k × d).
    */
  final case class PcaModel(
      mean: Array[Double],
      eigenvalues: Array[Double],
      components: Array[Array[Double]]) {

    def dim: Int = mean.length
    def k: Int = components.length

    /** Fraction of total variance captured by the first `upTo`
      * components. */
    def varianceExplained(upTo: Int): Double = {
      val tot = eigenvalues.sum
      if (tot <= 0) 0.0 else eigenvalues.take(upTo).sum / tot
    }

    /** Append `outCol`: array<double> of the k projected (optionally
      * whitened) coordinates. Whitening divides coordinate j by
      * sqrt(λ_j) — degenerate directions (λ ≤ eps) map to 0 rather
      * than exploding.
      */
    def project(df: DataFrame, vecCol: String, outCol: String,
        whiten: Boolean = false, eps: Double = 1e-12): DataFrame = {
      val v = Similarity.toDoubleVec(col(vecCol))
      val coords = components.zipWithIndex.map { case (w, j) =>
        val meanDot = { var s = 0.0; var i = 0
          while (i < w.length) { s += mean(i) * w(i); i += 1 }; s }
        val raw = graft.expr.VecDot(v, lit(w)) - lit(meanDot)
        if (!whiten) raw
        else if (eigenvalues(j) > eps) raw / lit(math.sqrt(eigenvalues(j)))
        else lit(0.0)
      }
      df.withColumn(outCol, array(coords.toIndexedSeq: _*))
    }
  }

  /** Fit on a vector column. `dim` is asserted against the data;
    * `k` defaults to full rank (callers slice via varianceExplained).
    */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int): PcaModel = {
    require(k >= 1 && k <= dim, s"pca: k=$k must be in [1, $dim]")
    val spark = df.sparkSession
    import spark.implicits._
    val tri = dim * (dim + 1) / 2
    val partials = df
      .select(Similarity.toDoubleVec(col(vecCol)).as("__v")).as[Seq[Double]]
      .mapPartitions { it =>
        var n = 0L
        val s = new Array[Double](dim)
        val p = new Array[Double](tri)
        it.foreach { row =>
          val v = row.toArray
          require(v.length == dim,
            s"pca: vector of dim ${v.length}, expected $dim")
          n += 1
          var i = 0; var t = 0
          while (i < dim) {
            s(i) += v(i)
            var j = i
            while (j < dim) { p(t) += v(i) * v(j); j += 1; t += 1 }
            i += 1
          }
        }
        if (n == 0) Iterator.empty
        else Iterator.single((n, s.toSeq, p.toSeq))
      }
      .collect() // one row per non-empty partition, partition order
    require(partials.nonEmpty, "pca: empty input")
    var n = 0L
    val s = new Array[Double](dim)
    val p = new Array[Double](tri)
    partials.foreach { case (pn, ps, pp) =>
      n += pn
      var i = 0
      while (i < dim) { s(i) += ps(i); i += 1 }
      i = 0
      while (i < tri) { p(i) += pp(i); i += 1 }
    }
    val mean = s.map(_ / n)
    // covariance (population, 1/n — the variance the whitening divides by)
    val cov = Array.ofDim[Double](dim, dim)
    var i = 0; var t = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = p(t) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; t += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    PcaModel(mean, values, vectors.take(k))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix:
    * sweep all upper-triangular pivots in row order, rotate away each
    * off-diagonal element, until the off-diagonal mass is ~0 (or 64
    * sweeps). Deterministic: fixed pivot order, no randomness.
    * Returns (eigenvalues descending, matching unit row-eigenvectors,
    * signs fixed largest-|coord|-positive).
    */
  private[ops] def jacobiEigen(mIn: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = mIn.length
    val a = mIn.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val tol = 1e-14 * math.max(1.0, a.indices.map(i => math.abs(a(i)(i))).max)
    while (sweep < 64 && off > tol) {
      var pI = 0
      while (pI < d - 1) {
        var qI = pI + 1
        while (qI < d) {
          val apq = a(pI)(qI)
          if (math.abs(apq) > tol / (d * d)) {
            val theta = (a(qI)(qI) - a(pI)(pI)) / (2.0 * apq)
            val tt = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case sg  => sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(tt * tt + 1.0)
            val sn = tt * c
            var r = 0
            while (r < d) {
              val arp = a(r)(pI); val arq = a(r)(qI)
              a(r)(pI) = c * arp - sn * arq
              a(r)(qI) = sn * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(pI)(r); val aqr = a(qI)(r)
              a(pI)(r) = c * apr - sn * aqr
              a(qI)(r) = sn * apr + c * aqr
              val vpr = v(pI)(r); val vqr = v(qI)(r)
              v(pI)(r) = c * vpr - sn * vqr
              v(qI)(r) = sn * vpr + c * vqr
              r += 1
            }
          }
          qI += 1
        }
        pI += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map { i =>
      val w = v(i).clone()
      // sign convention: largest-|coord| entry positive
      var mi = 0; var j = 1
      while (j < d) { if (math.abs(w(j)) > math.abs(w(mi))) mi = j; j += 1 }
      if (w(mi) < 0) { j = 0; while (j < d) { w(j) = -w(j); j += 1 } }
      w
    }.toArray
    (values, vectors)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += math.abs(a(i)(j)); j += 1 }
      i += 1
    }
    s
  }
}
