package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding columns — the compression
  * tier of the ANN stack (SURVEY §2.6 similarity search).
  *
  * At the 100 TB design point the corpus of raw float vectors cannot
  * be scanned per query batch: 64-dim float32 is 256 bytes/vector,
  * while an m=8 PQ code is 8 BYTES — a 32× reduction that turns the
  * scan into a table-lookup sum (ADC: asymmetric distance
  * computation). The classic recall/size ladder is brute-force →
  * sign-LSH / IVF (this repo) → IVF+PQ; this module supplies the PQ
  * rung and composes with the others (encode the residuals or the raw
  * vectors per IVF cell).
  *
  * Design, Spark-first:
  *  - [[Pq.train]]: ONE bounded deterministic sample of the corpus
  *    (bottom-k by content hash, a TakeOrderedAndProject scan — see
  *    [[Kmeans.sampleVectors]]), then m independent driver-local
  *    Lloyd's fits over its dim/m subspaces (k ≤ 256 so a code fits a
  *    byte). The codebook is m×k×dsub doubles — kilobytes — and rides
  *    a broadcast.
  *  - [[PqModel.encode]]: one `mapPartitions` pass over the corpus
  *    (argmin per subspace against the broadcast codebook). A custom
  *    Expression can't host the data-dependent codebook matrix, so
  *    this is the same honestly-declared kernel seam as the
  *    multimodal codecs: per-partition init, streaming rows, no
  *    driver involvement.
  *  - [[PqModel.search]]: per query, an m×k lookup table of
  *    subspace dot products (built once per query against the
  *    broadcast codebook); scoring a corpus vector is m byte-indexed
  *    adds — no float vector is ever read. Approximate cosine =
  *    ADC-dot / (‖q‖·‖x̂‖) with ‖x̂‖ precomputed per row at encode
  *    time from the codebook. Candidates rank through the same
  *    bounded-heap [[TopKByScore]] aggregate as the other ANN tiers
  *    (no Window.partitionBy).
  *
  * Quality contract: approximate by construction (quantization
  * error), so like IVF it ships with an in-engine recall measurement
  * against [[Similarity.bruteForceTopK]] (see PqSpec) rather than a
  * value-level oracle.
  */
object Pq {

  /** Trained product quantizer: `centroids(j)(c)` is the `dsub`-dim
    * centroid `c` of subspace `j`; `norms2(j)(c)` its squared L2 norm
    * (so ‖x̂‖² of a code is a lookup sum, not a recomputation).
    */
  final case class PqModel(
      m: Int, ksub: Int, dsub: Int,
      centroids: Array[Array[Array[Double]]],
      norms2: Array[Array[Double]]) {

    def dim: Int = m * dsub

    /** (id, codes array<short>, ‖x̂‖) — codes indexed by subspace. */
    def encode(corpus: DataFrame, idCol: String, vecCol: String): DataFrame = {
      val spark = corpus.sparkSession
      import spark.implicits._
      val bc = spark.sparkContext.broadcast(this)
      corpus.select(col(idCol).cast("long").as("id"),
          Similarity.toDoubleVec(col(vecCol)).as("v"))
        .as[(Long, Array[Double])]
        .mapPartitions { it =>
          val model = bc.value
          it.map { case (id, v) =>
            val codes = new Array[Short](model.m)
            var recNorm2 = 0.0
            var j = 0
            while (j < model.m) {
              val cents = model.centroids(j)
              var best = 0
              var bestD = Double.MaxValue
              var c = 0
              while (c < cents.length) {
                val cent = cents(c)
                var d = 0.0
                var t = 0
                while (t < model.dsub) {
                  val diff = v(j * model.dsub + t) - cent(t)
                  d += diff * diff
                  t += 1
                }
                if (d < bestD) { bestD = d; best = c }
                c += 1
              }
              codes(j) = best.toShort
              recNorm2 += model.norms2(j)(best)
              j += 1
            }
            (id, codes, math.sqrt(recNorm2))
          }
        }.toDF("id", "codes", "rec_norm")
    }

    /** ADC top-k: every query builds its m×ksub dot-product lookup
      * table once; each encoded corpus row costs m indexed adds.
      * Output (query_id, neighbor_id, cosine, rank) where cosine is
      * the ADC approximation dot(q, x̂)/(‖q‖·‖x̂‖).
      */
    def search(queries: DataFrame, queryIdCol: String, vecCol: String,
        encoded: DataFrame, k: Int): DataFrame = {
      val spark = queries.sparkSession
      import spark.implicits._
      val model = this
      val bcModel = spark.sparkContext.broadcast(model)
      val qRows = Similarity.assertQueryCap(queries, "Pq.search")
        .select(col(queryIdCol).cast("long").as("qid"),
          Similarity.toDoubleVec(col(vecCol)).as("v"))
        .as[(Long, Array[Double])].collect()
      val bcLuts = spark.sparkContext.broadcast(buildLuts(qRows))
      val scored = encoded.select(col("id"), col("codes"), col("rec_norm"))
        .as[(Long, Array[Short], Double)]
        .mapPartitions { it =>
          val model = bcModel.value
          val qs = bcLuts.value
          it.flatMap { case (id, codes, recNorm) =>
            qs.iterator.flatMap { case (qid, lut, qNorm) =>
              if (qid == id) Iterator.empty
              else {
                var dot = 0.0
                var j = 0
                while (j < model.m) { dot += lut(j * model.ksub + codes(j)); j += 1 }
                val denom = qNorm * recNorm
                Iterator.single((qid, id, if (denom > 0) dot / denom else 0.0))
              }
            }
          }
        }.toDF("query_id", "neighbor_id", "cosine")
      // bounded-heap ranking, same as every other ANN tier
      scored.groupBy("query_id")
        .agg(TopKByScore.of(col("cosine"), col("neighbor_id"), k).as("__top"))
        .select(col("query_id"), posexplode(col("__top")).as(Seq("__pos", "__p")))
        .select(col("query_id"), col("__p._2").as("neighbor_id"),
          col("__p._1").as("cosine"), (col("__pos") + 1).cast("long").as("rank"))
    }

    /** Per-query ADC lookup tables: lut(j*ksub + c) = dot(q_sub_j,
      * centroid_jc), plus ‖q‖. Tiny (m×ksub doubles per query). */
    private[ops] def buildLuts(
        qRows: Array[(Long, Array[Double])]): Array[(Long, Array[Double], Double)] =
      qRows.map { case (qid, qv) =>
        val lut = new Array[Double](m * ksub)
        var j = 0
        while (j < m) {
          var c = 0
          while (c < ksub) {
            val cent = centroids(j)(c)
            var d = 0.0
            var t = 0
            while (t < dsub) { d += qv(j * dsub + t) * cent(t); t += 1 }
            lut(j * ksub + c) = d
            c += 1
          }
          j += 1
        }
        var n2 = 0.0
        var i = 0
        while (i < qv.length) { n2 += qv(i) * qv(i); i += 1 }
        (qid, lut, math.sqrt(n2))
      }

    /** Persist codebook (+ shape) as one small json file. */
    def save(path: String, spark: SparkSession): Unit = {
      import spark.implicits._
      val rows = for (j <- 0 until m; c <- 0 until ksub)
        yield (j, c, centroids(j)(c).toSeq)
      rows.toDF("subspace", "code", "centroid")
        .withColumn("m", lit(m)).withColumn("ksub", lit(ksub)).withColumn("dsub", lit(dsub))
        .coalesce(1).write.mode("overwrite").json(path)
    }
  }

  /** Train: one bounded deterministic sample of the corpus (bottom-k
    * by content hash — see [[Kmeans.sampleVectors]]), then m
    * independent per-subspace driver-local Lloyd's fits over it
    * (k ≤ 256 so codes fit a byte).
    *
    * Scale contract: the corpus is scanned ONCE (a TakeOrderedAndProject
    * top-k, no sort shuffle) regardless of m or maxIter; the m fits run
    * on ≤ `sampleSize`×dim driver doubles — kilobytes-to-megabytes.
    * This is the FAISS-style training bound (codebooks need a few
    * hundred points per centroid, not the corpus): at 100 TB the
    * previous formulation (m×maxIter full-corpus spark.ml passes) is a
    * non-starter, and its per-partition seeded init made centroids
    * depend on the file-split layout. `sampleSize` is the quality knob:
    * raise it for sharper cells; the cost stays one bounded scan (and
    * is additionally bounded by [[Kmeans.cappedSampleSize]] so high-dim
    * vectors cannot blow the driver heap).
    *
    * `idCol`, when the corpus has one, is the sample's hash key (as in
    * [[Similarity.IvfIndex.build]]). Hashing the vector CONTENT instead
    * gives every duplicate of one vector the same rank key, so a
    * heavily duplicated embedding (a padding/zero vector) whose hash
    * lands low floods the bounded sample all-or-nothing and skews the
    * codebook; distinct ids spread duplicates uniformly.
    */
  def train(corpus: DataFrame, vecCol: String, dim: Int,
      m: Int = 8, ksub: Int = 16, seed: Long = 42L, maxIter: Int = 30,
      sampleSize: Int = 65536, idCol: Option[String] = None): PqModel = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    require(ksub <= 256, "ksub must fit a byte")
    val v = Similarity.toDoubleVec(col(vecCol))
    val hashKey = idCol.map(c => Seq(col(c))).getOrElse(Seq(col(vecCol)))
    val sample = Kmeans.sampleVectors(corpus, hashKey, v,
      Kmeans.cappedSampleSize(sampleSize, dim))
    trainOnSample(sample, dim, m, ksub, seed, maxIter)
  }

  /** The m per-subspace fits, given an already-collected sample (shared
    * with the residual path, which samples (vector, cell) jointly).
    * Restart count scales INVERSELY with ksub: at small codebooks
    * (ksub ≤ 32) retrieval recall is sensitive to seeding luck, and a
    * restart on the driver-local sample costs microseconds-to-
    * milliseconds (measured at sf0.001: 0.22 → 0.38 recall@5 going
    * 4 → 8 restarts at ksub=16) — so 8 restarts there. At ksub = 256
    * the codebook covers the sample densely, seeding barely moves
    * recall, and each restart is 16× the work — 2 restarts keep the
    * training cost flat across the ksub curve (measured: recall@5
    * unchanged at 0.88, x_ann_ivfpq_recall 5.7 s → ~3 s at sf0.1).
    */
  private[ops] def trainOnSample(sample: Array[Array[Double]], dim: Int,
      m: Int, ksub: Int, seed: Long, maxIter: Int): PqModel = {
    val dsub = dim / m
    val restarts = if (ksub <= 32) 8 else 2
    // the m subspace fits are independent (seed + j each): run them in
    // parallel on the driver — per-subspace arithmetic is unchanged,
    // so every codebook is bit-identical to the sequential loop's
    val centroids = new Array[Array[Array[Double]]](m)
    java.util.stream.IntStream.range(0, m).parallel().forEach { j =>
      val sub = sample.map(p => java.util.Arrays.copyOfRange(p, j * dsub, (j + 1) * dsub))
      centroids(j) = Kmeans.fit(sub, ksub, seed + j, maxIter, restarts = restarts)
    }
    val norms2 = centroids.map(_.map(c => c.map(x => x * x).sum))
    PqModel(m, ksub, dsub, centroids, norms2)
  }

  /** OPQ-style rotation (Ge et al., "Optimized Product Quantization",
    * CVPR 2013 — the non-parametric eigenvalue-allocation variant,
    * also FAISS's OPQMatrix shape): an orthonormal rotation applied
    * before the subspace split so the m independent codebooks quantize
    * DECORRELATED, variance-balanced subspaces. Plain PQ splits on
    * raw dimension order; when dimensions are correlated (or variance
    * concentrates in a few of them) some subspaces burn their ksub
    * codes on redundant structure while others starve — the classic
    * PQ failure mode the rotation removes.
    *
    * Construction, all driver-local on the (bounded) training sample:
    * PCA row-eigenvectors of the sample covariance (reusing
    * [[Pca.jacobiEigen]] — deterministic pivot order), then greedy
    * eigenvalue allocation: walk eigenvalues in descending order,
    * assign each to the not-yet-full subspace with the smallest
    * running log-variance product. Balancing the per-subspace variance
    * PRODUCT is the paper's criterion (quantization MSE of a subspace
    * scales with the geometric mean of its variances).
    *
    * Rows of the returned matrix are the allocated eigenvectors:
    * subspace j owns rows [j·dsub, (j+1)·dsub).
    */
  private[graft] def opqRotation(sample: Array[Array[Double]], dim: Int, m: Int): Array[Array[Double]] = {
    val n = math.max(1, sample.length)
    val mean = new Array[Double](dim)
    sample.foreach { v => var i = 0; while (i < dim) { mean(i) += v(i); i += 1 } }
    var mi = 0
    while (mi < dim) { mean(mi) /= n; mi += 1 }
    val cov = Array.ofDim[Double](dim, dim)
    sample.foreach { v =>
      var a = 0
      while (a < dim) {
        val da = v(a) - mean(a)
        var b = a
        while (b < dim) { cov(a)(b) += da * (v(b) - mean(b)); b += 1 }
        a += 1
      }
    }
    var a = 0
    while (a < dim) {
      var b = a
      while (b < dim) { cov(a)(b) /= n; cov(b)(a) = cov(a)(b); b += 1 }
      a += 1
    }
    val (vals, vecs) = Pca.jacobiEigen(cov)
    val dsub = dim / m
    val bucketLog = new Array[Double](m)
    val bucketN = new Array[Int](m)
    val assigned = Array.fill(m)(scala.collection.mutable.ArrayBuffer.empty[Int])
    // logs RELATIVE to the smallest (clamped) eigenvalue, so every
    // contribution is ≥ 0 and the criterion is scale-invariant. With
    // raw log(λ) a spectrum of λ < 1 inverts the greedy: each
    // assignment makes its bucket's log-sum SMALLER, so the top
    // directions all pile into one subspace — the exact allocation
    // the balancing exists to prevent. Relative logs make a received
    // high-variance direction raise the bucket's sum, pushing the
    // next high-variance direction to a different subspace; near-zero
    // directions contribute ~0 and just fill remaining slots.
    val lmax = math.max(vals(0), 1e-300)
    val lref = math.max(vals(dim - 1), lmax * 1e-12)
    var c = 0
    while (c < dim) {
      var best = -1
      var j = 0
      while (j < m) {
        if (bucketN(j) < dsub && (best < 0 || bucketLog(j) < bucketLog(best))) best = j
        j += 1
      }
      assigned(best) += c
      bucketLog(best) += math.log(math.max(vals(c), lref) / lref)
      bucketN(best) += 1
      c += 1
    }
    assigned.flatMap(_.iterator.map(vecs(_)))
  }

  /** y = R·x (rows of `r` dotted with x). */
  private[graft] def rotate(r: Array[Array[Double]], x: Array[Double]): Array[Double] = {
    val out = new Array[Double](r.length)
    var i = 0
    while (i < r.length) {
      val row = r(i)
      var d = 0.0
      var t = 0
      while (t < row.length) { d += row(t) * x(t); t += 1 }
      out(i) = d
      i += 1
    }
    out
  }

  /** y = Rᵀ·x̂ (columns of `r` weighted by x̂ — the inverse rotation,
    * R being orthonormal). */
  private[graft] def rotateBack(r: Array[Array[Double]], x: Array[Double]): Array[Double] = {
    val dim = r(0).length
    val out = new Array[Double](dim)
    var i = 0
    while (i < r.length) {
      val row = r(i)
      val xi = x(i)
      var t = 0
      while (t < dim) { out(t) += row(t) * xi; t += 1 }
      i += 1
    }
    out
  }

  /** IVF × PQ: the production ANN architecture at 100 TB — the IVF
    * coarse quantizer bounds WHICH rows are scored (nprobe/nlist of
    * the corpus), PQ bounds WHAT scoring a row costs (m byte-indexed
    * adds over an 8-16 byte code, no float vector read). Build = one
    * IVF build + one PQ train/encode pass; search = probe cells
    * (bounded-heap, reused from IvfIndex) then ADC over probed cells
    * only.
    *
    * Two encodings:
    *  - `residual = false` (raw): PQ codes the vectors directly; the
    *    cell id is only a candidate filter. Exactness contract
    *    (tested): with `nprobe = nlist` every cell is probed, so the
    *    result is EXACTLY flat [[PqModel.search]] — probing only ever
    *    removes candidates, never rescores them.
    *  - `residual = true` (FAISS IndexIVFPQ formulation): each
    *    NORMALIZED vector is coded as its offset from its cell's
    *    ANCHOR, r = v/‖v‖ − a_cell. The anchor is the cell's MEAN
    *    vector (estimated from the training sample), NOT the unit
    *    probe centroid: probing needs unit centroids so dot ≡ cosine,
    *    but subtracting a unit vector from near-isotropic data
    *    INFLATES residual spread (‖v_n − c‖ → √2 for orthogonal
    *    pairs) — subtracting the mean can only shrink per-cell
    *    variance (within-cell variance ≤ total variance), so the same
    *    m×ksub code bytes quantize at-worst-equal and usually finer —
    *    the standard recall lever that makes IVF×PQ beat flat PQ at
    *    equal code size (tested in PqSpec). Search decomposes
    *    exactly: dot(q, x̂) = dot(q, a_cell) + dot(q, r̂) — the first
    *    term is computed exactly per (query, cell) on the driver
    *    (nlist tiny dots), the second is the usual ADC lookup-sum;
    *    ‖x̂‖ is precomputed per row at encode time, so scoring a row
    *    is still m byte-indexed adds + one add.
    */
  object IvfPq {
    /** `anchors` (residual mode only): cell id → the residual anchor
      * vector (sample mean of the cell's normalized members).
      * `rotation` (opq mode): the orthonormal OPQ matrix — residuals
      * are coded in the rotated space, queries rotate before their ADC
      * lookup tables are built. */
    final case class Index(ivf: Similarity.IvfIndex, pq: PqModel, encoded: DataFrame,
        residual: Boolean, anchors: Array[Array[Double]] = null,
        rotation: Array[Array[Double]] = null)

    /** Dense cell-id → centroid lookup (nlist tiny arrays). */
    private def centroidArray(ivf: Similarity.IvfIndex): Array[Array[Double]] = {
      val arr = new Array[Array[Double]](ivf.centroids.iterator.map(_._1).max + 1)
      ivf.centroids.foreach { case (i, v) => arr(i) = v }
      arr
    }

    def build(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
        nlist: Int = 16, m: Int = 8, ksub: Int = 16, seed: Long = 42L,
        residual: Boolean = false, sampleSize: Int = 65536,
        opq: Boolean = false): Index = {
      require(!opq || residual, "IvfPq: opq rotation requires residual encoding " +
        "(raw mode's exactness contract is equality with flat PqModel.search, " +
        "which a rotation would silently break)")
      val ivf = Similarity.IvfIndex.build(corpus, idCol, vecCol, dim, nlist, seed)
      if (!residual) {
        val pq = train(corpus, vecCol, dim, m, ksub, seed, idCol = Some(idCol))
        val encoded = pq.encode(corpus, idCol, vecCol)
          .join(ivf.assigned.select(col("neighbor_id").as("id"), col("__cell").as("cell")), "id")
        Index(ivf, pq, encoded, residual = false)
      } else {
        val cents = centroidArray(ivf)
        // joint (normalized vector, cell) sample — bottom-k by id hash,
        // one bounded TakeOrderedAndProject scan
        val n = Kmeans.cappedSampleSize(sampleSize, dim)
        val sampled = Similarity.withNormalized(ivf.assigned, "__cv", "__nv")
          .select(xxhash64(col("neighbor_id")).as("__h"), col("__nv"), col("__cell"))
          .orderBy(col("__h")).limit(n).collect()
          .map(r => (r.getSeq[Double](1).toArray, r.getInt(2)))
        // anchors: per-cell sample means (fallback to the unit probe
        // centroid for a cell the sample never hit)
        val anchors = new Array[Array[Double]](cents.length)
        val counts = new Array[Int](cents.length)
        sampled.foreach { case (v, cell) =>
          if (anchors(cell) == null) anchors(cell) = new Array[Double](dim)
          val a = anchors(cell)
          var i = 0
          while (i < dim) { a(i) += v(i); i += 1 }
          counts(cell) += 1
        }
        var cell = 0
        while (cell < anchors.length) {
          if (anchors(cell) == null) anchors(cell) = cents(cell)
          else {
            val a = anchors(cell)
            var i = 0
            while (i < dim) { a(i) /= counts(cell); i += 1 }
          }
          cell += 1
        }
        // residual training set against the local anchor table, feeding
        // the same m per-subspace driver-local fits
        val residSample = sampled.map { case (v, cellId) =>
          val a = anchors(cellId)
          val out = new Array[Double](v.length)
          var i = 0
          while (i < v.length) { out(i) = v(i) - a(i); i += 1 }
          out
        }
        // OPQ: rotation learned from the SAME driver-local residual
        // sample; codebooks then train in the rotated space
        val rot = if (opq) opqRotation(residSample, dim, m) else null
        val trainSet = if (rot == null) residSample else residSample.map(rotate(rot, _))
        val pq = trainOnSample(trainSet, dim, m, ksub, seed, maxIter = 30)
        Index(ivf, pq, encodeResidual(ivf, pq, anchors, rot), residual = true,
          anchors = anchors, rotation = rot)
      }
    }

    /** One pass over the inverted lists: residual → codes + exact
      * reconstruction norm ‖a_cell + r̂‖ (so search never recomputes
      * O(dim) anything per row).
      */
    private def encodeResidual(ivf: Similarity.IvfIndex, pq: PqModel,
        anchors: Array[Array[Double]], rotation: Array[Array[Double]] = null): DataFrame = {
      val spark = ivf.assigned.sparkSession
      import spark.implicits._
      val bcPq = spark.sparkContext.broadcast(pq)
      val bcC = spark.sparkContext.broadcast(anchors)
      val bcR = spark.sparkContext.broadcast(rotation)
      Similarity.withNormalized(ivf.assigned, "__cv", "__nv")
        .select(col("neighbor_id").cast("long"), col("__nv"), col("__cell"))
        .as[(Long, Array[Double], Int)]
        .mapPartitions { it =>
          val model = bcPq.value
          val cs = bcC.value
          val rot = bcR.value
          it.map { case (id, vn, cell) =>
            val c = cs(cell)
            val dim = vn.length
            val r0 = new Array[Double](dim)
            var i = 0
            while (i < dim) { r0(i) = vn(i) - c(i); i += 1 }
            // opq: residuals are coded in the ROTATED space
            val r = if (rot == null) r0 else rotate(rot, r0)
            val codes = new Array[Short](model.m)
            var j = 0
            while (j < model.m) {
              val centsJ = model.centroids(j)
              var best = 0
              var bestD = Double.MaxValue
              var cc = 0
              while (cc < centsJ.length) {
                val cent = centsJ(cc)
                var d = 0.0
                var t = 0
                while (t < model.dsub) {
                  val diff = r(j * model.dsub + t) - cent(t)
                  d += diff * diff
                  t += 1
                }
                if (d < bestD) { bestD = d; best = cc }
                cc += 1
              }
              codes(j) = best.toShort
              j += 1
            }
            // exact reconstruction norm ‖x̂‖, x̂ = anchor + Rᵀ·r̂′
            // (Rᵀ = R⁻¹, orthonormal); raw path keeps the lookup form
            var n2 = 0.0
            if (rot == null) {
              var t = 0
              while (t < dim) {
                val sub = t / model.dsub
                val x = c(t) + model.centroids(sub)(codes(sub))(t % model.dsub)
                n2 += x * x
                t += 1
              }
            } else {
              val rhat = new Array[Double](dim)
              var t = 0
              while (t < dim) {
                rhat(t) = model.centroids(t / model.dsub)(codes(t / model.dsub))(t % model.dsub)
                t += 1
              }
              val back = rotateBack(rot, rhat)
              t = 0
              while (t < dim) { val x = c(t) + back(t); n2 += x * x; t += 1 }
            }
            (id, codes, math.sqrt(n2), cell)
          }
        }.toDF("id", "codes", "rec_norm", "cell")
    }

    /** Persist the composed index: IVF (cell-partitioned inverted
      * lists + centroid table), PQ codebook, the PQ-coded rows — also
      * PARTITIONED BY CELL, so a probe's ADC scan skips every
      * unprobed cell's files — and the residual anchors (nlist tiny
      * rows; a lone `cell = -1` marker row carries the raw/residual
      * flag so raw-mode indexes round-trip too). Build once over the
      * 100 TB corpus, search many times without re-training.
      */
    def save(ix: Index, path: String): Unit = {
      val spark = ix.encoded.sparkSession
      import spark.implicits._
      ix.ivf.save(s"$path/ivf")
      ix.pq.save(s"$path/pq", spark)
      ix.encoded.write.partitionBy("cell").mode("overwrite").parquet(s"$path/encoded")
      // one small json side file: a meta marker row, anchor rows, and
      // (opq) rotation rows — kilobytes, like the codebook
      val metaRow = Seq(("meta", -1, Seq.empty[Double]))
      val anchorRows =
        if (ix.anchors == null) Nil
        else ix.anchors.toSeq.zipWithIndex.map { case (a, i) => ("anchor", i, a.toSeq) }
      val rotRows =
        if (ix.rotation == null) Nil
        else ix.rotation.toSeq.zipWithIndex.map { case (r, i) => ("rot", i, r.toSeq) }
      (metaRow ++ anchorRows ++ rotRows).toDF("kind", "idx", "vec")
        .withColumn("residual", lit(ix.residual))
        .coalesce(1).write.mode("overwrite").json(s"$path/anchors")
    }

    /** Reopen a [[save]]d index: the coded rows stay a lazy scan of
      * the cell-partitioned layout; only centroids/codebook/anchors
      * (kilobytes) are collected. */
    def load(spark: SparkSession, path: String): Index = {
      val ivf = Similarity.IvfIndex.load(spark, s"$path/ivf")
      val pq = Pq.load(spark, s"$path/pq")
      val anchorsDf = spark.read.json(s"$path/anchors")
      val metaRows = anchorsDf.collect()
      val residual = metaRows.head.getAs[Boolean]("residual")
      // legacy sidefile (pre-OPQ revisions): columns (cell, anchor,
      // residual) with a cell = -1 marker row; no rotation existed
      // then, so read the anchor rows and leave rotation null rather
      // than failing on the missing kind/idx/vec fields
      if (anchorsDf.columns.contains("cell")) {
        val anchors =
          if (!residual) null
          else {
            val as = metaRows.filter(_.getAs[Long]("cell") >= 0)
            val arr = new Array[Array[Double]](as.map(_.getAs[Long]("cell")).max.toInt + 1)
            as.foreach(r =>
              arr(r.getAs[Long]("cell").toInt) = r.getAs[Seq[Double]]("anchor").toArray)
            arr
          }
        val legacyEncoded = spark.read.parquet(s"$path/encoded")
          .select(col("id"), col("codes"), col("rec_norm"), col("cell").cast("int").as("cell"))
        return Index(ivf, pq, legacyEncoded, residual, anchors, rotation = null)
      }
      def vecTable(kind: String): Array[Array[Double]] = {
        val rows = metaRows.filter(_.getAs[String]("kind") == kind)
        if (rows.isEmpty) null
        else {
          val arr = new Array[Array[Double]](rows.map(_.getAs[Long]("idx")).max.toInt + 1)
          rows.foreach(r =>
            arr(r.getAs[Long]("idx").toInt) = r.getAs[Seq[Double]]("vec").toArray)
          arr
        }
      }
      val encoded = spark.read.parquet(s"$path/encoded")
        .select(col("id"), col("codes"), col("rec_norm"), col("cell").cast("int").as("cell"))
      Index(ivf, pq, encoded, residual,
        anchors = if (residual) vecTable("anchor") else null,
        rotation = vecTable("rot"))
    }

    def search(ix: Index, queries: DataFrame, queryIdCol: String, vecCol: String,
        k: Int, nprobe: Int = 4): DataFrame = {
      val spark = queries.sparkSession
      import spark.implicits._
      val model = ix.pq
      val resid = ix.residual
      val bcModel = spark.sparkContext.broadcast(model)
      val qRows = Similarity.assertQueryCap(queries, "IvfPq.search")
        .select(col(queryIdCol).cast("long").as("qid"),
          Similarity.toDoubleVec(col(vecCol)).as("v"))
        .as[(Long, Array[Double])].collect()
      // opq: dot(q, x̂) = dot(q, a_cell) + dot(R·q, r̂′) — the LUTs are
      // built from the ROTATED query (‖R·q‖ = ‖q‖, so qNorm is
      // unchanged); the exact anchor offsets below use the raw query
      val lutRows =
        if (ix.rotation == null) qRows
        else qRows.map { case (qid, qv) => (qid, rotate(ix.rotation, qv)) }
      val luts = model.buildLuts(lutRows)
      // residual decomposition: dot(q, x̂) = dot(q, a_cell) + dot(q, r̂).
      // The first term is EXACT, computed here per (query, cell) —
      // nqueries × nlist tiny dots — and shipped with the LUTs; raw
      // mode has no offset term.
      val cellOffsets: Map[Long, Array[Double]] =
        if (!resid) Map.empty
        else {
          qRows.iterator.map { case (qid, qv) =>
            qid -> ix.anchors.map { c =>
              if (c == null) 0.0
              else {
                var d = 0.0
                var i = 0
                while (i < qv.length) { d += qv(i) * c(i); i += 1 }
                d
              }
            }
          }.toMap
        }
      // cell → queries probing it (query sets are small by the same
      // broadcast contract as every other ANN tier here)
      val probes = ix.ivf.probeCells(queries, queryIdCol, vecCol, nprobe)
        .select(col("__cell"), col("query_id").cast("long"))
        .as[(Int, Long)].collect()
        .groupBy(_._1).map { case (cell, qs) => cell -> qs.map(_._2).toSet }
      val bcProbes = spark.sparkContext.broadcast(probes)
      val bcLuts = spark.sparkContext.broadcast(luts)
      val bcOffsets = spark.sparkContext.broadcast(cellOffsets)
      // static partition pruning: the union of probed cells is known on
      // the driver before the scan, so push it as a literal IN filter —
      // against a save()d cell-partitioned index this prunes every
      // unprobed cell's FILES (PartitionFilters at the scan), instead
      // of reading 100% of the codes to discard most in the task. The
      // per-(row, query) probing map still filters inside the kernel.
      val probedCells = probes.keys.toSeq.sorted
      val scored = ix.encoded
        .where(col("cell").isin(probedCells: _*))
        .select(col("id"), col("codes"), col("rec_norm"), col("cell"))
        .as[(Long, Array[Short], Double, Int)]
        .mapPartitions { it =>
          val model = bcModel.value
          val probing = bcProbes.value
          val qs = bcLuts.value
          val offsets = bcOffsets.value
          it.flatMap { case (id, codes, recNorm, cell) =>
            probing.get(cell) match {
              case None => Iterator.empty
              case Some(qids) => qs.iterator
                .filter { case (qid, _, _) => qids(qid) && qid != id }
                .map { case (qid, lut, qNorm) =>
                  var dot = 0.0
                  var j = 0
                  while (j < model.m) { dot += lut(j * model.ksub + codes(j)); j += 1 }
                  if (resid) dot += offsets(qid)(cell)
                  val denom = qNorm * recNorm
                  (qid, id, if (denom > 0) dot / denom else 0.0)
                }
            }
          }
        }.toDF("query_id", "neighbor_id", "cosine")
      scored.groupBy("query_id")
        .agg(TopKByScore.of(col("cosine"), col("neighbor_id"), k).as("__top"))
        .select(col("query_id"), posexplode(col("__top")).as(Seq("__pos", "__p")))
        .select(col("query_id"), col("__p._2").as("neighbor_id"),
          col("__p._1").as("cosine"), (col("__pos") + 1).cast("long").as("rank"))
    }
  }

  def load(spark: SparkSession, path: String): PqModel = {
    val rows = spark.read.json(path).collect()
    val h = rows.head
    val (m, ksub, dsub) = (h.getAs[Long]("m").toInt, h.getAs[Long]("ksub").toInt,
      h.getAs[Long]("dsub").toInt)
    val cents = Array.ofDim[Array[Double]](m, ksub)
    rows.foreach { r =>
      cents(r.getAs[Long]("subspace").toInt)(r.getAs[Long]("code").toInt) =
        r.getAs[Seq[Double]]("centroid").toArray
    }
    PqModel(m, ksub, dsub, cents, cents.map(_.map(c => c.map(x => x * x).sum)))
  }
}
