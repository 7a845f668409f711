package graft

import org.apache.spark.sql.functions._

import graft.ops.{Pq, Similarity}

/** Product quantization: compression is lossy by design, so the tests
  * pin the CONTRACTS — code shape/size, reconstruction sanity, ADC
  * recall against the exact ranking, determinism, persistence.
  */
class PqSpec extends SparkSuite {
  import spark.implicits._

  // clustered corpus: 10 well-separated centers × 30 members, dim 16.
  // PQ on structured data must put cluster-mates back on top.
  private lazy val corpus = {
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(10)(Array.fill(16)(rnd.nextDouble() * 10 - 5))
    (0 until 300).map { i =>
      val c = centers(i % 10)
      (i.toLong, c.map(x => (x + rnd.nextDouble() * 0.4 - 0.2).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("encode: one short code per subspace, reconstruction norm positive") {
    val model = Pq.train(corpus, "embedding", dim = 16, m = 4, ksub = 16)
    assert(model.dsub == 4 && model.centroids.length == 4
      && model.centroids.forall(_.length == 16))
    val encoded = model.encode(corpus, "vec_id", "embedding")
    assert(encoded.count() == 300)
    val row = encoded.head()
    assert(row.getSeq[Short](row.fieldIndex("codes")).size == 4)
    assert(row.getAs[Double]("rec_norm") > 0)
    // 32x-class compression claim at production shape: m bytes vs dim floats
    assert(4.0 / (16 * 4) <= 0.0625 + 1e-9)
  }

  test("ADC search: retrieves from the true cluster; planted twin always surfaces; k-bounded; deterministic") {
    // NOTE on the contract: exact top-5 recall is the WRONG metric on
    // heavily clustered data — all ~30 cluster-mates quantize to the
    // same codes, ADC scores tie, and which 5 of the 29 surface is
    // arbitrary. What PQ must guarantee is (a) results come from the
    // right cluster and (b) a genuinely closest vector is not lost.
    val model = Pq.train(corpus, "embedding", dim = 16, m = 4, ksub = 16)
    val encoded = model.encode(corpus, "vec_id", "embedding").cache()
    val queries = corpus.where(col("vec_id") < 10)
    val approx = model.search(queries, "vec_id", "embedding", encoded, k = 5)
    // (a) every returned neighbor belongs to the query's cluster
    // (clusters are id % 10 by construction and well separated)
    val rows = approx.select("query_id", "neighbor_id").as[(Long, Long)].collect()
    val inCluster = rows.count { case (q, n) => q % 10 == n % 10 }
    assert(inCluster.toDouble / rows.length >= 0.95,
      s"only $inCluster/${rows.length} ADC results in the true cluster")
    assert(approx.groupBy("query_id").count().select(max("count")).as[Long].head() <= 5)
    // deterministic: same model + corpus → identical result set
    val again = model.search(queries, "vec_id", "embedding", encoded, k = 5)
    assert(approx.as[(Long, Long, Double, Long)].collect().toSet
      == again.as[(Long, Long, Double, Long)].collect().toSet)

    // (b) random corpus with planted twins: each query's perturbed twin
    // quantizes to (nearly) the query's own codes → maximal ADC score
    val rnd = new scala.util.Random(17)
    val base = Seq.tabulate(200)(i => (i.toLong, Array.fill(16)((rnd.nextDouble() - 0.5).toFloat)))
    val twins = base.take(5).map { case (i, v) =>
      (i + 1000L, v.map(x => (x + 0.01f * rnd.nextFloat())))
    }
    val corpus2 = (base ++ twins).toDF("vec_id", "embedding")
    val model2 = Pq.train(corpus2, "embedding", dim = 16, m = 4, ksub = 16)
    val enc2 = model2.encode(corpus2, "vec_id", "embedding")
    val found = model2.search(corpus2.where(col("vec_id") < 5), "vec_id", "embedding", enc2, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    (0L until 5L).foreach { q =>
      assert(found.contains((q, q + 1000L)), s"planted twin of query $q lost by ADC")
    }
  }

  test("IVF×PQ: full probe equals flat PQ exactly; partial probe is a subset that stays in-cluster") {
    val ix = Pq.IvfPq.build(corpus, "vec_id", "embedding", dim = 16, nlist = 8, m = 4, ksub = 16)
    val queries = corpus.where(col("vec_id") < 8)
    // nprobe = nlist probes every cell → EXACTLY the flat-PQ result
    // (probing bounds which rows are scored, never how)
    val full = Pq.IvfPq.search(ix, queries, "vec_id", "embedding", k = 5, nprobe = 8)
      .as[(Long, Long, Double, Long)].collect().toSet
    val flatEnc = ix.encoded.select("id", "codes", "rec_norm")
    val flat = ix.pq.search(queries, "vec_id", "embedding", flatEnc, k = 5)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(full == flat)
    // partial probe: k-bounded, scores a subset of the full candidate
    // set, and on clustered data results stay in the query's cluster
    val part = Pq.IvfPq.search(ix, queries, "vec_id", "embedding", k = 5, nprobe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(part.nonEmpty)
    val inCluster = part.count { case (q, n) => q % 10 == n % 10 }
    assert(inCluster.toDouble / part.length >= 0.95,
      s"only $inCluster/${part.length} IVF-PQ results in the true cluster")
  }

  test("residual IVF×PQ: at equal code size, recall@5 beats flat PQ on clustered data") {
    // residuals subtract the cell centroid, so the same m×ksub bytes
    // quantize the small within-cluster offsets instead of the whole
    // vector — the entire point of the residual formulation. On this
    // corpus flat PQ collapses cluster-mates onto identical codes
    // (arbitrary top-5 among ~30 ties) while residual codes separate
    // them, so recall against the exact ranking must strictly improve.
    val queries = corpus.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(queries, corpus, "vec_id", "vec_id", "embedding", k = 5)
    def meanRecall(approx: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallAt(approx, exact).agg(avg("recall")).as[Double].head()
    val flatModel = Pq.train(corpus, "embedding", dim = 16, m = 4, ksub = 16)
    val flatEnc = flatModel.encode(corpus, "vec_id", "embedding")
    val rFlat = meanRecall(flatModel.search(queries, "vec_id", "embedding", flatEnc, k = 5))
    val ix = Pq.IvfPq.build(corpus, "vec_id", "embedding", dim = 16, nlist = 8, m = 4,
      ksub = 16, residual = true)
    // full probe: isolates encoding quality from probe misses
    val rResid = meanRecall(Pq.IvfPq.search(ix, queries, "vec_id", "embedding", k = 5, nprobe = 8))
    assert(rResid >= rFlat, s"residual recall $rResid < flat recall $rFlat at equal code size")
    // deterministic under the fixed seed; partial probe stays in-cluster
    val part = Pq.IvfPq.search(ix, queries, "vec_id", "embedding", k = 5, nprobe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(part.nonEmpty)
    val inCluster = part.count { case (q, n) => q % 10 == n % 10 }
    assert(inCluster.toDouble / part.length >= 0.95,
      s"only $inCluster/${part.length} residual IVF-PQ results in the true cluster")
  }

  test("residual IVF×PQ: planted twin always surfaces") {
    val rnd = new scala.util.Random(29)
    val base = Seq.tabulate(200)(i => (i.toLong, Array.fill(16)((rnd.nextDouble() - 0.5).toFloat)))
    val twins = base.take(5).map { case (i, v) =>
      (i + 1000L, v.map(x => (x + 0.01f * rnd.nextFloat())))
    }
    val corpus2 = (base ++ twins).toDF("vec_id", "embedding")
    val ix = Pq.IvfPq.build(corpus2, "vec_id", "embedding", dim = 16, nlist = 8, m = 4,
      ksub = 16, residual = true)
    // full probe: a twin lands in (or adjacent to) the query's cell and
    // quantizes to nearly the query's own residual codes
    val found = Pq.IvfPq.search(ix, corpus2.where(col("vec_id") < 5), "vec_id", "embedding",
      k = 5, nprobe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    (0L until 5L).foreach { q =>
      assert(found.contains((q, q + 1000L)), s"planted twin of query $q lost by residual ADC")
    }
  }

  test("query-set cap: an oversized query frame fails fast as an analysis error") {
    val model = Pq.train(corpus, "embedding", dim = 16, m = 4, ksub = 16)
    val encoded = model.encode(corpus, "vec_id", "embedding")
    spark.conf.set("spark.graft.ann.maxQueries", "10")
    try {
      val err = intercept[GraftAnalysisException] {
        model.search(corpus, "vec_id", "embedding", encoded, k = 5)
      }
      assert(err.getMessage.contains("maxQueries"))
      intercept[GraftAnalysisException] {
        Similarity.bruteForceTopK(corpus, corpus, "vec_id", "vec_id", "embedding", k = 5)
      }
      intercept[GraftAnalysisException] {
        Similarity.lshTopK(corpus, corpus, "vec_id", "vec_id", "embedding",
          k = 5, dim = 16, planes = 4)
      }
      // within the cap the same call works
      assert(model.search(corpus.where(col("vec_id") < 5), "vec_id", "embedding",
        encoded, k = 3).count() > 0)
    } finally spark.conf.unset("spark.graft.ann.maxQueries")
  }

  test("IVF×PQ save/load: reopened residual index ranks identically") {
    val ix = Pq.IvfPq.build(corpus, "vec_id", "embedding", dim = 16, nlist = 8, m = 4,
      ksub = 16, residual = true)
    val dir = java.nio.file.Files.createTempDirectory("graftivfpq").toString + "/index"
    Pq.IvfPq.save(ix, dir)
    val back = Pq.IvfPq.load(spark, dir)
    assert(back.residual && back.anchors.length == ix.anchors.length)
    assert(back.anchors.flatten.toSeq == ix.anchors.flatten.toSeq)
    val queries = corpus.where(col("vec_id") < 8)
    val a = Pq.IvfPq.search(ix, queries, "vec_id", "embedding", k = 5, nprobe = 2)
      .as[(Long, Long, Double, Long)].collect().toSet
    val b = Pq.IvfPq.search(back, queries, "vec_id", "embedding", k = 5, nprobe = 2)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(a == b)
    // raw-mode index round-trips its flag and ranking too
    val raw = Pq.IvfPq.build(corpus, "vec_id", "embedding", dim = 16, nlist = 8, m = 4, ksub = 16)
    val dir2 = java.nio.file.Files.createTempDirectory("graftivfpq2").toString + "/index"
    Pq.IvfPq.save(raw, dir2)
    val back2 = Pq.IvfPq.load(spark, dir2)
    assert(!back2.residual && back2.anchors == null)
    val a2 = Pq.IvfPq.search(raw, queries, "vec_id", "embedding", k = 5, nprobe = 8)
      .as[(Long, Long, Double, Long)].collect().toSet
    val b2 = Pq.IvfPq.search(back2, queries, "vec_id", "embedding", k = 5, nprobe = 8)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(a2 == b2)
  }

  test("OPQ rotation: orthonormal, variance-balanced, recall not below plain on correlated data") {
    // cross-subspace-correlated corpus: the within-cell residual is
    // (f ++ f) for 8 iid factors f — every factor spans TWO raw
    // subspaces, so raw PQ pays each subspace's k codes for a 2-D blob
    // of two factors (≈ √k levels per factor), while the rotation
    // isolates each factor into its own subspace direction (all k
    // levels per factor). This is PQ's subspace-independence
    // assumption violated in exactly the way OPQ repairs.
    val rnd = new scala.util.Random(31)
    val centers = Array.fill(4)(Array.fill(16)(rnd.nextDouble() * 20 - 10))
    val corr = (0 until 300).map { i =>
      val c = centers(i % 4)
      val f = Array.fill(8)(rnd.nextDouble() * 3 - 1.5)
      val v = Array.tabulate(16)(j => c(j) + f(j % 8) + rnd.nextDouble() * 0.04 - 0.02)
      (i.toLong, v.map(_.toFloat))
    }.toDF("vec_id", "embedding")

    // rotation orthonormality: R·Rᵀ = I on the actual training sample
    val sample = (0 until 300).map(_ => Array.fill(16)(rnd.nextDouble())).toArray
    val r = Pq.opqRotation(sample, dim = 16, m = 4)
    assert(r.length == 16 && r.forall(_.length == 16))
    for (i <- 0 until 16; j <- 0 until 16) {
      val dot = (0 until 16).map(t => r(i)(t) * r(j)(t)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9, s"RRt[$i][$j]=$dot")
    }
    // rotate/rotateBack are mutual inverses
    val x = Array.fill(16)(rnd.nextDouble())
    val back = Pq.rotateBack(r, Pq.rotate(r, x))
    x.zip(back).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }

    val queries = corr.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(queries, corr, "vec_id", "vec_id", "embedding", k = 5)
    def recall(opq: Boolean): Double = {
      val ix = Pq.IvfPq.build(corr, "vec_id", "embedding", dim = 16, nlist = 4, m = 8,
        ksub = 4, residual = true, opq = opq)
      val approx = Pq.IvfPq.search(ix, queries, "vec_id", "embedding", k = 5, nprobe = 4)
      Similarity.recallAt(approx, exact).agg(avg(col("recall"))).head().getDouble(0)
    }
    val plain = recall(opq = false)
    val rotated = recall(opq = true)
    info(s"recall@5: plain=$plain opq=$rotated")
    assert(rotated >= plain, s"opq recall $rotated below plain $plain on cross-subspace-correlated data")
  }

  test("OPQ index save/load: rotation persists, reopened index ranks identically") {
    val ix = Pq.IvfPq.build(corpus, "vec_id", "embedding", dim = 16, nlist = 8, m = 4,
      ksub = 16, residual = true, opq = true)
    assert(ix.rotation != null && ix.rotation.length == 16)
    val dir = java.nio.file.Files.createTempDirectory("graftopq").toString + "/index"
    Pq.IvfPq.save(ix, dir)
    val back = Pq.IvfPq.load(spark, dir)
    assert(back.rotation != null)
    assert(back.rotation.flatten.toSeq == ix.rotation.flatten.toSeq)
    val queries = corpus.where(col("vec_id") < 8)
    val a = Pq.IvfPq.search(ix, queries, "vec_id", "embedding", k = 5, nprobe = 4)
      .as[(Long, Long, Double, Long)].collect().toSet
    val b = Pq.IvfPq.search(back, queries, "vec_id", "embedding", k = 5, nprobe = 4)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(a == b)
    // opq must refuse raw mode (exactness contract)
    intercept[IllegalArgumentException] {
      Pq.IvfPq.build(corpus, "vec_id", "embedding", dim = 16, nlist = 8, m = 4,
        ksub = 16, residual = false, opq = true)
    }
  }

  test("save/load round-trips the codebook bit-exactly") {
    val model = Pq.train(corpus, "embedding", dim = 16, m = 4, ksub = 8)
    val dir = java.nio.file.Files.createTempDirectory("graftpq").toString + "/codebook"
    model.save(dir, spark)
    val back = Pq.load(spark, dir)
    assert(back.m == model.m && back.ksub == model.ksub && back.dsub == model.dsub)
    assert(back.centroids.flatten.flatten.toSeq == model.centroids.flatten.flatten.toSeq)
    // reopened model encodes identically
    val a = model.encode(corpus, "vec_id", "embedding")
      .select("id", "codes").as[(Long, Seq[Short])].collect().toMap
    val b = back.encode(corpus, "vec_id", "embedding")
      .select("id", "codes").as[(Long, Seq[Short])].collect().toMap
    assert(a == b)
  }

  test("IVF×PQ load reads the legacy (cell/anchor) anchors sidefile") {
    // an index persisted by the pre-OPQ revision wrote the anchors
    // sidefile with (cell, anchor, residual) columns and a cell = -1
    // marker row; load must keep reading it (rotation = null)
    val ix = Pq.IvfPq.build(corpus, "vec_id", "embedding", dim = 16, nlist = 8, m = 4,
      ksub = 16, residual = true)
    val dir = java.nio.file.Files.createTempDirectory("graftivfpqleg").toString + "/index"
    Pq.IvfPq.save(ix, dir)
    // rewrite the sidefile in the legacy schema
    val legacyRows = (-1, Seq.empty[Double]) +:
      ix.anchors.toSeq.zipWithIndex.map { case (a, i) => (i, a.toSeq) }
    legacyRows.toDF("cell", "anchor")
      .withColumn("residual", lit(true))
      .coalesce(1).write.mode("overwrite").json(s"$dir/anchors")
    val back = Pq.IvfPq.load(spark, dir)
    assert(back.residual && back.rotation == null)
    assert(back.anchors.flatten.toSeq == ix.anchors.flatten.toSeq)
    val queries = corpus.where(col("vec_id") < 8)
    val a = Pq.IvfPq.search(ix, queries, "vec_id", "embedding", k = 5, nprobe = 2)
      .as[(Long, Long, Double, Long)].collect().toSet
    val b = Pq.IvfPq.search(back, queries, "vec_id", "embedding", k = 5, nprobe = 2)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(a == b)
  }
}
