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
  *  - [[PqModel.train]]: m independent spark.ml KMeans fits, one per
  *    dim/m subspace (k ≤ 256 so a code fits a byte). The codebook is
  *    m×k×dsub doubles — kilobytes — and rides a broadcast.
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
      val qRows = queries.select(col(queryIdCol).cast("long").as("qid"),
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
    * raise it for sharper cells; the cost stays one bounded scan.
    */
  def train(corpus: DataFrame, vecCol: String, dim: Int,
      m: Int = 8, ksub: Int = 16, seed: Long = 42L, maxIter: Int = 30,
      sampleSize: Int = 65536): PqModel = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    require(ksub <= 256, "ksub must fit a byte")
    val dsub = dim / m
    val v = Similarity.toDoubleVec(col(vecCol))
    val sample = Kmeans.sampleVectors(corpus, Seq(col(vecCol)), v, sampleSize)
    trainOnSample(sample, dim, m, ksub, seed, maxIter)
  }

  /** The m per-subspace fits, given an already-collected sample (shared
    * with the residual path, which samples (vector, cell) jointly). */
  private[ops] def trainOnSample(sample: Array[Array[Double]], dim: Int,
      m: Int, ksub: Int, seed: Long, maxIter: Int): PqModel = {
    val dsub = dim / m
    val centroids = (0 until m).map { j =>
      val sub = sample.map(p => java.util.Arrays.copyOfRange(p, j * dsub, (j + 1) * dsub))
      Kmeans.fit(sub, ksub, seed + j, maxIter)
    }.toArray
    val norms2 = centroids.map(_.map(c => c.map(x => x * x).sum))
    PqModel(m, ksub, dsub, centroids, norms2)
  }

  /** IVF × PQ: the production ANN architecture at 100 TB — the IVF
    * coarse quantizer bounds WHICH rows are scored (nprobe/nlist of
    * the corpus), PQ bounds WHAT scoring a row costs (m byte-indexed
    * adds over an 8-16 byte code, no float vector read). Build = one
    * IVF build + one PQ train/encode + an id join to tag each code
    * with its cell; search = probe cells (bounded-heap, reused from
    * IvfIndex) then ADC over probed cells only.
    *
    * Exactness contract (tested): with `nprobe = nlist` every cell is
    * probed, so the result is EXACTLY flat [[PqModel.search]] —
    * probing only ever removes candidates, never rescores them.
    */
  object IvfPq {
    final case class Index(ivf: Similarity.IvfIndex, pq: PqModel, encoded: DataFrame)

    def build(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
        nlist: Int = 16, m: Int = 8, ksub: Int = 16, seed: Long = 42L): Index = {
      val ivf = Similarity.IvfIndex.build(corpus, idCol, vecCol, dim, nlist, seed)
      val pq = train(corpus, vecCol, dim, m, ksub, seed)
      val encoded = pq.encode(corpus, idCol, vecCol)
        .join(ivf.assigned.select(col("neighbor_id").as("id"), col("__cell").as("cell")), "id")
      Index(ivf, pq, encoded)
    }

    def search(ix: Index, queries: DataFrame, queryIdCol: String, vecCol: String,
        k: Int, nprobe: Int = 4): DataFrame = {
      val spark = queries.sparkSession
      import spark.implicits._
      val model = ix.pq
      val bcModel = spark.sparkContext.broadcast(model)
      val qRows = queries.select(col(queryIdCol).cast("long").as("qid"),
          Similarity.toDoubleVec(col(vecCol)).as("v"))
        .as[(Long, Array[Double])].collect()
      val luts = model.buildLuts(qRows)
      // cell → queries probing it (query sets are small by the same
      // broadcast contract as every other ANN tier here)
      val probes = ix.ivf.probeCells(queries, queryIdCol, vecCol, nprobe)
        .select(col("__cell"), col("query_id").cast("long"))
        .as[(Int, Long)].collect()
        .groupBy(_._1).map { case (cell, qs) => cell -> qs.map(_._2).toSet }
      val bcProbes = spark.sparkContext.broadcast(probes)
      val bcLuts = spark.sparkContext.broadcast(luts)
      val scored = ix.encoded.select(col("id"), col("codes"), col("rec_norm"), col("cell"))
        .as[(Long, Array[Short], Double, Int)]
        .mapPartitions { it =>
          val model = bcModel.value
          val probing = bcProbes.value
          val qs = bcLuts.value
          it.flatMap { case (id, codes, recNorm, cell) =>
            probing.get(cell) match {
              case None => Iterator.empty
              case Some(qids) => qs.iterator
                .filter { case (qid, _, _) => qids(qid) && qid != id }
                .map { case (qid, lut, qNorm) =>
                  var dot = 0.0
                  var j = 0
                  while (j < model.m) { dot += lut(j * model.ksub + codes(j)); j += 1 }
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
