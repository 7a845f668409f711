package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** fastText-style linear text classifier, closed-form.
  *
  * Architecture follows fastText (Joulin et al. 2016, "Bag of Tricks
  * for Efficient Text Classification" — public paper): a document is
  * a bag of hashed word n-gram features (unigrams + bigrams, hashing
  * trick into `nBuckets` buckets) feeding a single linear layer, one
  * score per class. The published trainer is SGD; we replace it with
  * the closed-form regularized least-squares (ridge) fit so training
  * is deterministic and single-pass — the same "distributed moment
  * fold → dim²-bounded driver solve" shape as [[Pca.fit]]:
  *
  *   W = (XᵀX + λ n I)⁻¹ Xᵀ Y      (Y one-hot, one column per class)
  *
  * Features are BINARY presence indicators (bucket seen in the doc →
  * 1.0) plus a constant bias feature at index `nBuckets`; the bucket
  * hash is the 16-bit md5 prefix used by
  * [[TextAnalysis.dsirBucketLogProbs]], so feature extraction is
  * SQL-replayable cross-engine. This is the "model-based quality
  * scoring beyond NB" rung: train on a curated-vs-raw label and keep
  * the top-scored documents (the GPT-3 / LLaMA corpus-filter recipe).
  *
  * Scale shape: fitting never shuffles — feature arrays are
  * scan-local column expressions and the Gram/moment accumulation is
  * a per-partition fold collected as one (nBuckets+1)²/2-sized row
  * per partition; the solve is driver-local dim³ on a dim ≤ ~1k
  * matrix. Scoring is a zero-shuffle projection: the weight rows ride
  * into the plan as array literals (broadcast by construction), so a
  * 100 TB corpus is scored at scan speed.
  *
  * Reference surface analogue: the reference has no trained
  * classifier; this extends the curation suite (main.py has no
  * counterpart — §2.6 extension).
  */
object LinearClassifier {

  /** Fitted model: `classes` sorted lexicographically; `weights(c)`
    * has nBuckets feature weights followed by the bias at index
    * nBuckets. `featureKind` selects the extractor the model was
    * trained with and scores through: `"word"` = hashed word
    * unigram+bigram buckets ([[bucketArray]]); `"char"` = hashed
    * character 1–3-gram + script pseudo-feature buckets
    * ([[charBucketArray]] — the language-ID feature space, which
    * sees non-Latin scripts the word tokenizer erases).
    */
  final case class LinearTextModel(
      nBuckets: Int,
      classes: Array[String],
      weights: Array[Array[Double]],
      featureKind: String = "word") {

    require(classes.length == weights.length,
      "linear model: one weight row per class")
    require(featureKind == "word" || featureKind == "char",
      s"linear model: unknown featureKind '$featureKind'")

    /** Per-document raw scores, one row per (doc, class):
      * score = Σ_{b ∈ doc buckets} w_c(b) + bias_c. Zero-shuffle:
      * the bucket array is scan-local and each class's weight row is
      * an array literal. Documents with no features produce no rows
      * (same contract as [[TextAnalysis.nbScores]]).
      */
    def score(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
      val withB = docs
        .withColumn("__b", featuresOf(featureKind, col(textCol), nBuckets))
        .where(size(col("__b")) > 0)
      val scored = classes.zip(weights).map { case (cls, w) =>
        val feat = typedLit(w.take(nBuckets).toSeq)
        val s = aggregate(col("__b"), lit(0.0),
          (acc, b) => acc + element_at(feat, b + 1)) + lit(w(nBuckets))
        struct(lit(cls).as("class"), s.as("score"))
      }
      withB
        .select(col(idCol), explode(array(scored.toIndexedSeq: _*)).as("__s"))
        .select(col(idCol), col("__s.class").as("class"), col("__s.score").as("score"))
    }

    /** Deterministic argmax over [[score]]: highest score wins, exact
      * float ties break toward the lexicographically LAST class (max
      * of a (score, class) struct — no Window, one hash aggregate).
      */
    def predict(docs: DataFrame, idCol: String, textCol: String): DataFrame =
      score(docs, idCol, textCol)
        .groupBy(col(idCol))
        .agg(max(struct(col("score"), col("class"))).as("__m"))
        .select(col(idCol), col("__m.class").as("predicted"),
          col("__m.score").as("score"))
  }

  /** Sorted distinct hashed-ngram buckets of a document: unigram
    * tokens plus adjacent-word bigrams, each mapped through the
    * 16-bit md5-prefix bucket hash (the exact
    * [[TextAnalysis.dsirBucketLogProbs]] formula). Sorted + distinct
    * so the Gram fold's float-accumulation order is canonical.
    * Delegates to the codegen'd [[graft.expr.HashedGramBuckets]]
    * kernel — the declarative five-higher-order-function chain below
    * is interpreted per element and cost ~10 s at sf0.1 (the
    * UrlNormalize lesson); it is retained as the SQL-replayable
    * contract mirror, with kernel ≡ declarative pinned in the spec.
    */
  private[graft] def bucketArray(text: Column, nBuckets: Int): Column =
    graft.expr.HashedGramBucketsCol(text, nBuckets)

  /** Character-n-gram + script pseudo-feature buckets (the langid
    * feature space; see [[graft.expr.CharGramBucketsKernel]]). */
  private[graft] def charBucketArray(text: Column, nBuckets: Int): Column =
    graft.expr.CharGramBucketsCol(text, nBuckets)

  private[graft] def featuresOf(kind: String, text: Column, nBuckets: Int): Column =
    kind match {
      case "word" => bucketArray(text, nBuckets)
      case "char" => charBucketArray(text, nBuckets)
      case other =>
        throw new graft.GraftAnalysisException(
          s"linear classifier: unknown featureKind '$other' (word|char)")
    }

  /** The declarative mirror of [[bucketArray]] (see its scaladoc). */
  private[graft] def bucketArrayDeclarative(text: Column, nBuckets: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))
    array_sort(array_distinct(transform(concat(toks, bigrams),
      g => (conv(substring(md5(g), 1, 4), 16, 10).cast("long") % nBuckets).cast("int"))))
  }

  /** Fit by one distributed moment pass + driver Cholesky solve.
    * `lambda` is the ridge coefficient per training row (the λ in
    * W = (XᵀX + λ n I)⁻¹ Xᵀ Y); must be > 0 — it is what makes the
    * normal matrix positive-definite regardless of data rank.
    *
    * Determinism: bucket arrays are sorted, partition folds visit
    * rows in scan order, and partials combine in partition order
    * (the [[Pca.fit]] precedent).
    */
  def fit(docs: DataFrame, idCol: String, labelCol: String, textCol: String,
      nBuckets: Int = 512, lambda: Double = 1e-4,
      featureKind: String = "word"): LinearTextModel = {
    require(nBuckets >= 2, s"linear fit: nBuckets=$nBuckets must be >= 2")
    require(lambda > 0, s"linear fit: lambda=$lambda must be > 0")
    val spark = docs.sparkSession
    import spark.implicits._

    val dim = nBuckets + 1 // + bias feature
    val tri = dim * (dim + 1) / 2

    val feats = Partitioning.fanOut(docs)
      .select(col(labelCol).cast("string").as("__y"),
        featuresOf(featureKind, col(textCol), nBuckets).as("__b"))
      .where(col("__y").isNotNull && size(col("__b")) > 0)
      .as[(String, Seq[Int])]

    // per-partition fold: upper-tri Gram + per-class moment columns.
    // Binary features mean x_i x_j = 1 on active-index pairs, so the
    // fold is sparse: |active|² adds per doc, nothing dim-sized —
    // but each partial IS dim-sized (the tri-length triangle), so
    // fold WIDTH is bounded: at nBuckets=2048 one partial is a 2.1M-
    // double triangle, and 32 of them cost ~0.5 GB of collect plus a
    // driver merge (measured 12.5 s of a 28 s fit); 8 partials keep
    // the per-partition row work trivial while quartering the dense-
    // state traffic. Partials are primitive Array[Double] (unboxed
    // UnsafeArrayData both ways — the boxed-Seq encoder was the
    // other half of those 12.5 s).
    //
    // Classes are discovered INSIDE the fold (per-partition local
    // maps, remapped to the sorted global set on the driver) — a
    // separate distinct() pre-pass would hash the whole corpus a
    // second time, the larger half of the round-12 +30% langid
    // regression. The moment columns are class-major (r[c*dim + ai])
    // so a partition can grow its class set without restriding.
    val foldWidth = math.min(8, math.max(1,
      spark.sparkContext.defaultParallelism))
    // repartition, NOT coalesce: coalesce is a narrow dependency, so
    // the expensive feature-hashing projection above would fuse INTO
    // the 8 fold tasks and run on 8 of N cores (the other half of
    // that regression). The exchange keeps hashing at scan width and
    // ships only (label, bucket-array) rows into the fold.
    val partials = feats.repartition(foldWidth).mapPartitions { it =>
      val localIdx = scala.collection.mutable.LinkedHashMap.empty[String, Int]
      var n = 0L
      val g = new Array[Double](tri)
      var r = new Array[Double](dim * 4)
      it.foreach { case (y, buckets) =>
        val c = localIdx.getOrElseUpdate(y, {
          val next = localIdx.size
          if (dim.toLong * (next + 1) > r.length)
            r = java.util.Arrays.copyOf(r, math.max(r.length * 2, dim * (next + 1)))
          next
        })
        n += 1
        // active feature indices, ascending (buckets sorted; bias last)
        val act = new Array[Int](buckets.length + 1)
        var k = 0
        buckets.foreach { b => act(k) = b; k += 1 }
        act(k) = dim - 1
        val cOff = c * dim
        var i = 0
        while (i < act.length) {
          val ai = act(i)
          // upper-tri flat offset for row ai: ai*dim - ai*(ai-1)/2
          val rowOff = ai * dim - ai * (ai - 1) / 2 - ai
          var j = i
          while (j < act.length) { g(rowOff + act(j)) += 1.0; j += 1 }
          r(cOff + ai) += 1.0
          i += 1
        }
      }
      if (n == 0) Iterator.empty
      else Iterator.single((n, localIdx.keys.toArray,
        g, java.util.Arrays.copyOf(r, dim * localIdx.size)))
    }.collect() // one row per non-empty partition, partition order

    require(partials.nonEmpty, "linear fit: empty training input")
    val classes = partials.iterator.flatMap(_._2).toArray.distinct.sorted
    require(classes.length >= 2,
      s"linear fit: need >= 2 classes, got ${classes.mkString(",")}")
    val classIdx = classes.zipWithIndex.toMap
    val nClasses = classes.length
    var n = 0L
    val g = new Array[Double](tri)
    val r = new Array[Double](dim * nClasses) // class-major: r[c*dim + ai]
    partials.foreach { case (pn, pClasses, pgA, prA) =>
      n += pn
      var i = 0
      while (i < tri) { g(i) += pgA(i); i += 1 }
      var c = 0
      while (c < pClasses.length) {
        val gOff = classIdx(pClasses(c)) * dim
        val pOff = c * dim
        var d = 0
        while (d < dim) { r(gOff + d) += prA(pOff + d); d += 1 }
        c += 1
      }
    }

    // dense normal matrix A = G + λ n I
    val a = Array.ofDim[Double](dim, dim)
    var i = 0; var t = 0
    while (i < dim) {
      var j = i
      while (j < dim) { a(i)(j) = g(t); a(j)(i) = g(t); j += 1; t += 1 }
      a(i)(i) += lambda * n
      i += 1
    }
    val chol = cholesky(a)
    val weights = Array.tabulate(nClasses) { c =>
      val rhs = java.util.Arrays.copyOfRange(r, c * dim, (c + 1) * dim)
      choleskySolve(chol, rhs)
    }
    LinearTextModel(nBuckets, classes, weights, featureKind)
  }

  /** In-place-free lower-triangular Cholesky factor of a symmetric
    * positive-definite matrix (guaranteed SPD here by λ n I).
    *
    * Left-looking by COLUMN with the below-pivot rows computed in
    * parallel: after the pivot l(j)(j) is final, every l(i)(j), i > j
    * depends only on already-final columns < j and the pivot, so the
    * rows partition freely across cores. Each element's arithmetic is
    * the exact sequence the classic row-major loop performs
    * (s = a(i)(j) − Σ_{k<j} l(i)(k)·l(j)(k), k ascending), so the
    * factor is BIT-IDENTICAL to the serial one — this is a wall-clock
    * change only. At the langid gate's dim 2049 the factorization is
    * ~2.9 GFLOP of driver work and was the gate's single largest
    * component; small systems (< 256) keep the serial loop, not worth
    * the fork-join overhead.
    */
  private[ops] def cholesky(a: Array[Array[Double]]): Array[Array[Double]] = {
    val n = a.length
    val l = Array.ofDim[Double](n, n)
    val parallel = n >= 256
    var j = 0
    while (j < n) {
      // pivot: dot of row j with itself over columns < j
      var s = a(j)(j)
      var k = 0
      val lj = l(j)
      while (k < j) { s -= lj(k) * lj(k); k += 1 }
      require(s > 0, s"cholesky: matrix not positive definite at $j")
      val piv = math.sqrt(s)
      lj(j) = piv
      val jj = j
      if (parallel && n - j > 64) {
        java.util.stream.IntStream.range(jj + 1, n).parallel().forEach { i =>
          val li = l(i)
          var t = a(i)(jj)
          var q = 0
          while (q < jj) { t -= li(q) * lj(q); q += 1 }
          li(jj) = t / piv
        }
      } else {
        var i = j + 1
        while (i < n) {
          val li = l(i)
          var t = a(i)(jj)
          var q = 0
          while (q < jj) { t -= li(q) * lj(q); q += 1 }
          li(jj) = t / piv
          i += 1
        }
      }
      j += 1
    }
    l
  }

  /** Solve A x = b given A's Cholesky factor L (A = L Lᵀ): forward
    * then back substitution.
    */
  private[ops] def choleskySolve(l: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = l.length
    val y = new Array[Double](n)
    var i = 0
    while (i < n) {
      var s = b(i)
      var k = 0
      while (k < i) { s -= l(i)(k) * y(k); k += 1 }
      y(i) = s / l(i)(i)
      i += 1
    }
    val x = new Array[Double](n)
    i = n - 1
    while (i >= 0) {
      var s = y(i)
      var k = i + 1
      while (k < n) { s -= l(k)(i) * x(k); k += 1 }
      x(i) = s / l(i)(i)
      i -= 1
    }
    x
  }
}
