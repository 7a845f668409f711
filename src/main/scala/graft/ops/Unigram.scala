package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer — the OTHER trained-subword family next to
  * [[Bpe]] (public: Kudo 2018, the algorithm behind SentencePiece's
  * default model): pieces carry probabilities, a word's tokenization
  * is the max-likelihood segmentation, and the vocabulary is grown
  * down from a large seed by EM + pruning rather than up by merges.
  *
  * Scale shape (the [[Bpe]] discipline exactly):
  *  - **Train = one distributed aggregate + driver loop on a bounded
  *    table.** Word counts come from one explode+count; seeding, EM
  *    (forward-backward expected counts over each word's segmentation
  *    lattice), and pruning all run on the TOP-`vocabWords` word
  *    frequency table — the corpus is never rescanned per iteration.
  *  - **Apply = broadcast pieces + per-partition memo.** Encoding
  *    broadcasts the (piece → logp) table (kilobytes) and memoizes
  *    per distinct word within each partition — a skewed corpus pays
  *    per DISTINCT word, not per occurrence.
  *
  * Determinism contract: every candidate ordering ties to the
  * lexicographically smallest string; EM and prune iterate pieces in
  * sorted order; Viterbi ties prefer the LONGEST piece at each
  * boundary. Training twice on any repartitioning of the corpus
  * yields the identical model (spec-asserted).
  *
  * Declared simplification vs SentencePiece: pruning drops the
  * lowest-expected-count multi-char pieces a fraction at a time with
  * EM re-runs between prunes (the "EM + prune by contribution" loop)
  * instead of the exact leave-one-out likelihood loss; single-char
  * pieces are never pruned, so every training word stays segmentable.
  * Words are [[TextAnalysis.tokens]] lowercase alphanumerics — the
  * same normalization BPE trains on, so the two tokenizers are
  * directly comparable on token counts.
  */
object Unigram {

  /** log-prob floor for characters never seen in training (encode
    * must never fail on new text — the hostile-input contract). */
  private[ops] val UnknownLogp = math.log(1e-10)

  final case class UnigramModel(pieces: Seq[(String, Double)], maxLen: Int) {
    @transient lazy val table: Map[String, Double] = pieces.toMap

    /** Max-likelihood (Viterbi) segmentation of one normalized word;
      * unknown characters surface as their own floor-prob piece. */
    def encodeWord(word: String): List[String] = {
      val n = word.length
      if (n == 0) return Nil
      val best = Array.fill(n + 1)(Double.NegativeInfinity)
      val back = new Array[Int](n + 1) // piece length ending at i
      best(0) = 0.0
      var i = 1
      while (i <= n) {
        var l = 1
        val lMax = math.min(maxLen, i)
        while (l <= lMax) {
          val lp = table.get(word.substring(i - l, i)) match {
            case Some(p) => p
            case None    => if (l == 1) UnknownLogp else Double.NegativeInfinity
          }
          if (lp != Double.NegativeInfinity && best(i - l) + lp >= best(i)) {
            // >= : ties prefer the longest piece (l ascends, so a
            // longer piece overwrites an equal-score shorter one)
            best(i) = best(i - l) + lp
            back(i) = l
          }
          l += 1
        }
        i += 1
      }
      var out = List.empty[String]
      var at = n
      while (at > 0) {
        val l = back(at)
        out = word.substring(at - l, at) :: out
        at -= l
      }
      out
    }

    /** (id, n_words, n_word_chars, n_pieces, roundtrip_ok) per doc —
      * the [[Bpe.BpeModel.encodeCounts]] surface, so unigram and BPE
      * token budgets compare column for column. */
    def encodeCounts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      val bcast = spark.sparkContext.broadcast((pieces, maxLen))
      df.select(col(idCol).cast("long"),
          TextAnalysis.tokens(col(textCol)).as("__w"))
        .as[(Long, Seq[String])]
        .mapPartitions { rows =>
          val (ps, ml) = bcast.value
          val model = UnigramModel(ps, ml)
          val memo = scala.collection.mutable.HashMap.empty[String, (Int, Boolean)]
          rows.map { case (id, words) =>
            var nTok = 0L
            var nChars = 0L
            var ok = true
            words.foreach { w =>
              val (k, o) = memo.getOrElseUpdate(w, {
                val toks = model.encodeWord(w)
                (toks.length, toks.mkString == w)
              })
              nTok += k
              nChars += w.length
              ok &&= o
            }
            (id, words.length.toLong, nChars, nTok, ok)
          }
        }
        .toDF("id", "n_words", "n_word_chars", "n_pieces", "roundtrip_ok")
    }
  }

  /** Train on the corpus: distributed word counts, driver EM+prune
    * loop over the top-`vocabWords` words. `vocabSize` is the target
    * piece count (the SentencePiece knob). */
  def train(corpus: DataFrame, textCol: String,
            vocabSize: Int = 512, maxPieceLen: Int = 6,
            seedSize: Int = 2048, emIters: Int = 4,
            pruneFrac: Double = 0.25, vocabWords: Int = 10000): UnigramModel = {
    val counts = Partitioning.fanOut(corpus)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w"))
      .limit(vocabWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    trainOnCounts(counts, vocabSize, maxPieceLen, seedSize, emIters, pruneFrac)
  }

  /** The EM + prune loop over a word-frequency table (driver-local;
    * the table is bounded, the lattices are per-word O(len·maxLen)). */
  private[graft] def trainOnCounts(counts: Seq[(String, Long)], vocabSize: Int,
                                   maxPieceLen: Int, seedSize: Int,
                                   emIters: Int, pruneFrac: Double): UnigramModel = {
    require(vocabSize > 0 && maxPieceLen >= 1 && seedSize >= vocabSize,
      "unigram: need vocabSize > 0, maxPieceLen >= 1, seedSize >= vocabSize")
    // ---- seed: every substring ≤ maxPieceLen weighted by word count
    val subCounts = scala.collection.mutable.HashMap.empty[String, Long]
    counts.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        val lMax = math.min(maxPieceLen, w.length - i)
        while (l <= lMax) {
          val s = w.substring(i, i + l)
          subCounts.update(s, subCounts.getOrElse(s, 0L) + c)
          l += 1
        }
        i += 1
      }
    }
    if (subCounts.isEmpty) return UnigramModel(Nil, maxPieceLen)
    val singles = subCounts.keysIterator.filter(_.length == 1).toArray.sorted
    val multis = subCounts.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (s, c) => (-c, s) }
      .take(math.max(0, seedSize - singles.length))
      .map(_._1)
    var vocab: Array[String] = (singles ++ multis).sorted
    // init probs ∝ seed counts
    var logp: Map[String, Double] = {
      val tot = vocab.iterator.map(subCounts(_).toDouble).sum
      vocab.iterator.map(s => s -> math.log(subCounts(s) / tot)).toMap
    }

    // forward-backward expected counts for the current vocab
    def emPass(): (scala.collection.mutable.HashMap[String, Double], Double) = {
      val expected = scala.collection.mutable.HashMap.empty[String, Double]
      var ll = 0.0
      val inVocab = logp
      counts.foreach { case (w, c) =>
        val n = w.length
        val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
        val beta = Array.fill(n + 1)(Double.NegativeInfinity)
        alpha(0) = 0.0
        var i = 1
        while (i <= n) {
          var l = 1
          val lMax = math.min(maxPieceLen, i)
          while (l <= lMax) {
            inVocab.get(w.substring(i - l, i)).foreach { lp =>
              if (alpha(i - l) != Double.NegativeInfinity)
                alpha(i) = logAdd(alpha(i), alpha(i - l) + lp)
            }
            l += 1
          }
          i += 1
        }
        beta(n) = 0.0
        i = n - 1
        while (i >= 0) {
          var l = 1
          val lMax = math.min(maxPieceLen, n - i)
          while (l <= lMax) {
            inVocab.get(w.substring(i, i + l)).foreach { lp =>
              if (beta(i + l) != Double.NegativeInfinity)
                beta(i) = logAdd(beta(i), beta(i + l) + lp)
            }
            l += 1
          }
          i -= 1
        }
        val z = alpha(n)
        if (z != Double.NegativeInfinity) { // unsegmentable words skip EM
          ll += c * z
          i = 1
          while (i <= n) {
            var l = 1
            val lMax = math.min(maxPieceLen, i)
            while (l <= lMax) {
              val s = w.substring(i - l, i)
              inVocab.get(s).foreach { lp =>
                if (alpha(i - l) != Double.NegativeInfinity &&
                    beta(i) != Double.NegativeInfinity) {
                  val e = math.exp(alpha(i - l) + lp + beta(i) - z) * c
                  expected.update(s, expected.getOrElse(s, 0.0) + e)
                }
              }
              l += 1
            }
            i += 1
          }
        }
      }
      (expected, ll)
    }

    var done = false
    var lastExpected = scala.collection.mutable.HashMap.empty[String, Double]
    while (!done) {
      var it = 0
      while (it < emIters) {
        val (expected, _) = emPass()
        lastExpected = expected
        val tot = math.max(expected.valuesIterator.sum, 1e-12)
        logp = vocab.iterator.map { s =>
          s -> math.log(math.max(expected.getOrElse(s, 0.0), 1e-12) / tot)
        }.toMap
        it += 1
      }
      if (vocab.length <= vocabSize) done = true
      else {
        // prune the lowest-contribution multi-char pieces, a fraction
        // at a time; singles are load-bearing (coverage) and immortal
        val multisNow = vocab.filter(_.length > 1)
        val nSingles = vocab.length - multisNow.length
        val keepMultis = math.max(vocabSize - nSingles,
          (multisNow.length * (1.0 - pruneFrac)).toInt)
        if (keepMultis >= multisNow.length) done = true // cannot shrink further
        else {
          val kept = multisNow
            .map(s => (s, lastExpected.getOrElse(s, 0.0)))
            .sortBy { case (s, e) => (-e, s) }
            .take(math.max(0, keepMultis))
            .map(_._1)
          vocab = (vocab.filter(_.length == 1) ++ kept).sorted
          logp = {
            val raw = vocab.map(s => (s, lastExpected.getOrElse(s, 1e-12)))
            val tot = math.max(raw.iterator.map(_._2).sum, 1e-12)
            raw.iterator.map { case (s, e) => s -> math.log(math.max(e, 1e-12) / tot) }.toMap
          }
        }
      }
    }
    UnigramModel(vocab.sorted.map(s => (s, logp(s))).toSeq, maxPieceLen)
  }

  private def logAdd(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else if (a > b) a + math.log1p(math.exp(b - a))
    else b + math.log1p(math.exp(a - b))
}
