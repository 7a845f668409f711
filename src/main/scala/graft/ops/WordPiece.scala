package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece tokenizer — the BERT-family member beside [[Bpe]] and
  * [[Unigram]] (public: Schuster & Nakajima 2012; Devlin et al. 2018;
  * the training criterion and the greedy encode are both documented
  * in the Hugging Face tokenizer course and the BERT repo).
  *
  * Differences from BPE, both load-bearing:
  *  - **Training picks merges by LIKELIHOOD, not raw count**: the
  *    pair (a, b) with the highest count(ab) / (count(a)·count(b))
  *    merges first — frequent-but-expected pairs lose to rarer pairs
  *    whose parts are rare (the language-model justification in the
  *    original paper). Ties break lexicographically on the pair.
  *  - **Encoding is greedy longest-match-first against the VOCAB**,
  *    not merge replay: the longest vocab prefix is taken, the
  *    remainder matches continuation pieces (`##`-prefixed), and a
  *    word with any unmatchable remainder — or longer than
  *    `maxInputChars` (BERT's 100) — becomes ONE `[UNK]` token, the
  *    published unk rule.
  *
  * Scale shape, the [[Bpe]] pattern exactly: train = one distributed
  * word-count aggregate + a driver merge loop over the bounded
  * top-`vocabWords` table; apply = broadcast vocab (kilobytes) with a
  * per-partition distinct-word memo. Normalization is
  * [[TextAnalysis.tokens]] (lowercase alphanumerics), shared with the
  * other two tokenizers so token budgets compare column-for-column.
  */
object WordPiece {

  final case class WordPieceModel(vocab: Set[String],
      unk: String = "[UNK]", maxInputChars: Int = 100) {

    /** Greedy longest-match-first with `##` continuations; one [UNK]
      * for over-long or unmatchable words (never partial output).
      */
    def encodeWord(word: String): List[String] = {
      if (word.isEmpty) return Nil
      if (word.length > maxInputChars) return List(unk)
      val out = List.newBuilder[String]
      var start = 0
      while (start < word.length) {
        var end = word.length
        var found: String = null
        while (found == null && end > start) {
          val piece = {
            val sub = word.substring(start, end)
            if (start > 0) "##" + sub else sub
          }
          if (vocab.contains(piece)) found = piece else end -= 1
        }
        if (found == null) return List(unk)
        out += found
        start = end
      }
      out.result()
    }

    /** (id, n_words, n_word_chars, n_pieces, n_unk, roundtrip_ok) per
      * document. roundtrip_ok: every word either becomes [UNK] or its
      * pieces concatenate back exactly (continuation markers
      * stripped) — false means a kernel bug, which the gate asserts
      * corpus-wide. Per-partition distinct-word memo.
      */
    def encodeCounts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      val bcast = spark.sparkContext.broadcast((vocab, unk, maxInputChars))
      df.select(col(idCol).cast("long"),
          TextAnalysis.tokens(col(textCol)).as("__w"))
        .as[(Long, Seq[String])]
        .mapPartitions { rows =>
          val (v, u, mx) = bcast.value
          val model = WordPieceModel(v, u, mx)
          val memo = scala.collection.mutable.HashMap.empty[String, (Int, Boolean, Boolean)]
          rows.map { case (id, words) =>
            var nPieces = 0L
            var nChars = 0L
            var nUnk = 0L
            var ok = true
            words.foreach { w =>
              val (n, isUnk, o) = memo.getOrElseUpdate(w, {
                val toks = model.encodeWord(w)
                val unked = toks == List(u)
                (toks.length, unked,
                  unked || toks.map(_.stripPrefix("##")).mkString == w)
              })
              nPieces += n
              nChars += w.length
              if (isUnk) nUnk += 1
              ok &&= o
            }
            (id, words.length.toLong, nChars, nPieces, nUnk, ok)
          }
        }
        .toDF("id", "n_words", "n_word_chars", "n_pieces", "n_unk", "roundtrip_ok")
    }
  }

  /** Train on the corpus: distributed word counts, driver merge loop
    * over the top-`vocabWords` words. The vocab grows from the
    * initial alphabet (first-position chars plus `##`-continuations)
    * by `numMerges` likelihood-scored merges.
    */
  def train(corpus: DataFrame, textCol: String,
      numMerges: Int = 200, vocabWords: Int = 10000): WordPieceModel = {
    require(numMerges >= 0, "wordpiece: numMerges must be >= 0")
    val counts = Partitioning.fanOut(corpus)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w"))
      .limit(vocabWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainOnCounts(counts, numMerges)
  }

  /** The likelihood merge loop over a word-frequency table (driver-
    * local; bounded). Pair choice: max count(ab)/(count(a)·count(b)),
    * compared exactly via cross-multiplication (no float ties), ties
    * to the lexicographically smallest (left, right). The merged
    * symbol is left + right-without-`##`.
    */
  private[graft] def trainOnCounts(counts: Seq[(String, Long)],
      numMerges: Int): WordPieceModel = {
    var vocab: Seq[(List[String], Long)] = counts.map { case (w, c) =>
      (w.zipWithIndex.map { case (ch, i) =>
        if (i == 0) ch.toString else "##" + ch }.toList, c)
    }
    val pieces = scala.collection.mutable.LinkedHashSet.empty[String]
    vocab.foreach(_._1.foreach(pieces += _))
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      val symCounts = scala.collection.mutable.HashMap.empty[String, Long]
      vocab.foreach { case (syms, c) =>
        syms.foreach(s => symCounts.update(s, symCounts.getOrElse(s, 0L) + c))
        var cur = syms
        while (cur.nonEmpty && cur.tail.nonEmpty) {
          val p = (cur.head, cur.tail.head)
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          cur = cur.tail
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // argmax of pab/(pa*pb) by cross-multiplication: a beats b
        // iff pab_a * pa_b * pb_b > pab_b * pa_a * pb_a (BigInt: the
        // products can exceed Long at corpus scale)
        var best: ((String, String), BigInt, BigInt) = null
        pairCounts.foreach { case (p, pab) =>
          val num = BigInt(pab)
          val den = BigInt(symCounts(p._1)) * BigInt(symCounts(p._2))
          if (best == null) best = (p, num, den)
          else {
            val cmp = (num * best._3).compare(best._2 * den)
            if (cmp > 0 || (cmp == 0 &&
              (p._1 < best._1._1 || (p._1 == best._1._1 && p._2 < best._1._2))))
              best = (p, num, den)
          }
        }
        val bp = best._1
        val joined = bp._1 + bp._2.stripPrefix("##")
        pieces += joined
        vocab = vocab.map { case (syms, c) =>
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var cur = syms
          while (cur.nonEmpty) {
            if (cur.tail.nonEmpty && cur.head == bp._1 && cur.tail.head == bp._2) {
              out += joined
              cur = cur.tail.tail
            } else {
              out += cur.head
              cur = cur.tail
            }
          }
          (out.toList, c)
        }
        m += 1
      }
    }
    WordPieceModel(pieces.toSet)
  }
}
