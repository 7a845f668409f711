package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer — the real algorithm behind LLM token
  * budgets (public: Sennrich et al. 2016; GPT-2's tokenizer is the
  * byte-level variant), replacing proxy counts with trained merges.
  *
  * Scale shape, same pattern as [[Pca]] / [[TextAnalysis.unigramLogProbs]]:
  *  - **Train = one distributed aggregate + driver loop on a bounded
  *    table.** Word counts come from one explode+count over the corpus;
  *    the merge loop runs on the TOP-`vocabWords` words by count
  *    (deterministic tie-break on the word) — a bounded driver table,
  *    exactly how reference BPE trainers operate on pre-counted word
  *    frequency dicts. The corpus is never scanned per merge.
  *  - **Apply = broadcast ranks + per-partition memo.** Encoding
  *    broadcasts the merge-rank map (kilobytes) and memoizes per
  *    distinct word within each partition, so a skewed corpus pays per
  *    DISTINCT word, not per occurrence. No driver involvement.
  *
  * Determinism contract: merges picked by (count desc, pair lexicographic
  * asc); words are [[TextAnalysis.tokens]] lowercase alphanumerics, so
  * training and encoding share one normalization. Within-word merges
  * only (no end-of-word symbol — a declared simplification: token
  * COUNTS and roundtrip identity, the pipeline-relevant outputs, are
  * unaffected by the marker convention).
  */
object Bpe {

  final case class BpeModel(merges: Seq[(String, String)]) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** BPE token list for one (already-normalized) word. */
    def encodeWord(word: String): List[String] = {
      var syms = word.map(_.toString).toList
      var done = syms.lengthCompare(2) < 0
      while (!done) {
        var bestRank = Int.MaxValue
        var bestIdx = -1
        var i = 0
        var cur = syms
        while (cur.nonEmpty && cur.tail.nonEmpty) {
          val r = ranks.getOrElse((cur.head, cur.tail.head), Int.MaxValue)
          if (r < bestRank) { bestRank = r; bestIdx = i }
          i += 1
          cur = cur.tail
        }
        if (bestIdx < 0) done = true
        else {
          val (pre, rest) = syms.splitAt(bestIdx)
          syms = pre ++ ((rest.head + rest.tail.head) :: rest.tail.tail)
          if (syms.lengthCompare(2) < 0) done = true
        }
      }
      syms
    }

    /** (id, n_words, n_word_chars, n_bpe_tokens, roundtrip_ok) per document —
      * roundtrip_ok asserts concat(tokens) == word for every word (BPE
      * only merges, so false means a kernel bug, which is what the
      * gate checks corpus-wide). Per-partition distinct-word memo.
      */
    def encodeCounts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      val bcast = spark.sparkContext.broadcast(merges)
      df.select(col(idCol).cast("long"),
          TextAnalysis.tokens(col(textCol)).as("__w"))
        .as[(Long, Seq[String])]
        .mapPartitions { rows =>
          val model = BpeModel(bcast.value)
          val memo = scala.collection.mutable.HashMap.empty[String, (Int, Boolean)]
          rows.map { case (id, words) =>
            var nTok = 0L
            var nChars = 0L
            var ok = true
            words.foreach { w =>
              val (n, o) = memo.getOrElseUpdate(w, {
                val toks = model.encodeWord(w)
                (toks.length, toks.mkString == w)
              })
              nTok += n
              nChars += w.length
              ok &&= o
            }
            (id, words.length.toLong, nChars, nTok, ok)
          }
        }
        .toDF("id", "n_words", "n_word_chars", "n_bpe_tokens", "roundtrip_ok")
    }
  }

  /** Train on the corpus: distributed word counts, driver merge loop
    * over the top-`vocabWords` words. `numMerges` bounds the merge
    * table (the model size knob LLM tokenizers expose as vocab size).
    */
  def train(corpus: DataFrame, textCol: String,
      numMerges: Int = 200, vocabWords: Int = 10000): BpeModel = {
    require(numMerges >= 0, "bpe: numMerges must be >= 0")
    val counts = Partitioning.fanOut(corpus)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w"))
      .limit(vocabWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainOnCounts(counts, numMerges)
  }

  /** The classic merge loop over a word-frequency table (driver-local;
    * the table is bounded). Pair choice: highest weighted count, ties
    * to the lexicographically smallest (left, right).
    */
  private[graft] def trainOnCounts(counts: Seq[(String, Long)], numMerges: Int): BpeModel = {
    var vocab: Seq[(List[String], Long)] =
      counts.map { case (w, c) => (w.map(_.toString).toList, c) }
    val merges = Seq.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var cur = syms
        while (cur.nonEmpty && cur.tail.nonEmpty) {
          val p = (cur.head, cur.tail.head)
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          cur = cur.tail
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        vocab = vocab.map { case (syms, c) =>
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var cur = syms
          while (cur.nonEmpty) {
            if (cur.tail.nonEmpty && cur.head == best._1 && cur.tail.head == best._2) {
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
    BpeModel(merges.result())
  }
}
