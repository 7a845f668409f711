package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BYTE-LEVEL byte-pair encoding — the GPT-2 / tiktoken family
  * (public: Radford et al. 2019 "Language Models are Unsupervised
  * Multitask Learners" §2.2; the released gpt-2 `encoder.py`), closing
  * the gap the word-level [[Bpe]] declares: production token budgets
  * bucket and bill over RAW text — punctuation, case, whitespace and
  * non-Latin included — so the trainable surface must be bytes, not
  * lowercase alphanumeric words.
  *
  *  - **Regex pre-tokenization**: GPT-2's published pattern —
  *    contraction suffixes, optionally-space-prefixed letter runs /
  *    digit runs / other-symbol runs, then whitespace (with the
  *    trailing-whitespace lookahead). The pattern TILES any text:
  *    every character lands in exactly one pretoken, so
  *    concatenating pretokens reproduces the input — asserted per
  *    document as half of `roundtrip_ok`.
  *  - **256-byte base alphabet + byte fallback**: each pretoken's
  *    UTF-8 bytes are the initial symbols (represented as latin-1
  *    chars, so symbol concatenation is byte concatenation), merges
  *    only ever combine adjacent symbols, and any byte sequence
  *    encodes without an UNK — encoding never fails by construction.
  *
  * Scale shape, identical to the existing three tokenizers: train =
  * ONE distributed pretoken count (`regexp_extract_all` is codegen'd,
  * the count is a groupBy) reduced to the top-`vocabWords` pretokens
  * on the driver where the classic merge loop runs; encode =
  * broadcast merge ranks + per-partition distinct-pretoken memo, so a
  * skewed corpus pays per distinct pretoken, not per occurrence.
  *
  * Determinism: merges picked by (weighted count desc, pair bytes
  * lexicographic asc); the regex and UTF-8 are engine-independent.
  */
object BpeBytes {

  /** GPT-2's pre-tokenization pattern (published in the gpt-2 repo's
    * encoder.py; `\p{L}`/`\p{N}` Unicode classes, Java-regex
    * compatible). */
  val pretokenPattern: String =
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""

  private val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  /** UTF-8 bytes of `s` as a latin-1 string (one char per byte):
    * substring concatenation IS byte concatenation there. */
  private[graft] def toByteString(s: String): String = new String(s.getBytes(utf8), latin1)
  private[graft] def fromByteString(b: String): String = new String(b.getBytes(latin1), utf8)

  final case class Model(merges: Seq[(String, String)]) {
    @transient lazy val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap

    /** Token list for one pretoken's byte-string: start from
      * single-byte symbols, repeatedly apply the lowest-ranked
      * adjacent merge — the classic BPE apply loop. */
    def encodePretoken(byteStr: String): List[String] = {
      var syms = byteStr.map(_.toString).toList
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

    /** (id, n_pretokens, n_bytes, n_tokens, roundtrip_ok) per
      * document. `roundtrip_ok` asserts BOTH halves of the identity:
      * the regex tiles the text (pretokens concatenate back to it)
      * and the tokens concatenate back to each pretoken's bytes.
      * Per-partition distinct-pretoken memo; broadcast ranks. */
    def encodeCounts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      val bcast = spark.sparkContext.broadcast(merges)
      df.select(col(idCol).cast("long"), coalesce(col(textCol), lit("")))
        .as[(Long, String)]
        .mapPartitions { rows =>
          val model = Model(bcast.value)
          val re = java.util.regex.Pattern.compile(pretokenPattern)
          val memo = scala.collection.mutable.HashMap.empty[String, (Int, Int, Boolean)]
          rows.map { case (id, text) =>
            val m = re.matcher(text)
            var nPre = 0L
            var nBytes = 0L
            var nTok = 0L
            var tiled = new StringBuilder
            var ok = true
            while (m.find()) {
              val pre = m.group()
              tiled.append(pre)
              nPre += 1
              val (bytes, toks, rt) = memo.getOrElseUpdate(pre, {
                val bs = toByteString(pre)
                val ts = model.encodePretoken(bs)
                (bs.length, ts.length, ts.mkString == bs)
              })
              nBytes += bytes
              nTok += toks
              ok &&= rt
            }
            ok &&= tiled.toString == text
            (id, nPre, nBytes, nTok, ok)
          }
        }
        .toDF("id", "n_pretokens", "n_bytes", "n_tokens", "roundtrip_ok")
    }
  }

  /** Train on the corpus: one distributed pretoken count (codegen'd
    * regex extraction), then the driver merge loop over the
    * top-`vocabWords` pretokens by count. */
  def train(corpus: DataFrame, textCol: String,
      numMerges: Int = 200, vocabWords: Int = 10000): Model = {
    require(numMerges >= 0, "bpe_bytes: numMerges must be >= 0")
    val counts = Partitioning.fanOut(corpus)
      .select(explode(regexp_extract_all(
        coalesce(col(textCol), lit("")), lit(pretokenPattern), lit(0))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w"))
      .limit(vocabWords)
      .collect()
      .map(r => (toByteString(r.getString(0)), r.getLong(1)))
    trainOnCounts(counts.toSeq, numMerges)
  }

  /** The classic merge loop over (byte-string pretoken, count) rows —
    * driver-local, the table is bounded. Pair choice: highest
    * weighted count, ties to the lexicographically smallest pair of
    * byte sequences. */
  private[graft] def trainOnCounts(counts: Seq[(String, Long)], numMerges: Int): Model = {
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
    Model(merges.result())
  }
}
