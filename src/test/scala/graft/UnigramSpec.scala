package graft

import graft.ops.Unigram
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (Kudo 2018 family): seeding, EM expected
  * counts, contribution pruning, Viterbi encode — hand-checkable
  * lattices, determinism under repartitioning, hostile input.
  */
class UnigramSpec extends SparkSuite {
  import spark.implicits._

  test("viterbi segmentation picks the max-likelihood path, ties prefer longer pieces") {
    val m = Unigram.UnigramModel(Seq(
      "a" -> math.log(0.1), "b" -> math.log(0.1),
      "ab" -> math.log(0.5), "abc" -> math.log(0.05), "c" -> math.log(0.15)), 6)
    // p(ab)·p(ab) = 0.25 beats any char path (0.1^4) and abc·b paths
    assert(m.encodeWord("abab") == List("ab", "ab"))
    // abc (0.05) vs ab·c (0.5·0.15 = 0.075) → ab, c
    assert(m.encodeWord("abc") == List("ab", "c"))
    // unknown char never fails: floor-prob singleton piece
    assert(m.encodeWord("axb") == List("a", "x", "b"))
    assert(m.encodeWord("axb").mkString == "axb")
    assert(m.encodeWord("") == Nil)
    // equal-probability tie prefers the longer piece
    val tie = Unigram.UnigramModel(Seq(
      "a" -> math.log(0.5), "aa" -> math.log(0.25)), 6)
    assert(tie.encodeWord("aa") == List("aa")) // 0.25 == 0.5·0.5 → longest wins
  }

  test("training: frequent substrings become pieces, EM mass concentrates, roundtrip always") {
    // 'ing'-heavy toy corpus: the trained model must keep a multi-char
    // piece covering the shared suffix and use it
    val counts = Seq(
      ("walking", 50L), ("talking", 50L), ("running", 50L),
      ("sing", 30L), ("ring", 30L), ("king", 30L), ("zebra", 2L))
    val m = Unigram.trainOnCounts(counts, vocabSize = 24, maxPieceLen = 4,
      seedSize = 200, emIters = 4, pruneFrac = 0.25)
    val vocabSet = m.pieces.map(_._1).toSet
    // single-char coverage is immortal
    assert(counts.flatMap(_._1.toSeq).map(_.toString).toSet.subsetOf(vocabSet))
    // a piece spanning 'ing' survived pruning and wins Viterbi
    assert(vocabSet.contains("ing"), s"vocab: $vocabSet")
    assert(m.encodeWord("walking").contains("ing"))
    // every training word roundtrips
    counts.foreach { case (w, _) => assert(m.encodeWord(w).mkString == w) }
    // log-probs form a (sub)distribution
    val mass = m.pieces.map { case (_, lp) => math.exp(lp) }.sum
    assert(mass > 0.5 && mass <= 1.0 + 1e-9, s"mass=$mass")
  }

  test("vocab size respected; pruning never drops single chars; degenerate corpora survive") {
    val counts = (0 until 50).map(i => (s"word$i${"x" * (i % 5)}", (i + 1).toLong))
    val m = Unigram.trainOnCounts(counts, vocabSize = 40, maxPieceLen = 5,
      seedSize = 500, emIters = 3, pruneFrac = 0.3)
    val singles = counts.flatMap(_._1.toSeq).map(_.toString).toSet
    assert(m.pieces.map(_._1).toSet.intersect(singles) == singles)
    assert(m.pieces.size <= math.max(40, singles.size))
    // empty and single-word corpora do not throw
    assert(Unigram.trainOnCounts(Nil, 10, 4, 100, 2, 0.25).pieces.isEmpty)
    val one = Unigram.trainOnCounts(Seq(("aaaa", 5L)), 10, 4, 100, 2, 0.25)
    assert(one.encodeWord("aaaa").mkString == "aaaa")
  }

  test("distributed train is partitioning-independent and the spark surface matches bpe's") {
    val docs = (0L until 60L)
      .map(i => (i, s"the running walking talking number ${i % 7} " * 3))
      .toDF("doc_id", "text")
    val m1 = Unigram.train(docs, "text", vocabSize = 64, vocabWords = 1000)
    val m2 = Unigram.train(docs.repartition(7), "text", vocabSize = 64, vocabWords = 1000)
    assert(m1.pieces == m2.pieces)
    val out = m1.encodeCounts(docs, "doc_id", "text")
    assert(out.columns.toSeq ==
      Seq("id", "n_words", "n_word_chars", "n_pieces", "roundtrip_ok"))
    val agg = out.agg(
      min(col("roundtrip_ok")), min(col("n_pieces") >= col("n_words")),
      min(col("n_pieces") <= col("n_word_chars")),
      (sum(col("n_pieces")) < sum(col("n_word_chars")))).collect()(0)
    assert(agg.getBoolean(0) && agg.getBoolean(1) && agg.getBoolean(2) && agg.getBoolean(3))
  }
}
