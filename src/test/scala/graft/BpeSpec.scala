package graft

import org.apache.spark.sql.functions._

import graft.ops.Bpe

/** BPE tokenizer: hand-computed merge sequences, encode laws,
  * corpus-train determinism.
  */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("merge loop reproduces the hand-computed sequence") {
    // counts: abab x2, ab x3 → pair (a,b) weighted 7 beats (b,a) 2
    val m = Bpe.trainOnCounts(Seq(("abab", 2L), ("ab", 3L)), numMerges = 2)
    assert(m.merges == Seq(("a", "b"), ("ab", "ab")))
    assert(m.encodeWord("abab") == List("abab"))
    assert(m.encodeWord("ab") == List("ab"))
    assert(m.encodeWord("aba") == List("ab", "a"))
    assert(m.encodeWord("ba") == List("b", "a")) // unranked pair: untouched
    assert(m.encodeWord("x") == List("x"))
    assert(m.encodeWord("") == Nil)
  }

  test("tie-break is lexicographic on the pair, count first") {
    // "cd" and "ab" both weight 1 → (a,b) wins the tie
    val m = Bpe.trainOnCounts(Seq(("ab", 1L), ("cd", 1L)), numMerges = 1)
    assert(m.merges == Seq(("a", "b")))
  }

  test("merge exhaustion stops early; zero merges = character tokens") {
    val m = Bpe.trainOnCounts(Seq(("aa", 1L)), numMerges = 10)
    assert(m.merges == Seq(("a", "a"))) // one pair exists, then nothing
    val none = Bpe.trainOnCounts(Seq(("abc", 5L)), numMerges = 0)
    assert(none.encodeWord("abc") == List("a", "b", "c"))
  }

  test("corpus train + encode: roundtrip, bounds, distributed memo path") {
    val docs = Seq(
      (1L, "spark spark spark streaming engine"),
      (2L, "spark engine streaming streaming"),
      (3L, "")).toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", numMerges = 50)
    val out = model.encodeCounts(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    assert(out(1L)._4 && out(2L)._4 && out(3L)._4)
    assert(out(3L) == ((0L, 0L, 0L, true)))
    // with 50 merges over a 3-word vocab, every word collapses fully
    assert(out(1L)._3 == out(1L)._1, s"expected full merge: ${out(1L)}")
    // determinism: retrain gives the identical merge table
    assert(Bpe.train(docs, "text", numMerges = 50).merges == model.merges)
  }
}
