package graft

import graft.ops.WordPiece
import graft.ops.WordPiece.WordPieceModel

/** WordPiece: hand-replayed likelihood merges, the published greedy
  * longest-match / `##` continuation / one-[UNK] encode rules, and
  * the Spark seam — the BpeSpec/UnigramSpec contract shape.
  */
class WordPieceSpec extends SparkSuite {
  import spark.implicits._

  test("training picks by likelihood, not raw count (the WordPiece-vs-BPE divider)") {
    // hand table: "aa" x 8, "ab" x 6, "bb" x 1
    // symbols: a: first-position a; ##a, ##b continuations; b unused first? "bb": b + ##b
    // counts: a = 14 (aa: 8 + ab: 6), ##a = 8, ##b = 7, b = 1
    // pairs: (a,##a): 8  score 8/(14*8)  = 0.0714...
    //        (a,##b): 6  score 6/(14*7)  = 0.0612...
    //        (b,##b): 1  score 1/(1*7)   = 0.1428... <- wins despite count 1
    val m = WordPiece.trainOnCounts(Seq(("aa", 8L), ("ab", 6L), ("bb", 1L)), numMerges = 1)
    assert(m.vocab.contains("bb"), s"likelihood pick failed: ${m.vocab}")
    assert(!m.vocab.contains("aa"))
    // raw-count BPE on the same table picks (a, a) first — the divider
    val bpe = graft.ops.Bpe.trainOnCounts(Seq(("aa", 8L), ("ab", 6L), ("bb", 1L)), 1)
    assert(bpe.merges.head == ("a", "a"))
  }

  test("merge ties break lexicographically; continuation strips on join") {
    // "xy" x 2, "zw" x 2: both pairs score 2/(2*2) -> tie -> (x,##y) < (z,##w)
    val m = WordPiece.trainOnCounts(Seq(("xy", 2L), ("zw", 2L)), numMerges = 1)
    assert(m.vocab.contains("xy") && !m.vocab.contains("zw"))
    // a continuation-side merge keeps the ## of its LEFT part
    // "abc" x 3: pairs (a,##b) score 3/(3*3), (##b,##c) score 3/(3*3) -> tie ->
    // ("##b","##c") vs ("a","##b"): "##b" < "a" lexicographically -> ##bc forms
    val m2 = WordPiece.trainOnCounts(Seq(("abc", 3L)), numMerges = 1)
    assert(m2.vocab.contains("##bc"), s"${m2.vocab}")
  }

  test("encode: greedy longest-match-first, ## continuation, published unk rules") {
    val v = Set("un", "##aff", "##able", "##ab", "##le", "aff", "a", "##f",
      "hug", "##ging", "hu", "##g")
    val m = WordPieceModel(v)
    // longest prefix wins: "un" + "##aff" + "##able" (not ##ab + ##le)
    assert(m.encodeWord("unaffable") == List("un", "##aff", "##able"))
    // greedy is NOT optimal: "hugging" -> hug + ##ging
    assert(m.encodeWord("hugging") == List("hug", "##ging"))
    // unmatchable remainder: ONE [UNK], no partial pieces
    assert(m.encodeWord("unz") == List("[UNK]"))
    // whole word unknown
    assert(m.encodeWord("qqq") == List("[UNK]"))
    // over-long word: the BERT 100-char rule
    assert(m.encodeWord("a" * 101) == List("[UNK]"))
    assert(m.encodeWord("") == Nil)
    // single known char at word start only: "a" in vocab, "##a" is not
    assert(m.encodeWord("a") == List("a"))
    assert(WordPieceModel(Set("b")).encodeWord("ab") == List("[UNK]"))
  }

  test("corpus-trained model: zero unk on its own corpus, roundtrip, compression") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, s"the training corpus sentence number $i with repeated words the the"))
      .toDF("doc_id", "text")
    val model = WordPiece.train(docs, "text", numMerges = 60)
    val out = model.encodeCounts(docs, "doc_id", "text")
      .select($"id", $"n_words", $"n_word_chars", $"n_pieces", $"n_unk", $"roundtrip_ok")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(out.length == 40)
    out.foreach { case (id, nw, nc, np, nu, ok) =>
      assert(ok, s"roundtrip failed for doc $id")
      assert(nu == 0L, s"unk on own corpus for doc $id")
      assert(np >= nw && np <= nc, s"piece count out of band for doc $id")
    }
    // trained multi-char pieces must actually compress vs characters
    assert(out.map(_._4).sum < out.map(_._3).sum)
    // merges landed: ubiquitous "the" encodes in fewer pieces than
    // chars (the likelihood criterion may split it th + ##e — unlike
    // count-greedy BPE it spends merges on rare-part pairs first)
    assert(model.encodeWord("the").length < 3)
    assert(model.vocab.exists(p => p.stripPrefix("##").length > 1))
  }

  test("spec op registers and runs") {
    import graft.spec._
    val docs = Seq((1L, "alpha beta alpha"), (2L, "beta gamma")).toDF("doc_id", "text")
    val got = graft.transforms.Transforms(docs,
      TransformSpec("wp", "wordpiece_tokens",
        Config.of("id_field" -> "doc_id", "num_merges" -> 20L)), Map.empty)
    assert(got.columns.toSeq ==
      Seq("id", "n_words", "n_word_chars", "n_pieces", "n_unk", "roundtrip_ok"))
    assert(got.count() == 2)
  }
}
