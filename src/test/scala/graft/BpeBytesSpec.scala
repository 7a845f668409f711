package graft

import org.apache.spark.sql.functions._
import graft.ops.BpeBytes

/** Byte-level BPE (round 17): hand-computed merges on multi-byte
  * input, the GPT-2 pretokenizer's tiling behavior, byte fallback,
  * and the deterministic tie-break. */
class BpeBytesSpec extends SparkSuite {
  import spark.implicits._

  test("hand-computed merges: 'ab ab ab' trains (a,b) then (space,ab)") {
    val corpus = Seq((1L, "ab ab ab")).toDF("id", "text")
    val model = BpeBytes.train(corpus, "text", numMerges = 2)
    // pretokens: "ab"×1, " ab"×2 → pair (a,b) count 3 beats (␠,a) 2;
    // after merging, (␠,ab) count 2 is the only pair left
    assert(model.merges == Seq(("a", "b"), (" ", "ab")))
    val out = model.encodeCounts(corpus, "id", "text")
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    assert(out == ((1L, 3L, 8L, 3L, true))) // 3 pretokens, 8 bytes, 3 tokens
  }

  test("multi-byte UTF-8 merges at the BYTE level") {
    // "éé" is C3 A9 C3 A9: the dominant pair is the é byte pair itself
    val corpus = Seq((1L, "éé")).toDF("id", "text")
    val model = BpeBytes.train(corpus, "text", numMerges = 1)
    assert(model.merges == Seq((BpeBytes.toByteString("é").substring(0, 1),
      BpeBytes.toByteString("é").substring(1, 2))))
    val out = model.encodeCounts(corpus, "id", "text")
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    assert(out == ((1L, 1L, 4L, 2L, true))) // 4 bytes → 2 'é' tokens
  }

  test("byte fallback: never-seen bytes encode as single bytes, never fail") {
    val model = BpeBytes.train(Seq((1L, "aaa aaa")).toDF("id", "text"), "text",
      numMerges = 5)
    val out = model.encodeCounts(Seq((9L, "zzz ü…")).toDF("id", "text"), "id", "text")
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    // pretokens "zzz", " ü", "…"; bytes 3 + 3 + 3 = 9; no merges apply
    assert(out._5, "fallback must still roundtrip")
    assert(out._4 == out._3, "unseen bytes stay single-byte tokens")
    assert(out._3 == 9L)
  }

  test("tie-break: equal counts pick the lexicographically smallest byte pair") {
    val model = BpeBytes.train(Seq((1L, "ab"), (2L, "cd")).toDF("id", "text"),
      "text", numMerges = 1)
    assert(model.merges == Seq(("a", "b")))
  }

  test("the GPT-2 pattern tiles contractions and whitespace runs") {
    val corpus = Seq((1L, "I'll  go"), (2L, "hi "), (3L, "x  ")).toDF("id", "text")
    val model = BpeBytes.Model(Seq.empty)
    val out = model.encodeCounts(corpus, "id", "text")
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    // "I'll  go" → I | 'll | ␠ | ␠go (the (?!\S) lookahead splits the
    // double space so the letter run keeps its leading space)
    assert(out(0) == ((1L, 4L, 8L, 8L, true)))
    // "hi " → hi | ␠ (trailing whitespace)
    assert(out(1) == ((2L, 2L, 3L, 3L, true)))
    // "x  " → x | ␠␠
    assert(out(2) == ((3L, 2L, 3L, 3L, true)))
  }

  test("punctuation/case/whitespace survive: tokens over raw text compress after training") {
    val corpus = Seq.tabulate(20)(i =>
      (i.toLong, s"Hello, WORLD! The #$i item costs $$9.99 — really.")).toDF("id", "text")
    val model = BpeBytes.train(corpus, "text", numMerges = 100)
    val agg = model.encodeCounts(corpus, "id", "text")
      .agg(min(col("roundtrip_ok")), min(col("n_tokens") >= col("n_pretokens")),
        min(col("n_tokens") <= col("n_bytes")),
        (sum(col("n_tokens")) < sum(col("n_bytes")))).collect().head
    assert(agg.getBoolean(0) && agg.getBoolean(1) && agg.getBoolean(2) && agg.getBoolean(3))
  }

  test("byte_bpe_tokens spec-op dispatches") {
    val df = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val out = graft.transforms.Transforms.apply(df,
      graft.spec.TransformSpec("t", "byte_bpe_tokens",
        graft.spec.Config.of("id_field" -> "doc_id", "num_merges" -> 2)),
      Map.empty)
    assert(out.columns.toSeq ==
      Seq("id", "n_pretokens", "n_bytes", "n_tokens", "roundtrip_ok"))
    assert(out.as[(Long, Long, Long, Long, Boolean)].collect().head ==
      ((1L, 3L, 8L, 3L, true)))
  }
}
