package graft

import org.apache.spark.sql.functions._

import graft.ops.Sentences

/** Sentence segmentation rules on hand inputs, plus the chunker's
  * packing/overlap arithmetic. */
class SentencesSpec extends SparkSuite {
  import spark.implicits._

  private def s(t: String) = Sentences.sentencesOf(t)

  test("basic boundaries: terminators before an uppercase/digit/quote start") {
    assert(s("One. Two. Three.") == Vector("One.", "Two.", "Three."))
    assert(s("Done! 3 more? \"Sure.\"") == Vector("Done!", "3 more?", "\"Sure.\""))
    // closers ride with the sentence
    assert(s("He said \"stop.\" Then left.") == Vector("He said \"stop.\"", "Then left."))
    // run of terminators is one boundary
    assert(s("What?! Really.") == Vector("What?!", "Really."))
  }

  test("suppression: abbreviations, initials, decimals; lowercase continuation") {
    assert(s("Dr. Smith met Mr. Jones.") == Vector("Dr. Smith met Mr. Jones."))
    assert(s("J. R. Tolkien wrote it.") == Vector("J. R. Tolkien wrote it."))
    assert(s("It cost 3.5 dollars. Cheap.") == Vector("It cost 3.5 dollars.", "Cheap."))
    assert(s("See Fig. 2 for details.") == Vector("See Fig. 2 for details."))
    // period before a lowercase word does not split (e.g. "etc. and")
    assert(s("apples, pears, etc. and more") == Vector("apples, pears, etc. and more"))
    assert(s("ends mid. sentence here") == Vector("ends mid. sentence here"))
    // but ?! split even before the abbreviation guard could apply
    assert(s("Ready?! Dr. Who arrived.") == Vector("Ready?!", "Dr. Who arrived."))
  }

  test("newlines are hard boundaries; degenerate inputs") {
    assert(s("first line\nsecond line") == Vector("first line", "second line"))
    assert(s("Yes.\nthe rest") == Vector("Yes.", "the rest"))
    assert(s("no terminator at all") == Vector("no terminator at all"))
    assert(s("") == Vector())
    assert(s("   \n  ") == Vector())
    assert(s(null) == Vector())
  }

  test("sentence-level dedup: boilerplate vanishes, unique prose survives, order kept") {
    val docs = (1 to 6).map { i =>
      (i.toLong, s"Unique thought number $i today. Subscribe to our list now. Closing words $i here.")
    }.toDF("id", "text")
    val got = graft.ops.Dedup.dedupSentences(docs, "id", "text", minDf = 4)
      .select($"id", $"text", $"n_sentences_removed")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    got.foreach { case (i, t, n) =>
      assert(t == s"Unique thought number $i today. Closing words $i here.", s"id=$i")
      assert(n == 1L)
    }
    // below min_df: nothing removed, text byte-identical
    val few = (1 to 3).map(i => (i.toLong, s"Shared pitch line. Own words $i."))
      .toDF("id", "text")
    val kept = graft.ops.Dedup.dedupSentences(few, "id", "text", minDf = 4)
      .select($"n_sentences_removed").as[Long].collect()
    assert(kept.forall(_ == 0L))
    // null text rows pass through untouched
    val withNull = Seq((1L, null: String), (2L, "Solo.")).toDF("id", "text")
    val nn = graft.ops.Dedup.dedupSentences(withNull, "id", "text", minDf = 2)
      .select($"id", $"text").as[(Long, String)].collect().sortBy(_._1)
    assert(nn.toSeq == Seq((1L, null), (2L, "Solo.")))
  }

  test("chunker: packing bound, overlap carry, over-long single sentence") {
    val df = Seq((1L, "One one. Two two. Three three. Four four.")).toDF("id", "t")
    // each sentence 8-12 chars; maxChars 20 packs two short ones
    val got = Sentences.chunkBySentence(df, "id", "t", maxChars = 20, overlap = 0)
      .select($"chunk", $"text", $"n_sentences")
      .as[(Int, String, Int)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq("One one. Two two.", "Three three.", "Four four."))
    // overlap repeats the previous tail sentence
    val ov = Sentences.chunkBySentence(df, "id", "t", maxChars = 20, overlap = 1)
      .select($"chunk", $"text").as[(Int, String)].collect().sortBy(_._1)
    assert(ov(1)._2.startsWith("Two two."))
    // a single over-long sentence still emits (never split)
    val long = Seq((2L, "x" * 100 + ". Next.")).toDF("id", "t")
    val lg = Sentences.chunkBySentence(long, "id", "t", maxChars = 20)
      .select($"text").as[String].collect()
    assert(lg.exists(_.length > 20))
  }
}
