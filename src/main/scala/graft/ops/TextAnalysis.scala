package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (SURVEY §2.6): tokenization, token counting, quality scoring,
  * language ID, document fingerprinting.
  *
  * Everything here is a pure column expression over
  * `org.apache.spark.sql.functions` — whole-stage-codegen'd, no UDFs,
  * no shuffle; at 100 TB these run at scan speed and combine freely
  * with pushed-down filters. All heuristics are deterministic and
  * SQL-expressible, so results are oracle-checkable cross-engine.
  */
object TextAnalysis {

  /** Lowercased alphanumeric word tokens, empties removed. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= lit(""))

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count: word pieces + digit runs + punctuation
    * marks each count as one token — a cheap, deterministic proxy for
    * an LLM tokenizer's token count (roughly GPT-2 pre-tokenization).
    */
  def bpeishTokenCount(text: Column): Column =
    size(filter(split(text, """(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])"""), t => t.rlike("\\S")))
      .cast("long")

  private val stopwords = Seq(
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "be", "this", "that")

  /** Quality-scoring columns: struct(n_tokens, avg_token_len,
    * punct_ratio, stopword_ratio, quality_score). Score is a simple
    * deterministic combination rewarding mid-length tokens, some
    * stopword mass (prose-ness) and low punctuation noise — the shape
    * of heuristics used for pre-training corpus filtering.
    */
  def qualityStruct(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("long")
    val charLen = length(text).cast("double")
    val avgTokLen = when(nTok > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / nTok)
      .otherwise(lit(0.0))
    val punct = charLen - length(regexp_replace(text, "[^a-zA-Z0-9 ]", "")).cast("double")
    val punctRatio = when(charLen > 0, punct / charLen).otherwise(lit(0.0))
    val stopCol = lit(stopwords.toArray)
    val stopRatio = when(nTok > 0,
      size(filter(toks, t => array_contains(stopCol, t))).cast("double") / nTok)
      .otherwise(lit(0.0))
    val score =
      when(nTok === 0, lit(0.0)).otherwise(
        lit(1.0)
          - abs(avgTokLen - lit(5.0)) / lit(10.0)
          - punctRatio
          + stopRatio * lit(0.5))
    struct(
      nTok.as("n_tokens"), avgTokLen.as("avg_token_len"),
      punctRatio.as("punct_ratio"), stopRatio.as("stopword_ratio"),
      score.as("quality_score"))
  }

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans"),
    "es" -> Seq("el", "los", "las", "y", "es", "una", "que"))

  /** N-gram/marker-word language ID heuristic. CJK characters force
    * "zh"; otherwise the language whose marker-word set hits the most
    * tokens wins (ties broken by the fixed order en>de>fr>es); no hits
    * → "und". Deterministic, SQL-mirrorable.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => array_contains(lit(markers.toArray), t)))
    }
    val best = scores.tail.foldLeft(scores.head._2)((m, s) => greatest(m, s._2))
    // first lang (in declared order) reaching the max wins
    val ordered = scores.foldRight(lit("und"): Column) { case ((lang, sc), els) =>
      when(sc === best && best > 0, lit(lang)).otherwise(els)
    }
    when(text.rlike("[\\x{4e00}-\\x{9fff}]"), lit("zh")).otherwise(ordered)
  }

  /** Content fingerprint: md5 of whitespace/punctuation-normalized
    * lowercase text. Identical fingerprints ≡ near-identical content
    * modulo formatting — the standard first pass of corpus dedup. The
    * 32-hex-char key also makes the dedup shuffle key small and
    * uniformly distributed (no skew) regardless of document size.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")))

  /** Word k-shingles ("w1 w2 w3" strings) — the unit of MinHash /
    * Jaccard near-dup detection.
    */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = tokens(text)
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Convenience: append all text-analysis columns to a documents
    * DataFrame. */
  def profile(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    Partitioning.fanOut(df).withColumn("token_count", tokenCount(t))
      .withColumn("bpeish_token_count", bpeishTokenCount(t))
      .withColumn("lang_id", langId(t))
      .withColumn("fingerprint", fingerprint(t))
      .withColumn("q", qualityStruct(t))
      .select(col("*"), col("q.*")).drop("q")
  }
}
