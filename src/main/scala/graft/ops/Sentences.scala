package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rule-based sentence segmentation — the unit every sentence-level
  * corpus op keys on (sentence dedup, per-sentence perplexity
  * filters, sentence-boundary RAG chunking, parallel-corpus
  * alignment). Deterministic rules, not a model — the same contract
  * everywhere in this repo: an external oracle can state the
  * expected output, and the same text segments identically on any
  * engine, any run.
  *
  * Rules (the classic Punkt-lite heuristics):
  *  - a sentence ends at `.`, `!` or `?` (a run of them — "?!"),
  *    optionally followed by closing quotes/brackets, then
  *    whitespace, then a plausible sentence START (uppercase letter,
  *    digit, or opening quote/bracket);
  *  - a period does NOT end a sentence after a known abbreviation
  *    (Mr/Mrs/Ms/Dr/Prof/Sr/Jr/St/vs/etc/e.g/i.e/Fig/No/Vol/pp/Inc/
  *    Ltd/Co/Corp, case-sensitive as customary), after a single
  *    uppercase initial ("J. Smith"), or inside a decimal number
  *    ("3.5 points");
  *  - newlines are hard boundaries (paragraph breaks end sentences
  *    regardless of punctuation);
  *  - text with no terminator is one sentence; whitespace-only
  *    yields none.
  *
  * Scale shape: a scan-local per-document kernel (one linear pass,
  * no lookahead beyond one token), long-format output.
  */
object Sentences {

  private val Abbrevs = Set(
    "Mr", "Mrs", "Ms", "Dr", "Prof", "Sr", "Jr", "St", "vs", "etc",
    "e.g", "i.e", "Fig", "No", "Vol", "pp", "Inc", "Ltd", "Co", "Corp")

  private def isCloser(c: Char): Boolean =
    c == '"' || c == '\'' || c == ')' || c == ']' || c == '”' || c == '’'

  private def isOpener(c: Char): Boolean =
    c == '"' || c == '\'' || c == '(' || c == '[' || c == '“' || c == '‘'

  private def isStarter(c: Char): Boolean =
    Character.isUpperCase(c) || Character.isDigit(c) || isOpener(c)

  /** The token (letters/dots) immediately before position `i`
    * (exclusive) — what a candidate period attaches to. */
  private def tokenBefore(s: String, i: Int): String = {
    var start = i
    while (start > 0 && (Character.isLetter(s.charAt(start - 1)) || s.charAt(start - 1) == '.'))
      start -= 1
    s.substring(start, i)
  }

  /** Pure per-document kernel, exposed for the spec. */
  private[graft] def sentencesOf(text: String): Vector[String] = {
    if (text == null) return Vector.empty
    val out = Vector.newBuilder[String]
    val n = text.length
    var segStart = 0
    def emit(end: Int): Unit = {
      val s = text.substring(segStart, end).trim
      if (s.nonEmpty) out += s
      segStart = end
    }
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (c == '\n') { emit(i); i += 1; segStart = i }
      else if (c == '.' || c == '!' || c == '?') {
        // run of terminators + closers
        var j = i
        while (j < n && (text.charAt(j) == '.' || text.charAt(j) == '!' ||
          text.charAt(j) == '?')) j += 1
        val runHadBang = text.substring(i, j).exists(ch => ch == '!' || ch == '?')
        var k = j
        while (k < n && isCloser(text.charAt(k))) k += 1
        // whitespace then a plausible starter?
        var w = k
        while (w < n && (text.charAt(w) == ' ' || text.charAt(w) == '\t')) w += 1
        val boundaryShape = w > k && w < n && isStarter(text.charAt(w))
        val suppressed = !runHadBang && {
          val tok = tokenBefore(text, i)
          // known abbreviation, single initial, or decimal digit.dot
          Abbrevs.contains(tok) || Abbrevs.contains(tok.stripSuffix(".")) ||
            (tok.length == 1 && Character.isUpperCase(tok.charAt(0))) ||
            (i > 0 && Character.isDigit(text.charAt(i - 1)) &&
              j < n && Character.isDigit(text.charAt(j)))
        }
        if (boundaryShape && !suppressed) { emit(k); i = w; segStart = i }
        else i = j
      } else i += 1
    }
    emit(n)
    out.result()
  }

  /** Long-format rows: (id, seq, sentence, n_chars). */
  def split(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        sentencesOf(text).zipWithIndex.map { case (s, i) => (id, i, s, s.length) }
      })
      .toDF("id", "seq", "sentence", "n_chars")
  }

  /** Sentence-boundary RAG chunking: consecutive sentences pack into
    * chunks bounded by `maxChars` (joined by one space), with the
    * last `overlap` sentences of each chunk repeated at the start of
    * the next (the standard RAG recall lever). Boundaries never
    * split a sentence, so a chunk exceeds `maxChars` only when a
    * single sentence (or the overlap carry plus one sentence)
    * already does. Output: (id, chunk, text, n_sentences). */
  def chunkBySentence(df: DataFrame, idCol: String, textCol: String,
      maxChars: Int, overlap: Int = 0): DataFrame = {
    require(maxChars > 0 && overlap >= 0, "chunkBySentence: bad config")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val sents = sentencesOf(text)
        val chunks = Vector.newBuilder[(Vector[String], Int)]
        var cur = Vector.empty[String]
        var curLen = 0
        var fresh = 0 // sentences in cur NOT carried over as overlap
        def flush(): Unit = if (fresh > 0) {
          chunks += ((cur, fresh))
          val keep = cur.takeRight(math.min(overlap, cur.length))
          cur = keep
          curLen = if (keep.isEmpty) 0 else keep.map(_.length).sum + keep.length - 1
          fresh = 0
        }
        sents.foreach { s =>
          val add = if (cur.isEmpty) s.length else curLen + 1 + s.length
          if (cur.nonEmpty && add > maxChars && fresh > 0) flush()
          cur :+= s
          curLen = if (cur.length == 1) s.length else curLen + 1 + s.length
          fresh += 1
        }
        flush()
        chunks.result().zipWithIndex.map { case ((ss, _), ci) =>
          (id, ci, ss.mkString(" "), ss.length)
        }
      })
      .toDF("id", "chunk", "text", "n_sentences")
  }
}
