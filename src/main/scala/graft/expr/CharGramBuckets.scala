package graft.expr

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd hashed CHARACTER-n-gram bucket set — the language-ID
  * feature extractor beside [[HashedGramBuckets]]'s word grams.
  *
  * Word tokenization (`[^a-z0-9]+` split) erases every non-Latin
  * script: a Russian or Chinese document tokenizes to NOTHING, so the
  * word-gram classifier cannot even see the classes a language
  * identifier must separate. Character n-grams are the standard
  * langid feature (Cavnar & Trenkle 1994 "N-Gram-Based Text
  * Categorization"; langid.py, CLD) and work uniformly across
  * scripts.
  *
  * Contract: lowercase (Unicode simple mapping), whitespace runs
  * (space/tab/CR/LF) collapse to one space and the ends trim, then
  * every codepoint-level n-gram for n ∈ {1,2,3} hashes through the
  * 16-bit md5-prefix bucket hash (identical formula to
  * [[HashedGramBucketsKernel]]: first 2 digest bytes big-endian, mod
  * nBuckets). On top of the n-grams, one pseudo-gram per Unicode
  * SCRIPT present among the text's letters — `" script:latin"`
  * etc. for Latin/Cyrillic/Han/Arabic (the
  * [[graft.ops.TextAnalysis.scriptProfile]] four) — is hashed into
  * the same space, giving the model a writing-system feature that
  * fires on one letter of evidence. Result sorted ascending,
  * duplicates removed, NULL text → NULL.
  *
  * Scale shape: pure scan-local projection inside whole-stage
  * codegen; O(len) per document, nothing shuffles.
  */
object CharGramBucketsKernel {
  private val Md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def bucketOf(gram: String, nBuckets: Int): Int = {
    val md = Md.get()
    md.reset()
    val d = md.digest(gram.getBytes(StandardCharsets.UTF_8))
    (((d(0) & 0xFF) << 8) | (d(1) & 0xFF)) % nBuckets
  }

  /** Lowercased text with whitespace runs collapsed and ends trimmed
    * (the normalization the n-grams see). */
  private[graft] def normalize(text: String): String = {
    val lowered = text.toLowerCase
    val sb = new java.lang.StringBuilder(lowered.length)
    var pendingSpace = false
    var i = 0
    while (i < lowered.length) {
      val c = lowered.charAt(i)
      if (c == ' ' || c == '\t' || c == '\r' || c == '\n') pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  def buckets(text: UTF8String, nBuckets: Int): ArrayData = {
    val s = normalize(text.toString)
    val cps = s.codePoints().toArray
    val seen = new Array[Boolean](nBuckets)
    var count = 0
    def add(g: String): Unit = {
      val b = bucketOf(g, nBuckets)
      if (!seen(b)) { seen(b) = true; count += 1 }
    }
    var latin = false; var cyr = false; var han = false; var arab = false
    var i = 0
    while (i < cps.length) {
      var n = 1
      while (n <= 3 && i + n <= cps.length) {
        add(new String(cps, i, n))
        n += 1
      }
      if (Character.isLetter(cps(i))) {
        Character.UnicodeScript.of(cps(i)) match {
          case Character.UnicodeScript.LATIN    => latin = true
          case Character.UnicodeScript.CYRILLIC => cyr = true
          case Character.UnicodeScript.HAN      => han = true
          case Character.UnicodeScript.ARABIC   => arab = true
          case _ =>
        }
      }
      i += 1
    }
    if (latin) add(" script:latin")
    if (cyr) add(" script:cyrillic")
    if (han) add(" script:han")
    if (arab) add(" script:arabic")
    val out = new Array[Int](count)
    var b = 0
    var k = 0
    while (b < nBuckets) {
      if (seen(b)) { out(k) = b; k += 1 }
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** string → array<int> sorted distinct hashed char-n-gram buckets
  * (codegen'd; see [[CharGramBucketsKernel]]).
  */
case class CharGramBuckets(child: Expression, nBuckets: Int)
    extends UnaryExpression {
  require(nBuckets >= 2, s"char_gram_buckets: nBuckets=$nBuckets")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    CharGramBucketsKernel.buckets(input.asInstanceOf[UTF8String], nBuckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.CharGramBucketsKernel.buckets($c, $nBuckets)")
  override protected def withNewChildInternal(newChild: Expression): CharGramBuckets =
    copy(child = newChild)
  override def prettyName: String = "char_gram_buckets"
}

object CharGramBucketsCol {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def apply(text: Column, nBuckets: Int): Column =
    column(CharGramBuckets(expression(text), nBuckets))
}
