package graft.expr

import java.nio.charset.StandardCharsets
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd hashed-n-gram bucket set: sorted distinct bucket ids of a
  * document's unigram + adjacent-bigram features under the 16-bit
  * md5-prefix hash — the [[graft.ops.LinearClassifier]] feature
  * extractor as ONE kernel call.
  *
  * Why a kernel: the declarative chain (split → filter → sequence →
  * transform(concat_ws) → transform(conv(substring(md5))) →
  * array_distinct → array_sort) runs through five higher-order
  * functions, which Catalyst evaluates INTERPRETED per element — the
  * same trap [[UrlNormalize]] and [[MinHashSignature]] document
  * (measured here: the classifier gate at sf0.1 spent ~10 s in lambda
  * evaluation; the kernel runs it at scan speed). The semantic
  * contract "kernel ≡ declarative chain" is pinned in
  * LinearClassifierSpec over adversarial inputs.
  *
  * Contract (bit-identical with the SQL-replayable declarative form):
  * lowercase (Unicode simple mapping, Spark `lower`), split on
  * `[^a-z0-9]+` keeping no empties, grams = tokens ++ "a b" adjacent
  * pairs, bucket = (first 4 md5 hex chars of the gram's UTF-8 bytes
  * as int) mod nBuckets, result sorted ascending, duplicates removed.
  * NULL text → NULL.
  */
object HashedGramBucketsKernel {
  private val Sep = Pattern.compile("[^a-z0-9]+")
  private val Md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def bucketOf(gram: String, nBuckets: Int): Int = {
    val md = Md.get()
    md.reset()
    val d = md.digest(gram.getBytes(StandardCharsets.UTF_8))
    // first 4 hex chars = first 2 bytes, big-endian
    (((d(0) & 0xFF) << 8) | (d(1) & 0xFF)) % nBuckets
  }

  def buckets(text: UTF8String, nBuckets: Int): ArrayData = {
    val lowered = text.toLowerCase.toString
    val parts = Sep.split(lowered, -1)
    val seen = new Array[Boolean](nBuckets)
    var count = 0
    def add(g: String): Unit = {
      val b = bucketOf(g, nBuckets)
      if (!seen(b)) { seen(b) = true; count += 1 }
    }
    var prev: String = null
    var i = 0
    while (i < parts.length) {
      val t = parts(i)
      if (t.nonEmpty) {
        add(t)
        if (prev != null) add(prev + " " + t)
        prev = t
      }
      i += 1
    }
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

/** string → array<int> sorted distinct hashed-gram buckets (codegen'd). */
case class HashedGramBuckets(child: Expression, nBuckets: Int)
    extends UnaryExpression {
  require(nBuckets >= 2, s"hashed_gram_buckets: nBuckets=$nBuckets")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashedGramBucketsKernel.buckets(input.asInstanceOf[UTF8String], nBuckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.HashedGramBucketsKernel.buckets($c, $nBuckets)")
  override protected def withNewChildInternal(newChild: Expression): HashedGramBuckets =
    copy(child = newChild)
  override def prettyName: String = "hashed_gram_buckets"
}

object HashedGramBucketsCol {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def apply(text: Column, nBuckets: Int): Column =
    column(HashedGramBuckets(expression(text), nBuckets))
}
