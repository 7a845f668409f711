package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the MinHash pipeline.
  *
  * Why custom expressions: the declarative formulation
  * (`transform`/`array_min` higher-order functions) is interpreted —
  * Spark gives HOF lambdas no codegen and no common-subexpression
  * elimination, so a 64-hash signature costs 64×|shingles| boxed
  * lambda dispatches per document (measured: 14s for 5k docs at
  * sf0.1, and it re-tokenized per hash before staging). These
  * expressions do the same math as one tight JVM kernel call per row
  * inside WholeStageCodegen (`doGenCode` emits a static call), which
  * is the (b)-tier of the custom-operator preference order: Expression
  * before custom physical operator, before mapPartitions.
  *
  * Determinism: tokenization is [a-z0-9]+ runs of lowercased text
  * (identical to [[graft.ops.TextAnalysis.tokens]]); the shingle hash
  * is a fixed 64-bit mix (xxhash-style avalanche) reduced mod p —
  * stable across runs, partitions, and Spark versions (no dependence
  * on internal hash implementations).
  */
object MinHashKernel {
  final val P: Long = 2147483647L // 2^31 - 1

  /** Stable 64-bit string hash (FNV-1a over UTF-8 bytes + xx-style
    * avalanche), reduced to [0, P). */
  def shingleHash(bytes: Array[Byte], start: Int, end: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = start
    while (i < end) { h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    val m = h % P
    if (m < 0) m + P else m
  }

  /** Tokenize (lowercase [a-z0-9]+ runs) and hash every word
    * `k`-shingle in one pass: shingle strings are never materialized —
    * the hash runs over the token bytes with single-space separators,
    * matching `concat_ws(" ", tokens)` byte-for-byte semantics.
    */
  def shingleHashes(text: UTF8String, k: Int): ArrayData = {
    val s = text.toLowerCase.getBytes // UTF-8; ASCII letters/digits are 1 byte
    // token spans
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    while (i < s.length) {
      val c = s(i)
      val isTok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (isTok) {
        val st = i
        while (i < s.length && {
          val cc = s(i); (cc >= 'a' && cc <= 'z') || (cc >= '0' && cc <= '9')
        }) i += 1
        starts.add(st); ends.add(i)
      } else i += 1
    }
    val n = starts.size()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val count = if (n >= k) n - k + 1 else 1
    val kk = math.min(k, n)
    val out = new Array[Long](count)
    val buf = new Array[Byte](s.length + k) // shingle bytes + separators
    var w = 0
    while (w < count) {
      var len = 0
      var j = 0
      while (j < kk) {
        if (j > 0) { buf(len) = ' '; len += 1 }
        var p = starts.get(w + j)
        val e = ends.get(w + j)
        while (p < e) { buf(len) = s(p); len += 1; p += 1 }
        j += 1
      }
      out(w) = shingleHash(buf, 0, len)
      w += 1
    }
    new GenericArrayData(out)
  }

  private val coeffCache = new java.util.concurrent.ConcurrentHashMap[(Int, Long), (Array[Long], Array[Long])]()

  def coeffs(numHashes: Int, seed: Long): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent((numHashes, seed), { _ =>
      val rnd = new scala.util.Random(seed)
      val a = Array.fill(numHashes)(1L + rnd.nextInt(Int.MaxValue - 1).toLong)
      val b = Array.fill(numHashes)(rnd.nextInt(Int.MaxValue).toLong)
      (a, b)
    })

  /** h_i(x) = (a_i·x + b_i) mod P minima over the shingle-hash array:
    * the full signature in one nested loop, no per-element dispatch. */
  def signature(hashes: ArrayData, numHashes: Int, seed: Long): ArrayData = {
    val (as, bs) = coeffs(numHashes, seed)
    val n = hashes.numElements()
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val a = as(i); val b = bs(i)
      var min = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = (a * hashes.getLong(j) + b) % P
        if (v < min) min = v
        j += 1
      }
      out(i) = if (n == 0) 0L else min
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** text → array<long> of hashed word-k-shingles (codegen'd). */
case class TextShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    MinHashKernel.shingleHashes(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.MinHashKernel.shingleHashes($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): TextShingleHashes =
    copy(child = newChild)
  override def prettyName: String = "text_shingle_hashes"
}

/** array<long> shingle hashes → array<long> MinHash signature (codegen'd). */
case class MinHashSignatureExpr(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    MinHashKernel.signature(input.asInstanceOf[ArrayData], numHashes, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.MinHashKernel.signature($c, $numHashes, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpr =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

object MinHashExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Column API: hashed word-k-shingles of a text column. */
  def textShingleHashes(text: Column, k: Int = 3): Column =
    column(TextShingleHashes(expression(text), k))

  /** Column API: MinHash signature from a shingle-hash column. */
  def minhashSignature(shingleHashes: Column, numHashes: Int = 64, seed: Long = 42L): Column =
    column(MinHashSignatureExpr(expression(shingleHashes), numHashes, seed))
}
