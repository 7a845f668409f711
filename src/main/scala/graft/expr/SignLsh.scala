package graft.expr

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd sign-LSH bucket id (one bit per hyperplane).
  *
  * The declarative form unrolls to `planes × dim` expression terms
  * (512 at 8 planes × 64 dims): numerically fine, but WholeStageCodegen
  * compiles a multi-thousand-line method per stage that uses it —
  * measured ~7.5 s of one-time janino/JIT cost across the LSH queries.
  * This expression emits one static kernel call; the plane matrix is
  * computed once per (dim, planes, seed) and cached.
  *
  * Bit-exact contract with the declarative chain (and therefore with
  * the DuckDB oracle's `lshBucketSql`): plane component (i, j) =
  * `pmod(conv(substring(md5('plane_{seed}_{i}_{j}'), 1, 8), 16, 10),
  * 1e6) / 1e6 - 0.5` — replicated here as first-4-md5-bytes big-endian
  * mod 1e6; the projection accumulates in element order j = 0..dim-1
  * like the `reduce(_ + _)` it replaces.
  *
  * One declared difference: a NULL vector yields a NULL bucket (row
  * drops out of the bucket join) instead of the all-zero-bits bucket
  * the `when(null >= 0, …).otherwise(0)` chain produced — LSH on a
  * missing embedding is noise either way.
  */
object SignLshKernel {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Long), Array[Array[Double]]]()

  /** First 8 md5 hex chars as unsigned int, mod 1e6, scaled to [-0.5, 0.5). */
  def component(i: Int, j: Int, seed: Long): Double = {
    val md = MessageDigest.getInstance("MD5")
      .digest(s"plane_${seed}_${i}_$j".getBytes(StandardCharsets.UTF_8))
    val v = ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
      ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
    (v % 1000000L).toDouble / 1000000.0 - 0.5
  }

  def planeMatrix(dim: Int, planes: Int, seed: Long): Array[Array[Double]] =
    cache.computeIfAbsent((dim, planes, seed),
      _ => Array.tabulate(planes, dim)((i, j) => component(i, j, seed)))

  def bucket(vec: ArrayData, dim: Int, planes: Int, seed: Long): Long = {
    val m = planeMatrix(dim, planes, seed)
    val n = math.min(dim, vec.numElements())
    var bits = 0L
    var i = 0
    while (i < planes) {
      val row = m(i)
      var acc = 0.0
      var j = 0
      while (j < n) { acc += vec.getDouble(j) * row(j); j += 1 }
      if (acc >= 0) bits |= (1L << i)
      i += 1
    }
    bits
  }
}

/** array<double> → long sign-LSH bucket (codegen'd). */
case class SignLshBucket(child: Expression, dim: Int, planes: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    SignLshKernel.bucket(input.asInstanceOf[ArrayData], dim, planes, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SignLshKernel.bucket($c, $dim, $planes, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): SignLshBucket =
    copy(child = newChild)
  override def prettyName: String = "sign_lsh_bucket"
}

object SignLsh {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def apply(vec: Column, dim: Int, planes: Int, seed: Long = 42L): Column =
    column(SignLshBucket(expression(vec), dim, planes, seed))
}
