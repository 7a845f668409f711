package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed UDAF (the reference has no user-aggregate surface at
  * all — SURVEY §2.4 UDF/UDAF: ABSENT): deterministic per-group
  * sample of k distinct ids, chosen as the bottom-k by md5(id).
  *
  * Why this shape: `rand()`-based sampling is irreproducible and
  * reservoir sampling is order-dependent (nondeterministic under
  * distributed merge). Bottom-k by a content hash is a proper uniform
  * sample that is (a) identical on every run/engine/partitioning,
  * (b) mergeable — the combine of two partial bottom-k's is the
  * bottom-k of their union, so partial aggregation works map-side,
  * and (c) consistent across groups and tables (the same id is
  * sampled everywhere). State per group is O(k).
  */
class BottomKSample(k: Int) extends Aggregator[Long, Seq[(String, Long)], Seq[Long]] {
  require(k > 0, "k must be positive")

  import BottomKSample.md5hex

  override def zero: Seq[(String, Long)] = Nil

  override def reduce(b: Seq[(String, Long)], id: Long): Seq[(String, Long)] = {
    val p = (md5hex(id.toString), id)
    // fast path: buffer full and p sorts after the current k-th —
    // p can neither enter the bottom-k nor already be in the buffer
    // (it would then be ≤ last), so the per-row cost is one compare
    if (b.size >= k && implicitly[Ordering[(String, Long)]].compare(p, b.last) >= 0) b
    else merge(b, Seq(p))
  }

  override def merge(a: Seq[(String, Long)], b: Seq[(String, Long)]): Seq[(String, Long)] =
    (a ++ b).distinct.sortBy(p => (p._1, p._2)).take(k)

  /** ids in hash order — the deterministic "random" order. */
  override def finish(b: Seq[(String, Long)]): Seq[Long] = b.map(_._2)

  override def bufferEncoder: Encoder[Seq[(String, Long)]] =
    Encoders.kryo[Seq[(String, Long)]]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object BottomKSample {
  /** Column form: `df.groupBy(g).agg(BottomKSample.of(col("id"), 5))`. */
  def of(id: Column, k: Int): Column = udaf(new BottomKSample(k)).apply(id)

  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val hex = "0123456789abcdef".toCharArray

  /** Lowercase md5 hex — identical bytes to `map("%02x".format(_))`,
    * without a MessageDigest allocation + 16 format calls per row. */
  def md5hex(s: String): String = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hex(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
