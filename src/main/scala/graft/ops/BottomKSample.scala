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

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  override def zero: Seq[(String, Long)] = Nil

  override def reduce(b: Seq[(String, Long)], id: Long): Seq[(String, Long)] =
    merge(b, Seq((md5hex(id.toString), id)))

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
}
