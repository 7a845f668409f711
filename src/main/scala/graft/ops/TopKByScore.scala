package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-heap top-k aggregate over (score, id) pairs — the scale-safe
  * replacement for `row_number().over(Window.partitionBy(query))`
  * ranking: a window sort funnels EVERY candidate of a query into one
  * reducer's sort (the straggler that dies first when a popular query
  * or a big LSH bucket shows up at 100×); this aggregate keeps O(k)
  * state per group, combines map-side (the combine of two partial
  * top-k's is the top-k of their union), and ships only k rows per
  * group across the shuffle.
  *
  * Ordering: score descending, id ascending on ties — a total order,
  * so the result is deterministic under any partitioning.
  * Generalizes [[BottomKSample]] (ids only) to scored pairs.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, "k must be positive")

  // Strict total order: higher score first, then smaller id. Compares
  // via java.lang.Double.compare — primitive > / == are not a weak
  // order when NaN appears (NaN > x and NaN == NaN are both false, so
  // sortWith can throw "Comparison method violates its general
  // contract"), and cosine scores ARE NaN for zero-norm vectors. NaN
  // ranks strictly last (below -Infinity), so junk vectors never
  // displace real candidates from the top-k.
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean = {
    val aNaN = a._1.isNaN; val bNaN = b._1.isNaN
    if (aNaN != bNaN) bNaN
    else {
      val cmp = java.lang.Double.compare(a._1, b._1)
      if (cmp != 0) cmp > 0 else a._2 < b._2
    }
  }

  override def zero: Seq[(Double, Long)] = Nil

  override def reduce(b: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    if (b.size >= k && !beats(x, b.last)) b // fast path: can't enter the top-k
    else (b :+ x).sortWith(beats).take(k)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sortWith(beats).take(k)

  /** Pairs in rank order (best first). */
  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    Encoders.kryo[Seq[(Double, Long)]]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKByScore {
  /** Column form: array<struct<_1:score,_2:id>> in rank order. */
  def of(score: Column, id: Column, k: Int): Column =
    udaf(new TopKByScore(k)).apply(score, id)
}
