package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Deterministic Bloom filter — the cross-batch membership primitive
  * URL-level dedup runs on at corpus scale: "have we crawled this
  * URL in ANY earlier batch?" answered per row at scan speed against
  * a kilobytes-to-gigabytes bit array, instead of a join against
  * billions of crawled keys. No false negatives ever; false
  * positives at the configured rate (they only over-drop, never
  * leak a duplicate).
  *
  * Everything is deterministic and externally replayable (the
  * engine-wide oracle discipline): the k probe positions of a key
  * are md5-derived — h1 = first 8 md5 hex digits, h2 = next 8, and
  * position_i = (h1 + i·h2) mod m (Kirsch-Mitzenmacher double
  * hashing) — so an external SQL engine can rebuild the IDENTICAL
  * filter with a bitstring aggregate and reproduce every probe
  * verdict including the false positives.
  *
  * Scale shape: [[build]] is one distributed aggregation whose
  * state is the fixed m/8-byte bit array per partition (map-side
  * partials OR together — associative, commutative); no shuffle of
  * keys, no driver set. [[mightContain]] is a codegen'd expression
  * over the filter bytes — for filters small enough to ride the
  * plan as a literal (≤ a few MiB). m must be a power of two.
  */
object Bloom {

  /** md5-derived probe positions, the SQL-replayable contract:
    * `(h1 + i*h2) mod m` for i in 0 until k. */
  def positions(key: String, mBits: Int, k: Int): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first / next 8 hex digits == big-endian bytes 0-3 / 4-7
    val h1 = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) | ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
    val h2 = ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) | ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
    Array.tabulate(k)(i => ((h1 + i.toLong * h2) % mBits).toInt)
  }

  def hit(filter: Array[Byte], k: Int, key: String): Boolean = {
    val m = filter.length * 8
    val ps = positions(key, m, k)
    var i = 0
    while (i < k) {
      val p = ps(i)
      if (((filter(p >>> 3) >> (p & 7)) & 1) == 0) return false
      i += 1
    }
    true
  }

  private class BuildAgg(mBits: Int, k: Int) extends Aggregator[String, Array[Byte], Array[Byte]] {
    require(mBits > 0 && (mBits & (mBits - 1)) == 0, "mBits must be a power of two")
    require(mBits % 8 == 0, "mBits must be byte-aligned")
    override def zero: Array[Byte] = new Array[Byte](mBits / 8)
    override def reduce(b: Array[Byte], key: String): Array[Byte] = {
      if (key != null) {
        val ps = positions(key, mBits, k)
        var i = 0
        while (i < k) { val p = ps(i); b(p >>> 3) = (b(p >>> 3) | (1 << (p & 7))).toByte; i += 1 }
      }
      b
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
      a
    }
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Build the filter over a key column: one distributed aggregation,
    * fixed-size state. Returns the m/8-byte bit array. */
  def build(df: DataFrame, keyCol: String, mBits: Int, k: Int): Array[Byte] =
    df.select(udaf(new BuildAgg(mBits, k)).apply(col(keyCol).cast("string")).as("f"))
      .head().getAs[Array[Byte]](0)

  /** Membership probe column (codegen'd): true iff every probe bit
    * of the key is set. The filter rides the plan as a binary
    * literal. */
  def mightContain(filter: Array[Byte], k: Int, key: Column): Column =
    graft.expr.BloomMightContain(filter, k, key)

  /** Sizing helper: smallest power-of-two m with expected false-
    * positive rate ≤ `fpp` for `n` keys with `k` hashes:
    * fpp ≈ (1 - e^(-kn/m))^k. */
  def sizeFor(n: Long, k: Int, fpp: Double): Int = {
    var m = 1 << 10
    def rate(m: Double): Double = math.pow(1 - math.exp(-k.toDouble * n / m), k)
    while (m < (1 << 30) && rate(m) > fpp) m <<= 1
    m
  }

  /** Bloom-pruned join — the "runtime filter" pattern made explicit
    * for the 100 TB probe side: build the filter over the SMALL
    * side's join keys (one fixed-state aggregation), then prune the
    * big side AT ITS SCAN with the codegen'd probe before any
    * exchange, so rows that cannot possibly match never enter the
    * shuffle. At corpus scale this is the difference between
    * shuffling 100 TB of documents and shuffling the ~fpp sliver
    * that survives the filter. Correctness is unconditional: Bloom
    * has no false negatives, so the prune is lossless, and the
    * exact join that follows removes the false positives — the
    * result is row-for-row the plain join's.
    *
    * Restricted to the join types pruning is lossless for: `inner`
    * and `left_semi` (anything outer would need the pruned rows
    * back). Null keys never match an equi-join, and the probe maps
    * them to null → dropped, which agrees. `rightKeys` lets callers
    * skip the sizing `count()` job when the small side's cardinality
    * is already known.
    */
  def prunedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String,
                 joinType: String = "inner", k: Int = 5, fpp: Double = 0.01,
                 rightKeys: Option[Long] = None): DataFrame = {
    val jt = joinType.toLowerCase.replace("_", "")
    require(jt == "inner" || jt == "leftsemi" || jt == "semi",
      s"bloom-pruned join supports inner/left_semi (pruning is lossless); got '$joinType'")
    val n = rightKeys.getOrElse(right.count())
    val m = sizeFor(math.max(1L, n), k, fpp)
    val f = build(right, rightKey, m, k)
    val pruned = left.filter(mightContain(f, k, col(leftKey).cast("string")))
    val jtNorm = if (jt == "inner") "inner" else "left_semi"
    pruned.join(right, pruned(leftKey) === right(rightKey), jtNorm)
  }
}
