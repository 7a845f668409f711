package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.GraftAnalysisException

/** Deterministic Count-Min sketch + CMS-prefiltered exact heavy
  * hitters — the frequency sibling of [[Bloom]]'s membership
  * primitive, and the corpus-analysis question a 100 TB estate asks
  * constantly: "which hosts / tokens / shingles dominate?" without
  * paying a full groupBy over billions of distinct keys.
  *
  * Count-Min (Cormode & Muthukrishnan 2005, public paper): a d×w
  * grid of counters; each occurrence of a key increments one cell
  * per row at its hashed column; the estimate is the MIN over the
  * key's d cells. Estimates NEVER undercount (every cell holds the
  * true count plus non-negative collision mass), overcount by at
  * most εN with probability 1-δ at w = e/ε, d = ln(1/δ).
  *
  * Determinism is total, the [[Bloom]] discipline: column positions
  * are md5-derived Kirsch-Mitzenmacher double hashes — h1/h2 = the
  * first/next 8 md5 hex digits, position_i = (h1 + i·h2) mod w — and
  * cell values are pure sums, so the sketch is independent of row
  * order AND partitioning, and an external SQL engine can rebuild
  * the identical grid and replay every estimate.
  *
  * Scale shape: [[build]] is one distributed aggregation with fixed
  * d·w·8-byte state (map-side partials sum elementwise —
  * associative, commutative); no key shuffle, no driver set.
  * [[heavyHitters]] then answers the exact-top question with NO
  * full-key shuffle: the sketch rides the scan as a literal, rows
  * whose key estimate is under the threshold are dropped AT THE SCAN
  * (CMS never undercounts, so no true heavy hitter is lost), and the
  * exact groupBy shuffles only the surviving candidate rows — on a
  * zipfian corpus, a tiny fraction of the input.
  */
object CountMin {

  /** md5-derived column positions, the SQL-replayable contract:
    * `(h1 + i*h2) mod w` for i in 0 until d. */
  def positions(key: String, w: Int, d: Int): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = md.digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val h1 = ((dig(0) & 0xFFL) << 24) | ((dig(1) & 0xFFL) << 16) | ((dig(2) & 0xFFL) << 8) | (dig(3) & 0xFFL)
    val h2 = ((dig(4) & 0xFFL) << 24) | ((dig(5) & 0xFFL) << 16) | ((dig(6) & 0xFFL) << 8) | (dig(7) & 0xFFL)
    Array.tabulate(d)(i => ((h1 + i.toLong * h2) % w).toInt)
  }

  /** Point estimate from a built sketch: min over the key's d cells.
    * Never less than the key's true total weight. */
  def estimate(sketch: Array[Long], d: Int, w: Int, key: String): Long = {
    val ps = positions(key, w, d)
    var best = Long.MaxValue
    var i = 0
    while (i < d) { best = math.min(best, sketch(i * w + ps(i))); i += 1 }
    best
  }

  private class BuildAgg(d: Int, w: Int)
      extends Aggregator[(String, Long), Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](d * w)
    override def reduce(b: Array[Long], kv: (String, Long)): Array[Long] = {
      val (key, weight) = kv
      if (key != null && weight > 0) {
        val ps = positions(key, w, d)
        var i = 0
        while (i < d) { b(i * w + ps(i)) += weight; i += 1 }
      }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    private val enc: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def bufferEncoder: Encoder[Array[Long]] = enc
    override def outputEncoder: Encoder[Array[Long]] = enc
  }

  /** Build the d×w sketch over a key column (each row weight 1, or
    * `weightCol`): one distributed aggregation, fixed-size state. */
  def build(df: DataFrame, keyCol: String, d: Int, w: Int,
      weightCol: Option[String] = None): Array[Long] = {
    require(d >= 1 && d <= 16, s"count-min: d=$d out of range 1..16")
    require(w >= 2 && w <= (1 << 22), s"count-min: w=$w out of range")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(col(keyCol).cast("string").as("__k"),
      weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L)).as("__w"))
      .as[(String, Long)]
    keyed.select(udaf(new BuildAgg(d, w)).apply(col("__k"), col("__w")).as("s"))
      .head().getAs[scala.collection.Seq[Long]](0).toArray
  }

  /** Estimate column over a built sketch: the same md5 arithmetic as
    * [[positions]], spelled in codegen'd built-ins (conv/substring/
    * md5) so the plan stays in whole-stage codegen and an external
    * engine can mirror it verbatim; the sketch rides as one array
    * literal. */
  def estimateCol(sketch: Array[Long], d: Int, w: Int, key: Column): Column = {
    val s = typedLit(sketch.toSeq)
    val h1 = conv(substring(md5(key), 1, 8), 16, 10).cast("long")
    val h2 = conv(substring(md5(key), 9, 8), 16, 10).cast("long")
    val cells = (0 until d).map { i =>
      element_at(s, (lit(i * w) + pmod(h1 + lit(i.toLong) * h2, lit(w.toLong))).cast("int") + 1)
    }
    least(cells: _*)
  }

  /** Exact heavy hitters with a CMS scan prefilter: every key whose
    * TRUE total weight ≥ `threshold`, with its exact count and the
    * sketch estimate (est ≥ cnt always). The exact aggregation
    * shuffles only rows whose estimate passes the threshold — the
    * sketch's no-undercount guarantee makes the prefilter lossless.
    */
  def heavyHitters(df: DataFrame, keyCol: String, threshold: Long,
      d: Int = 4, w: Int = 4096, weightCol: Option[String] = None): DataFrame = {
    require(threshold >= 1, s"heavy_hitters: threshold=$threshold must be >= 1")
    val sketch = build(df, keyCol, d, w, weightCol)
    val weight = weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    df.select(col(keyCol).cast("string").as("key"), weight.as("__w"))
      .where(estimateCol(sketch, d, w, col("key")) >= threshold)
      .groupBy(col("key"))
      .agg(sum(col("__w")).as("cnt"))
      .where(col("cnt") >= threshold)
      .select(col("key"), col("cnt"),
        estimateCol(sketch, d, w, col("key")).as("est"))
  }

  /** Spec-op surface (`heavy_hitters`): key_field, threshold,
    * optional d/w/weight_field. */
  def heavyHittersOp(df: DataFrame, cfg: graft.spec.Config): DataFrame = {
    val keyF = cfg.reqStr("key_field")
    val threshold = cfg.long("threshold").getOrElse(
      throw new GraftAnalysisException("heavy_hitters: 'threshold' is required"))
    heavyHitters(df, keyF, threshold,
      d = cfg.int("depth").getOrElse(4),
      w = cfg.int("width").getOrElse(4096),
      weightCol = cfg.str("weight_field"))
  }
}
