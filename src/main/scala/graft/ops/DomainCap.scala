package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-domain document caps — the domain-diversity control every
  * crawl-curation recipe applies (a handful of boilerplate-heavy
  * hosts otherwise dominate token counts): keep at most `k`
  * documents per registered host, the rest are flagged dropped.
  *
  * Scale shape (the no-Window discipline): a per-host bounded-heap
  * aggregation — `MinKByKey` keeps the k smallest (order_key, id)
  * pairs per host, so map-side partial aggregation bounds state at
  * k per host per partition and a mega-host (the skew case this op
  * exists FOR) costs O(k) memory, not a per-host sort. The kept-id
  * set (≤ k·hosts rows) explodes and joins back by id for the flag.
  * Two shuffles (host, then id), no Window node anywhere.
  *
  * Order modes: `first` keeps the k smallest ids (deterministic
  * priority — "earliest wins", the incremental-friendly choice);
  * `sample` keeps a deterministic uniform k-sample by md5(id) order
  * (the [[BottomKSample]] precedent), unbiased when ids correlate
  * with crawl time.
  */
object DomainCap {

  /** Host of a URL, lowercased: the chars after `scheme://` up to
    * the first `/`, `:`, `?` or `#`. Null when the string has no
    * scheme — schemeless rows are exempt from capping. Java∩RE2
    * pattern so the SQL oracle replays it verbatim. */
  def hostOf(url: Column): Column = {
    val h = lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)", 1))
    when(h === "", lit(null)).otherwise(h)
  }

  /** Bounded min-k by (orderKey, id): the aggregation state never
    * exceeds k pairs, merged pairwise — associative, commutative,
    * and deterministic regardless of partitioning. */
  private class MinKByKey(k: Int) extends Aggregator[(String, Long), Seq[(String, Long)], Seq[Long]] {
    require(k > 0, "cap must be positive")
    override def zero: Seq[(String, Long)] = Nil
    private def trim(b: Seq[(String, Long)]): Seq[(String, Long)] =
      if (b.length <= k) b else b.sorted.take(k)
    override def reduce(b: Seq[(String, Long)], p: (String, Long)): Seq[(String, Long)] =
      trim(b :+ p)
    override def merge(a: Seq[(String, Long)], b: Seq[(String, Long)]): Seq[(String, Long)] =
      trim(a ++ b)
    override def finish(r: Seq[(String, Long)]): Seq[Long] = r.sorted.take(k).map(_._2)
    override def bufferEncoder: Encoder[Seq[(String, Long)]] =
      Encoders.kryo[Seq[(String, Long)]]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** URL blocklist verdict — the UT1-blocklist-style filter every
    * crawl curation applies before any content work: a URL is
    * blocked when its host equals or is a subdomain of any
    * `blockHosts` entry, its path starts with any `blockPaths`
    * prefix, or the whole URL matches any `blockPatterns` regex
    * (Java∩RE2 dialect, the oracle discipline). Pure scan-local
    * boolean column; schemeless rows are never blocked (no host to
    * test; patterns still apply). */
  def urlBlocked(url: Column, blockHosts: Seq[String], blockPaths: Seq[String],
      blockPatterns: Seq[String]): Column = {
    val host = hostOf(url)
    // path = after host, up to ? or # (keeps leading /)
    val path = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/:?#]*(:[0-9]*)?([^?#]*)", 2)
    val hostHit = blockHosts.map(h =>
      host.isNotNull && (host === h.toLowerCase || host.endsWith("." + h.toLowerCase)))
      .foldLeft(lit(false))(_ || _)
    val pathHit = blockPaths.map(p => path.startsWith(p))
      .foldLeft(lit(false))(_ || _)
    val patHit = blockPatterns.map(p => regexp_like(url, lit(p)))
      .foldLeft(lit(false))(_ || _)
    hostHit || pathHit || patHit
  }

  /** (id, host, kept) for every input row: kept = true for at most
    * `k` docs per host (order per `mode`), and for every schemeless
    * row (null host — nothing to group by). */
  def capPerHost(df: DataFrame, urlCol: String, idCol: String, k: Int,
                 mode: String = "first"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val orderKey: Column = mode match {
      case "first"  => lpad(col("__id").cast("string"), 20, "0") // numeric order, string-safe
      case "sample" => md5(col("__id").cast("string"))
      case other => throw new graft.GraftAnalysisException(
        s"domain_cap: unknown mode '$other' (first|sample)")
    }
    val base = df.select(col(idCol).cast("long").as("__id"),
      hostOf(col(urlCol)).as("host"))
    val keptIds = base.where(col("host").isNotNull)
      .select(col("host"), orderKey.as("okey"), col("__id"))
      .groupBy("host")
      // product-typed udaf input flattens to one argument per field
      .agg(udaf(new MinKByKey(k)).apply(col("okey"), col("__id")).as("keptList"))
      .select(explode(col("keptList")).as("__id"))
      .withColumn("kept", lit(true))
    base.join(keptIds, Seq("__id"), "left")
      .select(col("__id").as("id"), col("host"),
        (col("host").isNull || coalesce(col("kept"), lit(false))).as("kept"))
  }
}
