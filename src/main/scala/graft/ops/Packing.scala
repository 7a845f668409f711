package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing — the final assembly step of an LLM training-data
  * pipeline: concatenate documents into fixed-capacity context windows
  * so padding doesn't waste compute (public technique: "sample
  * packing" / "sequence packing", e.g. T5 and every open training
  * stack since).
  *
  * Semantics (deterministic, cross-engine replayable): within each
  * `groupCol` value, documents are taken in `idCol` order and folded
  * greedily — a running token sum starts a new bin whenever adding the
  * next document would exceed `capacity`; an oversized document gets a
  * bin of its own. Output is the per-document assignment
  * (group, id, n_tokens, bin) with bins numbered from 0 per group.
  *
  * Scale shape: the fold is sequential BY DEFINITION (each bin
  * boundary depends on every prior document in the group), so the
  * packing domain is the GROUP, and groups are the parallelism unit —
  * exactly how production packing runs (per shard/source/language
  * bucket). `flatMapGroups` streams one group per task; the group's
  * rows are materialized to sort by id (bounded by the declared
  * contract: a group is a shard, not the corpus). No driver
  * involvement, output ∝ input rows.
  */
object Packing {

  def packGreedy(df: DataFrame, idCol: String, groupCol: String,
      textCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, s"packGreedy: capacity must be positive, got $capacity")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string").as("g"), col(idCol).cast("long").as("id"),
        TextAnalysis.tokenCount(col(textCol)).as("t"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val docs = it.map { case (_, id, t) => (id, t) }.toArray
        java.util.Arrays.sort(docs, Ordering.by((p: (Long, Long)) => p._1))
        var acc = 0L
        var bin = -1L
        docs.iterator.map { case (id, t) =>
          if (bin < 0 || acc + t > capacity) { bin += 1; acc = t }
          else acc += t
          (g, id, t, bin)
        }
      }
      .toDF(groupCol, idCol, "n_tokens", "bin")
  }

  /** Best-fit-decreasing — the common production packer: documents are
    * taken LONGEST FIRST (ties by id, so the order is total and
    * replayable) and each goes into the open bin with the LEAST
    * remaining capacity that still fits it (ties → lowest bin index);
    * no fit opens a new bin. Big items place first while bins are
    * empty, small items backfill the gaps — classically within
    * 11/9·OPT + 1 bins versus first-fit-in-arrival-order's looser
    * bound, and measurably fewer bins on real corpora (fill-rate
    * numbers in BASELINE.md).
    *
    * Same scale shape and output contract as [[packGreedy]]: the fold
    * is sequential by definition, the group is the parallelism unit,
    * bins are numbered from 0 per group in creation order. The open-
    * bin table an item scans is bounded by the group's bin count —
    * the documented shard-sized-group contract (and an oversized
    * document's bin has negative remainder, so nothing else ever
    * lands in it).
    */
  def packBestFitDecreasing(df: DataFrame, idCol: String, groupCol: String,
      textCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, s"packBestFitDecreasing: capacity must be positive, got $capacity")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string").as("g"), col(idCol).cast("long").as("id"),
        TextAnalysis.tokenCount(col(textCol)).as("t"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val docs = it.map { case (_, id, t) => (id, t) }.toArray
        // length-descending, id-ascending: a deterministic total order
        java.util.Arrays.sort(docs, Ordering.by((p: (Long, Long)) => (-p._2, p._1)))
        val rems = scala.collection.mutable.ArrayBuffer.empty[Long]
        docs.iterator.map { case (id, t) =>
          var best = -1
          var bestRem = Long.MaxValue
          var i = 0
          while (i < rems.length) {
            val r = rems(i)
            // strict < : the FIRST bin among equal remainders wins
            if (r >= t && r < bestRem) { bestRem = r; best = i }
            i += 1
          }
          val bin = if (best >= 0) { rems(best) -= t; best }
                    else { rems += (capacity - t); rems.length - 1 }
          (g, id, t, bin.toLong)
        }
      }
      .toDF(groupCol, idCol, "n_tokens", "bin")
  }

  /** Per-document sliding-window chunking — the RAG/embedding-index
    * preparation move (windows of `size` tokens advancing by `stride`;
    * stride < size gives overlap so no phrase straddles a boundary
    * unseen). Purely scan-local: window starts come from a
    * `transform(sequence(...))` over the materialized token array and
    * explode into (id, chunk_id, n_tokens, chunk) rows — no shuffle at
    * all, this runs at scan speed and fans out ≈ n/stride rows per
    * doc. Documents with zero tokens emit nothing. Contrast with
    * [[chunkWindows]]: that op concatenates ACROSS documents for
    * training; this one windows WITHIN each document for retrieval.
    */
  def slidingChunks(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0,
      s"slidingChunks: size and stride must be positive, got size=$chunkSize stride=$stride")
    val toked = Partitioning.fanOut(df)
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
    val n = size(col("__toks"))
    val nWin = ceil(n.cast("double") / stride).cast("int")
    // guard n == 0: sequence(0, -1) would generate a DESCENDING range
    val wins = when(n > 0,
      transform(sequence(lit(0), nWin - 1),
        i => slice(col("__toks"), i * stride + 1, lit(chunkSize))))
      .otherwise(array().cast("array<array<string>>"))
    toked
      .select(col(idCol), posexplode(wins).as(Seq("chunk_id", "__w")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        size(col("__w")).cast("long").as("n_tokens"),
        concat_ws(" ", col("__w")).as("chunk"))
  }

  /** Concat-and-chunk into fixed context windows — the GPT-style
    * alternative to bin packing: within each group, concatenate
    * documents in id order with an end-of-document marker between
    * them, then cut the token stream into consecutive windows of
    * exactly `windowSize` tokens (the trailing partial window is
    * emitted with its true `n_tokens`). Documents cross window
    * boundaries by design — that is the point of this layout.
    *
    * Output: (group, window_id, n_tokens, text) with windows numbered
    * from 0 per group, text being the window's tokens (marker
    * included) rejoined with single spaces. The group column comes
    * back as STRING (the typed flatMapGroups key — same contract as
    * [[packGreedy]]); cast downstream if the original type matters.
    *
    * Scale shape: same as [[packGreedy]] — the fold is sequential by
    * definition, so the GROUP is the parallelism unit (a shard/
    * training file, bounded by contract; compose with
    * [[shuffleShards]] upstream for a reproducible random order).
    * `flatMapGroups` streams one group per task; unlike the packers
    * this op carries token payloads, so a group must fit in a task's
    * memory — the same bound its output file must satisfy anyway.
    */
  def chunkWindows(df: DataFrame, idCol: String, groupCol: String, textCol: String,
      windowSize: Int, eod: String = "<|eod|>"): DataFrame = {
    require(windowSize > 0, s"chunkWindows: windowSize must be positive, got $windowSize")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string").as("g"), col(idCol).cast("long").as("id"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .as[(String, Long, Seq[String])]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val docs = it.map { case (_, id, t) => (id, t) }.toArray
        java.util.Arrays.sort(docs, Ordering.by((p: (Long, Seq[String])) => p._1))
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, String)]
        val buf = new scala.collection.mutable.ArrayBuffer[String](windowSize)
        var win = 0L
        def flush(): Unit = if (buf.nonEmpty) {
          out += ((g, win, buf.length.toLong, buf.mkString(" ")))
          win += 1; buf.clear()
        }
        for ((_, toks) <- docs; tok <- toks.iterator ++ Iterator.single(eod)) {
          buf += tok
          if (buf.length == windowSize) flush()
        }
        flush()
        out.iterator
      }
      .toDF(groupCol, "window_id", "n_tokens", "text")
  }

  /** Temperature-based domain rebalancing — the multilingual-corpus
    * move (XLM-R and successors): resample classes so kept counts
    * follow n_c^alpha instead of n_c, boosting small domains/languages
    * without exploding large ones. Keep rate per class
    * q_c = (n_min / n_c)^(1 - alpha): the smallest class keeps
    * everything, alpha = 1 keeps everything everywhere, alpha = 0
    * equalizes expected counts.
    *
    * Deterministic and cross-engine-replayable: a row is kept iff the
    * 48-bit md5(seed:key) prefix < floor(q_c * 2^48). For
    * alpha = 0.5 (the common choice, and the gate's contract) q_c is
    * sqrt(n_min/n_c) — IEEE requires correctly-rounded sqrt and
    * division, so thresholds are bit-identical on any engine; other
    * alphas go through pow, which carries no such guarantee (last-ulp
    * differences can flip a row near a threshold — fine for
    * production sampling, not for a hash-exact oracle).
    *
    * Scale shape: one hash-agg builds the per-class count table
    * (bounded by the number of classes), the rate table broadcasts,
    * and the keep decision is scan-local. Rows with NULL class are
    * dropped (no rate to join).
    */
  def temperatureSample(df: DataFrame, keyCol: String, classCol: String,
      alpha: Double = 0.5, seed: Long = 0L): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"temperatureSample: alpha must be in [0,1], got $alpha")
    val cnt = df.groupBy(col(classCol)).agg(count(lit(1)).as("__n"))
    val nmin = cnt.agg(min(col("__n")).as("__nmin"))
    val ratio = col("__nmin").cast("double") / col("__n").cast("double")
    val q = if (alpha == 0.5) sqrt(ratio) else pow(ratio, lit(1 - alpha))
    val thr = cnt.crossJoin(broadcast(nmin))
      .select(col(classCol), floor(q * lit(281474976710656.0)).cast("long").as("__thr"))
    val u = conv(substring(
      md5(concat(lit(seed.toString), lit(":"), col(keyCol).cast("string"))), 1, 12),
      16, 10).cast("long")
    df.join(broadcast(thr), Seq(classCol))
      .filter(u < col("__thr"))
      .select(df.columns.map(col).toSeq: _*)
  }

  /** Deterministic global training-order shuffle into shards — the
    * step between curation and packing: training wants documents in a
    * random-looking order that is nevertheless REPRODUCIBLE (same
    * epoch on any engine, any layout, any re-run; public practice in
    * every open training stack's data loader).
    *
    * Mechanism, chosen to replay exactly in plain SQL on any engine:
    * h = md5(seed ":" key); shard = (first 16 bits of h) mod nShards;
    * pos = rank of h (ties by key) within the shard. md5-of-key is the
    * same cross-engine order [[graft.transforms.TokenBudgetOp]] and
    * [[BottomKSample]] already rely on — no engine-specific hash in
    * the contract.
    *
    * Scale shape: the shard is the parallelism unit. Shard assignment
    * is scan-local; the only shuffle is the per-shard Window sort, and
    * a shard is bounded by construction (at 100 TB you pick nShards so
    * a shard ≈ one training file — the same knob production data
    * loaders expose; a global ORDER BY would instead range-sample and
    * give a layout-dependent order). Emits `shard` and `pos`
    * alongside the original columns; writers `partitionBy("shard")`
    * to get one ordered file per shard.
    */
  def shuffleShards(df: DataFrame, keyCol: String, nShards: Int, seed: Long = 0L): DataFrame = {
    require(nShards > 0, s"shuffleShards: nShards must be positive, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat(lit(seed.toString), lit(":"), col(keyCol).cast("string")))
    // first 4 hex chars as an int: conv() mirrors the oracle's
    // per-character arithmetic (both are "the 16-bit prefix of h")
    val shard = (conv(substring(h, 1, 4), 16, 10).cast("long") % nShards).cast("int")
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(keyCol))
    df.withColumn("__h", h)
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }
}
