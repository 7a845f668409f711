package graft.streaming

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch/stream parity harness: replays a batch table through the
  * file-stream source as time-ordered micro-batches, so a streaming
  * query's output can be hash-compared against the batch operator
  * (and the external oracle) instead of only spot-checked.
  *
  * Why time-ordered: watermark semantics make append/update-mode
  * output depend on arrival order. Replaying chunks in event-time
  * order makes the stream a valid arrival history in which no event
  * is late, so the streaming result is the batch result — which is
  * exactly the property the parity gate wants to pin. (Late-arrival
  * *dropping* is covered separately in StreamingSpec with a
  * hand-built out-of-order MemoryStream.)
  *
  * Scale note: this is a test/verification fixture, not a data path —
  * the chunk writer coalesces each time-slice to one file because a
  * micro-batch per slice is the point. Production streams enter via
  * [[Streaming.fileSource]] over whatever files the upstream writer
  * produced.
  */
object StreamParity {

  /** Harness-vs-operator instrumentation for the bench (round-7
    * advice #8): fixture STAGING time (chunk writes — one-time per
    * JVM thanks to the memo below) and REPLAY-loop time (the
    * arrival-per-round feed, operator-dominated) accumulate here so
    * Bench can report them per query next to the wall total. Reset
    * between timed repeats; zero for non-streaming queries.
    */
  private val stagingNs = new java.util.concurrent.atomic.AtomicLong(0)
  private val replayNs = new java.util.concurrent.atomic.AtomicLong(0)
  def resetTimers(): Unit = { stagingNs.set(0); replayNs.set(0) }
  def stagingSeconds: Double = stagingNs.get() / 1e9
  def replaySeconds: Double = replayNs.get() / 1e9

  /** Memoized staged fixtures: the bench harness times each gate
    * min-of-N, and without this every repeat pays the fixture WRITE
    * again — harness cost, not operator cost. Callers pass a
    * `cacheKey` asserting "same df content" (gate name + sf dir);
    * the staged directory is immutable once written (feedSequentially
    * only COPIES from it), so reuse is safe for the JVM lifetime.
    */
  private val staged =
    new java.util.concurrent.ConcurrentHashMap[(String, Seq[Int]), (Path, Seq[Int])]()

  /** Write `df` as `chunks` parquet files under a fresh directory,
    * one file per contiguous event-time range, with strictly
    * increasing modification times. FileStreamSource lists files in
    * (mtime, path) order and `maxFilesPerTrigger = 1` then yields one
    * micro-batch per chunk, replaying history in event-time order.
    * Chunk file names also sort in time order as a second key.
    */
  def writeTimeOrderedChunks(df: DataFrame, tsCol: String, chunks: Int,
      cacheKey: Option[String] = None): Path =
    writeChunksInOrder(df, tsCol, 0 until chunks, cacheKey)._1

  /** Like [[writeTimeOrderedChunks]], but the chunks ARRIVE in the
    * given order (`order` must be a permutation of chunk indices) — a
    * deterministic out-of-order history for late-data gates: the
    * event-time chunking fixes WHAT is late, the permutation fixes BY
    * HOW MUCH, so the watermark schedule — and therefore the exact
    * set of rows the stream must drop — is predictable arithmetic
    * over (chunk ranges, arrival positions), which is what lets an
    * external oracle re-derive the streaming answer instead of
    * spot-checking it.
    *
    * Chunks that received no rows (empty time slices) are skipped,
    * preserving the relative arrival order of the rest. Returns
    * (streamDir, chunk ids actually written, in arrival order).
    */
  def writeChunksInOrder(df: DataFrame, tsCol: String, order: Seq[Int],
      cacheKey: Option[String] = None): (Path, Seq[Int]) = {
    cacheKey match {
      case Some(k) =>
        staged.computeIfAbsent((k, order), _ => writeChunksInOrderUncached(df, tsCol, order))
      case None => writeChunksInOrderUncached(df, tsCol, order)
    }
  }

  private def writeChunksInOrderUncached(
      df: DataFrame, tsCol: String, order: Seq[Int]): (Path, Seq[Int]) = {
    val __t0 = System.nanoTime()
    try writeChunksTimed(df, tsCol, order)
    finally stagingNs.addAndGet(System.nanoTime() - __t0)
  }

  private def writeChunksTimed(
      df: DataFrame, tsCol: String, order: Seq[Int]): (Path, Seq[Int]) = {
    val chunks = order.length
    require(chunks > 0, "order must be non-empty")
    require(order.sorted == (0 until chunks), s"order must permute 0 until $chunks: $order")
    val root = Files.createTempDirectory("graft_stream_fixture")
    val streamDir = root.resolve("stream")
    Files.createDirectories(streamDir)
    // cast: accepts TIMESTAMP_NTZ inputs (unix_millis rejects NTZ);
    // session zone is UTC so the cast is instant-preserving
    val tsMs = unix_millis(col(tsCol).cast("timestamp"))
    val bounds = df.agg(min(tsMs).as("lo"), max(tsMs).as("hi")).head()
    val lo = bounds.getLong(0)
    val span = (bounds.getLong(1) - lo + 1).toDouble
    // single partitioned write (one task per chunk → one file per
    // chunk directory) instead of `chunks` filtered passes over the
    // source; partitionBy removes __chunk from the data files, so the
    // stream schema stays the input schema
    val stage = root.resolve("stage")
    df.withColumn("__chunk",
        least(floor((tsMs - lo) * chunks / span), lit(chunks - 1)).cast("int"))
      .repartition(chunks, col("__chunk"))
      .write.partitionBy("__chunk").mode("overwrite").parquet(stage.toString)
    val arrived = order.filter(c => Files.isDirectory(stage.resolve(s"__chunk=$c")))
    arrived.zipWithIndex.foreach { case (c, j) =>
      val chunkDir = stage.resolve(s"__chunk=$c")
      val part = Files.list(chunkDir).filter(p => p.getFileName.toString.endsWith(".parquet"))
        .findFirst().orElseThrow(() => new IllegalStateException(s"no part file in $chunkDir"))
      // FileStreamSource lists in (mtime, path) order; name by ARRIVAL
      // position so both keys agree, mtime on a fixed epoch base for
      // deterministic listing across reruns
      val dst = streamDir.resolve(f"arrival_$j%03d.parquet")
      Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setLastModified(1700000000000L + j * 60000L)
    }
    (streamDir, arrived)
  }

  /** Feed a staged replay into a WATCHED directory one file per
    * `processAllAvailable` round. Why not point the stream at the
    * staged directory directly: when every file is visible at start,
    * the micro-batches run back-to-back and Spark's late-record
    * filter — which since 3.4 uses the PREVIOUS batch's watermark
    * (eviction uses the current one; SPARK-42376's two-watermark
    * split) — lags the arrival history by one extra batch, so
    * moderate disorder is never actually filtered. Arrival-per-round
    * feeding lets the no-data batches between rounds bring the filter
    * watermark up to date, which is also what a real deployment sees:
    * files land over time, not as one pre-existing backlog. Files are
    * fed in name order (= arrival order from [[writeChunksInOrder]]).
    */
  def feedSequentially(streamDir: Path, watched: Path,
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val __t0 = System.nanoTime()
    try {
      val files = Files.list(streamDir).sorted().toArray.map(_.asInstanceOf[Path])
      files.foreach { f =>
        Files.copy(f, watched.resolve(f.getFileName.toString), StandardCopyOption.REPLACE_EXISTING)
        q.processAllAvailable()
      }
    } finally replayNs.addAndGet(System.nanoTime() - __t0)
  }
}
