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

  /** Write `df` as `chunks` parquet files under a fresh directory,
    * one file per contiguous event-time range, with strictly
    * increasing modification times. FileStreamSource lists files in
    * (mtime, path) order and `maxFilesPerTrigger = 1` then yields one
    * micro-batch per chunk, replaying history in event-time order.
    * Chunk file names also sort in time order as a second key.
    */
  def writeTimeOrderedChunks(df: DataFrame, tsCol: String, chunks: Int): Path = {
    require(chunks > 0, "chunks must be positive")
    val root = Files.createTempDirectory("graft_stream_fixture")
    val streamDir = root.resolve("stream")
    Files.createDirectories(streamDir)
    val bounds = df.agg(
      min(unix_millis(col(tsCol))).as("lo"), max(unix_millis(col(tsCol))).as("hi")).head()
    val lo = bounds.getLong(0)
    val span = (bounds.getLong(1) - lo + 1).toDouble
    // single partitioned write (one task per chunk → one file per
    // chunk directory) instead of `chunks` filtered passes over the
    // source; partitionBy removes __chunk from the data files, so the
    // stream schema stays the input schema
    val stage = root.resolve("stage")
    df.withColumn("__chunk",
        least(floor((unix_millis(col(tsCol)) - lo) * chunks / span), lit(chunks - 1)).cast("int"))
      .repartition(chunks, col("__chunk"))
      .write.partitionBy("__chunk").mode("overwrite").parquet(stage.toString)
    (0 until chunks).foreach { i =>
      val chunkDir = stage.resolve(s"__chunk=$i")
      if (Files.isDirectory(chunkDir)) { // empty time slices write no directory
        val part = Files.list(chunkDir).filter(p => p.getFileName.toString.endsWith(".parquet"))
          .findFirst().orElseThrow(() => new IllegalStateException(s"no part file in $chunkDir"))
        val dst = streamDir.resolve(f"chunk_$i%03d.parquet")
        Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
        // fixed epoch base: deterministic listing order across reruns
        dst.toFile.setLastModified(1700000000000L + i * 60000L)
      }
    }
    streamDir
  }
}
