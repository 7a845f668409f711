package graft.run

import java.time.Instant
import java.util.UUID

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

import graft.catalog.{MetaStore, RunRecord}
import graft.compile.PipelineCompiler
import graft.sinks.SinkWriter
import graft.spec.PipelineSpec

/** Batch executor: compile → write to every sink → record the run.
  * Mirrors the reference run loop (main.py:415-474): read sources,
  * implicit union, fold transforms, fan out to all sinks, persist a
  * run record with rows_read / rows_written / duration / error.
  *
  * Differences that matter at scale:
  *  - sources are lazy scans, so rows_read is only counted when
  *    `collectStats` is on (each count is a cheap column-pruned scan);
  *  - with multiple sinks the final stream is persisted
  *    (MEMORY_AND_DISK) so transforms run once, not once per sink —
  *    the reference holds everything in memory by construction;
  *  - failures roll up into a failed run record (main.py:467-474).
  */
object PipelineRunner {

  final case class RunResult(
      runId: String,
      status: String,
      rowsRead: Long,
      rowsWritten: Long,
      durationMs: Long,
      error: Option[String],
      /** Rows observed flowing OUT of each transform (stage name →
        * rows), measured inside the sink action via CollectMetrics —
        * no per-stage count jobs. Empty when stats are off or the
        * pipeline has no sinks. */
      stageRows: Map[String, Long] = Map.empty)

  def run(
      spark: SparkSession,
      spec: PipelineSpec,
      pipelineId: String = "",
      store: Option[MetaStore] = None,
      collectStats: Boolean = true): RunResult = {
    val runId = UUID.randomUUID().toString
    val started = Instant.now()
    val t0 = System.nanoTime()
    try {
      val compiled = PipelineCompiler.compile(spark, spec,
        observeStages = collectStats && spec.sinks.nonEmpty)
      val rowsRead =
        if (collectStats) compiled.ctx.values.map(_.count()).sum else -1L
      val multiSink = spec.sinks.size > 1
      val out = if (multiSink) compiled.df.persist(StorageLevel.MEMORY_AND_DISK) else compiled.df
      try {
        spec.sinks.foreach(s => SinkWriter.write(out, s))
        val rowsWritten =
          if (spec.sinks.isEmpty) 0L
          else if (collectStats) out.count() * math.max(1, spec.sinks.size) else -1L
        // stage metrics landed during the first sink's action; the
        // bounded wait means a stage whose metrics never materialize
        // is absent from the map rather than hanging the run
        val stageRows: Map[String, Long] = compiled.stageObs.flatMap { case (name, o) =>
          try {
            val row = scala.concurrent.Await.result(o.future,
              scala.concurrent.duration.Duration(30, "s"))
            // the metrics Row may arrive schema-less; there is exactly
            // one observed expression per stage. A self-joining
            // downstream op can duplicate the observed subtree and
            // surface an empty metrics row — best-effort: skip it.
            if (row.length > 0) Some(name -> row.getLong(0)) else None
          } catch { case _: java.util.concurrent.TimeoutException => None }
        }.toMap
        val dur = (System.nanoTime() - t0) / 1000000
        val res = RunResult(runId, "success", rowsRead, rowsWritten, dur, None, stageRows)
        store.foreach(_.recordRun(RunRecord(runId, pipelineId, "success", started,
          Instant.now(), rowsRead, rowsWritten, dur, None, stageRows)))
        res
      } finally if (multiSink) out.unpersist()
    } catch {
      case e: Throwable =>
        val dur = (System.nanoTime() - t0) / 1000000
        store.foreach(_.recordRun(RunRecord(runId, pipelineId, "failed", started,
          Instant.now(), 0L, 0L, dur, Some(e.getMessage))))
        RunResult(runId, "failed", 0L, 0L, dur, Some(e.getMessage))
    }
  }
}
