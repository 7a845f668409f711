package graft.catalog

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.time.Instant
import java.util.UUID
import scala.jdk.CollectionConverters._

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.spec.{PipelineSpec, SpecJson}

/** File-backed metadata catalog.
  *
  * The reference persists pipelines/sources/transforms/sinks/runs in
  * five SQLite tables (main.py:32-80). Control-plane metadata is tiny
  * (KBs), so a directory of JSON spec files plus an append-only
  * `runs.jsonl` gives the same capabilities — create / list / load /
  * run-history (main.py:371-413,499-510) — without a database
  * dependency, and works on any shared filesystem a cluster driver can
  * see. Root from `$GRAFT_HOME` (reference: `$PIPELINE_DB`,
  * main.py:21) or an explicit path.
  */
final class MetaStore(root: Path) {
  private val pipelinesDir = root.resolve("pipelines")
  private val runsFile = root.resolve("runs.jsonl")
  Files.createDirectories(pipelinesDir)

  /** Persist a spec; returns its id (reference create_pipeline +
    * add_source/add_transform/add_sink, main.py:371-413, collapsed
    * into one atomic write of the whole spec). */
  def save(spec: PipelineSpec, id: Option[String] = None): String = {
    val pid = id.getOrElse(UUID.randomUUID().toString)
    Files.writeString(pipelinesDir.resolve(s"$pid.json"), spec.json)
    pid
  }

  def load(id: String): PipelineSpec =
    SpecJson.parse(Files.readString(pipelinesDir.resolve(s"$id.json")))

  /** (id, name, description) for every stored pipeline
    * (reference list_pipelines, main.py:499-502). */
  def list(): Seq[(String, String, String)] =
    Files.list(pipelinesDir).iterator().asScala.toSeq
      .filter(_.toString.endsWith(".json")).sortBy(_.toString).map { p =>
        val spec = SpecJson.parse(Files.readString(p))
        val id = p.getFileName.toString.stripSuffix(".json")
        (id, spec.name, spec.description)
      }

  /** Append a run record (reference runs table, main.py:69-79). */
  def recordRun(r: RunRecord): Unit = {
    val line = JsonMethods.compact(JsonMethods.render(JObject(
      "run_id" -> JString(r.runId),
      "pipeline_id" -> JString(r.pipelineId),
      "status" -> JString(r.status),
      "started_at" -> JString(r.startedAt.toString),
      "finished_at" -> JString(r.finishedAt.toString),
      "rows_read" -> JLong(r.rowsRead),
      "rows_written" -> JLong(r.rowsWritten),
      "duration_ms" -> JLong(r.durationMs),
      "error" -> r.error.map(JString(_)).getOrElse(JNull))))
    Files.writeString(runsFile, line + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Run history for a pipeline, newest first (reference list_runs,
    * main.py:504-510). */
  def runs(pipelineId: String): Seq[RunRecord] = {
    if (!Files.exists(runsFile)) return Nil
    Files.readAllLines(runsFile).asScala.toSeq.flatMap { line =>
      JsonMethods.parse(line) match {
        case o: JObject =>
          val c = graft.spec.Config(o)
          if (c.str("pipeline_id").contains(pipelineId))
            Some(RunRecord(
              c.reqStr("run_id"), c.reqStr("pipeline_id"), c.reqStr("status"),
              Instant.parse(c.reqStr("started_at")), Instant.parse(c.reqStr("finished_at")),
              c.int("rows_read").map(_.toLong).getOrElse(0L),
              c.int("rows_written").map(_.toLong).getOrElse(0L),
              c.int("duration_ms").map(_.toLong).getOrElse(0L),
              c.str("error")))
          else None
        case _ => None
      }
    }.reverse
  }
}

object MetaStore {
  def fromEnv(): MetaStore = new MetaStore(
    Paths.get(sys.env.getOrElse("GRAFT_HOME", sys.props("user.home") + "/.graft")))
}

final case class RunRecord(
    runId: String,
    pipelineId: String,
    status: String,
    startedAt: Instant,
    finishedAt: Instant,
    rowsRead: Long,
    rowsWritten: Long,
    durationMs: Long,
    error: Option[String])
