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
}
