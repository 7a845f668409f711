package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism guard for compute-heavy operators.
  *
  * Parquet splits by file/row-group size, so a small COMPRESSED input
  * can carry a large per-row compute load on a handful of tasks: a
  * 5 MB embeddings file is 2 splits — every downstream projection
  * (hashing, norms, regex profiling) then runs on 2 of 32 cores.
  * Measured at the 10× bench scale: text-profile 7.3 s → ~1 s once
  * fanned out.
  *
  * `fanOut` round-robins to the session's default parallelism ONLY
  * when the scan yields fewer splits — on a real cluster reading real
  * data volumes (many splits ≥ parallelism) it is a no-op, so this
  * never introduces a shuffle at the 100 TB design point; locally it
  * costs one tiny shuffle of the source rows.
  */
object Partitioning {
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
