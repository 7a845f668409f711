package graft

import org.apache.spark.sql.SparkSession

/** Opinionated SparkSession factory with the engine's standard
  * configuration: AQE on (runtime join re-planning, skew splitting,
  * partition coalescing), UTC session time, shuffle parallelism sized
  * to the cluster instead of Spark's legacy default of 200, and the
  * nanosecond-parquet compatibility flag the driver testdata needs.
  */
object GraftSession {

  def builder(master: String = "local[*]", shufflePartitions: Int = 0): SparkSession.Builder = {
    val parts =
      if (shufflePartitions > 0) shufflePartitions
      else math.max(2, Runtime.getRuntime.availableProcessors())
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // local writes without the chmod fork-per-file of the stock
      // RawLocalFileSystem on hosts missing libhadoop.so — behavior
      // otherwise identical (see graft.util.NoForkLocalFs)
      .config("spark.hadoop.fs.file.impl", classOf[graft.util.NoForkLocalFileSystem].getName)
  }

  /** Local session for tests/CLI; on a cluster, pass the real master
    * (or use spark-submit, which injects it). */
  def local(cores: String = "*"): SparkSession = {
    val s = builder(s"local[$cores]").config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
