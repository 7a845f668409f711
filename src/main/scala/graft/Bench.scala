package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT/classload the scan+codegen+shuffle paths once
    // so the first measured query reflects steady state, not JVM warmup
    try {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      li.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()
      // regex-bearing pass: JIT the codegen'd rlike/UTF8String paths so
      // the first measured regex query isn't paying compiler warmup
      li.filter("l_returnflag rlike '^[A-Z]+$'").groupBy("l_linestatus").count()
        .write.format("noop").mode("overwrite").save()
      // agg + semi-join pass: JIT hash-join build/probe and the AQE
      // shuffle→broadcast conversion the join-family queries hit
      val mins = li.groupBy("l_orderkey")
        .agg(org.apache.spark.sql.functions.min("l_linenumber").as("l_linenumber"))
      li.join(mins, Seq("l_orderkey", "l_linenumber"), "left_semi")
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    // noop sink materializes every output column (a bare count() would
    // let Catalyst prune the computed columns and bench only the scan)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-24s $dt%8.2fs")
      name -> dt
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
