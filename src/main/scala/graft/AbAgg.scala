package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM alternating A/B for the under-split-scan fan-out question
  * (optimization round tooling): times plain vs fanned variants of the
  * aggregate shapes back-to-back so co-tenant noise hits both sides of
  * each round equally.
  */
object AbAgg {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.fs.file.impl", classOf[graft.util.NoForkLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }

    def pct(df: DataFrame): DataFrame = df.groupBy(col("o_orderpriority")).agg(
      round(expr("percentile(o_totalprice, 0.25)"), 6).as("p25"),
      round(expr("percentile(o_totalprice, 0.5)"), 6).as("p50"),
      round(expr("percentile(o_totalprice, 0.75)"), 6).as("p75"),
      min(col("o_totalprice")).as("mn"), max(col("o_totalprice")).as("mx"))
    def sagg(df: DataFrame): DataFrame = df.groupBy(col("o_orderpriority")).agg(
      array_join(array_sort(collect_set(col("o_orderstatus"))), ",").as("statuses"),
      countDistinct(col("o_custkey")).as("n_cust"))
    def liAgg(df: DataFrame): DataFrame = df.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
      count(lit(1)).as("cnt"),
      sum(col("l_quantity").cast("decimal(18,6)")).as("sq"),
      sum(col("l_extendedprice").cast("decimal(18,6)")).as("sp"),
      avg(col("l_discount").cast("decimal(18,6)")).as("ad"),
      min(col("l_extendedprice")).as("mn"), max(col("l_extendedprice")).as("mx"))

    val experiments: Seq[(String, String, DataFrame => DataFrame)] = Seq(
      ("pct-orders", "orders", pct), ("stragg-orders", "orders", sagg),
      ("agg-lineitem", "lineitem", liAgg))

    // join-strategy experiment (guide §3.1): default sort-merge vs
    // preferSortMergeJoin=false (planner may pick shuffled-hash) on
    // the self-join multikey shape — conf via cloned session
    if (sys.env.get("SPARK_GRAFT_AB").contains("join")) {
      import org.apache.spark.sql.graftbridge.SessionBridge
      def li = spark.read.parquet(s"$d/lineitem.parquet")
      def mk(df: DataFrame): DataFrame = {
        val l = df.select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        val r = df.select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice").as("r_price"))
        l.join(r, Seq("l_orderkey", "l_linenumber"))
      }
      def shj(dfq: DataFrame): DataFrame = SessionBridge.withConfOverrides(dfq,
        Map("spark.sql.join.preferSortMergeJoin" -> "false"))
      noop(mk(li)); noop(shj(mk(li)))
      var a = 0.0; var b = 0.0
      (1 to 5).foreach { r =>
        val p = time(noop(mk(li))); val f = time(noop(shj(mk(li))))
        a += p; b += f
        println(f"join-multikey round $r  smj $p%.3f  shj-allowed $f%.3f")
      }
      println(f"join-multikey MEAN  smj ${a / 5}%.3f  shj-allowed ${b / 5}%.3f")
      spark.stop(); return
    }

    experiments.foreach { case (name, table, q) =>
      def plain = spark.read.parquet(s"$d/$table.parquet")
      val key = if (table == "orders") "o_orderkey" else "l_orderkey"
      def hashed = plain.repartition(32, col(key))
      noop(q(plain)); noop(q(plain.repartition(32))); noop(q(hashed)) // warm all paths
      var pSum = 0.0; var fSum = 0.0; var hSum = 0.0
      (1 to 5).foreach { r =>
        val p = time(noop(q(plain)))
        val f = time(noop(q(plain.repartition(32))))
        val h = time(noop(q(hashed)))
        pSum += p; fSum += f; hSum += h
        println(f"$name round $r  plain $p%.3f  fanned $f%.3f  hashkey $h%.3f")
      }
      println(f"$name MEAN  plain ${pSum / 5}%.3f  fanned ${fSum / 5}%.3f  hashkey ${hSum / 5}%.3f")
    }
    spark.stop()
  }
}
