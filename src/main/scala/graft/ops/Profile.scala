package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Dataset profiler: per-column stats in ONE scan (the reference's
  * `validate_schema`, main.py:476-497, reports only type names + row
  * count; data pipelines need null/distinct/range profiles to catch
  * drift before a 100 TB run burns on bad input).
  *
  * All statistics are computed in a single wide aggregation (one pass,
  * partial aggs map-side), then pivoted to one row per column. min/max
  * surface as strings so heterogeneous column types fit one schema.
  */
object Profile {
  def stats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "Profile.stats: need at least one column")
    def q(n: String) = col(s"`${n.replace("`", "``")}`")
    val aggs =
      count(lit(1)).as("__n") +:
        cols.flatMap { cn => Seq(
          count(q(cn)).as(s"__nn_$cn"),
          countDistinct(q(cn)).as(s"__nd_$cn"),
          min(q(cn)).cast(StringType).as(s"__mn_$cn"),
          max(q(cn)).cast(StringType).as(s"__mx_$cn"))
        }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val structs = cols.map { cn =>
      struct(
        lit(cn).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$cn")).as("n_nulls"),
        col(s"__nd_$cn").as("n_distinct"),
        col(s"__mn_$cn").as("min_value"),
        col(s"__mx_$cn").as("max_value"))
    }
    one.select(explode(array(structs: _*)).as("s")).select(col("s.*"))
  }
}
