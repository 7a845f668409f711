package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.compile.PipelineCompiler
import graft.spec._
import graft.transforms._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each query exercises the engine's operator set (graft.transforms /
  * graft.ops) over the driver testdata, with a DuckDB-equivalent SQL
  * oracle. Cross-engine determinism rules used throughout:
  *  - sums/avgs over doubles go through DECIMAL(38,6): exact integer
  *    arithmetic, so the result is independent of partitioning /
  *    addition order; final CAST to DOUBLE is correctly rounded in
  *    both engines → bit-identical values;
  *  - `events.ts` is nanosecond parquet (Spark truncates to micros,
  *    DuckDB keeps ns) → compared as epoch milliseconds;
  *  - every computed column is explicitly aliased identically in the
  *    Spark plan and the oracle SQL.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is nanosecond-precision parquet, which Spark only
    * reads with `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    * Verify/Bench sessions) — normalize it back to a (microsecond)
    * timestamp so downstream operators see a proper time column.
    */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    val df = t(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
      case _ => df
    }
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full spec→compile→DataFrame path of the engine
    * (SURVEY §7.2 slice: filter lineitem, group, exact sum).
    */
  def entry(spark: SparkSession): DataFrame = {
    val spec = PipelineSpec(
      name = "flagship",
      sources = Seq(SourceSpec("lineitem", "parquet",
        Config.of("path" -> "/root/testdata/sf0.001/lineitem.parquet"))),
      transforms = Seq(
        TransformSpec("f", "filter",
          Config.of("field" -> "l_quantity", "op" -> "gt", "value" -> 24), Nil, 0),
        TransformSpec("a", "aggregate", Config.of(
          "group_by" -> Seq("l_returnflag"),
          "aggregations" -> Seq(
            Map("function" -> "count", "as" -> "cnt"),
            Map("field" -> "l_extendedprice", "function" -> "sum",
              "exact_decimal" -> 6, "as" -> "sum_price"))), Nil, 1)))
    PipelineCompiler.compile(spark, spec).df
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- filter (reference main.py:180-203) ----
    "q_filter_gt" -> ((s, d) =>
      FilterOp(t(s, d, "lineitem"), Config.of("field" -> "l_quantity", "op" -> "gt", "value" -> 24))),
    "q_filter_contains" -> ((s, d) =>
      FilterOp(t(s, d, "part"), Config.of("field" -> "p_type", "op" -> "contains", "value" -> "MED"))),
    "q_filter_notnull" -> ((s, d) =>
      FilterOp(t(s, d, "documents"), Config.of("field" -> "text", "op" -> "notnull"))),
    "q_filter_in" -> ((s, d) =>
      FilterOp(events(s, d), Config.of("field" -> "event_type",
        "op" -> "in", "value" -> Seq("signup", "purchase")))
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))),

    // ---- map (reference main.py:205-224) ----
    "q_map_upper" -> ((s, d) =>
      MapOp(t(s, d, "part").select(col("p_partkey"), col("p_type")),
        Config.of("field" -> "p_type", "operation" -> "upper", "as" -> "p_type_up"))),
    "q_map_cast" -> ((s, d) =>
      MapOp(t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag")),
        Config.of("field" -> "l_returnflag", "operation" -> "int", "as" -> "rf_num"))),

    // ---- aggregate (reference main.py:226-249) ----
    "q_agg" -> ((s, d) =>
      AggregateOp(t(s, d, "lineitem"), Config.of(
        "group_by" -> Seq("l_returnflag", "l_linestatus"),
        "aggregations" -> Seq(
          Map("function" -> "count", "as" -> "cnt"),
          Map("field" -> "l_quantity", "function" -> "sum", "exact_decimal" -> 6, "as" -> "sum_qty"),
          Map("field" -> "l_extendedprice", "function" -> "sum", "exact_decimal" -> 6, "as" -> "sum_price"),
          Map("field" -> "l_discount", "function" -> "avg", "exact_decimal" -> 6, "as" -> "avg_disc"),
          Map("field" -> "l_extendedprice", "function" -> "min", "as" -> "min_price"),
          Map("field" -> "l_extendedprice", "function" -> "max", "as" -> "max_price"))))),
    "q_agg_global" -> ((s, d) =>
      AggregateOp(t(s, d, "lineitem"), Config.of(
        "aggregations" -> Seq(
          Map("function" -> "count", "as" -> "cnt"),
          Map("field" -> "l_extendedprice", "function" -> "sum", "exact_decimal" -> 6, "as" -> "total"),
          Map("field" -> "l_partkey", "function" -> "count_distinct", "as" -> "nparts"))))),
    "q_agg_rollup" -> ((s, d) =>
      AggregateOp(t(s, d, "lineitem"), Config.of(
        "group_by" -> Seq("l_returnflag", "l_linestatus"),
        "grouping" -> "rollup",
        "aggregations" -> Seq(
          Map("function" -> "count", "as" -> "cnt"),
          Map("field" -> "l_quantity", "function" -> "sum", "exact_decimal" -> 6, "as" -> "sum_qty"))))),

    // ---- join (reference main.py:251-263 + SURVEY §2.4 absent kinds) ----
    "q_join_inner" -> ((s, d) =>
      JoinOp(t(s, d, "orders"), Config.of(
        "right" -> "customer", "left_key" -> "o_custkey", "right_key" -> "c_custkey",
        "broadcast" -> true),
        Map("customer" -> t(s, d, "customer")))),
    "q_join_left" -> ((s, d) =>
      JoinOp(t(s, d, "customer"), Config.of(
        "right" -> "nation", "left_key" -> "c_nationkey", "right_key" -> "n_nationkey",
        "how" -> "left", "broadcast" -> true),
        Map("nation" -> t(s, d, "nation")))),
    "q_join_semi" -> ((s, d) =>
      JoinOp(t(s, d, "customer"), Config.of(
        "right" -> "orders", "left_key" -> "c_custkey", "right_key" -> "o_custkey",
        "how" -> "left_semi"),
        Map("orders" -> t(s, d, "orders")))),
    "q_join_anti" -> ((s, d) =>
      JoinOp(t(s, d, "customer"), Config.of(
        "right" -> "orders", "left_key" -> "c_custkey", "right_key" -> "o_custkey",
        "how" -> "left_anti"),
        Map("orders" -> t(s, d, "orders")))),

    // ---- sort / top-k (reference main.py:265-268; limit ABSENT there) ----
    "q_sort_topk" -> ((s, d) =>
      SortOp(t(s, d, "orders"), Config.of(
        "columns" -> Seq(
          Map("field" -> "o_totalprice", "descending" -> true),
          Map("field" -> "o_orderkey", "descending" -> false)),
        "limit" -> 100))),

    // ---- deduplicate (reference main.py:270-279, first-wins) ----
    "q_dedup_first" -> ((s, d) =>
      DedupOp(events(s, d), Config.of(
        "keys" -> Seq("user_id", "event_type"), "keep" -> "first", "order_by" -> Seq("event_id")))
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
          unix_millis(col("ts")).as("ts_ms"), col("props"))),

    // ---- select + rename (reference main.py:281-291) ----
    "q_select_rename" -> ((s, d) =>
      RenameOp(
        SelectOp(t(s, d, "customer"),
          Config.of("fields" -> Seq("c_custkey", "c_name", "c_acctbal"))),
        Config.of("mapping" -> Map("c_name" -> "customer_name")))),

    // ---- union by name, null-fill (reference main.py:437-443) ----
    "q_union" -> ((s, d) => {
      val cust = t(s, d, "customer").select(
        col("c_custkey").as("id"), col("c_name").as("name"),
        col("c_acctbal").as("acctbal"), col("c_mktsegment"))
      val supp = t(s, d, "supplier").select(
        col("s_suppkey").as("id"), col("s_name").as("name"),
        col("s_acctbal").as("acctbal"), col("s_nationkey"))
      UnionOp(cust, Config.of("inputs" -> Seq("supp")), Map("supp" -> supp))
    }),

    // ---- window functions (ABSENT in reference, SURVEY §2.4) ----
    "q_window_rank" -> ((s, d) =>
      FilterOp(
        WindowOp(t(s, d, "orders"), Config.of(
          "partition_by" -> Seq("o_custkey"),
          "order_by" -> Seq(
            Map("field" -> "o_totalprice", "descending" -> true),
            Map("field" -> "o_orderkey", "descending" -> false)),
          "functions" -> Seq(Map("function" -> "row_number", "as" -> "rn")))),
        Config.of("field" -> "rn", "op" -> "le", "value" -> 3))),
    "q_window_running" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        count(lit(1)).over(w).as("n_so_far"),
        sum(col("o_totalprice").cast("decimal(38,6)")).over(w).cast("double").as("spend_so_far"))
    }),

    // ---- scalar function surface (reference: casts/case only, main.py:208-213) ----
    "q_scalar" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        substring(col("o_orderpriority"), 1, 1).as("pri"),
        length(col("o_orderpriority")).cast("long").as("plen"),
        concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("tag"),
        floor(col("o_totalprice")).as("fl"),
        ceil(col("o_totalprice")).as("ce"))),
    "q_case" -> ((s, d) =>
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_quantity") < 10, lit("low"))
          .when(col("l_quantity") < 30, lit("mid"))
          .otherwise(lit("high")).as("qty_band"),
        coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("rf"))),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_filter_gt" -> "SELECT * FROM lineitem WHERE l_quantity > 24",
    "q_filter_contains" -> "SELECT * FROM part WHERE p_type LIKE '%MED%'",
    "q_filter_notnull" -> "SELECT * FROM documents WHERE text IS NOT NULL AND text <> ''",
    "q_filter_in" ->
      "SELECT event_id, user_id, event_type, value FROM events WHERE event_type IN ('signup','purchase')",
    "q_map_upper" -> "SELECT p_partkey, p_type, upper(p_type) AS p_type_up FROM part",
    "q_map_cast" ->
      "SELECT l_orderkey, l_linenumber, l_returnflag, TRY_CAST(l_returnflag AS BIGINT) AS rf_num FROM lineitem",
    "q_agg" -> """
      SELECT l_returnflag, l_linestatus, count(*) AS cnt,
             CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
             CAST(sum(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / count(l_discount) AS avg_disc,
             min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
      FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q_agg_global" -> """
      SELECT count(*) AS cnt,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS total,
             count(DISTINCT l_partkey) AS nparts
      FROM lineitem""",
    "q_agg_rollup" -> """
      SELECT l_returnflag, l_linestatus, count(*) AS cnt,
             CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q_join_inner" -> """
      SELECT o.*, c.c_custkey AS r_c_custkey, c.c_name AS r_c_name,
             c.c_nationkey AS r_c_nationkey, c.c_acctbal AS r_c_acctbal,
             c.c_mktsegment AS r_c_mktsegment
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""",
    "q_join_left" -> """
      SELECT c.*, n.n_nationkey AS r_n_nationkey, n.n_name AS r_n_name,
             n.n_regionkey AS r_n_regionkey
      FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey""",
    "q_join_semi" ->
      "SELECT * FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
    "q_join_anti" ->
      "SELECT * FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
    "q_sort_topk" ->
      "SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100",
    "q_dedup_first" -> """
      SELECT event_id, user_id, event_type, value, epoch_ms(ts) AS ts_ms, props
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS __rn
            FROM events) WHERE __rn = 1""",
    "q_select_rename" ->
      "SELECT c_custkey, c_name AS customer_name, c_acctbal FROM customer",
    "q_union" -> """
      SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal,
             c_mktsegment, CAST(NULL AS INTEGER) AS s_nationkey
      FROM customer
      UNION ALL
      SELECT s_suppkey, s_name, s_acctbal, CAST(NULL AS VARCHAR), s_nationkey
      FROM supplier""",
    "q_window_rank" -> """
      SELECT * FROM (
        SELECT o.*, row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders o) WHERE rn <= 3""",
    "q_window_running" -> """
      SELECT o_custkey, o_orderkey, o_orderdate,
             count(*) OVER w AS n_so_far,
             CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE) AS spend_so_far
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    "q_scalar" -> """
      SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
             substr(o_orderpriority, 1, 1) AS pri, length(o_orderpriority) AS plen,
             concat(o_orderstatus, '-', o_orderpriority) AS tag,
             CAST(floor(o_totalprice) AS BIGINT) AS fl,
             CAST(ceil(o_totalprice) AS BIGINT) AS ce
      FROM orders""",
    "q_case" -> """
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_quantity < 10 THEN 'low'
                  WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS qty_band,
             coalesce(nullif(l_returnflag, 'N'), 'none') AS rf
      FROM lineitem""",
  )
}
