package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph PageRank by power iteration — the host/page authority
  * signal crawl curation ranks domains with (public: Page et al.
  * 1999; Common Crawl publishes host-level ranks of this family, and
  * quality pipelines weight domains by them).
  *
  * Scale shape: pure DataFrame joins + aggregations per iteration —
  * no driver-side graph, no adjacency matrices: edges shuffle by src
  * once per iteration, ranks are (node, rank) rows, and each
  * iteration ends in a LAZY `localCheckpoint` so the lineage stays
  * flat (the [[Components]] discipline) while edges/degrees are
  * checkpointed once up front — lazy because the NEXT driver action
  * (the node count for edges/nodes, the following iteration's
  * dangling-mass aggregate for deg/ranks, the caller's action for the
  * last iteration) materializes each frame anyway, so an eager
  * checkpoint would run one redundant job per frame. The only driver
  * scalars are the node count and the per-iteration dangling mass
  * (single-row aggregates).
  *
  * Semantics (the standard corrected iteration, mass-conserving):
  * edges deduplicate (adjacency, not multigraph); out-degree d(u);
  * dangling mass D = Σ rank(u) over nodes with no out-links;
  * rank'(v) = (1-α)/n + α·(Σ_{u→v} rank(u)/d(u) + D/n). Total mass
  * stays 1 every iteration (spec-asserted). Deterministic: fixed
  * iteration count, no sampling, no order dependence beyond
  * floating-point summation (gates round accordingly).
  */
object PageRank {

  def ranks(edges0: DataFrame, srcCol: String, dstCol: String,
            iters: Int = 10, damping: Double = 0.85): DataFrame = {
    require(iters >= 0 && damping > 0 && damping < 1,
      "pagerank: need iters >= 0 and 0 < damping < 1")
    val edges = edges0
      .select(col(srcCol).cast("string").as("src"), col(dstCol).cast("string").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint(false)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(false)
    val n = nodes.count()
    if (n == 0) return nodes.withColumn("rank", lit(0.0))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint(false)
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
    var i = 0
    while (i < iters) {
      // dangling mass: rank held by nodes with no out-links
      val dm = ranks.join(deg, ranks("node") === deg("src"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0))).head().getDouble(0)
      val contribs = edges
        .join(ranks, edges("src") === ranks("node"))
        .join(deg, "src")
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("w"))
        .groupBy("node").agg(sum(col("w")).as("contrib"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((1 - damping) / n) +
            lit(damping) * (coalesce(col("contrib"), lit(0.0)) + lit(dm / n))).as("rank"))
        .localCheckpoint(false) // flat lineage per iteration (materialized by the next dm aggregate)
      i += 1
    }
    ranks
  }
}
