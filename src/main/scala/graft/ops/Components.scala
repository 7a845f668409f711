package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pair sets — the step that
  * turns pairwise dedup output (`Dedup.minhashNearDups` etc.) into
  * actionable clusters: every document gets a canonical component id
  * (the minimum member id), so "keep one per cluster" is a single
  * filter. The reference pipeline has no analogue; this is the
  * operation a training-data dedup pass needs at 100 TB, where
  * near-dup pairs chain (a~b, b~c but not a~c) and pair output alone
  * over-deletes or under-deletes.
  *
  * Algorithm: alternating large-star / small-star contraction
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14). Each round is two hash-aggregate + join passes over the
  * edge list — no per-component grouping, no adjacency lists
  * materialized per node (a `collect_list` of neighbors would put a
  * whole high-degree star on one reducer; the min-neighbor aggregate
  * + join keeps every stage a uniform shuffle). Converges in
  * O(log n) rounds on any graph — unlike naive min-label propagation,
  * which needs O(diameter) rounds and dies on chain-shaped clusters.
  *
  * Scale notes: per-round lineage is truncated with `localCheckpoint`
  * (an iterative plan otherwise grows by two joins per round and
  * re-executes from the source on every action); the convergence test
  * is a count + order-independent digest, one job per round. Edges
  * shuffle as two id columns — document bodies never move.
  */
object Components {

  /** Component assignment for every node appearing in `pairs`:
    * returns ("id", "component") where component = min id reachable
    * via pair edges. Nodes not mentioned in `pairs` are absent (they
    * are their own singleton components by definition).
    */
  def connectedComponents(
      pairs: DataFrame, aCol: String = "a_id", bCol: String = "b_id",
      maxIter: Int = 50): DataFrame = {
    // canonical (hi, lo) edges; self-pairs carry no information
    // LAZY checkpoints throughout: the digest aggregate that follows
    // each round is the materializing action, so an eager checkpoint
    // would run one extra job per round (2 jobs -> 1; the digest scans
    // the freshly cached blocks either way)
    var e = pairs
      .select(greatest(col(aCol), col(bCol)).as("u"), least(col(aCol), col(bCol)).as("v"))
      .where(col("u") =!= col("v")).distinct()
      .localCheckpoint(false)

    var digest = edgeDigest(e)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // large-star: for each node, link every LARGER neighbor to the
      // minimum of its neighborhood (computed over the symmetrized
      // edge list). Output stays in (hi, lo) form: v' > u >= m.
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val large = sym.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v")).distinct()

      // small-star: edges now all point hi -> lo; link each node and
      // its smaller neighbors to the minimum of that down-neighborhood.
      val mins2 = large.groupBy("u").agg(min("v").as("m"))
      val small = large.join(mins2, "u").where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(mins2.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v")).distinct()
        .localCheckpoint(false)

      val d = edgeDigest(small)
      converged = d == digest
      digest = d
      e = small
      iter += 1
    }
    // fixed point is a star forest: (member -> root) plus the roots
    // themselves, which appear only on the v side
    val members = e.select(col("u").as("id"), col("v").as("component"))
    val roots = e.select(col("v").as("id")).distinct()
      .join(e.select(col("u").as("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
    members.unionByName(roots)
  }

  /** Near-dup removal end-to-end: keep one document per component
    * (the minimum id) plus every document not in any near-dup pair.
    */
  def keepClusterRepresentatives(
      df: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "a_id", bCol: String = "b_id"): DataFrame = {
    val losers = connectedComponents(pairs, aCol, bCol)
      .where(col("id") =!= col("component")).select(col("id"))
    df.join(losers, df(idCol) === losers("id"), "left_anti")
  }

  /** Order-independent edge-set digest: (count, sum of per-edge
    * hashes as decimal — ANSI-safe, no long overflow). Equal digests
    * across rounds ⟹ the contraction reached its fixed point (the
    * transformation is deterministic, so an unchanged edge set stays
    * unchanged forever). A spurious match needs two different edge
    * sets with equal cardinality AND equal 64-bit hash sums —
    * probability ~2^-64 per round, accepted.
    */
  private def edgeDigest(e: DataFrame): (Long, java.math.BigDecimal) = {
    val r = e.agg(
      count(lit(1)).as("n"),
      coalesce(sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")), lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")).as("h")
    ).head()
    (r.getLong(0), r.getDecimal(1))
  }
}
