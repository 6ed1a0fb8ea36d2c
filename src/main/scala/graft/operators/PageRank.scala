package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list — the link-graph authority
  * signal corpus pipelines use to weight sources (the CommonCrawl-style
  * "domain rank" that feeds crawl prioritization and quality weighting;
  * Page et al. 1999). Iterations are unrolled into ONE declarative plan, no
  * driver-side loop state and no collect.
  *
  * Replay-exact by construction: the per-node neighbor sum is the ONE place
  * PageRank adds floating doubles in engine-dependent order, so it is
  * computed as an ordered fold — collect the contributions, sort them, and
  * left-fold-add — which any replaying engine can sequence identically
  * (sorting plain doubles is enough: equal values sum the same regardless
  * of tie order). All remaining arithmetic is IEEE division/multiplication
  * with explicit parenthesization. Dangling mass is not redistributed
  * (nodes without in-edges settle at `1 - damping`), the standard simplified
  * formulation.
  *
  * Shape at scale: per iteration, one shuffle join of the rank frame
  * against the edge list on src plus one groupBy(dst). The sorted fold
  * buffers a node's IN-NEIGHBOR contributions in its aggregation row, so
  * memory is bounded by max in-degree — fine for bounded-fanout graphs
  * (bipartite activity graphs, doc-link graphs after dedup); for web-scale
  * hub nodes swap the fold for plain `sum` (giving up bit-replay, keeping
  * the plan) or pre-aggregate hot keys with the SkewJoin salting pattern.
  * The rank frame is `localCheckpoint`ed per iteration like the k-means
  * loop in [[Similarity]] — the unrolled lineage would otherwise double
  * per iteration.
  */
object PageRank {

  // fused codegen sort+fold (see OrderedSumDoubles) — bit-identical to
  // aggregate(sort_array(collect_list(c)), 0.0, +) but not interpreted
  private def orderedSum(c: Column): Column =
    graft.functions.VectorExprs.orderedSum(collect_list(c))

  /** @param edges     directed edge list; duplicates are collapsed
    * @param srcCol    source-node column (integral or string key)
    * @param dstCol    destination-node column
    * @return (node, rank) after `iterations` damped propagation rounds
    */
  def run(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      damping: Double = 0.85): DataFrame = {
    val e = edges
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .distinct()
      .persist()
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node")))
      .distinct()
      .persist()
    val nNodes = nodes.agg(count(lit(1)).as("__n"))
    val outdeg = e.groupBy(col("__src")).agg(count(lit(1)).as("__outdeg"))
    val withDeg = e.join(outdeg, Seq("__src")).persist()

    val init = nodes
      .crossJoin(broadcast(nNodes))
      .select(col("node"),
        (lit(1.0) / col("__n").cast("double")).as("rank"))

    val finalRanks = (1 to iterations).foldLeft(init) { (ranks, it) =>
      val sums = withDeg
        .join(ranks, withDeg("__src") === ranks("node"))
        .select(col("__dst"),
          (col("rank") / col("__outdeg").cast("double")).as("__contrib"))
        .groupBy(col("__dst"))
        .agg(orderedSum(col("__contrib")).as("__s"))
      val next = nodes
        .join(sums, nodes("node") === sums("__dst"), "left")
        .select(col("node"),
          (lit(1.0 - damping) + (lit(damping) * coalesce(col("__s"), lit(0.0))))
            .as("rank"))
      // checkpoint ONLY the final frame: that materialization is the
      // result's storage contract (the cached inputs release safely below).
      // Intermediate iterations stay lazy — at bounded iteration counts the
      // unrolled lineage is fine, and each dropped eager checkpoint was a
      // full extra materialization job + a pinned |V|-row block set per
      // iteration (for loops with many iterations, re-introduce a periodic
      // checkpoint — lineage doubles per round).
      if (it == iterations) next.localCheckpoint(true, Checkpoints.Ser) else next
    }
    // the final localCheckpoint is eager, so every iteration has already
    // read the cached frames — release them rather than leak session-long
    e.unpersist()
    nodes.unpersist()
    withDeg.unpersist()
    finalRanks
  }
}
