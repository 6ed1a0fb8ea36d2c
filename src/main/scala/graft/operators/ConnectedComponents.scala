package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the step that
  * turns dedup PAIRS into dedup GROUPS (a corpus keeps one canonical doc
  * per component, not per pair; transitive duplicates A~B~C must collapse
  * even when (A,C) was never emitted as a pair).
  *
  * Algorithm: min-label propagation. Every vertex starts labeled with its
  * own id; each round every vertex takes the minimum label among itself
  * and its neighbors. After `rounds` iterations a vertex holds the
  * minimum id reachable within `rounds` hops — with `rounds` >= the
  * component diameter that is exactly the component's minimum id, a
  * deterministic canonical group id.
  *
  * Scale shape: each round is one shuffle on the vertex id (groupBy-min
  * with map-side partial mins); the label frame is |V| rows regardless of
  * |E|, and `localCheckpoint` truncates the growing lineage per round.
  * Near-dup graphs are unions of small dense clusters (diameter 1-2 for
  * banding candidates), so a small fixed `rounds` reaches the fixpoint —
  * and a FIXED round count keeps the operator replayable by a SQL oracle
  * as `rounds` unrolled self-joins. For adversarial long-chain graphs,
  * alternating large-star/small-star (Kiveris et al.) converges in
  * O(log d) rounds; this min-label form is the right tool for dedup
  * clusters.
  */
object ConnectedComponents {

  /** Component labels after `rounds` min-label iterations over the
    * undirected edge list `(aCol, bCol)`. Output: (v, label) — one row per
    * distinct vertex; `label` = min id within `rounds` hops.
    */
  def minLabel(edges: DataFrame, aCol: String, bCol: String, rounds: Int): DataFrame = {
    // materialize the (possibly expensive) pair-producing pipeline ONCE,
    // BEFORE mirroring: a union of two selects over the raw `edges` plan
    // executes the upstream near-dup join once per branch (the O(block²)
    // predicate loop twice), and every propagation round would recompute
    // it again — the checkpointed pair list is scanned instead
    val e = edges.select(col(aCol).as("x"), col(bCol).as("y"))
      .localCheckpoint()
    val und = e.unionByName(e.select(col("y").as("x"), col("x").as("y")))
    var labels = und.select(col("x").as("v")).distinct()
      .withColumn("label", col("v"))
    for (_ <- 0 until rounds) {
      val viaNeighbor = und
        .join(labels, col("y") === col("v"))
        .select(col("x").as("v"), col("label"))
      labels = labels.unionByName(viaNeighbor)
        .groupBy(col("v"))
        .agg(min(col("label")).as("label"))
        .localCheckpoint()
    }
    labels
  }

  /** Dedup-group view over a pair list: every vertex of the pair graph
    * with its canonical (minimum-id) group representative and a flag for
    * whether the row IS the canonical one.
    */
  def dedupGroups(pairs: DataFrame, aCol: String, bCol: String, rounds: Int): DataFrame =
    minLabel(pairs, aCol, bCol, rounds)
      .select(col("v").as("member_id"), col("label").as("group_id"),
        (col("v") === col("label")).as("is_canonical"))
}
