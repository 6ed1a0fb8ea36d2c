package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the step that
  * turns dedup PAIRS into dedup GROUPS (a corpus keeps one canonical doc
  * per component, not per pair; transitive duplicates A~B~C must collapse
  * even when (A,C) was never emitted as a pair).
  *
  * Algorithm: min-label propagation to the fixpoint. Every vertex starts
  * labeled with its own id; each round every vertex takes the minimum
  * label among itself and its neighbors; the loop stops the first round
  * that changes nothing. At the fixpoint every vertex holds its
  * component's minimum id — a deterministic canonical group id at any
  * component diameter.
  *
  * Scale shape: each round is one shuffle on the vertex id (groupBy-min
  * with map-side partial mins); the label frame is |V| rows regardless of
  * |E|, and `localCheckpoint` truncates the growing lineage per round.
  * The loop runs TO CONVERGENCE — labels only ever decrease, so "no label
  * changed this round" is equivalent to "sum of labels unchanged", one
  * cheap decimal aggregate per round rather than a change-detect join. A
  * fixed round count (the round-3 shape) silently under-merges any chain
  * longer than 2·rounds; convergence costs one extra round (the one that
  * observes the fixpoint) and makes the answer the true component minimum
  * at every diameter. Near-dup graphs are unions of small dense clusters
  * (diameter 1-2 for banding candidates), so the loop exits after ~3
  * rounds in practice; `maxRounds` is a runaway valve for pathological
  * inputs (diameter > maxRounds throws rather than returning a wrong
  * answer). For graphs where O(diameter) rounds is genuinely too many,
  * alternating large-star/small-star (Kiveris et al.) converges in
  * O(log d) rounds; this min-label form is the right tool for dedup
  * clusters.
  */
object ConnectedComponents {

  /** Component labels at the min-label fixpoint over the undirected edge
    * list `(aCol, bCol)`. Output: (v, label) — one row per distinct
    * vertex; `label` = the minimum id in v's connected component.
    *
    * @throws IllegalStateException if the fixpoint is not reached within
    *         `maxRounds` rounds (component diameter > maxRounds).
    */
  def minLabel(edges: DataFrame, aCol: String, bCol: String, maxRounds: Int = 50): DataFrame = {
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
      .localCheckpoint()
    // decimal(38,0) so the convergence invariant (sum strictly decreases on
    // any label change) cannot be confused by a bigint overflow wraparound
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = prevSum == null // no vertices: already at fixpoint
    var round = 0
    while (!converged && round < maxRounds) {
      val viaNeighbor = und
        .join(labels, col("y") === col("v"))
        .select(col("x").as("v"), col("label"))
      labels = labels.unionByName(viaNeighbor)
        .groupBy(col("v"))
        .agg(min(col("label")).as("label"))
        .localCheckpoint()
      val nextSum = labelSum(labels)
      converged = nextSum == prevSum
      prevSum = nextSum
      round += 1
    }
    if (!converged) throw new IllegalStateException(
      s"min-label propagation did not converge within $maxRounds rounds " +
        "(component diameter exceeds maxRounds); raise maxRounds or use a " +
        "star-contraction algorithm for this graph")
    labels
  }

  /** Dedup-group view over a pair list: every vertex of the pair graph
    * with its canonical (minimum-id) group representative and a flag for
    * whether the row IS the canonical one.
    */
  def dedupGroups(pairs: DataFrame, aCol: String, bCol: String, maxRounds: Int = 50): DataFrame =
    minLabel(pairs, aCol, bCol, maxRounds)
      .select(col("v").as("member_id"), col("label").as("group_id"),
        (col("v") === col("label")).as("is_canonical"))
}
