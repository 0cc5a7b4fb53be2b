package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a candidate-pair graph — the resolution
  * step that turns pairwise dedup hits (minhash/LSH/jaccard pairs)
  * into duplicate CLUSTERS: every document gets the min id of its
  * component as a stable, deterministic cluster label.
  *
  * Algorithm: min-label propagation with pointer jumping. Each round
  * (a) joins current labels across the (symmetrized) edge set and
  * keeps the minimum label seen per node, then (b) compresses paths by
  * relabeling through the label table itself (label := label(label)) —
  * the star-contraction step that turns O(diameter) convergence into
  * O(log diameter), so a 100 TB pair graph converges in a handful of
  * rounds even when near-dup drift chains documents together. Each
  * round is three hash shuffles (edge join, min aggregate, jump join),
  * all partial-aggregated map-side first; `localCheckpoint` truncates
  * the growing lineage so the plan stays flat.
  *
  * The driver holds ONE long per round (the changed-label count used
  * for the convergence test) — never rows.
  */
object ConnectedComponents {

  /** @param pairs undirected edges, one row per pair
    * @return (node, component) for every node that appears in `pairs`;
    *         component = min node id in the connected component
    */
  def resolve(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIters: Int = 20): DataFrame = {
    val edges = pairs
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .cache()

    // fused first round: a node's starting label is min(itself, its
    // neighbors) — one aggregate instead of a full propagate round
    var labels = edges
      .groupBy(col("src"))
      .agg(min("dst").as("mn"))
      .select(col("src").as("node"), least(col("src"), col("mn")).as("component"))
      .localCheckpoint(true)

    // labels only ever DECREASE under min-propagation, so the label sum
    // is a convergence checksum: unchanged sum <=> fixpoint. One cheap
    // aggregate over the just-checkpointed table per round, instead of
    // a join against the previous labels. sum over zero rows is null —
    // coalesce so an empty pair set (clean corpus) converges instead of
    // NPEing out of the curation pipeline.
    def checksum(df: DataFrame): Long =
      df.agg(coalesce(sum("component"), lit(0L))).head().getLong(0)

    var iters = 0
    var prevSum = checksum(labels)
    var converged = false
    while (!converged && iters < maxIters) {
      val propagated = edges
        .join(labels, edges("src") === labels("node"))
        .select(col("dst").as("node"), col("component"))
        .union(labels.select("node", "component"))
        .groupBy("node")
        .agg(min("component").as("component"))
        .localCheckpoint(true)
      // pointer jump: a label is itself a node id, so follow it one
      // more hop (left join: the min label may already be a root)
      val mapping = propagated
        .select(col("node").as("m_node"), col("component").as("m_comp"))
      val next = propagated
        .join(mapping, col("component") === col("m_node"), "left")
        .select(col("node"),
          coalesce(col("m_comp"), col("component")).as("component"))
        .localCheckpoint(true)
      val nextSum = checksum(next)
      converged = nextSum == prevSum
      prevSum = nextSum
      labels = next
      iters += 1
    }
    require(converged,
      s"connected components did not converge in $maxIters rounds — " +
        "graph diameter exceeds the dedup-shape assumption; raise maxIters " +
        "or use a star-contraction variant")
    edges.unpersist()
    labels
  }
}
