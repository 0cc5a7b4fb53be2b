package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Connected components over a candidate-pair graph — the resolution
  * step that turns pairwise dedup hits (minhash/LSH/jaccard pairs)
  * into duplicate CLUSTERS: every document gets the min id of its
  * component as a stable, deterministic cluster label.
  *
  * Two algorithms behind one API:
  *
  *   - [[resolve]]: min-label propagation with pointer jumping —
  *     O(log diameter) rounds, the fast path for dedup-shaped graphs
  *     (shallow, star-ish components from near-dup drift);
  *   - [[resolveStars]]: alternating large-star/small-star contraction
  *     (Kiveris et al., "Connected Components in MapReduce and
  *     Beyond") — provably convergent on ANY graph, the bound for
  *     adversarial shapes (long chains) where label propagation's
  *     round count grows. `resolve` falls back to it automatically on
  *     round exhaustion instead of failing.
  *
  * Per-round driver state is one Observation metric (a checksum long),
  * never rows, and each round runs as ONE Spark job: the convergence
  * metric is collected via `observe()` DURING the round's eager
  * `localCheckpoint` — not as a separate aggregate job afterwards.
  * `localCheckpoint` truncates the growing lineage so the plan stays
  * flat across rounds.
  */
object ConnectedComponents {

  /** Eagerly checkpoint `df` while folding the given metric into the
    * SAME job via observe(). Returns the checkpointed frame and the
    * metric value. This is the per-round materialization primitive:
    * one job, flat lineage, no follow-up aggregate pass.
    */
  private def checkpointWithMetric(
      df: DataFrame, metric: org.apache.spark.sql.Column): (DataFrame, Long) = {
    val obs = Observation()
    val cp = df.observe(obs, metric.as("checksum")).localCheckpoint(true)
    (cp, obs.get("checksum").asInstanceOf[Long])
  }

  // labels only ever DECREASE under min-propagation, so an unchanged
  // label set <=> fixpoint. The set is fingerprinted with
  // bit_xor(xxhash64(node, component)): order-independent, and — unlike
  // a sum — immune to ANSI long-overflow at any label magnitude or row
  // count (a 100 TB run sums billions of 63-bit ids past Long range).
  // Aggregating zero rows yields null — coalesce so an empty pair set
  // (clean corpus) converges instead of erroring out of the pipeline.
  private val labelChecksum =
    coalesce(expr("bit_xor(xxhash64(node, component))"), lit(0L))

  /** @param pairs undirected edges, one row per pair
    * @param starFallback on round exhaustion, re-resolve with the
    *        bound-convergence [[resolveStars]] instead of failing
    * @return (node, component) for every node that appears in `pairs`;
    *         component = min node id in the connected component
    */
  def resolve(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIters: Int = 20,
      starFallback: Boolean = true): DataFrame = {
    val (labels, converged, _) = resolveWithRounds(pairs, aCol, bCol, maxIters)
    if (converged) labels
    else if (starFallback) resolveStars(pairs, aCol, bCol)
    else throw new IllegalStateException(
      s"connected components did not converge in $maxIters rounds — " +
        "graph diameter exceeds the dedup-shape assumption; raise maxIters " +
        "or use resolveStars")
  }

  /** Label-propagation core; package-private so specs can assert round
    * counts and job counts. Returns (labels, converged, rounds).
    */
  private[graft] def resolveWithRounds(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIters: Int): (DataFrame, Boolean, Int) = {
    // symmetrize with ONE pass over `pairs`: a union of two projections
    // would execute the (potentially expensive — minhash etc.) pair
    // pipeline twice, since Spark does not share uncached subplans
    // across union branches. No distinct: min-propagation is exact
    // under duplicate and self edges (every aggregate here is a min),
    // so deduping the edge set would buy nothing and cost a full
    // exchange of the largest intermediate — candidate-pair sources
    // are near-unique by construction anyway
    val edges = pairs
      .select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .cache()

    // fused first round: a node's starting label is min(itself, its
    // neighbors) — one aggregate instead of a full propagate round
    var (labels, prevSum) = checkpointWithMetric(
      edges
        .groupBy(col("src"))
        .agg(min("dst").as("mn"))
        .select(col("src").as("node"), least(col("src"), col("mn")).as("component")),
      labelChecksum)

    var iters = 0
    var converged = false
    while (!converged && iters < maxIters) {
      val propagated = edges
        .join(labels, edges("src") === labels("node"))
        .select(col("dst").as("node"), col("component"))
        .union(labels.select("node", "component"))
        .groupBy("node")
        .agg(min("component").as("component"))
      // pointer jump: a label is itself a node id, so follow it one
      // more hop (left join: the min label may already be a root).
      // ADAPTIVE: dedup-shaped graphs (stars/cliques from near-dup
      // drift) converge by round 2 with the fused first round, and for
      // them the jump's self-join is pure per-round overhead — so jump
      // only once the round count signals a deep graph (and the star
      // fallback still bounds truly adversarial chains). `propagated`
      // is deliberately NOT checkpointed when jumping: both join sides
      // share its aggregate subplan, whose exchange is planned once and
      // reused — the whole round executes as a single job on the
      // round's one checkpoint.
      val next = if (iters < 2) propagated else {
        val mapping = propagated
          .select(col("node").as("m_node"), col("component").as("m_comp"))
        propagated
          .join(mapping, col("component") === col("m_node"), "left")
          .select(col("node"),
            coalesce(col("m_comp"), col("component")).as("component"))
      }
      val (cp, nextSum) = checkpointWithMetric(next, labelChecksum)
      // the superseded label checkpoint is dead the moment cp lands —
      // free its blocks so a deep graph holds ONE |V|-row state, not
      // one per round (Blocks hygiene; cp itself is the live state)
      Blocks.drop(labels)
      converged = nextSum == prevSum
      prevSum = nextSum
      labels = cp
      iters += 1
    }
    edges.unpersist()
    (labels, converged, iters)
  }

  /** Alternating large-star/small-star contraction — converges on any
    * graph shape in O(log² n) rounds with per-round state bounded by
    * the edge set (no unbounded neighborhood collection: per-node
    * minima come from partial aggregation). Use directly for known
    * adversarial graphs; [[resolve]] reaches it as the fallback.
    *
    * Each round is large-star then small-star:
    *   - large-star: every node u links its LARGER neighbors to
    *     m = min(N(u) ∪ {u}) — long chains fold toward small ids
    *     without ever increasing the edge count;
    *   - small-star: every node u links its smaller-or-equal neighbors
    *     and itself to m — components contract into stars.
    * Fixpoint (stable edge multiset, checked by a count+hash checksum
    * folded into the round's checkpoint job) leaves each component as
    * a star centered on its min id.
    */
  def resolveStars(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIters: Int = 50): DataFrame = {
    val (labels, converged, _) = resolveStarsWithRounds(pairs, aCol, bCol, maxIters)
    require(converged,
      s"star contraction did not converge in $maxIters rounds — " +
        "this bounds any graph at O(log² n); raise maxIters")
    labels
  }

  private[graft] def resolveStarsWithRounds(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIters: Int): (DataFrame, Boolean, Int) = {
    // edge-set checksum: order-independent, deterministic across runs,
    // overflow-free. Equal checksum <=> fixpoint, up to a ~2^-64
    // per-round collision — the same odds class as resolve's label one.
    val edgeChecksum = coalesce(expr("bit_xor(xxhash64(a, b))"), lit(0L))

    var (edges, prevSum) = checkpointWithMetric(
      pairs.select(col(aCol).as("a"), col(bCol).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct(),
      edgeChecksum)

    var iters = 0
    var converged = edges.isEmpty
    while (!converged && iters < maxIters) {
      // large-star over the symmetrized neighborhood: key u, window-min
      // over its neighbors (one shuffle), emit (v, m) for v > u
      val sym = edges.select(col("a").as("u"), col("b").as("v"))
        .union(edges.select(col("b").as("u"), col("a").as("v")))
      val wU = Window.partitionBy("u")
      // no distinct here: duplicate (a, b) rows are harmless under the
      // small-star min-aggregate and a distinct would cost a shuffle
      // per round; the round's single distinct runs on `next`
      val large = sym
        .withColumn("m", least(min("v").over(wU), col("u")))
        .filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b"))
      // small-star over the max->min directed form: key u (the larger
      // endpoint), link each smaller neighbor AND u itself to m
      val directed = large
        .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      val small = directed
        .withColumn("m", least(min("v").over(wU), col("u")))
      val next = small.select(col("v").as("a"), col("m").as("b"))
        .union(small.select(col("u").as("a"), col("m").as("b")))
        .filter(col("a") =!= col("b"))
        .distinct()
      val (cp, nextSum) = checkpointWithMetric(next, edgeChecksum)
      Blocks.drop(edges) // superseded round state — same hygiene as resolve
      converged = nextSum == prevSum
      prevSum = nextSum
      edges = cp
      iters += 1
    }
    // at fixpoint every component is a star centered on its min:
    // children label from their edge, centers label themselves
    val labels = edges.select(col("a").as("node"), col("b").as("component"))
      .union(edges.select(col("b").as("node"), col("b").as("component")))
      .distinct()
    (labels, converged, iters)
  }
}
