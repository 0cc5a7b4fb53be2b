package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge-list DataFrames — the
  * corpus-graph shapes that [[ConnectedComponents]] does not cover:
  * triangle counting (local clustering / community density over a
  * near-dup or co-occurrence graph), k-core decomposition (dense-core
  * extraction, the standard spam/boilerplate-cluster signal), a
  * deterministic integer PageRank (authority weighting for
  * quality-aware sampling), and deterministic random walks
  * (DeepWalk-style positive-pair generation for embedding training).
  *
  * All three are exact-integer algorithms end to end, so their results
  * are engine-portable without an epsilon: PageRank runs in scaled
  * fixed-point (`Long` ranks, floor division) rather than doubles,
  * trading ~1e-12 of relative precision for bit-identical results on
  * any engine and any partitioning — a sum of longs has no
  * floating-point fold-order problem.
  *
  * Scale design (the 100 TB story):
  *   - the edge list is `localCheckpoint`ed once and every pass reads
  *     the materialized form — degree, orientation, wedges and the
  *     closing join never recompute the (possibly expensive) edge
  *     derivation;
  *   - triangle counting uses DEGREE ORIENTATION (each undirected edge
  *     directed from its (degree, id)-smaller endpoint): every
  *     out-neighborhood is bounded by O(sqrt(|E|)), so the wedge
  *     self-join never explodes on a high-degree hub — the classic
  *     distributed-triangle bound (Suri & Vassilvitskii, "Counting
  *     Triangles and the Curse of the Last Reducer", WWW'11);
  *   - k-core peeling and PageRank keep ALL per-round state on the
  *     executors; the driver holds one observed Long per round
  *     (edge-set checksum), exactly the [[ConnectedComponents]]
  *     contract — one job per round via `observe()` + eager
  *     `localCheckpoint`, flat lineage across rounds;
  *   - symmetrization explodes a 2-element array instead of unioning
  *     two projections, so the upstream plan is scanned ONCE.
  *
  * Restart contract (all iterative operators here, plus
  * [[SimilaritySearch.kCenterSelect]] and
  * [[SubstringDedup.scrubToFixedPoint]]): per-round state is anchored
  * by eager `localCheckpoint`s, whose blocks live on the EXECUTORS
  * that computed them, not in reliable storage. On local mode that is
  * simply fast; on a real cluster, losing an executor mid-iteration
  * invalidates its blocks and the job fails — the contract is RESTART
  * THE CALL (every operator is deterministic, so a rerun reproduces
  * the same result), not resume. For runs long enough that executor
  * churn is expected (hundreds of rounds on spot nodes), swap
  * `localCheckpoint` for reliable `checkpoint` against the cluster's
  * checkpoint dir — one line per operator — and pay the DFS write per
  * round. Practical bounds at this design point: PageRank/k-core/CC
  * run one job per round (tens of rounds — O(log diameter) for CC,
  * `maxIter` for PageRank); `kCenterSelect` is k sequential 1-row
  * driver round-trips, so keep k in the hundreds, not tens of
  * thousands; `scrubToFixedPoint` converges in 2-3 passes on real
  * corpora.
  */
object Graph {

  /** Canonical undirected edge set: endpoints ordered (`a < b`),
    * self-loops dropped, duplicates (either orientation) collapsed.
    * One shuffle (the distinct).
    */
  def canonicalize(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** Both directions of a canonical edge set from ONE scan of the
    * upstream plan (array-explode, not a self-union — a union of two
    * projections of the same uncached subplan executes it twice).
    */
  private def symmetrize(canon: DataFrame): DataFrame =
    canon
      .select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))

  /** The symmetric edge list materialized HASH-PARTITIONED AND SORTED
    * on `src`. `localCheckpoint` preserves both the partitioning and
    * the intra-partition order, so every later src-keyed join or
    * aggregate against this table plans with ZERO exchange and ZERO
    * sort on the edge side — the iterative consumers (PageRank's
    * per-iteration contribution join, every walk hop) pay the edge
    * shuffle once here instead of once per round (measured at sf0.1:
    * 4 walk hops 5.9 s → 2.2 s). This is exactly the layout a
    * 1000-executor run wants: the dominant table exchanged once,
    * iteration state (|V| rows) the only thing that ever moves again.
    */
  private def symmetrizeForJoins(canon: DataFrame): DataFrame = {
    // explicit partition count: a bare repartition(col) is an AQE
    // coalesce target, and a checkpoint coalesced to one partition
    // serializes every downstream hop
    val n = canon.sparkSession.sessionState.conf.numShufflePartitions
    symmetrize(canon)
      .repartition(n, col("src"))
      .sortWithinPartitions("src")
      .localCheckpoint(true)
  }

  /** Eager per-round materialization: one job that checkpoints `df`
    * AND folds the given metric via `observe()` — no follow-up
    * aggregate pass. Mirrors [[ConnectedComponents]].
    */
  private def checkpointWithMetric(
      df: DataFrame, metric: Column): (DataFrame, Long) = {
    val obs = Observation()
    val cp = df.observe(obs, metric.as("m")).localCheckpoint(true)
    (cp, obs.get("m").asInstanceOf[Long])
  }

  /** Per-node triangle counts over an undirected graph. Returns
    * `(node, n_triangles)` for every node on at least one triangle;
    * the global triangle count is `sum(n_triangles) / 3`.
    *
    * Degree-oriented: an edge u—v is directed u→v iff
    * `(deg(u), u) < (deg(v), v)` (a total order, so the orientation is
    * acyclic); a triangle u<v<w in that order has edges u→v, u→w, v→w
    * and is found EXACTLY once — at its smallest edge (u, v), as the
    * common out-neighbors w of u and v. Out-neighborhoods under this
    * orientation are O(sqrt(|E|)) regardless of hub degree, so the
    * per-node adjacency arrays are bounded and the intersection work
    * is the same Sigma C(outdeg, 2) a wedge join would do — but as
    * codegen'd array intersections riding TWO |E|-row equi-joins,
    * never a shuffle of the Sigma C(outdeg, 2) wedge rows themselves
    * (41M wedges vs 1.2M edges at sf0.1: measured 9.7 s → ~3 s).
    *
    * @param canonical set true when `edges` is ALREADY deduplicated
    *        with `src < dst` and no self-loops (skips one shuffle)
    */
  def triangles(
      edges: DataFrame,
      srcCol: String = "a",
      dstCol: String = "b",
      canonical: Boolean = false): DataFrame = {
    val canon0 =
      if (canonical) edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      else canonicalize(edges, srcCol, dstCol)
    // materialize once: degree, orientation and the closing join all
    // re-read this instead of re-deriving the edge list
    val canon = canon0.localCheckpoint(true)

    val deg = symmetrize(canon)
      .groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))

    // materialized: the adjacency fold and both edge joins read it —
    // without the checkpoint each consumer re-runs the two degree
    // joins. O(|E|) rows, same cost class as the edge list itself.
    // Partitioned + sorted on src so the adjacency aggregate and the
    // u-side join replan with no exchange and no sort (localCheckpoint
    // preserves both); only the v-side join moves the edges again.
    val oriented = canon
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("a")).otherwise(col("b")).as("src"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("b")).otherwise(col("a")).as("dst"))
      .repartition(
        canon.sparkSession.sessionState.conf.numShufflePartitions,
        col("src"))
      .sortWithinPartitions("src")
      .localCheckpoint(true)
    // everything downstream reads `oriented`; the canonical edge
    // anchor is superseded the moment it lands
    Blocks.drop(canon)

    // out-adjacency arrays: O(sqrt(|E|))-bounded by the orientation,
    // so collect_list state is bounded no matter how skewed the graph
    val adj = oriented
      .groupBy("src")
      .agg(sort_array(collect_list(col("dst"))).as("ns"))

    oriented
      .select(col("src").as("u"), col("dst").as("v"))
      .join(adj.select(col("src").as("u"), col("ns").as("nu")), "u")
      .join(adj.select(col("src").as("v"), col("ns").as("nv")), "v")
      .select(col("u"), col("v"),
        explode(array_intersect(col("nu"), col("nv"))).as("w"))
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("n_triangles"))
  }

  // the edge set only ever SHRINKS under peeling, so an unchanged
  // order-independent fingerprint <=> fixpoint; coalesce keeps the
  // empty-core round from erroring (bit_xor of zero rows is null)
  private val edgeChecksum =
    coalesce(expr("bit_xor(xxhash64(src, dst))"), lit(0L))

  /** k-core of an undirected graph: iteratively peel nodes of degree
    * < k (with their edges) until fixpoint or `maxRounds`. Returns
    * `(node, core_degree)` — each surviving node with its degree
    * INSIDE the core.
    *
    * Determinism under a round budget: peeling is monotone (the edge
    * set only shrinks), and one synchronous round is a pure function
    * of the previous edge set — so "exactly R rounds" is
    * engine-portable even when R stops short of the fixpoint, and a
    * converged run is identical to any larger budget (a fixpoint peel
    * is the identity). Early exit on the observed fingerprint;
    * per-round driver state is one Long.
    *
    * Scale shape per round: one degree aggregate (never a per-node
    * window — a hub's edge partition must not materialize in one
    * task) and two semi-joins, all keyed on node — with ONE exchange
    * of the edge set per peel: the graph is symmetric, so degree can
    * be counted on WHICHEVER endpoint the edges are already
    * partitioned by, making the degree aggregate and the same-side
    * semi-join exchange-free; only the other-side semi-join moves the
    * edges, leaving them partitioned by that endpoint for the next
    * peel (the keys alternate src/dst round over round). Two peels
    * chain inside each checkpoint job, halving the per-job fixed cost
    * that dominates when rounds are small.
    */
  def kcore(
      edges: DataFrame,
      k: Int,
      srcCol: String = "a",
      dstCol: String = "b",
      maxRounds: Int = 16,
      canonical: Boolean = false): DataFrame = {
    require(k >= 1 && maxRounds >= 1, s"need k,maxRounds >= 1, got $k, $maxRounds")
    val canon =
      if (canonical) edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      else canonicalize(edges, srcCol, dstCol)
    // one synchronous peel, degree counted on `p` (the endpoint the
    // edges arrive partitioned by); output leaves partitioned by the
    // OTHER endpoint — the next peel's `p`
    def peel(df: DataFrame, p: String): DataFrame = {
      val o = if (p == "src") "dst" else "src"
      val keep = df
        .groupBy(col(p).as("node"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select("node")
      df.join(keep.select(col("node").as(p)), Seq(p), "left_semi")
        .join(keep.select(col("node").as(o)), Seq(o), "left_semi")
        .select("src", "dst")
    }
    var (cur, sum) = checkpointWithMetric(
      symmetrize(canon).repartition(
        canon.sparkSession.sessionState.conf.numShufflePartitions,
        col("src")),
      edgeChecksum)
    var key = "src"
    var done = false
    var peeled = 0
    while (!done && peeled < maxRounds) {
      val chunk = math.min(2, maxRounds - peeled)
      var next = cur
      var p = key
      for (_ <- 1 to chunk) {
        next = peel(next, p)
        p = if (p == "src") "dst" else "src"
      }
      val (cp, s) = checkpointWithMetric(next, edgeChecksum)
      // free the superseded edge set's blocks immediately — converged
      // rounds discard cp (identical content), advancing rounds
      // discard the previous state; either way exactly one edge-set
      // checkpoint stays resident
      if (s == sum) { done = true; Blocks.drop(cp) }
      else { Blocks.drop(cur); cur = cp; sum = s; key = p; peeled += chunk }
    }
    cur.groupBy(col("src").as("node")).agg(count(lit(1)).as("core_degree"))
  }

  /** Deterministic fixed-point PageRank over the UNDIRECTED graph
    * (both directions of every edge), `iters` synchronous iterations:
    *
    * {{{ r'(v) = floor(0.15 * scale) + floor(85 * sum_{u~v} floor(r(u) / deg(u)) / 100) }}}
    *
    * All arithmetic is `Long` — floor division for the per-neighbor
    * share and the damping — so the result is bit-identical across
    * engines and partitionings (no double fold-order sensitivity), at
    * ~1e-12 relative precision for the default scale. ANSI mode makes
    * any overflow loud; the bound is `85 * |V| * scale < 2^63`.
    * `scale = 0` (the default) derives the scale from the graph
    * itself: the largest power of ten satisfying the bound, capped at
    * 1e12 — so |V| ≲ 1e5 gets the full 1e-12 precision and a larger
    * graph trades precision for range automatically (scale = 1e9
    * admits |V| ~ 1e8 at ~1e-9 relative precision) instead of
    * overflowing. An explicit scale is validated against the same
    * bound with an actionable error. |V| comes off the degree table
    * the algorithm aggregates anyway (one count on a checkpointed
    * |V|-row frame).
    *
    * Per iteration: one join of the materialized edge list with the
    * rank table (node-keyed; the edge side is pre-partitioned and
    * pre-sorted on the key, so only the |V|-row rank table exchanges),
    * one map-side-combined sum to the receiving node, one left join
    * back to the node table for isolated-in-round nodes. Ranks are
    * checkpointed every TWO iterations — the rank table is |V| rows,
    * so chaining a second update inside the same job halves the
    * per-job fixed cost that dominates small-round iterative ops,
    * while lineage depth stays bounded at 2. Driver state: zero rows.
    *
    * Returns `(node, rank)`; a rank of `scale` is the uniform prior.
    */
  def pageRank(
      edges: DataFrame,
      iters: Int,
      srcCol: String = "a",
      dstCol: String = "b",
      scale: Long = 0L,
      canonical: Boolean = false): DataFrame = {
    require(iters >= 0 && (scale == 0L || scale >= 100),
      s"need iters >= 0 and scale 0 (auto) or >= 100, got $iters, $scale")
    val canon =
      if (canonical) edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      else canonicalize(edges, srcCol, dstCol)
    val sym = symmetrizeForJoins(canon)
    val degrees = sym
      .groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    // worst case one node receives the entire rank mass |V|*scale, then
    // multiplies by 85: keep 85 * |V| * scale inside Long
    val nV = math.max(degrees.count(), 1L)
    val maxScale = Long.MaxValue / 85L / nV
    val effScale =
      if (scale > 0L) {
        require(scale <= maxScale,
          s"pageRank fixed-point overflow: 85 * |V| * scale = " +
            s"85 * $nV * $scale exceeds Long; pass scale <= $maxScale " +
            s"(or scale = 0 to derive it)")
        scale
      } else {
        var s = 1000000000000L
        while (s > maxScale) s /= 10L
        require(s >= 100L,
          s"graph too large for Long fixed-point PageRank: |V| = $nV " +
            s"admits scale <= $maxScale (< the 100 minimum)")
        s
      }
    val base = effScale * 15L / 100L
    var ranks = degrees.withColumn("r", lit(effScale))
    def step(prev: DataFrame): DataFrame = {
      val contrib = sym
        .join(prev.select(col("node").as("src"), col("deg"), col("r")), "src")
        .select(col("dst"), expr("r DIV deg").as("share"))
        .groupBy("dst")
        .agg(sum("share").as("c"))
      prev
        .select("node", "deg")
        .join(contrib.select(col("dst").as("node"), col("c")), Seq("node"), "left")
        .select(col("node"), col("deg"),
          (lit(base) + expr("(85 * coalesce(c, 0L)) DIV 100")).as("r"))
    }
    // each new anchor frees the superseded rank table's blocks (and,
    // once the first anchor lands, the degree table the initial ranks
    // derived from) — only the LATEST |V|-row state stays resident
    var anchored: DataFrame = null
    var remaining = iters
    while (remaining > 0) {
      val chunk = math.min(2, remaining)
      ranks = (1 to chunk).foldLeft(ranks)((r, _) => step(r))
        .localCheckpoint(true)
      if (anchored ne null) Blocks.drop(anchored) else Blocks.drop(degrees)
      anchored = ranks
      remaining -= chunk
    }
    if (anchored ne null) Blocks.drop(sym)
    ranks.select(col("node"), col("r").as("rank"))
  }

  /** Deterministic random walks — the positive-pair generator for
    * graph-embedding training (DeepWalk/node2vec-style), reproducible
    * bit-for-bit on any engine: one walk per node, `steps` hops, the
    * neighbor at each hop chosen by MIN sha-derived hash of
    * `(seed, walk, step, neighbor)`.
    *
    * The choice is a map-side-combinable `min` over the candidate
    * neighbors — never a window or an indexed adjacency list, so a
    * hub's neighborhood streams through partial aggregation instead of
    * buffering in one task, and re-running any subset of partitions
    * picks the same neighbor. The expensive sha runs ONCE per
    * (walk, step) on the frontier — per-candidate scoring is the
    * universal hash `((h1+1) * (dst + 40503)) mod (2^31 - 1)` over
    * that per-step seed, pure integer ops on the |frontier| × degree
    * candidate stream (hashing per candidate instead was 40× the sha
    * volume and ~2× the wall-clock at sf0.1). Ties are impossible by
    * construction: the sub-2^31 score is packed with the neighbor id
    * into one Long (`score * 2^32 + dst`), which also keeps the
    * packing overflow-free for node ids < 2^32 (guarded).
    *
    * Returns `(walk_id, path)` — walk_id the start node, path the
    * comma-joined node sequence (steps+1 entries; connected inputs
    * always have a next hop, so no walk strands early).
    */
  def randomWalks(
      edges: DataFrame,
      steps: Int,
      seed: Long,
      srcCol: String = "a",
      dstCol: String = "b",
      canonical: Boolean = false): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val canon =
      if (canonical) edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      else canonicalize(edges, srcCol, dstCol)
    val sym = symmetrizeForJoins(canon)
    var state = sym
      .select(col("src").as("walk_id"))
      .distinct()
      .select(col("walk_id"), col("walk_id").as("cur"),
        col("walk_id").cast("string").as("path"))
    // one sha per frontier row; candidates score with integer ops.
    // The candidate stream (|frontier| × degree rows — the dominant
    // shuffle) carries ONLY (walk_id, packed score): the growing
    // path string stays out of it and re-attaches afterwards through
    // a walk_id-co-partitioned |V|-row join (both sides already hash
    // on walk_id, so the attach is exchange-free). Before this split
    // every candidate row duplicated the path and the per-step agg
    // dragged max(path) through its hash map — measurably the walk
    // suite's whole shuffle-volume budget at 10× data.
    def hop(st: DataFrame, k: Int): DataFrame = {
      val h1 = conv(substring(sha2(concat_ws(":",
        lit(seed), col("walk_id"), lit(k)), 256), 1, 7), 16, 10)
        .cast("long")
      val score = ((col("__h1") + lit(1L)) * (col("dst") + lit(40503L))) %
        lit(2147483647L)
      val chosen = st
        .select(col("walk_id"), col("cur"))
        .withColumn("__h1", h1)
        .join(sym, col("cur") === sym("src"))
        .select(col("walk_id"),
          when(col("dst") < lit(4294967296L),
            score * lit(4294967296L) + col("dst"))
            .otherwise(raise_error(
              lit("randomWalks: node id >= 2^32 breaks hash packing")))
            .as("score"))
        .groupBy("walk_id")
        .agg(min("score").as("score"))
        .select(col("walk_id"),
          (col("score") % lit(4294967296L)).as("next"))
      st.join(chosen, "walk_id")
        .select(col("walk_id"), col("next").as("cur"),
          concat_ws(",", col("path"), col("next")).as("path"))
    }
    // ONE hop per eager localCheckpoint: unlike pageRank (whose
    // cheap |V|-row step makes 2-per-job chunking a win), a walk hop
    // reads its input state TWICE (choose + attach), so chaining a
    // second hop un-anchored re-executes the first hop's candidate
    // join — measured slower than paying the extra job. Each new
    // anchor frees the superseded one's storage blocks — without
    // that, `steps` copies of the walk state sit in the block manager
    // for the whole query (the r15 floor breach on this operator).
    var anchored: DataFrame = null
    for (k <- 1 to steps) {
      state = hop(state, k).localCheckpoint(true)
      if (anchored ne null) Blocks.drop(anchored)
      anchored = state
    }
    Blocks.drop(sym)
    state.select(col("walk_id"), col("path"))
  }
}
