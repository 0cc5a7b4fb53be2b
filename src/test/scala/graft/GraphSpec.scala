package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*): DataFrame =
    pairs.toDF("a", "b")

  private def triMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // ------------------------------------------------------------ canonical

  test("canonicalize orders endpoints, drops self-loops and dups") {
    val c = Graph.canonicalize(
      edges((2L, 1L), (1L, 2L), (3L, 3L), (2L, 3L)), "a", "b")
      .as[(Long, Long)].collect().toSet
    assert(c == Set((1L, 2L), (2L, 3L)))
  }

  test("triangles are invariant under edge direction and duplication") {
    val clean = triMap(Graph.triangles(edges((1L, 2L), (2L, 3L), (1L, 3L))))
    val messy = triMap(Graph.triangles(
      edges((2L, 1L), (1L, 2L), (3L, 2L), (1L, 3L), (3L, 1L), (2L, 2L))))
    assert(clean == messy && clean == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  // ------------------------------------------------------------ triangles

  test("K4: every node is on 3 triangles; path and star have none") {
    val k4 = triMap(Graph.triangles(edges(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)), canonical = true))
    assert(k4 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(Graph.triangles(edges((1L, 2L), (2L, 3L), (3L, 4L))).count() == 0)
    assert(Graph.triangles(edges((1L, 2L), (1L, 3L), (1L, 4L))).count() == 0)
  }

  test("two triangles sharing an edge count the shared nodes twice") {
    // 1-2-3 and 2-3-4 share edge 2-3
    val m = triMap(Graph.triangles(edges(
      (1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)), canonical = true))
    assert(m == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("triangle counts match a brute-force check on a random graph") {
    val rnd = new scala.util.Random(7)
    val es = Seq.fill(200)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val expected = es.flatMap { case (a, b) =>
      (adj(a) & adj(b)).toSeq.map(c => Seq(a, b, c).sorted)
    }.distinct.flatten.groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    assert(triMap(Graph.triangles(edges(es: _*), canonical = true)) == expected)
  }

  // ------------------------------------------------------------ k-core

  test("3-core of K4 plus a pendant chain is exactly the K4") {
    val g = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L))
    val core = triMap(Graph.kcore(g, k = 3, canonical = true))
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("a chain peels away round by round; under-budget rounds truncate deterministically") {
    // path 1-2-3-4-5-6: 2-core is empty, one endpoint layer per round
    val path = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    assert(Graph.kcore(path, k = 2, canonical = true).count() == 0)
    // after exactly ONE round only the endpoints are gone
    val one = triMap(Graph.kcore(path, k = 2, maxRounds = 1, canonical = true))
    assert(one.keySet == Set(2L, 3L, 4L, 5L))
    // a converged run equals any larger budget
    val a = triMap(Graph.kcore(path, k = 2, maxRounds = 8, canonical = true))
    val b = triMap(Graph.kcore(path, k = 2, maxRounds = 100, canonical = true))
    assert(a == b)
  }

  test("k=1 core keeps every non-isolated node with its degree") {
    val g = edges((1L, 2L), (2L, 3L), (4L, 5L))
    val m = triMap(Graph.kcore(g, k = 1, canonical = true))
    assert(m == Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  // ------------------------------------------------------------ pagerank

  test("any regular graph is a fixed point: every rank stays at scale") {
    // K3 (2-regular) and C4 (2-regular)
    for (g <- Seq(
        edges((1L, 2L), (1L, 3L), (2L, 3L)),
        edges((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)))) {
      val r = Graph.pageRank(g, iters = 5, canonical = true)
        .as[(Long, Long)].collect().toMap
      assert(r.values.toSet == Set(1000000000000L), r.toString)
    }
  }

  test("pageRank matches an in-memory integer reference on a random graph") {
    val rnd = new scala.util.Random(11)
    val es = Seq.fill(120)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val scale = 1000000000000L
    var r = adj.keys.map(_ -> scale).toMap
    for (_ <- 0 until 4) {
      val contrib = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((u, ns) <- adj; share = r(u) / ns.size; v <- ns)
        contrib(v) += share
      r = adj.keys.map(u => u -> (scale * 15L / 100L + 85L * contrib(u) / 100L)).toMap
    }
    val got = Graph.pageRank(edges(es: _*), iters = 4, canonical = true)
      .as[(Long, Long)].collect().toMap
    assert(got == r)
  }

  test("|V| > 1e5 derives a smaller scale instead of overflowing") {
    // ring of 120k nodes: 85 * |V| * 1e12 would blow past 2^63, so the
    // auto-scale drops to 1e11 (the largest power of ten fitting) and
    // the run completes; a 2-regular ring is a fixed point, so every
    // rank must sit exactly at the derived scale after the iterations
    val n = 120000L
    val ring = spark.range(n).selectExpr("id AS a", "(id + 1) % 120000 AS b")
    val r = Graph.pageRank(ring, iters = 2, canonical = true)
      .agg(org.apache.spark.sql.functions.min("rank"),
        org.apache.spark.sql.functions.max("rank"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)))
      .as[(Long, Long, Long)].collect().head
    assert(r == ((100000000000L, 100000000000L, n)), r.toString)
    // an explicit out-of-range scale is rejected with guidance, not a
    // mid-job ANSI overflow
    val e = intercept[IllegalArgumentException] {
      Graph.pageRank(ring, iters = 1, scale = 1000000000000L, canonical = true)
    }
    assert(e.getMessage.contains("scale <="), e.getMessage)
  }

  // ------------------------------------------------------------ walks

  test("walks start everywhere, have steps+1 hops, and follow edges") {
    val rnd = new scala.util.Random(5)
    val es = Seq.fill(80)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val edgeSet = es.toSet
    val walks = Graph.randomWalks(edges(es: _*), steps = 4, seed = 9L, canonical = true)
      .as[(Long, String)].collect().toMap
    val nodes = es.flatMap { case (a, b) => Seq(a, b) }.toSet
    assert(walks.keySet == nodes)
    for ((start, path) <- walks) {
      val hops = path.split(",").map(_.toLong).toSeq
      assert(hops.length == 5 && hops.head == start, path)
      hops.sliding(2).foreach { case Seq(x, y) =>
        assert(edgeSet(math.min(x, y) -> math.max(x, y)), s"$x-$y not an edge")
      }
    }
  }

  test("walks are deterministic, and the seed actually matters") {
    val g = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val a = Graph.randomWalks(g, 6, seed = 1L, canonical = true)
      .as[(Long, String)].collect().toMap
    val b = Graph.randomWalks(g, 6, seed = 1L, canonical = true)
      .as[(Long, String)].collect().toMap
    val c = Graph.randomWalks(g, 6, seed = 2L, canonical = true)
      .as[(Long, String)].collect().toMap
    assert(a == b)
    assert(a != c, "different seeds should diverge somewhere on this graph")
  }

  test("a single edge forces a strict alternation") {
    val m = Graph.randomWalks(edges((1L, 2L)), 3, seed = 0L, canonical = true)
      .as[(Long, String)].collect().toMap
    assert(m == Map(1L -> "1,2,1,2", 2L -> "2,1,2,1"))
  }

  test("node ids past 2^32 fail loudly instead of corrupting the packing") {
    val big = edges((4294967296L, 1L))
    val e = intercept[Exception] {
      Graph.randomWalks(big, 1, seed = 0L).collect()
    }
    assert(e.getMessage != null)
  }

  test("higher-degree hubs outrank leaves after one iteration of a star") {
    val star = edges((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    val r = Graph.pageRank(star, iters = 1, canonical = true)
      .as[(Long, Long)].collect().toMap
    assert(r(1L) > r(2L) && r(2L) == r(3L) && r(3L) == r(4L) && r(4L) == r(5L))
    // hub absorbs all four full shares: 0.15 + 0.85*4 of scale
    assert(r(1L) == 150000000000L + 85L * 4000000000000L / 100L)
    // each leaf gets a quarter share of the hub
    assert(r(2L) == 150000000000L + 85L * 250000000000L / 100L)
  }

  // ------------------------------------------------------------ hygiene

  test("iterative ops free every superseded checkpoint's blocks") {
    // contract behind the r15 q_graph_walks floor breach: a k-round
    // loop must hold ONE running state in the block manager, not k.
    // Each op runs, collects, then releases its result's own anchors
    // via Blocks.drop — after which NO persisted RDD the op created
    // may remain registered (unpersist updates the registry
    // synchronously even with blocking = false).
    import graft.operators.{Blocks, ConnectedComponents, Graph}
    val sc = spark.sparkContext
    def residual(run: => DataFrame): Int = {
      val before = sc.getPersistentRDDs.keySet
      val out = run
      out.collect()
      Blocks.drop(out)
      (sc.getPersistentRDDs.keySet -- before).size
    }
    val rnd = new scala.util.Random(11)
    val es = Seq.fill(150)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val g = edges(es: _*)
    assert(residual(Graph.randomWalks(g, 5, seed = 3L, canonical = true)) == 0)
    assert(residual(Graph.pageRank(g, 5, canonical = true)) == 0)
    assert(residual(Graph.kcore(g, 2, canonical = true)) == 0)
    assert(residual(Graph.triangles(g, canonical = true)) == 0)
    assert(residual(ConnectedComponents.resolve(g, "a", "b")) == 0)
    assert(residual(ConnectedComponents.resolveStars(g, "a", "b")) == 0)
  }
}
