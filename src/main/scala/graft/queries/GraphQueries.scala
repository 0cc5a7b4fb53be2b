package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Queries.t
import graft.operators.Graph

/** Split from the monolithic Queries.scala registry (round 11);
  * registered via [[graft.Queries.all]], oracled via [[graft.Queries.oracles]].
  */
object GraphQueries {

  /** The shared graph fixture: the co-order part graph — parts linked
    * when some order contains both. Canonical by construction
    * (`a < b` + distinct), ~116k edges at sf0.01. The self-join's two
    * sides are the same subplan, so the scan and its exchange are
    * planned once and reused. (An array-fold build — collect each
    * order's part set, explode its pairs — was tried and REVERTED:
    * isolated quiet-machine benches showed it 2× slower end-to-end on
    * the walk workload, the object-heavy collect_set + nested-array
    * explode losing to the codegen'd sort-merge self-join.)
    */
  private[graft] def coOrderEdges(s: SparkSession, dir: String): DataFrame = {
    // repartition by the join key BEFORE the self-join (guide §2.5,
    // input skew): without it Spark broadcast-hash-joins the
    // (estimated-small) scan, and the broadcast BUILD is a serial
    // re-scan of the fixture file whose row-group layout caps it at 3
    // tasks — one carrying almost all bytes — profiled at 1.25 s
    // serial inside every graph query's first job. Behind the
    // exchange the build reads the shuffle at full parallelism, AQE
    // reuses the one exchange for both self-join sides, and a forced
    // sort-merge alternative measured slower (family 15.9 s vs
    // 17.4 s isolated min-of-3) — the adjudicated shape is
    // repartition + broadcast.
    val li = t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
      .repartition(col("l_orderkey"))
    li.as("x")
      .join(li.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      .distinct()
  }

  private[graft] val coOrderEdgesSql: String =
    """  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey""".stripMargin

  /** Per-node triangle counts over the co-order graph
    * ([[graft.operators.Graph.triangles]], degree-oriented — wedge
    * width O(sqrt E), hub-safe). Integer-exact, so the oracle is the
    * same construction replayed in SQL.
    */
  def graphTriangles(s: SparkSession, dir: String): DataFrame =
    Graph.triangles(coOrderEdges(s, dir), canonical = true)

  val graphTrianglesSql: String =
    s"""WITH canon AS (
      |$coOrderEdgesSql),
      |deg AS (
      |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
      |    SELECT a AS node FROM canon UNION ALL SELECT b FROM canon)
      |  GROUP BY node),
      |oriented AS (
      |  SELECT CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN e.a ELSE e.b END AS src,
      |         CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN e.b ELSE e.a END AS dst,
      |         CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN db.deg ELSE da.deg END AS ddeg
      |  FROM canon e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b),
      |wedge AS (
      |  SELECT CASE WHEN (o1.ddeg, o1.dst) < (o2.ddeg, o2.dst) THEN o1.dst ELSE o2.dst END AS v,
      |         CASE WHEN (o1.ddeg, o1.dst) < (o2.ddeg, o2.dst) THEN o2.dst ELSE o1.dst END AS w,
      |         o1.src AS u
      |  FROM oriented o1 JOIN oriented o2 ON o1.src = o2.src AND o1.dst < o2.dst),
      |tri AS (
      |  SELECT wg.u, wg.v, wg.w FROM wedge wg
      |  JOIN oriented o ON o.src = wg.v AND o.dst = wg.w)
      |SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
      |  SELECT u AS node FROM tri UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri)
      |GROUP BY node""".stripMargin

  /** 64-core of the co-order graph ([[graft.operators.Graph.kcore]]).
    * Peeling is monotone and synchronous, so "at most 8 rounds" is
    * engine-portable whether or not the fixpoint lands inside the
    * budget: the oracle's recursion runs the SAME 8 peels (a converged
    * set just re-emits itself).
    */
  def graphKcore(s: SparkSession, dir: String): DataFrame =
    Graph.kcore(coOrderEdges(s, dir), k = 64, maxRounds = 8, canonical = true)

  val graphKcoreSql: String =
    s"""WITH RECURSIVE canon AS (
      |$coOrderEdgesSql),
      |sym AS (SELECT a AS src, b AS dst FROM canon
      |        UNION ALL SELECT b, a FROM canon),
      |alive(i, src, dst) AS (
      |  SELECT 0, src, dst FROM sym
      |  UNION ALL
      |  SELECT i + 1, src, dst FROM (
      |    SELECT i, src, dst,
      |      count(*) OVER (PARTITION BY i, src) AS dsrc,
      |      count(*) OVER (PARTITION BY i, dst) AS ddst
      |    FROM alive WHERE i < 8)
      |  WHERE dsrc >= 64 AND ddst >= 64)
      |SELECT src AS node, CAST(count(*) AS BIGINT) AS core_degree
      |FROM alive WHERE i = 8 GROUP BY src""".stripMargin

  /** 4 iterations of deterministic fixed-point PageRank over the
    * co-order graph ([[graft.operators.Graph.pageRank]]): all-Long
    * floor arithmetic, so ranks are bit-identical across engines —
    * no floating-point fold order anywhere. The oracle unrolls the
    * same four synchronous updates.
    */
  def graphPageRank(s: SparkSession, dir: String): DataFrame =
    Graph.pageRank(coOrderEdges(s, dir), iters = 4, canonical = true)

  val graphPageRankSql: String = {
    val step = (i: Int, j: Int) =>
      s"""r$j AS (
        |  SELECT d.node, d.deg,
        |    CAST(150000000000 + (85 * coalesce(s.c, 0)) // 100 AS BIGINT) AS r
        |  FROM deg d LEFT JOIN (
        |    SELECT e.dst, sum(p.r // p.deg) AS c
        |    FROM sym e JOIN r$i p ON p.node = e.src GROUP BY e.dst) s
        |  ON s.dst = d.node)""".stripMargin
    s"""WITH canon AS (
      |$coOrderEdgesSql),
      |sym AS (SELECT a AS src, b AS dst FROM canon
      |        UNION ALL SELECT b, a FROM canon),
      |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
      |        FROM sym GROUP BY src),
      |r0 AS (SELECT node, deg, CAST(1000000000000 AS BIGINT) AS r FROM deg),
      |${(0 until 4).map(i => step(i, i + 1)).mkString(",\n")}
      |SELECT node, r AS rank FROM r4""".stripMargin
  }

  /** Deterministic random walks over the co-order graph
    * ([[graft.operators.Graph.randomWalks]]): 4 hops from every node,
    * next hop = min universal-hash score over the neighbors, seeded by
    * one sha per (walk, step) — a map-side `min`, no window, no
    * indexed adjacency. Bit-identical on any engine; the oracle
    * unrolls the same four hops.
    */
  def graphWalks(s: SparkSession, dir: String): DataFrame =
    Graph.randomWalks(coOrderEdges(s, dir), steps = 4, seed = 7L, canonical = true)

  val graphWalksSql: String = {
    val step = (i: Int, j: Int) =>
      s"""w$j AS (
        |  SELECT walk_id,
        |    CAST(min(sc * 4294967296 + e.dst) % 4294967296 AS BIGINT) AS cur,
        |    max(path) || ',' ||
        |      CAST(CAST(min(sc * 4294967296 + e.dst) % 4294967296 AS BIGINT) AS VARCHAR) AS path
        |  FROM (
        |    SELECT w.walk_id, w.path, e.dst,
        |      ((CAST(('0x' || substr(sha256(
        |          '7:' || CAST(w.walk_id AS VARCHAR) || ':$j'),
        |          1, 7)) AS BIGINT) + 1) * (e.dst + 40503)) % 2147483647 AS sc
        |    FROM w$i w JOIN sym e ON e.src = w.cur) e
        |  GROUP BY walk_id)""".stripMargin
    s"""WITH canon AS (
      |$coOrderEdgesSql),
      |sym AS (SELECT a AS src, b AS dst FROM canon
      |        UNION ALL SELECT b, a FROM canon),
      |w0 AS (SELECT DISTINCT src AS walk_id, src AS cur,
      |         CAST(src AS VARCHAR) AS path FROM sym),
      |${(0 until 4).map(i => step(i, i + 1)).mkString(",\n")}
      |SELECT walk_id, path FROM w4""".stripMargin
  }
}
