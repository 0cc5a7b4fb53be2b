package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Queries.t
import graft.operators.SimilaritySearch

/** Split from the monolithic Queries.scala registry (round 11);
  * registered via [[graft.Queries.all]], oracled via [[graft.Queries.oracles]].
  */
object SimsearchQueries {

  /** Brute-force exact cosine top-k (query set broadcast). */
  def simsearchTopK(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    SimilaritySearch.bruteForceTopK(
      e.filter(col("vec_id") < 10), e, "vec_id", "embedding", k = 5)
      .withColumn("rank", col("rank").cast("long"))
  }

  val simsearchTopKSql: String =
    """WITH n AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                   CAST(embedding AS DOUBLE[])))) AS nv
      |  FROM embeddings),
      |q AS (SELECT vec_id AS query_id, nv AS qv FROM n WHERE vec_id < 10),
      |c AS (SELECT vec_id AS neighbor_id, nv AS cv FROM n),
      |scored AS (SELECT query_id, neighbor_id,
      |  round(list_dot_product(qv, cv), 6) AS cos_sim
      |  FROM q, c WHERE query_id <> neighbor_id),
      |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |  ORDER BY cos_sim DESC, neighbor_id) AS rn FROM scored)
      |SELECT query_id, neighbor_id, cos_sim, rn AS rank FROM ranked WHERE rn <= 5""".stripMargin

  /** Margin-kNN bitext mining ([[SimilaritySearch.mineBitext]]): the
    * label-parity halves of the embedding table stand in for the two
    * language sides; candidate pairs come from the LSH bucket join
    * (both sides corpus-scale — never all-pairs), mined pairs are
    * mutual margin-bests with the k=4 neighborhood criterion. The
    * margin's neighborhood sums accumulate 6-dp-rounded cosines as
    * DECIMAL(18,6), so the DuckDB replay — same sha-256-derived
    * planes, same bucket labels, same windows — is exact.
    */
  def bitextMine(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    SimilaritySearch.mineBitext(
      e.filter(col("label") % 2 === 0), e.filter(col("label") % 2 === 1),
      "vec_id", "embedding", k = 4)
  }

  /** numBits = 8, numTables = 2, seeds 42 + t*7919 — keep in sync with
    * [[graft.operators.SimilaritySearch.mineBitext]] defaults.
    */
  val bitextMineSql: String =
    """WITH n AS (SELECT vec_id, label,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |    v -> v / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                   CAST(embedding AS DOUBLE[])))) AS nv
      |  FROM embeddings
      |  WHERE sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |             CAST(embedding AS DOUBLE[]))) > 0),
      |d AS (SELECT max(len(nv)) AS dim FROM n),
      |planes AS (
      |  SELECT tt.t AS t, bb.b AS b,
      |    list_transform(range(0, d.dim), j ->
      |      CAST(('0x' || substr(sha256(
      |          'srp:' || CAST(42 + tt.t * 7919 AS VARCHAR) || ':' ||
      |          CAST(bb.b AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 8)) AS BIGINT)
      |        / 2147483648.0 - 1.0) AS prow
      |  FROM range(0, 2) AS tt(t) CROSS JOIN range(0, 8) AS bb(b) CROSS JOIN d),
      |sigs AS (
      |  SELECT n.vec_id, n.label, p.t,
      |    CAST(sum(CASE WHEN list_dot_product(n.nv, p.prow) >= 0
      |      THEN CAST(power(2, p.b) AS BIGINT) ELSE 0 END) AS BIGINT) AS sig
      |  FROM n CROSS JOIN planes p GROUP BY n.vec_id, n.label, p.t),
      |bkt AS (SELECT vec_id, label,
      |    CAST(t AS VARCHAR) || ':' || CAST(sig AS VARCHAR) AS bucket FROM sigs),
      |scored AS (SELECT DISTINCT xb.vec_id AS x_id, yb.vec_id AS y_id,
      |    round(list_dot_product(xn.nv, yn.nv), 6) AS cos_sim
      |  FROM (SELECT * FROM bkt WHERE label % 2 = 0) xb
      |  JOIN (SELECT * FROM bkt WHERE label % 2 = 1) yb USING (bucket)
      |  JOIN n xn ON xb.vec_id = xn.vec_id
      |  JOIN n yn ON yb.vec_id = yn.vec_id),
      |fwd AS (SELECT *, row_number() OVER (PARTITION BY x_id
      |  ORDER BY cos_sim DESC, y_id) AS rn FROM scored),
      |bwd AS (SELECT *, row_number() OVER (PARTITION BY y_id
      |  ORDER BY cos_sim DESC, x_id) AS rn FROM scored),
      |ax AS (SELECT x_id, sum(CAST(cos_sim AS DECIMAL(18,6))) AS x_sum,
      |  count(*) AS x_n FROM fwd WHERE rn <= 4 GROUP BY 1),
      |ay AS (SELECT y_id, sum(CAST(cos_sim AS DECIMAL(18,6))) AS y_sum,
      |  count(*) AS y_n FROM bwd WHERE rn <= 4 GROUP BY 1),
      |cand AS (SELECT f.x_id, f.y_id, f.cos_sim,
      |    round(f.cos_sim / ((CAST(ax.x_sum AS DOUBLE) / ax.x_n +
      |      CAST(ay.y_sum AS DOUBLE) / ay.y_n) / 2.0), 6) AS margin
      |  FROM fwd f JOIN ax USING (x_id) JOIN ay USING (y_id)
      |  WHERE f.rn <= 4),
      |-- minMargin = 0.0 applies BEFORE the mutual windows (a below-
      |-- threshold candidate cannot win an endpoint), mirroring mineBitext
      |thresholded AS (SELECT * FROM cand WHERE margin >= 0.0),
      |besty AS (SELECT *, row_number() OVER (PARTITION BY x_id
      |  ORDER BY margin DESC, y_id) AS ry FROM thresholded),
      |bestx AS (SELECT *, row_number() OVER (PARTITION BY y_id
      |  ORDER BY margin DESC, x_id) AS rx FROM besty WHERE ry = 1)
      |SELECT x_id, y_id, cos_sim, margin FROM bestx WHERE rx = 1""".stripMargin

  /** IVF (inverted-file) ANN with an UNTRAINED quantizer (iters=0):
    * centroids are the normalized vectors of the k smallest ids, so —
    * unlike the Lloyd-trained model, whose float cluster means depend
    * on aggregation order — every step (assignment, probing, scoring,
    * top-k) is deterministic and replayable in DuckDB. The trained
    * model is covered by IvfIndexSpec's recall-vs-brute-force gate;
    * this query hash-verifies the SEARCH machinery: cell assignment,
    * nprobe pruning, the cell equi-join (no all-pairs stage), and the
    * bounded top-k aggregator.
    */
  def simsearchIvf(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val model = graft.operators.IvfIndex.train(e, "vec_id", "embedding", k = 16, iters = 0)
    graft.operators.IvfIndex.search(
      e.filter(col("vec_id") < 10), e, "vec_id", "embedding", model,
      kNeighbors = 5, nprobe = 4)
      .withColumn("rank", col("rank").cast("long"))
  }

  /** DuckDB replay: same centroid choice (k=16 smallest vec_ids,
    * L2-normalized), same nearest-cell rule (max dot, ties to the
    * lowest cell), same nprobe=4 probe set, same candidate scoring
    * restricted to probed cells, same (cos_sim desc, neighbor_id) top-5.
    * `list_dot_product` matches Spark's sequential fold bit-for-bit.
    */
  val simsearchIvfSql: String =
    """WITH n AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                   CAST(embedding AS DOUBLE[])))) AS nv
      |  FROM embeddings),
      |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, nv AS cv
      |  FROM n ORDER BY vec_id LIMIT 16),
      |assigned AS (SELECT n.vec_id, n.nv,
      |    (SELECT c.cell FROM cent c
      |     ORDER BY list_dot_product(n.nv, c.cv) DESC, c.cell LIMIT 1) AS cell
      |  FROM n),
      |q AS (SELECT vec_id AS query_id, nv AS qv FROM n WHERE vec_id < 10),
      |probes AS (SELECT q.query_id, q.qv, p.cell
      |  FROM q, LATERAL (SELECT c.cell FROM cent c
      |    ORDER BY list_dot_product(q.qv, c.cv) DESC, c.cell LIMIT 4) p),
      |scored AS (SELECT p.query_id, a.vec_id AS neighbor_id,
      |    round(list_dot_product(p.qv, a.nv), 6) AS cos_sim
      |  FROM probes p JOIN assigned a ON p.cell = a.cell
      |  WHERE a.vec_id <> p.query_id),
      |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |  ORDER BY cos_sim DESC, neighbor_id) AS rn FROM scored)
      |SELECT query_id, neighbor_id, cos_sim, CAST(rn AS BIGINT) AS rank
      |FROM ranked WHERE rn <= 5""".stripMargin

  /** Product-quantization ADC search ([[graft.operators.PqIndex]]):
    * m=4 subspaces × 16 codewords over the 64-dim embeddings — each
    * candidate scored through the query's LUT, never its raw vector.
    * At iters=0 the codebooks are the subvectors of the 16 smallest
    * ids, so encode (argmin of `dot(c,c) - 2·dot(v,c)`, ties to the
    * low code) and the fixed-order 4-term ADC sum replay exactly in
    * DuckDB; trained-codebook recall is spec-gated (PqIndexSpec), the
    * same split as IVF.
    */
  def simsearchPq(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.PqIndex
    val e = t(s, dir, "embeddings")
    val model = PqIndex.train(e, "vec_id", "embedding", m = 4, ksub = 16, iters = 0)
    val codes = PqIndex.encode(e, "vec_id", "embedding", model)
    PqIndex.search(e.filter(col("vec_id") < 10), codes,
      "vec_id", "embedding", model, kNeighbors = 5)
      .withColumn("rank", col("rank").cast("long"))
  }

  val simsearchPqSql: String =
    """WITH n AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                   CAST(embedding AS DOUBLE[])))) AS nv
      |  FROM embeddings),
      |seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, nv
      |  FROM n ORDER BY vec_id LIMIT 16),
      |cb AS (SELECT s.s, seeds.code,
      |    seeds.nv[s.s*16+1 : s.s*16+16] AS cv
      |  FROM seeds, (SELECT unnest(range(0, 4)) AS s) s),
      |enc AS (SELECT n.vec_id,
      |  (SELECT c.code FROM cb c WHERE c.s = 0
      |   ORDER BY list_dot_product(c.cv, c.cv) - 2*list_dot_product(n.nv[1:16], c.cv), c.code
      |   LIMIT 1) AS code0,
      |  (SELECT c.code FROM cb c WHERE c.s = 1
      |   ORDER BY list_dot_product(c.cv, c.cv) - 2*list_dot_product(n.nv[17:32], c.cv), c.code
      |   LIMIT 1) AS code1,
      |  (SELECT c.code FROM cb c WHERE c.s = 2
      |   ORDER BY list_dot_product(c.cv, c.cv) - 2*list_dot_product(n.nv[33:48], c.cv), c.code
      |   LIMIT 1) AS code2,
      |  (SELECT c.code FROM cb c WHERE c.s = 3
      |   ORDER BY list_dot_product(c.cv, c.cv) - 2*list_dot_product(n.nv[49:64], c.cv), c.code
      |   LIMIT 1) AS code3
      |  FROM n),
      |q AS (SELECT vec_id AS query_id, nv FROM n WHERE vec_id < 10),
      |scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,
      |    round(list_dot_product(q.nv[1:16],  cb0.cv)
      |        + list_dot_product(q.nv[17:32], cb1.cv)
      |        + list_dot_product(q.nv[33:48], cb2.cv)
      |        + list_dot_product(q.nv[49:64], cb3.cv), 6) AS score
      |  FROM q, enc e
      |  JOIN cb cb0 ON cb0.s = 0 AND cb0.code = e.code0
      |  JOIN cb cb1 ON cb1.s = 1 AND cb1.code = e.code1
      |  JOIN cb cb2 ON cb2.s = 2 AND cb2.code = e.code2
      |  JOIN cb cb3 ON cb3.s = 3 AND cb3.code = e.code3
      |  WHERE e.vec_id <> q.query_id),
      |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |  ORDER BY score DESC, neighbor_id) AS rn FROM scored)
      |SELECT query_id, neighbor_id, score, CAST(rn AS BIGINT) AS rank
      |FROM ranked WHERE rn <= 5""".stripMargin

  /** IVF-PQ composed search ([[graft.operators.IvfPq]]): coarse cells
    * prune the corpus, residual PQ codes compress it, ADC scores
    * decompose as centroid term + LUT sum. At iters=0 both quantizers
    * are deterministic functions of the 16 smallest ids, so DuckDB
    * replays assignment, residuals, encoding and the parenthesized
    * score sum exactly; trained behavior is gated by IvfPqSpec
    * (residual coding must beat raw PQ at equal bits).
    */
  def simsearchIvfPq(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.IvfPq
    val e = t(s, dir, "embeddings")
    val model = IvfPq.train(e, "vec_id", "embedding",
      kCells = 16, m = 4, ksub = 16, itersIvf = 0, itersPq = 0)
    val idx = IvfPq.index(e, "vec_id", "embedding", model)
    IvfPq.search(e.filter(col("vec_id") < 10), idx,
      "vec_id", "embedding", model, kNeighbors = 5, nprobe = 4)
      .withColumn("rank", col("rank").cast("long"))
  }

  val simsearchIvfPqSql: String =
    """WITH n AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                   CAST(embedding AS DOUBLE[])))) AS nv
      |  FROM embeddings),
      |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, nv AS cv
      |  FROM n ORDER BY vec_id LIMIT 16),
      |assigned AS (SELECT n.vec_id, n.nv,
      |    (SELECT c.cell FROM cent c
      |     ORDER BY list_dot_product(n.nv, c.cv) DESC, c.cell LIMIT 1) AS cell
      |  FROM n),
      |res AS (SELECT a.vec_id, a.cell,
      |    list_transform(range(1, 65), i -> a.nv[i] - c.cv[i]) AS rv
      |  FROM assigned a JOIN cent c ON c.cell = a.cell),
      |seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, rv
      |  FROM res ORDER BY vec_id LIMIT 16),
      |cb AS (SELECT s.s, seeds.code,
      |    seeds.rv[s.s*16+1 : s.s*16+16] AS cv
      |  FROM seeds, (SELECT unnest(range(0, 4)) AS s) s),
      |enc AS (SELECT r.vec_id, r.cell,
      |  (SELECT c.code FROM cb c WHERE c.s = 0
      |   ORDER BY list_dot_product(c.cv, c.cv) - 2*list_dot_product(r.rv[1:16], c.cv), c.code
      |   LIMIT 1) AS code0,
      |  (SELECT c.code FROM cb c WHERE c.s = 1
      |   ORDER BY list_dot_product(c.cv, c.cv) - 2*list_dot_product(r.rv[17:32], c.cv), c.code
      |   LIMIT 1) AS code1,
      |  (SELECT c.code FROM cb c WHERE c.s = 2
      |   ORDER BY list_dot_product(c.cv, c.cv) - 2*list_dot_product(r.rv[33:48], c.cv), c.code
      |   LIMIT 1) AS code2,
      |  (SELECT c.code FROM cb c WHERE c.s = 3
      |   ORDER BY list_dot_product(c.cv, c.cv) - 2*list_dot_product(r.rv[49:64], c.cv), c.code
      |   LIMIT 1) AS code3
      |  FROM res r),
      |q AS (SELECT vec_id AS query_id, nv FROM n WHERE vec_id < 10),
      |probes AS (SELECT q.query_id, q.nv, p.cell
      |  FROM q, LATERAL (SELECT c.cell FROM cent c
      |    ORDER BY list_dot_product(q.nv, c.cv) DESC, c.cell LIMIT 4) p),
      |scored AS (SELECT p.query_id, e.vec_id AS neighbor_id,
      |    round(list_dot_product(p.nv, cc.cv)
      |      + (list_dot_product(p.nv[1:16],  cb0.cv)
      |       + list_dot_product(p.nv[17:32], cb1.cv)
      |       + list_dot_product(p.nv[33:48], cb2.cv)
      |       + list_dot_product(p.nv[49:64], cb3.cv)), 6) AS score
      |  FROM probes p
      |  JOIN cent cc ON cc.cell = p.cell
      |  JOIN enc e ON e.cell = p.cell
      |  JOIN cb cb0 ON cb0.s = 0 AND cb0.code = e.code0
      |  JOIN cb cb1 ON cb1.s = 1 AND cb1.code = e.code1
      |  JOIN cb cb2 ON cb2.s = 2 AND cb2.code = e.code2
      |  JOIN cb cb3 ON cb3.s = 3 AND cb3.code = e.code3
      |  WHERE e.vec_id <> p.query_id),
      |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |  ORDER BY score DESC, neighbor_id) AS rn FROM scored)
      |SELECT query_id, neighbor_id, score, CAST(rn AS BIGINT) AS rank
      |FROM ranked WHERE rn <= 5""".stripMargin

  /** Brute-force top-k over int8-QUANTIZED embeddings
    * ([[graft.functions.VectorFunctions.quantizeInt8]]): the 4×-smaller
    * storage form must still rank neighbors usefully, and every step
    * (floor quantization, midpoint dequantization, normalized dot,
    * top-k) is bit-deterministic, so DuckDB replays the ranking
    * exactly. Range [-0.6, 0.6] is the stored model parameter for this
    * corpus.
    */
  def embeddingQuantized(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions
    val lo = -0.6
    val hi = 0.6
    val e = t(s, dir, "embeddings").select(col("vec_id"),
      VectorFunctions.dequantizeInt8(
        VectorFunctions.quantizeInt8(col("embedding"), lo, hi), lo, hi)
        .as("embedding"))
    SimilaritySearch.bruteForceTopK(
      e.filter(col("vec_id") < 10), e, "vec_id", "embedding", k = 5)
      .withColumn("rank", col("rank").cast("long"))
  }

  /** Literal-for-literal replay of quantize -> dequantize -> top-k:
    * scale/step derive from the same (0.6 - (-0.6)) IEEE ops, floor
    * avoids engine-dependent rounding ties.
    */
  val embeddingQuantizedSql: String =
    """WITH dq AS (SELECT vec_id,
      |    list_transform(CAST(embedding AS DOUBLE[]), x ->
      |      ((least(greatest(floor((x - (-0.6)) * (255.0 / (0.6 - (-0.6)))), 0.0), 255.0)
      |        - 128.0) + 128.5) * ((0.6 - (-0.6)) / 255.0) + (-0.6)) AS v
      |  FROM embeddings),
      |n AS (SELECT vec_id,
      |    list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv FROM dq),
      |q AS (SELECT vec_id AS query_id, nv AS qv FROM n WHERE vec_id < 10),
      |c AS (SELECT vec_id AS neighbor_id, nv AS cv FROM n),
      |scored AS (SELECT query_id, neighbor_id,
      |  round(list_dot_product(qv, cv), 6) AS cos_sim
      |  FROM q, c WHERE query_id <> neighbor_id),
      |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |  ORDER BY cos_sim DESC, neighbor_id) AS rn FROM scored)
      |SELECT query_id, neighbor_id, cos_sim, CAST(rn AS BIGINT) AS rank
      |FROM ranked WHERE rn <= 5""".stripMargin

  /** Embedding corpus with planted near-duplicates: every 5th vector
    * gets a shifted copy (element-wise +0.05, id +1,000,000) whose
    * cosine to its original lands in ~[0.92, 0.99] — above the 0.8
    * near-dup threshold, while the hottest unplanted pair is ~0.55.
    * Element-wise addition is bit-identical cross-engine, so DuckDB
    * reproduces the corpus exactly.
    */
  private[graft] def nearDupEmbeddings(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val variants = e.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.05)).as("embedding"))
    e.union(variants)
  }

  private[graft] val nearDupEmbeddingsSql: String =
    """corpus AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000 AS vec_id,
      |    list_transform(CAST(embedding AS DOUBLE[]), x -> x + 0.05) AS v
      |  FROM embeddings WHERE vec_id % 5 = 0)""".stripMargin

  /** Embedding-cosine near-duplicate counts via LSH buckets — no
    * all-pairs stage anywhere in the plan. The exact all-pairs
    * formulation ([[SimilaritySearch.cosineNearDupCounts]]) is the
    * small-scale truth cross-checked in SimilaritySearchSpec (8 bits ×
    * 12 tables ≈ 0.99 worst-case pair recall at cosine 0.92; equals the
    * exact counts on the sf0.01 corpus, 200/200 planted pairs). The
    * oracle replays the same buckets, so the hash check is exact
    * regardless of recall.
    */
  def embeddingNearDup(s: SparkSession, dir: String): DataFrame =
    SimilaritySearch.lshNearDupCounts(
      nearDupEmbeddings(s, dir), "vec_id", "embedding", threshold = 0.8)
      .withColumnRenamed("id", "vec_id")

  val embeddingNearDupSql: String =
    s"""WITH $nearDupEmbeddingsSql,
      |n AS (
      |  SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv
      |  FROM corpus WHERE sqrt(list_dot_product(v, v)) > 0),
      |d AS (SELECT max(len(nv)) AS dim FROM n),
      |planes AS (
      |  SELECT tt.t AS t, bb.b AS b,
      |    list_transform(range(0, d.dim), j ->
      |      CAST(('0x' || substr(sha256(
      |          'srp:' || CAST(42 + tt.t * 7919 AS VARCHAR) || ':' ||
      |          CAST(bb.b AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 8)) AS BIGINT)
      |        / 2147483648.0 - 1.0) AS prow
      |  FROM range(0, 12) AS tt(t) CROSS JOIN range(0, 8) AS bb(b) CROSS JOIN d),
      |sigs AS (
      |  SELECT n.vec_id, p.t,
      |    CAST(sum(CASE WHEN list_dot_product(n.nv, p.prow) >= 0
      |      THEN CAST(power(2, p.b) AS BIGINT) ELSE 0 END) AS BIGINT) AS sig
      |  FROM n CROSS JOIN planes p GROUP BY n.vec_id, p.t),
      |bkt AS (SELECT vec_id,
      |    CAST(t AS VARCHAR) || ':' || CAST(sig AS VARCHAR) AS bucket FROM sigs),
      |cand AS (SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
      |  FROM bkt l JOIN bkt r ON l.bucket = r.bucket AND l.vec_id <> r.vec_id),
      |hits AS (SELECT id_a,
      |    count(CASE WHEN round(list_dot_product(a.nv, b.nv), 6) >= 0.8 THEN 1 END) AS c
      |  FROM cand JOIN n a ON id_a = a.vec_id JOIN n b ON id_b = b.vec_id
      |  GROUP BY 1)
      |SELECT n.vec_id, CAST(coalesce(h.c, 0) AS BIGINT) AS n_near_dups
      |FROM n LEFT JOIN hits h ON n.vec_id = h.id_a""".stripMargin

  /** LSH-bucketed approximate top-k — the 100 TB scale path. Hyperplane
    * components derive from sha-256("srp:seed:b:j") (portable — see
    * [[graft.plans.HyperplaneSig]]), so DuckDB reproduces the exact
    * bucket assignments and the result is fully oracled.
    */
  def simsearchLsh(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    SimilaritySearch.lshTopK(
      e.filter(col("vec_id") < 10), e, "vec_id", "embedding", k = 5)
      .withColumn("rank", col("rank").cast("long"))
  }

  /** DuckDB replay of the SRP-LSH path: same sha-256-derived planes,
    * same sequential-fold dot product (`list_dot_product` matches
    * Spark's left-to-right fold bit-for-bit), same bucket labels
    * "table:signature", same within-bucket scoring + top-k.
    * numBits = 12, numTables = 2, seeds 42 + t*7919 — keep in sync with
    * [[graft.operators.SimilaritySearch.lshTopK]] defaults.
    */
  val simsearchLshSql: String =
    """WITH n AS (
      |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                     CAST(embedding AS DOUBLE[])))) AS nv
      |  FROM embeddings
      |  WHERE sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |             CAST(embedding AS DOUBLE[]))) > 0),
      |d AS (SELECT max(len(nv)) AS dim FROM n),
      |planes AS (
      |  SELECT tt.t AS t, bb.b AS b,
      |    list_transform(range(0, d.dim), j ->
      |      CAST(('0x' || substr(sha256(
      |          'srp:' || CAST(42 + tt.t * 7919 AS VARCHAR) || ':' ||
      |          CAST(bb.b AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 8)) AS BIGINT)
      |        / 2147483648.0 - 1.0) AS prow
      |  FROM range(0, 2) AS tt(t) CROSS JOIN range(0, 12) AS bb(b) CROSS JOIN d),
      |sigs AS (
      |  SELECT n.vec_id, p.t,
      |    CAST(sum(CASE WHEN list_dot_product(n.nv, p.prow) >= 0
      |      THEN CAST(power(2, p.b) AS BIGINT) ELSE 0 END) AS BIGINT) AS sig
      |  FROM n CROSS JOIN planes p GROUP BY n.vec_id, p.t),
      |bkt AS (SELECT vec_id,
      |    CAST(t AS VARCHAR) || ':' || CAST(sig AS VARCHAR) AS bucket FROM sigs),
      |q AS (SELECT bkt.vec_id AS query_id, n.nv AS qv, bkt.bucket
      |      FROM bkt JOIN n USING (vec_id) WHERE bkt.vec_id < 10),
      |c AS (SELECT bkt.vec_id AS neighbor_id, n.nv AS cv, bkt.bucket
      |      FROM bkt JOIN n USING (vec_id)),
      |pairs AS (SELECT DISTINCT query_id, neighbor_id,
      |      round(list_dot_product(qv, cv), 6) AS cos_sim
      |      FROM q JOIN c USING (bucket) WHERE query_id <> neighbor_id),
      |ranked AS (SELECT *, row_number() OVER (
      |      PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
      |      FROM pairs)
      |SELECT query_id, neighbor_id, cos_sim, rn AS rank
      |FROM ranked WHERE rn <= 5""".stripMargin

  /** Multi-probe LSH ([[SimilaritySearch.lshTopKMultiProbe]]): the
    * query side additionally probes every Hamming-1 neighbor bucket —
    * recall rises toward the brute-force truth without more tables or
    * signature storage, at numBits+1 probe buckets per query per
    * table. Candidate indexing is untouched.
    */
  def simsearchLshMultiProbe(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    SimilaritySearch.lshTopKMultiProbe(
      e.filter(col("vec_id") < 10), e, "vec_id", "embedding", k = 5)
      .withColumn("rank", col("rank").cast("long"))
  }

  /** Graph ANN ([[SimilaritySearch.nswTopK]]): navigable-small-world
    * beam search over per-cluster kNN graphs — the high-recall regime
    * IVF probe counts can't serve cheaply. The SAME 16-cell iters=0
    * coarse quantizer as [[simsearchIvf]] shards the corpus (so the
    * two paths are probe-for-probe comparable), degree-4 symmetrized
    * graphs, 12-bit-sketch Hamming entries, 6 rounds of beam 2, exact
    * re-rank of the visited set. Fully deterministic (smallest-id
    * centroids, sha-256 sketch planes, 6-dp sims, id tie-breaks), so
    * the walk itself is oracled below, not just the output shape.
    */
  def simsearchNsw(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val model = graft.operators.IvfIndex.train(
      e, "vec_id", "embedding", k = 16, iters = 0)
    SimilaritySearch.nswTopK(
      e.filter(col("vec_id") < 10), e, "vec_id", "embedding", k = 5,
      model, nprobe = 2, degree = 4, beam = 2, rounds = 6)
      .withColumn("rank", col("rank").cast("long"))
  }

  /** The PERSISTED graph-index path ([[SimilaritySearch.nswSave]] /
    * [[SimilaritySearch.nswLoad]] / [[SimilaritySearch.nswSearchIndex]]):
    * the index builds once, round-trips through the cell-partitioned
    * store (atomic swap dir), and the search runs off the RELOADED
    * tables — it must hash-match the same oracle as the direct
    * [[simsearchNsw]] path, so a lost edge, a mis-typed partition
    * column, or a sketch that didn't survive the round trip breaks
    * the driver gate.
    */
  def simsearchNswStored(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val model = graft.operators.IvfIndex.train(
      e, "vec_id", "embedding", k = 16, iters = 0)
    val (nodes, edges) = SimilaritySearch.nswIndex(
      e, "vec_id", "embedding", model, degree = 4, entryBits = 12)
    val idxDir = StreamGateQueries.tempRoot("graft_q_nsw_idx") + "/idx"
    SimilaritySearch.nswSave(nodes, edges, model, idxDir)
    val (n2, e2, m2) = SimilaritySearch.nswLoad(s, idxDir)
    SimilaritySearch.nswSearchIndex(
      e.filter(col("vec_id") < 10), n2, e2, "vec_id", "embedding", m2,
      k = 5, nprobe = 2, beam = 2, rounds = 6)
      .withColumn("rank", col("rank").cast("long"))
  }

  /** DuckDB replay of the whole graph path: same iters=0 centroids
    * and nearest-cell rule as the IVF oracle, the same symmetrized
    * in-cell kNN edge table, the same 12-bit sha-256 entry sketches
    * (seed 9176, Hamming-nearest entry, ties to the smaller id), the
    * same expanding-beam recursion (top-2 NEW neighbors per round by
    * 6-dp-rounded cosine then id, 6 rounds, per probed cell), and the
    * same exact re-rank over everything visited.
    */
  val simsearchNswSql: String =
    """WITH RECURSIVE n AS (
      |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                     CAST(embedding AS DOUBLE[])))) AS nv
      |  FROM embeddings
      |  WHERE sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |             CAST(embedding AS DOUBLE[]))) > 0),
      |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, nv AS cv
      |  FROM n ORDER BY vec_id LIMIT 16),
      |d AS (SELECT max(len(nv)) AS dim FROM n),
      |planes AS (
      |  SELECT bb.b AS b,
      |    list_transform(range(0, d.dim), j ->
      |      CAST(('0x' || substr(sha256(
      |          'srp:9176:' || CAST(bb.b AS VARCHAR) || ':' ||
      |          CAST(j AS VARCHAR)), 1, 8)) AS BIGINT)
      |        / 2147483648.0 - 1.0) AS prow
      |  FROM range(0, 12) AS bb(b) CROSS JOIN d),
      |esigs AS (
      |  SELECT n.vec_id,
      |    CAST(sum(CASE WHEN list_dot_product(n.nv, p.prow) >= 0
      |      THEN CAST(power(2, p.b) AS BIGINT) ELSE 0 END) AS BIGINT) AS esig
      |  FROM n CROSS JOIN planes p GROUP BY n.vec_id),
      |assigned AS (SELECT n.vec_id, n.nv, e.esig,
      |    (SELECT c.cell FROM cent c
      |     ORDER BY list_dot_product(n.nv, c.cv) DESC, c.cell LIMIT 1) AS cell
      |  FROM n JOIN esigs e USING (vec_id)),
      |knn AS (SELECT cell, src, dst FROM (
      |    SELECT a.cell, a.vec_id AS src, b.vec_id AS dst,
      |      row_number() OVER (PARTITION BY a.cell, a.vec_id
      |        ORDER BY round(list_dot_product(a.nv, b.nv), 6) DESC,
      |                 b.vec_id) AS rn
      |    FROM assigned a JOIN assigned b USING (cell)
      |    WHERE a.vec_id <> b.vec_id)
      |  WHERE rn <= 4),
      |edges AS (SELECT DISTINCT cell, src, dst FROM (
      |  SELECT cell, src, dst FROM knn
      |  UNION ALL SELECT cell, dst AS src, src AS dst FROM knn)),
      |q AS (SELECT n.vec_id AS query_id, n.nv AS qv, e.esig AS qesig
      |  FROM n JOIN esigs e USING (vec_id) WHERE n.vec_id < 10),
      |probes AS (SELECT q.query_id, q.qv, q.qesig, p.cell
      |  FROM q, LATERAL (SELECT c.cell FROM cent c
      |    ORDER BY list_dot_product(q.qv, c.cv) DESC, c.cell LIMIT 2) p),
      |st(query_id, qv, cell, round, frontier, visited) AS (
      |  SELECT p.query_id, p.qv, p.cell, 0, [w.node], [w.node]
      |  FROM probes p, LATERAL (
      |    SELECT a.vec_id AS node FROM assigned a WHERE a.cell = p.cell
      |    ORDER BY bit_count(xor(p.qesig, a.esig)), a.vec_id LIMIT 1) w
      |  UNION ALL
      |  SELECT s.query_id, s.qv, s.cell, s.round + 1, w.newf,
      |    list_concat(s.visited, w.newf)
      |  FROM st s, LATERAL (
      |    SELECT coalesce(list(dst ORDER BY sim DESC, dst),
      |                    CAST([] AS BIGINT[])) AS newf FROM (
      |      SELECT DISTINCT e.dst AS dst,
      |        round(list_dot_product(s.qv, k2.nv), 6) AS sim
      |      FROM edges e JOIN assigned k2
      |        ON k2.vec_id = e.dst AND k2.cell = e.cell
      |      WHERE e.cell = s.cell AND list_contains(s.frontier, e.src)
      |        AND NOT list_contains(s.visited, e.dst)
      |      ORDER BY sim DESC, dst LIMIT 2)) w
      |  WHERE s.round < 6),
      |vis AS (SELECT DISTINCT query_id, unnest(visited) AS node FROM (
      |  SELECT query_id, cell, visited, row_number() OVER (
      |    PARTITION BY query_id, cell ORDER BY round DESC) AS rn
      |  FROM st) WHERE rn = 1),
      |scored AS (SELECT v.query_id, v.node AS neighbor_id,
      |    round(list_dot_product(qn.nv, cn.nv), 6) AS cos_sim
      |  FROM vis v JOIN n qn ON qn.vec_id = v.query_id
      |    JOIN n cn ON cn.vec_id = v.node
      |  WHERE v.query_id <> v.node),
      |ranked AS (SELECT *, row_number() OVER (
      |    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
      |  FROM scored)
      |SELECT query_id, neighbor_id, cos_sim, rn AS rank
      |FROM ranked WHERE rn <= 5""".stripMargin

  /** Hierarchical graph ANN ([[SimilaritySearch.hnswTopK]]): HNSW
    * layers over the same 16-cell quantizer — deterministic sha-256
    * layer draws ("hnsw:"+id, branch 4, 1 upper layer here), a
    * lvl-desc/Hamming entry, one greedy descent step on layer 1 (the
    * frontier may keep its node), then 4 expanding-beam rounds on
    * layer 0; the answer pool is EVERYTHING the walk scored (beam
    * losers already paid their dot product). Fully deterministic, so
    * the layered walk replays in DuckDB below.
    */
  def simsearchHnsw(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val model = graft.operators.IvfIndex.train(
      e, "vec_id", "embedding", k = 16, iters = 0)
    SimilaritySearch.hnswTopK(
      e.filter(col("vec_id") < 10), e, "vec_id", "embedding", k = 5,
      model, nprobe = 2, degree = 4, beam = 2, rounds = 4,
      branch = 4, maxLayer = 1, beamUpper = 1, roundsUpper = 1)
      .withColumn("rank", col("rank").cast("long"))
  }

  /** DuckDB replay of the hierarchical walk: the nsw oracle's centroid
    * / sketch / kNN machinery plus per-layer edge tables (layer l keeps
    * nodes with sha-256("hnsw:"+id) ≡ 0 mod 4^l), a lvl-desc entry,
    * one pool-rule descent step (step 0→1: best of frontier ∪ its
    * layer-1 out-neighbors), 4 expanding layer-0 rounds (steps 1→5),
    * visited accumulating EVERY scored node, exact re-rank at the end
    * (recomputed sims equal the stored ones — same 6-dp rounding).
    */
  val simsearchHnswSql: String =
    """WITH RECURSIVE n AS (
      |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                     CAST(embedding AS DOUBLE[])))) AS nv
      |  FROM embeddings
      |  WHERE sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |             CAST(embedding AS DOUBLE[]))) > 0),
      |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, nv AS cv
      |  FROM n ORDER BY vec_id LIMIT 16),
      |d AS (SELECT max(len(nv)) AS dim FROM n),
      |planes AS (
      |  SELECT bb.b AS b,
      |    list_transform(range(0, d.dim), j ->
      |      CAST(('0x' || substr(sha256(
      |          'srp:9176:' || CAST(bb.b AS VARCHAR) || ':' ||
      |          CAST(j AS VARCHAR)), 1, 8)) AS BIGINT)
      |        / 2147483648.0 - 1.0) AS prow
      |  FROM range(0, 12) AS bb(b) CROSS JOIN d),
      |esigs AS (
      |  SELECT n.vec_id,
      |    CAST(sum(CASE WHEN list_dot_product(n.nv, p.prow) >= 0
      |      THEN CAST(power(2, p.b) AS BIGINT) ELSE 0 END) AS BIGINT) AS esig
      |  FROM n CROSS JOIN planes p GROUP BY n.vec_id),
      |assigned AS (SELECT n.vec_id, n.nv, e.esig,
      |    CASE WHEN CAST(('0x' || substr(sha256(
      |      'hnsw:' || CAST(n.vec_id AS VARCHAR)), 1, 8)) AS BIGINT) % 4 = 0
      |      THEN 1 ELSE 0 END AS lvl,
      |    (SELECT c.cell FROM cent c
      |     ORDER BY list_dot_product(n.nv, c.cv) DESC, c.cell LIMIT 1) AS cell
      |  FROM n JOIN esigs e USING (vec_id)),
      |knn AS (SELECT layer, cell, src, dst FROM (
      |    SELECT ll.layer, a.cell, a.vec_id AS src, b.vec_id AS dst,
      |      row_number() OVER (PARTITION BY ll.layer, a.cell, a.vec_id
      |        ORDER BY round(list_dot_product(a.nv, b.nv), 6) DESC,
      |                 b.vec_id) AS rn
      |    FROM (VALUES (0), (1)) ll(layer)
      |      JOIN assigned a ON a.lvl >= ll.layer
      |      JOIN assigned b ON b.cell = a.cell AND b.lvl >= ll.layer
      |        AND a.vec_id <> b.vec_id)
      |  WHERE rn <= 4),
      |edges AS (SELECT DISTINCT layer, cell, src, dst FROM (
      |  SELECT layer, cell, src, dst FROM knn
      |  UNION ALL SELECT layer, cell, dst AS src, src AS dst FROM knn)),
      |q AS (SELECT n.vec_id AS query_id, n.nv AS qv, e.esig AS qesig
      |  FROM n JOIN esigs e USING (vec_id) WHERE n.vec_id < 10),
      |probes AS (SELECT q.query_id, q.qv, q.qesig, p.cell
      |  FROM q, LATERAL (SELECT c.cell FROM cent c
      |    ORDER BY list_dot_product(q.qv, c.cv) DESC, c.cell LIMIT 2) p),
      |st(query_id, qv, cell, step, frontier, visited) AS (
      |  SELECT p.query_id, p.qv, p.cell, 0, [w.node], [w.node]
      |  FROM probes p, LATERAL (
      |    SELECT a.vec_id AS node FROM assigned a WHERE a.cell = p.cell
      |    ORDER BY a.lvl DESC, bit_count(xor(p.qesig, a.esig)), a.vec_id
      |    LIMIT 1) w
      |  UNION ALL
      |  SELECT s.query_id, s.qv, s.cell, s.step + 1, w.newf,
      |    list_concat(s.visited, w.news)
      |  FROM st s, LATERAL (
      |    SELECT
      |      coalesce(list(nd ORDER BY sim DESC, nd) FILTER (is_new),
      |        CAST([] AS BIGINT[])) AS news,
      |      coalesce(list_slice(list(nd ORDER BY sim DESC, nd), 1,
      |        CASE WHEN s.step = 0 THEN 1 ELSE 2 END),
      |        CAST([] AS BIGINT[])) AS newf
      |    FROM (
      |      SELECT DISTINCT e.dst AS nd,
      |        round(list_dot_product(s.qv, k2.nv), 6) AS sim,
      |        true AS is_new
      |      FROM edges e JOIN assigned k2
      |        ON k2.vec_id = e.dst AND k2.cell = e.cell
      |      WHERE e.cell = s.cell
      |        AND e.layer = (CASE WHEN s.step = 0 THEN 1 ELSE 0 END)
      |        AND list_contains(s.frontier, e.src)
      |        AND NOT list_contains(s.visited, e.dst)
      |      UNION ALL
      |      SELECT f.node AS nd,
      |        round(list_dot_product(s.qv, a2.nv), 6) AS sim,
      |        false AS is_new
      |      FROM unnest(s.frontier) AS f(node)
      |        JOIN assigned a2 ON a2.vec_id = f.node
      |      WHERE s.step = 0) pool) w
      |  WHERE s.step < 5),
      |vis AS (SELECT DISTINCT query_id, unnest(visited) AS node FROM (
      |  SELECT query_id, cell, visited, row_number() OVER (
      |    PARTITION BY query_id, cell ORDER BY step DESC) AS rn
      |  FROM st) WHERE rn = 1),
      |scored AS (SELECT v.query_id, v.node AS neighbor_id,
      |    round(list_dot_product(qn.nv, cn.nv), 6) AS cos_sim
      |  FROM vis v JOIN n qn ON qn.vec_id = v.query_id
      |    JOIN n cn ON cn.vec_id = v.node
      |  WHERE v.query_id <> v.node),
      |ranked AS (SELECT *, row_number() OVER (
      |    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
      |  FROM scored)
      |SELECT query_id, neighbor_id, cos_sim, rn AS rank
      |FROM ranked WHERE rn <= 5""".stripMargin

  val simsearchLshMultiProbeSql: String =
    """WITH n AS (
      |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                     CAST(embedding AS DOUBLE[])))) AS nv
      |  FROM embeddings
      |  WHERE sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |             CAST(embedding AS DOUBLE[]))) > 0),
      |d AS (SELECT max(len(nv)) AS dim FROM n),
      |planes AS (
      |  SELECT tt.t AS t, bb.b AS b,
      |    list_transform(range(0, d.dim), j ->
      |      CAST(('0x' || substr(sha256(
      |          'srp:' || CAST(42 + tt.t * 7919 AS VARCHAR) || ':' ||
      |          CAST(bb.b AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 8)) AS BIGINT)
      |        / 2147483648.0 - 1.0) AS prow
      |  FROM range(0, 2) AS tt(t) CROSS JOIN range(0, 12) AS bb(b) CROSS JOIN d),
      |sigs AS (
      |  SELECT n.vec_id, p.t,
      |    CAST(sum(CASE WHEN list_dot_product(n.nv, p.prow) >= 0
      |      THEN CAST(power(2, p.b) AS BIGINT) ELSE 0 END) AS BIGINT) AS sig
      |  FROM n CROSS JOIN planes p GROUP BY n.vec_id, p.t),
      |masks AS (SELECT unnest([0, 1, 2, 4, 8, 16, 32, 64, 128, 256, 512,
      |  1024, 2048]) AS mask),
      |q AS (SELECT s.vec_id AS query_id, n.nv AS qv,
      |      CAST(s.t AS VARCHAR) || ':' || CAST(xor(s.sig, m.mask) AS VARCHAR) AS bucket
      |      FROM sigs s JOIN n USING (vec_id) CROSS JOIN masks m
      |      WHERE s.vec_id < 10),
      |c AS (SELECT s.vec_id AS neighbor_id, n.nv AS cv,
      |      CAST(s.t AS VARCHAR) || ':' || CAST(s.sig AS VARCHAR) AS bucket
      |      FROM sigs s JOIN n USING (vec_id)),
      |pairs AS (SELECT DISTINCT query_id, neighbor_id,
      |      round(list_dot_product(qv, cv), 6) AS cos_sim
      |      FROM q JOIN c USING (bucket) WHERE query_id <> neighbor_id),
      |ranked AS (SELECT *, row_number() OVER (
      |      PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
      |      FROM pairs)
      |SELECT query_id, neighbor_id, cos_sim, rn AS rank
      |FROM ranked WHERE rn <= 5""".stripMargin
}
