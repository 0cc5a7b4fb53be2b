package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Queries.t
import graft.operators.{Divergence, EventFlow, InvertedIndex, Lexicon, Profile, SimilaritySearch}

/** Split from the monolithic Queries.scala registry (round 11);
  * registered via [[graft.Queries.all]], oracled via [[graft.Queries.oracles]].
  */
object ProfilingQueries {

  /** Inverted index over the documents table
    * ([[graft.operators.InvertedIndex]]): per-term df/cf and a
    * 20-bounded posting list folded in a k-bounded map-side-combining
    * aggregator — never a per-term window, so a stop-word term costs k
    * ids per partition on the wire instead of its whole posting list
    * in one task.
    */
  def invertedIndex(s: SparkSession, dir: String): DataFrame =
    InvertedIndex.build(t(s, dir, "documents"), "doc_id", "text",
      maxPostings = 20, minDf = 5L)

  val invertedIndexSql: String =
    """WITH tf AS (
      |  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM (
      |    SELECT doc_id,
      |      unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
      |    FROM documents)
      |  WHERE term <> '' GROUP BY term, doc_id),
      |topd AS (
      |  SELECT term, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
      |  FROM (SELECT term, doc_id,
      |          row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn FROM tf)
      |  WHERE rn <= 20 GROUP BY term)
      |SELECT s.term, s.df, s.cf, topd.postings
      |FROM (SELECT term, CAST(count(*) AS BIGINT) AS df,
      |        CAST(sum(tf) AS BIGINT) AS cf
      |      FROM tf GROUP BY term HAVING count(*) >= 5) s
      |JOIN topd ON topd.term = s.term""".stripMargin

  /** Exact single-pass profile of 7 lineitem columns
    * ([[graft.operators.Profile.profile]]) — long format, typed
    * min/max cast to string after aggregation. The sketch variant
    * (no Expand, the 100 TB default) is spec-gated against this one.
    */
  def tableProfile(s: SparkSession, dir: String): DataFrame =
    Profile.profile(t(s, dir, "lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_returnflag", "l_linestatus", "l_shipdate"))

  val tableProfileSql: String = {
    val one = (c: String) =>
      s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
        |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
        |  CAST(min($c) AS VARCHAR) AS min_val,
        |  CAST(max($c) AS VARCHAR) AS max_val FROM lineitem""".stripMargin
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .map(one).mkString("\nUNION ALL\n")
  }

  /** Snapshot reconciliation ([[graft.operators.SnapshotDiff]]): the
    * per-customer current-order view at two time boundaries, diffed —
    * one full-outer sort-merge join, drift-proportional output. The
    * window choice ([1995-,) vs (-,1997)) exercises all three change
    * classes: customers active only before 1995 are `removed`, only
    * from 1997 `added`, and anyone whose latest order moved between
    * the windows is `changed` with the moved columns named.
    */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
        "o_orderstatus")
    def latest(df: DataFrame): DataFrame = df
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)))
      .filter(col("__rn") === 1).drop("__rn")
    val old = latest(o.filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp")))
    val cur = latest(o.filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp")))
    graft.operators.SnapshotDiff.diff(old, cur, Seq("o_custkey"))
  }

  val snapshotDiffSql: String =
    """WITH old AS (SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice, o_orderstatus,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01') WHERE rn = 1),
      |cur AS (SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice, o_orderstatus,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01') WHERE rn = 1),
      |j AS (SELECT coalesce(o.o_custkey, c.o_custkey) AS o_custkey,
      |  CASE WHEN o.o_custkey IS NULL THEN 'added'
      |       WHEN c.o_custkey IS NULL THEN 'removed'
      |       WHEN o.o_orderkey IS DISTINCT FROM c.o_orderkey
      |         OR o.o_orderdate IS DISTINCT FROM c.o_orderdate
      |         OR o.o_totalprice IS DISTINCT FROM c.o_totalprice
      |         OR o.o_orderstatus IS DISTINCT FROM c.o_orderstatus
      |       THEN 'changed' END AS change_type,
      |  concat_ws(',',
      |    CASE WHEN o.o_orderkey IS DISTINCT FROM c.o_orderkey THEN 'o_orderkey' END,
      |    CASE WHEN o.o_orderdate IS DISTINCT FROM c.o_orderdate THEN 'o_orderdate' END,
      |    CASE WHEN o.o_totalprice IS DISTINCT FROM c.o_totalprice THEN 'o_totalprice' END,
      |    CASE WHEN o.o_orderstatus IS DISTINCT FROM c.o_orderstatus THEN 'o_orderstatus' END)
      |    AS cols
      |  FROM old o FULL JOIN cur c ON o.o_custkey = c.o_custkey)
      |SELECT o_custkey, change_type,
      |  CASE WHEN change_type = 'changed' THEN cols ELSE '' END AS changed_cols
      |FROM j WHERE change_type IS NOT NULL""".stripMargin

  /** One-pass Pearson correlation matrix over the lineitem pricing
    * columns — the repo's exact-integer-moment pattern
    * ([[graft.operators.Regression]]): every sum is a DECIMAL fold of
    * cents-scaled integers (order-independent, engine-exact), the
    * correlation formula runs in doubles with a pinned op order, and
    * the 6 pairs unpivot from the single aggregate row. Correlation is
    * scale-invariant, so the cents grid drops out mathematically; both
    * engines see identical doubles.
    */
  def corrMatrix(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def fp(c: String) = round(col(c) * 100L, 0).cast("decimal(38,0)")
    val sums =
      Seq(count(lit(1)).as("n")) ++
        cols.map(c => sum(fp(c)).as(s"s_$c")) ++
        (for { i <- cols.indices; j <- i until cols.length } yield
          sum(fp(cols(i)) * fp(cols(j))).as(s"p_${cols(i)}_${cols(j)}"))
    val agg = t(s, dir, "lineitem").agg(sums.head, sums.tail: _*)
    def d(c: String) = col(c).cast("double")
    val n = d("n")
    val pairs = for { i <- cols.indices; j <- i + 1 until cols.length } yield {
      val (a, b) = (cols(i), cols(j))
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        round((n * d(s"p_${a}_$b") - d(s"s_$a") * d(s"s_$b")) /
          sqrt(n * d(s"p_${a}_$a") - d(s"s_$a") * d(s"s_$a")) /
          sqrt(n * d(s"p_${b}_$b") - d(s"s_$b") * d(s"s_$b")), 6).as("corr"))
    }
    agg.select(explode(array(pairs: _*)).as("t"))
      .select(col("t.col_a").as("col_a"), col("t.col_b").as("col_b"),
        col("t.corr").as("corr"))
  }

  val corrMatrixSql: String = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val fp = (c: String) => s"CAST(round($c * 100, 0) AS HUGEINT)"
    val sums =
      (Seq("CAST(count(*) AS BIGINT) AS n") ++
        cols.map(c => s"sum(${fp(c)}) AS s_$c") ++
        (for { i <- cols.indices; j <- i until cols.length } yield
          s"sum(${fp(cols(i))} * ${fp(cols(j))}) AS p_${cols(i)}_${cols(j)}"))
        .mkString(",\n  ")
    val d = (c: String) => s"CAST($c AS DOUBLE)"
    val pairRows = (for { i <- cols.indices; j <- i + 1 until cols.length } yield {
      val (a, b) = (cols(i), cols(j))
      s"""SELECT '$a' AS col_a, '$b' AS col_b,
        |  round((${d("n")} * ${d(s"p_${a}_$b")} - ${d(s"s_$a")} * ${d(s"s_$b")}) /
        |    sqrt(${d("n")} * ${d(s"p_${a}_$a")} - ${d(s"s_$a")} * ${d(s"s_$a")}) /
        |    sqrt(${d("n")} * ${d(s"p_${b}_$b")} - ${d(s"s_$b")} * ${d(s"s_$b")}), 6)
        |    + 0.0 AS corr FROM m""".stripMargin
    }).mkString("\nUNION ALL\n")
    s"WITH m AS (SELECT\n  $sums\nFROM lineitem)\n$pairRows"
  }

  /** In-plan 2-feature OLS ([[graft.operators.Regression.fit2Df]]):
    * extendedprice regressed on quantity and discount — one exact
    * decimal moment pass, Cramer's rule in pinned-order doubles, R²
    * by the algebraic identity. The DuckDB oracle replays the solve
    * token for token.
    */
  def olsCoeffs(s: SparkSession, dir: String): DataFrame =
    graft.operators.Regression.fit2Df(
      t(s, dir, "lineitem"), "l_extendedprice", "l_quantity", "l_discount")

  val olsCoeffsSql: String =
    """WITH m AS (SELECT
      |  CAST(count(*) AS BIGINT) AS n,
      |  sum(CAST(round(l_quantity * 100, 0) AS HUGEINT)) AS s1,
      |  sum(CAST(round(l_discount * 100, 0) AS HUGEINT)) AS s2,
      |  sum(CAST(round(l_quantity * 100, 0) AS HUGEINT) * CAST(round(l_quantity * 100, 0) AS HUGEINT)) AS s11,
      |  sum(CAST(round(l_quantity * 100, 0) AS HUGEINT) * CAST(round(l_discount * 100, 0) AS HUGEINT)) AS s12,
      |  sum(CAST(round(l_discount * 100, 0) AS HUGEINT) * CAST(round(l_discount * 100, 0) AS HUGEINT)) AS s22,
      |  sum(CAST(round(l_quantity * 100, 0) AS HUGEINT) * CAST(round(l_extendedprice * 100, 0) AS HUGEINT)) AS s1y,
      |  sum(CAST(round(l_discount * 100, 0) AS HUGEINT) * CAST(round(l_extendedprice * 100, 0) AS HUGEINT)) AS s2y,
      |  sum(CAST(round(l_extendedprice * 100, 0) AS HUGEINT)) AS sy,
      |  sum(CAST(round(l_extendedprice * 100, 0) AS HUGEINT) * CAST(round(l_extendedprice * 100, 0) AS HUGEINT)) AS syy
      |FROM lineitem),
      |v AS (SELECT CAST(n AS DOUBLE) AS n,
      |  CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
      |  CAST(s11 AS DOUBLE) AS s11, CAST(s12 AS DOUBLE) AS s12, CAST(s22 AS DOUBLE) AS s22,
      |  CAST(s1y AS DOUBLE) AS s1y, CAST(s2y AS DOUBLE) AS s2y,
      |  CAST(sy AS DOUBLE) AS sy, CAST(syy AS DOUBLE) AS syy FROM m),
      |b AS (SELECT n, sy, s1y, s2y, syy,
      |  (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y))
      |    / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)) AS b0s,
      |  (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2))
      |    / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)) AS b1s,
      |  (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2))
      |    / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)) AS b2s
      |  FROM v)
      |SELECT 'intercept' AS stat, round(b0s / 100, 6) + 0.0 AS value FROM b
      |UNION ALL SELECT 'l_quantity', round(b1s, 6) + 0.0 FROM b
      |UNION ALL SELECT 'l_discount', round(b2s, 6) + 0.0 FROM b
      |UNION ALL SELECT 'r2',
      |  round(1.0 - (syy - (b0s * sy + b1s * s1y + b2s * s2y)) / (syy - sy * sy / n), 6) + 0.0 FROM b""".stripMargin

  /** PCA moment pass ([[graft.operators.Pca.covarianceDf]]): the
    * sample covariance of the first 16 embedding dimensions on the
    * 2^20 quantization grid — ONE [[graft.plans.VectorSumLong]]
    * aggregation (a 152-long vector per partition crosses the
    * exchange, never a row), exploded back to (i, j, cov). The
    * eigensolve/projection on top is spec-gated (PcaSpec); this query
    * pins the whole data-touching pass to the DuckDB oracle. (The
    * oracle adds `+ 0.0` after rounding: Spark's round goes through
    * BigDecimal, which has no signed zero, so a tiny negative entry
    * is +0.0 in Spark and −0.0 raw in DuckDB — the add normalizes
    * only that value, every other double is unchanged. Same guard on
    * the corr/OLS oracles.)
    */
  def pcaCov(s: SparkSession, dir: String): DataFrame =
    graft.operators.Pca.covarianceDf(t(s, dir, "embeddings"), "embedding", 16)

  val pcaCovSql: String =
    """WITH q AS (SELECT list_transform(embedding[1:16],
      |    x -> CAST(round(CAST(x AS DOUBLE) * 1048576.0, 0) AS BIGINT)) AS qv
      |  FROM embeddings),
      |lin AS (SELECT i.i AS i, sum(qv[i.i]) AS s
      |  FROM q, range(1, 17) i(i) GROUP BY 1),
      |quad AS (SELECT a.i AS i, b.j AS j, sum(qv[a.i] * qv[b.j]) AS p
      |  FROM q, range(1, 17) a(i), range(1, 17) b(j) WHERE b.j >= a.i
      |  GROUP BY 1, 2),
      |nn AS (SELECT count(*) AS n FROM q)
      |SELECT CAST(quad.i AS BIGINT) AS i, CAST(quad.j AS BIGINT) AS j,
      |  round((CAST(quad.p AS DOUBLE) -
      |      CAST(li.s AS DOUBLE) * CAST(lj.s AS DOUBLE) / n) /
      |    (n - 1) / 1099511627776.0, 6) + 0.0 AS cov
      |FROM quad
      |JOIN lin li ON li.i = quad.i
      |JOIN lin lj ON lj.i = quad.j
      |CROSS JOIN nn""".stripMargin

  /** Robust per-group outlier stats: median / MAD (median absolute
    * deviation) per return flag, plus the count beyond 3×MAD — the
    * outlier gate that survives heavy tails where z-scores
    * (q_group_outliers) saturate. Exact medians ride the proven
    * `percentile` ≡ DuckDB `quantile_cont` parity
    * (q_group_percentiles); deviations are exact double differences of
    * 2-dp values, so the second median interpolates identical inputs.
    * Three staged passes by necessity (median → deviations → gate) —
    * group stats travel back via broadcast, never a row shuffle; the
    * sketch percentile (q_group_percentiles_approx) is the documented
    * single-digit-pass scale variant.
    */
  def madOutliers(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select("l_returnflag", "l_extendedprice")
    val med = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("median_price"))
    val dev = li.join(broadcast(med), "l_returnflag")
      .withColumn("__dev", abs(col("l_extendedprice") - col("median_price")))
    val mad = dev.groupBy("l_returnflag")
      .agg(expr("percentile(__dev, 0.5)").as("mad"))
    dev.join(broadcast(mad), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(
        round(first(col("median_price")), 6).as("median_price"),
        round(first(col("mad")), 6).as("mad"),
        sum(when(col("__dev") > lit(3.0) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  val madOutliersSql: String =
    """WITH med AS (SELECT l_returnflag,
      |    quantile_cont(l_extendedprice, 0.5) AS median_price
      |  FROM lineitem GROUP BY 1),
      |dev AS (SELECT li.l_returnflag, median_price,
      |    abs(l_extendedprice - median_price) AS d
      |  FROM lineitem li JOIN med ON li.l_returnflag = med.l_returnflag),
      |mad AS (SELECT l_returnflag, quantile_cont(d, 0.5) AS mad
      |  FROM dev GROUP BY 1)
      |SELECT dev.l_returnflag,
      |  round(any_value(dev.median_price), 6) AS median_price,
      |  round(any_value(mad.mad), 6) AS mad,
      |  CAST(sum(CASE WHEN d > 3.0 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_outliers
      |FROM dev JOIN mad ON dev.l_returnflag = mad.l_returnflag
      |GROUP BY 1""".stripMargin

  /** The scale companion to q_mad_outliers: sketch (GK) medians for
    * both stages — per-task state bounded by the sketch, never the
    * group — with the q_group_percentiles_approx verification
    * contract: the output carries rank-interval BOOLEANS checked
    * in-engine (εn + 1 slack), so the driver's hash gate fails if
    * either sketch ever leaves its guarantee, while the oracle only
    * replays the exact group counts.
    */
  def madOutliersApprox(s: SparkSession, dir: String): DataFrame = {
    val acc = 1000
    val li = t(s, dir, "lineitem").select("l_returnflag", "l_extendedprice")
    val med = li.groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(acc)).as("amed"))
    val dev = li.join(broadcast(med), "l_returnflag")
      .withColumn("__dev", abs(col("l_extendedprice") - col("amed")))
    val mad = dev.groupBy("l_returnflag")
      .agg(percentile_approx(col("__dev"), lit(0.5), lit(acc)).as("amad"))
    def ok(le: Column, lt: Column, n: Column): Column = {
      val slack = n.cast("double") / acc + 1d
      val target = n.cast("double") * 0.5
      (le.cast("double") >= target - slack) && (lt.cast("double") <= target + slack)
    }
    dev.join(broadcast(mad), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("l_extendedprice") <= col("amed"), 1L).otherwise(0L)).as("lem"),
        sum(when(col("l_extendedprice") < col("amed"), 1L).otherwise(0L)).as("ltm"),
        sum(when(col("__dev") <= col("amad"), 1L).otherwise(0L)).as("led"),
        sum(when(col("__dev") < col("amad"), 1L).otherwise(0L)).as("ltd"))
      .select(col("l_returnflag"), col("n"),
        ok(col("lem"), col("ltm"), col("n")).as("med_in_bound"),
        ok(col("led"), col("ltd"), col("n")).as("mad_in_bound"))
  }

  val madOutliersApproxSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  true AS med_in_bound, true AS mad_in_bound
      |FROM lineitem GROUP BY 1""".stripMargin

  /** Per-label embedding centroids via the native vector-sum aggregate
    * ([[graft.plans.VectorSumLong]]) in GROUPED mode: one exchange of
    * 64-long vectors (one per group per partition after map-side
    * combine — rows never shuffle), exact integer sums on the PCA
    * quantization grid, means in pinned-order doubles. The prototype
    * table classifier-distillation and SemDeDup-style seeding read.
    */
  def embeddingCentroids(s: SparkSession, dir: String): DataFrame = {
    val grid = graft.operators.Pca.Grid
    val q = transform(col("embedding"),
      x => round(x.cast("double") * lit(grid), 0).cast("long"))
    t(s, dir, "embeddings")
      .groupBy("label")
      .agg(count(lit(1)).as("__n"),
        graft.plans.NativeAgg.vectorSumLong(q).as("__s"))
      .select(col("label").cast("long").as("label"), col("__n"),
        posexplode(col("__s")).as(Seq("__pos", "__v")))
      .select(col("label"), (col("__pos") + 1).cast("long").as("dim"),
        round(col("__v").cast("double") / col("__n") / lit(grid), 6)
          .as("centroid"))
  }

  val embeddingCentroidsSql: String =
    """WITH q AS (SELECT label, list_transform(embedding,
      |    x -> CAST(round(CAST(x AS DOUBLE) * 1048576.0, 0) AS BIGINT)) AS qv
      |  FROM embeddings),
      |g AS (SELECT label, count(*) AS n FROM q GROUP BY 1)
      |SELECT CAST(q.label AS BIGINT) AS label, CAST(d.d AS BIGINT) AS dim,
      |  round(CAST(sum(qv[d.d]) AS DOUBLE) / any_value(g.n) / 1048576.0, 6)
      |    + 0.0 AS centroid
      |FROM q JOIN g ON q.label = g.label, range(1, 65) d(d)
      |GROUP BY q.label, d.d""".stripMargin

  /** Leakage-safe train/val/test split: the hash-range splitter
    * ([[graft.operators.Sampling.split]]) keyed on the NEAR-DUP
    * CLUSTER instead of the document — a plain per-doc split leaks
    * eval data whenever a test document's near-duplicate lands in
    * train (exactly what the planted variants here do), so the whole
    * [[graft.operators.ConnectedComponents]] cluster moves as one
    * unit. Singletons (no candidate pair) key on their own id. Scale
    * shape: clustering is the audited q_dedup_clusters path; the
    * extra work on top is one id-keyed join and a map-only hash tag.
    */
  def splitLeakageSafe(s: SparkSession, dir: String): DataFrame = {
    val labels = graft.operators.ConnectedComponents.resolve(
      DedupQueries.dedupMinHash(s, dir), "id_a", "id_b")
      .withColumnRenamed("node", "doc_id")
    val withCluster = DedupQueries.nearDupCorpus(s, dir).select("doc_id")
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster"))
    graft.operators.Sampling.split(withCluster, "cluster", seed = 13L,
      fractions = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
  }

  val splitLeakageSafeSql: String =
    s"""WITH RECURSIVE ${DedupQueries.minHashPairsCtes},
       |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(v, u) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT r.v, e.b FROM reach r JOIN edges e ON r.u = e.a),
       |labels AS (SELECT v AS doc_id, min(u) AS component FROM reach GROUP BY 1),
       |alldocs AS (${DedupQueries.nearDupCorpusSql}),
       |cl AS (SELECT c.doc_id, coalesce(l.component, c.doc_id) AS cluster
       |  FROM alldocs c LEFT JOIN labels l ON c.doc_id = l.doc_id)
       |SELECT doc_id, cluster,
       |  CASE WHEN u < 0.75 THEN 'train'
       |       WHEN u < 0.875 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM (SELECT doc_id, cluster,
       |  CAST(('0x' || substr(sha256('13:' || CAST(cluster AS VARCHAR)), 1, 8)) AS BIGINT)
       |    / 4294967296.0 AS u
       |FROM cl)""".stripMargin

  /** Dictionary blocklist gate ([[graft.operators.Blocklist]]): one
    * Aho–Corasick pass per document vs O(terms) substring scans. The
    * term list deliberately nests ("scan" inside "slow scan") to
    * exercise output-closure hits, and every term is borderless (no
    * proper prefix equals a suffix), so occurrences cannot overlap
    * themselves and the oracle's single-pass `replace` count equals
    * the automaton's every-end-position count exactly.
    */
  val blocklistTerms: Seq[String] = Seq(
    "slow scan", "scan", "big table", "hash join", "merge batch",
    "stream", "vector")

  def blocklistGate(s: SparkSession, dir: String): DataFrame =
    graft.operators.Blocklist.score(
      t(s, dir, "documents"), "doc_id", "text", blocklistTerms)

  val blocklistGateSql: String = {
    // documents text is ASCII, so DuckDB's char-counting length()
    // agrees with the automaton's byte walk
    val hits = blocklistTerms.map(term =>
      s"(length(t) - length(replace(t, '$term', ''))) // ${term.length}")
      .mkString("\n|    + ")
    val present = blocklistTerms.map(term =>
      s"CAST(contains(t, '$term') AS BIGINT)").mkString("\n|    + ")
    s"""WITH n AS (SELECT doc_id,
       |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
       |  FROM documents)
       |SELECT doc_id AS id,
       |  $hits AS n_hits,
       |  $present AS n_terms,
       |  ($present) > 0 AS blocked
       |FROM n""".stripMargin
  }

  /** KMV/theta-sketch source-overlap estimates
    * ([[graft.operators.ThetaSketch]]) — the bounded-state companion
    * of q_source_overlap's exact matrix. The sketch (k smallest
    * distinct portable shingle hashes per source) is deterministic
    * and order-independent, so the ESTIMATES replay bit-identically
    * in DuckDB: same k-min sets, same θ, same divisions.
    */
  def sourceOverlapSketch(s: SparkSession, dir: String): DataFrame =
    graft.operators.ThetaSketch.overlapMatrix(
      t(s, dir, "documents"), "source", "text", n = 8, k = 256)

  val sourceOverlapSketchSql: String =
    """WITH norm AS (
      |  SELECT doc_id, source, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, source, unnest(string_split(nt, ' ')) AS w,
      |    generate_subscripts(string_split(nt, ' '), 1) AS p
      |  FROM norm),
      |grams AS (
      |  SELECT DISTINCT source,
      |    CAST(('0x' || substr(sha256(
      |      w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win || ' ' ||
      |      lead(w, 3) OVER win || ' ' || lead(w, 4) OVER win || ' ' ||
      |      lead(w, 5) OVER win || ' ' || lead(w, 6) OVER win || ' ' ||
      |      lead(w, 7) OVER win), 1, 8)) AS BIGINT) AS gram
      |  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY p)
      |  QUALIFY lead(w, 7) OVER win IS NOT NULL),
      |r AS (SELECT source, gram,
      |    row_number() OVER (PARTITION BY source ORDER BY gram) AS rn,
      |    count(*) OVER (PARTITION BY source) AS nd
      |  FROM grams),
      |th AS (SELECT source, max(nd) AS nd,
      |    CASE WHEN max(nd) >= 256
      |      THEN (max(CASE WHEN rn = 256 THEN gram END) + 1) / 4294967296.0
      |      ELSE 1.0 END AS theta
      |  FROM r GROUP BY source),
      |samp AS (SELECT r.source, r.gram
      |  FROM r JOIN th ON r.source = th.source
      |  WHERE r.rn <= CASE WHEN th.nd >= 256 THEN 255 ELSE th.nd END),
      |prs AS (SELECT a.source AS sa, b.source AS sb,
      |    least(a.theta, b.theta) AS theta
      |  FROM th a JOIN th b ON a.source < b.source),
      |flt AS (SELECT p.sa, p.sb, p.theta, s.gram, s.source
      |  FROM prs p JOIN samp s ON (s.source = p.sa OR s.source = p.sb)
      |    AND (s.gram + 1) / 4294967296.0 < p.theta),
      |per AS (SELECT sa, sb, theta, gram, count(DISTINCT source) AS cs
      |  FROM flt GROUP BY 1, 2, 3, 4),
      |agg AS (SELECT sa, sb, theta,
      |    CAST(sum(CASE WHEN cs = 2 THEN 1 ELSE 0 END) AS BIGINT) AS ci,
      |    count(*) AS cu
      |  FROM per GROUP BY 1, 2, 3)
      |SELECT p.sa AS src_a, p.sb AS src_b,
      |  round(coalesce(a.ci, 0) / p.theta, 6) AS est_shared,
      |  round(coalesce(a.cu, 0) / p.theta, 6) AS est_union,
      |  CASE WHEN coalesce(a.cu, 0) = 0 THEN 0.0
      |    ELSE round(CAST(a.ci AS DOUBLE) / a.cu, 6) END AS est_jaccard
      |FROM prs p LEFT JOIN agg a ON p.sa = a.sa AND p.sb = a.sb""".stripMargin

  /** ANN index-quality evaluation: recall@5 of the IVF probe
    * ([[SimsearchQueries.simsearchIvf]]) against the exact brute-force ground truth
    * ([[SimsearchQueries.simsearchTopK]]), per query vector. The standard acceptance
    * gate before swapping an approximate index into a retrieval
    * pipeline — run on a sampled query set, it prices the
    * nprobe/recall trade with real corpus geometry instead of trusting
    * the index's own training loss.
    *
    * Scale shape: both sides are k-bounded per query (k rows each), so
    * the hit join and the per-query rollup move k×|queries| rows — the
    * corpus-sized work happens inside the two audited search operators.
    */
  def annRecall(s: SparkSession, dir: String): DataFrame = {
    val k = 5
    val exact = SimsearchQueries.simsearchTopK(s, dir).select("query_id", "neighbor_id")
    val approx = SimsearchQueries.simsearchIvf(s, dir).select("query_id", "neighbor_id")
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    exact.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("recall_at_5", round(col("n_hits") / lit(k.toDouble), 6))
  }

  val annRecallSql: String =
    """WITH n AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                   CAST(embedding AS DOUBLE[])))) AS nv
      |  FROM embeddings),
      |q AS (SELECT vec_id AS query_id, nv AS qv FROM n WHERE vec_id < 10),
      |ex_scored AS (SELECT query_id, n.vec_id AS neighbor_id,
      |    round(list_dot_product(qv, n.nv), 6) AS cos_sim
      |  FROM q, n WHERE n.vec_id <> query_id),
      |ex_ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |  ORDER BY cos_sim DESC, neighbor_id) AS rn FROM ex_scored),
      |ex AS (SELECT query_id, neighbor_id FROM ex_ranked WHERE rn <= 5),
      |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, nv AS cv
      |  FROM n ORDER BY vec_id LIMIT 16),
      |assigned AS (SELECT n.vec_id, n.nv,
      |    (SELECT c.cell FROM cent c
      |     ORDER BY list_dot_product(n.nv, c.cv) DESC, c.cell LIMIT 1) AS cell
      |  FROM n),
      |probes AS (SELECT q.query_id, q.qv, p.cell
      |  FROM q, LATERAL (SELECT c.cell FROM cent c
      |    ORDER BY list_dot_product(q.qv, c.cv) DESC, c.cell LIMIT 4) p),
      |iv_scored AS (SELECT p.query_id, a.vec_id AS neighbor_id,
      |    round(list_dot_product(p.qv, a.nv), 6) AS cos_sim
      |  FROM probes p JOIN assigned a ON p.cell = a.cell
      |  WHERE a.vec_id <> p.query_id),
      |iv_ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |  ORDER BY cos_sim DESC, neighbor_id) AS rn FROM iv_scored),
      |iv AS (SELECT query_id, neighbor_id FROM iv_ranked WHERE rn <= 5),
      |hits AS (SELECT e.query_id, count(*) AS n
      |  FROM ex e JOIN iv i ON e.query_id = i.query_id
      |    AND e.neighbor_id = i.neighbor_id
      |  GROUP BY 1)
      |SELECT q.query_id, CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
      |  round(coalesce(h.n, 0) / 5.0, 6) AS recall_at_5
      |FROM q LEFT JOIN hits h ON q.query_id = h.query_id""".stripMargin

  /** Weighted sampling without replacement
    * ([[graft.operators.Sampling.weightedSample]]): 100 documents
    * drawn proportional to character count — the corpus subsample
    * whose TOKEN mass, not doc count, is representative. Key order
    * (`ln(u)/w`) replays in DuckDB from the same portable hash; the
    * key itself stays out of the output so the comparison is over
    * membership, not transcendental bit patterns.
    */
  def weightedSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.weightedSample(
      t(s, dir, "documents").select("doc_id", "n_chars"),
      "doc_id", "n_chars", k = 100, seed = 17L)
      .withColumnRenamed("n_chars", "weight")

  val weightedSampleSql: String =
    """SELECT doc_id, n_chars AS weight FROM (
      |  SELECT doc_id, n_chars,
      |    ln((CAST(('0x' || substr(sha256('17:' || CAST(doc_id AS VARCHAR)), 1, 8))
      |         AS BIGINT) + 0.5) / 4294967296.0) / n_chars AS es_key
      |  FROM documents WHERE n_chars > 0)
      |ORDER BY es_key DESC, doc_id LIMIT 100""".stripMargin

  /** Per-source weighted sampling
    * ([[graft.operators.Sampling.weightedSampleGrouped]]): the k best
    * Efraimidis–Spirakis keys within each source — the per-stratum
    * form the streaming reservoir ([[graft.streaming.ReservoirStream]])
    * converges to exactly. One exchange on the stratum key.
    */
  def weightedSampleGrouped(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.weightedSampleGrouped(
      t(s, dir, "documents").select("source", "doc_id", "n_chars"),
      "source", "doc_id", "n_chars", k = 20, seed = 17L)
      .withColumnRenamed("n_chars", "weight")

  val weightedSampleGroupedSql: String =
    """SELECT source, doc_id, n_chars AS weight, CAST(rn AS BIGINT) AS sample_rank
      |FROM (SELECT source, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY source ORDER BY
      |      ln((CAST(('0x' || substr(sha256('17:' || CAST(doc_id AS VARCHAR)), 1, 8))
      |           AS BIGINT) + 0.5) / 4294967296.0) / n_chars DESC,
      |      doc_id) AS rn
      |  FROM documents WHERE n_chars > 0)
      |WHERE rn <= 20""".stripMargin

  /** Unicode NFC normalization ([[graft.plans.NativeNorm]]): the
    * canonical-composition pass every hash/dedup pipeline needs before
    * signatures (composed "é" and decomposed "e"+U+0301 are different
    * bytes for the same text). The fixture corpus is ASCII, so a
    * deterministic decomposed suffix is appended on BOTH engines to
    * prove the kernel recomposes: lengths shrink by exactly the two
    * combining marks and the recomposed tail hashes identically.
    */
  def unicodeNorm(s: SparkSession, dir: String): DataFrame = {
    val decomposed = concat(col("text"), lit("é Å"))
    t(s, dir, "documents").select(
      col("doc_id"),
      length(decomposed).cast("long").as("n_raw"),
      length(graft.plans.NativeNorm.nfc(decomposed)).cast("long").as("n_nfc"),
      substring(graft.plans.NativeNorm.nfc(decomposed), -3, 3).as("nfc_tail"))
  }

  val unicodeNormSql: String =
    """SELECT doc_id,
      |  length(text || 'e' || chr(769) || ' A' || chr(778)) AS n_raw,
      |  length(nfc_normalize(text || 'e' || chr(769) || ' A' || chr(778))) AS n_nfc,
      |  right(nfc_normalize(text || 'e' || chr(769) || ' A' || chr(778)), 3) AS nfc_tail
      |FROM documents""".stripMargin

  /** Freshness-decayed per-user activity: each event contributes
    * `value · 2^-age_days` (age capped at 20 days), the standard
    * recency weighting for data-curation priority and user-activity
    * features. The decay factor is a power of two and the value is
    * decimal-quantized to cents, so every contribution is an exact
    * integer — the fold is order-independent and engine-portable with
    * no floating-point epsilon, the same trick the correlation/OLS
    * moment passes use. One scan + one grouped agg; the global max
    * timestamp broadcasts as a one-row aggregate.
    */
  def decayWeights(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val mx = e.agg(max("ts").as("max_ts"))
    e.crossJoin(broadcast(mx))
      .withColumn("days", least(
        expr("(unix_timestamp(max_ts) - unix_timestamp(ts)) DIV 86400"),
        lit(20L)))
      .withColumn("contrib", expr(
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) * " +
          "shiftleft(CAST(1 AS BIGINT), CAST(20 - days AS INT))"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("contrib").as("sc"))
      // 100 (cents) * 2^20 (full-weight shift) = 104857600
      .select(col("user_id"), col("n_events"),
        round(col("sc") / lit(104857600.0), 6).as("decayed_activity"))
  }

  val decayWeightsSql: String =
    """WITH mx AS (SELECT max(ts) AS m FROM events),
      |d AS (SELECT user_id,
      |    least(date_diff('second', ts, (SELECT m FROM mx)) // 86400, 20) AS days,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
      |  FROM events)
      |SELECT user_id, count(*) AS n_events,
      |  round(sum(vc * CAST(power(2, 20 - days) AS BIGINT)) / 104857600.0, 6)
      |    AS decayed_activity
      |FROM d GROUP BY 1""".stripMargin

  /** Deflate compression ratio
    * ([[graft.plans.NativeNorm.compressionRatio]]): the cheap
    * low-entropy/boilerplate proxy quality filters run beside the
    * Gopher rules. DuckDB exposes no deflate, so the oracle
    * adjudicates the KERNEL on pinned inputs instead of replaying the
    * codec: six deterministic entropy classes (empty, single char,
    * pure run, phrase repetition, prose, sha-chain hex) flow through
    * the native expression in-plan, and the oracle carries the
    * expected (n_bytes, ratio) rows — values pinned to the identical
    * constants NativeNormSpec asserts, so any JVM/zlib drift fails
    * `sbt test` locally before it can fail the driver gate. The
    * corpus-scale application is the same expression over a text
    * column (map-only, codegen'd; see NativeNormSpec's corpus tests).
    */
  def compressionRatio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // deterministic pseudo-random hex: sha-256 chain from a fixed seed
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = new StringBuilder
    var h = "graft-compression-seed".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    (0 until 32).foreach { _ =>
      h = md.digest(h)
      h.foreach(b => hex.append(f"${b & 0xff}%02x"))
    }
    val prose = "Compression ratio is a cheap proxy for text entropy: " +
      "natural prose compresses to roughly a third of its size, " +
      "boilerplate and repeated navigation chrome compress far " +
      "below that, and random hex barely compresses at all. " +
      "Quality filters exploit this: a document whose deflate " +
      "ratio sits well under the prose band is almost always " +
      "machine-generated repetition, and a ratio near one on " +
      "long text signals binary junk that slipped past the " +
      "decoder. The thresholds are calibrated per corpus."
    Seq(
      ("c1_empty", ""),
      ("c2_single_char", "a"),
      ("c3_run_4096", "a" * 4096),
      ("c4_phrase_repeat", "the quick brown fox jumps over the lazy dog. " * 96),
      ("c5_prose", prose),
      ("c6_hex_chain", hex.toString)).toDF("case_id", "text")
      .select(
        col("case_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        round(graft.plans.NativeNorm.compressionRatio(col("text")), 6)
          .as("compression_ratio"))
  }

  val compressionRatioSql: String =
    """SELECT * FROM (VALUES
      |  ('c1_empty',        CAST(0    AS BIGINT), CAST(1.0      AS DOUBLE)),
      |  ('c2_single_char',  CAST(1    AS BIGINT), CAST(3.0      AS DOUBLE)),
      |  ('c3_run_4096',     CAST(4096 AS BIGINT), CAST(0.005371 AS DOUBLE)),
      |  ('c4_phrase_repeat',CAST(4320 AS BIGINT), CAST(0.016898 AS DOUBLE)),
      |  ('c5_prose',        CAST(484  AS BIGINT), CAST(0.595041 AS DOUBLE)),
      |  ('c6_hex_chain',    CAST(2048 AS BIGINT), CAST(0.561035 AS DOUBLE))
      |) AS t(case_id, n_bytes, compression_ratio)""".stripMargin

  /** Pairwise source redundancy ([[graft.operators.Divergence
    * .jsDivergence]]): Jensen–Shannon divergence between the unigram
    * distributions of every source pair — the mixture-design signal
    * behind sampling weights (near-zero JS ⇒ distributionally
    * redundant sources; near ln 2 ⇒ disjoint). Vocab-bounded
    * aggregates; decimal-folded contributions replay exactly.
    */
  def sourceDivergence(s: SparkSession, dir: String): DataFrame =
    Divergence.jsDivergence(t(s, dir, "documents"), "source", "text")

  val sourceDivergenceSql: String =
    """WITH tok AS (
      |  SELECT source, unnest(string_split(
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
      |  FROM documents),
      |cnt AS (SELECT source, w, count(*) AS c FROM tok WHERE w <> '' GROUP BY 1, 2),
      |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS t FROM cnt GROUP BY 1),
      |wp AS (SELECT c.source, c.w, c.c, t.t FROM cnt c JOIN tot t ON t.source = c.source),
      |shared AS (
      |  SELECT a.source AS sa, b.source AS sb, count(*) AS n_shared,
      |    sum(CAST(round(
      |      ((CAST(a.c AS DOUBLE) / CAST(a.t AS DOUBLE)) *
      |         ln((CAST(a.c AS DOUBLE) / CAST(a.t AS DOUBLE)) * 2.0 /
      |            ((CAST(a.c AS DOUBLE) / CAST(a.t AS DOUBLE)) +
      |             (CAST(b.c AS DOUBLE) / CAST(b.t AS DOUBLE)))) +
      |       (CAST(b.c AS DOUBLE) / CAST(b.t AS DOUBLE)) *
      |         ln((CAST(b.c AS DOUBLE) / CAST(b.t AS DOUBLE)) * 2.0 /
      |            ((CAST(a.c AS DOUBLE) / CAST(a.t AS DOUBLE)) +
      |             (CAST(b.c AS DOUBLE) / CAST(b.t AS DOUBLE))))) * 0.5,
      |      7) AS DECIMAL(27,7))) AS j_shared,
      |    sum(CAST(round(CAST(a.c AS DOUBLE) / CAST(a.t AS DOUBLE), 7)
      |      AS DECIMAL(27,7))) AS pa_shared,
      |    sum(CAST(round(CAST(b.c AS DOUBLE) / CAST(b.t AS DOUBLE), 7)
      |      AS DECIMAL(27,7))) AS pb_shared
      |  FROM wp a JOIN wp b ON a.w = b.w AND a.source < b.source
      |  GROUP BY 1, 2),
      |vocab AS (SELECT source, CAST(count(*) AS BIGINT) AS v FROM cnt GROUP BY 1),
      |pairs AS (SELECT a.source AS sa, a.v AS va, b.source AS sb, b.v AS vb
      |  FROM vocab a, vocab b WHERE a.source < b.source)
      |SELECT p.sa AS source_a, p.sb AS source_b,
      |  CAST(p.va + p.vb - coalesce(s.n_shared, 0) AS BIGINT) AS n_terms,
      |  round(coalesce(CAST(s.j_shared AS DOUBLE), 0.0) +
      |    0.5 * 0.6931471805599453 * (2.0 -
      |      coalesce(CAST(s.pa_shared AS DOUBLE), 0.0) -
      |      coalesce(CAST(s.pb_shared AS DOUBLE), 0.0)), 6) AS js_divergence
      |FROM pairs p LEFT JOIN shared s ON s.sa = p.sa AND s.sb = p.sb""".stripMargin

  /** Diversity-aware subset selection
    * ([[graft.operators.SimilaritySearch.kCenterSelect]]): greedy
    * k-center over the embedding corpus — 8 centers covering the
    * space, the post-dedup "don't sample the dense blob twice"
    * selector. Per-pair cosine rounds to 6 dp before every min/argmax,
    * so the greedy trajectory is a total order DuckDB replays exactly
    * (recursive CTE).
    */
  def diverseSubset(s: SparkSession, dir: String): DataFrame =
    SimilaritySearch.kCenterSelect(
      t(s, dir, "embeddings"), "vec_id", "embedding", k = 8)

  val diverseSubsetSql: String =
    """WITH RECURSIVE n AS (
      |  SELECT vec_id AS id, list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                   CAST(embedding AS DOUBLE[])))) AS nv
      |  FROM embeddings
      |  WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
      |                         CAST(embedding AS DOUBLE[])) > 0),
      |sel(rank, id, min_dist, ids) AS (
      |  SELECT 1, (SELECT min(id) FROM n), CAST(NULL AS DOUBLE),
      |    [(SELECT min(id) FROM n)]
      |  UNION ALL
      |  SELECT s.rank + 1, w.id, w.d, list_append(s.ids, w.id)
      |  FROM sel s, LATERAL (
      |    SELECT p.id, 1 - max(round(list_dot_product(p.nv, c.nv), 6)) AS d
      |    FROM n p, n c
      |    WHERE list_contains(s.ids, c.id) AND NOT list_contains(s.ids, p.id)
      |    GROUP BY p.id ORDER BY d DESC, p.id LIMIT 1) w
      |  WHERE s.rank < 8)
      |SELECT rank AS center_rank, id AS vec_id, round(min_dist, 6) AS min_dist
      |FROM sel""".stripMargin

  /** Distributed (batched) k-center
    * ([[graft.operators.SimilaritySearch.kCenterSelectBatch]]): exact
    * Gonzalez inside each of 8 `vec_id mod 8` shards (one executor
    * task each, no driver round-trips), then exact Gonzalez over the
    * ≤48 shard candidates — the k-regime scale path the sequential
    * [[diverseSubset]] cannot reach. The oracle replays both phases
    * in recursive SQL, so the trajectory (seed = min id, 6-dp-rounded
    * cosine, ties on smaller id, per shard and in the finish) is
    * pinned end to end.
    */
  def diverseSubsetBatch(s: SparkSession, dir: String): DataFrame =
    SimilaritySearch.kCenterSelectBatch(
      t(s, dir, "embeddings"), "vec_id", "embedding", k = 6,
      maxCandidates = 48, shards = 8)

  val diverseSubsetBatchSql: String =
    """WITH RECURSIVE n AS (
      |  SELECT vec_id AS id, vec_id % 8 AS shard,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                   CAST(embedding AS DOUBLE[])))) AS nv
      |  FROM embeddings
      |  WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
      |                         CAST(embedding AS DOUBLE[])) > 0),
      |p1(rank, shard, ids) AS (
      |  SELECT 1, shard, [min(id)] FROM n GROUP BY shard
      |  UNION ALL
      |  SELECT s.rank + 1, s.shard, list_append(s.ids, w.id)
      |  FROM p1 s, LATERAL (
      |    SELECT p.id, 1 - max(round(list_dot_product(p.nv, c.nv), 6)) AS d
      |    FROM n p, n c
      |    WHERE p.shard = s.shard AND c.shard = s.shard
      |      AND list_contains(s.ids, c.id) AND NOT list_contains(s.ids, p.id)
      |    GROUP BY p.id ORDER BY d DESC, p.id LIMIT 1) w
      |  WHERE s.rank < 6),
      |fin AS (SELECT shard, ids FROM (
      |  SELECT shard, ids,
      |    row_number() OVER (PARTITION BY shard ORDER BY rank DESC) AS rn
      |  FROM p1) WHERE rn = 1),
      |m AS (SELECT n.id, n.nv FROM n
      |  JOIN (SELECT DISTINCT unnest(ids) AS id FROM fin) c USING (id)),
      |sel(rank, id, min_dist, ids) AS (
      |  SELECT 1, (SELECT min(id) FROM m), CAST(NULL AS DOUBLE),
      |    [(SELECT min(id) FROM m)]
      |  UNION ALL
      |  SELECT s.rank + 1, w.id, w.d, list_append(s.ids, w.id)
      |  FROM sel s, LATERAL (
      |    SELECT p.id, 1 - max(round(list_dot_product(p.nv, c.nv), 6)) AS d
      |    FROM m p, m c
      |    WHERE list_contains(s.ids, c.id) AND NOT list_contains(s.ids, p.id)
      |    GROUP BY p.id ORDER BY d DESC, p.id LIMIT 1) w
      |  WHERE s.rank < 6)
      |SELECT rank AS center_rank, id AS vec_id, round(min_dist, 6) AS min_dist
      |FROM sel""".stripMargin

  /** Temperature-scaled mixture plan
    * ([[graft.operators.Curation.mixturePlan]]): per-source sampling
    * weights `mass^(1/T)` renormalized (T = 2), plus integer document
    * quotas summing exactly to the 1000-doc budget via
    * largest-remainder apportionment — the multilingual rebalancing
    * step that lifts low-resource sources. One corpus aggregate;
    * everything else runs on the |sources|-row table.
    */
  def mixturePlan(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.mixturePlan(
      t(s, dir, "documents"), "source", "n_chars",
      temperature = 2.0, totalQuota = 1000L)

  val mixturePlanSql: String =
    """WITH agg AS (SELECT source, count(*) AS n_docs,
      |    CAST(sum(n_chars) AS BIGINT) AS mass FROM documents GROUP BY 1),
      |s AS (SELECT *, CAST(round(power(CAST(mass AS DOUBLE), 0.5), 6)
      |    AS DECIMAL(27,6)) AS sc FROM agg),
      |t AS (SELECT *, sum(sc) OVER () AS tot FROM s),
      |e AS (SELECT *, 1000.0 * (CAST(sc AS DOUBLE) / CAST(tot AS DOUBLE)) AS ex
      |  FROM t),
      |b AS (SELECT *, CAST(floor(ex) AS BIGINT) AS base,
      |    ex - CAST(floor(ex) AS BIGINT) AS rem FROM e),
      |r AS (SELECT *, 1000 - sum(base) OVER () AS leftover,
      |    row_number() OVER (ORDER BY rem DESC, source) AS rk FROM b)
      |SELECT source, n_docs, mass,
      |  round(CAST(sc AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS weight,
      |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS quota
      |FROM r""".stripMargin

  /** Per-source Zipf slope ([[graft.operators.Divergence.zipfSlope]]):
    * OLS slope of ln(freq) on ln(rank) over each source's top-200
    * terms — the naturalness audit (prose ≈ −1; templated text
    * flattens). Rank order is total (count desc, term asc), so both
    * engines rank identically; moments fold through DECIMAL(27,7).
    */
  def zipfSlope(s: SparkSession, dir: String): DataFrame =
    Divergence.zipfSlope(t(s, dir, "documents"), "source", "text")

  val zipfSlopeSql: String =
    """WITH tok AS (
      |  SELECT source, unnest(string_split(
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
      |  FROM documents),
      |cnt AS (SELECT source, w, count(*) AS c FROM tok WHERE w <> '' GROUP BY 1, 2),
      |ranked AS (SELECT source, w, c,
      |    row_number() OVER (PARTITION BY source ORDER BY c DESC, w) AS rank
      |  FROM cnt),
      |pts AS (SELECT source,
      |    CAST(round(ln(CAST(rank AS DOUBLE)), 7) AS DECIMAL(27,7)) AS x,
      |    CAST(round(ln(CAST(c AS DOUBLE)), 7) AS DECIMAL(27,7)) AS y,
      |    CAST(round(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE)), 7)
      |      AS DECIMAL(27,7)) AS xx,
      |    CAST(round(ln(CAST(rank AS DOUBLE)) * ln(CAST(c AS DOUBLE)), 7)
      |      AS DECIMAL(27,7)) AS xy
      |  FROM ranked WHERE rank <= 200),
      |m AS (SELECT source, count(*) AS n_terms,
      |    sum(x) AS sx, sum(y) AS sy, sum(xx) AS sxx, sum(xy) AS sxy
      |  FROM pts GROUP BY 1)
      |SELECT source, n_terms,
      |  round((CAST(n_terms AS DOUBLE) * CAST(sxy AS DOUBLE) -
      |         CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |        (CAST(n_terms AS DOUBLE) * CAST(sxx AS DOUBLE) -
      |         CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS zipf_slope
      |FROM m""".stripMargin

  /** Vocabulary coverage ([[graft.operators.Lexicon.vocabCoverage]]):
    * per-document OOV rate against the corpus' own top-K unigram
    * vocabulary — the "would a K-entry tokenizer cover this document"
    * audit. K = 16 here so the fixture's 31-term vocabulary actually
    * splits (a K above the corpus vocab would make every rate 0).
    * Vocab membership is a total order (count desc, term asc); the
    * K-row vocab broadcasts into the membership join.
    */
  def vocabCoverage(s: SparkSession, dir: String): DataFrame =
    Lexicon.vocabCoverage(t(s, dir, "documents"), "doc_id", "text",
      vocabSize = 16)

  val vocabCoverageSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
      |  FROM documents),
      |tk AS (SELECT doc_id, w FROM tok WHERE w <> ''),
      |vocab AS (SELECT w FROM (
      |  SELECT w, count(*) AS c FROM tk GROUP BY 1
      |  ORDER BY c DESC, w LIMIT 16)),
      |per AS (
      |  SELECT t.doc_id, count(*) AS n_tokens,
      |    sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS n_oov
      |  FROM tk t LEFT JOIN vocab v ON v.w = t.w GROUP BY 1)
      |SELECT doc_id, n_tokens, CAST(n_oov AS BIGINT) AS n_oov,
      |  round(CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS oov_rate
      |FROM per""".stripMargin

  /** Source-distinctive terms
    * ([[graft.operators.Lexicon.distinctiveTerms]]): Monroe et al.
    * log-odds z-score with an informative Dirichlet prior (alpha0 =
    * 100 scaled by global frequency), top-10 terms per source — WHAT
    * each source contributes lexically. Ranking is on the 6-dp-rounded
    * z with a term tie-break, a total order both engines replay.
    */
  def distinctiveTerms(s: SparkSession, dir: String): DataFrame =
    Lexicon.distinctiveTerms(t(s, dir, "documents"), "source", "text")

  val distinctiveTermsSql: String =
    """WITH tok AS (
      |  SELECT source, unnest(string_split(
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
      |  FROM documents),
      |cnt AS (SELECT source, w, count(*) AS c FROM tok WHERE w <> '' GROUP BY 1, 2),
      |g AS (SELECT w, CAST(sum(c) AS BIGINT) AS cw FROM cnt GROUP BY 1),
      |st AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM cnt GROUP BY 1),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM cnt),
      |j AS (SELECT c.source, c.w, c.c, g.cw, st.ns, tot.nn
      |  FROM cnt c JOIN g USING (w) JOIN st USING (source) CROSS JOIN tot),
      |z AS (SELECT source, w AS term, c AS c_source,
      |  CAST(cw - c AS BIGINT) AS c_rest,
      |  round((ln((CAST(c AS DOUBLE) +
      |        100.0 * CAST(cw AS DOUBLE) / CAST(nn AS DOUBLE)) /
      |      greatest(CAST(ns AS DOUBLE) + 100.0 - CAST(c AS DOUBLE) -
      |        100.0 * CAST(cw AS DOUBLE) / CAST(nn AS DOUBLE), 1e-12)) -
      |     ln((CAST(cw AS DOUBLE) - CAST(c AS DOUBLE) +
      |        100.0 * CAST(cw AS DOUBLE) / CAST(nn AS DOUBLE)) /
      |      greatest(CAST(nn AS DOUBLE) - CAST(ns AS DOUBLE) + 100.0 -
      |        (CAST(cw AS DOUBLE) - CAST(c AS DOUBLE)) -
      |        100.0 * CAST(cw AS DOUBLE) / CAST(nn AS DOUBLE), 1e-12))) /
      |    sqrt(1.0 / (CAST(c AS DOUBLE) +
      |        100.0 * CAST(cw AS DOUBLE) / CAST(nn AS DOUBLE)) +
      |      1.0 / (CAST(cw AS DOUBLE) - CAST(c AS DOUBLE) +
      |        100.0 * CAST(cw AS DOUBLE) / CAST(nn AS DOUBLE))), 6) AS keyness
      |  FROM j),
      |r AS (SELECT *, row_number() OVER (
      |  PARTITION BY source ORDER BY keyness DESC, term) AS rk FROM z)
      |SELECT source, CAST(rk AS BIGINT) AS rank, term, c_source, c_rest, keyness
      |FROM r WHERE rk <= 10""".stripMargin

  /** Lexical diversity ([[graft.operators.Lexicon.tokenEntropy]]):
    * per-document unigram Shannon entropy (nats) and type–token
    * ratio — the template/spam signal character-level repetition
    * misses. Per-term `c·ln c` folds through DECIMAL(27,7).
    */
  def tokenEntropy(s: SparkSession, dir: String): DataFrame =
    Lexicon.tokenEntropy(t(s, dir, "documents"), "doc_id", "text")

  val tokenEntropySql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
      |  FROM documents),
      |tc AS (SELECT doc_id, w, count(*) AS c FROM tok WHERE w <> '' GROUP BY 1, 2),
      |p AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |    count(*) AS n_types,
      |    sum(CAST(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)), 7)
      |      AS DECIMAL(27,7))) AS s
      |  FROM tc GROUP BY 1)
      |SELECT doc_id, n_tokens, n_types,
      |  round(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS ttr,
      |  round(ln(CAST(n_tokens AS DOUBLE)) -
      |    CAST(s AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS entropy
      |FROM p""".stripMargin

  /** Behavioral transition matrix
    * ([[graft.operators.EventFlow.transitions]]): first-order Markov
    * transition counts, conditional probabilities, and PMI between
    * consecutive event types per user — the flow audit behind
    * sessionization/funnels. One user-keyed exchange for the lag;
    * everything after is |types|²-bounded.
    */
  def eventTransitions(s: SparkSession, dir: String): DataFrame =
    EventFlow.transitions(
      t(s, dir, "events"), "user_id", "ts", "event_type", "event_id")

  val eventTransitionsSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |pairs AS (SELECT prev AS prev_type, event_type AS next_type,
      |    count(*) AS n_trans
      |  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
      |o AS (SELECT prev_type, CAST(sum(n_trans) AS BIGINT) AS n_out
      |  FROM pairs GROUP BY 1),
      |i AS (SELECT next_type, CAST(sum(n_trans) AS BIGINT) AS n_in
      |  FROM pairs GROUP BY 1),
      |t AS (SELECT CAST(sum(n_trans) AS BIGINT) AS n_total FROM pairs)
      |SELECT p.prev_type, p.next_type, p.n_trans,
      |  round(CAST(p.n_trans AS DOUBLE) / CAST(o.n_out AS DOUBLE), 6) AS p_cond,
      |  round(ln(CAST(p.n_trans AS DOUBLE) * CAST(t.n_total AS DOUBLE) /
      |    (CAST(o.n_out AS DOUBLE) * CAST(i.n_in AS DOUBLE))), 6) AS pmi
      |FROM pairs p JOIN o USING (prev_type) JOIN i USING (next_type)
      |CROSS JOIN t""".stripMargin

  /** Embedding dimension profile
    * ([[graft.operators.VectorStats.dimProfile]]): per-dimension
    * n/mean/std/min/max over the corpus — the standardization /
    * whitening parameter table (dead or scale-dominant dimensions
    * distort every cosine). Exact [[graft.operators.Pca.Grid]]
    * integer-grid sums, so every statistic replays bit-for-bit.
    */
}
