package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Queries.t
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Split from the monolithic Queries.scala registry (round 11);
  * registered via [[graft.Queries.all]], oracled via [[graft.Queries.oracles]].
  */
object DedupQueries {

  /** Probabilistic record linkage
    * ([[graft.operators.RecordLinkage.link]]): customer vs a
    * deterministic "dirty re-extract" of itself (one or two name
    * digits corrupted, every 7th segment lost, every 13th nation
    * shifted) — blocked on the last four name digits, scored with
    * literal Fellegi–Sunter weights, classified match / possible /
    * non_match. The corruption sits OUTSIDE the blocking substring,
    * so true pairs always meet; verdicts split on which fields
    * survived.
    */
  private[graft] val linkageFields = {
    import graft.operators.RecordLinkage.LinkField
    Seq(
      LinkField("c_name", "r_name", m = 0.95, u = 0.001, maxDist = 2),
      LinkField("c_mktsegment", "r_mktsegment", m = 0.9, u = 0.2),
      LinkField("c_nationkey", "r_nationkey", m = 0.98, u = 0.04))
  }

  /** The linkage operating point's block guard — the ONE constant
    * every `link` call here and the [[blockingStats]] audit's
    * `dropped` predicate (and its oracle SQL) key off, so the
    * pre-join audit can never silently disagree with the join guard
    * it describes when the operating point moves.
    */
  private[graft] val LinkageMaxBlock: Long = 100L

  private[graft] def linkageLeft(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .withColumn("l_block", substring(col("c_name"), 15, 4))

  private[graft] def linkageRight(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(
      (col("c_custkey") + 1000000L).as("r_id"),
      concat(substring(col("c_name"), 1, 11), lit("X"),
        when(col("c_custkey") % 5 === 0, lit("Y"))
          .otherwise(substring(col("c_name"), 13, 1)),
        substring(col("c_name"), 14, 5)).as("r_name"),
      when(col("c_custkey") % 13 === 0, pmod(col("c_nationkey") + 1, lit(25)))
        .otherwise(col("c_nationkey")).as("r_nationkey"),
      when(col("c_custkey") % 7 === 0, lit("UNKNOWN"))
        .otherwise(col("c_mktsegment")).as("r_mktsegment"))
      .withColumn("r_block", substring(col("r_name"), 15, 4))

  def recordLinkage(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RecordLinkage
    val (scored, _) = RecordLinkage.link(
      linkageLeft(s, dir), linkageRight(s, dir),
      blockOn = Seq(("l_block", "r_block")),
      fields = linkageFields,
      keep = Seq("c_custkey", "r_id"),
      upper = 6.0, lower = 0.0, maxBlock = LinkageMaxBlock)
    scored
  }

  /** The linkage CTE chain (dirty feed, blocked candidates, F-S
    * weights) shared by the linkage, entity-cluster, and golden-
    * record oracles.
    */
  private[graft] val linkagePairCtes: String = {
    import graft.operators.RecordLinkage
    import graft.operators.RecordLinkage.LinkField
    val name = LinkField("c_name", "r_name", m = 0.95, u = 0.001, maxDist = 2)
    val seg = LinkField("c_mktsegment", "r_mktsegment", m = 0.9, u = 0.2)
    val nat = LinkField("c_nationkey", "r_nationkey", m = 0.98, u = 0.04)
    // the SAME driver-computed 6-dp literals the Spark plan carries
    def w(f: LinkField) =
      (RecordLinkage.agreeWeight(f), RecordLinkage.disagreeWeight(f))
    val (na, nd) = w(name); val (sa, sd) = w(seg); val (ka, kd) = w(nat)
    s"""dirty AS (SELECT c_custkey + 1000000 AS r_id,
      |    substr(c_name, 1, 11) || 'X' ||
      |      CASE WHEN c_custkey % 5 = 0 THEN 'Y'
      |           ELSE substr(c_name, 13, 1) END ||
      |      substr(c_name, 14, 5) AS r_name,
      |    CASE WHEN c_custkey % 13 = 0 THEN (c_nationkey + 1) % 25
      |         ELSE c_nationkey END AS r_nationkey,
      |    CASE WHEN c_custkey % 7 = 0 THEN 'UNKNOWN'
      |         ELSE c_mktsegment END AS r_mktsegment
      |  FROM customer),
      |cand AS (SELECT l.c_custkey, r.r_id,
      |    levenshtein(l.c_name, r.r_name) <= 2 AS agree_c_name,
      |    l.c_mktsegment = r.r_mktsegment AS agree_c_mktsegment,
      |    l.c_nationkey = r.r_nationkey AS agree_c_nationkey
      |  FROM customer l JOIN dirty r
      |    ON substr(l.c_name, 15, 4) = substr(r.r_name, 15, 4)),
      |w AS (SELECT *, round(
      |    CASE WHEN agree_c_name THEN CAST($na AS DOUBLE) ELSE $nd END +
      |    CASE WHEN agree_c_mktsegment THEN CAST($sa AS DOUBLE) ELSE $sd END +
      |    CASE WHEN agree_c_nationkey THEN CAST($ka AS DOUBLE) ELSE $kd END,
      |    6) AS weight
      |  FROM cand)""".stripMargin
  }

  val recordLinkageSql: String =
    s"""WITH $linkagePairCtes
      |SELECT *, CASE WHEN weight >= 6.0 THEN 'match'
      |  WHEN weight <= 0.0 THEN 'non_match'
      |  ELSE 'possible' END AS verdict FROM w""".stripMargin

  // ---- entity resolution COMPLETION: pairs → clusters → golden
  // record (the MDM loop: linkage scores pairs, connected components
  // assign entity ids, survivorship collapses each entity's variants
  // to one canonical row)

  /** Match pairs at the q_record_linkage operating point — the edge
    * list entity resolution closes over.
    */
  private[graft] def matchedPairs(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RecordLinkage
    val (scored, _) = RecordLinkage.link(
      linkageLeft(s, dir), linkageRight(s, dir),
      blockOn = Seq(("l_block", "r_block")),
      fields = linkageFields,
      keep = Seq("c_custkey", "r_id"),
      upper = 6.0, lower = 0.0, maxBlock = LinkageMaxBlock)
    scored.filter(col("verdict") === "match").select("c_custkey", "r_id")
  }

  /** Entity ids from the match pairs
    * ([[graft.operators.ConnectedComponents.resolve]] — min record id
    * per component): transitive closure turns pairwise verdicts into
    * entity CLUSTERS, so a dirty record matching two clean variants
    * lands in ONE entity instead of two half-merged ones.
    */
  def entityClusters(s: SparkSession, dir: String): DataFrame =
    graft.operators.ConnectedComponents.resolve(
      matchedPairs(s, dir), "c_custkey", "r_id")
      .select(col("node").as("rec_id"), col("component").as("entity_id"))

  /** Linkage evaluation against the fixture's construction truth
    * (every dirty row descends from exactly one clean row,
    * r_id = c_custkey + 10⁶): per-verdict confusion counts and
    * precision. The operating point's quality becomes a MEASURED
    * number — 'match' precision, how many true pairs the scorer left
    * in 'possible', and whether any true pair fell to 'non_match' —
    * instead of a docstring claim. One aggregate over the scored
    * pairs; output bounded by the three verdict classes.
    */
  def linkageEval(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RecordLinkage
    val (scored, _) = RecordLinkage.link(
      linkageLeft(s, dir), linkageRight(s, dir),
      blockOn = Seq(("l_block", "r_block")),
      fields = linkageFields, keep = Seq("c_custkey", "r_id"),
      upper = 6.0, lower = 0.0, maxBlock = LinkageMaxBlock)
    scored
      .withColumn("is_true", col("r_id") === col("c_custkey") + 1000000L)
      .groupBy("verdict")
      .agg(
        count(when(col("is_true"), lit(1))).as("n_true"),
        count(when(!col("is_true"), lit(1))).as("n_false"))
      .withColumn("precision",
        round(col("n_true").cast("double") /
          (col("n_true") + col("n_false")).cast("double"), 6))
  }

  val linkageEvalSql: String =
    s"""WITH $linkagePairCtes,
      |v AS (SELECT *, CASE WHEN weight >= 6.0 THEN 'match'
      |    WHEN weight <= 0.0 THEN 'non_match' ELSE 'possible' END AS verdict,
      |    r_id = c_custkey + 1000000 AS is_true FROM w)
      |SELECT verdict,
      |  CAST(count(CASE WHEN is_true THEN 1 END) AS BIGINT) AS n_true,
      |  CAST(count(CASE WHEN NOT is_true THEN 1 END) AS BIGINT) AS n_false,
      |  round(CAST(count(CASE WHEN is_true THEN 1 END) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE), 6) AS precision
      |FROM v GROUP BY 1""".stripMargin

  /** Blocking-plan report — the pre-join audit a 100 TB linkage runs
    * FIRST: per block key, both side sizes, the candidate volume the
    * blocked equi-join would generate (Σ |L_b|·|R_b| is the job's
    * real cost), and whether the maxBlock guard would drop it. Two
    * map-side-combined counts full-outer-joined on the block key —
    * |blocks|-bounded, never row-bounded; half-empty blocks surface
    * with zero candidates instead of vanishing.
    */
  def blockingStats(s: SparkSession, dir: String): DataFrame = {
    val l = linkageLeft(s, dir)
      .groupBy(col("l_block").as("block")).agg(count(lit(1)).as("l_n"))
    val r = linkageRight(s, dir)
      .groupBy(col("r_block").as("block")).agg(count(lit(1)).as("r_n"))
    l.join(r, Seq("block"), "full")
      .withColumn("l_n", coalesce(col("l_n"), lit(0L)))
      .withColumn("r_n", coalesce(col("r_n"), lit(0L)))
      .withColumn("candidates", col("l_n") * col("r_n"))
      .withColumn("dropped", col("candidates") > LinkageMaxBlock)
  }

  val blockingStatsSql: String =
    s"""WITH $linkagePairCtes,
      |lc AS (SELECT substr(c_name, 15, 4) AS block,
      |    CAST(count(*) AS BIGINT) AS l_n FROM customer GROUP BY 1),
      |rc AS (SELECT substr(r_name, 15, 4) AS block,
      |    CAST(count(*) AS BIGINT) AS r_n FROM dirty GROUP BY 1)
      |SELECT coalesce(lc.block, rc.block) AS block,
      |  coalesce(l_n, 0) AS l_n, coalesce(r_n, 0) AS r_n,
      |  coalesce(l_n, 0) * coalesce(r_n, 0) AS candidates,
      |  coalesce(l_n, 0) * coalesce(r_n, 0) > $LinkageMaxBlock AS dropped
      |FROM lc FULL OUTER JOIN rc ON lc.block = rc.block""".stripMargin

  /** The cluster CTEs appended after [[linkagePairCtes]] (needs
    * `WITH RECURSIVE`).
    */
  private[graft] val erClusterCtes: String =
    """matched AS (SELECT c_custkey, r_id FROM w WHERE weight >= 6.0),
      |er_edges AS (SELECT c_custkey AS a, r_id AS b FROM matched
      |  UNION SELECT r_id, c_custkey FROM matched),
      |reach(v, u) AS (
      |  SELECT a, a FROM er_edges
      |  UNION
      |  SELECT r2.v, e.b FROM reach r2 JOIN er_edges e ON r2.u = e.a),
      |comp AS (SELECT v AS rec_id, min(u) AS entity_id FROM reach GROUP BY 1)""".stripMargin

  val entityClustersSql: String =
    s"""WITH RECURSIVE $linkagePairCtes,
      |$erClusterCtes
      |SELECT rec_id, entity_id FROM comp""".stripMargin

  /** Every resolved record (clean + dirty feeds) with its entity
    * label; unmatched records are singleton entities of their own id.
    */
  private[graft] def erLabelledRecords(s: SparkSession, dir: String): DataFrame = {
    val clean = t(s, dir, "customer").select(
      col("c_custkey").as("rec_id"), col("c_name").as("name"),
      col("c_nationkey").cast("long").as("nationkey"),
      col("c_mktsegment").as("mktsegment"), col("c_acctbal").as("acctbal"))
    val dirty = linkageRight(s, dir).select(
      col("r_id").as("rec_id"), col("r_name").as("name"),
      col("r_nationkey").cast("long").as("nationkey"),
      col("r_mktsegment").as("mktsegment"),
      lit(null).cast("double").as("acctbal"))
    clean.unionByName(dirty)
      .join(entityClusters(s, dir), Seq("rec_id"), "left")
      .withColumn("entity_id", coalesce(col("entity_id"), col("rec_id")))
  }

  /** Golden record per resolved entity
    * ([[graft.operators.Survivorship.goldenRecord]]): modal name /
    * nation / segment (deterministic ties-to-lowest) and the best
    * known balance, one exchange on the entity key. The fixture's
    * clean-vs-dirty 1:1 ties exercise the tie rule on nearly every
    * entity.
    */
  def goldenRecord(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Survivorship._
    graft.operators.Survivorship.goldenRecord(
      erLabelledRecords(s, dir), "entity_id", Seq(
        MostFrequent("name", "name"),
        MostFrequent("nationkey", "nationkey"),
        MostFrequent("mktsegment", "mktsegment"),
        MaxOf("acctbal", "best_acctbal")))
  }

  private def erModeCte(attr: String): String =
    s"""${attr}_c AS (SELECT entity_id, $attr AS v, count(*) AS c
      |  FROM lab WHERE $attr IS NOT NULL GROUP BY 1, 2),
      |${attr}_m AS (SELECT entity_id, v FROM (SELECT entity_id, v,
      |    row_number() OVER (PARTITION BY entity_id
      |      ORDER BY c DESC, v ASC) AS rn FROM ${attr}_c) WHERE rn = 1)""".stripMargin

  val goldenRecordSql: String =
    s"""WITH RECURSIVE $linkagePairCtes,
      |$erClusterCtes,
      |records AS (SELECT c_custkey AS rec_id, c_name AS name,
      |    CAST(c_nationkey AS BIGINT) AS nationkey,
      |    c_mktsegment AS mktsegment, c_acctbal AS acctbal FROM customer
      |  UNION ALL SELECT r_id, r_name, CAST(r_nationkey AS BIGINT),
      |    r_mktsegment, NULL FROM dirty),
      |lab AS (SELECT r.rec_id, r.name, r.nationkey, r.mktsegment,
      |    r.acctbal, coalesce(c.entity_id, r.rec_id) AS entity_id
      |  FROM records r LEFT JOIN comp c ON r.rec_id = c.rec_id),
      |base AS (SELECT entity_id, CAST(count(*) AS BIGINT) AS n_records,
      |    max(acctbal) AS best_acctbal FROM lab GROUP BY 1),
      |${erModeCte("name")},
      |${erModeCte("nationkey")},
      |${erModeCte("mktsegment")}
      |SELECT b.entity_id, b.n_records, name_m.v AS name,
      |  nationkey_m.v AS nationkey, mktsegment_m.v AS mktsegment,
      |  b.best_acctbal
      |FROM base b
      |LEFT JOIN name_m ON b.entity_id = name_m.entity_id
      |LEFT JOIN nationkey_m ON b.entity_id = nationkey_m.entity_id
      |LEFT JOIN mktsegment_m ON b.entity_id = mktsegment_m.entity_id""".stripMargin

  /** Documents corpus + deterministic mutated copies, so dedup operators
    * have real duplicates to find (the raw corpus has none). Exact-dup
    * variants differ only in case; near-dup variants lose a tail chunk.
    */
  private[graft] def corpusWithDups(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select("doc_id", "text")
    val exactDups = d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), upper(col("text")).as("text"))
    d.union(exactDups)
  }

  private[graft] val corpusWithDupsSql: String =
    """SELECT doc_id, text FROM documents
      |UNION ALL
      |SELECT doc_id + 1000000 AS doc_id, upper(text) AS text
      |FROM documents WHERE doc_id % 5 = 0""".stripMargin

  /** Exact dedup by normalized-text sha2 fingerprint. */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactDedup(corpusWithDups(s, dir), "text", "doc_id")
      .select("doc_id", "representative", "cluster_size", "is_duplicate")

  val dedupExactSql: String =
    s"""WITH corpus AS ($corpusWithDupsSql),
       |fp AS (SELECT doc_id,
       |  sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp FROM corpus)
       |SELECT doc_id,
       |  min(doc_id) OVER (PARTITION BY fp) AS representative,
       |  count(*) OVER (PARTITION BY fp) AS cluster_size,
       |  doc_id <> min(doc_id) OVER (PARTITION BY fp) AS is_duplicate
       |FROM fp""".stripMargin

  /** Near-dup corpus: tail-truncated variants (high shingle overlap). */
  private[graft] def nearDupCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select("doc_id", "text")
    val nearDups = d.filter(col("doc_id") % 7 === 0)
      .select(
        (col("doc_id") + 1000000).as("doc_id"),
        col("text").substr(lit(1), greatest(length(col("text")) - 15, lit(20))).as("text"))
    d.union(nearDups)
      .filter(size(split(TextFunctions.normalizeText(col("text")), " ")) >= 3)
  }

  private[graft] val nearDupCorpusSql: String =
    """SELECT doc_id, text FROM (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id,
      |    substr(text, 1, greatest(length(text) - 15, 20)) AS text
      |  FROM documents WHERE doc_id % 7 = 0)
      |WHERE len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) >= 3""".stripMargin

  private[graft] val MinHashNumHashes = 32
  private[graft] val MinHashShingle = 3
  private[graft] val MinHashBands = 8

  /** MinHash + LSH candidate pairs. Signatures are bit-identical across
    * engines (sha2-based base hash + explicit universal-hash params), so
    * the oracle reproduces the exact pair set.
    */
  def dedupMinHash(s: SparkSession, dir: String): DataFrame = {
    val (pairs, _) = Dedup.minHashCandidates(
      nearDupCorpus(s, dir), "text", "doc_id",
      numHashes = MinHashNumHashes, shingleSize = MinHashShingle, bands = MinHashBands)
    pairs
  }

  /** Shared CTE chain deriving the minhash-LSH candidate pairs —
    * reused by the pair query and the cluster-resolution query so both
    * oracles see the identical pair set. The corpus CTE body is a
    * parameter so the streamed-corpus gate (q_stream_corpus) can run
    * the SAME signature/band/pair formulas over its exact-dedup
    * representatives instead of the near-dup fixture corpus.
    */
  private[graft] def minHashPairsCtesOver(corpusSql: String): String = {
    val rows = MinHashNumHashes / MinHashBands
    val params = Dedup.minHashParams(MinHashNumHashes)
    val sigExprs = params.map { case (a, b) =>
      s"list_min(list_transform(hashes, h -> (${a}*h + ${b}) % ${Dedup.MinHashPrime}))"
    }.mkString("[", ", ", "]")
    val bandExprs = (0 until MinHashBands).map { bnd =>
      val lo = bnd * rows + 1
      val hi = bnd * rows + rows
      s"sha256('${bnd}' || ',' || array_to_string(sig[${lo}:${hi}], ','))"
    }.mkString("[", ", ", "]")
    s"""corpus AS ($corpusSql),
       |words AS (SELECT doc_id,
       |  string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
       |  FROM corpus),
       |sh AS (SELECT doc_id,
       |  list_transform(range(1, len(w) - ${MinHashShingle - 2}),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS shingles FROM words),
       |hs AS (SELECT doc_id,
       |  list_transform(shingles, s -> CAST(('0x' || substr(sha256(s), 1, 8)) AS BIGINT)) AS hashes
       |  FROM sh),
       |sig AS (SELECT doc_id, $sigExprs AS sig FROM hs),
       |bands AS (SELECT doc_id, unnest($bandExprs) AS band FROM sig),
       |pairs AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
       |  FROM bands l JOIN bands r ON l.band = r.band AND l.doc_id < r.doc_id)""".stripMargin
  }

  private[graft] val minHashPairsCtes: String =
    minHashPairsCtesOver(nearDupCorpusSql)

  val dedupMinHashSql: String =
    s"""WITH $minHashPairsCtes
       |SELECT id_a, id_b FROM pairs""".stripMargin

  /** Incremental dedup ([[graft.operators.Dedup.incrementalCandidates]]):
    * the batch (doc_id % 5 == 0) dedups against STORED corpus band
    * signatures — only batch text is hashed; corpus rows enter as
    * (id, band) pruned to touched bands. The oracle is the full-corpus
    * pair CTE restricted to batch-touching pairs, which the operator
    * must equal exactly (bucket bounds evaluated over full buckets).
    */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val corpus = nearDupCorpus(s, dir)
    val (pairs, _) = graft.operators.Dedup.incrementalCandidates(
      graft.operators.Dedup.bandSignatures(
        corpus.filter(col("doc_id") % 5 =!= 0), "text", "doc_id",
        numHashes = MinHashNumHashes, shingleSize = MinHashShingle,
        bands = MinHashBands),
      corpus.filter(col("doc_id") % 5 === 0), "text", "doc_id",
      numHashes = MinHashNumHashes, shingleSize = MinHashShingle,
      bands = MinHashBands)
    pairs
  }

  val dedupIncrementalSql: String =
    s"""WITH $minHashPairsCtes
       |SELECT id_a, id_b FROM pairs WHERE id_a % 5 = 0 OR id_b % 5 = 0""".stripMargin

  /** Duplicate-cluster resolution: minhash candidate pairs →
    * [[graft.operators.ConnectedComponents]] min-label clusters. The
    * oracle computes the transitive closure of the SAME pair set with
    * a recursive CTE and takes the min reachable id — tractable at
    * oracle scale because dedup components are tiny; Spark's label
    * propagation is the form that survives 100 TB.
    */
  def dedupClusters(s: SparkSession, dir: String): DataFrame =
    graft.operators.ConnectedComponents.resolve(
      dedupMinHash(s, dir), "id_a", "id_b")
      .withColumnRenamed("node", "doc_id")

  val dedupClustersSql: String =
    s"""WITH RECURSIVE $minHashPairsCtes,
       |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(v, u) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT r.v, e.b FROM reach r JOIN edges e ON r.u = e.a)
       |SELECT v AS doc_id, min(u) AS component FROM reach GROUP BY 1""".stripMargin

  /** The same cluster resolution through the bound-convergence
    * large-star/small-star path
    * ([[graft.operators.ConnectedComponents.resolveStars]]) — label
    * semantics are identical (min id per component), so the SAME
    * recursive-CTE oracle gates both algorithms against each other and
    * against DuckDB.
    */
  def dedupClustersStars(s: SparkSession, dir: String): DataFrame =
    graft.operators.ConnectedComponents.resolveStars(
      dedupMinHash(s, dir), "id_a", "id_b")
      .withColumnRenamed("node", "doc_id")

  val dedupClustersStarsSql: String = dedupClustersSql

  /** Canonical representative per near-dup cluster: instead of the
    * arbitrary keep-min-id policy, each cluster keeps its BEST-quality
    * member (engine-portable [[TextFunctions.qualityScore]], ties to
    * the low id) — the curation policy that decides which variant of a
    * duplicated page actually enters the corpus. Singletons (no
    * candidate pair) represent themselves. Rides the audited
    * q_dedup_clusters label table + one cluster-keyed window.
    */
  def clusterRepresentatives(s: SparkSession, dir: String): DataFrame = {
    val labels = dedupClusters(s, dir)
    val scored = nearDupCorpus(s, dir).select(
      col("doc_id"),
      TextFunctions.qualityScore(col("text")).as("quality_score"))
    val w = Window.partitionBy("cluster")
    scored.join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), col("quality_score"),
        coalesce(col("component"), col("doc_id")).as("cluster"))
      .withColumn("rn", row_number().over(
        w.orderBy(col("quality_score").desc, col("doc_id"))))
      .withColumn("n_members", count(lit(1)).over(w).cast("long"))
      .filter(col("rn") === 1)
      .select(col("cluster"), col("doc_id").as("rep_doc_id"),
        col("quality_score").as("rep_quality"), col("n_members"))
  }

  val clusterRepresentativesSql: String =
    s"""WITH RECURSIVE $minHashPairsCtes,
       |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(v, u) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT r.v, e.b FROM reach r JOIN edges e ON r.u = e.a),
       |labels AS (SELECT v AS doc_id, min(u) AS component FROM reach GROUP BY 1),
       |base AS (SELECT doc_id,
       |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tok,
       |    CAST(length(text) AS BIGINT) AS n_chr
       |  FROM corpus),
       |scored AS (
       |  SELECT doc_id,
       |    round(least(CAST(n_chr AS DOUBLE) / 200.0, 1.0) * 0.5 +
       |      (CASE WHEN awl BETWEEN 3 AND 10 THEN 1.0
       |            WHEN awl > 0 THEN 0.5 ELSE 0.0 END) * 0.5, 6) AS quality_score
       |  FROM (SELECT *, CASE WHEN n_tok > 0
       |          THEN CAST(n_chr AS DOUBLE) / CAST(n_tok AS DOUBLE)
       |          ELSE 0.0 END AS awl FROM base)),
       |cl AS (SELECT s.doc_id, s.quality_score,
       |    coalesce(l.component, s.doc_id) AS cluster
       |  FROM scored s LEFT JOIN labels l ON s.doc_id = l.doc_id),
       |r AS (SELECT *,
       |    row_number() OVER (PARTITION BY cluster
       |      ORDER BY quality_score DESC, doc_id) AS rn,
       |    count(*) OVER (PARTITION BY cluster) AS nm
       |  FROM cl)
       |SELECT cluster, doc_id AS rep_doc_id, quality_score AS rep_quality,
       |  CAST(nm AS BIGINT) AS n_members
       |FROM r WHERE rn = 1""".stripMargin

  /** n-gram Jaccard over the known (original, variant) pairs, on
    * hash-compared shingle sets (see [[Dedup.ngramJaccard]]).
    */
  def ngramJaccardPairs(s: SparkSession, dir: String): DataFrame = {
    val corpus = nearDupCorpus(s, dir)
    val pairs = t(s, dir, "documents")
      .filter(col("doc_id") % 7 === 0)
      .select(col("doc_id").as("id_a"), (col("doc_id") + 1000000).as("id_b"))
    Dedup.ngramJaccard(corpus, pairs, "text", "doc_id", MinHashShingle)
      .select(
        col("id_a"), col("id_b"),
        col("inter").cast("long").as("inter"),
        col("uni").cast("long").as("uni"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  val ngramJaccardPairsSql: String =
    s"""WITH corpus AS ($nearDupCorpusSql),
       |words AS (SELECT doc_id,
       |  string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
       |  FROM corpus),
       |sets AS (SELECT doc_id,
       |  list_distinct(list_transform(
       |    list_transform(range(1, len(w) - 1),
       |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
       |    s -> CAST(('0x' || substr(sha256(s), 1, 8)) AS BIGINT)))
       |  AS sh FROM words),
       |pairs AS (SELECT doc_id AS id_a, doc_id + 1000000 AS id_b
       |  FROM documents WHERE doc_id % 7 = 0)
       |SELECT id_a, id_b,
       |  CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
       |  CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS BIGINT) AS uni,
       |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |    CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE), 6) AS jaccard
       |FROM pairs JOIN sets a ON id_a = a.doc_id JOIN sets b ON id_b = b.doc_id""".stripMargin

  /** LSH candidate-recall audit ([[Dedup.lshRecall]]): exact-Jaccard
    * ground-truth pairs on a deterministic half-sample, each tagged
    * with whether the production banding surfaced it — the dedup
    * analogue of q_ann_recall, measuring the LSH s-curve against real
    * corpus geometry. Banding is per-document, so sample candidates
    * are exactly the full-corpus candidate set restricted to the
    * sample.
    */
  def dedupRecall(s: SparkSession, dir: String): DataFrame =
    Dedup.lshRecall(nearDupCorpus(s, dir), "text", "doc_id",
      sampleFraction = 0.5, seed = 23L, minJaccard = 0.4,
      numHashes = MinHashNumHashes, shingleSize = MinHashShingle,
      bands = MinHashBands)

  val dedupRecallSql: String =
    s"""WITH $minHashPairsCtes,
       |su AS (SELECT doc_id, text FROM corpus
       |  WHERE CAST(('0x' || substr(sha256('23:' || CAST(doc_id AS VARCHAR)), 1, 8))
       |    AS BIGINT) / 4294967296.0 < 0.5),
       |ssets AS (SELECT doc_id, list_distinct(list_transform(
       |    list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
       |    s -> CAST(('0x' || substr(sha256(s), 1, 8)) AS BIGINT))) AS sh
       |  FROM (SELECT doc_id,
       |      string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
       |    FROM su)),
       |tj AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
       |    CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS BIGINT) AS uni,
       |    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |      CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE), 6)
       |      AS jaccard
       |  FROM ssets a JOIN ssets b ON a.doc_id < b.doc_id
       |  WHERE len(list_intersect(a.sh, b.sh)) > 0)
       |SELECT t.id_a, t.id_b, t.inter, t.uni, t.jaccard,
       |  (p.id_a IS NOT NULL) AS is_candidate
       |FROM tj t LEFT JOIN pairs p ON t.id_a = p.id_a AND t.id_b = p.id_b
       |WHERE t.jaccard >= 0.4""".stripMargin

  /** Winnowing partial-duplicate candidates
    * ([[graft.operators.Winnowing.overlapCandidates]]): documents
    * sharing >= 2 winnowed fingerprints (bigram hashes, window 4,
    * boilerplate fingerprints with df > 100 dropped). The oracle
    * replays the whole selection — shingle hashes, per-window
    * `list_min` (the fingerprint is a value SET, so min-tie position
    * cannot matter), df cap, pair counts — in DuckDB list ops.
    */
  def winnowOverlap(s: SparkSession, dir: String): DataFrame =
    graft.operators.Winnowing.overlapCandidates(
      nearDupCorpus(s, dir), "text", "doc_id",
      k = 2, w = 4, minShared = 2, maxDf = 100)

  val winnowOverlapSql: String =
    s"""WITH corpus AS ($nearDupCorpusSql),
       |words AS (SELECT doc_id,
       |  string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
       |  FROM corpus),
       |hs AS (SELECT doc_id,
       |  list_transform(
       |    list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]),
       |    x -> CAST(('0x' || substr(sha256(x), 1, 8)) AS BIGINT)) AS h
       |  FROM words),
       |fps AS (SELECT doc_id,
       |  unnest(list_distinct(list_transform(
       |    range(1, greatest(len(h) - 3, 1) + 1),
       |    i -> list_min(h[i:i+3])))) AS fp
       |  FROM hs WHERE len(h) > 0),
       |ok AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) BETWEEN 2 AND 100)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_fps
       |FROM fps a
       |JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |JOIN ok ON ok.fp = a.fp
       |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin

  /** SimHash signatures (32-bit) per document. */
  def dedupSimHash(s: SparkSession, dir: String): DataFrame =
    Dedup.withSimHash(t(s, dir, "documents"), "text", "simhash")
      .select("doc_id", "simhash")

  val dedupSimHashSql: String =
    """SELECT doc_id, CAST(list_sum(list_transform(range(0, 32), i ->
      |  CASE WHEN list_sum(list_transform(
      |    list_transform(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
      |      s -> CAST(('0x' || substr(sha256(s), 1, 8)) AS BIGINT)),
      |    h -> CASE WHEN CAST(floor(h / power(2, i)) AS BIGINT) % 2 = 1
      |              THEN 1 ELSE -1 END)) > 0
      |  THEN CAST(power(2, i) AS BIGINT) ELSE 0 END)) AS BIGINT) AS simhash
      |FROM documents""".stripMargin
}
