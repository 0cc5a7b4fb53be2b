package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Queries.t
import graft.functions.TextFunctions
import graft.operators.{CorpusGrowth, Curation, Lexicon, SimilaritySearch, SubstringDedup, VectorStats}

/** Split from the monolithic Queries.scala registry (round 11);
  * registered via [[graft.Queries.all]], oracled via [[graft.Queries.oracles]].
  */
object AuditQueries {

  def dimProfile(s: SparkSession, dir: String): DataFrame =
    VectorStats.dimProfile(t(s, dir, "embeddings"), "embedding")

  val dimProfileSql: String =
    """WITH q AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> CAST(round(x * 1048576.0, 0) AS BIGINT)) AS qv
      |  FROM embeddings),
      |e AS (SELECT i.i AS dim, qv[i.i] AS qx FROM q, range(1, 65) i(i)),
      |m AS (SELECT dim, count(*) AS n,
      |    sum(CAST(qx AS DECIMAL(38,0))) AS s,
      |    sum(CAST(qx * qx AS DECIMAL(38,0))) AS s2,
      |    min(qx) AS mn, max(qx) AS mx
      |  FROM e GROUP BY 1)
      |SELECT CAST(dim AS BIGINT) AS dim, n,
      |  round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1048576.0, 6) AS mean,
      |  round(sqrt((CAST(s2 AS DOUBLE) -
      |      CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) /
      |    CAST(n AS DOUBLE)) / 1048576.0, 6) AS std,
      |  round(CAST(mn AS DOUBLE) / 1048576.0, 6) AS dim_min,
      |  round(CAST(mx AS DOUBLE) / 1048576.0, 6) AS dim_max
      |FROM m""".stripMargin

  /** Per-label centroid outliers
    * ([[graft.operators.VectorStats.centroidOutliers]]): cosine
    * distance of every vector to its label's mean embedding, top-5
    * per label — the mislabeled / off-manifold candidates pruned
    * before training. Centroid means round to 6 dp before any
    * product; per-vector folds run through DECIMAL(27,7).
    */
  def centroidOutliers(s: SparkSession, dir: String): DataFrame =
    VectorStats.centroidOutliers(
      t(s, dir, "embeddings"), "vec_id", "label", "embedding")

  val centroidOutliersSql: String =
    """WITH q AS (SELECT vec_id, label,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> CAST(round(x * 1048576.0, 0) AS BIGINT)) AS qv
      |  FROM embeddings),
      |e AS (SELECT vec_id, label, i.i AS i, qv[i.i] AS qx
      |  FROM q, range(1, 65) i(i)),
      |c AS (SELECT label, i,
      |    round(CAST(sum(CAST(qx AS DECIMAL(38,0))) AS DOUBLE) /
      |      CAST(count(*) AS DOUBLE) / 1048576.0, 6) AS cv
      |  FROM e GROUP BY 1, 2),
      |d AS (SELECT e.vec_id, e.label,
      |    sum(CAST(round((CAST(e.qx AS DOUBLE) / 1048576.0) * c.cv, 7)
      |      AS DECIMAL(27,7))) AS sxc,
      |    sum(CAST(round((CAST(e.qx AS DOUBLE) / 1048576.0) *
      |        (CAST(e.qx AS DOUBLE) / 1048576.0), 7)
      |      AS DECIMAL(27,7))) AS sxx,
      |    sum(CAST(round(c.cv * c.cv, 7) AS DECIMAL(27,7))) AS scc
      |  FROM e JOIN c ON c.label = e.label AND c.i = e.i GROUP BY 1, 2),
      |r AS (SELECT label, vec_id,
      |    round(1.0 - CAST(sxc AS DOUBLE) /
      |      sqrt(CAST(sxx AS DOUBLE) * CAST(scc AS DOUBLE)), 6) AS cos_dist
      |  FROM d
      |  WHERE CAST(sxx AS DOUBLE) > 0 AND CAST(scc AS DOUBLE) > 0),
      |k AS (SELECT *, row_number() OVER (
      |  PARTITION BY label ORDER BY cos_dist DESC, vec_id) AS rk FROM r)
      |SELECT label, CAST(rk AS BIGINT) AS rank, vec_id, cos_dist
      |FROM k WHERE rk <= 5""".stripMargin

  /** MinHash-LSH banding planner ([[graft.operators.Dedup.lshPlan]]):
    * the MMDS design table for a 128-minhash signature at target
    * Jaccard 0.5 — S-curve inflection, candidate probability at the
    * threshold, false-positive rate at 0.375 and miss rate at 0.625
    * for every bands×rows factorization. Data-independent (like
    * q_compression_ratio's pinned kernel rows) but engine-replayed:
    * both sides exponentiate the same exact binary doubles.
    */
  def lshPlanQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.lshPlan(s, sigLen = 128, threshold = 0.5)

  val lshPlanSql: String =
    """SELECT b AS bands, CAST(128 / b AS BIGINT) AS rows_per_band,
      |  round(power(1.0 / CAST(b AS DOUBLE),
      |    1.0 / (128.0 / CAST(b AS DOUBLE))), 6) AS est_threshold,
      |  round(1.0 - power(1.0 - power(0.5, 128.0 / CAST(b AS DOUBLE)),
      |    CAST(b AS DOUBLE)), 6) AS p_at_threshold,
      |  round(1.0 - power(1.0 - power(0.375, 128.0 / CAST(b AS DOUBLE)),
      |    CAST(b AS DOUBLE)), 6) AS fp_below,
      |  round(1.0 - (1.0 - power(1.0 - power(0.625, 128.0 / CAST(b AS DOUBLE)),
      |    CAST(b AS DOUBLE))), 6) AS miss_above
      |FROM range(1, 129) t(b) WHERE 128 % b = 0""".stripMargin

  /** Per-source quality calibration
    * ([[graft.operators.Curation.calibrateQuality]]): percent-rank of
    * the quality score within each source, plus the keep flag for a
    * calibrated keep-best-half gate — so a global threshold compares
    * like with like instead of keeping only the "easiest" sources.
    * Rank order is (6-dp score, doc_id) — total, engine-portable.
    */
  def qualityCalibrated(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    graft.operators.Curation.calibrateQuality(
      d, "doc_id", "source", TextFunctions.qualityScore(col("text")))
  }

  val qualityCalibratedSql: String =
    """WITH base AS (
      |  SELECT doc_id, source,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok,
      |    CAST(length(text) AS BIGINT) AS n_chr
      |  FROM documents),
      |awl AS (
      |  SELECT *,
      |    CASE WHEN n_tok > 0 THEN CAST(n_chr AS DOUBLE) / CAST(n_tok AS DOUBLE)
      |         ELSE 0.0 END AS avg_wl
      |  FROM base),
      |sc AS (
      |  SELECT doc_id, source,
      |    round(least(CAST(n_chr AS DOUBLE) / 200.0, 1.0) * 0.5 +
      |      (CASE WHEN avg_wl BETWEEN 3 AND 10 THEN 1.0
      |            WHEN avg_wl > 0 THEN 0.5 ELSE 0.0 END) * 0.5, 6) AS score
      |  FROM awl),
      |pr AS (
      |  SELECT doc_id, source, score,
      |    round(percent_rank() OVER (
      |      PARTITION BY source ORDER BY score, doc_id), 6) AS pct_rank,
      |    row_number() OVER (
      |      PARTITION BY source ORDER BY score DESC, doc_id DESC) AS rkd,
      |    count(*) OVER (PARTITION BY source) AS n
      |  FROM sc)
      |SELECT doc_id, source, score, pct_rank,
      |  rkd <= CAST(ceil(CAST(n AS DOUBLE) * 0.5) AS BIGINT) AS keep
      |FROM pr""".stripMargin

  /** Fuzzy decontamination
    * ([[graft.operators.Decontaminate.fuzzyOverlapReport]]): corpus
    * docs that are minhash-band NEAR-duplicates of a benchmark item,
    * verified with exact shingle Jaccard — the paraphrased/truncated
    * eval leakage the exact-overlap gate underestimates. Benchmark =
    * the near-dup fixture's planted truncated variants (ids ≥ 1e6);
    * corpus = the originals. Signatures are sha-derived, so the
    * oracle replays the identical candidate set and similarities.
    */
  def decontaminateFuzzy(s: SparkSession, dir: String): DataFrame = {
    val all = DedupQueries.nearDupCorpus(s, dir)
    graft.operators.Decontaminate.fuzzyOverlapReport(
      all.filter(col("doc_id") < 1000000),
      all.filter(col("doc_id") >= 1000000),
      "doc_id", "text", numHashes = DedupQueries.MinHashNumHashes,
      shingleSize = DedupQueries.MinHashShingle, bands = DedupQueries.MinHashBands, threshold = 0.5)
  }

  val decontaminateFuzzySql: String =
    s"""WITH ${DedupQueries.minHashPairsCtes},
       |cand AS (SELECT id_a AS doc_id, id_b AS bench_id FROM pairs
       |  WHERE id_a < 1000000 AND id_b >= 1000000),
       |sets AS (SELECT doc_id, list_distinct(hashes) AS hs FROM hs),
       |j AS (SELECT c.doc_id, c.bench_id,
       |    CAST(len(list_intersect(a.hs, b.hs)) AS BIGINT) AS inter,
       |    CAST(len(a.hs) + len(b.hs) AS BIGINT) AS su
       |  FROM cand c JOIN sets a ON a.doc_id = c.doc_id
       |  JOIN sets b ON b.doc_id = c.bench_id),
       |r AS (SELECT doc_id, bench_id, inter, su - inter AS uni,
       |    round(CASE WHEN su - inter > 0
       |      THEN CAST(inter AS DOUBLE) / CAST(su - inter AS DOUBLE)
       |      ELSE 0.0 END, 6) AS jaccard
       |  FROM j)
       |SELECT doc_id, bench_id, inter, uni, jaccard,
       |  jaccard >= 0.5 AS contaminated
       |FROM r""".stripMargin

  /** End-to-end corpus curation — the pipeline composition a user of
    * this engine actually ships, as ONE query: exact-dedup to cluster
    * representatives ([[graft.operators.Dedup.exactDedup]]), per-source
    * quality calibration keeping each source's best half
    * ([[graft.operators.Curation.calibrateQuality]]), temperature-
    * scaled mixture quotas over the survivors
    * ([[graft.operators.Curation.mixturePlan]], T = 2, 1000-doc
    * budget), and the final per-source selection by (score desc, id).
    * Emits every gated survivor with its rank, quota and keep flag —
    * the audit trail, not just the kept set.
    *
    * Every stage is individually oracled elsewhere; this query pins
    * the COMPOSITION (the joins between stages are where a real
    * pipeline silently loses rows). Scale shape: one fingerprint
    * window, one doc-keyed join back for mass, two source-keyed
    * windows, and |sources|-row quota tables broadcast — nothing new
    * beyond the stages' own audited plans.
    */
  def curateCorpus(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = t(s, dir, "documents")
    val reps = graft.operators.Dedup.exactDedup(d, "text", "doc_id")
      .filter(!col("is_duplicate"))
      .select("doc_id", "source", "text", "n_chars")
    val gated = graft.operators.Curation
      .calibrateQuality(reps, "doc_id", "source",
        TextFunctions.qualityScore(col("text")))
      .filter(col("keep"))
      .join(reps.select("doc_id", "n_chars"), "doc_id")
    val quotas = graft.operators.Curation
      .mixturePlan(gated, "source", "n_chars",
        temperature = 2.0, totalQuota = 1000L)
      .select("source", "quota")
    gated
      .withColumn("rk", row_number().over(Window.partitionBy("source")
        .orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .join(broadcast(quotas), "source")
      .select(col("source"), col("doc_id"), col("score"), col("pct_rank"),
        col("rk"), col("quota"), (col("rk") <= col("quota")).as("kept"))
  }

  val curateCorpusSql: String =
    """WITH fp AS (
      |  SELECT doc_id, source, text, n_chars,
      |    sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS f
      |  FROM documents),
      |reps AS (
      |  SELECT doc_id, source, text, n_chars FROM (
      |    SELECT *, min(doc_id) OVER (PARTITION BY f) AS rep FROM fp)
      |  WHERE doc_id = rep),
      |base AS (
      |  SELECT doc_id, source, n_chars,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok,
      |    CAST(length(text) AS BIGINT) AS n_chr
      |  FROM reps),
      |awl AS (
      |  SELECT *,
      |    CASE WHEN n_tok > 0 THEN CAST(n_chr AS DOUBLE) / CAST(n_tok AS DOUBLE)
      |         ELSE 0.0 END AS avg_wl
      |  FROM base),
      |sc AS (
      |  SELECT doc_id, source, n_chars,
      |    round(least(CAST(n_chr AS DOUBLE) / 200.0, 1.0) * 0.5 +
      |      (CASE WHEN avg_wl BETWEEN 3 AND 10 THEN 1.0
      |            WHEN avg_wl > 0 THEN 0.5 ELSE 0.0 END) * 0.5, 6) AS score
      |  FROM awl),
      |pr AS (
      |  SELECT *, round(percent_rank() OVER (
      |    PARTITION BY source ORDER BY score, doc_id), 6) AS pct_rank,
      |    row_number() OVER (
      |      PARTITION BY source ORDER BY score DESC, doc_id DESC) AS rkd,
      |    count(*) OVER (PARTITION BY source) AS ng
      |  FROM sc),
      |gated AS (SELECT * FROM pr
      |  WHERE rkd <= CAST(ceil(CAST(ng AS DOUBLE) * 0.5) AS BIGINT)),
      |agg AS (SELECT source, count(*) AS n_docs,
      |    CAST(sum(n_chars) AS BIGINT) AS mass FROM gated GROUP BY 1),
      |s AS (SELECT *, CAST(round(power(CAST(mass AS DOUBLE), 0.5), 6)
      |    AS DECIMAL(27,6)) AS scw FROM agg),
      |t AS (SELECT *, sum(scw) OVER () AS tot FROM s),
      |e AS (SELECT *, 1000.0 * (CAST(scw AS DOUBLE) / CAST(tot AS DOUBLE)) AS ex
      |  FROM t),
      |b AS (SELECT *, CAST(floor(ex) AS BIGINT) AS base,
      |    ex - CAST(floor(ex) AS BIGINT) AS rem FROM e),
      |r AS (SELECT *, 1000 - sum(base) OVER () AS leftover,
      |    row_number() OVER (ORDER BY rem DESC, source) AS rkq FROM b),
      |quotas AS (SELECT source,
      |    CAST(base + CASE WHEN rkq <= leftover THEN 1 ELSE 0 END AS BIGINT)
      |      AS quota
      |  FROM r),
      |rk AS (SELECT source, doc_id, score, pct_rank,
      |    CAST(row_number() OVER (
      |      PARTITION BY source ORDER BY score DESC, doc_id) AS BIGINT) AS rk
      |  FROM gated)
      |SELECT k.source, k.doc_id, k.score, k.pct_rank, k.rk, q.quota,
      |  k.rk <= q.quota AS kept
      |FROM rk k JOIN quotas q USING (source)""".stripMargin

  /** Near-dup provenance matrix: minhash-LSH candidate pairs rolled up
    * to the UNORDERED source pair — which sources duplicate which (the
    * dedup dashboard a curation team reads before deciding crawl
    * exclusions; complements q_source_overlap's shingle-level matrix
    * with a DOCUMENT-pair count). Planted near-dup variants inherit
    * their original's source. Rides the audited minhash candidate
    * path ([[graft.operators.Dedup.minHashCandidates]]); the roll-up
    * is two keyed joins on the doc id and one |sources|²-bounded
    * aggregate.
    */
  def sourceDedupMatrix(s: SparkSession, dir: String): DataFrame = {
    val corpus = DedupQueries.nearDupCorpus(s, dir)
    val (pairs, _) = graft.operators.Dedup.minHashCandidates(
      corpus, "text", "doc_id", numHashes = DedupQueries.MinHashNumHashes,
      shingleSize = DedupQueries.MinHashShingle, bands = DedupQueries.MinHashBands)
    val src = t(s, dir, "documents").select(col("doc_id"), col("source"))
    def baseId(c: Column): Column =
      when(c >= 1000000L, c - 1000000L).otherwise(c)
    pairs
      .withColumn("__ka", baseId(col("id_a")))
      .withColumn("__kb", baseId(col("id_b")))
      .join(src.select(col("doc_id").as("__ka"), col("source").as("__sa")), "__ka")
      .join(src.select(col("doc_id").as("__kb"), col("source").as("__sb")), "__kb")
      .groupBy(least(col("__sa"), col("__sb")).as("source_a"),
        greatest(col("__sa"), col("__sb")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  val sourceDedupMatrixSql: String =
    s"""WITH ${DedupQueries.minHashPairsCtes},
       |src AS (SELECT doc_id, source FROM documents),
       |ps AS (SELECT p.id_a, p.id_b, da.source AS sa, db.source AS sb
       |  FROM pairs p
       |  JOIN src da ON da.doc_id =
       |    CASE WHEN p.id_a >= 1000000 THEN p.id_a - 1000000 ELSE p.id_a END
       |  JOIN src db ON db.doc_id =
       |    CASE WHEN p.id_b >= 1000000 THEN p.id_b - 1000000 ELSE p.id_b END)
       |SELECT least(sa, sb) AS source_a, greatest(sa, sb) AS source_b,
       |  count(*) AS n_pairs
       |FROM ps GROUP BY 1, 2""".stripMargin

  /** Embedding drift ([[graft.operators.VectorStats.centroidShift]]):
    * per-label centroid L2 shift and cosine between the even-id
    * (reference) and odd-id (current) halves of the embedding corpus —
    * the representation-space drift monitor count-based drift misses.
    * Exact-grid means; decimal-folded cross terms.
    */
  def embeddingDrift(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    VectorStats.centroidShift(
      e.filter(col("vec_id") % 2 === 0), e.filter(col("vec_id") % 2 === 1),
      "label", "embedding")
  }

  val embeddingDriftSql: String =
    """WITH q AS (SELECT vec_id, label,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> CAST(round(x * 1048576.0, 0) AS BIGINT)) AS qv
      |  FROM embeddings),
      |e AS (SELECT vec_id, label, i.i AS i, qv[i.i] AS qx
      |  FROM q, range(1, 65) i(i)),
      |ca AS (SELECT label, i, count(*) AS na,
      |    round(CAST(sum(CAST(qx AS DECIMAL(38,0))) AS DOUBLE) /
      |      CAST(count(*) AS DOUBLE) / 1048576.0, 6) AS cv
      |  FROM e WHERE vec_id % 2 = 0 GROUP BY 1, 2),
      |cb AS (SELECT label, i, count(*) AS nb,
      |    round(CAST(sum(CAST(qx AS DECIMAL(38,0))) AS DOUBLE) /
      |      CAST(count(*) AS DOUBLE) / 1048576.0, 6) AS cv
      |  FROM e WHERE vec_id % 2 = 1 GROUP BY 1, 2),
      |j AS (SELECT a.label, a.na, b.nb,
      |    CAST(round((a.cv - b.cv) * (a.cv - b.cv), 7) AS DECIMAL(27,7)) AS dd,
      |    CAST(round(a.cv * b.cv, 7) AS DECIMAL(27,7)) AS ab,
      |    CAST(round(a.cv * a.cv, 7) AS DECIMAL(27,7)) AS aa,
      |    CAST(round(b.cv * b.cv, 7) AS DECIMAL(27,7)) AS bb
      |  FROM ca a JOIN cb b ON b.label = a.label AND b.i = a.i),
      |m AS (SELECT label, max(na) AS n_ref, max(nb) AS n_cur,
      |    sum(dd) AS sdd, sum(ab) AS sab, sum(aa) AS saa, sum(bb) AS sbb
      |  FROM j GROUP BY 1)
      |SELECT label, n_ref, n_cur,
      |  round(sqrt(CAST(sdd AS DOUBLE)), 6) AS l2_shift,
      |  round(CASE WHEN CAST(saa AS DOUBLE) > 0 AND CAST(sbb AS DOUBLE) > 0
      |    THEN CAST(sab AS DOUBLE) /
      |      sqrt(CAST(saa AS DOUBLE) * CAST(sbb AS DOUBLE))
      |    ELSE NULL END, 6) AS cos_sim
      |FROM m""".stripMargin

  /** Term burstiness ([[graft.operators.Lexicon.termBurstiness]]):
    * Church–Gale dispersion of the corpus' top-30 terms across the
    * documents containing them — mean occurrences per containing doc
    * and variance-to-mean ratio. Separates "everywhere" terms from
    * "hammered by a few documents" terms; exact-long folds replay.
    */
  def termBurstiness(s: SparkSession, dir: String): DataFrame =
    Lexicon.termBurstiness(t(s, dir, "documents"), "doc_id", "text")

  val termBurstinessSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
      |  FROM documents),
      |tc AS (SELECT doc_id, w, count(*) AS c FROM tok WHERE w <> '' GROUP BY 1, 2),
      |pt AS (SELECT w, CAST(sum(c) AS DECIMAL(38,0)) AS cfd,
      |    count(*) AS df,
      |    CAST(sum(c * c) AS DECIMAL(38,0)) AS c2
      |  FROM tc GROUP BY 1),
      |r AS (SELECT w AS term, CAST(cfd AS BIGINT) AS cf, df,
      |    round(CAST(cfd AS DOUBLE) / CAST(df AS DOUBLE), 6) AS burstiness,
      |    round(CASE WHEN CAST(cfd AS DOUBLE) / CAST(df AS DOUBLE) > 0
      |      THEN ((CAST(c2 AS DOUBLE) -
      |          CAST(cfd AS DOUBLE) * CAST(cfd AS DOUBLE) / CAST(df AS DOUBLE)) /
      |        CAST(df AS DOUBLE)) /
      |        (CAST(cfd AS DOUBLE) / CAST(df AS DOUBLE))
      |      ELSE 0.0 END, 6) AS vmr
      |  FROM pt),
      |k AS (SELECT *, CAST(row_number() OVER (ORDER BY cf DESC, term) AS BIGINT)
      |    AS rank FROM r)
      |SELECT rank, term, cf, df, burstiness, vmr FROM k WHERE rank <= 30""".stripMargin

  /** Per-document trigram novelty
    * ([[graft.operators.CorpusGrowth.ngramNovelty]]): fraction of each
    * document's distinct word trigrams first seen (smallest doc_id) in
    * that document — the cross-document staleness signal
    * within-document repetition cannot see. Two keyed aggregations
    * (by n-gram, then by doc); no windows over data.
    */
  def ngramNovelty(s: SparkSession, dir: String): DataFrame =
    CorpusGrowth.ngramNovelty(t(s, dir, "documents"), "doc_id", "text", n = 3)

  val ngramNoveltySql: String =
    """WITH w AS (SELECT doc_id,
      |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
      |  FROM documents
      |  WHERE length(regexp_extract_all(text, '\S+')) >= 3),
      |g AS (SELECT DISTINCT doc_id, h FROM (
      |  SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
      |    i -> CAST(('0x' || substr(sha256(w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
      |      1, 8)) AS BIGINT))) AS h FROM w)),
      |per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ngrams FROM g GROUP BY 1),
      |nov AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_novel FROM (
      |  SELECT h, min(doc_id) AS doc_id FROM g GROUP BY 1) GROUP BY 1)
      |SELECT per.doc_id, per.n_ngrams,
      |  coalesce(nov.n_novel, 0) AS n_novel,
      |  round(CAST(coalesce(nov.n_novel, 0) AS DOUBLE) /
      |    CAST(per.n_ngrams AS DOUBLE), 6) AS novelty
      |FROM per LEFT JOIN nov USING (doc_id)""".stripMargin

  /** Heaps'-law vocabulary growth
    * ([[graft.operators.CorpusGrowth.vocabGrowth]]): cumulative tokens
    * vs cumulative distinct vocabulary over 10 equal doc-id ranges,
    * plus the local Heaps exponent between consecutive points — the
    * tokenizer-sizing / source-exhaustion curve. First-occurrence
    * attribution per word replaces 10 corpus rescans.
    */
  def vocabGrowth(s: SparkSession, dir: String): DataFrame =
    CorpusGrowth.vocabGrowth(t(s, dir, "documents"), "doc_id", "text", buckets = 10)

  val vocabGrowthSql: String =
    """WITH b AS (SELECT CAST(min(doc_id) AS BIGINT) AS lo,
      |    CAST(max(doc_id) AS BIGINT) - CAST(min(doc_id) AS BIGINT) + 1 AS span
      |  FROM documents),
      |d AS (SELECT ((CAST(doc_id AS BIGINT) - b.lo) * 10) // b.span + 1 AS bucket,
      |    CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS tok,
      |    doc_id, text
      |  FROM documents CROSS JOIN b),
      |dt AS (SELECT bucket, CAST(sum(tok) AS BIGINT) AS toks FROM d GROUP BY 1),
      |fw AS (SELECT w, min(bucket) AS bucket FROM (
      |  SELECT bucket, unnest(string_split(
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w FROM d)
      |  WHERE w <> '' GROUP BY 1),
      |nw AS (SELECT bucket, CAST(count(*) AS BIGINT) AS new_words FROM fw GROUP BY 1),
      |c AS (SELECT dt.bucket, dt.toks, coalesce(nw.new_words, 0) AS new_words
      |  FROM dt LEFT JOIN nw USING (bucket)),
      |cum AS (SELECT bucket,
      |    sum(toks) OVER (ORDER BY bucket) AS cum_tokens,
      |    sum(new_words) OVER (ORDER BY bucket) AS cum_vocab
      |  FROM c),
      |r AS (SELECT bucket, cum_tokens, cum_vocab,
      |    lag(cum_tokens) OVER (ORDER BY bucket) AS pt,
      |    lag(cum_vocab) OVER (ORDER BY bucket) AS pv
      |  FROM cum)
      |SELECT bucket, CAST(cum_tokens AS BIGINT) AS cum_tokens,
      |  CAST(cum_vocab AS BIGINT) AS cum_vocab,
      |  round(CASE WHEN pt IS NOT NULL AND cum_tokens > pt AND pv > 0
      |    THEN (ln(CAST(cum_vocab AS DOUBLE)) - ln(CAST(pv AS DOUBLE))) /
      |      (ln(CAST(cum_tokens AS DOUBLE)) - ln(CAST(pt AS DOUBLE)))
      |    ELSE NULL END, 6) AS heaps_beta
      |FROM r""".stripMargin

  /** Data-constrained epoch allocation
    * ([[graft.operators.Curation.epochAllocation]]): whole epochs per
    * source under a 100k-token budget with value decaying 0.5× per
    * repeat (Muennighoff et al. 2023) — greedy-by-marginal-value as a
    * single ranking over the |sources|·8-row pair table.
    */
  def epochAllocation(s: SparkSession, dir: String): DataFrame =
    Curation.epochAllocation(t(s, dir, "documents"), "source",
      TextFunctions.tokenCount(col("text")),
      budget = 100000L, maxEpochs = 8, delta = 0.5)

  val epochAllocationSql: String =
    """WITH m AS (SELECT source,
      |    CAST(sum(length(regexp_extract_all(text, '\S+'))) AS BIGINT) AS u
      |  FROM documents GROUP BY 1
      |  HAVING sum(length(regexp_extract_all(text, '\S+'))) > 0),
      |p AS (SELECT source, u, unnest(range(1, 9)) AS epoch FROM m),
      |v AS (SELECT *, round(CAST(u AS DOUBLE) * power(0.5, epoch - 1), 6) AS val
      |  FROM p),
      |c AS (SELECT *, sum(u) OVER (ORDER BY val DESC, source, epoch
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS spent FROM v)
      |SELECT source, u AS unique_tokens,
      |  CAST(sum(CASE WHEN spent <= 100000 THEN 1 ELSE 0 END) AS BIGINT) AS epochs,
      |  CAST(sum(CASE WHEN spent <= 100000 THEN 1 ELSE 0 END) * u AS BIGINT)
      |    AS tokens_allocated,
      |  round(CAST(u AS DOUBLE) *
      |    (1 - power(0.5, sum(CASE WHEN spent <= 100000 THEN 1 ELSE 0 END))) /
      |    0.5, 6) AS effective_value
      |FROM c GROUP BY source, u""".stripMargin

  /** Per-source corpus scorecard — the curation dashboard as ONE
    * query, composing the audited per-doc signals: document/token
    * volume and share, exact-duplicate rate
    * (fingerprint-first-owner), mean token entropy
    * ([[graft.operators.Lexicon.tokenEntropy]]), mean trigram novelty
    * ([[graft.operators.CorpusGrowth.ngramNovelty]]), and
    * majority-language purity. Every mean folds the 6-dp-rounded
    * per-doc values through DECIMAL(27,6) (exact sum, one double
    * division) so the roll-up is fold-order-independent like its
    * inputs. Per-doc frames meet on the doc key; per-source tables
    * (lang mode, token total) come back by broadcast.
    */
  def corpusScorecard(s: SparkSession, dir: String): DataFrame =
    corpusScorecardFrame(t(s, dir, "documents"))

  /** [[corpusScorecard]] over any (doc_id, source, lang, text) frame —
    * the form [[graft.streaming.ScorecardStream]]'s parity gate folds
    * against.
    */
  def corpusScorecardFrame(docs: DataFrame): DataFrame = {
    val ent = Lexicon.tokenEntropy(docs, "doc_id", "text")
      .select(col("doc_id"), col("n_tokens"), col("entropy"))
    val nov = CorpusGrowth.ngramNovelty(docs, "doc_id", "text")
      .select(col("doc_id"), col("novelty"))
    val slim = docs.select(col("doc_id"), col("source"), col("lang"),
      TextFunctions.fingerprint(col("text")).as("__fp"))
    val firsts = slim.groupBy("__fp").agg(min("doc_id").as("__first"))
    val flagged = slim.join(firsts, Seq("__fp"))
      .select(col("doc_id"), col("source"), col("lang"),
        when(col("doc_id") === col("__first"), 0.0).otherwise(1.0).as("__dup"))
    val perSource = flagged
      .join(ent, Seq("doc_id"), "left")
      .join(nov, Seq("doc_id"), "left")
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        sum("__dup").as("__dups"),
        sum(col("entropy").cast("decimal(27,6)")).as("__ents"),
        count(col("entropy")).as("__entn"),
        sum(col("novelty").cast("decimal(27,6)")).as("__novs"),
        count(col("novelty")).as("__novn"))
    val langTop = docs.groupBy("source", "lang").agg(count(lit(1)).as("__c"))
      .groupBy("source").agg(max("__c").as("__top"))
    // corpus token total map-only off the raw text (== Σ ent.n_tokens:
    // \S+ runs survive normalization unchanged), so the denominator
    // never re-runs the entropy pipeline
    val total = docs.agg(
      sum(TextFunctions.tokenCount(col("text")).cast("long")).as("__tot"))
    perSource
      .join(broadcast(langTop), Seq("source"))
      .crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("__tot").cast("double"), 6)
          .as("token_share"),
        round(col("__dups") / col("n_docs").cast("double"), 6).as("dup_rate"),
        round(col("__ents").cast("double") / col("__entn").cast("double"), 6)
          .as("mean_entropy"),
        round(col("__novs").cast("double") / col("__novn").cast("double"), 6)
          .as("mean_novelty"),
        round(col("__top").cast("double") / col("n_docs").cast("double"), 6)
          .as("lang_purity"))
  }

  val corpusScorecardSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
      |  FROM documents),
      |tc AS (SELECT doc_id, w, count(*) AS c FROM tok WHERE w <> '' GROUP BY 1, 2),
      |ent AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |    round(ln(CAST(sum(c) AS DOUBLE)) -
      |      CAST(sum(CAST(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)), 7)
      |        AS DECIMAL(27,7))) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS entropy
      |  FROM tc GROUP BY 1),
      |ws AS (SELECT doc_id,
      |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
      |  FROM documents
      |  WHERE length(regexp_extract_all(text, '\S+')) >= 3),
      |g AS (SELECT DISTINCT doc_id, h FROM (
      |  SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
      |    i -> CAST(('0x' || substr(sha256(w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
      |      1, 8)) AS BIGINT))) AS h FROM ws)),
      |nov AS (SELECT per.doc_id,
      |    round(CAST(coalesce(f.n_novel, 0) AS DOUBLE) /
      |      CAST(per.n AS DOUBLE), 6) AS novelty
      |  FROM (SELECT doc_id, count(*) AS n FROM g GROUP BY 1) per
      |  LEFT JOIN (SELECT doc_id, count(*) AS n_novel FROM (
      |    SELECT h, min(doc_id) AS doc_id FROM g GROUP BY 1) GROUP BY 1) f
      |  USING (doc_id)),
      |fp AS (SELECT doc_id, source, lang,
      |    sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      |  FROM documents),
      |d AS (SELECT f.doc_id, f.source, f.lang,
      |    CASE WHEN f.doc_id = fi.first_id THEN 0.0 ELSE 1.0 END AS is_dup
      |  FROM fp f JOIN (SELECT fp, min(doc_id) AS first_id FROM fp GROUP BY 1) fi
      |  USING (fp)),
      |lt AS (SELECT source, max(c) AS top FROM (
      |  SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2)
      |  GROUP BY 1),
      |tot AS (SELECT CAST(sum(length(regexp_extract_all(text, '\S+'))) AS BIGINT)
      |  AS t FROM documents),
      |agg AS (SELECT d.source, count(*) AS n_docs,
      |    CAST(sum(ent.n_tokens) AS BIGINT) AS n_tokens,
      |    sum(d.is_dup) AS dups,
      |    sum(CAST(ent.entropy AS DECIMAL(27,6))) AS ents,
      |    count(ent.entropy) AS entn,
      |    sum(CAST(nov.novelty AS DECIMAL(27,6))) AS novs,
      |    count(nov.novelty) AS novn
      |  FROM d LEFT JOIN ent USING (doc_id) LEFT JOIN nov USING (doc_id)
      |  GROUP BY 1)
      |SELECT agg.source, agg.n_docs, agg.n_tokens,
      |  round(CAST(agg.n_tokens AS DOUBLE) / CAST(tot.t AS DOUBLE), 6)
      |    AS token_share,
      |  round(agg.dups / CAST(agg.n_docs AS DOUBLE), 6) AS dup_rate,
      |  round(CAST(agg.ents AS DOUBLE) / CAST(agg.entn AS DOUBLE), 6)
      |    AS mean_entropy,
      |  round(CAST(agg.novs AS DOUBLE) / CAST(agg.novn AS DOUBLE), 6)
      |    AS mean_novelty,
      |  round(CAST(lt.top AS DOUBLE) / CAST(agg.n_docs AS DOUBLE), 6)
      |    AS lang_purity
      |FROM agg JOIN lt USING (source) CROSS JOIN tot""".stripMargin

  /** Substring dedup as an edit
    * ([[graft.operators.SubstringDedup.scrub]]): rebuild each
    * document with every cross-document duplicated 8-gram span
    * removed, keeping the copy in the gram's first-owner document —
    * the "remove one copy" pass over the same hashed-gram machinery
    * q_dup_spans reports on. One per-doc coverage sweep; the oracle
    * replays the identical sha-derived hash, window order, and
    * order-stable reconstruction.
    */
  def dedupScrub(s: SparkSession, dir: String): DataFrame =
    SubstringDedup.scrub(t(s, dir, "documents"), "doc_id", "text", n = 8)

  val dedupScrubSql: String =
    """WITH norm AS (
      |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, unnest(string_split(nt, ' ')) AS w,
      |    generate_subscripts(string_split(nt, ' '), 1) AS p
      |  FROM norm),
      |grams AS (
      |  SELECT doc_id, p AS pos,
      |    CAST(('0x' || substr(sha256(
      |      w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win || ' ' ||
      |      lead(w, 3) OVER win || ' ' || lead(w, 4) OVER win || ' ' ||
      |      lead(w, 5) OVER win || ' ' || lead(w, 6) OVER win || ' ' ||
      |      lead(w, 7) OVER win), 1, 8)) AS BIGINT) AS gram
      |  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY p)
      |  QUALIFY lead(w, 7) OVER win IS NOT NULL),
      |own AS (SELECT gram, min(doc_id) AS owner FROM grams GROUP BY 1
      |  HAVING min(doc_id) <> max(doc_id)),
      |bad AS (SELECT g.doc_id, g.pos FROM grams g JOIN own o USING (gram)
      |  WHERE g.doc_id <> o.owner),
      |u AS (SELECT doc_id, pos, 0 AS kind, NULL AS w FROM bad
      |  UNION ALL SELECT doc_id, p AS pos, 1 AS kind, w FROM tok),
      |f AS (SELECT doc_id, pos, kind, w,
      |    max(CASE WHEN kind = 0 THEN pos END) OVER (
      |      PARTITION BY doc_id ORDER BY pos, kind
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_s
      |  FROM u),
      |kept AS (SELECT doc_id, pos, w FROM f
      |  WHERE kind = 1 AND (last_s IS NULL OR pos - last_s > 7)),
      |ntok AS (SELECT doc_id,
      |    CAST(length(string_split(nt, ' ')) AS BIGINT) AS n_tokens FROM norm)
      |SELECT n.doc_id, n.n_tokens,
      |  n.n_tokens - count(k.w) AS n_removed,
      |  coalesce(string_agg(k.w, ' ' ORDER BY k.pos), '') AS clean_text
      |FROM ntok n LEFT JOIN kept k USING (doc_id)
      |GROUP BY n.doc_id, n.n_tokens""".stripMargin

  /** Readability ([[graft.functions.TextFunctions.readability]]):
    * Flesch reading-ease and Flesch–Kincaid grade per document, over
    * deterministic vowel-group syllable counts — the
    * educational-value / complexity axis of quality filtering,
    * orthogonal to the length/stopword heuristics. Map-only, zero
    * shuffles.
    */
  def readability(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      TextFunctions.readability(col("text")).as("r"))
      .select(col("doc_id"), col("r.n_words").as("n_words"),
        col("r.n_sentences").as("n_sentences"),
        col("r.n_syllables").as("n_syllables"),
        col("r.flesch").as("flesch"), col("r.fk_grade").as("fk_grade"))

  val readabilitySql: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
      |    CAST(greatest(length(regexp_extract_all(text, '[.!?]+')), 1)
      |      AS BIGINT) AS n_sentences,
      |    CAST(length(regexp_extract_all(lower(text), '[aeiouy]+')) +
      |      length(list_filter(
      |        string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
      |        w -> w <> '' AND NOT regexp_matches(w, '[aeiouy]')))
      |      AS BIGINT) AS n_syllables
      |  FROM documents)
      |SELECT doc_id, n_words, n_sentences, n_syllables,
      |  CASE WHEN n_words > 0 THEN round(206.835 -
      |    1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)) -
      |    84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)), 6)
      |  END AS flesch,
      |  CASE WHEN n_words > 0 THEN round(
      |    0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)) +
      |    11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) -
      |    15.59, 6)
      |  END AS fk_grade
      |FROM base""".stripMargin

  /** Matryoshka-truncation recall: recall@5 of brute-force cosine
    * search over the FIRST d dimensions (renormalized) against the
    * full-dimension ground truth, for d ∈ {8, 16, 32} of the 64-dim
    * corpus — the published matryoshka-representation evaluation that
    * prices "store d dims instead of 64" as a retrieval-quality
    * number. At 100 TB the embedding store dominates storage, so this
    * is a first-class capacity decision, measured with real corpus
    * geometry like [[ProfilingQueries.annRecall]] (same bounded probe set, k-bounded
    * joins; the corpus-sized work stays inside the audited brute-force
    * operator). Vectors whose truncated prefix is all-zero drop from
    * that dim's rows (no direction to search on), identically in both
    * engines.
    */
  def matryoshkaRecall(s: SparkSession, dir: String): DataFrame = {
    val k = 5
    val e = t(s, dir, "embeddings")
    val truth = SimilaritySearch.bruteForceTopK(
      e.filter(col("vec_id") < 10), e, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id")
    Seq(8, 16, 32).map { d =>
      val td = e.select(col("vec_id"), slice(col("embedding"), 1, d).as("emb"))
      val approx = SimilaritySearch.bruteForceTopK(
        td.filter(col("vec_id") < 10), td, "vec_id", "emb", k)
        .select("query_id", "neighbor_id")
      val hits = truth.join(approx, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
      approx.select("query_id").distinct()
        .join(hits, Seq("query_id"), "left")
        .select(lit(d.toLong).as("dim"), col("query_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          round(coalesce(col("n_hits"), lit(0L)) / lit(k.toDouble), 6)
            .as("recall_at_5"))
    }.reduce(_ unionAll _)
  }

  val matryoshkaRecallSql: String =
    """WITH dims AS (SELECT unnest([8, 16, 32]) AS d),
      |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |n AS (SELECT vec_id, list_transform(v,
      |    x -> x / sqrt(list_dot_product(v, v))) AS nv
      |  FROM e WHERE list_dot_product(v, v) > 0),
      |q AS (SELECT vec_id AS query_id, nv AS qv FROM n WHERE vec_id < 10),
      |exs AS (SELECT query_id, n.vec_id AS neighbor_id,
      |    round(list_dot_product(qv, n.nv), 6) AS cos_sim
      |  FROM q, n WHERE n.vec_id <> query_id),
      |exr AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |  ORDER BY cos_sim DESC, neighbor_id) AS rn FROM exs),
      |ex AS (SELECT query_id, neighbor_id FROM exr WHERE rn <= 5),
      |tn AS (SELECT d, vec_id, list_transform(v[1:d],
      |    x -> x / sqrt(list_dot_product(v[1:d], v[1:d]))) AS tv
      |  FROM e CROSS JOIN dims WHERE list_dot_product(v[1:d], v[1:d]) > 0),
      |tq AS (SELECT d, vec_id AS query_id, tv AS qv FROM tn WHERE vec_id < 10),
      |ts AS (SELECT tq.d, tq.query_id, tn.vec_id AS neighbor_id,
      |    round(list_dot_product(tq.qv, tn.tv), 6) AS cos_sim
      |  FROM tq JOIN tn ON tn.d = tq.d AND tn.vec_id <> tq.query_id),
      |tr AS (SELECT *, row_number() OVER (PARTITION BY d, query_id
      |  ORDER BY cos_sim DESC, neighbor_id) AS rn FROM ts),
      |ap AS (SELECT d, query_id, neighbor_id FROM tr WHERE rn <= 5),
      |hits AS (SELECT ap.d, ap.query_id, CAST(count(*) AS BIGINT) AS n_hits
      |  FROM ap JOIN ex USING (query_id, neighbor_id) GROUP BY 1, 2)
      |SELECT CAST(b.d AS BIGINT) AS dim, b.query_id,
      |  coalesce(h.n_hits, 0) AS n_hits,
      |  round(coalesce(h.n_hits, 0) / 5.0, 6) AS recall_at_5
      |FROM (SELECT DISTINCT d, query_id FROM tq) b
      |LEFT JOIN hits h ON h.d = b.d AND h.query_id = b.query_id""".stripMargin

  /** Benford first-digit audit over `l_extendedprice`: observed vs
    * expected leading-digit frequencies (Benford's law,
    * `log10(1 + 1/d)`) plus the chi-square statistic each digit
    * contributes — the classic fabricated-/truncated-data smell test
    * for numeric columns feeding a pipeline. One map-side-combined
    * 9-row aggregate; expectations are literals.
    */
  def benfordAudit(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .filter(col("l_extendedprice") > 0)
      .select(substring(col("l_extendedprice").cast("string"), 1, 1)
        .cast("int").as("digit"))
      // values in (0,1) lead with '0' (expected = log10(1+1/0) = Inf)
      // and extreme magnitudes can render scientific notation whose
      // first char is not a digit (null) — a generic audit keeps only
      // the nine Benford digits
      .filter(col("digit").between(1, 9))
    val counts = li.groupBy("digit").agg(count(lit(1)).as("n"))
    val expected = log(10.0, lit(1.0) + lit(1.0) / col("digit").cast("double"))
    counts
      .crossJoin(broadcast(counts.agg(sum("n").as("__tot"))))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("__tot").cast("double"), 6)
          .as("observed"),
        round(expected, 6).as("expected"),
        round(pow(col("n").cast("double") -
            expected * col("__tot").cast("double"), 2) /
          (expected * col("__tot").cast("double")), 6).as("chi2_term"))
  }

  val benfordAuditSql: String =
    """WITH d AS (SELECT CAST(substr(CAST(l_extendedprice AS VARCHAR), 1, 1)
      |    AS INT) AS digit
      |  FROM lineitem WHERE l_extendedprice > 0),
      |c AS (SELECT digit, count(*) AS n FROM d
      |  WHERE digit BETWEEN 1 AND 9 GROUP BY 1),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
      |SELECT digit, CAST(n AS BIGINT) AS n,
      |  round(CAST(n AS DOUBLE) / tot, 6) AS observed,
      |  round(log10(1.0 + 1.0 / digit), 6) AS expected,
      |  round(pow(CAST(n AS DOUBLE) -
      |      log10(1.0 + 1.0 / digit) * tot, 2) /
      |    (log10(1.0 + 1.0 / digit) * tot), 6) AS chi2_term
      |FROM c CROSS JOIN t""".stripMargin

  /** Referential-integrity audit: orphan counts and rates for the
    * fact-to-dimension links a pipeline joins on (lineitem→orders,
    * orders→customer, lineitem→part, lineitem→supplier) — silent
    * orphans turn inner joins into row loss. Each link is one
    * left-anti count against the key side, plus the denominator —
    * distinct-key anti joins on the join key, never row×row.
    */
  def fkIntegrity(s: SparkSession, dir: String): DataFrame = {
    // fully declarative — each link is a grand aggregate over the
    // anti join crossed with the fact count; nothing touches the
    // driver, the union is 4 one-row frames
    def link(
        name: String, fact: DataFrame, key: String,
        dim: DataFrame, dimKey: String): DataFrame =
      fact
        .join(dim.select(col(dimKey).as(key)).distinct(), Seq(key), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .crossJoin(broadcast(fact.agg(count(lit(1)).as("n_rows"))))
        .select(lit(name).as("link"), col("n_rows"), col("n_orphans"),
          round(col("n_orphans").cast("double") /
            when(col("n_rows") > 0, col("n_rows").cast("double")), 6)
            .as("orphan_rate"))
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    Seq(
      link("lineitem->orders", li.select("l_orderkey"), "l_orderkey",
        o, "o_orderkey"),
      link("orders->customer", o.select("o_custkey"), "o_custkey",
        t(s, dir, "customer"), "c_custkey"),
      link("lineitem->part", li.select("l_partkey"), "l_partkey",
        t(s, dir, "part"), "p_partkey"),
      link("lineitem->supplier", li.select("l_suppkey"), "l_suppkey",
        t(s, dir, "supplier"), "s_suppkey"))
      .reduce(_ unionAll _)
  }

  val fkIntegritySql: String =
    """SELECT 'lineitem->orders' AS link,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_orphans,
      |  round(CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
      |    AS DOUBLE) / count(*), 6) AS orphan_rate
      |FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      |UNION ALL
      |SELECT 'orders->customer',
      |  CAST(count(*) AS BIGINT),
      |  CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  round(CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
      |    AS DOUBLE) / count(*), 6)
      |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |UNION ALL
      |SELECT 'lineitem->part',
      |  CAST(count(*) AS BIGINT),
      |  CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  round(CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
      |    AS DOUBLE) / count(*), 6)
      |FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
      |UNION ALL
      |SELECT 'lineitem->supplier',
      |  CAST(count(*) AS BIGINT),
      |  CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  round(CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
      |    AS DOUBLE) / count(*), 6)
      |FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey""".stripMargin

  /** Shuffle-key skew diagnosis ([[graft.operators.Skew.skewReport]]):
    * the per-key row-count distribution of two prospective join/agg
    * keys (events.user_id, lineitem.l_orderkey), with the exact
    * integer-ceil `suggested_salt` — the measurement that decides
    * whether [[graft.operators.Skew.saltedJoin]] is worth its
    * overhead BEFORE wiring a 100 TB shuffle. Key-count tables are
    * the only corpus-sized pass; percentiles run over key
    * cardinality.
    */
  def skewReport(s: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.skewReport(t(s, dir, "events"), "user_id")
      .unionAll(graft.operators.Skew
        .skewReport(t(s, dir, "lineitem"), "l_orderkey"))

  val skewReportSql: String =
    """WITH a AS (SELECT user_id AS k, count(*) AS cnt FROM events GROUP BY 1),
      |b AS (SELECT l_orderkey AS k, count(*) AS cnt FROM lineitem GROUP BY 1),
      |ra AS (SELECT 'user_id' AS key, CAST(sum(cnt) AS BIGINT) AS n_rows,
      |    CAST(count(*) AS BIGINT) AS n_keys,
      |    round(quantile_cont(cnt, 0.5), 6) AS p50_rows_per_key,
      |    round(quantile_cont(cnt, 0.99), 6) AS p99_rows_per_key,
      |    CAST(max(cnt) AS BIGINT) AS max_rows_per_key
      |  FROM a),
      |rb AS (SELECT 'l_orderkey' AS key, CAST(sum(cnt) AS BIGINT) AS n_rows,
      |    CAST(count(*) AS BIGINT) AS n_keys,
      |    round(quantile_cont(cnt, 0.5), 6) AS p50_rows_per_key,
      |    round(quantile_cont(cnt, 0.99), 6) AS p99_rows_per_key,
      |    CAST(max(cnt) AS BIGINT) AS max_rows_per_key
      |  FROM b),
      |u AS (SELECT * FROM ra UNION ALL SELECT * FROM rb)
      |SELECT key, n_rows, n_keys,
      |  round(CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE), 6)
      |    AS avg_rows_per_key,
      |  p50_rows_per_key, p99_rows_per_key, max_rows_per_key,
      |  round(CAST(max_rows_per_key AS DOUBLE) * CAST(n_keys AS DOUBLE) /
      |    CAST(n_rows AS DOUBLE), 6) AS skew_factor,
      |  CAST(greatest(1, (max_rows_per_key * 32 + n_rows - 1) // n_rows)
      |    AS BIGINT) AS suggested_salt
      |FROM u""".stripMargin

  /** Per-(user, event_type) inter-event gaps rolled up to per-type
    * cadence stats — the event-stream health profile (a type whose p95
    * gap explodes has a stalled producer; one whose p50 collapses has
    * a runaway emitter). Gaps are computed inside (user, type)
    * windows — partitions bounded by one user's events, never a
    * whole-type sort — then mean (exact DECIMAL micros), max, and
    * exact interpolated p50/p95 via the distinct-value histogram
    * machinery ([[graft.operators.Percentiles.exactByHistogram]]).
    */
  def interarrival(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("__us"), col("event_id"))
    val gaps = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("__us"))
      .withColumn("__gap_us", col("__us") - lag("__us", 1).over(w))
      .filter(col("__gap_us").isNotNull)
      .select(col("event_type"), col("__gap_us"))
    val pct = graft.operators.Percentiles.exactByHistogram(
      gaps.withColumn("__gap_s", col("__gap_us").cast("double") / 1e6),
      Seq("event_type"), "__gap_s",
      Seq("p50_gap_s" -> 0.5, "p95_gap_s" -> 0.95))
    val base = gaps.groupBy("event_type").agg(
      count(lit(1)).as("n_gaps"),
      sum(col("__gap_us").cast("decimal(38,0)")).as("__sum_us"),
      max("__gap_us").as("__max_us"))
    base.join(pct, "event_type").select(
      col("event_type"), col("n_gaps"),
      round(col("__sum_us").cast("double") /
        col("n_gaps").cast("double") / 1e6, 6).as("mean_gap_s"),
      round(col("p50_gap_s"), 6).as("p50_gap_s"),
      round(col("p95_gap_s"), 6).as("p95_gap_s"),
      round(col("__max_us").cast("double") / 1e6, 6).as("max_gap_s"))
  }

  val interarrivalSql: String =
    """WITH g AS (SELECT event_type,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      |      PARTITION BY user_id, event_type
      |      ORDER BY epoch_us(ts), event_id) AS gap_us
      |  FROM events),
      |gg AS (SELECT event_type, gap_us FROM g WHERE gap_us IS NOT NULL)
      |SELECT event_type, count(*) AS n_gaps,
      |  round(CAST(sum(CAST(gap_us AS HUGEINT)) AS DOUBLE) /
      |    CAST(count(*) AS DOUBLE) / 1e6, 6) AS mean_gap_s,
      |  round(quantile_cont(CAST(gap_us AS DOUBLE) / 1e6, 0.5), 6) AS p50_gap_s,
      |  round(quantile_cont(CAST(gap_us AS DOUBLE) / 1e6, 0.95), 6) AS p95_gap_s,
      |  round(CAST(max(gap_us) AS DOUBLE) / 1e6, 6) AS max_gap_s
      |FROM gg GROUP BY 1""".stripMargin

  /** Market-basket affinity over order lines: part pairs co-ordered in
    * the same order, with support and lift — the co-occurrence mining
    * shape (pair generation is ORDER-BOUNDED: a self-equi-join on the
    * order key explodes at most lines²-per-order pairs, never
    * part×part; per-part totals and the order count meet the pair
    * table as broadcasts). `min_co >= 2` keeps the output the
    * interesting tail, not the all-pairs floor.
    */
  def basketAffinity(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val partN = li.groupBy("pk").agg(count(lit(1)).as("np"))
    val orderN = li.select("ok").distinct().agg(count(lit(1)).as("n_orders"))
    val pairs = li.as("a")
      .join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
      .agg(count(lit(1)).as("n_co"))
      .filter(col("n_co") >= 2)
    pairs
      .join(partN.select(col("pk").as("part_a"), col("np").as("__na")), "part_a")
      .join(partN.select(col("pk").as("part_b"), col("np").as("__nb")), "part_b")
      .crossJoin(broadcast(orderN))
      .select(col("part_a"), col("part_b"), col("n_co"),
        round(col("n_co").cast("double") * col("n_orders").cast("double") /
          (col("__na").cast("double") * col("__nb").cast("double")), 6)
          .as("lift"))
  }

  val basketAffinitySql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |    FROM lineitem),
      |pn AS (SELECT pk, count(*) AS np FROM li GROUP BY 1),
      |o AS (SELECT count(DISTINCT ok) AS n_orders FROM li),
      |p AS (SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS n_co
      |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT part_a, part_b, n_co,
      |  round(CAST(n_co AS DOUBLE) * CAST(n_orders AS DOUBLE) /
      |    (CAST(na.np AS DOUBLE) * CAST(nb.np AS DOUBLE)), 6) AS lift
      |FROM p JOIN pn na ON na.pk = p.part_a
      |  JOIN pn nb ON nb.pk = p.part_b CROSS JOIN o""".stripMargin

  /** Exact higher moments (skewness, excess kurtosis) of
    * `l_extendedprice` per return flag — the distribution-shape
    * profile mean/stddev can't see (heavy tails and asymmetry decide
    * whether downstream z-score gates make sense). Prices quantize to
    * integer CENTS and the four power sums fold in DECIMAL(38,0)
    * (exact, order-independent — a double fold of x⁴ would be
    * fold-order-dependent and ~1e28-magnitude); the closed-form
    * moment formulas run on the exact sums. One map-side-combined
    * aggregate; skew/kurtosis are scale-invariant so the cents unit
    * cancels.
    */
  def moments(s: SparkSession, dir: String): DataFrame = {
    val xc = round(col("l_extendedprice") * 100).cast("decimal(38,0)")
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), xc.as("__x"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("__s1"),
        sum(col("__x") * col("__x")).as("__s2"),
        sum(col("__x") * col("__x") * col("__x")).as("__s3"),
        sum(col("__x") * col("__x") * col("__x") * col("__x")).as("__s4"))
      .select(col("l_returnflag"), col("n"), {
        val n = col("n").cast("double")
        val m = col("__s1").cast("double") / n
        val m2 = col("__s2").cast("double") / n - m * m
        val m3 = col("__s3").cast("double") / n -
          lit(3.0) * m * (col("__s2").cast("double") / n) +
          lit(2.0) * m * m * m
        val m4 = col("__s4").cast("double") / n -
          lit(4.0) * m * (col("__s3").cast("double") / n) +
          lit(6.0) * m * m * (col("__s2").cast("double") / n) -
          lit(3.0) * m * m * m * m
        // a constant group has zero variance: its shape moments are
        // undefined — null, not a 0/0 NaN (both engines agree)
        struct(
          round(m / 100.0, 6).as("mean"),
          round(sqrt(m2) / 100.0, 6).as("stddev_pop"),
          when(m2 > 0.0, round(m3 / pow(m2, 1.5), 6)).as("skewness"),
          when(m2 > 0.0, round(m4 / (m2 * m2) - 3.0, 6)).as("kurtosis_excess"))
      }.as("__m"))
      .select(col("l_returnflag"), col("n"), col("__m.mean").as("mean"),
        col("__m.stddev_pop").as("stddev_pop"),
        col("__m.skewness").as("skewness"),
        col("__m.kurtosis_excess").as("kurtosis_excess"))
  }

  val momentsSql: String =
    """WITH c AS (SELECT l_returnflag,
      |    CAST(round(l_extendedprice * 100) AS HUGEINT) AS x
      |  FROM lineitem),
      |s AS (SELECT l_returnflag, count(*) AS n,
      |    sum(x) AS s1, sum(x*x) AS s2, sum(x*x*x) AS s3,
      |    sum(x*x*x*x) AS s4
      |  FROM c GROUP BY 1),
      |m AS (SELECT l_returnflag, n,
      |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
      |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
      |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
      |    CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
      |  FROM s),
      |mm AS (SELECT l_returnflag, n, m1,
      |    r2 - m1*m1 AS m2,
      |    r3 - 3.0*m1*r2 + 2.0*m1*m1*m1 AS m3,
      |    r4 - 4.0*m1*r3 + 6.0*m1*m1*r2 - 3.0*m1*m1*m1*m1 AS m4
      |  FROM m)
      |SELECT l_returnflag, n,
      |  round(m1 / 100.0, 6) AS mean,
      |  round(sqrt(m2) / 100.0, 6) AS stddev_pop,
      |  CASE WHEN m2 > 0 THEN round(m3 / pow(m2, 1.5), 6) END AS skewness,
      |  CASE WHEN m2 > 0 THEN round(m4 / (m2 * m2) - 3.0, 6) END
      |    AS kurtosis_excess
      |FROM mm""".stripMargin

  /** Equi-DEPTH histogram of `l_extendedprice` (10 buckets of ~equal
    * row count, each distinct value wholly in one bucket) — the
    * partition-boundary planning view an equi-WIDTH histogram
    * (q_length_histogram) can't give on skewed values. Exact and
    * engine-portable: one count per distinct value (map-side
    * combined), a distributed prefix sum, and integer bucket
    * arithmetic (`(cum-1)*B DIV n`) DuckDB replays exactly.
    *
    * The prefix sum is two-pass so NO window ever sees the whole
    * distinct table in one task: values are bucketed into coarse
    * $1000-wide price groups (value-derived, so deterministic across
    * recomputation — no partition-id coupling), the ~100 per-group
    * totals come back to the driver for the running offsets (bounded
    * by the price DOMAIN, not the data), and the per-value cumulative
    * runs as parallel per-group windows with the group offset added
    * back via a broadcast join. DuckDB replays the exact single-window
    * formulation — same cum, same buckets.
    */
  def equidepthHistogram(s: SparkSession, dir: String): DataFrame = {
    // pass 1: per-coarse-group ROW counts straight off the scan (the
    // cumulative is a row count, so the offsets never need the
    // distinct-value table) → running offsets on the driver
    val groupTotals = t(s, dir, "lineitem")
      .groupBy(floor(col("l_extendedprice").cast("double") / 1000.0)
        .cast("long").as("__g"))
      .agg(count(lit(1)).as("__gc"))
      .orderBy("__g").collect()
    val n = groupTotals.iterator.map(_.getLong(1)).sum
    var running = 0L
    val offsetRows = groupTotals.toSeq.map { r =>
      val o = running; running += r.getLong(1); (r.getLong(0), o)
    }
    import s.implicits._
    val offsets = offsetRows.toDF("__g", "__off")
    val hist = t(s, dir, "lineitem")
      .groupBy(col("l_extendedprice").cast("double").as("__v"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__g", floor(col("__v") / 1000.0).cast("long"))
    // pass 2: per-group cumulative (parallel, group-bounded) + offset
    val wi = Window.partitionBy("__g").orderBy("__v")
    hist
      .join(broadcast(offsets), "__g")
      .withColumn("__cum", col("__off") + sum("__c").over(wi))
      .withColumn("bucket",
        call_function("div", (col("__cum") - 1L) * 10L,
          lit(math.max(n, 1L))) + 1L)
      .groupBy("bucket")
      .agg(min("__v").as("lo"), max("__v").as("hi"),
        sum("__c").as("n_rows"))
  }

  /** k-anonymity audit ([[graft.operators.Privacy.kAnonymity]]) over
    * the customer dimension's release-shaped quasi-identifiers
    * (nation, market segment): every equivalence class with its size,
    * threshold flag and worst-case re-identification probability. One
    * map-side-combined aggregate; output bounded by the combination
    * space.
    */
  def kAnonymity(s: SparkSession, dir: String): DataFrame =
    graft.operators.Privacy.kAnonymity(
      t(s, dir, "customer"), Seq("c_nationkey", "c_mktsegment"), k = 5L)

  val kAnonymitySql: String =
    """SELECT c_nationkey, c_mktsegment, count(*) AS group_n,
      |  count(*) >= 5 AS k_anonymous,
      |  round(CAST(1.0 AS DOUBLE) / count(*), 6) AS reident_risk
      |FROM customer GROUP BY 1, 2""".stripMargin

  /** l-diversity audit ([[graft.operators.Privacy.lDiversity]]):
    * the same equivalence classes, plus the distinct count of a
    * sensitive attribute (account-balance kilobucket) — the
    * homogeneity leak k-anonymity alone misses (a size-50 class whose
    * members all share one sensitive value discloses it for all 50).
    */
  def lDiversity(s: SparkSession, dir: String): DataFrame =
    graft.operators.Privacy.lDiversity(
      t(s, dir, "customer")
        .withColumn("bal_bucket", floor(col("c_acctbal") / 1000.0)),
      Seq("c_nationkey", "c_mktsegment"), "bal_bucket", k = 5L, l = 3L)

  val lDiversitySql: String =
    """WITH c AS (SELECT c_nationkey, c_mktsegment,
      |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket
      |  FROM customer)
      |SELECT c_nationkey, c_mktsegment, count(*) AS group_n,
      |  CAST(count(DISTINCT bal_bucket) AS BIGINT) AS sensitive_l,
      |  count(*) >= 5 AS k_anonymous,
      |  round(CAST(1.0 AS DOUBLE) / count(*), 6) AS reident_risk,
      |  count(DISTINCT bal_bucket) >= 3 AS l_diverse
      |FROM c GROUP BY 1, 2""".stripMargin

  /** t-closeness audit ([[graft.operators.Privacy.tCloseness]]): the
    * skew leak l-diversity misses — per equivalence class, the EMD
    * between the class's sensitive distribution (balance kilobucket)
    * and the global one over the ordered value domain.
    */
  def tCloseness(s: SparkSession, dir: String): DataFrame =
    graft.operators.Privacy.tCloseness(
      t(s, dir, "customer")
        .withColumn("bal_bucket", floor(col("c_acctbal") / 1000.0)),
      Seq("c_nationkey", "c_mktsegment"), "bal_bucket", t = 0.2)

  val tClosenessSql: String =
    """WITH c AS (SELECT c_nationkey, c_mktsegment,
      |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS v FROM customer),
      |counts AS (SELECT c_nationkey, c_mktsegment, v,
      |    CAST(count(*) AS BIGINT) AS cc FROM c GROUP BY 1, 2, 3),
      |domain AS (SELECT v, CAST(sum(cc) AS BIGINT) AS gc,
      |    row_number() OVER (ORDER BY v) AS rnk FROM counts GROUP BY 1),
      |dom2 AS (SELECT v, rnk,
      |    CAST(sum(gc) OVER (ORDER BY rnk) AS BIGINT) AS cumgc FROM domain),
      |tot AS (SELECT count(*) AS m, CAST(sum(gc) AS BIGINT) AS n FROM domain),
      |grp AS (SELECT c_nationkey, c_mktsegment,
      |    CAST(sum(cc) AS BIGINT) AS group_n FROM counts GROUP BY 1, 2),
      |grid AS (SELECT g.c_nationkey, g.c_mktsegment, g.group_n, d.rnk,
      |    d.cumgc, coalesce(ct.cc, 0) AS cc
      |  FROM grp g CROSS JOIN dom2 d
      |  LEFT JOIN counts ct ON ct.c_nationkey = g.c_nationkey
      |    AND ct.c_mktsegment = g.c_mktsegment AND ct.v = d.v),
      |terms AS (SELECT c_nationkey, c_mktsegment, group_n,
      |    CAST(round(abs(
      |      CAST(sum(cc) OVER (PARTITION BY c_nationkey, c_mktsegment
      |        ORDER BY rnk) AS DOUBLE) / CAST(group_n AS DOUBLE)
      |      - CAST(cumgc AS DOUBLE) / (SELECT CAST(n AS DOUBLE) FROM tot)
      |    ), 9) AS DECIMAL(28,12)) AS term
      |  FROM grid),
      |e AS (SELECT c_nationkey, c_mktsegment, group_n,
      |    round(CAST(sum(term) AS DOUBLE)
      |      / (SELECT CAST(m - 1 AS DOUBLE) FROM tot), 6) AS emd
      |  FROM terms GROUP BY 1, 2, 3)
      |SELECT c_nationkey, c_mktsegment, group_n, emd,
      |  emd <= 0.2 AS t_close FROM e""".stripMargin

  /** Differentially-private count release at a fixed audit epoch
    * ([[graft.operators.Privacy.dpRelease]]): per (nation, segment)
    * noisy counts, ε=1 Laplace via the portable unit hash of
    * (seed, epoch, key), groups whose NOISY count misses the
    * threshold suppressed entirely. The oracle interpolates the TEST
    * seed + epoch to replay this one release exactly — in production
    * the seed is secret and the epoch advances per release (the
    * operator's privacy contract).
    */
  def dpRelease(s: SparkSession, dir: String): DataFrame =
    graft.operators.Privacy.dpRelease(
      t(s, dir, "customer"), Seq("c_nationkey", "c_mktsegment"),
      epsilon = 1.0, releaseThreshold = 5.0, seed = 42L, epoch = 7L)

  val dpReleaseSql: String =
    """WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) AS n
      |  FROM customer GROUP BY 1, 2),
      |h AS (SELECT c_nationkey, c_mktsegment, n,
      |    (CAST(('0x' || substr(sha256('42:7|' ||
      |      CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment), 1, 8))
      |      AS BIGINT) + 0.5) / 4294967296.0 AS u
      |  FROM g),
      |r AS (SELECT c_nationkey, c_mktsegment,
      |    round(n + CASE WHEN u < 0.5 THEN round(ln(2.0 * u), 7)
      |      ELSE -round(ln(2.0 - 2.0 * u), 7) END, 6) AS noisy_n
      |  FROM h)
      |SELECT c_nationkey, c_mktsegment, noisy_n FROM r
      |WHERE noisy_n >= 5.0""".stripMargin

  /** Row-level suppression view
    * ([[graft.operators.Privacy.suppressionView]]): every customer row
    * tagged with its equivalence class's k-anonymity flag — the frame
    * a release pipeline filters on; the class table broadcasts.
    */
  def suppression(s: SparkSession, dir: String): DataFrame =
    graft.operators.Privacy.suppressionView(
      t(s, dir, "customer"), Seq("c_nationkey", "c_mktsegment"), k = 5L)
      .select("c_custkey", "c_nationkey", "c_mktsegment", "k_anonymous")

  val suppressionSql: String =
    """WITH g AS (SELECT c_nationkey, c_mktsegment,
      |    count(*) >= 5 AS k_anonymous FROM customer GROUP BY 1, 2)
      |SELECT c.c_custkey, c.c_nationkey, c.c_mktsegment, g.k_anonymous
      |FROM customer c LEFT JOIN g
      |  ON c.c_nationkey = g.c_nationkey
      |  AND c.c_mktsegment = g.c_mktsegment""".stripMargin

  /** Event-rate anomaly report ([[graft.operators.Anomaly
    * .rateAnomaly]]): per (event_type, hour) counts over the
    * zero-filled hour grid, 3-sigma control-chart flags from each
    * type's own population moments.
    */
  def rateAnomaly(s: SparkSession, dir: String): DataFrame =
    graft.operators.Anomaly.rateAnomaly(
      t(s, dir, "events"), "event_type", "ts", zThreshold = 3.0)

  val rateAnomalySql: String =
    """WITH c AS (SELECT event_type,
      |    date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket_ts,
      |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
      |b AS (SELECT min(bucket_ts) AS lo, max(bucket_ts) AS hi FROM c),
      |g AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
      |    AS bucket_ts FROM b),
      |ty AS (SELECT DISTINCT event_type FROM c),
      |f AS (SELECT ty.event_type, g.bucket_ts,
      |    coalesce(c.n, 0) AS n_events
      |  FROM ty CROSS JOIN g LEFT JOIN c
      |    ON c.event_type = ty.event_type AND c.bucket_ts = g.bucket_ts),
      |st AS (SELECT event_type, count(*) AS n,
      |    CAST(sum(n_events) AS BIGINT) AS s,
      |    CAST(sum(n_events * n_events) AS BIGINT) AS s2
      |  FROM f GROUP BY 1),
      |z AS (SELECT f.event_type, f.bucket_ts, f.n_events,
      |    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
      |    sqrt(greatest(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
      |      - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
      |        * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 0.0)) AS std
      |  FROM f JOIN st ON f.event_type = st.event_type),
      |zz AS (SELECT event_type, bucket_ts, n_events,
      |    CASE WHEN std = 0 THEN 0.0
      |      ELSE round((CAST(n_events AS DOUBLE) - mean) / std, 6)
      |    END AS z_score
      |  FROM z)
      |SELECT event_type, bucket_ts, n_events, z_score,
      |  abs(z_score) >= 3.0 AS anomaly FROM zz""".stripMargin

  val equidepthHistogramSql: String =
    """WITH h AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v,
      |    count(*) AS c FROM lineitem GROUP BY 1),
      |cw AS (SELECT v, c, sum(c) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |  sum(c) OVER () AS n FROM h)
      |SELECT CAST(((cum - 1) * 10) // n + 1 AS BIGINT) AS bucket,
      |  min(v) AS lo, max(v) AS hi, CAST(sum(c) AS BIGINT) AS n_rows
      |FROM cw GROUP BY 1""".stripMargin
}
