package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Queries.t
import graft.functions.TextFunctions
import graft.operators.{Dedup, NgramLm, SimilaritySearch, SourceOverlap, SubstringDedup}

/** Split from the monolithic Queries.scala registry (round 11);
  * registered via [[graft.Queries.all]], oracled via [[graft.Queries.oracles]].
  */
object CurationQueries {

  /** Bigram-LM perplexity quality filter ([[graft.operators.NgramLm]]):
    * train on the English slice, score every document's cross-entropy
    * against it — non-English and low-fluency documents surface with
    * high perplexity. The per-bigram `ln p` folds through
    * DECIMAL(27,7) so the score is order-independent and the oracle
    * replays it exactly (see the operator's Scaladoc for the 100 TB
    * shape: the model is bounded by the REFERENCE corpus and
    * broadcast; scoring is linear).
    */
  def lmPerplexity(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val model = NgramLm.train(docs.filter(col("lang") === "en"), "text")
    NgramLm.score(model, docs, "doc_id", "text")
  }

  val lmPerplexitySql: String =
    """WITH tok AS (
      |  SELECT doc_id, lang,
      |    unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w,
      |    generate_subscripts(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '), 1) AS p
      |  FROM documents),
      |bi AS (
      |  SELECT doc_id, lang, p, w AS w1,
      |    lead(w) OVER (PARTITION BY doc_id ORDER BY p) AS w2
      |  FROM tok QUALIFY w2 IS NOT NULL),
      |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi WHERE lang = 'en' GROUP BY 1, 2),
      |c1 AS (SELECT w1, count(*) AS c1 FROM bi WHERE lang = 'en' GROUP BY 1),
      |v AS (SELECT count(DISTINCT w) AS v FROM tok WHERE lang = 'en'),
      |scored AS (
      |  SELECT b.doc_id,
      |    CASE WHEN c12.c12 IS NULL THEN 1 ELSE 0 END AS oov,
      |    CAST(round(ln((coalesce(c12.c12, 0) + 0.5) / (coalesce(c1.c1, 0) + 0.5 * v.v)), 7)
      |      AS DECIMAL(27,7)) AS nlp
      |  FROM bi b
      |  LEFT JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
      |  LEFT JOIN c1 ON b.w1 = c1.w1
      |  CROSS JOIN v)
      |SELECT doc_id, count(*) AS n_bigrams, CAST(sum(oov) AS BIGINT) AS oov_bigrams,
      |  round(-(CAST(sum(nlp) AS DOUBLE) / count(*)), 6) AS avg_neg_logp,
      |  round(exp(-(CAST(sum(nlp) AS DOUBLE) / count(*))), 6) AS perplexity
      |FROM scored GROUP BY doc_id""".stripMargin

  /** Interpolated Kneser–Ney perplexity ([[NgramLm.scoreKn]]): the
    * smoothing real perplexity filters use, over the same en-reference
    * train/score split as q_lm_perplexity. Same decimal-fold oracle
    * discipline; the KN interpolation's float expression trees are
    * parenthesized identically on both engines.
    */
  def lmPerplexityKn(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val model = NgramLm.trainKn(docs.filter(col("lang") === "en"), "text")
    NgramLm.scoreKn(model, docs, "doc_id", "text")
  }

  val lmPerplexityKnSql: String =
    """WITH tok AS (
      |  SELECT doc_id, lang,
      |    unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w,
      |    generate_subscripts(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '), 1) AS p
      |  FROM documents),
      |bi AS (
      |  SELECT doc_id, lang, p, w AS w1,
      |    lead(w) OVER (PARTITION BY doc_id ORDER BY p) AS w2
      |  FROM tok QUALIFY w2 IS NOT NULL),
      |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi WHERE lang = 'en' GROUP BY 1, 2),
      |c1 AS (SELECT w1, sum(c12) AS c1, count(*) AS n_after FROM c12 GROUP BY 1),
      |nb AS (SELECT w2, count(*) AS n_before FROM c12 GROUP BY 1),
      |b AS (SELECT count(*) AS b FROM c12),
      |v AS (SELECT count(DISTINCT w) AS v FROM tok WHERE lang = 'en'),
      |scored AS (
      |  SELECT bg.doc_id,
      |    CASE WHEN c12.c12 IS NULL THEN 1 ELSE 0 END AS oov,
      |    CAST(round(ln(CASE WHEN c1.c1 IS NULL
      |      THEN (coalesce(nb.n_before, 0) + 0.5) / (b.b + 0.5 * v.v)
      |      ELSE (greatest(coalesce(c12.c12, 0) - 0.75, 0.0) / c1.c1) +
      |        (((0.75 * c1.n_after) / c1.c1) *
      |          ((coalesce(nb.n_before, 0) + 0.5) / (b.b + 0.5 * v.v)))
      |      END), 7) AS DECIMAL(27,7)) AS nlp
      |  FROM bi bg
      |  LEFT JOIN c12 ON bg.w1 = c12.w1 AND bg.w2 = c12.w2
      |  LEFT JOIN c1 ON bg.w1 = c1.w1
      |  LEFT JOIN nb ON bg.w2 = nb.w2
      |  CROSS JOIN b CROSS JOIN v)
      |SELECT doc_id, count(*) AS n_bigrams, CAST(sum(oov) AS BIGINT) AS oov_bigrams,
      |  round(-(CAST(sum(nlp) AS DOUBLE) / count(*)), 6) AS avg_neg_logp,
      |  round(exp(-(CAST(sum(nlp) AS DOUBLE) / count(*))), 6) AS perplexity
      |FROM scored GROUP BY doc_id""".stripMargin

  /** Gopher/C4-style rule-based quality gate
    * ([[graft.operators.QualityRules]]): five token-stream signals and
    * the conjunctive pass flag, as a zero-shuffle map-only pass — the
    * heuristic filter that runs before any learned scorer.
    */
  def qualityRules(s: SparkSession, dir: String): DataFrame =
    graft.operators.QualityRules.signals(t(s, dir, "documents"), "doc_id", "text")

  val qualityRulesSql: String =
    """WITH norm AS (SELECT doc_id,
      |  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
      |  FROM documents),
      |sig AS (SELECT doc_id,
      |  CAST(len(w) AS BIGINT) AS n_words,
      |  CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w) AS mean_len,
      |  CAST(len(list_filter(w, x -> x IN ('the','a','of','to','and','in','is','that','for','it'))) AS DOUBLE) / len(w) AS stop_f,
      |  CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS dist_f,
      |  CAST(list_max(list_transform(list_distinct(w), d -> len(list_filter(w, x -> x = d)))) AS DOUBLE) / len(w) AS top_f
      |FROM norm)
      |SELECT doc_id AS id, n_words,
      |  round(mean_len, 6) AS mean_word_len,
      |  round(stop_f, 6) AS stop_frac,
      |  round(dist_f, 6) AS distinct_frac,
      |  round(top_f, 6) AS top_frac,
      |  (n_words BETWEEN 20 AND 1000 AND mean_len BETWEEN 3.0 AND 6.0
      |    AND stop_f >= 0.03 AND dist_f >= 0.35 AND top_f <= 0.12) AS pass
      |FROM sig""".stripMargin

  /** DSIR importance weights ([[graft.operators.Dsir]]): hashed
    * unigram+bigram log-likelihood ratio of the English slice vs the
    * raw corpus — training is one bucket-bounded aggregation, scoring
    * is a zero-shuffle literal-LUT fold (the plan the driver audits).
    */
  def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val model = graft.operators.Dsir.train(
      docs, "text", col("lang") === "en", numBuckets = 256)
    graft.operators.Dsir.score(model, docs, "doc_id", "text")
  }

  val dsirWeightsSql: String =
    """WITH norm AS (SELECT doc_id, lang,
      |  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
      |  FROM documents),
      |grams AS (SELECT doc_id, lang,
      |  list_concat(w,
      |    list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS gs
      |  FROM norm),
      |ex AS (SELECT doc_id, lang,
      |  unnest(list_transform(gs,
      |    g -> CAST(('0x' || substr(sha256(g), 1, 8)) AS BIGINT) % 256)) AS f
      |  FROM grams),
      |cnt AS (SELECT f, count(*) AS cr,
      |  count(*) FILTER (WHERE lang = 'en') AS ct FROM ex GROUP BY f),
      |tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM cnt),
      |lut AS (SELECT f,
      |  CAST(round((ln((ct + 0.5) / (nt + 128.0)) - ln((cr + 0.5) / (nr + 128.0))) * 1e7) AS BIGINT) AS lam
      |  FROM cnt CROSS JOIN tot)
      |SELECT e.doc_id AS id, CAST(count(*) AS BIGINT) AS n_feats,
      |  CAST(sum(l.lam) AS BIGINT) AS dsir_weight_e7
      |FROM ex e JOIN lut l ON e.f = l.f
      |GROUP BY e.doc_id""".stripMargin

  /** Duplicated-substring spans ([[graft.operators.SubstringDedup]]):
    * cross-document repeated 8-gram hits (portable 32-bit shingle
    * hashes — never materialized gram strings) merged into maximal
    * spans per document, with duplicated-token coverage —
    * substring-level dedup signal that whole-document fingerprints
    * miss. The oracle replays the identical sha-256-derived hash.
    */
  def dupSpans(s: SparkSession, dir: String): DataFrame =
    SubstringDedup.spans(t(s, dir, "documents"), "doc_id", "text", n = 8)

  val dupSpansSql: String =
    """WITH norm AS (
      |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt FROM documents),
      |tok AS (
      |  SELECT doc_id, unnest(string_split(nt, ' ')) AS w,
      |    generate_subscripts(string_split(nt, ' '), 1) AS p
      |  FROM norm),
      |ntok AS (SELECT doc_id, length(string_split(nt, ' ')) AS n_tokens FROM norm),
      |grams AS (
      |  SELECT doc_id, p AS pos,
      |    CAST(('0x' || substr(sha256(
      |      w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win || ' ' ||
      |      lead(w, 3) OVER win || ' ' || lead(w, 4) OVER win || ' ' ||
      |      lead(w, 5) OVER win || ' ' || lead(w, 6) OVER win || ' ' ||
      |      lead(w, 7) OVER win), 1, 8)) AS BIGINT) AS gram
      |  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY p)
      |  QUALIFY lead(w, 7) OVER win IS NOT NULL),
      |rep AS (SELECT gram FROM grams GROUP BY gram HAVING min(doc_id) <> max(doc_id)),
      |hit AS (SELECT g.doc_id, g.pos FROM grams g JOIN rep USING (gram)),
      |flag AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN pos > coalesce(max(pos) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 8,
      |      -9223372036854775808) THEN 1 ELSE 0 END AS new_span
      |  FROM hit),
      |sp AS (
      |  SELECT doc_id, pos, sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span
      |  FROM flag),
      |per_span AS (
      |  SELECT doc_id, span, count(*) AS hits, max(pos) + 8 - min(pos) AS span_tokens
      |  FROM sp GROUP BY 1, 2)
      |SELECT p.doc_id, CAST(n.n_tokens AS BIGINT) AS n_tokens,
      |  CAST(sum(p.hits) AS BIGINT) AS dup_grams,
      |  count(*) AS n_spans,
      |  CAST(sum(p.span_tokens) AS BIGINT) AS dup_tokens,
      |  round(CAST(sum(p.span_tokens) AS DOUBLE) / n.n_tokens, 6) AS dup_coverage
      |FROM per_span p JOIN ntok n USING (doc_id)
      |GROUP BY p.doc_id, n.n_tokens""".stripMargin

  /** Cross-source shingle-overlap matrix
    * ([[graft.operators.SourceOverlap]]): shared 8-gram shingles and
    * Jaccard per source pair — the contamination/provenance audit run
    * before choosing which crawls enter the training mix.
    */
  def sourceOverlap(s: SparkSession, dir: String): DataFrame =
    SourceOverlap.matrix(t(s, dir, "documents"), "source", "text", n = 8)

  val sourceOverlapSql: String =
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
      |per_source AS (SELECT source, count(*) AS n FROM grams GROUP BY 1),
      |pairs AS (
      |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared_shingles
      |  FROM grams a JOIN grams b ON a.gram = b.gram AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT src_a, src_b, shared_shingles,
      |  CAST(pa.n AS BIGINT) AS n_a, CAST(pb.n AS BIGINT) AS n_b,
      |  round(CAST(shared_shingles AS DOUBLE) / (pa.n + pb.n - shared_shingles), 6) AS jaccard
      |FROM pairs
      |JOIN per_source pa ON pairs.src_a = pa.source
      |JOIN per_source pb ON pairs.src_b = pb.source""".stripMargin

  /** Collocation mining ([[graft.operators.Collocations]]): token
    * pairs whose co-occurrence lift beats independence — the phrase /
    * tokenizer-merge-candidate pass. Lift is PMI without `ln` (the
    * BM25 odds-idf trade), so every step is a count ratio DuckDB
    * replays exactly.
    */
  def collocations(s: SparkSession, dir: String): DataFrame =
    graft.operators.Collocations.mine(
      t(s, dir, "documents"), "text", minCount = 5L, minLift = 1.2)

  val collocationsSql: String =
    """WITH tok AS (
      |  SELECT doc_id,
      |    unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w,
      |    generate_subscripts(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '), 1) AS p
      |  FROM documents),
      |bi AS (
      |  SELECT doc_id, p, w AS w1,
      |    lead(w) OVER (PARTITION BY doc_id ORDER BY p) AS w2
      |  FROM tok QUALIFY w2 IS NOT NULL),
      |pc AS (SELECT w1, w2, count(*) AS pair_count FROM bi GROUP BY 1, 2),
      |pref AS (SELECT w1, CAST(sum(pair_count) AS BIGINT) AS c1 FROM pc GROUP BY 1),
      |suf AS (SELECT w2, CAST(sum(pair_count) AS BIGINT) AS c2 FROM pc GROUP BY 1),
      |n AS (SELECT CAST(sum(pair_count) AS BIGINT) AS n_bigrams FROM pc)
      |SELECT w1, w2, pair_count, c1, c2,
      |  round((CAST(pair_count AS DOUBLE) * n_bigrams) /
      |        (CAST(c1 AS DOUBLE) * c2), 6) AS lift
      |FROM pc JOIN pref USING (w1) JOIN suf USING (w2) CROSS JOIN n
      |WHERE pair_count >= 5
      |  AND round((CAST(pair_count AS DOUBLE) * n_bigrams) /
      |            (CAST(c1 AS DOUBLE) * c2), 6) >= 1.2""".stripMargin

  /** Training-mix token budget: per (source, lang) document and token
    * totals with corpus share — the numbers a mix-weighting pass
    * ([[graft.operators.Sampling.weightedMix]]) is parameterized with.
    * One group aggregation + a one-row broadcast total.
    */
  def tokenBudget(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("source"), col("lang"),
      size(split(TextFunctions.normalizeText(col("text")), " "))
        .cast("long").as("__toks"))
    d.groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("__toks")).as("n_tokens"))
      .crossJoin(broadcast(d.agg(sum(col("__toks")).as("__total"))))
      .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("__total"), 6)
          .as("token_share"))
  }

  val tokenBudgetSql: String =
    """WITH d AS (
      |  SELECT source, lang,
      |    CAST(length(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
      |      AS BIGINT) AS toks
      |  FROM documents),
      |n AS (SELECT CAST(sum(toks) AS BIGINT) AS total FROM d)
      |SELECT source, lang, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS n_tokens,
      |  round(CAST(sum(toks) AS DOUBLE) / any_value(n.total), 6) AS token_share
      |FROM d CROSS JOIN n
      |GROUP BY source, lang""".stripMargin

  /** Hard-negative mining
    * ([[graft.operators.SimilaritySearch.hardNegatives]]): nearest
    * different-label neighbors per query vector — contrastive-training
    * batch construction. Brute-force shape with the bounded broadcast
    * probe set, label inequality inside the join condition.
    */
  def hardNegatives(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    SimilaritySearch.hardNegatives(
      e.filter(col("vec_id") < 10), e, "vec_id", "embedding", "label", k = 5)
      .withColumn("rank", col("rank").cast("long"))
  }

  val hardNegativesSql: String =
    """WITH n AS (SELECT vec_id, label, list_transform(CAST(embedding AS DOUBLE[]),
      |    x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                   CAST(embedding AS DOUBLE[])))) AS nv
      |  FROM embeddings),
      |q AS (SELECT vec_id AS query_id, label AS q_label, nv AS qv FROM n WHERE vec_id < 10),
      |c AS (SELECT vec_id AS neighbor_id, label AS c_label, nv AS cv FROM n),
      |scored AS (SELECT query_id, neighbor_id,
      |  round(list_dot_product(qv, cv), 6) AS cos_sim
      |  FROM q, c WHERE query_id <> neighbor_id AND q_label <> c_label),
      |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |  ORDER BY cos_sim DESC, neighbor_id) AS rn FROM scored)
      |SELECT query_id, neighbor_id, cos_sim, rn AS rank FROM ranked WHERE rn <= 5""".stripMargin

  /** Contrastive training-triplet mining: (anchor, positive, negative)
    * rows for embedding-model training — positives are near-duplicate
    * variants above a Jaccard floor (the audited
    * [[Dedup.ngramJaccard]] path), negatives are each anchor's hardest
    * different-label embedding neighbor (the audited
    * [[graft.operators.SimilaritySearch.hardNegatives]] path). The
    * composition is the point: the mined pairs and the embedding
    * space come from two different proven operators, joined on the
    * anchor. At corpus scale the negative side routes through the
    * LSH/IVF probe instead of the bounded brute-force used here.
    */
  def trainingTriplets(s: SparkSession, dir: String): DataFrame = {
    val corpus = DedupQueries.nearDupCorpus(s, dir)
    val pairs = t(s, dir, "documents")
      .filter(col("doc_id") % 7 === 0)
      .select(col("doc_id").as("id_a"), (col("doc_id") + 1000000).as("id_b"))
    val pos = Dedup.ngramJaccard(corpus, pairs, "text", "doc_id", DedupQueries.MinHashShingle)
      .withColumn("jaccard", round(col("jaccard"), 6))
      .filter(col("jaccard") >= 0.5)
      .select(col("id_a").as("anchor_id"), col("id_b").as("positive_id"),
        col("jaccard").as("pos_jaccard"))
    val e = t(s, dir, "embeddings")
    val anchors = e.join(
      pos.select(col("anchor_id").as("vec_id")).distinct(), "vec_id")
    val neg = SimilaritySearch.hardNegatives(
      anchors, e, "vec_id", "embedding", "label", k = 1)
      .select(col("query_id").as("anchor_id"),
        col("neighbor_id").as("negative_id"),
        col("cos_sim").as("neg_cos_sim"))
    pos.join(neg, "anchor_id")
      .select("anchor_id", "positive_id", "pos_jaccard",
        "negative_id", "neg_cos_sim")
  }

  val trainingTripletsSql: String =
    s"""WITH corpus AS (${DedupQueries.nearDupCorpusSql}),
       |words AS (SELECT doc_id,
       |  string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
       |  FROM corpus),
       |sets AS (SELECT doc_id,
       |  list_distinct(list_transform(
       |    list_transform(range(1, len(w) - 1),
       |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
       |    s -> CAST(('0x' || substr(sha256(s), 1, 8)) AS BIGINT)))
       |  AS sh FROM words),
       |pr AS (SELECT doc_id AS id_a, doc_id + 1000000 AS id_b
       |  FROM documents WHERE doc_id % 7 = 0),
       |pos AS (SELECT * FROM (
       |  SELECT id_a AS anchor_id, id_b AS positive_id,
       |    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |      CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE), 6)
       |      AS pos_jaccard
       |  FROM pr JOIN sets a ON id_a = a.doc_id JOIN sets b ON id_b = b.doc_id)
       |  WHERE pos_jaccard >= 0.5),
       |n AS (SELECT vec_id, label, list_transform(CAST(embedding AS DOUBLE[]),
       |    x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |                                   CAST(embedding AS DOUBLE[])))) AS nv
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, label AS q_label, nv AS qv FROM n
       |  WHERE vec_id IN (SELECT anchor_id FROM pos)),
       |scored AS (SELECT query_id, vec_id AS neighbor_id,
       |    round(list_dot_product(qv, nv), 6) AS cos_sim
       |  FROM q, n WHERE query_id <> vec_id AND q_label <> label),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |  ORDER BY cos_sim DESC, neighbor_id) AS rn FROM scored)
       |SELECT p.anchor_id, p.positive_id, p.pos_jaccard,
       |  r.neighbor_id AS negative_id, r.cos_sim AS neg_cos_sim
       |FROM pos p JOIN ranked r ON r.query_id = p.anchor_id AND r.rn = 1""".stripMargin

  /** Curriculum binning ([[graft.operators.Curriculum.exactBins]]):
    * per-language quality-quantile bins (ntile + percent_rank over the
    * total (score, doc_id) order). The quality score is the engine's
    * [[TextFunctions.qualityScore]], already proven hash-exact against
    * DuckDB by q_text_stats, so the ordering agrees across engines
    * bit-for-bit. The sketch-boundary scale path is spec-gated
    * (CurriculumSpec) against this exact truth.
    */
  def curriculumBins(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curriculum.exactBins(
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextFunctions.qualityScore(col("text")).as("quality_score")),
      "lang", "quality_score", "doc_id", bins = 4)

  val curriculumBinsSql: String =
    """WITH base AS (
      |  SELECT doc_id, lang,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok,
      |    CAST(length(text) AS BIGINT) AS n_chr
      |  FROM documents),
      |scored AS (
      |  SELECT doc_id, lang,
      |    round(least(CAST(n_chr AS DOUBLE) / 200.0, 1.0) * 0.5 +
      |      (CASE WHEN awl BETWEEN 3 AND 10 THEN 1.0
      |            WHEN awl > 0 THEN 0.5 ELSE 0.0 END) * 0.5, 6) AS quality_score
      |  FROM (SELECT *, CASE WHEN n_tok > 0
      |          THEN CAST(n_chr AS DOUBLE) / CAST(n_tok AS DOUBLE)
      |          ELSE 0.0 END AS awl FROM base))
      |SELECT doc_id, lang, quality_score,
      |  CAST(ntile(4) OVER w AS BIGINT) AS bin,
      |  round(percent_rank() OVER w, 6) AS pct_rank
      |FROM scored
      |WINDOW w AS (PARTITION BY lang ORDER BY quality_score, doc_id)""".stripMargin

  /** Deterministic shard assignment
    * ([[graft.operators.Sharding.shardAssign]]): the training-export
    * global shuffle — shard and in-shard position both derive from the
    * portable sha-256 hash, so DuckDB replays every (shard, pos).
    */
  def shardAssign(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sharding.shardAssign(
      t(s, dir, "documents").select("doc_id", "lang", "source"),
      "doc_id", numShards = 8, seed = 13L)

  val shardAssignSql: String =
    """WITH h AS (SELECT doc_id, lang, source,
      |    CAST(('0x' || substr(sha256('13:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS hv
      |  FROM documents)
      |SELECT doc_id, lang, source, hv % 8 AS shard,
      |  CAST(row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) AS BIGINT) AS shard_pos
      |FROM h""".stripMargin

  /** Per-source quota caps
    * ([[graft.operators.Curation.sourceCapsWindow]]): keep the top-10
    * quality docs per source. The oracle checks the exact window
    * truth; CurationSpec proves the k-bounded map-side formulation
    * ([[graft.operators.Curation.sourceCaps]]) emits identical rows.
    */
  def sourceCaps(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.sourceCapsWindow(
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextFunctions.qualityScore(col("text")).as("quality_score")),
      "source", "doc_id", "quality_score", cap = 10)

  val sourceCapsSql: String =
    """WITH base AS (
      |  SELECT doc_id, source,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok,
      |    CAST(length(text) AS BIGINT) AS n_chr
      |  FROM documents),
      |scored AS (
      |  SELECT doc_id, source,
      |    round(least(CAST(n_chr AS DOUBLE) / 200.0, 1.0) * 0.5 +
      |      (CASE WHEN awl BETWEEN 3 AND 10 THEN 1.0
      |            WHEN awl > 0 THEN 0.5 ELSE 0.0 END) * 0.5, 6) AS quality_score
      |  FROM (SELECT *, CASE WHEN n_tok > 0
      |          THEN CAST(n_chr AS DOUBLE) / CAST(n_tok AS DOUBLE)
      |          ELSE 0.0 END AS awl FROM base))
      |SELECT doc_id, source, quality_score,
      |  CAST(rn AS BIGINT) AS src_rank
      |FROM (SELECT *, row_number() OVER (PARTITION BY source
      |        ORDER BY quality_score DESC, doc_id) AS rn FROM scored)
      |WHERE rn <= 10""".stripMargin

  /** Anti join: customers with no urgent order. Spark plans LEFT ANTI
    * with the orders side aggregated to distinct keys before the join;
    * at scale the filter pushes into the orders scan and the join
    * stays a hash (or broadcast) anti — never a per-row subquery.
    */
  def antiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val urgent = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey")
    c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_acctbal")
  }

  val antiJoinSql: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')""".stripMargin

  /** Semi join: suppliers with at least one max-quantity deep-discount
    * shipment. LEFT SEMI — the lineitem side never duplicates supplier
    * rows, and the selective predicate pushes to the parquet scan.
    */
  def semiJoin(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier")
    val li = t(s, dir, "lineitem")
      .filter(col("l_quantity") >= 50.0 && col("l_discount") > 0.09)
      .select("l_suppkey")
    sup.join(li, sup("s_suppkey") === li("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name", "s_nationkey")
  }

  val semiJoinSql: String =
    """SELECT s_suppkey, s_name, s_nationkey FROM supplier s
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |  WHERE l.l_suppkey = s.s_suppkey
      |    AND l.l_quantity >= 50.0 AND l.l_discount > 0.09)""".stripMargin

  /** Fixed-width histogram of document lengths: a single hash
    * aggregate on the computed bucket — the distribution profile step
    * before length filtering. Bucket arithmetic is plain double
    * division + floor, identical in both engines.
    */
  def lengthHistogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(least(floor(col("n_chars") / lit(50.0)), lit(11L))
        .cast("long").as("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        min("n_chars").as("min_chars"),
        max("n_chars").as("max_chars"))

  val lengthHistogramSql: String =
    """SELECT CAST(least(floor(n_chars / 50.0), 11) AS BIGINT) AS bucket,
      |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
      |FROM documents GROUP BY 1""".stripMargin

  /** Native session windows: Spark's `session_window` (gap-merged
    * event-time windows) as a batch aggregate — the same operator
    * Structured Streaming uses for watermarked session state, so this
    * oracle also pins the streaming sessionization semantics
    * (SessionWindowParitySpec replays the fixture through the
    * stateful streaming form and matches sessions one-for-one). A
    * session's end is last-event + gap; a new session starts when the
    * gap to the previous event is >= 30 min (windows merge only on
    * strict overlap).
    */
  def sessionWindows(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("user_id"),
        col("sw.start").as("session_start"),
        col("sw.end").as("session_end"),
        col("n_events"), col("total_value"))

  val sessionWindowsSql: String =
    """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      |x AS (SELECT *, lag(epoch_us(ts)) OVER
      |        (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e),
      |y AS (SELECT *, CASE WHEN prev IS NULL OR epoch_us(ts) - prev >= 1800000000
      |        THEN 1 ELSE 0 END AS ns FROM x),
      |z AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS UNBOUNDED PRECEDING) AS seq FROM y)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM z GROUP BY user_id, seq""".stripMargin

  /** Cohort retention triangle: users bucketed by first-activity week,
    * distinct-active counts per weeks-since-cohort. The classic
    * product-analytics shape: one aggregate for first-seen, a shuffle
    * join back (NOT broadcast — the user dimension grows with the
    * data), one count-distinct aggregate. Week distance is exact day
    * arithmetic (multiples of 7), identical in both engines.
    */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("w"))
    val first = e.groupBy("user_id").agg(min("w").as("cohort"))
    e.join(first, "user_id")
      .groupBy(col("cohort"),
        (datediff(col("w"), col("cohort")) / lit(7)).cast("long")
          .as("weeks_since"))
      .agg(count_distinct(col("user_id")).as("active_users"))
  }

  val cohortRetentionSql: String =
    """WITH e AS (SELECT user_id,
      |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS w FROM events),
      |f AS (SELECT user_id, min(w) AS cohort FROM e GROUP BY 1)
      |SELECT cohort,
      |  CAST(datediff('day', cohort, w) / 7 AS BIGINT) AS weeks_since,
      |  count(DISTINCT e.user_id) AS active_users
      |FROM e JOIN f USING (user_id)
      |GROUP BY 1, 2""".stripMargin

  /** Cube aggregation: all 2^2 grouping combinations in one pass
    * (rollup and grouping-sets siblings are q_agg_rollup /
    * q_agg_grouping_sets). `grouping_id` disambiguates real NULL keys
    * from subtotal rows.
    */
  def aggCube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("n"),
        grouping_id().cast("long").as("gid"))

  val aggCubeSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n,
      |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  /** INTERSECT / EXCEPT set semantics in one result: nations with
    * high-balance customers split by whether they also field
    * high-balance suppliers. Spark plans both as aggregate-then-join
    * (left-semi / left-anti over distincts) — no sort, broadcast-able
    * sides.
    */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
      .select(col("c_nationkey").as("nationkey")).distinct()
    val sup = t(s, dir, "supplier").filter(col("s_acctbal") > 9000)
      .select(col("s_nationkey").as("nationkey")).distinct()
    c.intersect(sup).withColumn("set_op", lit("both"))
      .unionByName(c.except(sup).withColumn("set_op", lit("customer_only")))
  }

  val setOpsSql: String =
    """WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer
      |  WHERE c_acctbal > 9000),
      |s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier
      |  WHERE s_acctbal > 9000)
      |SELECT nationkey, 'both' AS set_op FROM (SELECT * FROM c INTERSECT SELECT * FROM s)
      |UNION ALL
      |SELECT nationkey, 'customer_only' FROM (SELECT * FROM c EXCEPT SELECT * FROM s)""".stripMargin

  /** Exact-size per-stratum sampling
    * ([[graft.operators.Sampling.exactSample]]): exactly 20 docs per
    * language — the n smallest portable hashes win, so DuckDB replays
    * the membership row-for-row (unlike Bernoulli forms, the size is
    * a guarantee, which is what eval-set construction needs).
    */
  def sampleExact(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.exactSample(
      t(s, dir, "documents").select("doc_id", "lang", "source"),
      "lang", "doc_id", n = 20, seed = 5L)

  val sampleExactSql: String =
    """WITH h AS (SELECT doc_id, lang, source,
      |    CAST(('0x' || substr(sha256('5:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |      / 4294967296.0 AS u
      |  FROM documents)
      |SELECT doc_id, lang, source, CAST(rn AS BIGINT) AS sample_rank FROM (
      |  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY u, doc_id) AS rn
      |  FROM h)
      |WHERE rn <= 20""".stripMargin

  /** Deterministic train/val/test split
    * ([[graft.operators.Sampling.split]]): disjoint hash-unit ranges,
    * pure projection — zero shuffles, and a re-run can never migrate a
    * row across splits. Fractions are binary-exact (0.75/0.125/0.125)
    * so the cut points have one representation in both engines.
    */
  def trainTestSplit(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.split(
      t(s, dir, "documents").select("doc_id", "lang"),
      "doc_id", seed = 11L,
      fractions = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))

  val trainTestSplitSql: String =
    """SELECT doc_id, lang,
      |  CASE WHEN u < 0.75 THEN 'train'
      |       WHEN u < 0.875 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM (SELECT doc_id, lang,
      |  CAST(('0x' || substr(sha256('11:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |    / 4294967296.0 AS u
      |FROM documents)""".stripMargin

  /** Global top-N without a global sort: `orderBy + limit` plans as
    * TakeOrderedAndProject — each partition keeps its local top-100,
    * only those k·partitions rows converge — so "best N docs in the
    * corpus" never total-sorts 100 TB. The (score desc, id) order is
    * total, so the selected SET is deterministic and oracle-checkable
    * (the driver compare is order-insensitive).
    */
  def globalTopN(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextFunctions.qualityScore(col("text")).as("quality_score"))
      .orderBy(col("quality_score").desc, col("doc_id"))
      .limit(100)

  val globalTopNSql: String =
    """WITH base AS (
      |  SELECT doc_id, lang,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok,
      |    CAST(length(text) AS BIGINT) AS n_chr
      |  FROM documents)
      |SELECT doc_id, lang,
      |  round(least(CAST(n_chr AS DOUBLE) / 200.0, 1.0) * 0.5 +
      |    (CASE WHEN awl BETWEEN 3 AND 10 THEN 1.0
      |          WHEN awl > 0 THEN 0.5 ELSE 0.0 END) * 0.5, 6) AS quality_score
      |FROM (SELECT *, CASE WHEN n_tok > 0
      |        THEN CAST(n_chr AS DOUBLE) / CAST(n_tok AS DOUBLE)
      |        ELSE 0.0 END AS awl FROM base)
      |ORDER BY quality_score DESC, doc_id LIMIT 100""".stripMargin

  /** Funnel attribution (view → first purchase within the hour): the
    * as-of join run FORWARD by negating the time axis — "latest right
    * ≤ left" on -t is "earliest right ≥ left" on t, so the existing
    * operator (one exchange per side, no self-join) answers the
    * conversion question as composed. Delay stays in exact integer
    * microseconds; the window test is a post-filter.
    */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"),
        col("ts").as("view_ts"), (-unix_micros(col("ts"))).as("nts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), (-unix_micros(col("ts"))).as("p_nts"))
    graft.operators.AsOfJoin.asOfJoin(
      views, purchases,
      keyCols = Seq("user_id"),
      leftTimeCol = "nts", rightTimeCol = "p_nts",
      rightValueCols = Seq("p_nts"),
      strict = true)
      .select(col("event_id"), col("user_id"), col("view_ts"),
        (-col("p_nts") - unix_micros(col("view_ts"))).as("delay_us"),
        (col("p_nts").isNotNull &&
          -col("p_nts") - unix_micros(col("view_ts")) <= 3600000000L)
          .as("converted_1h"))
  }

  val funnelSql: String =
    """WITH v AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'view'),
      |p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'purchase')
      |SELECT v.event_id, v.user_id, v.ts AS view_ts,
      |  epoch_us((SELECT min(p.ts) FROM p
      |    WHERE p.user_id = v.user_id AND p.ts > v.ts)) - epoch_us(v.ts)
      |    AS delay_us,
      |  coalesce(epoch_us((SELECT min(p.ts) FROM p
      |    WHERE p.user_id = v.user_id AND p.ts > v.ts)) - epoch_us(v.ts)
      |    <= 3600000000, false) AS converted_1h
      |FROM v""".stripMargin

  /** Per-group z-score outliers with CROSS-ENGINE-DETERMINISTIC
    * variance: l_quantity is integer-valued, so sum and sum-of-squares
    * are exact longs at any aggregation order — the z-test then runs
    * in double with the identical operation order on both engines,
    * where a floating stddev_samp would drift by merge order and flap
    * the hash oracle. One stats aggregate broadcast back over one
    * scan; the flag is a pure projection.
    */
  def groupOutliers(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity").cast("long").as("q"))
    val stats = li.groupBy("l_returnflag").agg(
      count(lit(1)).as("n"), sum("q").as("s"), sum(col("q") * col("q")).as("ss"))
    // z² as (n·q - s)² > k²·n·(n·ss - s²)/(n-1), k = 1.6. The SUMS are
    // exact longs; the products run in DOUBLE from the first factor —
    // long products would overflow past ~3e9 rows per group (ANSI
    // throw), and the oracle must replay the identical IEEE operation
    // order, so both sides spell the same double formula.
    val nD = col("n").cast("double")
    val dev = nD * col("q") - col("s")
    li.join(broadcast(stats), "l_returnflag")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("q"),
        (dev * dev >
          // k² spelled as the literal 2.56 on BOTH sides: Scala's
          // 1.6*1.6 rounds to a different double than DuckDB's exact
          // DECIMAL product — a 1-ulp constant gap that could flap
          // boundary rows
          lit(2.56) / (nD - 1) * col("n") *
            (nD * col("ss") - col("s").cast("double") * col("s"))).as("is_outlier"))
      .filter(col("is_outlier"))
  }

  val groupOutliersSql: String =
    """WITH li AS (SELECT l_orderkey, l_linenumber, l_returnflag,
      |    CAST(l_quantity AS BIGINT) AS q FROM lineitem),
      |st AS (SELECT l_returnflag, count(*) AS n, sum(q) AS s, sum(q * q) AS ss
      |  FROM li GROUP BY 1)
      |SELECT l_orderkey, l_linenumber, li.l_returnflag, q, true AS is_outlier
      |FROM li JOIN st ON li.l_returnflag = st.l_returnflag
      |WHERE (CAST(n AS DOUBLE) * q - s) * (CAST(n AS DOUBLE) * q - s) >
      |  2.56 / (CAST(n AS DOUBLE) - 1) * n *
      |    (CAST(n AS DOUBLE) * ss - CAST(s AS DOUBLE) * s)""".stripMargin

  /** One BPE trainer step: count adjacent character pairs inside words
    * corpus-wide, emit the top merge candidates — the inner loop of
    * byte-pair/sentencepiece vocabulary training. Pair extraction is a
    * per-row codegen'd array transform (no join, no per-char explode
    * of the corpus — one explode per word pair list); the top-20 is
    * TakeOrdered on the aggregated counts, never a global sort. Both
    * engines index substrings by codepoint, so CJK text counts
    * identically.
    */
  def bpeMerges(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(split(TextFunctions.normalizeText(col("text")), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))")).as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(20)

  val bpeMergesSql: String =
    """WITH w AS (SELECT unnest(string_split(
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
      |  FROM documents),
      |p AS (SELECT unnest(list_transform(range(1, length(w)),
      |    i -> substr(w, i, 2))) AS pair
      |  FROM w WHERE length(w) >= 2)
      |SELECT pair, count(*) AS cnt FROM p
      |GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 20""".stripMargin

  /** Edit-distance verification of near-dup pairs: levenshtein between
    * each planted variant and its original — the character-level
    * complement to set-based Jaccard (catches reorder-free edits that
    * shingles blur). Restricted to pure-ASCII texts because DuckDB's
    * levenshtein counts BYTES where Spark counts codepoints — the
    * octet_length == length predicate is the same test in both
    * engines. Pair workload shape: id join, per-pair O(n·m) DP kernel
    * codegen'd per row.
    */
  def editDistancePairs(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .filter(octet_length(col("text")) === length(col("text")))
    val orig = d.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id").as("id_a"), col("text").as("text_a"))
    val variant = orig.select(
      (col("id_a") + 1000000).as("id_b"),
      expr("substr(text_a, 1, greatest(length(text_a) - 15, 20))").as("text_b"),
      col("id_a"))
    orig.join(variant, "id_a")
      .select(col("id_a"), col("id_b"),
        levenshtein(col("text_a"), col("text_b")).cast("long").as("edit_dist"),
        round(lit(1.0) - levenshtein(col("text_a"), col("text_b")) /
          greatest(length(col("text_a")), length(col("text_b"))).cast("double"), 6)
          .as("edit_sim"))
  }

  val editDistancePairsSql: String =
    """WITH d AS (SELECT doc_id, text FROM documents
      |  WHERE strlen(text) = length(text)),
      |o AS (SELECT doc_id AS id_a, text AS text_a FROM d WHERE doc_id % 7 = 0),
      |v AS (SELECT id_a, id_a + 1000000 AS id_b,
      |  substr(text_a, 1, greatest(length(text_a) - 15, 20)) AS text_b FROM o)
      |SELECT o.id_a, v.id_b,
      |  levenshtein(text_a, text_b) AS edit_dist,
      |  round(1.0 - levenshtein(text_a, text_b) /
      |    CAST(greatest(length(text_a), length(text_b)) AS DOUBLE), 6) AS edit_sim
      |FROM o JOIN v USING (id_a)""".stripMargin

  /** Distribution-drift monitor: per-source chi-square of the
    * doc-length histogram against the corpus-wide distribution — the
    * "did source X change shape this crawl" check. KL/PSI need `ln`
    * (engine-dependent rounding); chi-square is rational in the exact
    * integer counts, and the per-source sum folds through
    * DECIMAL(27,10) so it is order-independent — the same trade the
    * BM25 odds-idf makes. Zero-observed buckets contribute their full
    * expected mass (a source missing a bucket IS drift), via a
    * source × bucket cross of two tiny aggregates.
    */
  def distributionDrift(s: SparkSession, dir: String): DataFrame = {
    val d = graft.operators.Drift.lengthBuckets(
      t(s, dir, "documents"), "source", "n_chars")
    graft.operators.Drift.chi2FromCounts(
      d.groupBy("source", "bucket").agg(count(lit(1)).as("o")))
  }

  val distributionDriftSql: String =
    """WITH d AS (SELECT source,
      |    CAST(least(floor(n_chars / 50.0), 11) AS BIGINT) AS bucket
      |  FROM documents),
      |obs AS (SELECT source, bucket, count(*) AS o FROM d GROUP BY 1, 2),
      |st AS (SELECT source, count(*) AS src_n FROM d GROUP BY 1),
      |bk AS (SELECT bucket, count(*) AS bucket_n FROM d GROUP BY 1),
      |tot AS (SELECT count(*) AS all_n FROM d),
      |grid AS (SELECT source, src_n, bucket, bucket_n, all_n FROM st, bk, tot),
      |terms AS (SELECT g.source, g.src_n,
      |    CAST((coalesce(o, 0) - e) * (coalesce(o, 0) - e) / e AS DECIMAL(27,10)) AS term
      |  FROM (SELECT *,
      |      CAST(src_n AS DOUBLE) * bucket_n / all_n AS e FROM grid) g
      |  LEFT JOIN obs ON g.source = obs.source AND g.bucket = obs.bucket)
      |SELECT source, max(src_n) AS n_docs,
      |  round(CAST(sum(term) AS DOUBLE), 6) AS chi2
      |FROM terms GROUP BY 1""".stripMargin

  /** Population Stability Index companion of q_distribution_drift
    * ([[graft.operators.Drift.psiFromCounts]]): the banded drift score
    * model-risk dashboards alarm on, over the identical count table.
    * `ln` is made engine-exact by the perplexity family's
    * round-to-7dp-then-decimal-fold discipline.
    */
  def psiDrift(s: SparkSession, dir: String): DataFrame = {
    val d = graft.operators.Drift.lengthBuckets(
      t(s, dir, "documents"), "source", "n_chars")
    graft.operators.Drift.psiFromCounts(
      d.groupBy("source", "bucket").agg(count(lit(1)).as("o")))
  }

  val psiDriftSql: String =
    """WITH d AS (SELECT source,
      |    CAST(least(floor(n_chars / 50.0), 11) AS BIGINT) AS bucket
      |  FROM documents),
      |obs AS (SELECT source, bucket, count(*) AS o FROM d GROUP BY 1, 2),
      |st AS (SELECT source, count(*) AS src_n FROM d GROUP BY 1),
      |bk AS (SELECT bucket, count(*) AS bucket_n FROM d GROUP BY 1),
      |tot AS (SELECT count(*) AS all_n FROM d),
      |grid AS (SELECT source, src_n, bucket, bucket_n, all_n FROM st, bk, tot),
      |probs AS (SELECT g.source, g.src_n,
      |    (coalesce(o, 0) + 0.5) / (g.src_n + 6.0) AS p_src,
      |    (g.bucket_n + 0.5) / (g.all_n + 6.0) AS p_all
      |  FROM grid g
      |  LEFT JOIN obs ON g.source = obs.source AND g.bucket = obs.bucket),
      |terms AS (SELECT source, src_n,
      |    CAST(round((p_src - p_all) * ln(p_src / p_all), 7) AS DECIMAL(27,7)) AS term
      |  FROM probs)
      |SELECT source, max(src_n) AS n_docs,
      |  round(CAST(sum(term) AS DOUBLE), 6) AS psi
      |FROM terms GROUP BY 1""".stripMargin

  /** Asymmetric containment on the known (original, prefix-variant)
    * pairs ([[graft.operators.Dedup.ngramContainment]]): the variant
    * is a prefix of the original, so cont_b ≈ 1 while Jaccard is
    * diluted by the original's extra tail — the quote/subset signal
    * set-symmetric measures blur.
    */
  def containmentPairs(s: SparkSession, dir: String): DataFrame = {
    val corpus = DedupQueries.nearDupCorpus(s, dir)
    val pairs = t(s, dir, "documents")
      .filter(col("doc_id") % 7 === 0)
      .select(col("doc_id").as("id_a"), (col("doc_id") + 1000000).as("id_b"))
    graft.operators.Dedup.ngramContainment(
      corpus, pairs, "text", "doc_id", DedupQueries.MinHashShingle)
  }

  val containmentPairsSql: String =
    s"""WITH corpus AS (${DedupQueries.nearDupCorpusSql}),
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
       |  CAST(len(a.sh) AS BIGINT) AS size_a,
       |  CAST(len(b.sh) AS BIGINT) AS size_b,
       |  CASE WHEN len(a.sh) > 0 THEN round(
       |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh), 6)
       |    ELSE 0.0 END AS cont_a,
       |  CASE WHEN len(b.sh) > 0 THEN round(
       |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(b.sh), 6)
       |    ELSE 0.0 END AS cont_b
       |FROM pairs JOIN sets a ON id_a = a.doc_id JOIN sets b ON id_b = b.doc_id""".stripMargin
}
