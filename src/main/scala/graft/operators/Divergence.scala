package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Distributional comparison of corpus sources — the mixture-design
  * signals a training-data pipeline computes before choosing sampling
  * weights: how redundant two sources are token-distributionally
  * (Jensen–Shannon divergence between their unigram distributions),
  * and how "natural" each source's frequency profile is (the slope of
  * its Zipf log-log fit — prose sits near −1; templated or synthetic
  * text flattens toward 0, token-spam steepens past it).
  *
  * Scale shape: everything aggregates to VOCABULARY-bounded tables
  * before anything pairwise happens. Unigram counts per source are one
  * explode + one map-side-combined groupBy over the corpus; the
  * pairwise stage joins per-source count tables keyed on (pair, term),
  * never touching documents again — at 100 TB the corpus is read once,
  * and the joined stream is |vocab| × |source pairs| rows (sources
  * number in the dozens, vocab is Zipf-bounded). No driver state
  * beyond the source list used to form pairs.
  *
  * Determinism (oracle parity): per-term float contributions are
  * rounded to 7 dp and summed through DECIMAL(27,7) — exact and
  * order-independent — with every float expression parenthesized
  * identically in the DuckDB mirror, the same fold discipline as
  * [[NgramLm]].
  */
object Divergence {

  private def words(textCol: Column): Column =
    split(TextFunctions.normalizeText(textCol), " ")

  /** (source, w, c) unigram counts — the vocab-bounded MERGEABLE base
    * both signals aggregate from (any sum of such tables feeds the
    * `fromCounts` twins below; the streaming store
    * [[graft.streaming.LexiconStream]] persists exactly these).
    */
  def unigrams(
      docs: DataFrame, sourceCol: String, textCol: String): DataFrame =
    docs
      .select(col(sourceCol).as("source"),
        explode(words(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("source", "w")
      .agg(count(lit(1)).as("c"))

  /** Pairwise Jensen–Shannon divergence between the unigram
    * distributions of every unordered source pair.
    *
    * JS(P,Q) = 0.5·KL(P‖M) + 0.5·KL(Q‖M), M = (P+Q)/2 — symmetric,
    * bounded by ln 2, defined when either side lacks a term. Output:
    * (source_a, source_b, n_terms, js_divergence), source_a < source_b.
    *
    * ONE-SIDED MASS IS ANALYTIC: a term present only in P contributes
    * 0.5·p·ln 2, so the whole one-sided side folds to
    * 0.5·ln 2·(1 − Σ_shared p) — no row ever materializes for a
    * (pair, term) the pair doesn't share. Only SHARED terms flow
    * through the self-equi-join on the term; with mostly-disjoint
    * sources that is the small intersection, not the |pairs| × |vocab|
    * union an outer-join formulation would shuffle. The pair
    * enumeration itself is |sources|² rows (the same bounded pair
    * matrix as [[SourceOverlap]]'s sketch comparison).
    */
  def jsDivergence(
      docs: DataFrame, sourceCol: String, textCol: String): DataFrame =
    jsDivergenceFromCounts(unigrams(docs, sourceCol, textCol))

  /** [[jsDivergence]] over a pre-aggregated (source, w, c) count
    * table — one (source, w) per row (sum duplicates first).
    */
  def jsDivergenceFromCounts(counts0: DataFrame): DataFrame = {
    val counts = counts0
      .localCheckpoint() // self-join sides, vocab and totals read it once
    val totals = counts.groupBy("source").agg(sum("c").as("t"))
    val withP = counts.join(totals, "source") // totals: |sources| rows → broadcast
    val a = withP.select(col("source").as("sa"), col("w"),
      col("c").as("ca"), col("t").as("ta"))
    val b = withP.select(col("source").as("sb"), col("w"),
      col("c").as("cb"), col("t").as("tb"))
    // probabilities from exact longs; identical parenthesization in SQL
    val pa = col("ca").cast("double") / col("ta").cast("double")
    val pb = col("cb").cast("double") / col("tb").cast("double")
    val contrib = (pa * log(pa * lit(2.0) / (pa + pb)) +
      pb * log(pb * lit(2.0) / (pa + pb))) * lit(0.5)
    val shared = a.join(b, Seq("w")).filter(col("sa") < col("sb"))
      .select(col("sa"), col("sb"),
        round(contrib, 7).cast("decimal(27,7)").as("__j"),
        round(pa, 7).cast("decimal(27,7)").as("__pa"),
        round(pb, 7).cast("decimal(27,7)").as("__pb"))
      .groupBy("sa", "sb")
      .agg(count(lit(1)).as("n_shared"),
        sum(col("__j")).as("j_shared"),
        sum(col("__pa")).as("pa_shared"),
        sum(col("__pb")).as("pb_shared"))
    val vocab = counts.groupBy("source").agg(count(lit(1)).as("v"))
    // |sources|² pair table — bounded by the source dimension, never
    // by data volume; keeps zero-overlap pairs in the output
    val pairs = vocab.select(col("source").as("sa"), col("v").as("va"))
      .crossJoin(vocab.select(col("source").as("sb"), col("v").as("vb")))
      .filter(col("sa") < col("sb"))
    // pinned double literal (nearest to ln 2): the residual multiplies
    // EXACT decimal sums by this constant, so both engines must hold
    // bit-identical operands — a runtime ln(2) could differ by an ulp
    // between libm implementations, and nothing downstream re-rounds
    val halfLn2 = lit(0.5) * lit(0.6931471805599453)
    pairs.join(shared, Seq("sa", "sb"), "left")
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        (col("va") + col("vb") - coalesce(col("n_shared"), lit(0L)))
          .as("n_terms"),
        round(coalesce(col("j_shared").cast("double"), lit(0.0)) +
          halfLn2 * (lit(2.0) -
            coalesce(col("pa_shared").cast("double"), lit(0.0)) -
            coalesce(col("pb_shared").cast("double"), lit(0.0))), 6)
          .as("js_divergence"))
  }

  /** Per-source Zipf slope: ordinary-least-squares slope of
    * ln(frequency) on ln(rank) over each source's `topK` most frequent
    * terms (rank by count desc, term asc — total order, so ranks are
    * engine-portable). Natural prose approaches −1. Output:
    * (source, n_terms, zipf_slope).
    *
    * The per-source top-K is a rank-window over the vocab-bounded
    * count table (vocab rows per source, NOT corpus rows), then the
    * OLS reduces K points per source — closed form from decimal-folded
    * moment sums, one aggregate.
    */
  def zipfSlope(
      docs: DataFrame, sourceCol: String, textCol: String,
      topK: Int = 200): DataFrame =
    zipfSlopeFromCounts(unigrams(docs, sourceCol, textCol), topK)

  /** [[zipfSlope]] over a pre-aggregated (source, w, c) count table. */
  def zipfSlopeFromCounts(counts: DataFrame, topK: Int = 200): DataFrame = {
    require(topK >= 2, s"need topK >= 2, got $topK")
    val ranked = counts
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("source")
          .orderBy(col("c").desc, col("w"))))
      .filter(col("rank") <= topK)
    val x = log(col("rank").cast("double"))
    val y = log(col("c").cast("double"))
    def dec(c: Column): Column = round(c, 7).cast("decimal(27,7)")
    val moments = ranked
      .select(col("source"),
        dec(x).as("__x"), dec(y).as("__y"),
        dec(x * x).as("__xx"), dec(x * y).as("__xy"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_terms"),
        sum("__x").as("sx"), sum("__y").as("sy"),
        sum("__xx").as("sxx"), sum("__xy").as("sxy"))
    val n = col("n_terms").cast("double")
    val slope =
      (n * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")) /
        (n * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double"))
    moments.select(col("source"), col("n_terms"),
      round(slope, 6).as("zipf_slope"))
  }
}
