package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-quality metrics for the filtering models a training-data
  * pipeline runs at scale (quality scorers, language ID, toxicity
  * gates): rank-based ROC AUC and reliability (calibration) bins.
  * Both reduce the corpus ONCE and do all ordering work on a
  * DOMAIN-BOUNDED table — the same shape as the equidepth/t-closeness
  * family, never a data-sized global sort.
  *
  * AUC is the Mann–Whitney statistic computed from per-score class
  * counts: with scores grouped (the `round`-discretized grid makes
  * the group table bounded), ascending over distinct scores,
  *
  *   AUC = Σ_s pos_s · (cumNeg_{<s} + neg_s / 2) / (nPos · nNeg)
  *
  * — the neg_s/2 term IS the tie correction (a tied pair counts ½),
  * so the result equals the average-rank formulation exactly.
  */
object Evaluation {

  /** Rank-based ROC AUC of `score` against boolean `label`, over a
    * `precision`-dp discretized score grid (6 dp keeps ~any real
    * scorer's resolution while bounding the distinct-score table; the
    * discretization is part of the metric's contract and applied
    * identically by the oracle). Returns one row:
    * (n_pos, n_neg, auc). Scale shape: one map-side-combined
    * aggregate over the corpus; the cumulative window runs over the
    * bounded distinct-score table only.
    *
    * Bounded-score CONTRACT (enforced, not assumed): scores must lie
    * in `[-maxAbs, maxAbs]` — with the `precision`-dp grid that caps
    * the distinct-score table at `2·maxAbs·10^precision + 1` rows, so
    * the global cumulative window stays domain-bounded at any corpus
    * size. An out-of-range score fails the job loudly (per-row
    * codegen'd check, no extra pass). The default (±1, 6 dp) fits any
    * probability-like scorer at ≤ 2·10⁶ distinct scores.
    *
    * Degenerate input: if only one class remains after null
    * filtering, `auc` is NULL by contract (the Mann–Whitney statistic
    * is undefined without both classes); `n_pos` / `n_neg` still
    * report, so the caller can tell "degenerate input" from a
    * computed value.
    */
  def rocAuc(
      df: DataFrame,
      scoreCol: Column,
      labelCol: Column,
      precision: Int = 6,
      maxAbs: Double = 1.0): DataFrame = {
    require(precision >= 0 && maxAbs > 0,
      s"need precision >= 0 and maxAbs > 0, got $precision, $maxAbs")
    val byScore = df
      .select(round(scoreCol.cast("double"), precision).as("__s"),
        labelCol.cast("boolean").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
      // the coalesce keeps the assertion inside the filter so column
      // pruning cannot drop it: assert_true is NULL on success
      .filter(coalesce(
        assert_true(abs(col("__s")) <= maxAbs,
          concat(lit(s"rocAuc: score outside [-$maxAbs, $maxAbs] — the " +
            "bounded distinct-score window contract; got "),
            col("__s").cast("string"))),
        lit(true)))
      .groupBy("__s")
      .agg(
        count(when(col("__y"), lit(1))).as("__pos"),
        count(when(!col("__y"), lit(1))).as("__neg"))
    // bounded global window over distinct scores — deliberate, same
    // contract as the percentile/histogram family
    val w = Window.orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byScore
      .withColumn("__cumneg", sum("__neg").over(w) - col("__neg"))
      // per-score term is integer-valued halves: exact in DOUBLE at
      // any aggregation order (each term = k/2 with k integral)
      .agg(
        sum("__pos").as("n_pos"),
        sum("__neg").as("n_neg"),
        sum(col("__pos").cast("double") *
          (col("__cumneg").cast("double") +
            col("__neg").cast("double") / 2.0)).as("__u"))
      .select(col("n_pos"), col("n_neg"),
        // explicit NULL on a single-class input (documented contract)
        // rather than an accidental NaN/±Inf from the zero division
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("__u") /
            (col("n_pos").cast("double") * col("n_neg").cast("double")), 6))
          .as("auc"))
  }

  /** Reliability bins: scores in [0, 1] bucketed into `bins` equal
    * cells, clamped SYMMETRICALLY at both ends — score 1.0 (and any
    * score above 1) lands in the last bin, any score below 0 in the
    * first — so an out-of-range scorer shows up as boundary-bin mass
    * (its `mean_score` escaping [0, 1] flags it) instead of silently
    * minting negative bin ids; per cell the member
    * count, DECIMAL-exact mean score, empirical positive rate, and
    * the absolute calibration gap. ONE map-side-combined aggregate,
    * output bounded by `bins`; a well-calibrated scorer shows
    * gap ≈ 0 everywhere, and a cheap quality model's over-confidence
    * lands in exactly these rows.
    */
  def calibrationBins(
      df: DataFrame,
      scoreCol: Column,
      labelCol: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need >= 2 bins, got $bins")
    val s = scoreCol.cast("double")
    df
      .select(s.as("__s"), labelCol.cast("boolean").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
      .withColumn("bin",
        least(greatest(floor(col("__s") * bins).cast("long"), lit(0L)),
          lit(bins - 1L)))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("__s").cast("decimal(18,9)")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_score"),
        round(count(when(col("__y"), lit(1))).cast("double") /
          count(lit(1)).cast("double"), 6).as("pos_rate"))
      .withColumn("gap", round(abs(col("mean_score") - col("pos_rate")), 6))
  }
}
