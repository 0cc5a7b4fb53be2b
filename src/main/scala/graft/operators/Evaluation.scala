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
    */
  def rocAuc(
      df: DataFrame,
      scoreCol: Column,
      labelCol: Column,
      precision: Int = 6): DataFrame = {
    val byScore = df
      .select(round(scoreCol.cast("double"), precision).as("__s"),
        labelCol.cast("boolean").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
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
        round(col("__u") /
          (col("n_pos").cast("double") * col("n_neg").cast("double")), 6)
          .as("auc"))
  }

  /** Reliability bins: scores in [0, 1] bucketed into `bins` equal
    * cells (score 1.0 clamps into the last); per cell the member
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
        least(floor(col("__s") * bins).cast("long"), lit(bins - 1L)))
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
