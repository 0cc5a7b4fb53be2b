package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curriculum binning: order a corpus by a quality signal and cut it
  * into difficulty/quality quantile bins per stratum (the standard
  * "easy → hard" or "low → high quality" schedule step before
  * training-data export).
  *
  * Two formulations assigning `bin ∈ [1, bins]` per row —
  * [[exactBins]] additionally emits the exact `pct_rank` (the sketch
  * path has no per-row rank to give):
  *
  *   - [[exactBins]] — `ntile` over a per-stratum window. Exact and
  *     deterministic (the ordering is made total with the id
  *     tie-break), but a stratum is sorted within ONE task, so it is
  *     the small/medium-stratum truth, not the 100 TB path.
  *   - [[sketchBins]] — two-pass scale path: per-stratum
  *     `percentile_approx` boundaries (GK sketch, bounded state,
  *     map-side partials) are computed first — one tiny row per
  *     stratum — then broadcast back and each row's bin is a pure
  *     projection. No full sort anywhere; rank error is the sketch's
  *     published n/accuracy bound, so bin edges are off by at most
  *     that many ranks while every row still gets a bin in O(scan).
  */
object Curriculum {

  /** Exact per-stratum quantile bins: `ntile(bins)` plus
    * `percent_rank`, ordered by (score, id) — a total order, so both
    * engines (and reruns) agree row-for-row.
    */
  def exactBins(
      df: DataFrame,
      strataCol: String,
      scoreCol: String,
      idCol: String,
      bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val w = Window.partitionBy(strataCol).orderBy(col(scoreCol), col(idCol))
    df.withColumn("bin", ntile(bins).over(w).cast("long"))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
  }

  /** Sketch-boundary bins: `percentile_approx` cut points per stratum
    * (accuracy = 1/eps rank error), broadcast-joined back; assignment
    * is `1 + #boundaries strictly below score` per row. State per
    * group-per-task is O(accuracy·log n) instead of the full stratum.
    */
  def sketchBins(
      df: DataFrame,
      strataCol: String,
      scoreCol: String,
      bins: Int,
      accuracy: Int = 10000): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val ps = (1 until bins).map(i => i.toDouble / bins)
    val cuts = df.groupBy(strataCol).agg(
      percentile_approx(col(scoreCol),
        typedLit(ps), lit(accuracy)).as("__cuts"))
    df.join(broadcast(cuts), strataCol)
      .withColumn("bin",
        (lit(1) + aggregate(col("__cuts"), lit(0),
          (acc, c) => acc + when(col(scoreCol) > c, 1).otherwise(0)))
          .cast("long"))
      .drop("__cuts")
  }
}
