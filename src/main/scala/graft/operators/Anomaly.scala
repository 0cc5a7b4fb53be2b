package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-rate anomaly detection — the ingest-health monitor a
  * standing pipeline runs over its own arrival stream: bucket events
  * per (type, hour), zero-fill the silent hours (a dead producer IS
  * the anomaly the un-filled grid can't see), and flag buckets whose
  * count sits more than `zThreshold` population standard deviations
  * from the type's own hourly mean — the classic control-chart rule
  * (Shewhart; the BMH "3-sigma" gate) over counting data.
  *
  * Scale shape: ONE map-side-combined count over (type, hour) — the
  * only pass that touches events; every later step works the
  * |types| × |hours| bounded grid (types and the hour span of the
  * retention window, never rows). The per-type moment table and the
  * hour grid broadcast back onto it. All moments are integer sums, so
  * mean/std/z replay bit-identically in any engine; z is rounded to
  * 6 dp, and the variance rides `greatest(·, 0)` against the
  * all-equal-counts fp residue that would NaN the sqrt.
  */
object Anomaly {

  /** @param zThreshold flag when `|z| >= zThreshold` (3.0 = the
    *        3-sigma control-chart convention)
    */
  def rateAnomaly(
      events: DataFrame,
      typeCol: String,
      tsCol: String,
      zThreshold: Double = 3.0): DataFrame = {
    require(zThreshold > 0.0, s"zThreshold must be positive, got $zThreshold")
    val counts = events
      .groupBy(col(typeCol), date_trunc("hour", col(tsCol)).as("bucket_ts"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true) // |types| × |hours| — bounded
    rateAnomalyFromCounts(counts, typeCol, zThreshold)
  }

  /** [[rateAnomaly]] from a pre-bucketed (type, hour) count table —
    * the additive representation a live monitor folds per batch
    * (counts merge by sum, so the cumulative report equals the batch
    * one; same semilattice contract as every `FromCounts` here).
    */
  def rateAnomalyFromCounts(
      counts0: DataFrame,
      typeCol: String,
      zThreshold: Double = 3.0,
      cntCol: String = "__c"): DataFrame = {
    require(zThreshold > 0.0, s"zThreshold must be positive, got $zThreshold")
    val counts = counts0.withColumnRenamed(cntCol, "__c")
    // the observed hour span; sequence() needs both ends non-null, so
    // empty input short-circuits to an empty grid
    val bounds = counts.agg(
      min("bucket_ts").as("__lo"), max("bucket_ts").as("__hi"))
    val grid = bounds
      .where(col("__lo").isNotNull)
      .select(explode(
        sequence(col("__lo"), col("__hi"), expr("INTERVAL 1 HOUR")))
        .as("bucket_ts"))
    val types = counts.select(col(typeCol)).distinct()
    val full = types.crossJoin(broadcast(grid))
      .join(broadcast(counts), Seq(typeCol, "bucket_ts"), "left")
      .withColumn("n_events", coalesce(col("__c"), lit(0L)))
    // per-type population moments over the zero-filled grid — integer
    // sums, engine-exact
    val stats = full.groupBy(col(typeCol))
      .agg(count(lit(1)).as("__n"),
        sum("n_events").as("__s"),
        sum(col("n_events") * col("n_events")).as("__s2"))
    val mean = col("__s").cast("double") / col("__n").cast("double")
    val variance = greatest(
      col("__s2").cast("double") / col("__n").cast("double") - mean * mean,
      lit(0.0))
    val std = sqrt(variance)
    full.join(broadcast(stats), Seq(typeCol))
      .withColumn("z_score",
        when(std === 0.0, lit(0.0))
          .otherwise(round((col("n_events").cast("double") - mean) / std, 6)))
      .withColumn("anomaly", abs(col("z_score")) >= zThreshold)
      .select(col(typeCol), col("bucket_ts"), col("n_events"),
        col("z_score"), col("anomaly"))
  }
}
