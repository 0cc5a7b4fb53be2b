package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift core: per-source chi-square of a bucketed
  * histogram against the corpus-wide distribution, computed from a
  * (source, bucket, o) COUNT table — the mergeable representation
  * (counts add across batches/partitions/days), which is what makes
  * the same formula serve the batch query (`q_distribution_drift`)
  * and the incremental streaming monitor
  * ([[graft.streaming.DriftStream]]) unchanged.
  *
  * Chi-square over KL/PSI: rational in the exact integer counts (no
  * `ln`, whose last-ulp varies across engines), and the per-source
  * sum folds through DECIMAL(27,10) so it is order-independent.
  * Zero-observed buckets contribute their full expected mass — a
  * source missing a bucket IS drift.
  */
object Drift {

  /** (source, bucket) rows for the documents-style length histogram:
    * `n_chars` in 50-char buckets, capped at bucket 11.
    */
  def lengthBuckets(df: DataFrame, sourceCol: String, nCharsCol: String): DataFrame =
    df.select(col(sourceCol).as("source"),
      least(floor(col(nCharsCol) / lit(50.0)), lit(11L)).cast("long").as("bucket"))

  /** Per-source chi-square from a (source, bucket, o) count table
    * with a static bucket domain [0, maxBucket]. Scale shape: the
    * coarser totals are exact roll-ups of `obs` — deriving them from
    * the same aggregate keeps the obs exchange subtree identical in
    * all four places, so ReuseExchange collapses the plan to ONE
    * upstream scan + shuffle; the source × bucket grid is an
    * explode + broadcast equi-join (no cross join), and the 1-row
    * grand total rides the audited broadcast-cross pattern.
    */
  /** Per-source Population Stability Index from the same (source,
    * bucket, o) count table — the industry drift score model-risk
    * teams alarm on (conventional bands: < 0.1 stable, 0.1–0.25
    * investigate, > 0.25 shifted). PSI does need `ln`, which
    * chi-square avoids on portability grounds — the same
    * round-to-7dp-then-decimal-fold discipline the perplexity family
    * proves keeps it engine-exact: each term's ln runs on
    * bit-identical double inputs and rounding collapses any last-ulp
    * libm difference before the order-independent sum. Zero buckets
    * are count-smoothed (+0.5 per cell on BOTH distributions), so
    * every term is finite and a missing bucket still registers as
    * drift.
    */
  def psiFromCounts(obs0: DataFrame, maxBucket: Long = 11L): DataFrame = {
    val obs = obs0.filter(col("bucket").between(0L, maxBucket))
    val nb = (maxBucket + 1).toDouble
    val srcTotals = obs.groupBy("source").agg(sum("o").as("src_n"))
    val buckets = obs.groupBy("bucket").agg(sum("o").as("bucket_n"))
    val total = obs.agg(sum("o").as("all_n"))
    val grid = srcTotals
      .withColumn("bucket", explode(sequence(lit(0L), lit(maxBucket))))
      .join(broadcast(buckets), "bucket")
      .crossJoin(broadcast(total))
    grid.join(obs, Seq("source", "bucket"), "left")
      .select(col("source"), col("src_n"),
        ((coalesce(col("o"), lit(0L)) + lit(0.5)) /
          (col("src_n") + lit(0.5 * nb))).as("p_src"),
        ((col("bucket_n") + lit(0.5)) /
          (col("all_n") + lit(0.5 * nb))).as("p_all"))
      .select(col("source"), col("src_n"),
        round((col("p_src") - col("p_all")) * log(col("p_src") / col("p_all")), 7)
          .cast("decimal(27,7)").as("term"))
      .groupBy("source")
      .agg(max("src_n").as("n_docs"),
        round(sum(col("term")).cast("double"), 6).as("psi"))
  }

  def chi2FromCounts(obs0: DataFrame, maxBucket: Long = 11L): DataFrame = {
    // rows outside the declared domain are excluded ENTIRELY — from
    // the totals as well as the terms. Without this, a caller whose
    // bucketing isn't capped (unlike lengthBuckets) would inflate
    // src_n/all_n with rows the grid join silently drops from the
    // chi-square sum, understating drift with no warning.
    val obs = obs0.filter(col("bucket").between(0L, maxBucket))
    val srcTotals = obs.groupBy("source").agg(sum("o").as("src_n"))
    val buckets = obs.groupBy("bucket").agg(sum("o").as("bucket_n"))
    val total = obs.agg(sum("o").as("all_n"))
    val grid = srcTotals
      .withColumn("bucket", explode(sequence(lit(0L), lit(maxBucket))))
      .join(broadcast(buckets), "bucket")
      .crossJoin(broadcast(total))
    grid.join(obs, Seq("source", "bucket"), "left")
      .select(col("source"), col("src_n"),
        coalesce(col("o"), lit(0L)).as("o"),
        (col("src_n").cast("double") * col("bucket_n") / col("all_n")).as("e"))
      .select(col("source"), col("src_n"),
        (((col("o") - col("e")) * (col("o") - col("e")) / col("e"))
          .cast("decimal(27,10)")).as("term"))
      .groupBy("source")
      .agg(max("src_n").as("n_docs"),
        round(sum(col("term")).cast("double"), 6).as("chi2"))
  }
}
