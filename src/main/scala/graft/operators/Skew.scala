package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for joins whose key distribution is heavy-
  * tailed (one hot entity melting a single reducer).
  *
  * AQE's skew-join handling (on by default in this engine's sessions)
  * splits oversized sort-merge partitions at runtime; salting is the
  * deterministic fallback for the cases AQE does not cover — broadcast-
  * ineligible dimension joins, pre-AQE planners, or when the skew is in
  * an aggregation key rather than a join.
  */
object Skew {

  /** Join `left` (large, skewed) with `right` (small enough to
    * replicate `saltFactor`x, far too big to broadcast) on `keys`.
    *
    * Left rows scatter across `saltFactor` sub-keys via a hash of the
    * whole row (deterministic — no rand()); the right side is exploded
    * once per salt value so every sub-key still finds its match. The
    * hot key's rows land on `saltFactor` reducers instead of one.
    *
    * Only left-preserving join types are supported: the right side is
    * replicated `saltFactor`x, so right/full outer joins would emit
    * every unmatched right row once per salt value.
    *
    * Pick `saltFactor` with [[skewReport]] on the join key — its
    * `suggested_salt` splits the hottest key to roughly one average
    * partition's load (SkewSpec proves the loop end-to-end).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti", "cross")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports left-preserving join types only " +
        s"(right side is replicated ${saltFactor}x); got '$joinType'")
    val leftHash: Column = xxhash64(left.columns.map(col).toSeq: _*)
    val l = left.withColumn("__salt", pmod(leftHash, lit(saltFactor.toLong)))
    val r = right.withColumn(
      "__salt", explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial-aggregate on
    * (keys, salt) first, then final-aggregate on keys. Useful when one
    * group dominates and map-side combine alone cannot absorb it (e.g.
    * collect-style aggregations with no partial reduction).
    * `partial` builds the per-salt aggregate; `merge` combines salts.
    * Pick `saltFactor` with [[skewReport]] on the grouping key.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltFactor: Int)(
      partial: Seq[Column],
      merge: Seq[Column]): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    val hash = xxhash64(df.columns.map(col).toSeq: _*)
    df.withColumn("__salt", pmod(hash, lit(saltFactor.toLong)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** The DIAGNOSIS that decides whether [[saltedJoin]]/[[saltedAgg]]
    * (or AQE's skew split) is needed at all: the per-key row-count
    * distribution of a prospective shuffle key, reduced to one row —
    * row/key totals, the exact p50/p99 and max of rows-per-key,
    * `skew_factor` (hottest key vs the mean), and `suggested_salt`:
    * the bucket count that splits the hottest key down to roughly one
    * average partition of a `partitions`-way shuffle, computed in
    * EXACT integer ceil arithmetic (`(max·P + rows − 1) ÷ rows`, no
    * float boundary to disagree over) and clamped at 1 when the key
    * is healthy.
    *
    * Scale shape: one map-side-combined count per key (the only pass
    * over data), then exact percentiles over the KEY-COUNT table —
    * bounded by key cardinality, the same contract as
    * q_group_percentiles. Run it on the candidate key BEFORE wiring a
    * 100 TB join; a skew_factor near 1 means salting would only add
    * overhead.
    */
  def skewReport(
      df: DataFrame, keyCol: String, partitions: Int = 32): DataFrame =
    reportFromCounts(
      df.groupBy(col(keyCol)).agg(count(lit(1)).as("__cnt")),
      keyCol, partitions)

  /** [[skewReport]] from an ALREADY-AGGREGATED (key, __cnt) table —
    * the entry point the streaming count store uses
    * ([[graft.streaming.SkewStream]]): per-key counts are additive, so
    * the cumulative store replays the exact report.
    */
  def reportFromCounts(
      counts: DataFrame, keyCol: String, partitions: Int = 32): DataFrame = {
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    counts
      .agg(
        sum("__cnt").as("n_rows"),
        count(lit(1)).as("n_keys"),
        expr("percentile(__cnt, 0.5)").as("__p50"),
        expr("percentile(__cnt, 0.99)").as("__p99"),
        max("__cnt").as("max_rows_per_key"))
      .select(lit(keyCol).as("key"), col("n_rows"), col("n_keys"),
        round(col("n_rows").cast("double") / col("n_keys").cast("double"), 6)
          .as("avg_rows_per_key"),
        round(col("__p50"), 6).as("p50_rows_per_key"),
        round(col("__p99"), 6).as("p99_rows_per_key"),
        col("max_rows_per_key"),
        round(col("max_rows_per_key").cast("double") *
          col("n_keys").cast("double") / col("n_rows").cast("double"), 6)
          .as("skew_factor"),
        // DIV, not `/`: Spark's slash is double division even on longs
        expr(s"greatest(1L, (max_rows_per_key * ${partitions}L + " +
          "n_rows - 1L) DIV n_rows)").as("suggested_salt"))
  }
}
