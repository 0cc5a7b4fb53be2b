package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Storage layout for SCD tables at scale.
  *
  * The reference keeps its whole history in one coalesced CSV — fine at
  * 500 rows, unusable at 100 TB. The layout here:
  *
  *   - **history**: parquet, `partitionBy(dateCol)` — each snapshot date
  *     is its own partition directory, so date predicates prune at the
  *     file-listing level (verified: `PartitionFilters` in the scan
  *     node), snapshot loads append one partition, and retention drops
  *     old partitions without rewrites;
  *   - **current view**: parquet bucketed by the entity key
  *     (`bucketBy` + `saveAsTable`) — the SCD merge joins current vs
  *     incoming on the entity, and two tables bucketed on the same key
  *     by the same bucket count join with ZERO shuffle on the bucketed
  *     sides.
  */
object ScdStorage {

  /** Write the history table date-partitioned. */
  def writeHistory(df: DataFrame, path: String, dateCol: String = "snapshot_date"): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(dateCol)
      .parquet(path)

  /** Read the history table (partition pruning applies to dateCol
    * predicates automatically).
    */
  def readHistory(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Write a table bucketed by the entity key for shuffle-free merges.
    * Bucketed layouts are catalog tables in Spark (`saveAsTable`); use a
    * warehouse-backed session.
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      entityCols: Seq[String],
      numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, entityCols.head, entityCols.tail: _*)
      .sortBy(entityCols.head, entityCols.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)
}
