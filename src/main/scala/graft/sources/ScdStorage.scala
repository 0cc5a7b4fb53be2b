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

  /** Rewrite ONLY the partitions present in `df`, leaving every other
    * partition's files untouched (dynamic partition overwrite) — the
    * I/O half of incremental SCD maintenance: compute O(touched)
    * ([[graft.operators.ScdIncremental]]) and write O(changed
    * partitions), never the whole table.
    *
    * `df` must hold COMPLETE partitions: each date it contains replaces
    * that date's directory wholesale.
    *
    * Atomicity is per partition (Spark stages files and commits each
    * partition directory), not per table — the price of not rewriting
    * history. A crash mid-commit can leave a mix of old and new
    * partitions; replaying the same micro-batch heals it: snapshot
    * columns never change, classification is recomputed from them, and
    * the merge dedups re-delivered rows.
    */
  def overwritePartitions(
      df: DataFrame, path: String, dateCol: String = "snapshot_date"): Unit = {
    val spark = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try df.write.mode(SaveMode.Overwrite).partitionBy(dateCol).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  final case class CompactionStats(
      partition: String, filesBefore: Int, filesAfter: Int, bytes: Long)

  /** Compact small files inside each date partition of a history table.
    *
    * Incremental maintenance writes one small file set per micro-batch
    * into the touched partitions; after thousands of batches a
    * partition holds thousands of KB-files and scan task scheduling —
    * not I/O — dominates read cost (the classic small-files problem).
    * Compaction rewrites only partitions whose file count exceeds what
    * `targetFileBytes` calls for, one partition at a time, each through
    * an [[AtomicDir]] swap so readers never observe a half-rewritten
    * partition and a crash loses nothing.
    *
    * O(bytes of compacted partitions) I/O, zero shuffle (coalesce only),
    * untouched partitions' files are not even opened.
    */
  def compactHistory(
      spark: SparkSession,
      path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Seq[CompactionStats] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    val partDirs = fs.listStatus(root).toSeq
      .filter { s =>
        val n = s.getPath.getName
        // skip hidden/staging dirs (AtomicDir siblings, _SUCCESS etc.)
        s.isDirectory && n.contains("=") &&
          !n.startsWith(".") && !n.startsWith("_")
      }
    partDirs.flatMap { d =>
      val files = fs.listStatus(d.getPath).toSeq
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
          && !f.getPath.getName.startsWith("."))
      val bytes = files.map(_.getLen).sum
      val want = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
      if (files.length <= want) None
      else {
        val dest = d.getPath
        val tmp = AtomicDir.tmpPath(dest)
        fs.delete(tmp, true)
        spark.read.parquet(dest.toString)
          .coalesce(want)
          .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        AtomicDir.commit(fs, dest)
        val after = fs.listStatus(dest).count(f => f.isFile &&
          !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
        Some(CompactionStats(dest.getName, files.length, after, bytes))
      }
    }
  }

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
