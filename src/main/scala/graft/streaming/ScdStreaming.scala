package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.scd.{EmployeeDimJob, EmployeeTables, Quality, TableProfile}
import graft.operators.Scd

/** Structured Streaming ingestion for the SCD pipeline.
  *
  * The reference ingests micro-batches by convention — one job run
  * consumes all files matching a glob, then archives them
  * (/root/reference/jobs/create_employee_all.py:36,:198-214). This is
  * the same contract expressed with a real streaming engine:
  *
  *   - `readStream` file source discovers new snapshot CSVs as they
  *     arrive; `cleanSource=archive` replaces the driver-side
  *     `shutil.move` loop (S5) with engine-managed archival;
  *   - each micro-batch runs the SAME batch transform chain via
  *     `foreachBatch` (merge into accumulated history → reclassify →
  *     rewrite), so late data keeps its by-VALUE placement semantics:
  *     a record's snapshot_date positions it in history regardless of
  *     arrival batch (SURVEY.md §2.10) — no watermark can drop it;
  *   - the accumulated table lives in parquet (not CSV) between
  *     batches: splittable, schema'd, and scan-efficient at scale.
  *
  * A fully incremental `transformWithState` variant (per-entity state
  * store instead of history recompute) is the next scale step; the
  * foreachBatch form is exactly as incremental as the reference's rerun
  * loop and keeps bit-identical semantics.
  */
object ScdStreaming {

  /** Start the streaming SCD maintenance job.
    *
    * @param inputDir      directory watched for snapshot CSVs
    * @param tableDir      parquet dir holding accumulated employee_all
    * @param checkpointDir streaming checkpoint location
    * @param maxFilesPerTrigger bound files per micro-batch (backpressure)
    * @param archiveDir    where consumed files go; must NOT be nested
    *                      under `inputDir` (Spark rejects an archive dir
    *                      the source glob could re-match). Default is a
    *                      sibling `<inputDir>_processed` — differing from
    *                      the reference's nested `processed/` for this
    *                      reason.
    */
  /** @param incremental use [[graft.operators.ScdIncremental]] per
    *   micro-batch — O(touched entities) instead of reclassifying the
    *   whole accumulated history. Requires corrected-islands mode
    *   (`cfg.legacyChangedStatusDate = false`): the legacy cross-entity
    *   quirk is not incrementally maintainable.
    * @param partitionedStorage store the history date-partitioned and
    *   rewrite only CHANGED partitions per micro-batch (dynamic
    *   partition overwrite) — makes the WRITE side O(changed) to match
    *   the incremental compute; without it every batch rewrites the
    *   whole table. Implies `incremental`. Trades whole-table swap
    *   atomicity for per-partition atomicity (see
    *   [[graft.sources.ScdStorage.overwritePartitions]]).
    */
  def start(
      spark: SparkSession,
      inputDir: String,
      tableDir: String,
      checkpointDir: String,
      cfg: EmployeeDimJob.Config,
      maxFilesPerTrigger: Int = 10,
      trigger: Trigger = Trigger.AvailableNow(),
      archiveDir: String = "",
      incremental: Boolean = false,
      partitionedStorage: Boolean = false): StreamingQuery = {
    require(!(incremental || partitionedStorage) || !cfg.legacyChangedStatusDate,
      "incremental maintenance requires corrected-islands mode")
    val archive = if (archiveDir.nonEmpty) archiveDir else s"${inputDir}_processed"
    val snapshots = spark.readStream
      .schema(EmployeeTables.snapshotSchema)
      .option("header", "true")
      .option("nullValue", "NULL")
      .option("dateFormat", "yyyy-MM-dd")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("cleanSource", "archive")
      .option("sourceArchiveDir", archive)
      .csv(inputDir)

    snapshots.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (partitionedStorage) mergeBatchPartitioned(spark, batch, tableDir, cfg)
        else mergeBatch(spark, batch, tableDir, cfg, incremental)
      }
      .start()
  }

  /** One micro-batch: existing parquet history + incoming rows → staged
    * SCD table, gated, atomically swapped in.
    */
  private[streaming] def mergeBatch(
      spark: SparkSession,
      batch: DataFrame,
      tableDir: String,
      cfg: EmployeeDimJob.Config,
      incremental: Boolean = false): Unit = {
    val dest = new Path(tableDir)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sources.AtomicDir.recover(fs, dest)
    val existing =
      if (fs.exists(dest))
        spark.read.schema(EmployeeTables.scdSchema).parquet(tableDir)
      else
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], EmployeeTables.scdSchema)
    val staged = (
      if (incremental && !existing.isEmpty)
        graft.operators.ScdIncremental.mergeBatch(
          existing, batch, entityCols = Seq("employee_number"))
      else
        EmployeeDimJob.stageEmployeeAll(existing, batch, cfg)
    ).persist()
    try {
      Quality.check(staged,
        EmployeeTables.employeeAll("").copy(outputPath = tableDir))
      staged.write.mode(SaveMode.Overwrite)
        .parquet(graft.sources.AtomicDir.tmpPath(dest).toString)
      graft.sources.AtomicDir.commit(fs, dest)
    } finally staged.unpersist()
  }

  /** One micro-batch against a DATE-PARTITIONED history: incremental
    * compute ([[graft.operators.ScdIncremental]]) + incremental I/O —
    * only partitions whose rows can differ are rewritten
    * ([[graft.sources.ScdStorage.overwritePartitions]]); untouched
    * partition files are never read back, staged, or replaced. First
    * batch bootstraps the partitioned layout with a full classify.
    *
    * The quality gate runs on the changed-partition subset (complete
    * partitions, so per-key uniqueness within them is fully checkable)
    * BEFORE any file is replaced.
    */
  private[graft] def mergeBatchPartitioned(
      spark: SparkSession,
      batch: DataFrame,
      tableDir: String,
      cfg: EmployeeDimJob.Config): Unit = {
    require(!cfg.legacyChangedStatusDate,
      "incremental maintenance requires corrected-islands mode")
    if (batch.isEmpty) return
    val dest = new Path(tableDir)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val profile = EmployeeTables.employeeAll("").copy(outputPath = tableDir)
    if (!fs.exists(dest)) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], EmployeeTables.scdSchema)
      val staged = EmployeeDimJob.stageEmployeeAll(empty, batch, cfg).persist()
      try {
        Quality.check(staged, profile)
        graft.sources.ScdStorage.writeHistory(staged, tableDir)
      } finally staged.unpersist()
    } else {
      val existing = spark.read.schema(EmployeeTables.scdSchema).parquet(tableDir)
      val (merged, changedDates) = graft.operators.ScdIncremental
        .mergeBatchWithChangedDates(existing, batch, entityCols = Seq("employee_number"))
      val subset = merged
        .join(org.apache.spark.sql.functions.broadcast(changedDates),
          Seq("snapshot_date"), "left_semi")
        .select(EmployeeTables.scdSchema.fieldNames.map(
          org.apache.spark.sql.functions.col).toSeq: _*)
        .persist()
      try {
        Quality.check(subset, profile)
        graft.sources.ScdStorage.overwritePartitions(subset, tableDir)
      } finally subset.unpersist()
    }
  }

  /** Read the maintained history table (repairing any interrupted swap
    * first).
    */
  def historyTable(spark: SparkSession, tableDir: String): DataFrame = {
    val dest = new Path(tableDir)
    graft.sources.AtomicDir.recover(
      dest.getFileSystem(spark.sparkContext.hadoopConfiguration), dest)
    // a date-PARTITIONED layout surfaces snapshot_date as the trailing
    // partition column regardless of the user schema's order — reselect
    // to the declared column order (no-op for the flat layout)
    spark.read.schema(EmployeeTables.scdSchema).parquet(tableDir)
      .select(EmployeeTables.scdSchema.fieldNames.map(
        org.apache.spark.sql.functions.col).toSeq: _*)
  }

  /** Derive the current view from the maintained history. */
  def currentView(spark: SparkSession, tableDir: String, cfg: EmployeeDimJob.Config): DataFrame =
    EmployeeDimJob.stageEmployeeCurrent(historyTable(spark, tableDir), cfg)
}
