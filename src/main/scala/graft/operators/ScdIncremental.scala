package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental SCD maintenance.
  *
  * The reference recomputes the WHOLE history's classification on every
  * run (its P1 projection drops the derived columns before the union —
  * /root/reference/jobs/create_employee_all.py:77) — O(full history)
  * per batch, the real bottleneck at 100 TB. A new daily snapshot can
  * only change:
  *
  *   1. entities PRESENT in the batch → their history is re-classified
  *      (per-entity work, extracted with a semi-join);
  *   2. entities ABSENT from the batch → at most their LAST row flips
  *      to Deleted (the global max snapshot date advanced past them);
  *      every other row's classification is already final.
  *
  * So the per-batch cost is O(touched-entity history) + O(one window
  * pass over untouched rows). With the history stored entity-bucketed
  * ([[graft.sources.ScdStorage.writeBucketed]]) the untouched-side
  * window and both semi/anti joins need NO exchange, leaving only the
  * touched subset to shuffle.
  *
  * Restrictions (asserted): corrected-islands mode only — the legacy
  * cross-entity `changed_status_date` quirk pools gap groups across
  * ALL entities and cannot be maintained incrementally.
  */
object ScdIncremental {

  /** Merge a new snapshot batch into an already-classified history.
    *
    * @param existing  classified history (snapshot cols + change_status,
    *                  changed_status_date), unique per (entity, date)
    * @param incoming  new snapshot rows (snapshot cols only)
    * @return the same frame a full recompute would produce
    */
  /** @param preferIncoming when true, an incoming row for an
    *        (entity, date) ALREADY in the history deterministically
    *        replaces the stored row — the correction-replay mode
    *        (re-deliver a fixed snapshot for an old date and statuses
    *        heal forward). Default false preserves the reference's
    *        arbitrary same-key tie-break (SURVEY §2.5 D1).
    */
  def mergeBatch(
      existing: DataFrame,
      incoming: DataFrame,
      entityCols: Seq[String],
      dateCol: String = "snapshot_date",
      hashExclude: Seq[String] = Seq("snapshot_date"),
      preferIncoming: Boolean = false): DataFrame =
    mergeBatchWithChangedDates(
      existing, incoming, entityCols, dateCol, hashExclude, preferIncoming)._1

  /** [[mergeBatch]] plus the distinct `dateCol` values whose rows can
    * differ from `existing` — the partitions a date-partitioned store
    * must rewrite ([[graft.sources.ScdStorage.overwritePartitions]]).
    * Conservative (a touched entity's whole history counts even where
    * re-classification lands on the same value) but O(touched): the
    * dates of touched-entity rows, the batch's own dates, and the dates
    * of untouched last rows that flipped to Deleted. Derived from the
    * merge structure — never a full-table diff.
    */
  def mergeBatchWithChangedDates(
      existing: DataFrame,
      incoming: DataFrame,
      entityCols: Seq[String],
      dateCol: String = "snapshot_date",
      hashExclude: Seq[String] = Seq("snapshot_date"),
      preferIncoming: Boolean = false): (DataFrame, DataFrame) = {
    val snapshotCols = incoming.columns.toSeq
    require(!snapshotCols.contains(Scd.ChangeStatus),
      "incoming must carry snapshot columns only")

    val spark: SparkSession = existing.sparkSession

    // the global max snapshot date across BOTH frames, as a 1-row frame
    // for the broadcast pattern (never a single-partition window)
    val allDates = existing.select(col(dateCol))
      .union(incoming.select(col(dateCol)))

    val touched = incoming.select(entityCols.map(col): _*).distinct()

    // 1. touched entities: classical per-entity recompute over their
    //    merged history (semi-join extracts just those entities)
    val existingTouched = existing
      .join(touched, entityCols, "left_semi")
      .select(snapshotCols.map(col): _*)
    // correction replay: a source-priority tie-break makes the incoming
    // row the deterministic survivor on same-(entity, date) collisions
    val deduped =
      if (!preferIncoming)
        Scd.importNewFiles(existingTouched, incoming, entityCols, dateCol)
      else
        Scd.importNewFiles(
          existingTouched.withColumn("__src", lit(1)),
          incoming.withColumn("__src", lit(0)),
          entityCols, dateCol,
          tieBreak = Seq(col("__src"))).drop("__src")
    val recomputed = deduped
      .transform(Scd.addRowHash(hashExclude))
      .transform(Scd.changeStatus(
        entityCols, dateCol,
        legacyChangedStatusDate = false,
        globalMaxOf = Some(allDates)))

    // 2. untouched entities: flip the last row to Deleted where the
    //    (possibly advanced) global max has passed it. First-branch-wins
    //    semantics preserved: a last row labeled New stays New (the
    //    reference's when-chain tests New before Deleted), Deleted stays
    //    Deleted (idempotent).
    val untouched = existing.join(touched, entityCols, "left_anti")
    val lastW = Window.partitionBy(entityCols.map(col): _*).orderBy(col(dateCol).desc)
    val gmax = allDates.agg(max(dateCol).as("__gmax"))
    val untouchedFlagged = untouched
      .withColumn("__rn", row_number().over(lastW))
      .crossJoin(broadcast(gmax))
      .withColumn("__flip",
        col("__rn") === 1 && col(dateCol) < col("__gmax") &&
          col(Scd.ChangeStatus).isin("Changed", "No Change"))
    val untouchedUpdated = untouchedFlagged
      .withColumn(
        Scd.ChangeStatus,
        when(col("__flip"), "Deleted").otherwise(col(Scd.ChangeStatus)))
      .withColumn(
        Scd.ChangedStatusDate,
        // the reference's Deleted override, applied idempotently
        when(col(Scd.ChangeStatus) === "Deleted", col(dateCol))
          .otherwise(col(Scd.ChangedStatusDate)))
      .drop("__rn", "__gmax", "__flip")

    val merged = recomputed.select(existing.columns.map(col).toSeq: _*)
      .union(untouchedUpdated.select(existing.columns.map(col).toSeq: _*))
      // the when/otherwise over an (often nullable-typed) stored
      // change_status would type the output nullable; the declared SCD
      // schema requires non-nullable. coalesce with a non-null literal
      // restores it without changing any value.
      .withColumn(Scd.ChangeStatus,
        coalesce(col(Scd.ChangeStatus), lit("Unknown")))
      .select(existing.columns.map(col).toSeq: _*)

    val changedDates = existingTouched.select(col(dateCol))
      .union(incoming.select(col(dateCol)))
      .union(untouchedFlagged.filter(col("__flip")).select(col(dateCol)))
      .distinct()

    (merged, changedDates)
  }
}
